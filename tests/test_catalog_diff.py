"""Snapshot history + metadata-only diff (catalog.IcebergishTable)."""

import pandas as pd
from pyspark.sql import functions as F

from geolake_spark.catalog import IcebergishTable
from geolake_spark.write import write_snapshot


def _df(spark, shards, rows_per=10, start=0):
    rows = [(start + s * rows_per + i, s, 0.0, 0.0)
            for s in shards for i in range(rows_per)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "shard", "lat", "lon"]))


def test_history_and_diff(spark, tmp_path):
    t = IcebergishTable(str(tmp_path / "t"))
    write_snapshot(_df(spark, [0, 1]), t, ["shard"])          # snap 1
    write_snapshot(_df(spark, [1, 2], rows_per=5, start=100),
                   t, ["shard"])                              # snap 2

    hist = t.history()
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[0]["parent_id"] is None and hist[1]["parent_id"] == 1

    d = t.diff(1, 2)
    assert d["added"] == [{"shard": 2}]
    assert d["removed"] == []
    assert d["rewritten"] == [{"shard": 1}]      # overwritten partition
    assert d["unchanged"] == 1                   # shard 0 untouched
    # snap1: 10+10 rows; snap2: shard0 10 + shard1 5 + shard2 5
    assert d["row_delta"] == 20 - 20

    d0 = t.diff(None, 1)
    assert sorted(p["shard"] for p in d0["added"]) == [0, 1]
    assert d0["row_delta"] == 20


def test_diff_defaults_to_current(spark, tmp_path):
    t = IcebergishTable(str(tmp_path / "t"))
    write_snapshot(_df(spark, [0]), t, ["shard"])
    write_snapshot(_df(spark, [1]), t, ["shard"])
    d = t.diff(1)
    assert d["added"] == [{"shard": 1}] and d["unchanged"] == 1
