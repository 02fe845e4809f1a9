"""Iceberg-style table layer: atomic commit, manifest metrics, resume,
estimate/admission."""

import json
import os

import pytest
from pyspark.sql import functions as F

from geolake_spark.catalog import IcebergishTable
from geolake_spark.plans import estimate
from geolake_spark.write import write_snapshot


@pytest.fixture()
def table(tmp_path):
    return IcebergishTable(str(tmp_path / "tbl"))


def _sample(spark, langs):
    rows = [(f"u{i}-{lg}", lg, float(i % 60 - 30), float(i % 300 - 150))
            for lg in langs for i in range(20)]
    return spark.createDataFrame(rows, ["url", "lang", "lat", "lon"])


def test_commit_and_read(spark, table):
    df = _sample(spark, ["en", "de"])
    info = write_snapshot(df, table, ["lang"])
    assert info["written_partitions"] == 2 and info["rows"] == 40
    back = table.read(spark)
    assert back.count() == 40
    assert set(r["lang"] for r in back.select("lang").distinct().collect()) \
        == {"en", "de"}


def test_manifest_metrics(spark, table):
    write_snapshot(_sample(spark, ["en"]), table, ["lang"])
    m = table.manifests()
    assert len(m) == 1
    assert m[0]["row_count"] == 20
    assert sum(m[0]["cell_histogram"].values()) == 20
    assert m[0]["byte_size"] > 0


def test_resume_skips_committed(spark, table):
    write_snapshot(_sample(spark, ["en"]), table, ["lang"])
    info = write_snapshot(_sample(spark, ["en", "fr", "it"]), table,
                          ["lang"], resume=True)
    assert info["skipped_partitions"] == 1          # en already committed
    assert info["written_partitions"] == 2          # fr, it only
    assert table.read(spark).count() == 60
    assert table.stats()["rows"] == 60


def test_snapshot_log_and_partition_pruned_read(spark, table):
    write_snapshot(_sample(spark, ["en"]), table, ["lang"])
    write_snapshot(_sample(spark, ["fr"]), table, ["lang"], resume=True)
    assert table.current_snapshot_id() == 2
    assert table.snapshot()["parent_id"] == 1
    pruned = table.read(spark, partition_filter=lambda p: p["lang"] == "fr")
    assert pruned.count() == 20


def test_estimate_and_admission(spark, table):
    write_snapshot(_sample(spark, ["en"]), table, ["lang"])
    n = estimate.estimate_table_bytes(table)
    assert n > 0
    estimate.admit(n)  # small -> admitted
    with pytest.raises(estimate.TooBigRequestError):
        estimate.admit(11 * 1024 ** 3)  # > 10 GB default cap
    with pytest.raises(estimate.TooBigRequestError):
        estimate.admit(0)  # empty result rejected (dataset.py:264-267)


def test_human_size_floor():
    assert estimate.human_size(1) == (0.01, "B") or estimate.human_size(1)[0] >= 0.01
    val, unit = estimate.human_size(5 * 1024 ** 2)
    assert (val, unit) == (5.0, "MB")


def test_plan_stats_estimate(spark):
    df = spark.range(1000).withColumn("x", F.rand(seed=1))
    assert estimate.estimate_df_bytes(df) > 0


def test_merge_snapshot_upsert(spark, table):
    from geolake_spark.write import merge_snapshot
    write_snapshot(_sample(spark, ["en", "de", "fr"]), table, ["lang"])
    pre = {json.dumps(m["partition"], sort_keys=True): m["manifest_list"]
           if "manifest_list" in m else None for m in table.manifests()}
    pre_snap = table.current_snapshot_id()
    # update one en row, insert a new en key — de/fr untouched
    ups = spark.createDataFrame(
        [("u0-en", "en", 99.0, 99.0), ("NEW-en", "en", 1.0, 1.0)],
        ["url", "lang", "lat", "lon"])
    info = merge_snapshot(ups, table, key_cols=["url"])
    assert info["merged_partitions"] == 1
    back = table.read(spark)
    assert back.count() == 61                      # 60 + 1 insert
    row = back.filter(F.col("url") == "u0-en").collect()[0]
    assert row.lat == 99.0                         # replaced, not duplicated
    assert back.filter(F.col("url") == "NEW-en").count() == 1
    # metadata: only the en partition's manifest changed
    d = table.diff(pre_snap)
    assert [p["lang"] for p in d["rewritten"]] == ["en"]
    assert d["unchanged"] == 2


def test_merge_snapshot_new_partition_and_delete(spark, table):
    from geolake_spark.write import merge_snapshot
    write_snapshot(_sample(spark, ["en", "de"]), table, ["lang"])
    # insert a brand-new partition + delete ALL de rows -> de dropped
    ups = spark.createDataFrame([("x-it", "it", 0.0, 0.0)],
                                ["url", "lang", "lat", "lon"])
    dels = spark.createDataFrame(
        [(f"u{i}-de", "de") for i in range(20)], ["url", "lang"])
    info = merge_snapshot(ups, table, key_cols=["url"], deletes=dels)
    assert info["deleted_rows"] == 20
    assert info["dropped_partitions"] == 1
    back = table.read(spark)
    assert back.filter(F.col("lang") == "de").count() == 0
    assert back.filter(F.col("lang") == "it").count() == 1
    assert back.count() == 21
    # partition dir physically gone, manifests consistent
    assert not os.path.exists(table.partition_path({"lang": "de"}))
    assert {m["partition"]["lang"] for m in table.manifests()} == {"en", "it"}


def test_merge_snapshot_partial_delete(spark, table):
    from geolake_spark.write import merge_snapshot
    write_snapshot(_sample(spark, ["en"]), table, ["lang"])
    dels = spark.createDataFrame([("u3-en", "en")], ["url", "lang"])
    info = merge_snapshot(
        spark.createDataFrame([], "url string, lang string, lat double, "
                              "lon double"),
        table, key_cols=["url"], deletes=dels)
    assert info["deleted_rows"] == 1
    back = table.read(spark)
    assert back.count() == 19
    assert back.filter(F.col("url") == "u3-en").count() == 0


def test_column_stats_data_skipping(spark, table):
    from geolake_spark.catalog import IcebergishTable  # noqa: F401
    # lat ranges are disjoint per partition: en -30..-11, de 10..29
    rows = [(f"u{i}", "en", float(-30 + i), 0.0) for i in range(20)]
    rows += [(f"v{i}", "de", float(10 + i), 0.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["url", "lang", "lat", "lon"])
    write_snapshot(df, table, ["lang"])
    # manifests carry numeric min/max/nulls
    m = {mm["partition"]["lang"]: mm["column_stats"]
         for mm in table.manifests()}
    assert m["en"]["lat"] == {"min": -30.0, "max": -11.0, "nulls": 0}
    assert m["de"]["lat"] == {"min": 10.0, "max": 29.0, "nulls": 0}
    # range hits only de -> en partition is skipped without a file read
    kept, skipped = table.stats_prune("lat", lo=0.0)
    assert skipped == 1 and [k["partition"]["lang"] for k in kept] == ["de"]
    out = table.read_where(spark, "lat", lo=0.0, hi=15.0)
    assert out.count() == 6                       # residual filter applies
    assert set(r.lang for r in out.select("lang").distinct().collect()) \
        == {"de"}
    # no stats for the column -> never prunes
    kept, skipped = table.stats_prune("nonexistent", lo=0.0)
    assert skipped == 0 and len(kept) == 2
    # fully-pruned read returns an empty frame with the table schema
    empty = table.read_where(spark, "lat", lo=1e9)
    assert empty.count() == 0
    assert set(empty.columns) == {"url", "lang", "lat", "lon"}


def test_merge_upsert_job(spark, tmp_path, monkeypatch):
    """jobs/merge_upsert.py end-to-end: recrawl replaces, insert lands,
    tombstone deletes — untouched partition's manifest carries over."""
    import runpy
    import sys

    from pyspark.sql import SparkSession
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    table = str(tmp_path / "tbl")
    write_snapshot(_sample(spark, ["en", "de"]), IcebergishTable(table),
                   ["lang"])
    ups = str(tmp_path / "delta.parquet")
    dels = str(tmp_path / "tombs.parquet")
    spark.createDataFrame([("u0-en", "en", 77.0, 0.0),
                           ("fresh-en", "en", 1.0, 1.0)],
                          ["url", "lang", "lat", "lon"]).write.parquet(ups)
    spark.createDataFrame([("u1-en", "en")],
                          ["url", "lang"]).write.parquet(dels)
    argv = ["merge_upsert.py", "--table", table, "--updates", ups,
            "--deletes", dels, "--key-cols", "url", "--cores", "4"]
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path("/root/repo/jobs/merge_upsert.py", run_name="__main__")

    t = IcebergishTable(table)
    back = t.read(spark)
    assert back.count() == 40                    # 40 - 1 del + 1 insert
    assert back.filter(F.col("url") == "u0-en").collect()[0].lat == 77.0
    assert back.filter(F.col("url") == "u1-en").count() == 0
    assert back.filter(F.col("url") == "fresh-en").count() == 1
    assert back.filter(F.col("lang") == "de").count() == 20
