"""Range/interval + as-of joins vs pandas brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import ranges


@pytest.fixture(scope="module")
def facts(spark):
    rng = np.random.RandomState(3)
    return spark.createDataFrame(pd.DataFrame({
        "fid": range(500),
        "v": np.round(rng.uniform(0, 100, 500), 3)}))


@pytest.fixture(scope="module")
def intervals(spark):
    rng = np.random.RandomState(4)
    lo = np.round(rng.uniform(0, 90, 30), 3)
    return spark.createDataFrame(pd.DataFrame({
        "band_id": range(30), "lo": lo,
        "hi": np.round(lo + rng.uniform(1, 25, 30), 3)}))  # overlapping


def test_range_join_matches_brute_force(facts, intervals):
    got = {(r["fid"], r["band_id"]) for r in
           ranges.range_join(facts, intervals, "v").collect()}
    f = facts.toPandas()
    iv = intervals.toPandas()
    exp = {(int(fr.fid), int(ir.band_id))
           for _, fr in f.iterrows() for _, ir in iv.iterrows()
           if ir.lo <= fr.v <= ir.hi}
    assert got == exp and len(exp) > 0


def test_range_join_explicit_width(facts, intervals):
    got = ranges.range_join(facts, intervals, "v", bucket_width=3.0)
    default = ranges.range_join(facts, intervals, "v")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple,
                                                           default.collect()))


def test_asof_join_matches_merge_asof(spark):
    rng = np.random.RandomState(5)
    left = pd.DataFrame({
        "lid": range(200),
        "key": rng.randint(0, 5, 200),
        "ts": rng.randint(0, 1000, 200)}).astype("int64")
    right = (pd.DataFrame({
        "key": rng.randint(0, 5, 80),
        "ts": rng.randint(0, 1000, 80),
        "payload": np.round(rng.randn(80), 4)})
        .drop_duplicates(["key", "ts"]).astype({"key": "int64", "ts": "int64"}))
    out = ranges.asof_join(spark.createDataFrame(left),
                           spark.createDataFrame(right),
                           on="ts", by="key", right_cols=["payload"])
    got = (out.select("lid", "payload_r").toPandas()
           .set_index("lid")["payload_r"].to_dict())
    exp_df = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                           on="ts", by="key", direction="backward")
    exp = exp_df.set_index("lid")["payload"].to_dict()
    assert set(got) == set(exp)
    for k in exp:
        if pd.isna(exp[k]):
            assert got[k] is None or pd.isna(got[k])
        else:
            assert got[k] == pytest.approx(exp[k])


def test_range_join_left_keeps_unmatched(spark, facts, intervals):
    """how='left': facts outside every interval survive with null bands
    (round-3 advisor: the BETWEEN predicate lives in the join condition,
    not a post-filter that silently degraded left to inner)."""
    out = ranges.range_join(facts, intervals, "v", how="left").toPandas()
    f = facts.toPandas()
    iv = intervals.toPandas()
    matched = {int(fr.fid) for _, fr in f.iterrows()
               for _, ir in iv.iterrows() if ir.lo <= fr.v <= ir.hi}
    unmatched = set(f["fid"].astype(int)) - matched
    got_null = set(out[out["band_id"].isnull()]["fid"].astype(int))
    assert got_null == unmatched
    with pytest.raises(ValueError):
        ranges.range_join(facts, intervals, "v", how="right")


def test_range_join_wide_interval_bounded_explode(spark):
    """One interval 10^9 wide must not explode into 10^9 bucket rows."""
    f = spark.createDataFrame(pd.DataFrame({"fid": [1, 2],
                                            "v": [5.0, 2e8]}))
    iv = spark.createDataFrame(pd.DataFrame(
        {"band_id": [0, 1], "lo": [0.0, 3.0], "hi": [1e9, 4.0]}))
    got = {(r["fid"], r["band_id"]) for r in
           ranges.range_join(f, iv, "v").collect()}
    assert got == {(1, 0), (2, 0)}


def test_asof_duplicate_right_rows_deterministic(spark):
    """Duplicate (by, on) right rows resolve to the greatest payload tuple,
    identically across runs (round-3 advisor: the window previously ordered
    only by (on, tag), leaving ties arbitrary)."""
    left = spark.createDataFrame(pd.DataFrame(
        {"k": ["a"] * 3, "ts": [5, 10, 20]}))
    right = spark.createDataFrame(pd.DataFrame(
        {"k": ["a"] * 4, "ts": [1, 1, 10, 10],
         "px": [3.0, 7.0, 2.0, 9.0]}))
    for _ in range(3):
        got = (ranges.asof_join(left, right, on="ts", by="k")
               .orderBy("ts").collect())
        assert [r["px_r"] for r in got] == [7.0, 9.0, 9.0]
    with pytest.raises(ValueError):  # suffix collision guard
        ranges.asof_join(left.withColumn("px_r", F.lit(0.0)), right,
                         on="ts", by="k")


def test_asof_tie_takes_equal_timestamp(spark):
    left = spark.createDataFrame(pd.DataFrame(
        {"lid": [1], "ts": [100]}).astype("int64"))
    right = spark.createDataFrame(pd.DataFrame(
        {"ts": [100, 50], "payload": [7.0, 3.0]}).astype({"ts": "int64"}))
    out = ranges.asof_join(left, right, on="ts",
                           right_cols=["payload"]).collect()
    assert out[0]["payload_r"] == 7.0  # <= semantics: equal ts matches


def test_interval_overlap_join_hand_checked(spark):
    from geolake_spark.operators import ranges
    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 21.0), (3, 30.0, 30.0)],
        "l_id long, lo double, hi double")
    right = spark.createDataFrame(
        [(10, 5.0, 6.0),      # inside 1
         (11, 10.0, 12.0),    # touches 1's end (closed: counts)
         (12, 15.0, 19.0),    # gap: no match
         (13, 21.0, 40.0)],   # touches 2, spans 3 (a point interval)
        "r_id long, lo double, hi double")
    got = {(r.l_id, r.r_id)
           for r in ranges.interval_overlap_join(left, right).collect()}
    assert got == {(1, 10), (1, 11), (2, 13), (3, 13)}


def test_interval_overlap_emits_each_pair_once(spark):
    from geolake_spark.operators import ranges
    # one huge left interval overlapping a tiny right one across many
    # buckets: the ownership rule must emit exactly one row
    left = spark.createDataFrame([(1, 0.0, 1000.0)],
                                 "l_id long, lo double, hi double")
    right = spark.createDataFrame([(2, 500.0, 501.0)],
                                  "r_id long, lo double, hi double")
    out = ranges.interval_overlap_join(left, right,
                                       bucket_width=1.0).collect()
    assert len(out) == 1 and (out[0].l_id, out[0].r_id) == (1, 2)
