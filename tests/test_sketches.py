"""HyperLogLog sketch (operators/sketches.py): estimator accuracy,
exact merge property, small-range linear-counting path, codegen-only
register computation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import sketches


def _ids(spark, lo, hi, label="g"):
    return spark.range(lo, hi).select(
        F.col("id").alias("key"), F.lit(label).alias("grp"))


def _est(df, p):
    return df.collect()[0]["approx_distinct"]


def test_accuracy_large(spark):
    # 50k distinct at p=11 (m=2048): standard error 1.04/sqrt(m) = 2.3%;
    # assert within 4 sigma
    n = 50_000
    est = _est(sketches.approx_distinct_hll(
        _ids(spark, 0, n), "key", p=11), 11)
    assert abs(est - n) / n < 0.092


def test_small_range_linear_counting(spark):
    # 40 distinct << m=512: the linear-counting branch is near-exact
    est = _est(sketches.approx_distinct_hll(
        _ids(spark, 0, 40), "key", p=9), 9)
    assert abs(est - 40) < 2.0


def test_merge_equals_union(spark):
    a, b = _ids(spark, 0, 3000), _ids(spark, 2000, 6000)  # overlapping
    direct = sketches.hll_estimate(
        sketches.hll_sketch(a.unionByName(b), "key", ["grp"], p=9),
        ["grp"], p=9).collect()
    merged = sketches.hll_estimate(
        sketches.hll_merge(sketches.hll_sketch(a, "key", ["grp"], p=9),
                           sketches.hll_sketch(b, "key", ["grp"], p=9),
                           group_cols=["grp"]),
        ["grp"], p=9).collect()
    assert [r.asDict() for r in direct] == [r.asDict() for r in merged]


def test_duplicates_do_not_move_estimate(spark):
    once = _ids(spark, 0, 5000)
    thrice = once.unionByName(once).unionByName(once)
    assert _est(sketches.approx_distinct_hll(once, "key", p=9), 9) == \
        _est(sketches.approx_distinct_hll(thrice, "key", p=9), 9)


def test_sketch_bounded_and_codegen(spark):
    sk = sketches.hll_sketch(_ids(spark, 0, 100_000), "key", p=9)
    assert sk.count() <= 512
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # mergeable partial aggregation on the map side
    assert "partial_max" in plan.lower() or "HashAggregate" in plan


def test_grouped(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "key": list(range(200)) + list(range(50)),
        "grp": ["a"] * 200 + ["b"] * 50}))
    out = {r.grp: r.approx_distinct
           for r in sketches.approx_distinct_hll(
               df, "key", ["grp"], p=9).collect()}
    assert abs(out["a"] - 200) / 200 < 0.1
    assert abs(out["b"] - 50) / 50 < 0.1


# --- count-min sketch ---


def test_cms_overestimates_only_and_tight_when_wide(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "k": sum(([i] * (10 + i) for i in range(30)), [])}))
    sk = sketches.cms_sketch(df, "k", depth=4, width=2048)
    est = {r.k: r.est_count for r in sketches.cms_estimate(
        sk, df.select("k").distinct(), "k", depth=4, width=2048).collect()}
    for i in range(30):
        assert est[i] >= 10 + i           # never under
        assert est[i] <= 10 + i + 5       # wide sketch, tiny corpus: tight
    # 30 distinct keys in 2048 buckets: collisions are unlikely enough
    assert sum(est[i] - (10 + i) for i in range(30)) <= 10


def test_cms_merge_equals_union(spark):
    a = spark.range(0, 4000).selectExpr("id % 37 as k")
    b = spark.range(0, 6000).selectExpr("id % 53 as k")
    direct = sketches.cms_sketch(a.unionByName(b), "k", 4, 256)
    merged = sketches.cms_merge(sketches.cms_sketch(a, "k", 4, 256),
                                sketches.cms_sketch(b, "k", 4, 256))
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_cms_bounded_size_and_unseen_key_zero(spark):
    df = spark.range(0, 100_000).selectExpr("id % 1000 as k")
    sk = sketches.cms_sketch(df, "k", depth=4, width=128)
    assert sk.count() <= 4 * 128
    unseen = spark.createDataFrame(pd.DataFrame({"k": [10**12 + 7]}))
    est = sketches.cms_estimate(sk, unseen, "k", 4, 128).collect()[0]
    # narrow sketch: the unseen key may collide, but never goes negative
    assert est.est_count >= 0


def test_cms_estimate_broadcasts_sketch(spark):
    df = spark.range(0, 1000).selectExpr("id % 50 as k")
    sk = sketches.cms_sketch(df, "k", 4, 256)
    plan = sketches.cms_estimate(sk, df.select("k").distinct(), "k", 4, 256) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hist_quantile_within_one_bin_width(spark):
    # exponential-ish skew via id*id % 10007 — compare to exact percentile
    df = spark.range(0, 20_000).selectExpr(
        "cast((id * id) % 10007 as double) as v")
    nbins, lo, hi = 200, 0.0, 10007.0
    width = (hi - lo) / nbins
    sk = sketches.hist_sketch(df, "v", lo, hi, nbins)
    got = {r["q"]: r["value"]
           for r in sketches.hist_quantiles(sk, [0.1, 0.5, 0.9],
                                            lo, hi, nbins).collect()}
    exact = df.selectExpr(
        "percentile(v, array(0.1, 0.5, 0.9)) as p").collect()[0]["p"]
    for q, e in zip([0.1, 0.5, 0.9], exact):
        assert abs(got[q] - e) <= width, (q, got[q], e)


def test_hist_merge_equals_whole(spark):
    a = spark.range(0, 5000).selectExpr("cast(id % 997 as double) as v")
    b = spark.range(5000, 9000).selectExpr("cast(id % 997 as double) as v")
    whole = sketches.hist_sketch(a.unionByName(b), "v", 0.0, 1000.0, 64)
    merged = sketches.hist_merge(
        sketches.hist_sketch(a, "v", 0.0, 1000.0, 64),
        sketches.hist_sketch(b, "v", 0.0, 1000.0, 64))
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))
    # quantiles off the merged sketch == off the whole-data sketch
    qw = sorted(map(tuple, sketches.hist_quantiles(
        whole, [0.5], 0.0, 1000.0, 64).collect()))
    qm = sorted(map(tuple, sketches.hist_quantiles(
        merged, [0.5], 0.0, 1000.0, 64).collect()))
    assert qw == qm


def test_hist_outliers_clamp_to_edge_bins(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [-100.0, 0.5, 1.5, 999.0]}))
    sk = {r["bin"]: r["cnt"]
          for r in sketches.hist_sketch(df, "v", 0.0, 2.0, 4).collect()}
    # bins are 0.5 wide: -100 clamps to bin 0, 0.5 sits on the 0/1
    # boundary (bin 1), 1.5 on the 2/3 boundary and 999 clamps — bin 3
    assert sk == {0: 1, 1: 1, 3: 2}


def test_hist_sketch_bounded_and_grouped(spark):
    df = spark.range(0, 50_000).selectExpr(
        "cast(id % 3 as string) as g", "cast(id % 313 as double) as v")
    sk = sketches.hist_sketch(df, "v", 0.0, 320.0, 32, group_cols=["g"])
    assert sk.count() <= 3 * 32
    out = sketches.hist_quantiles(sk, [0.25, 1.0], 0.0, 320.0, 32,
                                  group_cols=["g"]).collect()
    assert len(out) == 6  # one row per (group, q); q=1.0 lands in a bin
