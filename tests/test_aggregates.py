"""Resample (A1) / average (A2) vs pandas resample oracle, incl. closed=right
and nan-aggregator semantics (workflow.py:12-21,121-155)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import aggregates


@pytest.fixture(scope="module")
def series(spark):
    ts = pd.date_range("2022-01-01", periods=96, freq="h")
    pdf = pd.DataFrame({
        "ts": ts,
        "key": ["a"] * 48 + ["b"] * 48,
        "value": np.arange(96, dtype=float),
    })
    pdf.loc[5, "value"] = np.nan
    # createDataFrame(pandas) maps NaN -> null; re-inject a true NaN double
    # (parquet sources keep NaN as NaN, which is what the engine sees)
    df = (spark.createDataFrame(pdf.fillna({"value": -1.0}))
          .withColumn("value", F.when(F.col("value") == -1.0,
                                      F.lit(float("nan")))
                      .otherwise(F.col("value"))))
    return df, pdf


def test_resample_daily_nanmax(spark, series):
    df, pdf = series
    out = aggregates.resample(df, "nanmax", "1D", keys=["key"])
    got = {(r["key"], r["bucket_start"].date().isoformat()): r["value"]
           for r in out.collect()}
    exp = (pdf.set_index("ts").groupby("key")["value"]
           .resample("1D").max())
    for (k, t), v in exp.items():
        assert got[(k, t.date().isoformat())] == v


def test_resample_closed_right_boundary(spark, series):
    df, pdf = series
    out = aggregates.resample(df, "nanmean", "1D", keys=["key"], closed="right")
    got = {(r["key"], r["bucket_start"].isoformat()): r["value"]
           for r in out.collect()}
    # pandas closed='right' labels by left edge when label='left'
    exp = (pdf.set_index("ts").groupby("key")["value"]
           .resample("1D", closed="right", label="left").mean())
    for (k, t), v in exp.items():
        g = got[(k, t.isoformat())]
        assert abs(g - v) < 1e-9, (k, t, g, v)


def test_plain_max_propagates_nan(spark, series):
    df, _ = series
    out = aggregates.resample(df, "max", "1D", keys=["key"])
    first_a = [r for r in out.collect()
               if r["key"] == "a" and r["bucket_start"].day == 1]
    assert len(first_a) == 1 and np.isnan(first_a[0]["value"])  # NaN in bucket


def test_nan_sum_skips(spark, series):
    df, pdf = series
    out = aggregates.resample(df, "nansum", "1D", keys=["key"])
    first_a = [r for r in out.collect()
               if r["key"] == "a" and r["bucket_start"].day == 1][0]
    assert first_a["value"] == np.nansum(pdf["value"][:24])


def test_unknown_aggregator_rejected():
    with pytest.raises(ValueError):
        aggregates._resolve_agg("median")  # not in the reference whitelist


def test_average_collapses_dim(spark, series):
    df, pdf = series
    out = aggregates.average(df.select("key", "ts", "value"), dim="ts")
    got = {r["key"]: r["value"] for r in out.collect()}
    exp = pdf.groupby("key")["value"].mean()  # pandas mean skips NaN
    assert abs(got["a"] - exp["a"]) < 1e-9 and abs(got["b"] - exp["b"]) < 1e-9


def test_mad_outliers_hand_checked(spark):
    from geolake_spark.operators import aggregates
    rows = [(i, "a", float(v)) for i, v in
            enumerate([10, 11, 12, 13, 14, 100])]          # 100 is wild
    rows += [(100 + i, "b", float(v)) for i, v in
             enumerate([5, 5, 5, 5, 5])]                   # MAD 0: none
    df = spark.createDataFrame(rows, "event_id long, event_type string, "
                               "value double")
    out = {r.event_id: (r.med, r.mad)
           for r in aggregates.mad_outliers(
               df, "value", ["event_type"]).collect()}
    # group a: median 12.5, devs [2.5,1.5,0.5,0.5,1.5,87.5] -> MAD 1.5,
    # threshold 4.5 -> only the 100 row (id 5) flags
    assert out == {5: (12.5, 1.5)}


def test_ewma_last_hand_checked(spark):
    import datetime as dt

    from geolake_spark.operators import aggregates
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 10.0), (1, t0 + dt.timedelta(hours=2), 4.0),
            (1, t0 + dt.timedelta(hours=1), 2.0),   # out-of-order input
            (2, t0, 7.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                               "value double")
    got = {r.entity: (r.n_obs, r.ewma)
           for r in aggregates.ewma_last(df, "user_id", "ts",
                                         "value").collect()}
    # user 1 in ts order: 10 -> 0.5*2+0.5*10=6 -> 0.5*4+0.5*6=5
    assert got == {1: (3, 5.0), 2: (1, 7.0)}


def test_distribution_drift_hand_checked(spark):
    from geolake_spark.operators import aggregates
    old = spark.createDataFrame([(float(v),) for v in range(10)],
                                "value double")     # min 0 max 9
    # new shifts right: values 5..14 -> 14 clamps into the top bin
    new = spark.createDataFrame([(float(v),) for v in range(5, 15)],
                                "value double")
    out = {r.bin: (r.lo, r.hi, r.n_old, r.n_new)
           for r in aggregates.distribution_drift(old, new, "value",
                                                  nbins=3).collect()}
    # width 3: bins [0,3) [3,6) [6,9]; old 3/3/4 (9 clamps into bin 2);
    # new 0/1/9 (6..14 all clamp into bin 2)
    assert out == {0: (0.0, 3.0, 3, 0), 1: (3.0, 6.0, 3, 1),
                   2: (6.0, 9.0, 4, 9)}
    # empty bins still emitted
    assert len(out) == 3


def test_distribution_drift_constant_baseline(spark):
    from geolake_spark.operators import aggregates
    old = spark.createDataFrame([(5.0,), (5.0,)], "value double")
    new = spark.createDataFrame([(5.0,), (7.0,)], "value double")
    out = {r.bin: (r.n_old, r.n_new)
           for r in aggregates.distribution_drift(old, new, "value",
                                                  nbins=4).collect()}
    # degenerate width -> 1.0; everything >= mn lands by floor distance
    assert sum(n for n, _ in out.values()) == 2
    assert sum(n for _, n in out.values()) == 2

def test_lag_features_hand_checked(spark):
    import datetime as dt

    from geolake_spark.operators import aggregates
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=s), float(v))
            for s, v in [(0, 10.0), (2, 30.0), (1, 20.0)]]  # out of order
    rows += [(2, t0, 5.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                               "value double")
    got = {(r.entity, r.value): (r.value_lag1, r.value_lag2, r.value_lag3,
                                 r.gap_us)
           for r in aggregates.lag_features(df, "user_id", "ts",
                                            "value").collect()}
    # user 1 in ts order: 10, 20, 30 with 1s gaps
    assert got[(1, 10.0)] == (None, None, None, None)
    assert got[(1, 20.0)] == (10.0, None, None, 1_000_000)
    assert got[(1, 30.0)] == (20.0, 10.0, None, 1_000_000)
    assert got[(2, 5.0)] == (None, None, None, None)


def test_lag_features_single_window_shuffle(spark):
    """All lags + the gap share one (ts, value)-ordered frame: exactly one
    Exchange and one Window node in the physical plan."""
    from geolake_spark.operators import aggregates
    df = spark.range(10).select(
        F.col("id").alias("user_id"),
        F.col("id").cast("timestamp").alias("ts"),
        F.col("id").cast("double").alias("value"))
    plan = (aggregates.lag_features(df, "user_id", "ts", "value")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 1
    assert plan.count("Window") == 1

def test_ohlc_bars_hand_checked(spark):
    import datetime as dt

    from geolake_spark.operators import aggregates
    t0 = dt.datetime(2024, 1, 1, 9, 10)
    rows = [("a", t0, 5.0), ("a", t0 + dt.timedelta(minutes=5), 9.0),
            ("a", t0 + dt.timedelta(minutes=9), 2.0),
            ("a", t0, 3.0),                       # ts tie: value breaks it
            ("a", t0 + dt.timedelta(hours=1), 7.0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, "
                               "value double")
    got = {(r.event_type, r.bar.hour): (r.open, r.high, r.low, r.close,
                                        r.n_obs)
           for r in aggregates.ohlc_bars(df, "ts", "value",
                                         ["event_type"]).collect()}
    # 9:00 bar: open = min(struct) = (t0, 3.0); close = (9:19, 2.0)
    assert got[("a", 9)] == (3.0, 9.0, 2.0, 2.0, 4)
    assert got[("a", 10)] == (7.0, 7.0, 7.0, 7.0, 1)


# ------------------------------------------------------------ ab_zscores

def test_ab_zscores_hand_checked(spark):
    from geolake_spark.operators import aggregates as ag
    # variant A: users 1,2 (u1 converts on 'buy'); variant B: users 3,4
    # (both convert on 'buy')
    rows = [
        (1, "A", "buy"), (1, "A", "buy"),      # repeat events: still 1 conv
        (2, "A", "view"),
        (3, "B", "buy"), (4, "B", "buy"), (4, "B", "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, variant string, "
                               "event_type string")
    out = {r.metric: r for r in ag.ab_zscores(df).collect()}
    buy = out["buy"]
    assert (buy.n_a, buy.x_a, buy.n_b, buy.x_b) == (2, 1, 2, 2)
    import math
    p = 3 / 4
    z = (1 / 2 - 2 / 2) / math.sqrt(p * (1 - p) * (1 / 2 + 1 / 2))
    assert buy.z == round(z, 6)
    view = out["view"]
    assert (view.x_a, view.x_b) == (1, 1) and view.z == 0.0


def test_ab_zscores_one_sided_variant(spark):
    from geolake_spark.operators import aggregates as ag
    df = spark.createDataFrame([(1, "A", "buy")],
                               "user_id long, variant string, "
                               "event_type string")
    out = ag.ab_zscores(df).collect()[0]
    assert out.n_b is None and out.z is None   # no B variant: z undefined


def test_cusum_hand_checked(spark):
    import datetime as dt

    from geolake_spark.operators import aggregates
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate([1.00, 1.00, 3.00, 1.00])]
    df = spark.createDataFrame(rows, "user_id long, event_id long, "
                               "ts timestamp, value double")
    out = aggregates.cusum_alarms(df, target_cents=100, slack_cents=0,
                                  threshold_cents=150).collect()
    assert len(out) == 1
    r = out[0]
    # d_hi = 0,0,200,0 -> s_hi = 0,0,200,200: alarms at rows 2 and 3
    assert (r.n_obs, r.max_hi, r.max_lo, r.n_alarms,
            r.first_alarm_id) == (4, 200, 0, 2, 2)


def test_cusum_matches_direct_recursion(spark):
    """The window form (prefix sum - running min) must equal the
    textbook fold s = max(0, s + d) on an arbitrary seeded series."""
    import datetime as dt
    import random

    from geolake_spark.operators import aggregates
    rng = random.Random(42)
    t0 = dt.datetime(2024, 1, 1)
    target, slack, h = 500, 100, 900
    rows, expect = [], {}
    for ent in range(5):
        vals = [rng.randint(0, 1200) for _ in range(40)]
        sh = sl = mh = ml = na = 0
        first = None
        for i, c in enumerate(vals):
            sh = max(0, sh + c - (target + slack))
            sl = max(0, sl + (target - slack) - c)
            mh, ml = max(mh, sh), max(ml, sl)
            if sh > h or sl > h:
                na += 1
                if first is None:
                    first = i
            rows.append((ent, i, t0 + dt.timedelta(minutes=i), c / 100.0))
        expect[ent] = (len(vals), mh, ml, na, first)
    df = spark.createDataFrame(rows, "user_id long, event_id long, "
                               "ts timestamp, value double")
    got = {r.entity: (r.n_obs, r.max_hi, r.max_lo, r.n_alarms,
                      r.first_alarm_id)
           for r in aggregates.cusum_alarms(
               df, target_cents=target, slack_cents=slack,
               threshold_cents=h).collect()}
    assert got == expect


def test_cusum_plan_one_exchange_no_python(spark):
    """The reflected-walk form must keep CUSUM on ONE entity-hash
    shuffle (both windows + the final groupBy reuse it) with zero
    Python in the plan."""
    import re

    from geolake_spark.operators import aggregates
    ev = spark.createDataFrame(
        [(1, 1, __import__("datetime").datetime(2024, 1, 1), 1.0)],
        "user_id long, event_id long, ts timestamp, value double")
    out = aggregates.cusum_alarms(ev, 100, 0, 50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Python" not in plan and "ArrowEval" not in plan
