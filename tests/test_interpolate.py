"""Time-series gap filling (aggregates.interpolate_gaps): hand-checked
linear values, exact-hit and tail semantics."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import aggregates

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def _series(spark, points):
    return spark.createDataFrame(pd.DataFrame(
        [(1, T0 + dt.timedelta(hours=h), v) for h, v in points],
        columns=["user_id", "ts", "value"]))


def test_linear_values(spark):
    # obs at h=0 (v=10) and h=4 (v=30): hourly grid interpolates 10,15,20,25,30
    out = aggregates.interpolate_gaps(
        _series(spark, [(0, 10.0), (4, 30.0)]), step="1 hour").collect()
    vals = {r.grid_ts.hour: (r.value, r.interpolated) for r in out}
    assert vals == {0: (10.0, False), 1: (15.0, True), 2: (20.0, True),
                    3: (25.0, True), 4: (30.0, False)}


def test_exact_hits_take_observed_value(spark):
    # an observation exactly on a grid point must win over interpolation
    out = aggregates.interpolate_gaps(
        _series(spark, [(0, 1.0), (2, 99.0), (4, 5.0)]),
        step="2 hours").collect()
    vals = {r.grid_ts.hour: r.value for r in out}
    assert vals[2] == 99.0
    assert all(not r.interpolated for r in out)


def test_off_grid_observation_shapes_neighbors(spark):
    # obs at h=0 (0), h=3 (30), h=4 (40); hourly grid: h=1 -> 10, h=2 -> 20
    out = aggregates.interpolate_gaps(
        _series(spark, [(0, 0.0), (3, 30.0), (4, 40.0)]),
        step="1 hour").collect()
    vals = {r.grid_ts.hour: r.value for r in out}
    assert vals[1] == pytest.approx(10.0) and vals[2] == pytest.approx(20.0)


def test_multiple_entities_independent(spark):
    a = _series(spark, [(0, 0.0), (2, 2.0)])
    b = a.withColumn("user_id", F.lit(2)).withColumn(
        "value", F.col("value") * 10)
    out = aggregates.interpolate_gaps(a.unionByName(b), step="1 hour")
    vals = {(r.user_id, r.grid_ts.hour): r.value for r in out.collect()}
    assert vals[(1, 1)] == 1.0 and vals[(2, 1)] == 10.0
