"""Geohash (cells.geohash / geo.geohash_col): known vectors, three-way
parity, prefix containment, codegen-only plan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark import cells
from geolake_spark.functions import geo


def test_known_vectors():
    # canonical example from the public geohash description
    assert cells.geohash([57.64911], [10.40744], 11)[0] == "u4pruydqqvj"
    assert cells.geohash([57.64911], [10.40744], 5)[0] == "u4pru"
    assert cells.geohash([-90.0], [-180.0], 7)[0] == "0000000"
    assert cells.geohash([90.0], [180.0], 7)[0] == "zzzzzzz"


def test_prefix_containment():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-90, 90, 300)
    lon = rng.uniform(-180, 180, 300)
    g7 = cells.geohash(lat, lon, 7)
    for p in (1, 3, 5):
        gp = cells.geohash(lat, lon, p)
        assert all(long[:p] == short for long, short in zip(g7, gp))


def test_spark_matches_numpy(spark):
    rng = np.random.RandomState(11)
    lat = rng.uniform(-90, 90, 400)
    lon = rng.uniform(-180, 180, 400)
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    got = [r[0] for r in df.select(
        geo.geohash_col(F.col("lat"), F.col("lon"), 7)).collect()]
    assert got == list(cells.geohash(lat, lon, 7))


def test_geohash_col_is_codegen_only(spark):
    df = spark.createDataFrame(pd.DataFrame({"lat": [1.0], "lon": [2.0]}))
    plan = df.select(geo.geohash_col(F.col("lat"), F.col("lon"), 6)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decode_roundtrip_within_cell():
    rng = np.random.RandomState(21)
    lat = rng.uniform(-90, 90, 300)
    lon = rng.uniform(-180, 180, 300)
    for p, tol_lat, tol_lon in [(5, 0.022, 0.044), (7, 0.0007, 0.0014)]:
        g = cells.geohash(lat, lon, p)
        dlat, dlon = cells.geohash_decode(g, p)
        # decoded center is inside the original cell: re-encoding matches
        assert list(cells.geohash(dlat, dlon, p)) == list(g)
        assert np.abs(dlat - lat).max() <= tol_lat
        assert np.abs(dlon - lon).max() <= tol_lon


def test_decode_known_vector():
    lat, lon = cells.geohash_decode(["u4pruyd"], 7)
    assert abs(lat[0] - 57.64911) < 0.001 and abs(lon[0] - 10.40744) < 0.001
