"""Tile materialization: rollup/salt equivalence, regrid, GeoJSON export,
partitioned writes."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from geolake_spark import cells
from geolake_spark.operators import tiles


def test_salted_rollup_equals_direct(spark, pages):
    direct = (tiles.assign_tiles(pages, 7)
              .groupBy("tile_z", "tile_x", "tile_y")
              .agg(F.count("*").alias("page_count")))
    salted = tiles.rollup_tiles(pages, 7, salt_buckets=16)
    a = {(r["tile_x"], r["tile_y"]): r["page_count"] for r in direct.collect()}
    b = {(r["tile_x"], r["tile_y"]): r["page_count"] for r in salted.collect()}
    assert a == b


def test_regrid_values_match_pandas(spark, pages):
    df = pages.withColumn("value", F.col("lat") * 2 + F.col("lon"))
    out = tiles.regrid(df, zoom=5, value_col="value", operator="nanmean")
    got = {(r["tile_x"], r["tile_y"]): r["value"] for r in out.collect()}
    pdf = df.select("lat", "lon", "value").toPandas()
    xt, yt = cells.tile_xy(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 5)
    pdf["tx"], pdf["ty"] = xt, yt
    exp = pdf.groupby(["tx", "ty"])["value"].mean()
    assert len(got) == len(exp)
    for (tx, ty), v in exp.items():
        assert abs(got[(tx, ty)] - v) < 1e-9


def test_geojson_export_is_valid_features(spark, pages):
    stats = tiles.rollup_tiles(pages, 4)
    feats = [json.loads(r["feature"]) for r in
             tiles.tiles_geojson(stats).collect()]
    assert len(feats) == stats.count()
    f = feats[0]
    assert f["type"] == "Feature" and f["geometry"]["type"] == "Polygon"
    ring = f["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]  # closed ring
    assert "page_count" in f["properties"]
    # tile polygon must contain the tile's own bounds midpoint
    lons = [p[0] for p in ring]; lats = [p[1] for p in ring]
    assert min(lons) >= -180 and max(lons) <= 180
    assert min(lats) >= -86 and max(lats) <= 86


def test_write_tiles_partition_layout(spark, pages, tmp_path):
    out = str(tmp_path / "tiles")
    tiles.write_tiles(pages.limit(200), out, zoom=3)
    back = spark.read.parquet(out)
    assert back.count() == 200
    import os
    zdirs = [d for d in os.listdir(out) if d.startswith("tile_z=")]
    assert zdirs == ["tile_z=3"]
    xdirs = os.listdir(os.path.join(out, "tile_z=3"))
    assert all(d.startswith("tile_x=") for d in xdirs if not d.startswith("_"))


def test_pyramid_levels_consistent(spark, pages):
    pyr = tiles.build_pyramid(pages, max_zoom=6, min_zoom=3)
    pdf = pyr.toPandas()
    total = pages.count()
    for z, grp in pdf.groupby("tile_z"):
        assert grp["page_count"].sum() == total  # every level covers all pages
    # every parent equals the sum of its children
    z6 = pdf[pdf.tile_z == 6]
    z5 = pdf[pdf.tile_z == 5].set_index(["tile_x", "tile_y"])["page_count"]
    child_sum = (z6.assign(px=z6.tile_x // 2, py=z6.tile_y // 2)
                 .groupby(["px", "py"])["page_count"].sum())
    assert child_sum.to_dict() == z5.to_dict()
