"""Grid-density spatial clustering (DBSCAN at cell granularity).

The geospatial-tier clustering operator: points are bucketed into
equirectangular grid cells (cells.py scheme — the same ids the tiling /
rollup layer uses), cells holding at least ``min_pts`` points are
*dense*, and dense cells that touch (8-neighborhood; x wraps across the
antimeridian, y clamps at the poles) merge into one cluster through the
O(log n) alternating-star connected-components contraction
(operators/dedup.py).  This is the classic scalable approximation of
DBSCAN (grid-based DBSCAN / GriDBSCAN family, public algorithms): eps is
the cell width, min_pts is the per-cell density threshold, and the
result is deterministic — cluster id = min cell id in the component.

Scale shape (the 10^12-point story): the point scan aggregates straight
to cells (ONE partial-agg'd groupBy — output is bounded by the number of
OCCUPIED cells, not points); the neighbor-edge build explodes each dense
cell to its <= 8 arithmetic neighbors (pure codegen, no UDF) and
semi-joins against the dense-cell set — both sides are cell-counts-sized.
Hot urban cells don't skew anything: they've already collapsed to one
row per cell before any join.

Reference analogue: none (geolake delegates spatial math to geokube and
has no clustering); this extends the repo's geospatial surface the same
way kNN/PIP do (SURVEY.md §2 J1-J2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geolake_spark import cells
from geolake_spark.functions import geo
from geolake_spark.operators import dedup

_RES_UNIT = 1 << 56
_IY_UNIT = 1 << 28

# 8-neighborhood offsets (dx, dy)
_NEIGHBOR_OFFSETS = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                     (0, 1), (1, -1), (1, 0), (1, 1)]


def dense_cells(df: DataFrame, res: int, min_pts: int = 1,
                lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """``(cell, n_points)`` for cells with >= ``min_pts`` points."""
    cell = geo.grid_cell_col(F.col(lat_col), F.col(lon_col), res)
    return (df.select(cell.alias("cell"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .filter(F.col("n_points") >= min_pts))


def _neighbor_edges(occ: DataFrame, res: int) -> DataFrame:
    """(src, dst) pairs of touching dense cells — neighbors are computed
    arithmetically from the cell id (ix wraps mod nx, iy clamps), then
    kept only if the neighbor is itself dense (join against ``occ``)."""
    nx, ny = cells.grid_dims(res)
    c = F.col("cell")
    # bitwise, not '/': cell ids exceed 2^53, float division would round
    ix = c.bitwiseAND(F.lit(_IY_UNIT - 1))
    iy = F.shiftright(c, 28).bitwiseAND(F.lit(_IY_UNIT - 1))
    nbrs = []
    for dx, dy in _NEIGHBOR_OFFSETS:
        nix = (ix + F.lit(dx + nx)) % F.lit(nx)
        niy = iy + F.lit(dy)
        nbr = (F.lit(res * _RES_UNIT).cast("bigint")
               + niy * F.lit(_IY_UNIT).cast("bigint") + nix)
        # poles: rows outside [0, ny) yield NULL and are filtered
        nbrs.append(F.when((niy >= 0) & (niy < ny), nbr))
    out = (occ.select(c.alias("src"),
                      F.explode(F.array(*nbrs)).alias("dst"))
           .filter(F.col("dst").isNotNull()))
    dense = occ.select(F.col("cell").alias("dst"))
    return out.join(dense, "dst")


def grid_clusters(df: DataFrame, res: int, min_pts: int = 1,
                  lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """``(cell, cluster_id, n_points)`` — every dense cell labeled with
    the min cell id reachable through touching dense cells."""
    occ = dense_cells(df, res, min_pts, lat_col, lon_col)
    edges = _neighbor_edges(occ, res)
    # self-pairs keep isolated dense cells labeled (CC contract: a label
    # for every id in pairs)
    pairs = edges.union(occ.select(F.col("cell").alias("src"),
                                   F.col("cell").alias("dst")))
    comp = dedup.connected_components(pairs, id_a="src", id_b="dst")
    return (occ.join(comp.withColumnRenamed("id", "cell"), "cell")
            .select("cell", F.col("component").alias("cluster_id"),
                    "n_points"))


def cluster_stats(df: DataFrame, res: int, min_pts: int = 1,
                  lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Per-cluster rollup: ``(cluster_id, n_cells, n_points)``."""
    cl = grid_clusters(df, res, min_pts, lat_col, lon_col)
    return (cl.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("n_points").alias("n_points")))


def assign_clusters(df: DataFrame, res: int, min_pts: int = 1,
                    lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Input rows + ``cluster_id`` (null for points in sparse cells).
    The label table is cell-sized; it broadcasts when small and hash-joins
    on the cell key otherwise — either way the point table is scanned
    once."""
    cl = grid_clusters(df, res, min_pts, lat_col, lon_col)
    cell = geo.grid_cell_col(F.col(lat_col), F.col(lon_col), res)
    return (df.withColumn("cell", cell)
            .join(cl.select("cell", "cluster_id"), "cell", "left"))


def dense_cells_sql(points_sql: str, res: int, min_pts: int = 1,
                    lat_expr: str = "lat", lon_expr: str = "lon") -> str:
    cell = cells.grid_cell_sql(lat_expr, lon_expr, res)
    return (f"SELECT {cell} AS cell, count(*) AS n_points "
            f"FROM ({points_sql}) GROUP BY 1 "
            f"HAVING count(*) >= {min_pts}")


def grid_clusters_sql(points_sql: str, res: int, min_pts: int = 1,
                      lat_expr: str = "lat", lon_expr: str = "lon") -> str:
    """DuckDB mirror: same dense-cell agg, same arithmetic neighbor
    edges, RECURSIVE min-label components (exact on oracle-sized data)."""
    nx, ny = cells.grid_dims(res)
    occ = dense_cells_sql(points_sql, res, min_pts, lat_expr, lon_expr)
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _NEIGHBOR_OFFSETS)
    return f"""
WITH RECURSIVE _occ AS (
    {occ}
), _d(dx, dy) AS (VALUES {offs}),
_edges AS (
    SELECT o.cell AS src, n.cell AS dst
    FROM (SELECT o.cell,
                 {res} * {_RES_UNIT}
                 + ((o.cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy) * {_IY_UNIT}
                 + ((o.cell % {_IY_UNIT}) + d.dx + {nx}) % {nx} AS nbr
          FROM _occ o, _d d
          WHERE (o.cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy >= 0
            AND (o.cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy < {ny}) o
    JOIN _occ n ON n.cell = o.nbr
    UNION SELECT cell, cell FROM _occ
),
_lbl(id, lbl) AS (
    SELECT src, min(dst) FROM (
        SELECT src, dst FROM _edges
        UNION SELECT dst, src FROM _edges) GROUP BY src
    UNION
    SELECT e.src, l.lbl FROM _lbl l
    JOIN (SELECT src, dst FROM _edges
          UNION SELECT dst, src FROM _edges) e ON e.dst = l.id
    WHERE l.lbl < e.src
),
_comp AS (SELECT id AS cell, min(lbl) AS cluster_id FROM _lbl GROUP BY id)
SELECT o.cell AS cell, c.cluster_id AS cluster_id, o.n_points AS n_points
FROM _occ o JOIN _comp c ON c.cell = o.cell"""


def cluster_stats_sql(points_sql: str, res: int, min_pts: int = 1,
                      lat_expr: str = "lat", lon_expr: str = "lon") -> str:
    inner = grid_clusters_sql(points_sql, res, min_pts, lat_expr, lon_expr)
    return (f"SELECT cluster_id, count(*) AS n_cells, "
            f"sum(n_points) AS n_points FROM ({inner}) GROUP BY 1")


# ---------------------------------------------------------------------------
# Polygon rasterization — vector -> raster cell cover, fully distributed
# ---------------------------------------------------------------------------
# The driver-side cover builder (operators/joins.build_pip_cover) is
# right for PIP joins, where polygons are the broadcast side.  This is
# the other direction: a polygon TABLE of any size rasterizes to
# (polygon_id, cell) rows with no driver collect and no UDF — bbox,
# edge arrays, candidate-cell generation, and the even-odd ray-cast are
# all higher-order-function expressions inside whole-stage codegen (the
# joins.py pattern: an aggregate over the edge array keeps generated
# code tiny at any vertex count).
#
# Containment rule: a cell belongs to the polygon iff its CENTER is
# inside (even-odd rule over all rings, so holes subtract naturally) —
# the standard center-sample rasterization.  Contract: rings must not
# cross the antimeridian (split them first — the PIP cover path shows
# the shift recipe); open rings are closed implicitly.


def _ring_edges(r):
    """array<array<double>> ring -> array of [x1,y1,x2,y2] edges, with
    an implicit closing edge when the ring is open."""
    m = F.size(r)
    seq = F.transform(
        F.sequence(F.lit(1), F.greatest(m - 1, F.lit(1))),
        lambda i: F.array(
            F.element_at(F.element_at(r, i), 1),
            F.element_at(F.element_at(r, i), 2),
            F.element_at(F.element_at(r, (i + 1).cast("int")), 1),
            F.element_at(F.element_at(r, (i + 1).cast("int")), 2)))
    first, last = F.element_at(r, 1), F.element_at(r, -1)
    closing = F.when(
        (F.element_at(first, 1) != F.element_at(last, 1))
        | (F.element_at(first, 2) != F.element_at(last, 2)),
        F.array(F.array(F.element_at(last, 1), F.element_at(last, 2),
                        F.element_at(first, 1), F.element_at(first, 2)))) \
        .otherwise(F.array().cast("array<array<double>>"))
    return F.when(m < 2, F.array().cast("array<array<double>>")) \
        .otherwise(F.concat(seq, closing))


def polygon_raster_cells(polygons: DataFrame, res: int,
                         id_col: str = "polygon_id",
                         rings_col: str = "rings") -> DataFrame:
    """``(polygon_id, cell)`` — every res-cell whose center falls inside
    the polygon (rings: array<array<array<double>>> of [lon, lat])."""
    nx, ny = cells.grid_dims(res)
    rings = F.col(rings_col)
    pts = F.flatten(rings)
    xs = F.transform(pts, lambda p: F.element_at(p, 1))
    ys = F.transform(pts, lambda p: F.element_at(p, 2))
    w, e = F.array_min(xs), F.array_max(xs)
    s, n = F.array_min(ys), F.array_max(ys)
    ix0 = F.least(F.greatest(F.floor((w + 180.0) / 360.0 * nx), F.lit(0)),
                  F.lit(nx - 1)).cast("bigint")
    ix1 = F.least(F.greatest(F.floor((e + 180.0) / 360.0 * nx), F.lit(0)),
                  F.lit(nx - 1)).cast("bigint")
    iy0 = F.least(F.greatest(F.floor((F.lit(90.0) - n) / 180.0 * ny),
                             F.lit(0)), F.lit(ny - 1)).cast("bigint")
    iy1 = F.least(F.greatest(F.floor((F.lit(90.0) - s) / 180.0 * ny),
                             F.lit(0)), F.lit(ny - 1)).cast("bigint")
    edges = F.flatten(F.transform(rings, _ring_edges))
    base = polygons.select(
        F.col(id_col).alias("polygon_id"), edges.alias("_edges"),
        F.explode(F.sequence(iy0, iy1)).alias("iy"),
        ix0.alias("_ix0"), ix1.alias("_ix1"))
    grid = base.select(
        "polygon_id", "_edges", "iy",
        F.explode(F.sequence(F.col("_ix0"), F.col("_ix1"))).alias("ix"))
    lat = F.lit(90.0) - (F.col("iy") + 0.5) * (180.0 / ny)
    lon = (F.col("ix") + 0.5) * (360.0 / nx) - 180.0
    x1 = lambda ed: F.element_at(ed, 1)
    y1 = lambda ed: F.element_at(ed, 2)
    x2 = lambda ed: F.element_at(ed, 3)
    y2 = lambda ed: F.element_at(ed, 4)
    # identical IEEE arithmetic to joins.pip_join / cells.points_in_ring
    crossing = F.aggregate(
        F.filter(F.col("_edges"),
                 lambda ed: (y1(ed) > lat) != (y2(ed) > lat)),
        F.lit(0),
        lambda acc, ed: acc + F.when(
            lon < x1(ed)
            + ((lat - y1(ed)) * (x2(ed) - x1(ed))) / (y2(ed) - y1(ed)),
            F.lit(1)).otherwise(F.lit(0)))
    cell = (F.lit(res * _RES_UNIT).cast("bigint")
            + F.col("iy") * F.lit(_IY_UNIT).cast("bigint") + F.col("ix"))
    return (grid.filter((crossing % 2) == 1)
            .select("polygon_id", cell.alias("cell")))


def polygon_raster_cells_sql(polys_sql: str, res: int,
                             id_expr: str = "polygon_id",
                             rings_expr: str = "rings") -> str:
    """DuckDB mirror: same bbox clamps, same implicit ring closing, same
    even-odd ray-cast (CASE-guarded so the intercept never divides by a
    zero straddle — matching Spark's filter-then-aggregate shape)."""
    nx, ny = cells.grid_dims(res)
    edges = f"""flatten(list_transform({rings_expr}, r ->
      CASE WHEN len(r) < 2 THEN []::DOUBLE[][]
      ELSE list_concat(
        list_transform(range(1, greatest(len(r) - 1, 1) + 1),
          i -> [r[i][1], r[i][2], r[i+1][1], r[i+1][2]]),
        CASE WHEN r[1][1] <> r[-1][1] OR r[1][2] <> r[-1][2]
             THEN [[r[-1][1], r[-1][2], r[1][1], r[1][2]]]
             ELSE []::DOUBLE[][] END) END))"""
    return f"""
WITH _pr_poly AS (
  SELECT {id_expr} AS polygon_id, {edges} AS edges,
         list_min(list_transform(flatten({rings_expr}), p -> p[1])) AS w,
         list_max(list_transform(flatten({rings_expr}), p -> p[1])) AS e,
         list_min(list_transform(flatten({rings_expr}), p -> p[2])) AS s,
         list_max(list_transform(flatten({rings_expr}), p -> p[2])) AS n
  FROM ({polys_sql})
), _pr_grid AS (
  SELECT polygon_id, edges, u1.iy AS iy, u2.ix AS ix
  FROM _pr_poly,
    unnest(range(least(greatest(cast(floor((90.0 - n) / 180.0 * {ny}) as bigint), 0), {ny - 1}),
                 least(greatest(cast(floor((90.0 - s) / 180.0 * {ny}) as bigint), 0), {ny - 1}) + 1)) AS u1(iy),
    unnest(range(least(greatest(cast(floor((w + 180.0) / 360.0 * {nx}) as bigint), 0), {nx - 1}),
                 least(greatest(cast(floor((e + 180.0) / 360.0 * {nx}) as bigint), 0), {nx - 1}) + 1)) AS u2(ix)
), _pr_hit AS (
  SELECT polygon_id, iy, ix,
         len(list_filter(edges, ed ->
           (ed[2] > 90.0 - (iy + 0.5) * {180.0 / ny!r}) <> (ed[4] > 90.0 - (iy + 0.5) * {180.0 / ny!r})
           AND CASE WHEN (ed[2] > 90.0 - (iy + 0.5) * {180.0 / ny!r}) <> (ed[4] > 90.0 - (iy + 0.5) * {180.0 / ny!r})
               THEN (ix + 0.5) * {360.0 / nx!r} - 180.0 < ed[1]
                 + (((90.0 - (iy + 0.5) * {180.0 / ny!r}) - ed[2]) * (ed[3] - ed[1])) / (ed[4] - ed[2])
               ELSE false END)) AS crossings
  FROM _pr_grid
)
SELECT polygon_id,
       {res} * {_RES_UNIT} + iy * {_IY_UNIT} + ix AS cell
FROM _pr_hit WHERE crossings % 2 = 1"""


# ---------------------------------------------------------------------------
# Cell-grid smoothing (3x3 box blur) — heatmap/tile rendering prep
# ---------------------------------------------------------------------------
# A raw per-cell histogram renders noisy at tile zoom levels; the
# standard fix is a small convolution over the cell grid.  Distributed
# shape: each occupied cell SCATTERS its value to the 9 cells of its
# 3x3 neighborhood (explode of arithmetic neighbor ids — same wrap/
# clamp rules as the clustering above, pure codegen), then ONE
# partial-agg'd groupBy(cell) sums contributions.  Output cells include
# halo cells that had no points but have occupied neighbors (how a blur
# should behave); values stay INTEGER (uniform kernel), so the DuckDB
# value oracle is exact with no float-order caveats.


def smooth_cells(hist: DataFrame, res: int,
                 cell_col: str = "cell",
                 value_col: str = "n_points") -> DataFrame:
    """``(cell, smooth)`` — 3x3 uniform-kernel sum over an occupied-cell
    histogram (``smooth`` = sum of the value over the cell itself and
    its 8 neighbors)."""
    nx, ny = cells.grid_dims(res)
    c = F.col(cell_col)
    ix = c.bitwiseAND(F.lit(_IY_UNIT - 1))
    iy = F.shiftright(c, 28).bitwiseAND(F.lit(_IY_UNIT - 1))
    scatter = []
    for dx, dy in _NEIGHBOR_OFFSETS + [(0, 0)]:
        nix = (ix + F.lit(dx + nx)) % F.lit(nx)
        niy = iy + F.lit(dy)
        tgt = (F.lit(res * _RES_UNIT).cast("bigint")
               + niy * F.lit(_IY_UNIT).cast("bigint") + nix)
        scatter.append(F.when((niy >= 0) & (niy < ny), tgt))
    return (hist.select(F.explode(F.array(*scatter)).alias("cell"),
                        F.col(value_col).alias("_v"))
            .filter(F.col("cell").isNotNull())
            .groupBy("cell")
            .agg(F.sum("_v").alias("smooth")))


def smooth_cells_sql(hist_sql: str, res: int,
                     cell_expr: str = "cell",
                     value_expr: str = "n_points") -> str:
    """DuckDB mirror: same arithmetic scatter targets, same integer sum."""
    nx, ny = cells.grid_dims(res)
    offs = ", ".join(f"({dx}, {dy})"
                     for dx, dy in _NEIGHBOR_OFFSETS + [(0, 0)])
    return f"""
WITH _sm_h AS ({hist_sql}), _sm_d(dx, dy) AS (VALUES {offs})
SELECT {res} * {_RES_UNIT}
       + (({cell_expr} // {_IY_UNIT}) % {_IY_UNIT} + dy) * {_IY_UNIT}
       + (({cell_expr} % {_IY_UNIT}) + dx + {nx}) % {nx} AS cell,
       sum({value_expr}) AS smooth
FROM _sm_h, _sm_d
WHERE ({cell_expr} // {_IY_UNIT}) % {_IY_UNIT} + dy >= 0
  AND ({cell_expr} // {_IY_UNIT}) % {_IY_UNIT} + dy < {ny}
GROUP BY 1"""


# ---------------------------------------------------------------------------
# IDW interpolation to the grid (station obs -> raster)
# ---------------------------------------------------------------------------
# Inverse-distance-weighted regridding (classic geostatistics): every
# grid cell within ``radius_km`` of at least one station gets
# ``sum(w_i * v_i) / sum(w_i)`` with ``w = 1 / max(d, eps)^2`` over the
# stations in range.  Distributed shape: each STATION scatters to its
# sound disc cover (cells.radius_cover — the same Arrow cover the
# radius join uses), the cell-center distance refines membership
# exactly, and ONE partial-agg'd groupBy(cell) folds the weighted sums.
# No join at all — the scatter explode is map-side.
#
# Oracle contract: cover shape is irrelevant to the RESULT (any sound
# superset refines to the same membership, because the center-distance
# test is the same bit-exact haversine in both engines), so the DuckDB
# twin uses a simpler generous cover (full longitude ring per station's
# latitude band).  Weight sums are floats over a variable station set —
# deterministic mode folds them in sorted station order (the
# operators/graph.py trick) so the oracle replays them bit-for-bit.


def idw_to_grid(stations: DataFrame, res: int, radius_km: float,
                id_col: str = "station_id", lat_col: str = "lat",
                lon_col: str = "lon", val_col: str = "value",
                eps_km: float = 1e-3,
                deterministic: bool = False) -> DataFrame:
    """``(cell, n_stations, idw_value)`` at grid ``res``."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf
    nx, ny = cells.grid_dims(res)

    @pandas_udf(T.ArrayType(T.LongType()))
    def cover_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series([
            cells.radius_cover(float(la), float(lo), radius_km, res,
                               max_cover=65536)
            for la, lo in zip(lat.to_numpy(), lon.to_numpy())])

    st = (stations.select(F.col(id_col).alias("_sid"),
                          F.col(lat_col).alias("_slat"),
                          F.col(lon_col).alias("_slon"),
                          F.col(val_col).alias("_sval"))
          .withColumn("cell", F.explode(
              cover_udf(F.col("_slat"), F.col("_slon")))))
    ix = F.col("cell").bitwiseAND(F.lit(_IY_UNIT - 1))
    iy = F.shiftright(F.col("cell"), 28).bitwiseAND(F.lit(_IY_UNIT - 1))
    clat = F.lit(90.0) - (iy + 0.5) * (180.0 / ny)
    clon = (ix + 0.5) * (360.0 / nx) - 180.0
    d = geo.haversine_col(clat, clon, F.col("_slat"), F.col("_slon"))
    w = F.lit(1.0) / (F.greatest(d, F.lit(eps_km))
                      * F.greatest(d, F.lit(eps_km)))
    hit = (st.withColumn("_d", d).filter(F.col("_d") <= radius_km)
           .withColumn("_w", w).withColumn("_wv", w * F.col("_sval")))
    if deterministic:
        from geolake_spark.operators.graph import _sorted_fold
        sw = _sorted_fold(F.struct(F.col("_sid"), F.col("_w").alias("v")))
        swv = _sorted_fold(F.struct(F.col("_sid"), F.col("_wv").alias("v")))
    else:
        sw, swv = F.sum("_w"), F.sum("_wv")
    return (hit.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_stations"),
                 F.round(swv / sw, 6).alias("idw_value")))


def idw_to_grid_sql(stations_sql: str, res: int, radius_km: float,
                    id_expr: str = "station_id", lat_expr: str = "lat",
                    lon_expr: str = "lon", val_expr: str = "value",
                    eps_km: float = 1e-3) -> str:
    """DuckDB twin of ``idw_to_grid(deterministic=True)`` — generous
    full-ring cover per station latitude band, identical refine and
    sorted weighted folds."""
    nx, ny = cells.grid_dims(res)
    import math
    dlat = math.degrees(radius_km / cells.EARTH_RADIUS_KM)
    hav = cells.haversine_sql(
        f"(90.0 - (u1.iy + 0.5) * {180.0 / ny!r})",
        f"((u2.ix + 0.5) * {360.0 / nx!r} - 180.0)", "s.slat", "s.slon")
    return f"""
WITH _iw_s AS (
  SELECT {id_expr} AS sid, {lat_expr} AS slat, {lon_expr} AS slon,
         {val_expr} AS sval
  FROM ({stations_sql})
), _iw_hit AS (
  SELECT {res} * {_RES_UNIT} + u1.iy * {_IY_UNIT} + u2.ix AS cell,
         s.sid, s.sval, {hav} AS d
  FROM _iw_s s,
    unnest(range(least(greatest(cast(floor((90.0 - (s.slat + {dlat!r})) / 180.0 * {ny}) as bigint), 0), {ny - 1}),
                 least(greatest(cast(floor((90.0 - (s.slat - {dlat!r})) / 180.0 * {ny}) as bigint), 0), {ny - 1}) + 1)) AS u1(iy),
    unnest(range(0, {nx})) AS u2(ix)
  WHERE {hav} <= {radius_km!r}
)
SELECT cell, count(*) AS n_stations,
       round(list_sum(list((1.0 / (greatest(d, {eps_km!r}) * greatest(d, {eps_km!r}))) * sval ORDER BY sid))
             / list_sum(list(1.0 / (greatest(d, {eps_km!r}) * greatest(d, {eps_km!r})) ORDER BY sid)), 6) AS idw_value
FROM _iw_hit GROUP BY cell"""


def morans_i(df: DataFrame, res: int, min_pts: int = 1,
             lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Global Moran's I spatial autocorrelation of per-cell point counts
    under binary 8-neighbor (queen) weights: one row ``(n_cells,
    n_edges, mean_count, moran_i)`` — the is-my-heatmap-clustered
    statistic (I > 0 clustered, ~0 random, < 0 dispersed).

    I = (N/W) * sum_edges((x_i - mu)(x_j - mu)) / sum_i((x_i - mu)^2).

    Determinism (oracle contract): counts are integers and mu is one
    exact integer-sum ratio; both float reductions are TWO-LEVEL sorted
    folds — per-src over dst-ordered neighbor terms, then across the
    src-ordered per-cell partials — so every addition sequence is total
    while both levels stay distributed; the second level folds a
    GRID-BOUNDED array (cells at a resolution are geometry-bounded, not
    data-bounded), so the pattern survives 100 TB inputs."""
    occ = dense_cells(df, res, min_pts, lat_col, lon_col).cache()
    stats = occ.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("n_points").alias("s")).collect()[0]
    n, mu = int(stats.n), float(stats.s) / float(stats.n)
    edges = _neighbor_edges(occ, res)
    xs = occ.select(F.col("cell"), (F.col("n_points") - F.lit(mu))
                    .alias("xd"))

    def fold(items):
        return F.aggregate(F.array_sort(items), F.lit(0.0),
                           lambda acc, x: acc + x["v"])

    ej = (edges
          .join(xs.select(F.col("cell").alias("src"),
                          F.col("xd").alias("xa")), "src")
          .join(xs.select(F.col("cell").alias("dst"),
                          F.col("xd").alias("xb")), "dst"))
    per_src = (ej.groupBy("src")
               .agg(F.count(F.lit(1)).alias("w"),
                    fold(F.collect_list(F.struct(
                        F.col("dst"), (F.col("xa") * F.col("xb"))
                        .alias("v")))).alias("p")))
    agg = per_src.agg(
        F.sum("w").alias("w_total"),
        fold(F.collect_list(F.struct(F.col("src"), F.col("p").alias("v"))))
        .alias("num")).collect()[0]
    den = xs.agg(fold(F.collect_list(F.struct(
        F.col("cell"), (F.col("xd") * F.col("xd")).alias("v"))))
    ).collect()[0][0]
    w_total = int(agg.w_total or 0)
    moran = ((n / w_total) * (float(agg.num) / float(den))
             if w_total and den else 0.0)
    spark = df.sparkSession
    # round via Spark's round (half-up == DuckDB round), not Python's
    # banker's rounding
    raw = spark.createDataFrame(
        [(n, w_total, mu, moran)],
        "n_cells bigint, n_edges bigint, mean_count double, "
        "moran_i double")
    return raw.select("n_cells", "n_edges",
                      F.round("mean_count", 9).alias("mean_count"),
                      F.round("moran_i", 9).alias("moran_i"))


def morans_i_sql(points_sql: str, res: int, min_pts: int = 1,
                 lat_expr: str = "lat", lon_expr: str = "lon") -> str:
    """DuckDB mirror of :func:`morans_i` — the same two-level ordered
    folds (list_sum over ORDER BY lists at both levels), the same
    arithmetic neighbor edges as grid_clusters_sql."""
    from geolake_spark import cells as _cells
    nx, ny = _cells.grid_dims(res)
    occ = dense_cells_sql(points_sql, res, min_pts, lat_expr, lon_expr)
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _NEIGHBOR_OFFSETS)
    return f"""
WITH _mi_occ AS ({occ}),
_mi_s AS (
  SELECT count(*) AS n, sum(n_points) AS s FROM _mi_occ
),
_mi_mu AS (SELECT n, cast(s AS DOUBLE) / cast(n AS DOUBLE) AS mu
           FROM _mi_s),
_d(dx, dy) AS (VALUES {offs}),
_mi_e AS (
  SELECT o.cell AS src,
         {res * _RES_UNIT}::BIGINT
           + (((o.cell >> 28) & {_IY_UNIT - 1}) + d.dy) * {_IY_UNIT}::BIGINT
           + (((o.cell & {_IY_UNIT - 1}) + d.dx + {nx}) % {nx}) AS dst
  FROM _mi_occ o, _d d
  WHERE ((o.cell >> 28) & {_IY_UNIT - 1}) + d.dy >= 0
    AND ((o.cell >> 28) & {_IY_UNIT - 1}) + d.dy < {ny}
),
_mi_ed AS (
  SELECT e.src, e.dst,
         (a.n_points - mu.mu) * (b.n_points - mu.mu) AS v
  FROM _mi_e e
  JOIN _mi_occ a ON a.cell = e.src
  JOIN _mi_occ b ON b.cell = e.dst
  CROSS JOIN _mi_mu mu
),
_mi_ps AS (
  SELECT src, count(*) AS w, list_sum(list(v ORDER BY dst)) AS p
  FROM _mi_ed GROUP BY src
),
_mi_num AS (
  SELECT sum(w) AS w_total, list_sum(list(p ORDER BY src)) AS num
  FROM _mi_ps
),
_mi_den AS (
  SELECT list_sum(list((n_points - mu.mu) * (n_points - mu.mu)
                       ORDER BY cell)) AS den
  FROM _mi_occ CROSS JOIN _mi_mu mu
)
SELECT s.n AS n_cells, cast(nu.w_total AS BIGINT) AS n_edges,
       round(mu.mu, 9) AS mean_count,
       round((cast(s.n AS DOUBLE) / nu.w_total) * (nu.num / d.den), 9)
         AS moran_i
FROM _mi_s s, _mi_mu mu, _mi_num nu, _mi_den d"""


def getis_ord(df: DataFrame, res: int, min_pts: int = 1,
              lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Getis-Ord Gi* hotspot scores per occupied cell (queen weights
    including self): ``(cell, n_points, w_i, gi_star)`` where
    gi_star = (S_nbr - W_i*mu) / (S*sqrt((n*W_i - W_i^2)/(n-1))) — the
    per-cell z-like statistic behind every "statistically significant
    hotspot" map.

    Exactness: every reduction is an INTEGER sum (neighborhood count
    sums, global count and count-of-squares), mu and S derive from two
    exact integer ratios, and each cell's score is one fixed scalar op
    sequence — no float accumulation anywhere, so the oracle replays it
    bit-identically with no sorted-fold machinery.  Shape: one neighbor
    join + one integer groupBy per cell; global stats are a single agg
    row broadcast as literals."""
    occ = dense_cells(df, res, min_pts, lat_col, lon_col).cache()
    g = occ.agg(F.count(F.lit(1)).alias("n"),
                F.sum("n_points").alias("s1"),
                F.sum(F.col("n_points") * F.col("n_points"))
                .alias("s2")).collect()[0]
    n, s1, s2 = int(g.n), int(g.s1), int(g.s2)
    if n < 2:
        raise ValueError("getis_ord needs >= 2 occupied cells")
    edges = _neighbor_edges(occ, res)
    nbr = (edges.join(occ.select(F.col("cell").alias("dst"),
                                 F.col("n_points").alias("xj")), "dst")
           .groupBy("src")
           .agg(F.count(F.lit(1)).alias("w_nbr"),
                F.sum("xj").alias("s_nbr")))
    j = (occ.join(nbr.withColumnRenamed("src", "cell"), "cell", "left")
         .select("cell", "n_points",
                 (F.coalesce(F.col("w_nbr"), F.lit(0)) + 1).alias("w_i"),
                 (F.coalesce(F.col("s_nbr"), F.lit(0))
                  + F.col("n_points")).alias("s_i")))
    mu = F.lit(s1).cast("double") / F.lit(n).cast("double")
    sd = F.sqrt(F.lit(s2).cast("double") / F.lit(n).cast("double")
                - mu * mu)
    wi = F.col("w_i").cast("double")
    den = sd * F.sqrt((F.lit(n).cast("double") * wi - wi * wi)
                      / F.lit(n - 1).cast("double"))
    gi = (F.col("s_i").cast("double") - wi * mu) / den
    return j.select("cell", "n_points", "w_i",
                    F.round(gi, 9).alias("gi_star"))


def getis_ord_sql(points_sql: str, res: int, min_pts: int = 1,
                  lat_expr: str = "lat", lon_expr: str = "lon") -> str:
    """DuckDB mirror of :func:`getis_ord` (identical scalar op order)."""
    from geolake_spark import cells as _cells
    nx, ny = _cells.grid_dims(res)
    occ = dense_cells_sql(points_sql, res, min_pts, lat_expr, lon_expr)
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _NEIGHBOR_OFFSETS)
    return f"""
WITH _go_occ AS ({occ}),
_go_g AS (
  SELECT count(*) AS n, sum(n_points) AS s1,
         sum(n_points * n_points) AS s2
  FROM _go_occ
),
_d(dx, dy) AS (VALUES {offs}),
_go_e AS (
  SELECT o.cell AS src,
         {res * _RES_UNIT}::BIGINT
           + (((o.cell >> 28) & {_IY_UNIT - 1}) + d.dy) * {_IY_UNIT}::BIGINT
           + (((o.cell & {_IY_UNIT - 1}) + d.dx + {nx}) % {nx}) AS dst
  FROM _go_occ o, _d d
  WHERE ((o.cell >> 28) & {_IY_UNIT - 1}) + d.dy >= 0
    AND ((o.cell >> 28) & {_IY_UNIT - 1}) + d.dy < {ny}
),
_go_n AS (
  SELECT e.src, count(*) AS w_nbr, sum(b.n_points) AS s_nbr
  FROM _go_e e JOIN _go_occ b ON b.cell = e.dst
  GROUP BY e.src
),
_go_j AS (
  SELECT o.cell, o.n_points,
         coalesce(nb.w_nbr, 0) + 1 AS w_i,
         coalesce(nb.s_nbr, 0) + o.n_points AS s_i
  FROM _go_occ o LEFT JOIN _go_n nb ON nb.src = o.cell
)
SELECT j.cell, j.n_points, cast(j.w_i AS BIGINT) AS w_i,
       round((cast(j.s_i AS DOUBLE)
              - cast(j.w_i AS DOUBLE)
                * (cast(g.s1 AS DOUBLE) / cast(g.n AS DOUBLE)))
             / (sqrt(cast(g.s2 AS DOUBLE) / cast(g.n AS DOUBLE)
                     - (cast(g.s1 AS DOUBLE) / cast(g.n AS DOUBLE))
                       * (cast(g.s1 AS DOUBLE) / cast(g.n AS DOUBLE)))
                * sqrt((cast(g.n AS DOUBLE) * cast(j.w_i AS DOUBLE)
                        - cast(j.w_i AS DOUBLE) * cast(j.w_i AS DOUBLE))
                       / cast(g.n - 1 AS DOUBLE))), 9) AS gi_star
FROM _go_j j, _go_g g"""


# ---------------------------------------------------------------------------
# Polygon-overlap pairs — raster-space polygon x polygon join.  Exact
# vector intersection needs geometry kernels; at 10^12-page scale the
# standard first pass is raster overlap: two polygons overlap iff they
# share a res-cell, and the shared-cell COUNT is the (cell-area-quantized)
# intersection area.  Reuses the dedup candidate machinery: cells are the
# buckets, polygon ids the members, dedupe=False turns the HOF pair
# stream into a multiplicity count — so the pair generation inherits the
# capped, pre-filtered, one-shuffle shape audited for MinHash (a hot cell
# shared by k polygons is exactly the mega-bucket problem).
# ---------------------------------------------------------------------------


def polygon_overlap_pairs(polygons: DataFrame, res: int,
                          min_cells: int = 1,
                          id_col: str = "polygon_id",
                          rings_col: str = "rings",
                          cell_cap: int | None = 4096) -> DataFrame:
    """``(id_a, id_b, shared_cells)`` for polygon pairs whose res-rasters
    intersect in at least ``min_cells`` cells (id_a < id_b)."""
    from geolake_spark.operators.dedup import _bucket_pairs
    r = (polygon_raster_cells(polygons, res, id_col=id_col,
                              rings_col=rings_col)
         .select("cell", F.col("polygon_id").alias("id")))
    pairs = _bucket_pairs(r, ["cell"], cap=cell_cap, dedupe=False)
    return (pairs.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("shared_cells"))
            .filter(F.col("shared_cells") >= min_cells))


def polygon_overlap_pairs_sql(polys_sql: str, res: int,
                              min_cells: int = 1,
                              id_expr: str = "polygon_id",
                              rings_expr: str = "rings") -> str:
    """DuckDB mirror: raster CTE self-joined on cell (the oracle states
    the answer by a different algorithm than the HOF pair stream)."""
    raster = polygon_raster_cells_sql(polys_sql, res, id_expr=id_expr,
                                      rings_expr=rings_expr)
    return f"""
WITH _po_r AS ({raster})
SELECT a.polygon_id AS id_a, b.polygon_id AS id_b,
       count(*) AS shared_cells
FROM _po_r a JOIN _po_r b
  ON a.cell = b.cell AND a.polygon_id < b.polygon_id
GROUP BY 1, 2
HAVING count(*) >= {min_cells}"""


# ---------------------------------------------------------------------------
# k-ring catchment aggregation — "events within k cells of each POI".
# The H3 gridDisk/k-ring pattern: each POI explodes to its (2k+1)^2
# Chebyshev disk of cells (arithmetic ids — ix wraps at the
# antimeridian, iy clamps at the poles, the _neighbor_edges rules), the
# event table pre-collapses to per-cell counts (bounded by OCCUPIED
# cells, not events), and one hash join + POI rollup gives the
# catchment mass.  Antimeridian wrap can alias two offsets onto the
# same cell when 2k+1 >= nx — the distinct() guard keeps each (poi,
# cell) once so nothing double-counts.  POI side is pois x (2k+1)^2
# rows — broadcastable for any real POI set.
# ---------------------------------------------------------------------------


def catchment_counts(pois: DataFrame, events: DataFrame, res: int,
                     k: int = 1, poi_id_col: str = "poi_id",
                     lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """``(poi_id, n_cells_hit, n_events)``: event mass within the
    k-ring (Chebyshev disk) of each POI's res-cell.  POIs with an empty
    catchment still appear (zero counts)."""
    from geolake_spark.functions.geo import grid_cell_col
    nx, ny = cells.grid_dims(res)
    c = grid_cell_col(F.col(lat_col), F.col(lon_col), res)
    base = pois.select(F.col(poi_id_col).alias("poi_id"), c.alias("cell"))
    ix = F.col("cell").bitwiseAND(F.lit(_IY_UNIT - 1))
    iy = F.shiftright(F.col("cell"), 28).bitwiseAND(F.lit(_IY_UNIT - 1))
    disk = (base
            .withColumn("dy", F.explode(F.sequence(F.lit(-k), F.lit(k))))
            .withColumn("dx", F.explode(F.sequence(F.lit(-k), F.lit(k)))))
    niy = iy + F.col("dy")
    nix = (ix + F.col("dx") + F.lit(nx)) % F.lit(nx)
    nbr = (F.lit(res * _RES_UNIT).cast("bigint")
           + niy * F.lit(_IY_UNIT).cast("bigint") + nix)
    cover = (disk.filter((niy >= 0) & (niy < ny))
             .select("poi_id", nbr.alias("cell")).distinct())
    hist = (events.select(
        grid_cell_col(F.col(lat_col), F.col(lon_col), res).alias("cell"))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")))
    joined = cover.join(hist, "cell", "left")
    return (joined.groupBy("poi_id")
            .agg(F.sum(F.when(F.col("n").isNotNull(), 1).otherwise(0))
                 .alias("n_cells_hit"),
                 F.coalesce(F.sum("n"), F.lit(0)).alias("n_events")))


def catchment_counts_sql(pois_sql: str, events_sql: str, res: int,
                         k: int = 1, poi_id_expr: str = "poi_id",
                         lat_expr: str = "lat",
                         lon_expr: str = "lon") -> str:
    """DuckDB mirror of :func:`catchment_counts` (same wrap/clamp/alias
    rules, same left-join rollup)."""
    nx, ny = cells.grid_dims(res)
    cell = cells.grid_cell_sql(lat_expr, lon_expr, res)
    return f"""
WITH _cc_poi AS (
  SELECT {poi_id_expr} AS poi_id, {cell} AS cell FROM ({pois_sql})
), _cc_disk AS (
  SELECT DISTINCT poi_id,
         {res} * {_RES_UNIT}
         + ((cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy) * {_IY_UNIT}
         + ((cell % {_IY_UNIT}) + d.dx + {nx}) % {nx} AS cell
  FROM _cc_poi,
       (SELECT a.dy AS dy, b.dx AS dx
        FROM (SELECT unnest(range(-{k}, {k} + 1)) AS dy) a,
             (SELECT unnest(range(-{k}, {k} + 1)) AS dx) b) d
  WHERE (cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy >= 0
    AND (cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy < {ny}
), _cc_hist AS (
  SELECT {cell} AS cell, count(*) AS n FROM ({events_sql}) GROUP BY 1
)
SELECT p.poi_id,
       sum(CASE WHEN h.n IS NULL THEN 0 ELSE 1 END) AS n_cells_hit,
       coalesce(sum(h.n), 0) AS n_events
FROM _cc_disk p LEFT JOIN _cc_hist h ON p.cell = h.cell
GROUP BY p.poi_id"""


def coverage_gaps(events: DataFrame, pois: DataFrame, res: int,
                  k: int = 1, min_pts: int = 1,
                  lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Demand cells a facility network does NOT serve: ``(cell,
    n_events)`` for every res-cell with >= ``min_pts`` events and no
    POI within Chebyshev distance ``k`` — the site-planning /
    dead-zone query (where do users cluster that nothing covers?).

    Scale shape: events collapse to per-cell counts FIRST (the only
    events-sized shuffle); each POI explodes to its (2k+1)² disk with
    the same wrap/clamp arithmetic as catchment_counts, and the gap
    test is ONE anti-join of occupied cells against the (POIs x disk)-
    sized cover — never events x POIs."""
    from geolake_spark.functions.geo import grid_cell_col
    nx, ny = cells.grid_dims(res)
    hist = (events.select(
        grid_cell_col(F.col(lat_col), F.col(lon_col), res).alias("cell"))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= min_pts))
    c = grid_cell_col(F.col(lat_col), F.col(lon_col), res)
    base = pois.select(c.alias("cell"))
    ix = F.col("cell").bitwiseAND(F.lit(_IY_UNIT - 1))
    iy = F.shiftright(F.col("cell"), 28).bitwiseAND(F.lit(_IY_UNIT - 1))
    disk = (base
            .withColumn("dy", F.explode(F.sequence(F.lit(-k), F.lit(k))))
            .withColumn("dx", F.explode(F.sequence(F.lit(-k), F.lit(k)))))
    niy = iy + F.col("dy")
    nix = (ix + F.col("dx") + F.lit(nx)) % F.lit(nx)
    nbr = (F.lit(res * _RES_UNIT).cast("bigint")
           + niy * F.lit(_IY_UNIT).cast("bigint") + nix)
    cover = (disk.filter((niy >= 0) & (niy < ny))
             .select(nbr.alias("cell")).distinct())
    return hist.join(cover, "cell", "left_anti")


def coverage_gaps_sql(events_sql: str, pois_sql: str, res: int,
                      k: int = 1, min_pts: int = 1,
                      lat_expr: str = "lat", lon_expr: str = "lon") -> str:
    """DuckDB mirror of :func:`coverage_gaps`."""
    nx, ny = cells.grid_dims(res)
    cell = cells.grid_cell_sql(lat_expr, lon_expr, res)
    return f"""
WITH _cg_hist AS (
  SELECT {cell} AS cell, count(*) AS n_events
  FROM ({events_sql}) GROUP BY 1 HAVING count(*) >= {min_pts}
), _cg_cover AS (
  SELECT DISTINCT
         {res} * {_RES_UNIT}
         + ((cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy) * {_IY_UNIT}
         + ((cell % {_IY_UNIT}) + d.dx + {nx}) % {nx} AS cell
  FROM (SELECT {cell} AS cell FROM ({pois_sql})) p,
       (SELECT a.dy AS dy, b.dx AS dx
        FROM (SELECT unnest(range(-{k}, {k} + 1)) AS dy) a,
             (SELECT unnest(range(-{k}, {k} + 1)) AS dx) b) d
  WHERE (cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy >= 0
    AND (cell // {_IY_UNIT}) % {_IY_UNIT} + d.dy < {ny}
)
SELECT h.cell, h.n_events
FROM _cg_hist h ANTI JOIN _cg_cover c ON h.cell = c.cell"""


def nearest_segment(points: DataFrame, segments: DataFrame, res: int,
                    id_col: str = "point_id", lat_col: str = "lat",
                    lon_col: str = "lon",
                    seg_id_col: str = "seg_id") -> DataFrame:
    """Snap each point to its nearest line segment — the map-matching
    primitive (GPS point -> road edge).  Segments carry planar degree
    endpoints ``(x1, y1, x2, y2)``; candidates are generated by
    rasterizing each segment's bbox to res-cells PLUS a one-cell halo
    and equi-joining on the point's cell, so the join is
    points x local-candidates, never points x segments.  Returns
    ``(point_id, seg_id, d2)`` with ``d2`` the squared planar degree
    distance to the clamped projection; per-point argmin is a
    deterministic ``min(struct(d2, seg_id))``.  Points with no
    candidate in their cell are absent (the halo guarantees a match
    whenever the true nearest segment is within one cell; antimeridian-
    crossing segments are out of contract — split them upstream).

    Floats: the projection parameter, clamp, and distance are ONE fixed
    op sequence evaluated identically by both engines (the PQ/idw
    contract), so the DuckDB oracle is value-hash exact."""
    from geolake_spark.functions.geo import grid_cell_col
    nx, ny = cells.grid_dims(res)
    x1, y1 = F.col("x1"), F.col("y1")
    x2, y2 = F.col("x2"), F.col("y2")
    ix0 = (F.floor((F.least(x1, x2) + 180.0) / 360.0 * nx)
           .cast("bigint") - 1)
    ix1 = (F.floor((F.greatest(x1, x2) + 180.0) / 360.0 * nx)
           .cast("bigint") + 1)
    iy0 = (F.floor((F.lit(90.0) - F.greatest(y1, y2)) / 180.0 * ny)
           .cast("bigint") - 1)
    iy1 = (F.floor((F.lit(90.0) - F.least(y1, y2)) / 180.0 * ny)
           .cast("bigint") + 1)
    clampx = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(nx - 1))
    clampy = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(ny - 1))
    cov = (segments
           .withColumn("iy", F.explode(F.sequence(clampy(iy0), clampy(iy1))))
           .withColumn("ix", F.explode(F.sequence(clampx(ix0), clampx(ix1))))
           .select(F.col(seg_id_col).alias("seg_id"), "x1", "y1", "x2", "y2",
                   (F.lit(res * _RES_UNIT).cast("bigint")
                    + F.col("iy") * F.lit(_IY_UNIT).cast("bigint")
                    + F.col("ix")).alias("cell")))
    pts = points.select(
        F.col(id_col).alias("point_id"),
        F.col(lat_col).alias("py"), F.col(lon_col).alias("px"),
        grid_cell_col(F.col(lat_col), F.col(lon_col), res).alias("cell"))
    j = pts.join(cov, "cell")
    dx, dy = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    l2 = dx * dx + dy * dy
    tn = (F.col("px") - F.col("x1")) * dx + (F.col("py") - F.col("y1")) * dy
    t = F.when(l2 == 0.0, F.lit(0.0)).otherwise(
        F.least(F.greatest(tn / l2, F.lit(0.0)), F.lit(1.0)))
    qx = F.col("x1") + t * dx
    qy = F.col("y1") + t * dy
    d2 = ((F.col("px") - qx) * (F.col("px") - qx)
          + (F.col("py") - qy) * (F.col("py") - qy))
    best = (j.select("point_id",
                     F.struct(d2.alias("d2"),
                              F.col("seg_id").alias("seg_id")).alias("c"))
            .groupBy("point_id").agg(F.min("c").alias("b")))
    return best.select("point_id", F.col("b.seg_id").alias("seg_id"),
                       F.round(F.col("b.d2"), 9).alias("d2"))


def nearest_segment_sql(points_sql: str, segments_sql: str, res: int,
                        id_expr: str = "point_id", lat_expr: str = "lat",
                        lon_expr: str = "lon") -> str:
    """DuckDB mirror of :func:`nearest_segment`."""
    nx, ny = cells.grid_dims(res)
    cell = cells.grid_cell_sql(lat_expr, lon_expr, res)
    return f"""
WITH _ns_cov AS (
  SELECT seg_id, x1, y1, x2, y2,
         {res} * {_RES_UNIT} + u1.iy * {_IY_UNIT} + u2.ix AS cell
  FROM ({segments_sql}) s,
    unnest(range(
      least(greatest(cast(floor((90.0 - greatest(y1, y2)) / 180.0 * {ny}) as bigint) - 1, 0), {ny - 1}),
      least(greatest(cast(floor((90.0 - least(y1, y2)) / 180.0 * {ny}) as bigint) + 1, 0), {ny - 1}) + 1)) u1(iy),
    unnest(range(
      least(greatest(cast(floor((least(x1, x2) + 180.0) / 360.0 * {nx}) as bigint) - 1, 0), {nx - 1}),
      least(greatest(cast(floor((greatest(x1, x2) + 180.0) / 360.0 * {nx}) as bigint) + 1, 0), {nx - 1}) + 1)) u2(ix)
), _ns_p AS (
  SELECT {id_expr} AS point_id, {lat_expr} AS py, {lon_expr} AS px,
         {cell} AS cell
  FROM ({points_sql})
), _ns_d AS (
  SELECT point_id, seg_id,
         CASE WHEN (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) = 0.0 THEN 0.0
              ELSE least(greatest(
                ((px-x1)*(x2-x1) + (py-y1)*(y2-y1))
                  / ((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)), 0.0), 1.0)
         END AS t,
         px, py, x1, y1, x2, y2
  FROM _ns_p JOIN _ns_cov USING (cell)
), _ns_q AS (
  SELECT point_id, seg_id,
         (px - (x1 + t*(x2-x1))) * (px - (x1 + t*(x2-x1)))
         + (py - (y1 + t*(y2-y1))) * (py - (y1 + t*(y2-y1))) AS d2
  FROM _ns_d
)
SELECT point_id,
       (min(struct_pack(d2 := d2, seg_id := seg_id))).seg_id AS seg_id,
       round((min(struct_pack(d2 := d2, seg_id := seg_id))).d2, 9) AS d2
FROM _ns_q GROUP BY point_id"""


# ---------------------------------------------------------------------------
# Exact polygon area + centroid — the planar shoelace over integer
# microdegrees, every reduction in decimal(38,0) / HUGEINT so the two
# engines agree bit-for-bit (cross terms reach ~3e16 and centroid terms
# ~1e25, both far past int64 sums but far inside 38 digits).  Zero
# shuffle: one codegen HOF chain per polygon row.
# ---------------------------------------------------------------------------

_DEC = "decimal(38,0)"


def _pa_iring(ring):
    """[lon,lat] double ring -> struct<x,y> integer-microdegree ring."""
    return F.transform(ring, lambda p: F.struct(
        F.round(p[0] * 1e6, 0).cast("bigint").alias("x"),
        F.round(p[1] * 1e6, 0).cast("bigint").alias("y")))


def _pa_open(r):
    """Drop the WKT closing point when present (we wrap implicitly)."""
    n = F.size(r)
    closed = (n > 1) & (F.element_at(r, 1) == F.element_at(r, -1))
    return F.when(closed, F.slice(r, 1, n - 1)).otherwise(r)


def _pa_signed2a(r):
    """Signed 2*area of an open integer ring (decimal-exact)."""
    n = F.size(r)
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (F.element_at(r, i)["x"]
                   * F.element_at(r, (i % n) + 1)["y"]
                   - F.element_at(r, (i % n) + 1)["x"]
                   * F.element_at(r, i)["y"]).cast(_DEC))
    return F.aggregate(terms, F.lit(0).cast(_DEC), lambda a, x: a + x)


def _pa_centroid_num(r, axis: str):
    """Centroid numerator sum((c_i + c_{i+1}) * cross_i) — decimal."""
    n = F.size(r)

    def term(i):
        p, q = F.element_at(r, i), F.element_at(r, (i % n) + 1)
        cross = (p["x"] * q["y"] - q["x"] * p["y"]).cast(_DEC)
        return (p[axis] + q[axis]).cast(_DEC) * cross
    return F.aggregate(F.transform(F.sequence(F.lit(1), n), term),
                       F.lit(0).cast(_DEC), lambda a, x: a + x)


def polygon_area_centroid(polygons: DataFrame,
                          rings_col: str = "rings",
                          id_col: str = "polygon_id") -> DataFrame:
    """Planar polygon area + centroid over integer microdegrees:
    ``(polygon_id, n_rings, area2, a2_outer, cx_num, cy_num,
    centroid_lon, centroid_lat)`` where ``area2`` = |2A| of the outer
    ring minus |2A| of each hole (orientation-free — WKT in the wild
    winds both ways), ``a2_outer`` is the outer ring's SIGNED 2A and
    ``cx_num``/``cy_num`` the outer ring's centroid numerators — the
    exact rational centroid is num/(3*a2_outer) microdegrees, the
    sign cancelling; the convenience ``centroid_*`` doubles apply that
    division in one fixed op sequence rounded to 9 dp.  Rings with < 3
    distinct points are degenerate and ignored; polygons with no valid
    ring are dropped.  Input is the :func:`polygon_raster_cells` shape
    (rings: array<array<array<double>>> of [lon, lat]).  Planar
    microdegrees, not geodesic area — the tile-accounting contract
    (same frame as the rasterizer), stated."""
    rs0 = F.transform(F.col(rings_col), lambda ring: _pa_iring(ring))
    rs = F.filter(F.transform(rs0, lambda r: _pa_open(r)),
                  lambda r: F.size(r) >= 3)
    base = (polygons.select(F.col(id_col).alias("polygon_id"),
                            rs.alias("_rs"))
            .filter(F.size("_rs") >= 1))
    outer = F.element_at(F.col("_rs"), 1)
    holes = F.slice(F.col("_rs"), 2,
                    F.greatest(F.size("_rs") - 1, F.lit(0)))
    a2o = _pa_signed2a(outer)
    hole_abs = F.aggregate(
        F.transform(holes, lambda r: F.abs(_pa_signed2a(r))),
        F.lit(0).cast(_DEC), lambda a, x: a + x)
    stage = base.select(
        "polygon_id", F.size("_rs").alias("n_rings"),
        (F.abs(a2o) - hole_abs).alias("area2"),
        a2o.alias("a2_outer"),
        _pa_centroid_num(outer, "x").alias("cx_num"),
        _pa_centroid_num(outer, "y").alias("cy_num"))
    den = F.lit(3.0) * F.col("a2_outer").cast("double")
    return stage.select(
        "polygon_id", "n_rings", "area2", "a2_outer", "cx_num", "cy_num",
        F.round(F.col("cx_num").cast("double") / den / F.lit(1e6), 9)
        .alias("centroid_lon"),
        F.round(F.col("cy_num").cast("double") / den / F.lit(1e6), 9)
        .alias("centroid_lat"))


def polygon_area_centroid_sql(polys_sql: str, rings_expr: str = "rings",
                              id_expr: str = "polygon_id") -> str:
    """DuckDB mirror of :func:`polygon_area_centroid` (HUGEINT sums ==
    decimal(38,0); same fixed double op sequence for the centroid)."""
    cross = ("(r[i].x::HUGEINT * r[i % len(r) + 1].y"
             " - r[i % len(r) + 1].x::HUGEINT * r[i].y)")
    signed = (f"list_sum(list_transform(range(1, len(r) + 1), "
              f"i -> {cross}))")

    def cnum(axis: str) -> str:
        return (f"list_sum(list_transform(range(1, len(r) + 1), "
                f"i -> (r[i].{axis}::HUGEINT "
                f"+ r[i % len(r) + 1].{axis}) * {cross}))")
    return f"""
WITH _pa_r0 AS (
  SELECT {id_expr} AS polygon_id,
         list_transform({rings_expr}, ring ->
           list_transform(ring, pt -> struct_pack(
             x := cast(round(pt[1] * 1000000) AS BIGINT),
             y := cast(round(pt[2] * 1000000) AS BIGINT)))) AS rs0
  FROM ({polys_sql})
), _pa_r AS (
  SELECT polygon_id,
         list_filter(list_transform(rs0, r ->
           CASE WHEN len(r) > 1 AND r[1] = r[-1]
                THEN r[1:len(r) - 1] ELSE r END),
           r -> len(r) >= 3) AS rs
  FROM _pa_r0
), _pa_s AS (
  SELECT polygon_id, len(rs) AS n_rings,
         (SELECT {signed} FROM (SELECT rs[1] AS r)) AS a2_outer,
         (SELECT coalesce(list_sum(list_transform(rs[2:], r ->
            abs({signed}))), 0) ) AS holes_abs,
         (SELECT {cnum('x')} FROM (SELECT rs[1] AS r)) AS cx_num,
         (SELECT {cnum('y')} FROM (SELECT rs[1] AS r)) AS cy_num
  FROM _pa_r WHERE len(rs) >= 1
)
SELECT polygon_id, n_rings, abs(a2_outer) - holes_abs AS area2,
       a2_outer, cx_num, cy_num,
       round(cx_num::DOUBLE / (3.0 * a2_outer::DOUBLE) / 1000000.0, 9)
         AS centroid_lon,
       round(cy_num::DOUBLE / (3.0 * a2_outer::DOUBLE) / 1000000.0, 9)
         AS centroid_lat
FROM _pa_s"""


def segment_intersections(segments: DataFrame, res: int,
                          seg_id_col: str = "seg_id",
                          cell_cap: int | None = None) -> DataFrame:
    """Un-noded crossing detection between planar line segments — the
    road-network conflation check (two edges that cross without a
    shared node are a digitization defect or a missing bridge/tunnel
    attribute).  Detects PROPER crossings only: interiors intersect;
    shared endpoints and collinear overlaps are excluded (network
    nodes are not defects — stated contract).  Returns
    ``(seg_a, seg_b, cross_lon, cross_lat)`` with seg_a < seg_b.

    Exactness: all four orientation tests are integer microdegree
    cross products (|terms| <= ~2.6e17, inside int64) — no epsilon, no
    float misclassification; only the reported crossing POINT is
    float, one fixed op sequence ``C + d1/(d1-d2) * (D-C)`` rounded
    9 dp (value-hash exact cross-engine).

    Scale shape: candidates come from a bbox res-cell cover self-join
    — NO halo needed (a proper crossing point lies on both segments,
    hence in both bboxes, so its cell is covered by both sides); the
    one shuffle is the cell equi-join, and a pair sharing several
    cells is collapsed by a distinct before the sign tests.  Pick
    ``res`` so cells are segment-sized; antimeridian-crossing segments
    are out of contract (split upstream, the nearest_segment rule).
    ``cell_cap`` drops cells holding more than that many segments
    BEFORE the self-join (count-only pre-agg + anti-join against the
    tiny hot-cell set, the _bucket_pairs contract) — the skew guard
    for degenerate stacks (k co-located segments are k^2/2 candidate
    rows from one cell); a dropped cell is a stated recall trade, and
    crossings still surface via any other shared cell."""
    nx, ny = cells.grid_dims(res)
    x1, y1 = F.col("x1"), F.col("y1")
    x2, y2 = F.col("x2"), F.col("y2")
    ix0 = F.floor((F.least(x1, x2) + 180.0) / 360.0 * nx).cast("bigint")
    ix1 = F.floor((F.greatest(x1, x2) + 180.0) / 360.0 * nx).cast("bigint")
    iy0 = (F.floor((F.lit(90.0) - F.greatest(y1, y2)) / 180.0 * ny)
           .cast("bigint"))
    iy1 = (F.floor((F.lit(90.0) - F.least(y1, y2)) / 180.0 * ny)
           .cast("bigint"))
    clampx = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(nx - 1))
    clampy = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(ny - 1))
    mu = lambda c: F.round(c * 1e6, 0).cast("bigint")
    cov = (segments
           .withColumn("iy", F.explode(F.sequence(clampy(iy0), clampy(iy1))))
           .withColumn("ix", F.explode(F.sequence(clampx(ix0), clampx(ix1))))
           .select(F.col(seg_id_col).alias("sid"),
                   mu(x1).alias("ax"), mu(y1).alias("ay"),
                   mu(x2).alias("bx"), mu(y2).alias("by"),
                   (F.lit(res * _RES_UNIT).cast("bigint")
                    + F.col("iy") * F.lit(_IY_UNIT).cast("bigint")
                    + F.col("ix")).alias("cell")))
    if cell_cap is not None:
        hot = (cov.groupBy("cell")
               .agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > int(cell_cap))
               .select("cell"))
        cov = cov.join(hot, "cell", "left_anti")
    a = cov.select(F.col("cell"), F.col("sid").alias("seg_a"),
                   F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    b = cov.select(F.col("cell"), F.col("sid").alias("seg_b"),
                   F.col("ax").alias("cx"), F.col("ay").alias("cy"),
                   F.col("bx").alias("dx"), F.col("by").alias("dy"))
    pairs = (a.join(b, ["cell"])
             .filter(F.col("seg_a") < F.col("seg_b"))
             .drop("cell").distinct())
    ax, ay, bx, by = (F.col(c) for c in ("ax", "ay", "bx", "by"))
    cx, cy, dx, dy = (F.col(c) for c in ("cx", "cy", "dx", "dy"))
    d1 = (cx - ax) * (by - ay) - (cy - ay) * (bx - ax)
    d2 = (dx - ax) * (by - ay) - (dy - ay) * (bx - ax)
    d3 = (ax - cx) * (dy - cy) - (ay - cy) * (dx - cx)
    d4 = (bx - cx) * (dy - cy) - (by - cy) * (dx - cx)
    proper = ((((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
              & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))))
    hits = pairs.withColumn("_d1", d1).withColumn("_d2", d2) \
        .filter(proper)
    s = (F.col("_d1").cast("double")
         / (F.col("_d1") - F.col("_d2")).cast("double"))
    px = cx.cast("double") + s * (dx - cx).cast("double")
    py = cy.cast("double") + s * (dy - cy).cast("double")
    return hits.select(
        "seg_a", "seg_b",
        F.round(px / F.lit(1e6), 9).alias("cross_lon"),
        F.round(py / F.lit(1e6), 9).alias("cross_lat"))


def segment_intersections_sql(segments_sql: str, res: int) -> str:
    """DuckDB mirror of :func:`segment_intersections` (self-join
    restatement; identical integer sign tests and float sequence)."""
    nx, ny = cells.grid_dims(res)
    return f"""
WITH _si_cov AS (
  SELECT seg_id AS sid,
         cast(round(x1 * 1000000) AS BIGINT) AS ax,
         cast(round(y1 * 1000000) AS BIGINT) AS ay,
         cast(round(x2 * 1000000) AS BIGINT) AS bx,
         cast(round(y2 * 1000000) AS BIGINT) AS by,
         {res} * {_RES_UNIT} + u1.iy * {_IY_UNIT} + u2.ix AS cell
  FROM ({segments_sql}) s,
    unnest(range(
      least(greatest(cast(floor((90.0 - greatest(y1, y2)) / 180.0 * {ny}) as bigint), 0), {ny - 1}),
      least(greatest(cast(floor((90.0 - least(y1, y2)) / 180.0 * {ny}) as bigint), 0), {ny - 1}) + 1)) u1(iy),
    unnest(range(
      least(greatest(cast(floor((least(x1, x2) + 180.0) / 360.0 * {nx}) as bigint), 0), {nx - 1}),
      least(greatest(cast(floor((greatest(x1, x2) + 180.0) / 360.0 * {nx}) as bigint), 0), {nx - 1}) + 1)) u2(ix)
), _si_p AS (
  SELECT DISTINCT a.sid AS seg_a, b.sid AS seg_b,
         a.ax, a.ay, a.bx, a.by,
         b.ax AS cx, b.ay AS cy, b.bx AS dx, b.by AS dy
  FROM _si_cov a JOIN _si_cov b
    ON a.cell = b.cell AND a.sid < b.sid
), _si_d AS (
  SELECT seg_a, seg_b, cx, cy, dx, dy,
         (cx - ax) * (by - ay) - (cy - ay) * (bx - ax) AS d1,
         (dx - ax) * (by - ay) - (dy - ay) * (bx - ax) AS d2,
         (ax - cx) * (dy - cy) - (ay - cy) * (dx - cx) AS d3,
         (bx - cx) * (dy - cy) - (by - cy) * (dx - cx) AS d4
  FROM _si_p
)
SELECT seg_a, seg_b,
       round((cx::DOUBLE + (d1::DOUBLE / (d1 - d2)::DOUBLE)
              * (dx - cx)::DOUBLE) / 1000000.0, 9) AS cross_lon,
       round((cy::DOUBLE + (d1::DOUBLE / (d1 - d2)::DOUBLE)
              * (dy - cy)::DOUBLE) / 1000000.0, 9) AS cross_lat
FROM _si_d
WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
  AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))"""


def stitch_segments(segments: DataFrame,
                    seg_id_col: str = "seg_id") -> DataFrame:
    """Assemble loose line segments into polylines — the road/track
    conflation step after importing shapefile-ish fragments: segments
    sharing an endpoint (EXACT integer-microdegree match) join one
    polyline, transitively.  Returns ``(seg_id, polyline_id,
    polyline_segments)``; polyline_id is the min packed endpoint node
    of the component (stable across runs and cluster sizes).

    Endpoints pack losslessly into one int64
    (``(x+180e6)*2^28 + (y+90e6)`` — lon microdegrees need 29 bits,
    lat 28), so node identity is an integer equi-join key, and the
    transitive closure is the O(log n) star-contraction
    :func:`geolake_spark.operators.dedup.connected_components` (one
    groupBy-min + join per star op).  Zero-length segments form their
    own single-segment polylines.  Near-miss endpoints (GPS jitter) do
    NOT stitch — snap upstream (e.g. quantize coordinates) if fuzzy
    joining is wanted; exactness is the stated contract."""
    from geolake_spark.operators.dedup import connected_components

    def node(xcol, ycol):
        x = F.round(xcol * 1e6, 0).cast("bigint") + F.lit(180_000_000)
        y = F.round(ycol * 1e6, 0).cast("bigint") + F.lit(90_000_000)
        return x * F.lit(1 << 28).cast("bigint") + y

    segs = segments.select(
        F.col(seg_id_col).alias("seg_id"),
        node(F.col("x1"), F.col("y1")).alias("_n1"),
        node(F.col("x2"), F.col("y2")).alias("_n2"))
    pairs = (segs.select(F.least("_n1", "_n2").alias("id_a"),
                         F.greatest("_n1", "_n2").alias("id_b"))
             .distinct())
    comps = connected_components(pairs)
    lab = segs.join(comps.withColumnRenamed("id", "_n1")
                   .withColumnRenamed("component", "polyline_id"), "_n1")
    counts = (lab.groupBy("polyline_id")
              .agg(F.count(F.lit(1)).alias("polyline_segments")))
    return (lab.join(counts, "polyline_id")
            .select("seg_id", "polyline_id", "polyline_segments"))


def stitch_segments_sql(segments_sql: str) -> str:
    """DuckDB mirror of :func:`stitch_segments` (recursive min-label
    closure — the near_dup_components oracle pattern)."""
    def node(x, y):
        return (f"((cast(round(({x}) * 1000000) AS BIGINT) + 180000000)"
                f" * 268435456"
                f" + cast(round(({y}) * 1000000) AS BIGINT) + 90000000)")
    return f"""
WITH RECURSIVE _st_s AS (
  SELECT seg_id, {node('x1', 'y1')} AS n1, {node('x2', 'y2')} AS n2
  FROM ({segments_sql})
), _st_e AS (
  SELECT n1 AS src, n2 AS dst FROM _st_s
  UNION
  SELECT n2 AS src, n1 AS dst FROM _st_s
), _st_r AS (
  SELECT src AS id, src AS label FROM _st_e
  UNION
  SELECT e.src AS id, r.label FROM _st_e e JOIN _st_r r ON r.id = e.dst
), _st_c AS (
  SELECT id, min(label) AS polyline_id FROM _st_r GROUP BY id
), _st_l AS (
  SELECT s.seg_id, c.polyline_id
  FROM _st_s s JOIN _st_c c ON c.id = s.n1
)
SELECT seg_id, polyline_id,
       count(*) OVER (PARTITION BY polyline_id) AS polyline_segments
FROM _st_l"""


def areal_transfer(src_polys: DataFrame, dst_polys: DataFrame, res: int,
                   value_col: str = "value",
                   src_id_col: str = "polygon_id",
                   dst_id_col: str = "polygon_id",
                   rings_col: str = "rings") -> DataFrame:
    """Areal interpolation (zone re-aggregation — census tracts to
    sales territories, coverage zones to admin districts): each source
    polygon's value is split across destination polygons in proportion
    to shared res-cell counts (area-weighting at cell granularity,
    the same even-odd rasterizer as everything else).  Returns
    ``(dst_id, n_sources, value)`` with value rounded 9 dp.

    Exactness: the per-(src,dst) contribution is the fixed sequence
    ``(value * n_overlap_cells) / n_src_cells`` (one multiply, one
    divide on exact integer counts) and the per-dst sum folds the
    contributions in src-id order (the pagerank sorted-fold contract)
    — value-hash exact on doubles.  Sources rasterizing to zero cells
    (sub-cell slivers at this res) drop out — raise ``res`` to keep
    them, stated.

    Scale shape: two rasterizations (zero-shuffle codegen HOFs), one
    cell equi-join, two rollups; the fold collects per-dst CONTRIBUTING
    SOURCES only (bounded by overlap fan-in, never the source table)."""
    sa = polygon_raster_cells(src_polys, res, id_col=src_id_col,
                              rings_col=rings_col) \
        .select(F.col(src_id_col).alias("_sid"), "cell")
    vals = src_polys.select(F.col(src_id_col).alias("_sid"),
                            F.col(value_col).cast("double").alias("_v"))
    sizes = sa.groupBy("_sid").agg(F.count(F.lit(1)).alias("_n_src"))
    db = polygon_raster_cells(dst_polys, res, id_col=dst_id_col,
                              rings_col=rings_col) \
        .select(F.col(dst_id_col).alias("_did"), "cell")
    ov = (sa.join(db, "cell")
          .groupBy("_sid", "_did").agg(F.count(F.lit(1)).alias("_n_ov")))
    contrib = (ov.join(sizes, "_sid").join(vals, "_sid")
               .select("_did", "_sid",
                       ((F.col("_v") * F.col("_n_ov")) / F.col("_n_src"))
                       .alias("_c")))
    fold = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("_sid"),
                                             F.col("_c").alias("c")))),
        F.lit(0.0), lambda acc, x: acc + x["c"])
    return (contrib.groupBy(F.col("_did").alias("dst_id"))
            .agg(F.count(F.lit(1)).alias("n_sources"),
                 F.round(fold, 9).alias("value")))


def areal_transfer_sql(src_sql: str, dst_sql: str, res: int,
                       value_col: str = "value") -> str:
    """DuckDB mirror of :func:`areal_transfer` (same counts, same
    op sequence, same src-ordered fold)."""
    sa = polygon_raster_cells_sql(src_sql, res)
    db = polygon_raster_cells_sql(dst_sql, res)
    return f"""
WITH _at_sa AS ({sa}), _at_db AS ({db}),
_at_sz AS (
  SELECT polygon_id AS sid, count(*) AS n_src FROM _at_sa GROUP BY 1
), _at_v AS (
  SELECT polygon_id AS sid, cast({value_col} AS DOUBLE) AS v
  FROM ({src_sql})
), _at_ov AS (
  SELECT a.polygon_id AS sid, b.polygon_id AS did, count(*) AS n_ov
  FROM _at_sa a JOIN _at_db b USING (cell) GROUP BY 1, 2
), _at_c AS (
  SELECT did, sid, (v * n_ov) / n_src AS c
  FROM _at_ov JOIN _at_sz USING (sid) JOIN _at_v USING (sid)
)
SELECT did AS dst_id, count(*) AS n_sources,
       round(list_sum(list(c ORDER BY sid)), 9) AS value
FROM _at_c GROUP BY 1"""
