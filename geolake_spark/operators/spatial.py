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
