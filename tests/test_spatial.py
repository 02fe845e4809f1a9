"""Grid-density spatial clustering (operators/spatial.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geolake_spark import cells
from geolake_spark.operators import spatial

RES = 6  # nx=512, ny=256 -> cell width 0.703 deg lon, height 0.703 deg lat


def _pts(spark, coords):
    return spark.createDataFrame([(float(a), float(b)) for a, b in coords],
                                 "lat double, lon double")


def _clusters(spark, coords, min_pts=1, res=RES):
    rows = spatial.grid_clusters(_pts(spark, coords), res=res,
                                 min_pts=min_pts).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r["cluster_id"], set()).add(r["cell"])
    return rows, comp


def test_two_separated_blobs(spark):
    blob_a = [(10.1 + 0.7 * i, 20.1 + 0.7 * i) for i in range(3)]  # diagonal chain
    blob_b = [(-40.0, -120.0)]
    rows, comp = _clusters(spark, blob_a + blob_b)
    assert len(comp) == 2
    sizes = sorted(len(v) for v in comp.values())
    assert sizes == [1, 3]
    # labels are the min cell id of each component
    for cid, cs in comp.items():
        assert cid == min(cs)


def test_min_pts_density_gate(spark):
    # two points in one cell, one point alone in a far cell
    coords = [(10.0, 10.0), (10.01, 10.01), (-50.0, 60.0)]
    rows, comp = _clusters(spark, coords, min_pts=2)
    assert len(rows) == 1 and rows[0]["n_points"] == 2
    rows1, _ = _clusters(spark, coords, min_pts=1)
    assert sum(r["n_points"] for r in rows1) == 3


def test_antimeridian_wrap_merges(spark):
    # same latitude band, straddling lon=180: ix 0 and ix nx-1 must touch
    coords = [(0.1, 179.9), (0.1, -179.9)]
    rows, comp = _clusters(spark, coords)
    assert len(comp) == 1 and len(rows) == 2


def test_pole_rows_clamp_without_wrap(spark):
    # iy=0 cells: neighbors with iy-1 must vanish, not wrap to the south
    coords = [(89.9, 10.0), (89.9, 10.8), (-89.9, 10.0)]
    rows, comp = _clusters(spark, coords)
    assert len(comp) == 2  # north pair merges, south point separate


def test_diagonal_touch_is_connected(spark):
    # two points in diagonally adjacent cells (8-neighborhood)
    nxw = 360.0 / 512
    coords = [(0.1, 0.1), (0.1 + nxw, 0.1 + nxw)]
    rows, comp = _clusters(spark, coords)
    assert len(comp) == 1
    cA = cells.grid_cell(coords[0][0], coords[0][1], RES)
    cB = cells.grid_cell(coords[1][0], coords[1][1], RES)
    ixa, iya = cells.cell_ixy(cA)
    ixb, iyb = cells.cell_ixy(cB)
    assert abs(int(ixa) - int(ixb)) == 1 and abs(int(iya) - int(iyb)) == 1


def test_assign_clusters_labels_points(spark):
    coords = [(10.0, 10.0), (10.01, 10.01), (-50.0, 60.0)]
    out = spatial.assign_clusters(_pts(spark, coords), res=RES,
                                  min_pts=2).collect()
    labels = [r["cluster_id"] for r in out]
    assert sum(1 for v in labels if v is not None) == 2
    assert sum(1 for v in labels if v is None) == 1


def test_cluster_stats_rollup(spark):
    coords = [(10.1, 20.1), (10.1, 20.9), (10.2, 20.2), (-40.0, -120.0)]
    st = {r["cluster_id"]: (r["n_cells"], r["n_points"])
          for r in spatial.cluster_stats(_pts(spark, coords),
                                         res=RES).collect()}
    assert sorted(st.values()) == [(1, 1), (2, 3)]


# ---------------------------------------------------------------------------
# Polygon rasterization
# ---------------------------------------------------------------------------


def _raster(spark, rings, res=6):
    df = spark.createDataFrame(
        [(1, rings)],
        "polygon_id long, rings array<array<array<double>>>")
    return sorted(r["cell"] for r in
                  spatial.polygon_raster_cells(df, res=res).collect())


def test_raster_matches_bruteforce_centers(spark):
    import numpy as np
    ring = [[10.0, 10.0], [15.3, 10.0], [15.3, 14.2], [10.0, 14.2],
            [10.0, 10.0]]
    got = _raster(spark, [ring])
    # brute force: every cell center in a generous bbox window
    nx, ny = cells.grid_dims(6)
    expect = []
    for iy in range(0, ny):
        lat = 90.0 - (iy + 0.5) * (180.0 / ny)
        if not (9.0 <= lat <= 15.0):
            continue
        for ix in range(0, nx):
            lon = (ix + 0.5) * (360.0 / nx) - 180.0
            if not (9.0 <= lon <= 16.0):
                continue
            if cells.points_in_polygon(
                    np.array([lat]), np.array([lon]),
                    [np.array(ring)])[0]:
                expect.append((6 << 56) | (iy << 28) | ix)
    assert got == sorted(expect) and len(got) > 20


def test_raster_hole_subtracts(spark):
    outer = [[0.0, 0.0], [7.0, 0.0], [7.0, 7.0], [0.0, 7.0], [0.0, 0.0]]
    hole = [[2.0, 2.0], [5.0, 2.0], [5.0, 5.0], [2.0, 5.0], [2.0, 2.0]]
    solid = _raster(spark, [outer])
    holed = _raster(spark, [outer, hole])
    assert len(holed) < len(solid)
    assert set(holed) < set(solid)
    # the removed cells are exactly the hole's own raster
    removed = set(solid) - set(holed)
    assert removed == set(_raster(spark, [hole]))


def test_raster_open_ring_closes_implicitly(spark):
    closed = [[20.0, 20.0], [26.0, 20.0], [23.0, 25.0], [20.0, 20.0]]
    open_ = closed[:-1]
    assert _raster(spark, [closed]) == _raster(spark, [open_])


def test_raster_degenerate_rings_empty(spark):
    assert _raster(spark, [[[5.0, 5.0]]]) == []
    assert _raster(spark, [[[5.0, 5.0], [6.0, 6.0]]]) == []


# ---------------------------------------------------------------------------
# Cell smoothing
# ---------------------------------------------------------------------------


def test_smooth_single_cell_spreads_to_nine(spark):
    hist = spark.createDataFrame(
        [(int(cells.grid_cell(10.0, 10.0, RES)), 4)],
        "cell long, n_points long")
    out = {r["cell"]: r["smooth"]
           for r in spatial.smooth_cells(hist, res=RES).collect()}
    assert len(out) == 9 and set(out.values()) == {4}
    assert int(cells.grid_cell(10.0, 10.0, RES)) in out


def test_smooth_sums_overlapping_mass_and_conserves_total(spark):
    # two horizontally adjacent cells: their 3x3 halos overlap in 6 cells
    c1 = int(cells.grid_cell(0.1, 0.1, RES))
    c2 = c1 + 1
    hist = spark.createDataFrame([(c1, 10), (c2, 1)],
                                 "cell long, n_points long")
    out = {r["cell"]: r["smooth"]
           for r in spatial.smooth_cells(hist, res=RES).collect()}
    assert out[c1] == 11 and out[c2] == 11
    assert len(out) == 12  # 3x4 union footprint
    # a uniform kernel conserves total mass x9 away from the poles
    assert sum(out.values()) == 9 * 11


def test_smooth_pole_row_loses_clamped_mass(spark):
    top = int(cells.grid_cell(89.99, 0.1, RES))  # iy = 0
    hist = spark.createDataFrame([(top, 3)], "cell long, n_points long")
    out = spatial.smooth_cells(hist, res=RES).collect()
    assert len(out) == 6  # the iy=-1 row vanished, not wrapped


# ---------------------------------------------------------------------------
# IDW regridding
# ---------------------------------------------------------------------------


def test_idw_single_station_takes_its_value(spark):
    st = spark.createDataFrame([(1, 10.0, 20.0, 42.0)],
                               "station_id long, lat double, lon double, value double")
    out = spatial.idw_to_grid(st, res=4, radius_km=300.0).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_stations"] == 1 and r["idw_value"] == 42.0


def test_idw_weights_pull_toward_closer_station(spark):
    # two stations on one parallel; cells nearer A skew toward A's value
    st = spark.createDataFrame(
        [(1, 0.0, 10.0, 0.0), (2, 0.0, 16.0, 100.0)],
        "station_id long, lat double, lon double, value double")
    out = {r["cell"]: r for r in
           spatial.idw_to_grid(st, res=4, radius_km=900.0,
                               deterministic=True).collect()}
    both = {c: r for c, r in out.items() if r["n_stations"] == 2}
    assert both, "radius must overlap somewhere between the stations"
    ca = int(cells.grid_cell(0.0, 11.0, 4))
    cb = int(cells.grid_cell(0.0, 15.0, 4))
    assert ca in both and cb in both
    assert both[ca]["idw_value"] < 50.0 < both[cb]["idw_value"]
    # deterministic fold == plain sum (within float-reorder noise)
    plain = {r["cell"]: r["idw_value"] for r in
             spatial.idw_to_grid(st, res=4, radius_km=900.0).collect()}
    for c, r in out.items():
        assert abs(plain[c] - r["idw_value"]) < 1e-6


def test_morans_i_clustered_vs_checkerboard(spark):
    """Sign sanity on constructed grids: a hot contiguous block ->
    positive I; an alternating checkerboard -> negative I."""
    import numpy as np

    from geolake_spark import cells
    from geolake_spark.operators import spatial

    nx, ny = cells.grid_dims(5)

    def grid_points(weights):
        # weights[(ix, iy)] = count of points to drop in that res-5 cell
        rows = []
        for (ix, iy), cnt in weights.items():
            lat = 90.0 - (iy + 0.5) / ny * 180.0
            lon = (ix + 0.5) / nx * 360.0 - 180.0
            rows.extend([(lat, lon)] * cnt)
        return spark.createDataFrame(rows, "lat double, lon double")

    def moran_ref(weights):
        keys = list(weights)
        x = np.array([weights[k] for k in keys], dtype=float)
        mu = x.mean()
        num, w = 0.0, 0
        for a, (ax, ay) in enumerate(keys):
            for b, (bx, by) in enumerate(keys):
                if a != b and abs(ax - bx) <= 1 and abs(ay - by) <= 1:
                    num += (x[a] - mu) * (x[b] - mu)
                    w += 1
        den = ((x - mu) ** 2).sum()
        return (len(keys) / w) * num / den

    base_ix, base_iy = 40, 30
    # 3x3 hot block (count 9) inside a ring of cold cells (count 1)
    clustered = {}
    for dx in range(5):
        for dy in range(5):
            hot = 1 <= dx <= 3 and 1 <= dy <= 3
            clustered[(base_ix + dx, base_iy + dy)] = 9 if hot else 1
    ci = spatial.morans_i(grid_points(clustered), res=5).collect()[0]
    assert abs(ci.moran_i - moran_ref(clustered)) < 1e-8, ci
    assert ci.moran_i > 0

    checker = {}
    for dx in range(5):
        for dy in range(5):
            checker[(base_ix + dx, base_iy + dy)] = \
                9 if (dx + dy) % 2 == 0 else 1
    xi = spatial.morans_i(grid_points(checker), res=5).collect()[0]
    assert abs(xi.moran_i - moran_ref(checker)) < 1e-8, xi
    assert xi.moran_i < 0
    assert ci.n_cells == xi.n_cells == 25
    assert ci.n_edges == xi.n_edges == 144


def test_getis_ord_hotspot_reference(spark):
    """Gi* against a direct NumPy reference on the clustered grid; the
    hot block's center scores highest, the far corner lowest."""
    import math

    from geolake_spark import cells
    from geolake_spark.operators import spatial

    nx, ny = cells.grid_dims(5)
    base_ix, base_iy = 40, 30
    weights = {}
    for dx in range(5):
        for dy in range(5):
            hot = 1 <= dx <= 3 and 1 <= dy <= 3
            weights[(base_ix + dx, base_iy + dy)] = 9 if hot else 1
    rows = []
    for (ix, iy), cnt in weights.items():
        lat = 90.0 - (iy + 0.5) / ny * 180.0
        lon = (ix + 0.5) / nx * 360.0 - 180.0
        rows.extend([(lat, lon)] * cnt)
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = spatial.getis_ord(df, res=5).collect()

    def ref(ix, iy):
        xs = list(weights.values())
        n = len(xs)
        mu = sum(xs) / n
        sd = math.sqrt(sum(x * x for x in xs) / n - mu * mu)
        nbrs = [(jx, jy) for (jx, jy) in weights
                if abs(jx - ix) <= 1 and abs(jy - iy) <= 1]
        wi = len(nbrs)
        s_i = sum(weights[k] for k in nbrs)
        return (s_i - wi * mu) / (sd * math.sqrt(
            (n * wi - wi * wi) / (n - 1)))

    ix_of = {}
    for r in out:
        ix = r.cell & ((1 << 28) - 1)
        iy = (r.cell >> 28) & ((1 << 28) - 1)
        ix_of[(ix, iy)] = r.gi_star
        assert abs(r.gi_star - ref(ix, iy)) < 1e-8
    center = ix_of[(base_ix + 2, base_iy + 2)]
    corner = ix_of[(base_ix, base_iy)]
    assert center == max(ix_of.values()) and center > 2.0
    assert corner < 0


def test_polygon_overlap_pairs_hand_checked(spark):
    from pyspark.sql import functions as F

    from geolake_spark.operators import spatial
    # two squares sharing a 2-cell strip at res 4 (cells ~5.6 deg wide);
    # third polygon far away -> no pair with it
    def sq(w, s, e, n):
        return [[[w, s], [e, s], [e, n], [w, n], [w, s]]]
    polys = spark.createDataFrame(
        [(1, sq(0.0, 0.0, 20.0, 10.0)), (2, sq(15.0, 0.0, 35.0, 10.0)),
         (3, sq(100.0, 50.0, 110.0, 60.0))],
        "polygon_id long, rings array<array<array<double>>>")
    got = {(r.id_a, r.id_b): r.shared_cells
           for r in spatial.polygon_overlap_pairs(polys, res=4).collect()}
    assert set(got) == {(1, 2)} and got[(1, 2)] >= 1
    # shared count equals the raster intersection size
    ra = spatial.polygon_raster_cells(polys.filter(F.col("polygon_id") == 1),
                                      res=4)
    rb = spatial.polygon_raster_cells(polys.filter(F.col("polygon_id") == 2),
                                      res=4)
    inter = ra.select("cell").intersect(rb.select("cell")).count()
    assert got[(1, 2)] == inter


def test_catchment_counts_hand_checked(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from geolake_spark import cells
    from geolake_spark.operators import spatial
    # POI at (0.1, 0.1); events: same cell, one cell east (inside k=1),
    # far away (outside); empty-catchment POI at the south pole region
    pois = spark.createDataFrame([(1, 0.1, 0.1), (2, -89.0, 0.0)],
                                 "poi_id long, lat double, lon double")
    nx, ny = cells.grid_dims(4)
    width = 360.0 / nx
    ev = spark.createDataFrame(
        [(0.1, 0.1), (0.1, 0.1 + width), (0.1, 0.1), (50.0, 120.0)],
        "lat double, lon double")
    got = {r.poi_id: (r.n_cells_hit, r.n_events)
           for r in spatial.catchment_counts(pois, ev, res=4,
                                             k=1).collect()}
    assert got[1] == (2, 3)          # home cell (2 events) + east (1)
    assert got[2] == (0, 0)          # pole POI: clamped disk, no events
    # k=0 degenerates to the home cell only
    got0 = {r.poi_id: (r.n_cells_hit, r.n_events)
            for r in spatial.catchment_counts(pois, ev, res=4,
                                              k=0).collect()}
    assert got0[1] == (1, 2)


# ----------------------------------------------------------------- WKT

def test_wkt_point_parse(spark):
    from geolake_spark.functions import geo as g
    rows = [(0, "POINT (12.5 -45.25)"), (1, "point(0 0)"),
            (2, "  POINT ( -1.5e1   2.5 ) "), (3, "LINESTRING (0 0, 1 1)"),
            (4, "not wkt at all"), (5, "POINT (1)")]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    lon, lat = g.wkt_point_col(F.col("wkt"))
    out = {r.doc_id: (r.lon, r.lat) for r in
           df.select("doc_id", lon.alias("lon"), lat.alias("lat")).collect()}
    assert out[0] == (12.5, -45.25)
    assert out[1] == (0.0, 0.0)          # case-insensitive, no space
    assert out[2] == (-15.0, 2.5)        # scientific notation + padding
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert out[5] == (None, None)


def test_wkt_polygon_rings_parse_and_duckdb(spark):
    import duckdb
    from geolake_spark.functions import geo as g
    w = ("POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0), "
         "(1.0 1.0, 3.0 1.0, 2.0 3.0))")
    df = spark.createDataFrame([(0, w)], "doc_id long, wkt string")
    rings = df.select(
        g.wkt_polygon_rings_col(F.col("wkt")).alias("r")).first().r
    assert len(rings) == 2
    assert rings[0][1] == [4.0, 0.0] and rings[1][2] == [2.0, 3.0]
    ora = duckdb.sql(
        f"SELECT {g.wkt_polygon_rings_sql('wkt')} AS r FROM "
        f"(SELECT '{w}' AS wkt)").fetchone()[0]
    assert ora == rings


def test_wkt_raster_hole_excluded(spark):
    """a square with a triangular hole: hole cells drop out (even-odd)"""
    from geolake_spark.functions import geo as g
    from geolake_spark.operators import spatial as sp
    solid = "POLYGON ((0.0 0.0, 40.0 0.0, 40.0 40.0, 0.0 40.0))"
    holed = ("POLYGON ((0.0 0.0, 40.0 0.0, 40.0 40.0, 0.0 40.0), "
             "(5.0 5.0, 35.0 5.0, 20.0 35.0))")
    df = spark.createDataFrame([(1, solid), (2, holed)],
                               "polygon_id long, wkt string")
    polys = df.select("polygon_id",
                      g.wkt_polygon_rings_col(F.col("wkt")).alias("rings"))
    out = sp.polygon_raster_cells(polys, res=4)
    n = {r.polygon_id: r.n for r in
         out.groupBy("polygon_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert n[1] > n[2] > 0


# --------------------------------------------------------- coverage gaps

def test_coverage_gaps_hand_checked(spark):
    # res 4: nx=128, cells are 2.8125 deg. events at three spots;
    # one POI covers the first spot's cell (k=1 disk)
    ev = _pts(spark, [(0.1, 0.1)] * 3 + [(0.1, 20.0)] * 2 + [(50.0, 50.0)])
    pois = _pts(spark, [(0.1, 1.0)])   # same or adjacent cell as (0.1, 0.1)
    out = {r.cell: r.n_events for r in spatial.coverage_gaps(
        ev, pois, res=4, k=1, min_pts=2).collect()}
    gap_cell = int(cells.grid_cell(0.1, 20.0, 4))
    covered = int(cells.grid_cell(0.1, 0.1, 4))
    lone = int(cells.grid_cell(50.0, 50.0, 4))
    assert out == {gap_cell: 2}        # covered cell gone; lone < min_pts
    assert covered not in out and lone not in out


def test_coverage_gaps_k_widens_cover(spark):
    ev = _pts(spark, [(0.1, 6.0)] * 2)     # ~2 cells east of the POI
    pois = _pts(spark, [(0.1, 0.1)])
    gap1 = spatial.coverage_gaps(ev, pois, res=4, k=1).count()
    gap2 = spatial.coverage_gaps(ev, pois, res=4, k=2).count()
    assert gap1 == 1 and gap2 == 0


# ------------------------------------------------------ nearest_segment

def test_nearest_segment_projection_and_clamp(spark):
    segs = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 0.0),     # horizontal segment on equator
         (2, 0.0, 5.0, 10.0, 5.0)],    # parallel, 5 deg north
        "seg_id long, x1 double, y1 double, x2 double, y2 double")
    pts = spark.createDataFrame(
        [(100, 1.0, 5.0),    # above seg1 interior: d2 = 1
         (101, 0.5, 12.0),   # beyond seg1 east end: clamps to (10,0)
         (102, 4.5, 3.0)],   # closer to seg2
        "point_id long, lat double, lon double")
    out = {r.point_id: (r.seg_id, r.d2) for r in spatial.nearest_segment(
        pts, segs, res=4).collect()}
    assert out[100] == (1, 1.0)
    assert out[101] == (1, 2.0 * 2.0 + 0.5 * 0.5)
    assert out[102][0] == 2 and abs(out[102][1] - 0.25) < 1e-12


def test_nearest_segment_degenerate_and_tie(spark):
    # zero-length segment = point distance; exact tie -> lower seg_id
    segs = spark.createDataFrame(
        [(7, 2.0, 2.0, 2.0, 2.0), (3, 0.0, 1.0, 4.0, 1.0),
         (9, 0.0, 3.0, 4.0, 3.0)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double")
    pts = spark.createDataFrame([(1, 2.0, 2.0)],
                                "point_id long, lat double, lon double")
    out = spatial.nearest_segment(pts, segs, res=4).collect()[0]
    assert out.seg_id == 7 and out.d2 == 0.0
    pts2 = spark.createDataFrame([(2, 2.0, 0.0)],
                                 "point_id long, lat double, lon double")
    out2 = spatial.nearest_segment(pts2, segs, res=4).collect()[0]
    assert out2.seg_id == 3 and out2.d2 == 1.0  # tie with 9: id wins


def test_polygon_area_centroid_hole_and_closed_ring(spark):
    # outer 10x10 deg square (closed ring, CW winding) with a 2x2 hole
    # (open ring, CCW) and a degenerate 2-point ring that must be
    # ignored
    outer = [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0],
             [0.0, 0.0]]
    hole = [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]]
    junk = [[1.0, 1.0], [2.0, 2.0]]
    df = spark.createDataFrame(
        [(1, [outer, hole, junk])],
        "polygon_id long, rings array<array<array<double>>>")
    r = spatial.polygon_area_centroid(df).collect()[0]
    deg2 = 10**12                       # 1 deg^2 in microdeg^2
    assert r.n_rings == 2               # junk ring dropped
    assert int(r.area2) == 2 * (100 - 4) * deg2
    assert abs(int(r.a2_outer)) == 2 * 100 * deg2
    # centroid of the symmetric square = (5, 5), sign-safe either winding
    assert (r.centroid_lon, r.centroid_lat) == (5.0, 5.0)


def test_polygon_area_centroid_triangle(spark):
    # right triangle (0,0)(4,0)(0,3): area 6, centroid (4/3, 1)
    tri = [[0.0, 0.0], [4.0, 0.0], [0.0, 3.0]]
    df = spark.createDataFrame(
        [(7, [tri])], "polygon_id long, rings array<array<array<double>>>")
    r = spatial.polygon_area_centroid(df).collect()[0]
    assert int(r.area2) == 2 * 6 * 10**12
    assert r.centroid_lat == 1.0
    assert abs(r.centroid_lon - 4.0 / 3.0) < 1e-9


def test_segment_intersections_hand_checked(spark):
    segs = [
        (1, 0.0, 0.0, 2.0, 0.0),     # horizontal
        (2, 1.0, -1.0, 1.0, 1.0),    # vertical, crosses 1 at (1, 0)
        (3, 0.0, 0.0, 0.0, 2.0),     # shares endpoint with 1: no hit
        (4, 0.0, 1.0, 2.0, 1.0),     # crosses 2 at (1, 1)? touches 2's
                                     # endpoint (1,1): improper -> no
        (5, 3.0, 0.0, 3.0, 1.0),     # collinear with nothing, isolated
        (6, 0.0, 0.0, 2.0, 0.0),     # duplicate of 1: collinear with 1
                                     # (no 1-6 hit) but crosses 2
    ]
    df = spark.createDataFrame(
        segs, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    got = {(r.seg_a, r.seg_b): (r.cross_lon, r.cross_lat)
           for r in spatial.segment_intersections(df, res=7).collect()}
    assert got == {(1, 2): (1.0, 0.0), (2, 6): (1.0, 0.0)}


def test_segment_intersections_cross_cell_boundary(spark):
    # crossing point near a cell edge must still be found (both bboxes
    # cover the crossing's cell by construction - no halo required)
    segs = [(1, -0.3, 0.0001, 0.3, 0.0001),
            (2, 0.0001, -0.3, 0.0001, 0.3)]
    df = spark.createDataFrame(
        segs, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    out = spatial.segment_intersections(df, res=9).collect()
    assert len(out) == 1
    assert (out[0].cross_lon, out[0].cross_lat) == (0.0001, 0.0001)


def test_stitch_segments_branch_jitter_and_isolated(spark):
    segs = [
        (1, 0.0, 0.0, 1.0, 0.0),        # chain a
        (2, 1.0, 0.0, 2.0, 0.0),        # continues a
        (3, 1.0, 0.0, 1.0, 1.0),        # T-branch off the shared node
        (4, 5.0, 5.0, 6.0, 5.0),        # isolated pair start
        (5, 6.000003, 5.0, 7.0, 5.0),   # 3-microdeg jitter: NO stitch
                                        # (sub-0.5-microdeg jitter DOES
                                        # snap - the quantization grain)
        (6, 9.0, 9.0, 9.0, 9.0),        # zero-length: own polyline
    ]
    df = spark.createDataFrame(
        segs, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    out = {r.seg_id: (r.polyline_id, r.polyline_segments)
           for r in spatial.stitch_segments(df).collect()}
    assert out[1][0] == out[2][0] == out[3][0]
    assert out[1][1] == 3
    assert out[4][0] != out[5][0]       # jitter did not stitch
    assert out[4][1] == out[5][1] == 1
    assert out[6][1] == 1               # zero-length kept, isolated
    assert len(out) == 6


def test_areal_transfer_hand_checked(spark):
    # src A: value 8 over an 8-cell-wide strip; dst covers exactly half
    # of A's cells -> gets value 4; dst2 covers none of A
    def poly(pid, x0, x1, y0, y1, value=None):
        ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
        return (pid, [ring]) if value is None else (pid, [ring], value)
    # res 6: cells 0.703 deg; use aligned multi-cell boxes
    src = spark.createDataFrame(
        [poly(1, 0.0, 5.625, 0.0, 0.703125, 8.0)],   # 8 x 1 cells
        "polygon_id long, rings array<array<array<double>>>, value double")
    dst = spark.createDataFrame(
        [poly(10, 0.0, 2.8125, 0.0, 0.703125),       # left 4 cells
         poly(11, 50.0, 51.0, 50.0, 51.0)],          # disjoint
        "polygon_id long, rings array<array<array<double>>>")
    got = {r.dst_id: (r.n_sources, r.value)
           for r in spatial.areal_transfer(src, dst, res=6).collect()}
    assert got == {10: (1, 4.0)}


def test_areal_transfer_splits_and_sums(spark):
    # two sources each overlap the one dst: contributions add in
    # src-id order (1-cell overlaps; src sizes 2 cells -> half each)
    def rings(x0, x1, y0, y1):
        return [[[x0, y0], [x1, y0], [x1, y1], [x0, y1]]]
    src = spark.createDataFrame(
        [(1, rings(0.0, 1.40625, 0.0, 0.703125), 10.0),
         (2, rings(0.703125, 2.109375, 0.0, 0.703125), 3.0)],
        "polygon_id long, rings array<array<array<double>>>, value double")
    dst = spark.createDataFrame(
        [(10, rings(0.703125, 1.40625, 0.0, 0.703125))],
        "polygon_id long, rings array<array<array<double>>>")
    out = spatial.areal_transfer(src, dst, res=6).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.dst_id, r.n_sources, r.value) == (10, 2, 10.0 / 2 + 3.0 / 2)


def test_segment_intersections_cell_cap(spark):
    # 5 co-located crossing segments in ONE cell (coords chosen away
    # from the lon/lat-0 cell boundaries): cap 4 kills the cell
    segs = [(i, 0.2, 0.01 + 0.001 * i, 0.3, 0.01 + 0.001 * i)
            for i in range(4)]
    segs += [(10, 0.25, 0.005, 0.25, 0.02)]  # vertical crossing all 4
    df = spark.createDataFrame(
        segs, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    full = spatial.segment_intersections(df, res=6).collect()
    assert len(full) == 4
    capped = spatial.segment_intersections(df, res=6,
                                           cell_cap=4).collect()
    assert capped == []                      # hot cell dropped, stated
