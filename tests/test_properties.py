"""Property-based tests for the geo kernels (hypothesis) + frozen S2 goldens.

SURVEY.md §5: cell containment (cell(parent(c)) superset of cell(c)), PIP vs
brute force on random polygons, kNN-bound sanity — the properties the engine's
pruning correctness rests on.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geolake_spark import cells
from geolake_spark.operators import joins

lat_st = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
res_st = st.integers(min_value=0, max_value=15)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=1, max_value=15))
def test_parent_is_coarser_cell_of_same_point(lat, lon, res):
    child = cells.grid_cell(np.array([lat]), np.array([lon]), res)
    parent = cells.cell_parent(child, res - 1)
    direct = cells.grid_cell(np.array([lat]), np.array([lon]), res - 1)
    assert parent[0] == direct[0]


@settings(max_examples=100, deadline=None)
@given(lat=lat_st, lon=lon_st, res=res_st)
def test_cell_bounds_contain_point(lat, lon, res):
    """Containment up to IEEE boundary absorption: (lon + 180.0) can round
    onto a cell edge for |lon| below ~1e-13, assigning the point to the
    adjacent cell.  The same double math runs in the SQL oracle, so the
    engine is self-consistent; the property holds within 1e-9 degrees."""
    c = cells.grid_cell(np.array([lat]), np.array([lon]), res)
    s, n, w, e = cells.cell_bounds(c)
    eps = 1e-9
    assert s[0] - eps <= lat <= n[0] + eps
    assert w[0] - eps <= lon <= e[0] + eps


@settings(max_examples=50, deadline=None)
@given(data=st.data())
def test_covering_contains_inside_points(data):
    s = data.draw(st.floats(min_value=-89, max_value=88, allow_nan=False))
    n = data.draw(st.floats(min_value=s + 0.1, max_value=89, allow_nan=False))
    w = data.draw(st.floats(min_value=-179, max_value=178, allow_nan=False))
    e = data.draw(st.floats(min_value=w + 0.1, max_value=179, allow_nan=False))
    res = data.draw(st.integers(min_value=2, max_value=8))
    cover = set(cells.cells_covering_bbox(s, n, w, e, res).tolist())
    lat = data.draw(st.floats(min_value=s, max_value=n, allow_nan=False))
    lon = data.draw(st.floats(min_value=w, max_value=e, allow_nan=False))
    assert int(cells.grid_cell(np.array([lat]), np.array([lon]), res)[0]) in cover


@settings(max_examples=50, deadline=None)
@given(data=st.data())
def test_random_polygon_cover_classification_consistent(data):
    """For random simple (star-shaped) polygons: every point inside the
    polygon lands either in an interior cover cell or a boundary cover cell —
    never outside the cover (the PIP-join completeness property)."""
    cx = data.draw(st.floats(min_value=-150, max_value=150, allow_nan=False))
    cy = data.draw(st.floats(min_value=-60, max_value=60, allow_nan=False))
    k = data.draw(st.integers(min_value=3, max_value=9))
    radii = [data.draw(st.floats(min_value=1.0, max_value=12.0,
                                 allow_nan=False)) for _ in range(k)]
    angles = np.sort(np.linspace(0, 2 * np.pi, k, endpoint=False))
    ring = [[cx + r * np.cos(a), cy + r * np.sin(a)]
            for r, a in zip(radii, angles)]
    ring.append(ring[0])
    poly = {"polygon_id": 1, "rings": [ring]}
    res = 5
    cover = joins.build_pip_cover([poly], res)
    cover_cells = set(cover["cell"])
    rings_np = [np.asarray(ring, dtype=np.float64)]
    # sample points, keep those inside by brute force
    rng = np.random.RandomState(7)
    lat = np.clip(cy + rng.uniform(-15, 15, 200), -89.9, 89.9)
    lon = np.clip(cx + rng.uniform(-15, 15, 200), -179.9, 179.9)
    inside = cells.points_in_polygon(lat, lon, rings_np)
    pts_cells = cells.grid_cell(lat[inside], lon[inside], res)
    assert set(pts_cells.tolist()) <= cover_cells


@settings(max_examples=100, deadline=None)
@given(lat1=lat_st, lon1=lon_st, lat2=lat_st, lon2=lon_st)
def test_haversine_metric_properties(lat1, lon1, lat2, lon2):
    d = float(cells.haversine_km(lat1, lon1, lat2, lon2))
    d_rev = float(cells.haversine_km(lat2, lon2, lat1, lon1))
    assert d >= 0 and abs(d - d_rev) < 1e-9
    assert d <= 20015.1  # half circumference


@settings(max_examples=100, deadline=None)
@given(lat=lat_st, lon=lon_st,
       level=st.integers(min_value=1, max_value=30))
def test_s2_parent_prefix_property(lat, lon, level):
    child = cells.s2_cell_id(np.array([lat]), np.array([lon]), level)
    direct_parent = cells.s2_cell_id(np.array([lat]), np.array([lon]), level - 1)
    assert cells.s2_parent(child, level - 1)[0] == direct_parent[0]


# Frozen golden vectors: OUR implementation is the engine's reference
# (SURVEY.md §7 risk 1) — these pin it against silent regressions.
S2_GOLDENS = [
    (0.0, 0.0, 12, 1152921573326323712),
    (51.5074, -0.1278, 12, 5221366109382377472),
    (-33.8688, 151.2093, 12, 7715420632820744192),
    (40.7128, -74.0060, 12, -8520148382826627072),
    (89.9, 0.0, 10, 5764599826452840448),
]


def test_s2_golden_vectors():
    for lat, lon, level, expected in S2_GOLDENS:
        got = int(cells.s2_cell_id(np.array([lat]), np.array([lon]), level)[0])
        assert got == expected, (lat, lon, level, got)
