"""Trip segmentation (operators/trips.py): planted-scenario semantics +
the one-shuffle plan claim."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.cells import haversine_km
from geolake_spark.operators import trips


def _events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_id", "ts",
                                    "lat", "lon"]))


T0 = dt.datetime(2024, 3, 1, 8, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def planted(spark):
    # user 1: three points 10 min apart (one trip), then a 2 h gap and
    # two more points (second trip).  user 2: one lone point.
    rows = [
        (1, 10, _ts(0), 10.0, 20.0),
        (1, 11, _ts(10), 10.0, 21.0),
        (1, 12, _ts(20), 11.0, 21.0),
        (1, 13, _ts(140), 40.0, -3.0),
        (1, 14, _ts(150), 40.5, -3.0),
        (2, 20, _ts(5), -30.0, 100.0),
    ]
    return _events(spark, rows)


def test_segment_trips_boundaries(planted):
    pts = trips.segment_trips(planted, gap_minutes=60.0).collect()
    seq = {r.event_id: r.trip_seq for r in pts}
    assert seq == {10: 1, 11: 1, 12: 1, 13: 2, 14: 2, 20: 1}
    steps = {r.event_id: r.step_km for r in pts}
    # trip starts restart the step distance at 0
    assert steps[10] == 0.0 and steps[13] == 0.0 and steps[20] == 0.0
    assert steps[11] == pytest.approx(
        haversine_km(10.0, 20.0, 10.0, 21.0), rel=1e-12)


def test_trip_stats_rollup(planted):
    out = {(r.user_id, r.trip_seq): r
           for r in trips.trip_stats(planted, gap_minutes=60.0).collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    t11 = out[(1, 1)]
    assert t11.n_points == 3
    assert t11.duration_us == 20 * 60 * 1_000_000
    expect = (haversine_km(10.0, 20.0, 10.0, 21.0)
              + haversine_km(10.0, 21.0, 11.0, 21.0))
    assert t11.path_km == pytest.approx(expect, rel=1e-12)
    assert out[(1, 2)].n_points == 2
    lone = out[(2, 1)]
    assert lone.n_points == 1 and lone.duration_us == 0
    assert lone.path_km == 0.0


def test_exact_gap_is_same_trip(spark):
    # the cut is strictly-greater-than: a gap of exactly gap_minutes
    # stays in the same trip (integer-microsecond comparison)
    rows = [(1, 1, _ts(0), 0.0, 0.0), (1, 2, _ts(60), 0.0, 1.0),
            (1, 3, _ts(120.0001), 0.0, 2.0)]
    out = trips.trip_stats(_events(spark, rows), gap_minutes=60.0).collect()
    by_seq = {r.trip_seq: r.n_points for r in out}
    assert by_seq == {1: 2, 2: 1}


def test_trip_stats_single_shuffle(planted):
    # grouping on (user_id, trip_seq) extends the window's hash
    # partitioning on user_id — Catalyst must not add a second Exchange
    plan = trips.trip_stats(planted)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_od_matrix_flows(spark):
    import datetime as dt
    from geolake_spark import cells
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1, trip 1: A -> B (3 points); gap; trip 2: B -> A
    A, B = (10.0, 20.0), (30.0, 40.0)
    rows += [(1, 1, t0, *A), (2, 1, t0 + dt.timedelta(minutes=5), 20.0, 30.0),
             (3, 1, t0 + dt.timedelta(minutes=10), *B)]
    rows += [(4, 1, t0 + dt.timedelta(days=2), *B),
             (5, 1, t0 + dt.timedelta(days=2, minutes=9), *A)]
    # user 2: single-point trip at A (src == dst)
    rows += [(6, 2, t0, *A)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, lat double, lon double")
    out = {(r["src_cell"], r["dst_cell"]): r["n_trips"]
           for r in trips.od_matrix(df, res=4).collect()}
    cA = int(cells.grid_cell(*A, 4))
    cB = int(cells.grid_cell(*B, 4))
    assert out == {(cA, cB): 1, (cB, cA): 1, (cA, cA): 1}


def test_funnel_counts_hand_checked(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, minute, typ):
        return (eid, uid, t0 + dt.timedelta(minutes=minute), typ)

    rows = [
        # user 1: full ordered funnel
        ev(1, 1, 0, "view"), ev(2, 1, 1, "click"), ev(3, 1, 2, "purchase"),
        # user 2: purchase BEFORE click -> only reaches step 2
        ev(4, 2, 0, "view"), ev(5, 2, 1, "purchase"), ev(6, 2, 2, "click"),
        # user 3: view only
        ev(7, 3, 0, "view"),
        # user 4: never views (click+purchase don't count without step 1)
        ev(8, 4, 0, "click"), ev(9, 4, 1, "purchase"),
        # user 5: noise between steps still converts
        ev(10, 5, 0, "view"), ev(11, 5, 1, "error"), ev(12, 5, 2, "click"),
        ev(13, 5, 3, "error"), ev(14, 5, 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = trips.funnel_counts(df, ["view", "click", "purchase"]).collect()[0]
    assert out["n_entities"] == 5
    assert out["step1_users"] == 4   # users 1, 2, 3, 5
    assert out["step2_users"] == 3   # users 1, 2, 5
    assert out["step3_users"] == 2   # users 1, 5


def test_retention_matrix_hand_checked(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)  # epoch-day 19723 -> bucket 2817 (7d)
    rows = [
        # user 1: active in weeks 0, 1, 3 (relative to own first event)
        (1, t0), (1, t0 + dt.timedelta(days=8)),
        (1, t0 + dt.timedelta(days=22)),
        # user 2: first event two weeks later, active that week only
        (2, t0 + dt.timedelta(days=14)),
        (2, t0 + dt.timedelta(days=15)),
        # user 3: same cohort as user 1, active weeks 0 and 1
        (3, t0 + dt.timedelta(days=1)), (3, t0 + dt.timedelta(days=9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_bucket, r.bucket_offset): r.n_active
           for r in trips.retention_matrix(df, bucket_days=7,
                                           ts_col="ts").collect()}
    c0 = min(k[0] for k in out)
    assert out[(c0, 0)] == 2          # users 1 and 3 in week 0
    assert out[(c0, 1)] == 2          # both return in week 1
    assert out[(c0, 3)] == 1          # only user 1 in week 3
    assert out[(c0 + 2, 0)] == 1      # user 2's own cohort
    assert sum(v for k, v in out.items()) == 6  # user-week activity rows


def test_geofence_events_hand_checked(spark):
    """Planted walk: user 1 starts outside, enters fence, stays, exits,
    re-enters; user 2's FIRST event is inside (counts as enter); user 3
    never enters (no rows).  Fence = one cell supplied directly."""
    from geolake_spark.functions import geo
    # res 4 cell containing (10, 10)
    cell = spark.range(1).select(
        geo.grid_cell_col(F.lit(10.0), F.lit(10.0), 4).alias("cell")
    ).collect()[0].cell
    fences = spark.createDataFrame([(7, cell)], "polygon_id long, cell long")
    rows = [
        (1, 1, T0, -50.0, -50.0),                       # out
        (1, 2, T0 + dt.timedelta(minutes=1), 10.0, 10.0),   # enter
        (1, 3, T0 + dt.timedelta(minutes=2), 10.1, 10.1),   # still in
        (1, 4, T0 + dt.timedelta(minutes=3), -50.0, -50.0),  # exit
        (1, 5, T0 + dt.timedelta(minutes=4), 10.0, 10.0),   # re-enter
        (2, 6, T0, 10.0, 10.0),                          # first ev inside
        (3, 7, T0, -50.0, -50.0),                        # never in
    ]
    out = {r.event_id: (r.kind, r.fence_id)
           for r in trips.geofence_events(
               _events(spark, rows), fences, res=4).collect()}
    assert out == {2: ("enter", 7), 4: ("exit", 7), 5: ("enter", 7),
                   6: ("enter", 7)}


def test_geofence_broadcast_single_shuffle(spark):
    """Fence membership join is broadcast; the only Exchange is the
    entity window's hash partitioning."""
    fences = spark.createDataFrame([(7, 123)], "polygon_id long, cell long")
    rows = [(1, 1, T0, 10.0, 10.0)]
    plan = (trips.geofence_events(_events(spark, rows), fences, res=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # the events path shuffles exactly once (the entity window); the other
    # hash exchange is the fences-sized groupBy(cell) before the broadcast
    assert plan.count("hashpartitioning(entity") == 1


def test_flow_octants_hand_checked(spark):
    # one user walking: N, E, NE(diagonal), stay from the same start cell
    rows = [(1, 1, T0, 0.0, 0.0),
            (1, 2, T0 + dt.timedelta(minutes=1), 1.0, 0.0),    # N
            (1, 3, T0 + dt.timedelta(minutes=2), 1.0, 1.0),    # E
            (1, 4, T0 + dt.timedelta(minutes=3), 2.0, 2.0),    # NE (equal)
            (1, 5, T0 + dt.timedelta(minutes=4), 2.0, 2.0)]    # stay
    out = {}
    for r in trips.flow_octants(_events(spark, rows), res=2).collect():
        out.setdefault(r.octant, 0)
        out[r.octant] += r.n_steps
    assert out == {"N": 1, "E": 1, "NE": 1, "stay": 1}


def test_stay_points_hand_checked(spark):
    """Runs segment on cell change; dwell filters; re-entry is a new run."""
    rows = [
        (1, 1, T0, 10.0, 10.0),
        (1, 2, T0 + dt.timedelta(hours=1), 10.1, 10.1),   # same cell
        (1, 3, T0 + dt.timedelta(hours=2), -50.0, -50.0),  # move away
        (1, 4, T0 + dt.timedelta(hours=3), 10.0, 10.0),   # back: new run
        (2, 5, T0, 10.0, 10.0),                            # lone ping
    ]
    out = trips.stay_points(_events(spark, rows), res=4,
                            min_minutes=60.0).collect()
    assert len(out) == 1
    sp = out[0]
    assert sp.entity == 1 and sp.n_events == 2
    assert sp.dwell_us == 3_600_000_000
    # run 2 (event 4) and the lone ping have dwell 0 -> filtered
    allruns = trips.stay_points(_events(spark, rows), res=4,
                                min_minutes=0.0).collect()
    assert len(allruns) == 4        # [1-2], [3], [4], [5]


def test_stay_points_single_shuffle(spark):
    rows = [(1, 1, T0, 10.0, 10.0)]
    plan = (trips.stay_points(_events(spark, rows), res=4)
            ._jdf.queryExecution().executedPlan().toString())
    # both windows + the (entity, run) rollup share one entity exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_covisit_pairs_hand_checked(spark):
    from geolake_spark import cells
    A, B, C = (10.0, 10.0), (40.0, 40.0), (-60.0, 100.0)
    rows = [(1, 1, T0, *A), (1, 2, T0, *B),            # user 1: A,B
            (2, 3, T0, *A), (2, 4, T0, *B), (2, 5, T0, *C),  # 2: A,B,C
            (3, 6, T0, *A), (3, 7, T0, *A)]            # 3: A only (dup)
    out = {(r.cell_a, r.cell_b): r.n_entities
           for r in trips.covisit_pairs(_events(spark, rows), res=3,
                                        min_common=1).collect()}
    cA = int(cells.grid_cell(*A, 3))
    cB = int(cells.grid_cell(*B, 3))
    cC = int(cells.grid_cell(*C, 3))
    key = lambda x, y: (min(x, y), max(x, y))
    assert out[key(cA, cB)] == 2                      # users 1 and 2
    assert out[key(cA, cC)] == 1 and out[key(cB, cC)] == 1
    assert len(out) == 3


# ------------------------------------------------------- transitions

def _typed_events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                    "event_type"]))


def test_transition_counts_hand_checked(spark):
    rows = [
        (1, _ts(0), 1, "view"), (1, _ts(1), 2, "click"),
        (1, _ts(2), 3, "view"),
        (2, _ts(0), 4, "view"), (2, _ts(1), 5, "click"),
    ]
    out = {(r.from_type, r.to_type): r.transitions
           for r in trips.transition_counts(
               _typed_events(spark, rows)).collect()}
    assert out == {("view", "click"): 2, ("click", "view"): 1}


def test_transition_counts_gap_cut(spark):
    rows = [
        (1, _ts(0), 1, "view"), (1, _ts(5), 2, "click"),   # 5 min: kept
        (1, _ts(20), 3, "view"),                           # 15 min: cut
    ]
    out = {(r.from_type, r.to_type): r.transitions
           for r in trips.transition_counts(
               _typed_events(spark, rows), gap_minutes=10.0).collect()}
    assert out == {("view", "click"): 1}


def test_transition_counts_ts_tie_breaks_on_id(spark):
    rows = [(1, _ts(0), 2, "click"), (1, _ts(0), 1, "view")]
    out = {(r.from_type, r.to_type): r.transitions
           for r in trips.transition_counts(
               _typed_events(spark, rows)).collect()}
    assert out == {("view", "click"): 1}


# ------------------------------------------------------- attribution

def test_attribution_first_last_touch(spark):
    rows = [
        (1, _ts(0), 1, "view"), (1, _ts(1), 2, "click"),
        (1, _ts(2), 3, "view"), (1, _ts(3), 4, "purchase"),
    ]
    out = trips.attribution(_typed_events(spark, rows),
                            lookback_minutes=60.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.first_touch, r.last_touch) == ("view", "view")
    assert r.event_id == 4


def test_attribution_lookback_excludes_old_touches(spark):
    rows = [
        (1, _ts(0), 1, "click"),            # outside 10-min lookback
        (1, _ts(5), 2, "view"),             # inside
        (1, _ts(14), 3, "purchase"),
    ]
    out = trips.attribution(_typed_events(spark, rows),
                            lookback_minutes=10.0).collect()[0]
    assert (out.first_touch, out.last_touch) == ("view", "view")


def test_attribution_no_touch_is_null(spark):
    rows = [(1, _ts(0), 1, "error"), (1, _ts(1), 2, "purchase")]
    out = trips.attribution(_typed_events(spark, rows),
                            lookback_minutes=60.0).collect()[0]
    assert out.first_touch is None and out.last_touch is None


def test_attribution_same_micros_excluded_and_tie_on_id(spark):
    # touch at the conversion's exact microsecond is NOT in [t-lb, t-1];
    # two touches at the same earlier microsecond break ties on event_id
    rows = [
        (1, _ts(0), 5, "view"), (1, _ts(0), 6, "click"),
        (1, _ts(1), 7, "click"),   # same micros as conversion: excluded
        (1, _ts(1), 8, "purchase"),
    ]
    out = trips.attribution(_typed_events(spark, rows),
                            lookback_minutes=60.0).collect()[0]
    assert (out.first_touch, out.last_touch) == ("view", "click")


def test_attribution_single_window_node(spark):
    rows = [(1, _ts(0), 1, "view"), (1, _ts(1), 2, "purchase")]
    plan = (trips.attribution(_typed_events(spark, rows))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1


# ------------------------------------------------------ simplify_track

def _track(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                    "lat", "lon"]))


def test_simplify_track_hand_checked(spark):
    # eps = 100000 microdeg = 0.1 deg; squared-distance keep rule
    rows = [
        (1, _ts(0), 1, 0.00, 0.0),   # first: kept
        (1, _ts(1), 2, 0.05, 0.0),   # 0.05 < 0.1: dropped
        (1, _ts(2), 3, 0.20, 0.0),   # 0.20 from (0,0): kept
        (1, _ts(3), 4, 0.24, 0.0),   # 0.04 from last kept: dropped
        (1, _ts(4), 5, 0.26, 0.0),   # 0.06 from (0.20): dropped, but LAST
    ]
    out = sorted(r.event_id for r in trips.simplify_track(
        _track(spark, rows), eps_microdeg=100_000).collect())
    assert out == [1, 3, 5]          # last point force-kept


def test_simplify_track_exact_eps_is_kept(spark):
    rows = [(1, _ts(0), 1, 0.0, 0.0), (1, _ts(1), 2, 0.1, 0.0),
            (1, _ts(2), 3, 0.1, 0.0)]
    out = sorted(r.event_id for r in trips.simplify_track(
        _track(spark, rows), eps_microdeg=100_000).collect())
    assert out == [1, 2, 3]          # >= eps kept; id 3 is the last


def test_simplify_track_single_point_and_shuffle(spark):
    rows = [(7, _ts(0), 42, 1.0, 2.0)]
    df = trips.simplify_track(_track(spark, rows), eps_microdeg=1000)
    # read the plan BEFORE collect: post-AQE the string repeats the
    # tree (Final Plan + Initial Plan) and every node counts twice
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    got = df.collect()
    assert len(got) == 1 and got[0].event_id == 42


def test_track_hausdorff_hand_checked(spark):
    # users 1 and 2 share a cell; user 3 is far away (no candidate pair)
    rows = [
        (1, 1, _ts(0), 0.0, 0.0),
        (1, 2, _ts(1), 0.0, 0.000003),
        (2, 3, _ts(0), 0.0, 0.000001),
        (2, 4, _ts(1), 0.0, 0.000010),
        (3, 5, _ts(0), 50.0, 50.0),
    ]
    out = trips.track_hausdorff(_events(spark, rows), res=6,
                                min_common=1).collect()
    assert len(out) == 1
    r = out[0]
    # h(A,B)=4 (point (0,3) -> nearest (0,1)); h(B,A)=49 ((0,10)->(0,3))
    assert (r.ent_a, r.ent_b, r.n_common, r.hausdorff_d2) == (1, 2, 1, 49)


def test_track_hausdorff_max_points_truncates(spark):
    # user 2's third point (far away) is beyond max_points=2 in ts
    # order, so it must not contribute to the distance
    rows = [
        (1, 1, _ts(0), 0.0, 0.0),
        (2, 2, _ts(0), 0.0, 0.000001),
        (2, 3, _ts(1), 0.0, 0.000002),
        (2, 4, _ts(2), 0.0, 0.020000),   # truncated away
    ]
    out = trips.track_hausdorff(_events(spark, rows), res=6,
                                min_common=1, max_points=2).collect()
    assert len(out) == 1
    assert out[0].hausdorff_d2 == 4    # (0,0) vs {(0,1),(0,2)} -> 4
    full = trips.track_hausdorff(_events(spark, rows), res=6,
                                 min_common=1, max_points=16).collect()
    assert full[0].hausdorff_d2 == 20000 * 20000


def test_track_hausdorff_cell_cap_drops_hot_cell(spark):
    # 4 entities in one cell: cap 3 kills the bucket -> no pairs
    rows = [(u, u, _ts(0), 0.0, 0.0) for u in range(4)]
    out = trips.track_hausdorff(_events(spark, rows), res=6,
                                min_common=1, cell_cap=3).collect()
    assert out == []
    uncapped = trips.track_hausdorff(_events(spark, rows), res=6,
                                     min_common=1, cell_cap=None).collect()
    assert len(uncapped) == 6          # all C(4,2) pairs, distance 0
    assert {r.hausdorff_d2 for r in uncapped} == {0}


def test_cohort_ltv_hand_checked(spark):
    d0 = dt.datetime(2024, 1, 1)       # epoch-day 19723ish; exact
    rows = [
        # user 1: cohort week W, spends 1.00 then 2.00 next week
        (1, 1, d0, 1.00),
        (1, 2, d0 + dt.timedelta(days=8), 2.00),
        # user 2: same cohort week, spends 0.50 in week 0 only
        (2, 3, d0 + dt.timedelta(days=1), 0.50),
        # user 3: cohort one week later, 4.00
        (3, 4, d0 + dt.timedelta(days=9), 4.00),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, "
                               "ts timestamp, value double")
    got = {(r.cohort_bucket, r.bucket_offset):
           (r.cohort_users, r.cum_cents, r.ltv_per_user)
           for r in trips.cohort_ltv(df, bucket_days=7).collect()}
    w0 = min(c for c, _o in got)
    assert got == {
        (w0, 0): (2, 150, 75.0),        # users 1+2: 100+50 cents
        (w0, 1): (2, 350, 175.0),       # +200 in week 1
        (w0 + 1, 0): (1, 400, 400.0),   # user 3's own cohort
    }


def test_collapse_repeats_hand_checked(spark):
    rows = [
        (1, 1, _ts(0), "a"),
        (1, 2, _ts(1), "a"),     # repeat within window: dropped
        (1, 3, _ts(2), "b"),     # payload changed: kept
        (1, 4, _ts(3), "a"),     # prev is b: kept
        (1, 5, _ts(200), "a"),   # repeat but past the window: kept
        (2, 6, _ts(0), "a"),     # other entity: kept
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, "
                               "ts timestamp, sig string")
    kept = {r.event_id for r in trips.collapse_repeats(
        df, within_seconds=120.0, payload_cols=["sig"]).collect()}
    assert kept == {1, 3, 4, 5, 6}


def test_funnel_within_hand_checked(spark):
    rows = [
        # user 1: view -> click (20m) -> purchase (20m): converts
        (1, 1, _ts(0), "view"), (1, 2, _ts(20), "click"),
        (1, 3, _ts(40), "purchase"),
        # user 2: click before view doesn't count; view -> click ok,
        # purchase 90m after click misses the 60m deadline
        (2, 4, _ts(0), "click"), (2, 5, _ts(10), "view"),
        (2, 6, _ts(30), "click"), (2, 7, _ts(120), "purchase"),
        # user 3: only noise event types
        (3, 8, _ts(0), "error"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, "
                               "ts timestamp, event_type string")
    got = {r.entity: (r.stages, r.converted)
           for r in trips.funnel_within(
               df, ["view", "click", "purchase"],
               within_minutes=60.0).collect()}
    # user 3 has no step events at all -> absent
    assert got == {1: (3, True), 2: (2, False)}


def test_funnel_within_greedy_restart_clock(spark):
    # greedy takes the FIRST click (5m) and the purchase at 70m misses
    # ITS deadline even though a later click (30m) would have made it
    rows = [(1, 1, _ts(0), "view"), (1, 2, _ts(5), "click"),
            (1, 3, _ts(30), "click"), (1, 4, _ts(70), "purchase")]
    df = spark.createDataFrame(rows, "user_id long, event_id long, "
                               "ts timestamp, event_type string")
    out = trips.funnel_within(df, ["view", "click", "purchase"],
                              within_minutes=60.0).collect()[0]
    assert (out.stages, out.converted) == (2, False)
