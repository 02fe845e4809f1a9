"""PageRank (operators/graph.py): closed-form graphs, mass
conservation, dangling handling, deterministic-mode equivalence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]))


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    r = _ranks(graph.pagerank(_edges(spark, [(1, 2), (2, 1)]), n_iter=5))
    assert r[1] == pytest.approx(0.5, abs=1e-12)
    assert r[2] == pytest.approx(0.5, abs=1e-12)


def test_star_center_dominates(spark):
    # 4 leaves all link to the hub; hub links back to leaf 1
    e = [(i, 0) for i in range(1, 5)] + [(0, 1)]
    r = _ranks(graph.pagerank(_edges(spark, e), n_iter=20))
    assert r[0] > r[1] > r[2]
    assert r[2] == pytest.approx(r[3], abs=1e-12)  # symmetric leaves


def test_mass_conserved_with_dangling(spark):
    # node 3 has no out-edges: its mass redistributes, total stays 1
    e = [(1, 2), (2, 3), (1, 3)]
    out = graph.pagerank(_edges(spark, e), n_iter=10)
    total = out.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_deterministic_mode_matches_default(spark):
    e = [(i, (i * 3 + 1) % 20) for i in range(20)] + \
        [(i, (i * 7 + 2) % 20) for i in range(20)]
    fast = _ranks(graph.pagerank(_edges(spark, e), n_iter=8))
    det = _ranks(graph.pagerank(_edges(spark, e), n_iter=8,
                                deterministic=True))
    assert set(fast) == set(det)
    for k in fast:
        assert fast[k] == pytest.approx(det[k], rel=1e-12)


# ---------------------------------------------------------------------------
# bfs_depths
# ---------------------------------------------------------------------------


def _bfs(spark, edges, seeds, max_depth=10):
    from geolake_spark.operators import graph
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {r.node: r.depth
            for r in graph.bfs_depths(e, s, max_depth).collect()}


def test_bfs_path_cycle_and_unreachable(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"),   # cycle
             ("c", "d"), ("x", "y")]               # y unreachable from a
    got = _bfs(spark, edges, ["a"])
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_multi_seed_min_and_direction(spark):
    edges = [("a", "b"), ("b", "c"), ("z", "c"), ("c", "z")]
    got = _bfs(spark, edges, ["a", "z"])
    # c reachable at depth 1 from z (beats depth 2 via a); edges are
    # directed — nothing reaches a besides the seed itself
    assert got == {"a": 0, "z": 0, "b": 1, "c": 1}


def test_bfs_max_depth_truncates(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
    got = _bfs(spark, edges, ["n0"], max_depth=3)
    assert got == {"n0": 0, "n1": 1, "n2": 2, "n3": 3}


def test_hits_star_graph(spark):
    """Hub/authority on a star: the center pointing at leaves is the
    only hub; leaves are equal authorities; in a reversed star the
    roles flip."""
    import math

    from geolake_spark.operators import graph
    e = spark.createDataFrame([("hub", f"leaf{i}") for i in range(4)],
                              "src string, dst string")
    out = {r.node: (r.hub, r.authority)
           for r in graph.hits(e, n_iter=5).collect()}
    assert out["hub"][0] == 1.0 and out["hub"][1] == 0.0
    for i in range(4):
        h, a = out[f"leaf{i}"]
        assert h == 0.0 and abs(a - 1 / math.sqrt(4)) < 1e-12


def test_hits_authority_ordering(spark):
    # two pages linked by 3 resp. 1 hubs: more in-links -> higher auth
    from geolake_spark.operators import graph
    edges = [("h1", "popular"), ("h2", "popular"), ("h3", "popular"),
             ("h1", "niche")]
    e = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r.authority for r in graph.hits(e, n_iter=8).collect()}
    assert out["popular"] > out["niche"] > 0.0


def test_cocitation_and_coupling(spark):
    from geolake_spark.operators import graph
    # s1 cites {a,b,c}; s2 cites {a,b}; s3 cites {a}
    edges = [("s1", "a"), ("s1", "b"), ("s1", "c"),
             ("s2", "a"), ("s2", "b"), ("s3", "a"),
             ("s2", "a")]                      # duplicate edge: ignored
    e = spark.createDataFrame(edges, "src string, dst string")
    co = {(r.id_a, r.id_b): r.shared
          for r in graph.cocitation_pairs(e).collect()}
    assert co == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    assert {(r.id_a, r.id_b): r.shared
            for r in graph.cocitation_pairs(e, min_shared=2).collect()} \
        == {("a", "b"): 2}
    # coupling: sources sharing out-links — s1/s2 share {a,b}, all share a
    cp = {(r.id_a, r.id_b): r.shared
          for r in graph.cocitation_pairs(e, mode="coupling").collect()}
    assert cp == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_host_report_hand_checked(spark):
    from geolake_spark.operators import links
    pages = [
        ("https://A.com/1",
         '<meta name="robots" content="noindex, nofollow">'),
        ("https://a.com/2", '<link rel="canonical" href="/c">'),
        ("https://a.com/3", ""),
        ("https://b.com/1", '<meta name="robots" content="nofollow">'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = {r.host: (r.n_pages, r.n_noindex, r.n_nofollow, r.n_canonical,
                    r.n_indexable)
           for r in links.host_report(df).collect()}
    # host lowercased: A.com and a.com roll up together
    assert got == {"a.com": (3, 1, 1, 1, 2), "b.com": (1, 0, 1, 0, 1)}


# ---------------------------------------------------------------- triangles

def _tri_map(df):
    return {r.node: (r.degree, r.triangles) for r in df.collect()}


def test_triangle_counts_known_graph(spark):
    # K4 on {0,1,2,3}: every node degree 3, in C(3,2)=3 triangles;
    # pendant node 4 attached to 0: degree 1, zero triangles
    e = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(0, 4)]
    out = _tri_map(graph.triangle_counts(_edges(spark, e)))
    assert out[4] == (1, 0)
    assert out[0] == (4, 3)
    for n in (1, 2, 3):
        assert out[n] == (3, 3)


def test_triangle_counts_dedups_and_drops_loops(spark):
    # duplicate edges, reverse edges, and self-loops must not
    # change counts: one triangle {1,2,3}
    e = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2)]
    out = _tri_map(graph.triangle_counts(_edges(spark, e)))
    assert out == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_triangle_counts_triangle_free(spark):
    # C5 cycle is triangle-free
    e = [(i, (i + 1) % 5) for i in range(5)]
    out = _tri_map(graph.triangle_counts(_edges(spark, e)))
    assert all(v == (2, 0) for v in out.values())


def test_triangle_counts_matches_duckdb(spark):
    import duckdb
    # double-mod: pairs must not be a function of i mod 17, or the
    # graph degenerates to <=17 edges (and possibly zero triangles)
    e = [((i * i + 3 * i) % 997 % 17, (i * i * 5 + i * 7 + 5) % 1009 % 17)
         for i in range(80)]
    out = sorted(map(tuple, graph.triangle_counts(
        _edges(spark, e)).collect()))
    sql = graph.triangle_counts_sql(
        "SELECT (i*i + 3*i) % 997 % 17 AS src, "
        "((i*i*5 + i*7 + 5) % 1009) % 17 AS dst "
        "FROM range(80) t(i)")
    ora = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert out == ora and len(out) > 5
    credits = sum(t for _, _, t in out)
    assert credits > 0 and credits % 3 == 0  # each triangle credited 3x


# ---------------------------------------------------------------- sssp

def _wedges(spark, triples):
    return spark.createDataFrame(
        pd.DataFrame(triples, columns=["src", "dst", "w"]))


def test_sssp_prefers_cheap_long_path(spark):
    # direct 1->4 costs 10; 1->2->3->4 costs 3
    e = [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    seeds = spark.createDataFrame(pd.DataFrame({"node": [1]}))
    out = {r.node: r.dist for r in graph.weighted_sssp(
        _wedges(spark, e), seeds, n_iter=4).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_sssp_hop_bound_is_the_contract(spark):
    e = [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    seeds = spark.createDataFrame(pd.DataFrame({"node": [1]}))
    out = {r.node: r.dist for r in graph.weighted_sssp(
        _wedges(spark, e), seeds, n_iter=1).collect()}
    assert out[4] == 10  # one hop only: the cheap 3-hop path is invisible


def test_sssp_undirected_and_multiseed(spark):
    e = [(1, 2, 5), (3, 2, 1)]
    seeds = spark.createDataFrame(pd.DataFrame({"node": [1, 3]}))
    out = {r.node: r.dist for r in graph.weighted_sssp(
        _wedges(spark, e), seeds, n_iter=3, directed=False).collect()}
    assert out == {1: 0, 3: 0, 2: 1}


def test_sssp_matches_duckdb(spark):
    import duckdb
    e = ([(i % 40, (i * 13 + 7) % 40, i % 9 + 1) for i in range(160)]
         + [(i % 40, (i * 29 + 11) % 40, i % 5 + 1) for i in range(160)])
    seeds = spark.createDataFrame(pd.DataFrame({"node": [0, 1]}))
    out = sorted(map(tuple, graph.weighted_sssp(
        _wedges(spark, e), seeds, n_iter=6).collect()))
    sql = graph.weighted_sssp_sql(
        "SELECT (i % 40) AS src, ((i*13 + 7) % 40) AS dst, "
        "(i % 9 + 1) AS w FROM range(160) t(i) "
        "UNION ALL SELECT (i % 40), ((i*29 + 11) % 40), (i % 5 + 1) "
        "FROM range(160) t(i)",
        "SELECT unnest([0, 1]) AS node", n_iter=6)
    ora = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert out == ora and len(out) > 10


# ---------------------------------------------------------------- k-core

def test_k_core_clique_with_tail(spark):
    # K5 plus a pendant chain: the 3-core is exactly the clique
    e = [(a, b) for a in range(5) for b in range(a + 1, 5)] + \
        [(4, 10), (10, 11), (11, 12)]
    out = {r.node: r.degree for r in graph.k_core(
        _edges(spark, e), k=3).collect()}
    assert out == {n: 4 for n in range(5)}


def test_k_core_cycle_and_tree(spark):
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    out = {r.node: r.degree for r in graph.k_core(
        _edges(spark, cyc), k=2).collect()}
    assert out == {n: 2 for n in range(6)}
    tree = [(0, 1), (0, 2), (1, 3), (1, 4)]
    assert graph.k_core(_edges(spark, tree), k=2).count() == 0


def test_k_core_cascading_peel(spark):
    # chain into a triangle: peeling the chain takes several rounds
    e = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    out = sorted(r.node for r in graph.k_core(
        _edges(spark, e), k=2).collect())
    assert out == [4, 5, 6]


def test_k_core_matches_duckdb(spark):
    import duckdb
    # double-mod so edge pairs aren't a function of i mod 30 (that
    # degenerates to <=30 possible edges); k=6 partially peels
    e = [((i * i + 3 * i) % 997 % 30, (i * i * 5 + i * 13 + 7) % 1009 % 30)
         for i in range(150)]
    out = sorted(map(tuple, graph.k_core(
        _edges(spark, e), k=6, n_iter=8).collect()))
    sql = graph.k_core_sql(
        "SELECT (i*i + 3*i) % 997 % 30 AS src, "
        "((i*i*5 + i*13 + 7) % 1009) % 30 AS dst "
        "FROM range(150) t(i)", k=6, n_iter=8)
    ora = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert out == ora and 0 < len(out) < 30  # nonempty AND peeled


def test_clustering_coefficients_hand_checked(spark):
    from geolake_spark.operators import graph
    # K4 minus edge (3,4): node 1,2 see both triangles, 3 and 4 one each
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long")
    got = {r.node: (r.degree, r.triangles, r.cc)
           for r in graph.clustering_coefficients(edges).collect()}
    assert got == {1: (3, 2, round(2 * 2 / 6, 9)),
                   2: (3, 2, round(2 * 2 / 6, 9)),
                   3: (2, 1, 1.0), 4: (2, 1, 1.0)}


def test_clustering_degree_one_is_zero(spark):
    from geolake_spark.operators import graph
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.cc
           for r in graph.clustering_coefficients(edges).collect()}
    assert got == {1: 0.0, 2: 0.0}
