"""Link-graph analytics: PageRank (Brin & Page 1998, the public
algorithm) over an edge table.

The scale shape per iteration is one hash join (ranks -> edges on src,
both sides partitioned by the join key across iterations) and one
groupBy(dst) aggregation; dangling mass is a scalar reduce.  Connected
components for dedup live in operators/dedup.py (star contraction);
this module covers the weighted/iterative family.

Float determinism: a distributed double sum depends on reduction order,
which would break the DuckDB value-hash oracle and any bit-exact
regression test.  ``deterministic=True`` therefore folds each dst's
contributions in ascending ``src`` order (array_sort + sequential
aggregate — the repo's proven Spark-fold == DuckDB ``list_sum`` parity)
and the dangling mass in ascending node order.  That mode costs a
collect_list per dst and is for oracles/tests; production scale uses
the default commutative ``sum`` (same result up to float associativity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sorted_fold(struct_col):
    return F.aggregate(F.array_sort(F.collect_list(struct_col)),
                       F.lit(0.0), lambda acc, x: acc + x["v"])


def pagerank(edges: DataFrame, n_iter: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             deterministic: bool = False) -> DataFrame:
    """``(node, rank)`` after ``n_iter`` power iterations with uniform
    init, dangling-mass redistribution, and teleport ``1 - damping``.
    Ranks sum to 1 each iteration (up to float error)."""
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").cache()
    out_nodes = deg.select(F.col("src").alias("node"))

    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n)))
                         .alias("rank"))
    for _ in range(n_iter):
        # truncate lineage every iteration: without this the logical plan
        # doubles per iteration and Catalyst analysis dominates wall
        # time long before the data does
        ranks = ranks.localCheckpoint(eager=True)
        dangling = ranks.join(out_nodes, "node", "left_anti")
        if deterministic:
            dang_expr = _sorted_fold(
                F.struct(F.col("node"), F.col("rank").alias("v")))
        else:
            dang_expr = F.coalesce(F.sum("rank"), F.lit(0.0))
        dang = float(dangling.agg(dang_expr).collect()[0][0] or 0.0)

        contribs = (ed.join(ranks, ed.src == F.col("node"))
                    .select("dst", "src",
                            (F.col("rank") / F.col("deg")).alias("v")))
        if deterministic:
            s = contribs.groupBy("dst").agg(_sorted_fold(
                F.struct(F.col("src"), F.col("v"))).alias("s"))
        else:
            s = contribs.groupBy("dst").agg(F.sum("v").alias("s"))
        new_rank = (F.lit(1.0 - damping) / F.lit(float(n))
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0))
                       + F.lit(dang) / F.lit(float(n))))
        ranks = (nodes.join(s, nodes.node == F.col("dst"), "left")
                 .select("node", new_rank.alias("rank")))
    return ranks


def pagerank_sql(edges_sql: str, n_iter: int = 10,
                 damping: float = 0.85) -> str:
    """DuckDB twin of ``pagerank(deterministic=True)``: the power
    iteration unrolled into ``n_iter`` CTE stages, per-dst sums as
    ``list_sum(list(v ORDER BY src))`` and the dangling mass as
    ``list_sum(list(rank ORDER BY node))`` — the same sequential folds
    as the Spark deterministic mode."""
    d = damping
    parts = [f"""_pr_e AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM ({edges_sql})
), _pr_nodes AS MATERIALIZED (
    SELECT src AS node FROM _pr_e UNION SELECT dst FROM _pr_e
), _pr_n AS MATERIALIZED (
    SELECT cast(count(*) as double) AS n FROM _pr_nodes
), _pr_deg AS MATERIALIZED (
    SELECT src, count(*) AS deg FROM _pr_e GROUP BY 1
), _pr_r0 AS MATERIALIZED (
    SELECT node, 1.0 / n AS rank FROM _pr_nodes, _pr_n
)"""]
    for i in range(1, n_iter + 1):
        p = f"_pr_r{i - 1}"
        parts.append(f"""_pr_dang{i} AS MATERIALIZED (
    SELECT coalesce(list_sum(list(rank ORDER BY node)), 0.0) AS dang
    FROM {p} WHERE node NOT IN (SELECT src FROM _pr_e)
), _pr_s{i} AS MATERIALIZED (
    SELECT e.dst, list_sum(list(r.rank / d.deg ORDER BY e.src)) AS s
    FROM _pr_e e JOIN {p} r ON e.src = r.node
    JOIN _pr_deg d ON d.src = e.src
    GROUP BY e.dst
), _pr_r{i} AS MATERIALIZED (
    SELECT nn.node,
           (1.0 - {d!r}) / n + {d!r} * (coalesce(s.s, 0.0) + dang / n)
             AS rank
    FROM _pr_nodes nn LEFT JOIN _pr_s{i} s ON s.dst = nn.node,
         _pr_n, _pr_dang{i}
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, rank FROM _pr_r{n_iter}")


def bfs_depths(edges: DataFrame, seeds: DataFrame, max_depth: int = 10,
               src: str = "src", dst: str = "dst",
               node_col: str = "node") -> DataFrame:
    """``(node, depth)``: minimum hop count from any seed following edge
    direction — the crawl-depth / distance-from-homepage feature.
    Nodes unreachable within ``max_depth`` are absent.

    Frontier BFS: each round joins ONLY the newly-discovered frontier
    against the edges (frontier-sized join, not visited-sized), anti-
    joins the visited set, and truncates lineage (the pagerank
    localCheckpoint lesson — without it Catalyst analysis dominates by
    round ~10).  Early-exits when the frontier empties, so bounded
    graphs cost their eccentricity, not ``max_depth``.  Integer-exact:
    the oracle replays it with a recursive CTE."""
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct().cache()
    visited = seeds.select(F.col(node_col).alias("node")).distinct() \
        .select("node", F.lit(0).alias("depth"))
    frontier = visited
    for d in range(1, max_depth + 1):
        frontier = (e.join(frontier.select(F.col("node").alias("src")),
                           "src")
                    .select(F.col("dst").alias("node")).distinct()
                    .join(visited, "node", "left_anti")
                    .select("node", F.lit(d).alias("depth"))
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            break
        visited = visited.union(frontier).localCheckpoint(eager=True)
    return visited


def bfs_depths_sql(edges_sql: str, seeds_sql: str,
                   max_depth: int = 10) -> str:
    """DuckDB mirror of :func:`bfs_depths` — recursive CTE with UNION
    (distinct) so the (node, depth) state space is finite even on
    cyclic graphs; min(depth) per node is the BFS distance."""
    return f"""
WITH RECURSIVE _bfs AS (
  SELECT node, 0 AS depth FROM ({seeds_sql})
  UNION
  SELECT e.dst AS node, _bfs.depth + 1 AS depth
  FROM _bfs JOIN ({edges_sql}) e ON e.src = _bfs.node
  WHERE _bfs.depth < {max_depth}
)
SELECT node, cast(min(depth) AS INTEGER) AS depth
FROM _bfs GROUP BY node"""


def hits(edges: DataFrame, n_iter: int = 10, src: str = "src",
         dst: str = "dst") -> DataFrame:
    """``(node, hub, authority)`` after ``n_iter`` HITS iterations
    (Kleinberg 1999): authority(d) = sum of hub over in-edges, then hub
    (s) = sum of the NEW authority over out-edges, each L2-normalized.
    PageRank's companion web-ranking — hubs are link directories,
    authorities are the linked-to canon.

    Determinism contract (always on — HITS is only offered oracle-
    replayable): every per-node sum and both norm reductions are
    sorted sequential folds, norms fold over the RAW aggregated rows
    only (zeros are exact +0.0 no-ops, but the fold sequence is the
    contract), divisions are scalar.  Lineage truncated per iteration
    (the pagerank lesson)."""
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct().cache()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = nodes.select("node", F.lit(0.0).alias("a"))
    for _ in range(n_iter):
        hub = hub.localCheckpoint(eager=True)
        araw = (e.join(hub, e.src == F.col("node"))
                .select("dst", "src", F.col("h").alias("v"))
                .groupBy("dst")
                .agg(_sorted_fold(F.struct(F.col("src"), F.col("v")))
                     .alias("v")))
        az = float(araw.agg(F.sqrt(_sorted_fold(
            F.struct(F.col("dst").alias("node"),
                     (F.col("v") * F.col("v")).alias("v"))))
        ).collect()[0][0])
        auth = (nodes.join(araw, nodes.node == araw.dst, "left")
                .select("node", (F.coalesce(F.col("v"), F.lit(0.0))
                                 / F.lit(az)).alias("a"))
                .localCheckpoint(eager=True))
        hraw = (e.join(auth, e.dst == F.col("node"))
                .select("src", "dst", F.col("a").alias("v"))
                .groupBy("src")
                .agg(_sorted_fold(F.struct(F.col("dst"), F.col("v")))
                     .alias("v")))
        hz = float(hraw.agg(F.sqrt(_sorted_fold(
            F.struct(F.col("src").alias("node"),
                     (F.col("v") * F.col("v")).alias("v"))))
        ).collect()[0][0])
        hub = (nodes.join(hraw, nodes.node == hraw.src, "left")
               .select("node", (F.coalesce(F.col("v"), F.lit(0.0))
                                / F.lit(hz)).alias("h")))
    return (nodes.join(hub, "node").join(auth, "node")
            .select("node", F.col("h").alias("hub"),
                    F.col("a").alias("authority")))


def hits_sql(edges_sql: str, n_iter: int = 10) -> str:
    """DuckDB twin of :func:`hits` — iterations unrolled into
    MATERIALIZED CTE stages (inlining re-evaluates stages exponentially,
    the pagerank_sql lesson), per-node sums as list_sum over ORDER BY
    lists, norms folded over the raw aggregated rows."""
    parts = [f"""_ht_e AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM ({edges_sql})
), _ht_nodes AS MATERIALIZED (
    SELECT src AS node FROM _ht_e UNION SELECT dst FROM _ht_e
), _ht_h0 AS MATERIALIZED (
    SELECT node, 1.0 AS h FROM _ht_nodes
)"""]
    for i in range(1, n_iter + 1):
        parts.append(f"""_ht_ar{i} AS MATERIALIZED (
    SELECT e.dst, list_sum(list(h.h ORDER BY e.src)) AS v
    FROM _ht_e e JOIN _ht_h{i - 1} h ON h.node = e.src
    GROUP BY e.dst
), _ht_az{i} AS MATERIALIZED (
    SELECT sqrt(list_sum(list(v * v ORDER BY dst))) AS z FROM _ht_ar{i}
), _ht_a{i} AS MATERIALIZED (
    SELECT nn.node, coalesce(r.v, 0.0) / z AS a
    FROM _ht_nodes nn LEFT JOIN _ht_ar{i} r ON r.dst = nn.node, _ht_az{i}
), _ht_hr{i} AS MATERIALIZED (
    SELECT e.src, list_sum(list(a.a ORDER BY e.dst)) AS v
    FROM _ht_e e JOIN _ht_a{i} a ON a.node = e.dst
    GROUP BY e.src
), _ht_hz{i} AS MATERIALIZED (
    SELECT sqrt(list_sum(list(v * v ORDER BY src))) AS z FROM _ht_hr{i}
), _ht_h{i} AS MATERIALIZED (
    SELECT nn.node, coalesce(r.v, 0.0) / z AS h
    FROM _ht_nodes nn LEFT JOIN _ht_hr{i} r ON r.src = nn.node, _ht_hz{i}
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT h.node, h.h AS hub, a.a AS authority "
              f"FROM _ht_h{n_iter} h JOIN _ht_a{n_iter} a USING (node)")


def cocitation_pairs(edges: DataFrame, min_shared: int = 1,
                     src: str = "src", dst: str = "dst",
                     mode: str = "cocitation") -> DataFrame:
    """Structural similarity on the link graph (Small 1973 / Kessler
    1963): ``mode="cocitation"`` pairs TARGETS cited by the same source
    (pages co-linked from many pages are topically related);
    ``mode="coupling"`` pairs SOURCES sharing out-links (bibliographic
    coupling).  ``(id_a, id_b, shared)`` with shared >= ``min_shared``
    — integer-exact.

    Reuses the dedup bucket-pair kernel: the grouping side is the
    "bucket", the paired side streams through the in-bucket HOF
    upper-triangle (one shuffle, no two-sided self-join); a hub source
    citing k targets contributes k²/2 pairs — cap hot buckets upstream
    with a degree filter when the graph has mega-hubs (stated)."""
    assert mode in ("cocitation", "coupling")
    from geolake_spark.operators.dedup import _bucket_pairs
    key, val = (src, dst) if mode == "cocitation" else (dst, src)
    items = edges.select(F.col(val).alias("id"),
                         F.col(key).alias("k")).distinct()
    pairs = (_bucket_pairs(items, ["k"], dedupe=False)
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("shared")))
    return pairs.filter(F.col("shared") >= min_shared)


def cocitation_pairs_sql(edges_sql: str, min_shared: int = 1,
                         mode: str = "cocitation") -> str:
    """DuckDB mirror of :func:`cocitation_pairs`."""
    assert mode in ("cocitation", "coupling")
    key, val = ("src", "dst") if mode == "cocitation" else ("dst", "src")
    return f"""
WITH _cc_i AS (
  SELECT DISTINCT {val} AS id, {key} AS k FROM ({edges_sql})
)
SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
FROM _cc_i a JOIN _cc_i b USING (k)
WHERE a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}"""


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation
    (Suri & Vassilvitskii, WWW'11 — the MapReduce algorithm that kills
    "the curse of the last reducer").  ``(node, degree, triangles)``,
    one row per node of the undirected simple graph (self-loops and
    duplicate/reverse edges collapsed first).

    Scale shape: every edge is oriented from its lower-(degree, node)
    endpoint to the higher one, so each triangle is generated by exactly
    one wedge at its minimum-order apex and a node's oriented
    out-degree is O(sqrt(m)) — the hub that would emit deg² wedges
    under naive wedge generation emits none, because all its edges
    point AT it.  Wedges stream through the dedup-style two-level
    posexplode (one groupBy shuffle, no k² array in a single row) and
    are verified against the canonical edge set with one join.  All
    counts integer — bit-exact across engines."""
    a, b = F.col(src), F.col(dst)
    e0 = (edges.filter(a != b)
          .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
          .distinct())
    deg = (e0.select(F.col("a").alias("node"))
           .unionAll(e0.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_db"))
    # a < b by construction, so the (degree, node) tie-break on equal
    # degrees is "keep (a, b)"
    oe = (e0.join(da, "a").join(db, "b")
          .select(F.when(F.col("_da") <= F.col("_db"), F.col("a"))
                  .otherwise(F.col("b")).alias("u"),
                  F.when(F.col("_da") <= F.col("_db"), F.col("b"))
                  .otherwise(F.col("a")).alias("v")))
    adj = (oe.groupBy("u").agg(F.collect_list("v").alias("vs"))
           .filter(F.size("vs") > 1)
           .select("u", F.array_sort("vs").alias("vs")))
    n = F.size("vs")
    wedges = (adj.select("u", "vs", F.posexplode("vs").alias("i", "x"))
              .select("u", "x",
                      F.explode(F.slice("vs", F.col("i") + 2, n)).alias("y"))
              .filter(F.col("x") < F.col("y")))
    # wedge (u, x, y) closes iff the unordered edge {x, y} exists; x < y
    # matches e0's canonical orientation, so one equi-join decides
    tri = wedges.join(e0, (wedges.x == e0.a) & (wedges.y == e0.b))
    per_node = (tri.select(F.explode(F.array("u", "x", "y")).alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")))
    return (deg.join(per_node, "node", "left")
            .select("node", "degree",
                    F.coalesce(F.col("triangles"), F.lit(0))
                    .alias("triangles")))


def triangle_counts_sql(edges_sql: str) -> str:
    """DuckDB mirror of :func:`triangle_counts` — same orientation,
    wedge generation as a self-join (the semantics, not the plan)."""
    return f"""
WITH _tc_e0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), _tc_deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM _tc_e0 UNION ALL SELECT b AS node FROM _tc_e0
  ) GROUP BY node
), _tc_oe AS (
  SELECT CASE WHEN da.degree <= db.degree THEN e.a ELSE e.b END AS u,
         CASE WHEN da.degree <= db.degree THEN e.b ELSE e.a END AS v
  FROM _tc_e0 e
  JOIN _tc_deg da ON da.node = e.a
  JOIN _tc_deg db ON db.node = e.b
), _tc_tri AS (
  SELECT w1.u AS u, w1.v AS x, w2.v AS y
  FROM _tc_oe w1
  JOIN _tc_oe w2 ON w1.u = w2.u AND w1.v < w2.v
  JOIN _tc_e0 e ON e.a = w1.v AND e.b = w2.v
), _tc_per AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT u AS node FROM _tc_tri
    UNION ALL SELECT x FROM _tc_tri
    UNION ALL SELECT y FROM _tc_tri
  ) GROUP BY node
)
SELECT d.node AS node, d.degree AS degree,
       coalesce(p.triangles, 0) AS triangles
FROM _tc_deg d LEFT JOIN _tc_per p ON p.node = d.node"""


def weighted_sssp(edges: DataFrame, seeds: DataFrame, n_iter: int = 8,
                  src: str = "src", dst: str = "dst", w: str = "w",
                  directed: bool = True) -> DataFrame:
    """Hop-bounded single-source (multi-seed) shortest paths by
    distributed Bellman-Ford relaxation: ``(node, dist)`` = minimum
    path cost from any seed using at most ``n_iter`` edges.  With
    ``n_iter`` >= the graph's hop diameter this IS the shortest-path
    distance; the bound is the contract (and what the unrolled oracle
    replays).  Weights should be integers for cross-engine exactness.

    Per round: one hash join (frontier -> out-edges) + one
    groupBy-min — the same shuffle shape as pagerank, with the same
    per-round ``localCheckpoint`` lineage truncation (without it
    Catalyst analysis time doubles per iteration).  Unreached nodes
    are absent from the output (no infinity sentinel)."""
    e = edges.select(F.col(src).alias("_es"), F.col(dst).alias("_ed"),
                     F.col(w).alias("_ew"))
    if not directed:
        e = e.unionAll(e.select(F.col("_ed").alias("_es"),
                                F.col("_es").alias("_ed"), "_ew"))
    dist = seeds.select(F.col(seeds.columns[0]).alias("node"),
                        F.lit(0).cast("bigint").alias("dist")) \
        .groupBy("node").agg(F.min("dist").alias("dist"))
    for _ in range(n_iter):
        dist = dist.localCheckpoint(eager=True)
        relax = (dist.join(e, dist.node == F.col("_es"))
                 .select(F.col("_ed").alias("node"),
                         (F.col("dist") + F.col("_ew")).alias("dist")))
        dist = (dist.unionAll(relax)
                .groupBy("node").agg(F.min("dist").alias("dist")))
    return dist


def weighted_sssp_sql(edges_sql: str, seeds_sql: str, n_iter: int = 8,
                      directed: bool = True) -> str:
    """DuckDB mirror of :func:`weighted_sssp`: the relaxation unrolled
    as MATERIALIZED CTEs (default CTE inlining re-evaluates every prior
    round per reference — exponential; the pagerank lesson)."""
    und = ("" if directed else
           " UNION ALL SELECT dst AS src, src AS dst, w FROM _ss_e0")
    parts = [f"WITH _ss_e0 AS MATERIALIZED (SELECT src, dst, w "
             f"FROM ({edges_sql})), "
             f"_ss_e AS MATERIALIZED (SELECT * FROM _ss_e0{und}), "
             f"_ss_d0 AS MATERIALIZED (SELECT node, "
             f"cast(0 AS BIGINT) AS dist "
             f"FROM ({seeds_sql}) GROUP BY node)"]
    for k in range(n_iter):
        parts.append(
            f", _ss_d{k + 1} AS MATERIALIZED ("
            f"SELECT node, min(dist) AS dist FROM ("
            f"SELECT node, dist FROM _ss_d{k} "
            f"UNION ALL "
            f"SELECT e.dst AS node, d.dist + e.w AS dist "
            f"FROM _ss_d{k} d JOIN _ss_e e ON e.src = d.node"
            f") GROUP BY node)")
    parts.append(f" SELECT node, dist FROM _ss_d{n_iter}")
    return "".join(parts)


def k_core(edges: DataFrame, k: int, n_iter: int = 16,
           src: str = "src", dst: str = "dst") -> DataFrame:
    """The k-core (Seidman 1983): iteratively peel nodes of degree < k
    until the remaining undirected simple subgraph has min degree >= k;
    returns ``(node, degree)`` of the surviving core (empty if none).

    ``n_iter`` bounds the peel rounds (the oracle replays exactly that
    many; converged rounds are no-ops so early convergence is safe —
    the loop stops when the edge count fixes).  Per round: one
    map-side-combined degree count + one join against the (shrinking)
    survivor set, with per-round lineage truncation."""
    a, b = F.col(src), F.col(dst)
    und = (edges.filter(a != b)
           .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
           .distinct())
    e = und.select(F.col("a").alias("s"), F.col("b").alias("d")) \
        .unionAll(und.select(F.col("b").alias("s"), F.col("a").alias("d")))
    prev = e.count()
    for _ in range(n_iter):
        e = e.localCheckpoint(eager=True)
        keep = (e.groupBy("s").agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") >= k).select(F.col("s").alias("node")))
        e = (e.join(keep, e.s == keep.node).select("s", "d")
             .join(keep, F.col("d") == keep.node).select("s", "d"))
        cur = e.count()
        if cur == prev:
            break
        prev = cur
    return (e.groupBy("s").agg(F.count(F.lit(1)).alias("degree"))
            .select(F.col("s").alias("node"), "degree"))


def k_core_sql(edges_sql: str, k: int, n_iter: int = 16) -> str:
    """DuckDB mirror of :func:`k_core` — peel rounds unrolled as
    MATERIALIZED CTEs (converged rounds are no-ops)."""
    parts = [f"""WITH _kc_u AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), _kc_e0 AS MATERIALIZED (
  SELECT a AS s, b AS d FROM _kc_u
  UNION ALL SELECT b AS s, a AS d FROM _kc_u
)"""]
    for r in range(n_iter):
        parts.append(f""", _kc_k{r} AS MATERIALIZED (
  SELECT s AS node FROM _kc_e{r} GROUP BY s HAVING count(*) >= {k}
), _kc_e{r + 1} AS MATERIALIZED (
  SELECT e.s, e.d FROM _kc_e{r} e
  JOIN _kc_k{r} x ON x.node = e.s
  JOIN _kc_k{r} y ON y.node = e.d
)""")
    parts.append(f"""
SELECT s AS node, count(*) AS degree FROM _kc_e{n_iter} GROUP BY s""")
    return "".join(parts)


def clustering_coefficients(edges: DataFrame, src: str = "src",
                            dst: str = "dst") -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz 1998):
    ``cc = 2*triangles / (degree*(degree-1))``, 0.0 for degree < 2 —
    one fixed bigint-to-double division over :func:`triangle_counts`
    output (no extra shuffle beyond the triangle plan), rounded 9 dp.
    Returns ``(node, degree, triangles, cc)``."""
    t = triangle_counts(edges, src=src, dst=dst)
    d = F.col("degree")
    cc = F.when(d >= 2, F.round(
        (F.col("triangles") * F.lit(2)).cast("double")
        / (d * (d - 1)).cast("double"), 9)).otherwise(F.lit(0.0))
    return t.select("node", "degree", "triangles", cc.alias("cc"))


def clustering_coefficients_sql(edges_sql: str) -> str:
    """DuckDB mirror of :func:`clustering_coefficients`."""
    return f"""
SELECT node, degree, triangles,
       CASE WHEN degree >= 2
            THEN round((triangles * 2)::DOUBLE
                       / (degree * (degree - 1))::DOUBLE, 9)
            ELSE 0.0 END AS cc
FROM ({triangle_counts_sql(edges_sql)})"""
