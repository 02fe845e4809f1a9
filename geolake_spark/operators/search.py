"""Full-text relevance search over the corpus: BM25 (Robertson et al.,
TREC-3; the Lucene-default ranking function) as a pure DataFrame plan.

Reference analogue: none in geolake (no text ops) — beyond-reference
webtext mandate.  The design point is the 100 TB shape: corpus-level
statistics (N, avgdl, per-term document frequency) come from ONE
aggregate scan collapsing to a single row, which then rides a broadcast
cross join into the scoring scan — two scans of the corpus total, zero
Python, no driver-side collect, and the scoring expression is one
whole-stage-codegen HOF per term (query terms are few by construction).
The DuckDB mirror (:func:`bm25_scores_sql`) replays the identical
arithmetic for the value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(text: Column) -> Column:
    t = F.trim(F.lower(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))


def bm25_scores(docs: DataFrame, terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """``(id_col, score)`` for every doc matching >= 1 query term,
    BM25-scored against the corpus (idf uses the Lucene +1 smoothing, so
    it is never negative): ``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)``,
    ``tf_part = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))``.

    ``terms`` are matched as lowercased whole tokens (the corpus side is
    lowercased; pass lowercase terms).  Scores are rounded to 6 dp for
    oracle parity.  Duplicate query terms are collapsed."""
    terms = sorted(set(terms))
    assert terms, "bm25_scores needs at least one query term"
    tokd = docs.select(F.col(id_col), _toks(F.col(text_col)).alias("_bm_t"))
    stats = tokd.agg(
        F.count("*").alias("_bm_n"),
        F.avg(F.size(F.col("_bm_t"))).alias("_bm_avgdl"),
        *[F.sum(F.array_contains("_bm_t", t).cast("long")).alias(f"_bm_df{i}")
          for i, t in enumerate(terms)])
    j = tokd.crossJoin(F.broadcast(stats))
    dl = F.size("_bm_t").cast("double")
    denom_dl = F.lit(1.0) - F.lit(b) + F.lit(b) * dl \
        / F.greatest(F.col("_bm_avgdl"), F.lit(1e-12))
    def _tf(term: str) -> Column:
        # NB: one-arg lambda — a second (defaulted) parameter would make
        # pyspark call it in (element, index) form
        return F.size(F.filter("_bm_t", lambda x: x == F.lit(term))) \
            .cast("double")

    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = _tf(t)
        idf = F.log((F.col("_bm_n") - F.col(f"_bm_df{i}") + 0.5)
                    / (F.col(f"_bm_df{i}") + 0.5) + 1.0)
        score = score + idf * tf * (k1 + 1.0) / (tf + F.lit(k1) * denom_dl)
    any_hit = None
    for t in terms:
        hit = F.array_contains("_bm_t", t)
        any_hit = hit if any_hit is None else (any_hit | hit)
    return (j.filter(any_hit)
            .select(F.col(id_col), F.round(score, 6).alias("score")))


def bm25_scores_sql(docs_sql: str, terms: list[str],
                    text_expr: str = "text", id_col: str = "doc_id",
                    k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB mirror of :func:`bm25_scores` over a docs subquery."""
    terms = sorted(set(terms))
    t = f"trim(lower({text_expr}))"
    toks = (f"(case when length({t}) = 0 then []::varchar[] "
            f"else regexp_split_to_array({t}, '\\s+') end)")

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    dfs = ", ".join(
        f"sum(case when list_contains(_bm_t, {q(tm)}) then 1 else 0 end) "
        f"AS _bm_df{i}" for i, tm in enumerate(terms))
    denom_dl = (f"(1.0 - {b!r} + {b!r} * len(_bm_t) "
                f"/ greatest(_bm_avgdl, 1e-12))")
    parts = []
    for i, tm in enumerate(terms):
        tf = f"cast(len(list_filter(_bm_t, x -> x = {q(tm)})) as double)"
        idf = f"ln((_bm_n - _bm_df{i} + 0.5) / (_bm_df{i} + 0.5) + 1.0)"
        parts.append(f"{idf} * {tf} * ({k1!r} + 1.0) "
                     f"/ ({tf} + {k1!r} * {denom_dl})")
    any_hit = " OR ".join(f"list_contains(_bm_t, {q(tm)})" for tm in terms)
    return f"""
WITH _bm_d AS (
    SELECT {id_col}, {toks} AS _bm_t FROM ({docs_sql})
), _bm_s AS (
    SELECT count(*) AS _bm_n, avg(len(_bm_t)) AS _bm_avgdl, {dfs}
    FROM _bm_d
)
SELECT {id_col}, round({" + ".join(parts)}, 6) AS score
FROM _bm_d, _bm_s
WHERE {any_hit}
"""
