"""Corpus-shaping operators beyond per-document filters: global
paragraph-level dedup (C4-style), skew-aware per-key caps, and
deterministic hash sampling.

Reference analogue: none in geolake (no text ops) — these are the
beyond-reference training-data-pipeline mandate.  Each operator has a
DuckDB value oracle in ``__spark_entry__.py`` and unit tests in
``tests/test_curation_extras.py``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (C4-style)
# ---------------------------------------------------------------------------


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    sep: str = "\n\n") -> DataFrame:
    """Remove every paragraph that is an exact repeat of one seen earlier
    in the corpus, keeping the FIRST occurrence (smallest
    ``(id, position)``) — the C4/mC4 recipe (Raffel et al. 2020 §2.2
    applies it at line level; the unit here is the ``sep``-delimited
    paragraph).  Docs whose every paragraph was a repeat disappear.

    Returns ``df`` with ``text_col`` rebuilt from the kept paragraphs
    (original order, re-joined with ``sep``); all other columns survive
    via an id join.  Empty paragraphs (runs of ``sep``) are dropped.

    Shuffle shape at scale: the winner aggregate groups on the md5
    fingerprint and carries ONLY (fp, id, pos) — Catalyst prunes the
    paragraph text; the text shuffles once (the fp join) and once more
    for the per-doc reassembly.  Winner identity is decided on the md5
    fingerprint, which the DuckDB oracle computes identically.
    """
    pid, ppos, ppar = "_pd_id", "_pd_pos", "_pd_para"
    paras = (df.select(F.col(id_col).alias(pid),
                       F.posexplode(F.split(F.col(text_col),
                                            re.escape(sep)))
                       .alias(ppos, ppar))
             .filter(F.col(ppar) != "")
             .withColumn("_pd_fp", F.md5(F.col(ppar))))
    # winner = min (id, pos) per fingerprint, as a WINDOW over one
    # fp-keyed exchange.  The previous groupBy + self-join shape computed
    # ``paras`` (corpus split + explode + md5) twice — once per plan
    # consumer — and paid a second fp shuffle for the join (r6 measured:
    # the window form removes a full corpus pass; identical kept set).
    wfp = Window.partitionBy("_pd_fp")
    kept = (paras.withColumn(
        "_pd_w", F.min(F.struct(F.col(pid), F.col(ppos))).over(wfp))
        .filter((F.col(pid) == F.col("_pd_w." + pid))
                & (F.col(ppos) == F.col("_pd_w." + ppos))))
    rebuilt = (kept.groupBy(pid)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col(ppos), F.col(ppar)))),
                       lambda s: s[ppar]),
                   sep).alias(text_col)))
    return (df.drop(text_col)
            .join(rebuilt.withColumnRenamed(pid, id_col), id_col, "inner"))


def paragraph_dedup_sql(table: str, text_expr: str = "text",
                        id_col: str = "doc_id", sep: str = "\n\n",
                        extra_cols: str = "") -> str:
    """DuckDB mirror of :func:`paragraph_dedup` over ``table`` (a view or
    a parenthesised subquery).  ``extra_cols`` — comma-led passthrough
    column list pulled back from ``table`` by the final id join."""
    sep_sql = " || ".join(f"chr({ord(c)})" for c in sep)
    return f"""
WITH _pd_parts AS (
    SELECT {id_col}, string_split({text_expr}, {sep_sql}) AS parts
    FROM {table}
), _pd_paras AS (
    SELECT {id_col}, u.pos, u.para, md5(u.para) AS fp
    FROM _pd_parts,
         LATERAL (SELECT unnest(list_transform(range(1, len(parts) + 1),
                         i -> {{'pos': i, 'para': parts[i]}}),
                         recursive := true)) u
    WHERE u.para <> ''
), _pd_winners AS (
    SELECT fp, min({{'i': {id_col}, 'p': pos}}) AS w
    FROM _pd_paras GROUP BY fp
), _pd_kept AS (
    SELECT p.{id_col}, p.pos, p.para
    FROM _pd_paras p JOIN _pd_winners w ON p.fp = w.fp
    WHERE p.{id_col} = w.w.i AND p.pos = w.w.p
)
SELECT k.{id_col} AS {id_col},
       string_agg(k.para, {sep_sql} ORDER BY k.pos) AS text
       {extra_cols}
FROM _pd_kept k JOIN {table} t ON k.{id_col} = t.{id_col}
GROUP BY ALL
"""


# ---------------------------------------------------------------------------
# Skew-aware per-key cap (top-N rows per domain/source/host)
# ---------------------------------------------------------------------------


def capped_by_key(df: DataFrame, key_col: str, order_col: str, cap: int,
                  salt_buckets: int | None = 32,
                  rank_col: str = "rank_in_key") -> DataFrame:
    """At most ``cap`` rows per ``key_col``, the first ``cap`` in
    ``order_col`` order (must be unique per key for determinism), with
    their 1-based rank in ``rank_col`` — the per-domain cap of a web
    corpus (no single host dominating the training mix).

    A single ``row_number`` window funnels a hot key's every row through
    ONE task — the exact skew a crawl's mega-domains produce: a 10^10-row
    domain means one executor sorts/spills terabytes while the rest of
    the cluster idles.  Default is therefore two phases: a salted local
    window (key × hash-salt of the order column, ≤ ``salt_buckets``
    parallel tasks per key) keeps each salt's first ``cap``, a superset
    of the global first ``cap``; the global window then ranks
    ≤ ``salt_buckets × cap`` survivors per key.  Row-identical to the
    naive single window (property-tested + value oracle).

    The salting is scale insurance, not a single-box win: per-task
    volume drops salt_buckets-fold, but on one machine the extra
    exchange costs ~2-3× wall on an op that is seconds either way
    (measured 128M rows / 95%-hot key, BENCH/PLANS.md §13).  Pass
    ``salt_buckets=None`` for the naive single window when the key
    distribution is known benign."""
    final = Window.partitionBy(key_col).orderBy(order_col)
    pre = df
    if salt_buckets is not None:
        salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets))
        local = Window.partitionBy(F.col(key_col), salt).orderBy(order_col)
        pre = (df.withColumn("_ck_r", F.row_number().over(local))
               .filter(F.col("_ck_r") <= cap).drop("_ck_r"))
    return (pre.withColumn(rank_col, F.row_number().over(final))
            .filter(F.col(rank_col) <= cap))


# ---------------------------------------------------------------------------
# Deterministic hash sampling (optionally stratified)
# ---------------------------------------------------------------------------

# Knuth's multiplicative constant; modulus 2^31 keeps id*K inside int64
# ((2^31-1) * 2654435761 < 2^63).  Pure integer arithmetic => the DuckDB
# oracle reproduces the EXACT row set, unlike df.sample()'s RNG.
SAMPLE_KNUTH = 2654435761
SAMPLE_MOD = 2 ** 31


def sample_hash_col(id_col: Column) -> Column:
    """Scrambled id in ``[0, 2^31)`` — uniform enough for rate sampling
    even on sequential ids.  Non-negative ids only (Spark pmod and
    DuckDB ``%`` diverge on negatives; asserted by the caller's data
    contract)."""
    return F.pmod(F.pmod(id_col.cast("bigint"), F.lit(SAMPLE_MOD))
                  * F.lit(SAMPLE_KNUTH), F.lit(SAMPLE_MOD))


def sample_hash_sql(id_expr: str) -> str:
    return (f"((({id_expr}::BIGINT % {SAMPLE_MOD}) * {SAMPLE_KNUTH}) "
            f"% {SAMPLE_MOD})")


def sample_hash_col_str(id_col: Column) -> Column:
    """String-key variant (urls): first 15 hex digits of md5 (60 bits,
    inside int64) scrambled into ``[0, 2^31)``.  No DuckDB mirror is
    needed (no hex->int builtin there); the numeric path carries the
    value oracle, this path is pytest-covered."""
    h60 = F.conv(F.substring(F.md5(id_col), 1, 15), 16, 10).cast("bigint")
    return F.pmod(F.pmod(h60, F.lit(SAMPLE_MOD)) * F.lit(SAMPLE_KNUTH),
                  F.lit(SAMPLE_MOD))


def sample_threshold(rate: float) -> int:
    """Exact integer threshold for ``rate`` — computed ONCE in Python so
    the Spark filter and the SQL oracle compare against the identical
    literal (no float rounding divergence)."""
    return int(rate * SAMPLE_MOD)


def deterministic_sample(df: DataFrame, rate: float | None = None,
                         id_col: str = "doc_id",
                         strata_col: str | None = None,
                         rates: dict[str, float] | None = None) -> DataFrame:
    """Keep each row iff ``hash(id) < rate·2^31`` — a reproducible,
    cluster-size-independent sample (re-running, resuming, or rescaling
    the job selects the SAME rows; ``df.sample`` does not).  With
    ``rates`` + ``strata_col``, per-stratum rates (e.g. down-sample
    dominant languages); strata not in ``rates`` fall back to ``rate``
    (dropped entirely when ``rate`` is None).  Pure narrow filter — no
    shuffle, fully pushed into the scan stage.  String id columns
    (urls) hash via md5 (:func:`sample_hash_col_str`), numeric ids via
    pure integer arithmetic (the oracle-mirrored path)."""
    from pyspark.sql.types import StringType
    if isinstance(df.schema[id_col].dataType, StringType):
        h = sample_hash_col_str(F.col(id_col))
    else:
        h = sample_hash_col(F.col(id_col))
    base = F.lit(sample_threshold(rate)) if rate is not None else F.lit(0)
    if rates:
        if strata_col is None:
            raise ValueError("rates= requires strata_col=")
        thr: Column | None = None
        for key, r in rates.items():
            cond = F.col(strata_col) == key
            lit = F.lit(sample_threshold(r))
            thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
        threshold = thr.otherwise(base)
    else:
        if rate is None:
            raise ValueError("need rate= or rates=")
        threshold = base
    return df.filter(h < threshold)


def deterministic_sample_sql(id_expr: str, rate: float | None = None,
                             strata_col: str | None = None,
                             rates: dict[str, float] | None = None) -> str:
    """WHERE-clause predicate mirroring :func:`deterministic_sample`."""
    h = sample_hash_sql(id_expr)
    base = str(sample_threshold(rate)) if rate is not None else "0"
    if rates:
        arms = " ".join(
            f"WHEN {strata_col} = '{k}' THEN {sample_threshold(r)}"
            for k, r in rates.items())
        return f"({h} < (CASE {arms} ELSE {base} END))"
    return f"({h} < {base})"


# ---------------------------------------------------------------------------
# Sequence packing (tokenizer-feed planning)
# ---------------------------------------------------------------------------


def pack_sequences(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   n_shards: int = 32) -> DataFrame:
    """GPT-style packing plan: token streams are concatenated in
    deterministic ``(shard, id)`` order and cut every ``seq_len`` tokens
    (documents split across sequence boundaries, no padding) — the span
    layout a tokenizer-feed job needs BEFORE touching any text.  Returns
    one row per non-empty doc: ``shard``, ``tok_begin`` (offset of the
    doc's first token within its shard's stream), ``seq_first`` /
    ``seq_last`` (the sequences the doc lands in; a doc with
    seq_last > seq_first straddles a cut).  Global sequence identity is
    ``(shard, seq)``; shard streams are independent by construction.

    Scale shape: the only wide op is one cumulative-sum window per
    shard over (id, count) rows — text is never read, so a shard's
    whole plan is a few bytes per doc; ``n_shards`` sets the
    parallelism (each shard's cumsum is one task) and is deterministic
    (``id % n_shards``), so re-running or resuming yields byte-identical
    packing — unlike order-of-arrival packers.  Numeric ids only (the
    modulo shard is what the DuckDB oracle mirrors)."""
    work = (df.select(F.col(id_col),
                      F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
                      F.col(tokens_col))
            .filter(F.col(tokens_col) > 0))
    w = Window.partitionBy("shard").orderBy(id_col)
    tok_end = F.sum(tokens_col).over(w)
    return (work.withColumn("_pk_end", tok_end)
            .select(id_col, "shard", tokens_col,
                    (F.col("_pk_end") - F.col(tokens_col)).alias("tok_begin"),
                    F.expr(f"(_pk_end - {tokens_col}) div {seq_len}")
                    .alias("seq_first"),
                    F.expr(f"(_pk_end - 1) div {seq_len}")
                    .alias("seq_last")))


def pack_sequences_sql(table: str, seq_len: int, id_col: str = "doc_id",
                       tokens_expr: str = "n_tokens",
                       n_shards: int = 32) -> str:
    """DuckDB mirror of :func:`pack_sequences` over ``table``."""
    return f"""
WITH _pk_t AS (
    SELECT {id_col}, {id_col} % {n_shards} AS shard,
           {tokens_expr} AS n_tokens
    FROM {table} WHERE {tokens_expr} > 0
), _pk_c AS (
    SELECT {id_col}, shard, n_tokens,
           sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col})
           AS tok_end
    FROM _pk_t
)
SELECT {id_col}, shard, n_tokens, tok_end - n_tokens AS tok_begin,
       (tok_end - n_tokens) // {seq_len} AS seq_first,
       (tok_end - 1) // {seq_len} AS seq_last
FROM _pk_c
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap, GPT-3 style)
# ---------------------------------------------------------------------------
# Training corpora must not contain the eval benchmarks: GPT-3 (Brown et
# al. 2020, Appendix C) flags a training document when it shares a word
# 13-gram with any benchmark example; later pipelines (PaLM, Llama) use
# the same shape.  The scale asymmetry is the whole design: benchmarks
# are tiny (~1e6-1e7 distinct n-grams) while the corpus is ~100 TB, so
# the benchmark n-gram set is BROADCAST and the corpus is scanned once
# with a map-side hash probe — the only shuffle is the per-doc hit count
# over the (rare) matches.  N-grams travel as xxhash64 of the gram text
# (8 bytes each, both sides); a hash collision could over-count by one
# (~2^-64 per gram pair — the DuckDB oracle joins on the gram STRING and
# agrees at test scale).


def _gram_hash_set(text: Column, n: int) -> Column:
    """Distinct xxhash64 values of the lowercased word ``n``-grams of
    ``text`` (empty array when the doc has fewer than ``n`` tokens)."""
    t = F.trim(F.lower(text))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))
    cnt = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))))
    return F.when(cnt <= 0, F.array().cast("array<bigint>")) \
        .otherwise(F.array_distinct(grams))


def decontaminate_report(docs: DataFrame, bench: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         bench_text_col: str | None = None,
                         n: int = 13, min_overlap: int = 1) -> DataFrame:
    """Per-document overlap report: ``(id_col, n_hits, contaminated)``
    for EVERY doc in ``docs``, where ``n_hits`` counts the distinct word
    ``n``-grams of the doc that appear anywhere in ``bench`` and
    ``contaminated`` is ``n_hits >= min_overlap``.

    Plan shape at 100 TB: bench grams -> explode -> distinct ->
    **broadcast**; docs scanned once, grams exploded and probed map-side
    against the broadcast set (no shuffle of the corpus); only matching
    (doc, gram) rows — a tiny fraction — shuffle for the per-doc count.
    """
    bcol = bench_text_col or text_col
    bench_grams = (bench
                   .select(F.explode(_gram_hash_set(F.col(bcol), n))
                           .alias("_dc_gram"))
                   .distinct())
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(_gram_hash_set(F.col(text_col), n)).alias("_dc_gram"))
    hits = (doc_grams.join(F.broadcast(bench_grams), "_dc_gram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hits")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") >= min_overlap))


def decontaminate(docs: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None,
                  n: int = 13, min_overlap: int = 1) -> DataFrame:
    """``docs`` with contaminated documents removed (same schema);
    left-semi on the clean side of :func:`decontaminate_report`."""
    rep = decontaminate_report(docs, bench, text_col, id_col,
                               bench_text_col, n, min_overlap)
    clean = rep.filter(~F.col("contaminated")).select(id_col)
    return docs.join(clean, id_col, "left_semi")


def _gram_set_sql(text_expr: str, n: int) -> str:
    """DuckDB mirror of :func:`_gram_hash_set` minus the hashing — the
    oracle joins on the gram STRING (collision-free by construction)."""
    t = f"trim(lower({text_expr}))"
    toks = (f"(case when length({t}) = 0 then []::varchar[] "
            f"else regexp_split_to_array({t}, '\\s+') end)")
    cnt = f"(len({toks}) - {n - 1})"
    grams = (f"list_transform(range(1, greatest({cnt}, 1) + 1), "
             f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))")
    return (f"(case when {cnt} <= 0 then []::varchar[] "
            f"else list_distinct({grams}) end)")


def decontaminate_report_sql(docs_sql: str, bench_sql: str,
                             text_expr: str = "text",
                             id_col: str = "doc_id",
                             bench_text_expr: str | None = None,
                             n: int = 13, min_overlap: int = 1) -> str:
    """DuckDB mirror of :func:`decontaminate_report` over two subqueries."""
    bexpr = bench_text_expr or text_expr
    return f"""
WITH _dc_bg AS (
    SELECT DISTINCT unnest({_gram_set_sql(bexpr, n)}) AS gram
    FROM ({bench_sql})
), _dc_dg AS (
    SELECT {id_col}, unnest({_gram_set_sql(text_expr, n)}) AS gram
    FROM ({docs_sql})
), _dc_h AS (
    SELECT {id_col}, count(*) AS n_hits
    FROM _dc_dg JOIN _dc_bg USING (gram) GROUP BY 1
)
SELECT d.{id_col}, coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) >= {min_overlap} AS contaminated
FROM (SELECT {id_col} FROM ({docs_sql})) d
LEFT JOIN _dc_h h USING ({id_col})
"""


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023, the public method): pick raw-corpus documents whose hashed
# bag-of-words distribution looks like a small TARGET corpus.
#
#   weight(x) = sum over tokens of  ln p_target(b(tok)) - ln p_raw(b(tok))
#
# with +1-smoothed bucket unigram models, then Gumbel-top-k resampling
# so the selection is a sample, not just the argmax head.
#
# Scale shape: fitting is two token-count aggregations (map-side
# partial, <= n_features rows out each — the model volume is D, not
# corpus size); scoring is the plan-literal codegen fold shared with
# the hashed-BOW classifier; selection is a TakeOrdered top-k (no full
# sort materialization).  Everything is deterministic: bucket hash =
# md5-prefix trick, Gumbel noise from the Knuth sample hash, ln via
# libm on identical doubles — so the DuckDB oracle (dsir_sql) refits
# and reselects the EXACT row set.
# ---------------------------------------------------------------------------


def _token_buckets(df: DataFrame, text_col: str, n_features: int):
    from ..functions import text as _tx
    toks = _tx.bow_tokens_col(F.col(text_col))
    return (df.select(F.explode(toks).alias("tok"))
            .select(_tx.token_bucket_col(F.col("tok"), n_features)
                    .alias("b")))


def dsir_fit(target: DataFrame, raw: DataFrame, text_col: str = "text",
             n_features: int = 4096) -> list[float]:
    """Dense log-likelihood-ratio vector (length ``n_features``).

    Two distributed count aggregations; the collect is D-sized model
    state, not data.  ``math.log`` (libm) keeps the literals
    bit-identical to DuckDB's ``ln`` on the same smoothed ratios."""
    import math
    D = n_features
    assert 4 <= D <= 65536, "plan-literal weights want 4 <= D <= 2^16"

    def counts(df):
        rows = (_token_buckets(df, text_col, D)
                .groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect())
        dense = [0] * D
        for r in rows:
            dense[int(r["b"])] = int(r["c"])
        return dense

    tc, rc = counts(target), counts(raw)
    T, R = sum(tc), sum(rc)
    return [math.log((tc[b] + 1.0) / (T + D))
            - math.log((rc[b] + 1.0) / (R + D)) for b in range(D)]


def dsir_score_col(text: Column, log_ratio: list[float]) -> Column:
    """Unnormalized importance weight ln(p_tgt(x)/p_raw(x)) — a codegen
    fold over the token array, weights as one plan literal."""
    from ..functions import text as _tx
    D = len(log_ratio)
    w = F.lit([float(x) for x in log_ratio])
    toks = _tx.bow_tokens_col(text)
    return F.aggregate(
        toks, F.lit(0.0),
        lambda acc, tok: acc + F.element_at(
            w, (_tx.token_bucket_col(tok, D) + 1).cast("int")))


def dsir_select(df: DataFrame, log_ratio: list[float], k: int,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Gumbel-top-k resample: key = score + Gumbel(0,1) from the
    deterministic Knuth hash of ``id_col``; returns ``(id, dsir_score,
    gumbel_key)`` for the k winners (global top-k, not a sort)."""
    score = dsir_score_col(F.col(text_col), log_ratio)
    u = ((sample_hash_col(F.col(id_col)).cast("double") + F.lit(0.5))
         / F.lit(float(SAMPLE_MOD)))
    key = score + (-F.log(-F.log(u)))
    return (df.select(F.col(id_col), score.alias("_s"), key.alias("_k"))
            .orderBy(F.col("_k").desc(), F.col(id_col)).limit(k)
            .select(id_col, F.round("_s", 6).alias("dsir_score"),
                    F.round("_k", 6).alias("gumbel_key")))


def dsir_sql(docs_sql: str, target_pred: str, k: int,
             text_col: str = "text", id_col: str = "doc_id",
             n_features: int = 4096) -> str:
    """DuckDB twin of fit + score + select in one query: refit the two
    smoothed models, densify over range(D), rebuild the weight list,
    refold per doc, re-draw the Gumbel keys, take the same top-k."""
    from ..functions import text as _tx
    D = n_features
    toks = _tx.bow_tokens_sql(text_col)
    bucket = _tx.token_bucket_sql("tok", D)
    wt = f"w[({bucket} + 1)::INT]"
    u = f"(({sample_hash_sql(id_col)}) + 0.5) / {float(SAMPLE_MOD)!r}"
    return f"""
WITH _ds_tt AS (
    SELECT unnest({toks}) AS tok FROM ({docs_sql}) WHERE {target_pred}
), _ds_rt AS (
    SELECT unnest({toks}) AS tok FROM ({docs_sql})
), _ds_tc AS (
    SELECT {bucket} AS b, count(*) AS c FROM _ds_tt GROUP BY 1
), _ds_rc AS (
    SELECT {bucket} AS b, count(*) AS c FROM _ds_rt GROUP BY 1
), _ds_tot AS (
    SELECT (SELECT count(*) FROM _ds_tt) AS t_n,
           (SELECT count(*) FROM _ds_rt) AS r_n
), _ds_dense AS (
    SELECT g.range AS b, coalesce(t.c, 0) AS tc, coalesce(r.c, 0) AS rc
    FROM range({D}) g
    LEFT JOIN _ds_tc t ON t.b = g.range
    LEFT JOIN _ds_rc r ON r.b = g.range
), _ds_w AS (
    SELECT list(ln((tc + 1.0) / (t_n + {D})) -
                ln((rc + 1.0) / (r_n + {D})) ORDER BY b) AS w
    FROM _ds_dense, _ds_tot
), _ds_scored AS (
    SELECT {id_col},
           coalesce(list_sum(list_transform({toks}, tok -> {wt})), 0.0)
             AS s
    FROM ({docs_sql}), _ds_w
)
SELECT {id_col}, round(s, 6) AS dsir_score,
       round(s + (-ln(-ln({u}))), 6) AS gumbel_key
FROM _ds_scored
ORDER BY s + (-ln(-ln({u}))) DESC, {id_col} LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Hashed bigram-LM perplexity (the CCNet quality signal, Wenzek et al.
# 2020, with hashed counts instead of KenLM): score each document by
# exp(-mean log p(tok | prev)) under add-one-smoothed bucket counts
#
#   p(tok | prev) = (c2[h2(prev, tok)] + 1) / (c1[h1(prev)] + D2)
#
# where c1 counts CONTEXT occurrences (tokens that have a successor) so
# the hashed conditional normalizes.  Fitting is two map-side count
# aggregations collecting only D1 + D2 model integers; scoring is a
# codegen fold with both count tables riding the plan as literals (the
# hashed-BOW/DSIR pattern).  Fluent, corpus-typical text scores LOW
# perplexity; token salad scores high — the standard gate orders docs
# the same way CCNet's LM buckets do.  Deterministic end to end, so the
# DuckDB oracle refits and rescores bit-identically.
# ---------------------------------------------------------------------------

_LM_SEP = "\x1f"  # cannot appear in whitespace-split tokens


def lm_fit(df: DataFrame, text_col: str = "text", d1: int = 4096,
           d2: int = 16384) -> tuple[list[int], list[int]]:
    """(context_counts[d1], bigram_counts[d2]) from the corpus."""
    from ..functions import text as _tx
    assert d1 <= 65536 and d2 <= 65536, "plan-literal tables want <= 2^16"
    toks = _tx.bow_tokens_col(F.col(text_col))
    n = F.size(toks)
    contexts = F.when(n >= 2, F.slice(toks, 1, n - 1)) \
        .otherwise(F.array().cast("array<string>"))
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
        lambda i: F.concat(F.element_at(toks, (i - 1).cast("int")),
                           F.lit(_LM_SEP),
                           F.element_at(toks, i.cast("int"))))) \
        .otherwise(F.array().cast("array<string>"))

    def counts(col, d):
        rows = (df.select(F.explode(col).alias("g"))
                .select(_tx.token_bucket_col(F.col("g"), d).alias("b"))
                .groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect())
        dense = [0] * d
        for r in rows:
            dense[int(r["b"])] = int(r["c"])
        return dense

    return counts(contexts, d1), counts(bigrams, d2)


def lm_perplexity_col(text: Column, c1: list[int],
                      c2: list[int]) -> Column:
    """Per-doc perplexity (round 6); docs with < 2 tokens score exp(0)
    = 1.0 (no bigram evidence — documented contract)."""
    from ..functions import text as _tx
    d1, d2 = len(c1), len(c2)
    w1 = F.lit([float(x) for x in c1])
    w2 = F.lit([float(x) for x in c2])
    toks = _tx.bow_tokens_col(text)
    n = F.size(toks)

    def logp(i):
        prev = F.element_at(toks, (i - 1).cast("int"))
        tok = F.element_at(toks, i.cast("int"))
        big = F.concat(prev, F.lit(_LM_SEP), tok)
        num = F.element_at(
            w2, (_tx.token_bucket_col(big, d2) + 1).cast("int")) + F.lit(1.0)
        den = F.element_at(
            w1, (_tx.token_bucket_col(prev, d1) + 1).cast("int")) \
            + F.lit(float(d2))
        return F.log(num / den)

    lp = F.when(n >= 2, F.aggregate(
        F.sequence(F.lit(2), F.greatest(n, F.lit(2))), F.lit(0.0),
        lambda acc, i: acc + logp(i))).otherwise(F.lit(0.0))
    pairs = F.greatest(n - 1, F.lit(1)).cast("double")
    return F.round(F.exp(-lp / pairs), 6)


def lm_sql(docs_sql: str, text_col: str = "text", id_col: str = "doc_id",
           d1: int = 4096, d2: int = 16384) -> str:
    """DuckDB twin: refit both hashed count tables and rescore."""
    from ..functions import text as _tx
    toks = _tx.bow_tokens_sql(text_col)
    b1 = _tx.token_bucket_sql("g", d1)
    b2 = _tx.token_bucket_sql("g", d2)
    big_list = (f"list_transform(range(len({toks}) - 1), "
                f"i -> {toks}[i+1] || chr(31) || {toks}[i+2])")
    ctx_list = f"list_slice({toks}, 1, len({toks}) - 1)"
    prev_b = _tx.token_bucket_sql(f"{toks}[i+1]", d1)
    pair_b = _tx.token_bucket_sql(f"{toks}[i+1] || chr(31) || {toks}[i+2]",
                                  d2)
    lp = (f"coalesce(list_sum(list_transform(range(len({toks}) - 1), "
          f"i -> ln((w2[({pair_b})+1] + 1.0) / "
          f"(w1[({prev_b})+1] + {float(d2)!r})))), 0.0)")
    return f"""
WITH _lm_ctx AS (
    SELECT unnest({ctx_list}) AS g FROM ({docs_sql})
), _lm_big AS (
    SELECT unnest({big_list}) AS g FROM ({docs_sql})
), _lm_c1 AS (
    SELECT {b1} AS b, count(*) AS c FROM _lm_ctx GROUP BY 1
), _lm_c2 AS (
    SELECT {b2} AS b, count(*) AS c FROM _lm_big GROUP BY 1
), _lm_w AS (
    SELECT (SELECT list(coalesce(c, 0)::DOUBLE ORDER BY g.range)
            FROM range({d1}) g LEFT JOIN _lm_c1 ON _lm_c1.b = g.range)
             AS w1,
           (SELECT list(coalesce(c, 0)::DOUBLE ORDER BY g.range)
            FROM range({d2}) g LEFT JOIN _lm_c2 ON _lm_c2.b = g.range)
             AS w2
)
SELECT {id_col},
       round(exp(-({lp}) / greatest(len({toks}) - 1, 1)), 6)
         AS perplexity
FROM ({docs_sql}), _lm_w
"""


# ---------------------------------------------------------------------------
# Document chunking — the RAG/pretraining windowing step: split each doc
# into fixed-size token windows with overlap (stride < width), one row
# per chunk.  All JVM HOFs (tokenize once, slice per window) — the
# explode is the only row multiplier and it is bounded by
# ceil(tokens/stride) per doc.  Chunk ids are (doc_id, chunk_idx), so
# downstream dedup/packing can trace every window to its source.
# ---------------------------------------------------------------------------


def chunk_documents(df: DataFrame, width: int = 128, stride: int = 96,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """``(id, chunk_idx, chunk_text, n_tokens)`` — whitespace-token
    windows of ``width`` every ``stride`` tokens.  The LAST window keeps
    its tail (may be shorter); a doc shorter than ``width`` yields one
    chunk; an empty doc yields none.  ``stride < width`` gives the
    overlap RAG retrieval wants."""
    from ..functions import text as _tx
    assert 1 <= stride <= width
    toks = _tx.bow_tokens_col(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - width, 0) / stride)
    extra = F.greatest(n - F.lit(width), F.lit(0))
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil(extra.cast("double") / F.lit(float(stride)))
        .cast("int"))
    out = (df.select(F.col(id_col), toks.alias("_toks"),
                     n_chunks.alias("_nc"))
           .filter(F.col("_nc") > 0)
           .select(id_col, "_toks",
                   F.explode(F.sequence(F.lit(0), F.col("_nc") - 1))
                   .alias("chunk_idx")))
    piece = F.slice(F.col("_toks"),
                    (F.col("chunk_idx") * stride + 1).cast("int"), width)
    return out.select(
        id_col, F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_tokens"))


def chunk_documents_sql(table: str, width: int = 128, stride: int = 96,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin (same tokenizer, window arithmetic, inclusive-slice
    semantics)."""
    from ..functions import text as _tx
    toks = _tx.bow_tokens_sql(text_col)
    n = f"len({toks})"
    n_chunks = (f"(case when {n} = 0 then 0 else "
                f"1 + cast(ceil(greatest({n} - {width}, 0) / "
                f"cast({stride} as double)) as int) end)")
    piece = (f"toks[(chunk_idx * {stride} + 1):"
             f"(chunk_idx * {stride} + {width})]")
    return f"""
WITH _ck_base AS (
    SELECT {id_col}, {toks} AS toks,
           unnest(range({n_chunks})) AS chunk_idx
    FROM {table}
)
SELECT {id_col}, cast(chunk_idx as bigint) AS chunk_idx,
       array_to_string({piece}, ' ') AS chunk_text,
       cast(len({piece}) as bigint) AS n_tokens
FROM _ck_base
"""


# ---------------------------------------------------------------------------
# Exact substring dedup — span REMOVAL, not document removal
# (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better": any k-token span appearing more than once in the corpus is
# cut from every document; boilerplate/licenses/templated footers
# vanish while the unique prose stays.)
# ---------------------------------------------------------------------------
# Spark shape: per doc, every k-token window becomes (doc_id, pos, fp)
# with fp = md5 of the token slice (md5 because Spark and DuckDB agree
# bit-for-bit, so the ORACLE replays the fingerprints; the suffix-array
# construction of the paper is a single-machine algorithm — the
# window-fingerprint formulation is the distributed equivalent and
# finds the identical >= k-token duplicated regions).  One groupBy(fp)
# finds globally duplicated windows (map-side partial agg first), an
# id-only join marks the covered positions, and the rebuild is a pure
# HOF expression: keep token i unless some duplicated window start p
# covers it (p <= i < p + k).  Token-level reconstruction re-joins with
# single spaces — the documented contract (same as the tokenizer
# elsewhere: downstream consumers are token-based).
#
# Scale notes: the window explode is ~n_tokens rows/doc but never
# shuffles wider than (fp) partial-aggregated counts; the dup-position
# join ships only duplicated fps; skew (one boilerplate line in 10^9
# docs) lands on distinct (fp, doc) rows, not one reducer row, because
# the count tier pre-aggregates and the join fans back out map-side.


def _span_toks(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))


def span_windows(df: DataFrame, k: int = 8, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, pos, fp)`` — one row per k-token window (pos 1-based)."""
    toks = _span_toks(F.col(text_col))
    cnt = F.size(toks) - F.lit(k - 1)
    wins = F.when(cnt <= 0, F.array().cast("array<struct<pos:int,fp:string>>")) \
        .otherwise(F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.md5(F.concat_ws("\x1f", F.slice(toks, i, k)))
                .alias("fp"))))
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(wins).alias("w"))
            .select("doc_id", F.col("w.pos").alias("pos"),
                    F.col("w.fp").alias("fp")))


def remove_duplicate_spans(df: DataFrame, k: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           min_count: int = 2) -> DataFrame:
    """``(doc_id, clean_text, n_tokens, n_removed)`` with every token
    covered by a corpus-duplicated k-token window removed."""
    win = span_windows(df, k, text_col, id_col)
    dup_fp = (win.groupBy("fp")
              .agg(F.count(F.lit(1)).alias("c"))
              .filter(F.col("c") >= min_count)
              .select("fp"))
    dups = (win.join(dup_fp, "fp")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("pos")).alias("dups")))
    toks = _span_toks(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    j = base.join(dups, "doc_id", "left").withColumn(
        "dups", F.coalesce(F.col("dups"), F.array().cast("array<int>")))
    kept = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1))),
        lambda i: (i <= F.size("toks"))
        & (F.size(F.filter(F.col("dups"),
                           lambda p: (p <= i) & (i < p + k))) == 0))
    return (j.withColumn("kept", kept)
            .select(
                "doc_id",
                F.concat_ws(" ", F.transform(
                    F.col("kept"),
                    lambda i: F.element_at(F.col("toks"), i.cast("int"))))
                .alias("clean_text"),
                F.size("toks").cast("bigint").alias("n_tokens"),
                (F.size("toks") - F.size("kept")).cast("bigint")
                .alias("n_removed")))


def remove_duplicate_spans_sql(docs_sql: str, k: int = 8,
                               text_expr: str = "text",
                               id_expr: str = "doc_id",
                               min_count: int = 2) -> str:
    """DuckDB twin: identical tokenization, md5 window fingerprints,
    HAVING-count dup set, and the same coverage filter."""
    toks = (f"(case when length(trim({text_expr})) = 0 then []::varchar[] "
            f"else regexp_split_to_array(trim({text_expr}), '\\s+') end)")
    return f"""
WITH _sd_toks AS (
  SELECT {id_expr} AS doc_id, {toks} AS toks FROM ({docs_sql})
), _sd_win AS (
  SELECT doc_id, cast(u.i as int) AS pos,
         md5(array_to_string(toks[u.i:u.i+{k - 1}], chr(31))) AS fp
  FROM _sd_toks,
       unnest(range(1, greatest(len(toks) - {k - 1}, 0) + 1)) AS u(i)
), _sd_dupfp AS (
  SELECT fp FROM _sd_win GROUP BY fp HAVING count(*) >= {min_count}
), _sd_dups AS (
  SELECT doc_id, list(pos ORDER BY pos) AS dups
  FROM _sd_win JOIN _sd_dupfp USING (fp) GROUP BY doc_id
), _sd_join AS (
  SELECT t.doc_id, t.toks, coalesce(d.dups, []::int[]) AS dups
  FROM _sd_toks t LEFT JOIN _sd_dups d USING (doc_id)
), _sd_kept AS (
  SELECT doc_id, toks,
         list_filter(range(1, len(toks) + 1),
           i -> len(list_filter(dups,
                    p -> p <= i AND i < p + {k})) = 0) AS kept
  FROM _sd_join
)
SELECT doc_id,
       coalesce(array_to_string(list_transform(kept, i -> toks[i]), ' '),
                '') AS clean_text,
       cast(len(toks) as bigint) AS n_tokens,
       cast(len(toks) - len(kept) as bigint) AS n_removed
FROM _sd_kept"""


# ---------------------------------------------------------------------------
# Temperature-based corpus mixing (multilingual/multi-source rebalance)
# ---------------------------------------------------------------------------
# The standard pretraining-mix recipe (e.g. multilingual corpora):
# source s with c_s documents is sampled with probability proportional
# to c_s^alpha (alpha = 1/T < 1 flattens the head so dominant sources
# stop drowning the tail).  Materializing ``target_rows`` rows means a
# per-source keep rate r_s = min(1, target * (c_s^alpha / sum_t c_t^alpha)
# / c_s), applied through deterministic_sample — so the mix is
# reproducible, resumable, and cluster-size independent like every other
# sampling tier here.
#
# Scale + oracle shape: the per-source counts are ONE partial-agg'd
# groupBy (rows = #sources, driver-tiny); rates are computed driver-side
# with a SEQUENTIAL sum in sorted source order so the DuckDB twin's
# list_sum(list(... ORDER BY k)) replays the float fold bit-for-bit.
# The SQL twin exists for alpha = 0.5 (sqrt is IEEE exact-rounded and
# identical across engines; arbitrary pow is libm-dependent and only
# pytest-covered).


def temperature_mix_rates(df: DataFrame, strata_col: str,
                          target_rows: int,
                          alpha: float = 0.5) -> dict[str, float]:
    """Per-stratum keep rates for the temperature mix (sorted-order
    sequential float fold — see module note on oracle parity)."""
    import math
    counts = {r[0]: r[1] for r in
              df.groupBy(strata_col).count().collect()}
    denom = 0.0
    for k in sorted(counts):
        denom += math.pow(counts[k], alpha)
    return {k: min(1.0, target_rows * (math.pow(c, alpha) / denom) / c)
            for k, c in counts.items()}


def temperature_mix(df: DataFrame, strata_col: str, target_rows: int,
                    alpha: float = 0.5,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic ~``target_rows``-row sample with source shares
    flattened to ``count^alpha``."""
    rates = temperature_mix_rates(df, strata_col, target_rows, alpha)
    return deterministic_sample(df, id_col=id_col,
                                strata_col=strata_col, rates=rates)


def temperature_mix_sql(docs_sql: str, strata_col: str, target_rows: int,
                        id_expr: str = "doc_id") -> str:
    """DuckDB twin for alpha = 0.5: recomputes counts, the sorted
    sequential denom fold, the rates, and the same integer-threshold
    hash filter."""
    h = sample_hash_sql(f"d.{id_expr}")
    return f"""
WITH _tm_c AS (
  SELECT {strata_col} AS k, count(*) AS c FROM ({docs_sql}) GROUP BY 1
), _tm_d AS (
  SELECT list_sum(list(sqrt(cast(c as double)) ORDER BY k)) AS denom
  FROM _tm_c
), _tm_r AS (
  SELECT k, least(1.0, {target_rows} * (sqrt(cast(c as double)) / denom)
                       / c) AS rate
  FROM _tm_c, _tm_d
)
SELECT d.* FROM ({docs_sql}) d JOIN _tm_r r ON d.{strata_col} = r.k
WHERE {h} < cast(floor(r.rate * {SAMPLE_MOD}) as bigint)"""


# ---------------------------------------------------------------------------
# Language mixture — per-document paragraph-level language profile
# ---------------------------------------------------------------------------
# Whole-doc language ID mislabels the web's many MIXED pages (boiler-
# plate in one language, content in another; forum quotes; parallel
# text).  The standard curation signal is paragraph-grained: identify
# each paragraph, then profile the document — dominant language, its
# share, and how many languages appear.  Pure composition of existing
# codegen pieces (split + lang_id_col + two partial-agg'd groupBys);
# integer counts + one rounded ratio, replayed exactly by the twin.


def language_mixture(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     sep: str = "\n\n") -> DataFrame:
    """``(doc_id, n_paras, n_langs, main_lang, main_frac)`` — dominant
    paragraph language per doc (ties break to the lexicographically
    LAST language via the struct max — deterministic)."""
    from geolake_spark.functions import text as tx
    paras = (df.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.split(F.col(text_col), re.escape(sep)))
                       .alias("_para"))
             .filter(F.col("_para") != ""))
    per_lang = (paras.withColumn("_lang", tx.lang_id_col(F.col("_para")))
                .groupBy("doc_id", "_lang")
                .agg(F.count(F.lit(1)).alias("_n")))
    return (per_lang.groupBy("doc_id")
            .agg(F.sum("_n").alias("n_paras"),
                 F.count(F.lit(1)).alias("n_langs"),
                 F.max(F.struct(F.col("_n"), F.col("_lang"))).alias("_m"))
            .select("doc_id", "n_paras", "n_langs",
                    F.col("_m._lang").alias("main_lang"),
                    F.round(F.col("_m._n") / F.col("n_paras"), 6)
                    .alias("main_frac")))


def language_mixture_sql(docs_sql: str, text_expr: str = "text",
                         id_expr: str = "doc_id",
                         sep: str = "\n\n") -> str:
    from geolake_spark.functions import text as tx
    sep_sql = " || ".join(f"chr({ord(c)})" for c in sep)
    return f"""
WITH _lm_p AS (
  SELECT {id_expr} AS doc_id, u.para AS para
  FROM ({docs_sql}), unnest(string_split({text_expr}, {sep_sql})) AS u(para)
  WHERE u.para <> ''
), _lm_l AS (
  SELECT doc_id, {tx.lang_id_sql('para')} AS lang, count(*) AS n
  FROM _lm_p GROUP BY 1, 2
)
SELECT doc_id, sum(n) AS n_paras, count(*) AS n_langs,
       max(struct_pack(n := n, lang := lang)).lang AS main_lang,
       round(max(struct_pack(n := n, lang := lang)).n
             / cast(sum(n) as double), 6) AS main_frac
FROM _lm_l GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning", Appendix — the C4 heuristics).  Reference repo has no
# text ops (geolake is geospatial); this is the LLM-pipeline surface the
# engine adds on top.  All predicates are single codegen expressions over a
# split-on-newline array — zero shuffle, zero Python: at 100 TB this is a
# map-only stage that rides whatever partitioning the scan produced.
# ---------------------------------------------------------------------------

C4_TERMINALS = (".", "!", "?", '"')


def _c4_line_pred(ln, min_words: int):
    """Keep a line iff (C4 rules): >= min_words space-separated words, ends
    in a terminal punctuation mark, and does not mention javascript."""
    t = F.trim(ln)
    wc = F.size(F.filter(F.split(t, " "), lambda w: w != ""))
    last = F.substring(t, -1, 1)
    return ((wc >= min_words)
            & last.isin(*C4_TERMINALS)
            & ~F.contains(F.lower(t), F.lit("javascript")))


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_words: int = 5,
                   min_lines: int = 3) -> DataFrame:
    """C4-style page cleaning: keep lines with >= ``min_words`` words that
    end in a terminal punctuation mark (``. ! ? "``) and do not contain the
    word "javascript" (case-insensitive); then drop whole pages that retain
    fewer than ``min_lines`` lines, contain "lorem ipsum" (placeholder
    text), or contain a curly brace (leaked code/CSS).

    Returns (id_col, text rebuilt from kept lines joined by newline,
    n_lines = kept-line count).  Contract notes: a "word" is a run of
    non-space characters after trim (split on a single ASCII space — the
    same word contract as the shingle/token oracles); the javascript /
    lorem-ipsum matches are ASCII lowercase (locale-safe).
    """
    text = F.col(text_col)
    kept = F.filter(F.split(text, "\n"),
                    lambda ln: _c4_line_pred(ln, min_words))
    out = df.select(F.col(id_col), kept.alias("_kept"), text.alias("_t"))
    return (out
            .filter((F.size("_kept") >= min_lines)
                    & ~F.contains(F.lower(F.col("_t")), F.lit("lorem ipsum"))
                    & ~F.contains(F.col("_t"), F.lit("{")))
            .select(F.col(id_col),
                    F.coalesce(F.array_join("_kept", "\n"), F.lit(""))
                    .alias(text_col),
                    F.size("_kept").alias("n_lines")))


def c4_line_filter_sql(docs_sql: str, text_expr: str = "text",
                       id_expr: str = "doc_id", min_words: int = 5,
                       min_lines: int = 3) -> str:
    """DuckDB mirror of :func:`c4_line_filter`.  PITFALL (established):
    DuckDB ``array_to_string([])`` is NULL where Spark ``array_join`` is
    '' — coalesce.  DuckDB ``right(t, 1)`` == Spark ``substring(t, -1, 1)``
    (both return '' on empty input, so the IN-list check is safe)."""
    terminals = ", ".join(f"'{t}'" if t != '"' else "'\"'"
                          for t in C4_TERMINALS)
    pred = (f"len(list_filter(str_split(trim(ln), ' '), w -> w <> ''))"
            f" >= {min_words} AND right(trim(ln), 1) IN ({terminals})"
            f" AND NOT contains(lower(trim(ln)), 'javascript')")
    return f"""
WITH _c4 AS (
  SELECT {id_expr} AS doc_id, {text_expr} AS _t,
         list_filter(str_split({text_expr}, chr(10)), ln -> {pred}) AS _kept
  FROM ({docs_sql})
)
SELECT doc_id, coalesce(array_to_string(_kept, chr(10)), '') AS text,
       len(_kept) AS n_lines
FROM _c4
WHERE len(_kept) >= {min_lines}
  AND NOT contains(lower(_t), 'lorem ipsum')
  AND NOT contains(_t, '{{')"""


# ---------------------------------------------------------------------------
# Per-host boilerplate stripping — the template-removal pass between
# main_content extraction (per-page heuristics) and global paragraph
# dedup (corpus-wide first-occurrence): a paragraph that repeats across
# >= min_frac of a HOST's pages is site chrome (nav, footer, cookie
# banner) and is removed from every page of that host.  This is the
# pass that de-fangs the templated-page mega-cluster problem UPSTREAM
# of MinHash (VERDICT r4 "what's wrong" #2): the shared boilerplate
# that made those pages near-identical is gone before shingling.
#
# Scale shape: paragraph fingerprints aggregate on (host, fp) with
# map-side partials; the boilerplate set is hosts x chrome-paragraphs
# sized (small) so the removal anti-join broadcasts; reassembly is the
# same one groupBy(doc) as paragraph_dedup.  Decision threshold is
# float-free on the comparison side both engines share the exact
# expression (cast to double, single multiply).
# ---------------------------------------------------------------------------


def strip_boilerplate(df: DataFrame, min_frac: float = 0.5,
                      min_pages: int = 2, min_repeats: int = 2,
                      url_col: str = "url",
                      text_col: str = "text", id_col: str = "doc_id",
                      sep: str = "\n\n") -> DataFrame:
    """Remove paragraphs appearing on >= ``min_frac`` of their host's
    pages (hosts with >= ``min_pages`` pages).  ``min_repeats`` floors
    the absolute page count: a paragraph seen on ONE page is never
    chrome, whatever the ratio says (on a 2-page host, min_frac=0.5
    would otherwise flag every singleton).  Text is rebuilt in original
    paragraph order; docs whose every paragraph was chrome disappear
    (the paragraph_dedup contract)."""
    host = F.regexp_extract(F.col(url_col), r"https?://([^/]+)/", 1)
    pid, ppos, ppar = "_bp_id", "_bp_pos", "_bp_para"
    paras = (df.select(F.col(id_col).alias(pid), host.alias("_bp_host"),
                       F.posexplode(F.split(F.col(text_col),
                                            re.escape(sep)))
                       .alias(ppos, ppar))
             .filter(F.col(ppar) != "")
             .withColumn("_bp_fp", F.md5(F.col(ppar))))
    host_pages = (df.select(host.alias("_bp_host"),
                            F.col(id_col).alias(pid)).distinct()
                  .groupBy("_bp_host")
                  .agg(F.count(F.lit(1)).alias("_bp_n_pages")))
    hot = (paras.select("_bp_host", "_bp_fp", pid).distinct()
           .groupBy("_bp_host", "_bp_fp")
           .agg(F.count(F.lit(1)).alias("_bp_n_docs"))
           .join(host_pages, "_bp_host")
           .filter((F.col("_bp_n_pages") >= min_pages)
                   & (F.col("_bp_n_docs") >= min_repeats)
                   & (F.col("_bp_n_docs").cast("double")
                      >= F.lit(min_frac) * F.col("_bp_n_pages")))
           .select("_bp_host", "_bp_fp"))
    kept = paras.join(hot, ["_bp_host", "_bp_fp"], "left_anti")
    rebuilt = (kept.groupBy(pid)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col(ppos), F.col(ppar)))),
                       lambda s: s[ppar]),
                   sep).alias(text_col)))
    return (df.drop(text_col)
            .join(rebuilt.withColumnRenamed(pid, id_col), id_col, "inner"))


def strip_boilerplate_sql(table: str, min_frac: float = 0.5,
                          min_pages: int = 2, min_repeats: int = 2,
                          url_expr: str = "url",
                          text_expr: str = "text", id_col: str = "doc_id",
                          sep: str = "\n\n",
                          extra_cols: str = "") -> str:
    """DuckDB mirror of :func:`strip_boilerplate`."""
    sep_sql = " || ".join(f"chr({ord(c)})" for c in sep)
    return f"""
WITH _bp_parts AS (
    SELECT {id_col},
           regexp_extract({url_expr}, 'https?://([^/]+)/', 1) AS host,
           string_split({text_expr}, {sep_sql}) AS parts
    FROM {table}
), _bp_paras AS (
    SELECT {id_col}, host, u.pos, u.para, md5(u.para) AS fp
    FROM _bp_parts,
      LATERAL (SELECT unnest(list_transform(range(1, len(parts) + 1),
                 i -> {{'pos': i - 1, 'para': parts[i]}}),
                 recursive := true)) u
    WHERE u.para <> ''
), _bp_hp AS (
    SELECT host, count(DISTINCT {id_col}) AS n_pages
    FROM _bp_parts GROUP BY host
), _bp_hot AS (
    SELECT p.host, p.fp
    FROM (SELECT host, fp, count(DISTINCT {id_col}) AS n_docs
          FROM _bp_paras GROUP BY host, fp) p
    JOIN _bp_hp h ON p.host = h.host
    WHERE h.n_pages >= {min_pages}
      AND p.n_docs >= {min_repeats}
      AND cast(p.n_docs AS DOUBLE) >= {min_frac!r} * h.n_pages
), _bp_kept AS (
    SELECT k.{id_col}, k.pos, k.para
    FROM _bp_paras k
    ANTI JOIN _bp_hot b ON k.host = b.host AND k.fp = b.fp
), _bp_built AS (
    SELECT {id_col},
           array_to_string(list_transform(
               list(struct_pack(pos := pos, para := para) ORDER BY pos),
               s -> s.para), {sep_sql}) AS text
    FROM _bp_kept GROUP BY {id_col}
)
SELECT t.{id_col}, b.text{extra_cols}
FROM {table} t JOIN _bp_built b ON t.{id_col} = b.{id_col}"""


def normalize_by_group(df: DataFrame, value_col: str, group_col: str,
                       out_col: str = "pct_rank") -> DataFrame:
    """Per-group percent-rank calibration of a score column — the fix
    for cross-host threshold bias (a 0.4 quality score on a boilerplate
    farm is not a 0.4 on a news site): adds ``out_col`` =
    ``percent_rank()`` within ``group_col`` ordered by (value, then the
    row's other columns are NOT consulted — ties share a rank), so a
    single global threshold then cuts each group at the same quantile.

    Exactness: percent_rank is the exact rational ``(rank-1)/(n-1)``
    on integers (0.0 for single-row groups in both engines) — value-
    hash exact with the DuckDB mirror.  One window shuffle on the
    group; hot groups are bounded by group size (cap upstream like any
    per-key window, stated)."""
    from pyspark.sql import Window
    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 9))


def normalize_by_group_sql(table_sql: str, value_col: str,
                           group_col: str,
                           out_col: str = "pct_rank") -> str:
    """DuckDB mirror of :func:`normalize_by_group`."""
    return f"""
SELECT *, round(percent_rank() OVER (PARTITION BY {group_col}
                                     ORDER BY {value_col}), 9)
         AS {out_col}
FROM ({table_sql})"""
