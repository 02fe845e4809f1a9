"""Training-data curation pipeline: the composed form of the LLM-data
operators (language gate -> quality gate -> exact dedup -> near-dup keep),
the end-to-end recipe a corpus builder actually runs over a Common-Crawl
style pages table before tokenization.

Composition order is the scale order: the cheap JVM-expression gates
(lang allowlist, quality heuristic) run first so the expensive tiers
(signature UDF, band shuffle, component join) only see survivors; exact
dedup collapses byte-identical bodies before MinHash so a mega-cluster of
literal mirrors never reaches the band buckets (the bucket cap then only
has to guard NEAR-identical template clusters).  Every stage is a
DataFrame -> DataFrame narrowing — one lazy plan, no driver-side data.

Reference analogue: none in geolake (no text ops) — this is the
beyond-reference training-data mandate; the per-operator pieces are
value-oracled individually and the composed pipeline end-to-end
(``curate_keep`` in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geolake_spark.functions import text as T
from geolake_spark.operators import curation, dedup


def curate_pages(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", lang_col: str = "lang",
                 langs: list[str] | None = None,
                 scrub_pii: bool = False,
                 paragraph_sep: str | None = None,
                 min_quality: float | None = None,
                 max_dup_trigram: float | None = None,
                 classifier: tuple[list[float], float, float] | None = None,
                 lm_gate: tuple[list[int], list[int], float] | None = None,
                 near_threshold: float | None = 0.5,
                 bucket_cap: int | None = dedup.DEFAULT_BAND_BUCKET_CAP,
                 domain_cap: tuple[str, int] | None = None,
                 sample_rate: float | None = None,
                 sample_rates: dict[str, float] | None = None,
                 funnel: dict | None = None) -> DataFrame:
    """Curated subset of ``df`` with ``quality`` and ``token_count`` added.

    Stages (each optional):
    1. ``langs`` — allowlist on ``lang_col`` (skipped when None).
    1b. ``scrub_pii`` — rewrite ``text_col`` with email/IPv4/phone spans
       redacted (:func:`geolake_spark.functions.text.pii_scrub_col`);
       runs BEFORE the content gates so quality/repetition judge the
       text that will actually ship.
    1c. ``paragraph_sep`` — C4-style global paragraph dedup
       (:func:`geolake_spark.operators.curation.paragraph_dedup`):
       repeated paragraphs anywhere in the corpus are dropped (first
       occurrence kept) and the doc text rebuilt; fully-boilerplate
       docs vanish here, shrinking every later tier.
    2. ``min_quality`` — drop rows whose heuristic quality score
       (:func:`geolake_spark.functions.text.quality_score_col`) is below.
    2b. ``max_dup_trigram`` — Gopher-style repetition gate: drop rows
       whose duplicate-trigram coverage
       (:func:`geolake_spark.functions.text.dup_ngram_frac_col`) exceeds
       the cap; boilerplate/template pages die here BEFORE the MinHash
       tiers, shrinking exactly the near-identical clusters the band
       bucket_cap guards against (None skips).
    2c. ``classifier`` — ``(weights, bias, min_score)``: model-based
       quality gate (CCNet/GPT-3 recipe) via the hashing-trick linear
       scorer (:func:`geolake_spark.functions.text.hashed_bow_score_col`,
       one codegen expression, weights ride the plan); rows scoring
       below ``min_score`` drop, survivors keep a ``clf_score`` column.
    2d. ``lm_gate`` — ``(c1, c2, max_ppl)``: CCNet-style perplexity gate
       under the hashed bigram LM
       (:func:`geolake_spark.operators.curation.lm_perplexity_col`);
       rows above ``max_ppl`` drop, survivors keep ``perplexity``.
    3. exact dedup — keep the min-id representative per distinct
       ``text_col`` body (one fingerprint shuffle).
    4. ``near_threshold`` — MinHash-LSH near-dup removal: candidate pairs
       above the signature-similarity threshold -> connected components ->
       drop every non-representative member (None skips).  The caller owns
       the signature-tier lifetime: call ``dedup.release_caches()`` after
       materializing the result (the dedup caching contract).
    5. ``domain_cap`` — ``(key_col, cap)``: at most ``cap`` surviving
       docs per key (first-``cap`` by ``id_col``), the per-host mix cap,
       via the skew-aware two-phase window
       (:func:`geolake_spark.operators.curation.capped_by_key`).
    6. ``sample_rate`` / ``sample_rates`` — deterministic hash sampling
       (:func:`geolake_spark.operators.curation.deterministic_sample`):
       reproducible down-sampling, optionally per-``lang_col`` rates.

    ``funnel`` (a dict) opts into per-stage row accounting — rows_in /
    rows_lang / rows_paragraph / rows_quality / rows_repetition /
    rows_exact / rows_near / rows_domain_cap / rows_sampled /
    rows_kept.  Each entry is an
    EAGER count over the stage plan: free at test scale, a full extra scan
    per stage at 100 TB, where the snapshot lineage metrics written by
    ``jobs/curate.py`` give the in/out numbers without extra passes —
    request the funnel when auditing, not in the hot path.
    """
    def _n(stage: str, frame: DataFrame) -> None:
        if funnel is not None:
            funnel[stage] = frame.count()

    _n("rows_in", df)
    out = df
    if langs:
        out = out.filter(F.col(lang_col).isin(list(langs)))
        _n("rows_lang", out)
    if scrub_pii:
        out = out.withColumn(text_col, T.pii_scrub_col(F.col(text_col)))
    if paragraph_sep is not None:
        out = curation.paragraph_dedup(out, text_col=text_col,
                                       id_col=id_col, sep=paragraph_sep)
        _n("rows_paragraph", out)
    out = out.withColumn("quality", T.quality_score_col(F.col(text_col)))
    if min_quality is not None:
        out = out.filter(F.col("quality") >= min_quality)
        _n("rows_quality", out)
    if max_dup_trigram is not None:
        out = out.filter(
            T.dup_ngram_frac_col(F.col(text_col), 3) <= max_dup_trigram)
        _n("rows_repetition", out)
    if classifier is not None:
        clf_w, clf_bias, min_score = classifier
        out = (out.withColumn("clf_score",
                              T.hashed_bow_score_col(F.col(text_col),
                                                     clf_w, clf_bias))
               .filter(F.col("clf_score") >= min_score))
        _n("rows_classifier", out)
    if lm_gate is not None:
        # CCNet perplexity gate: (c1, c2, max_ppl) from curation.lm_fit —
        # drop docs the corpus LM finds unlikely (token salad, wrong
        # language slipping past the allowlist)
        c1, c2, max_ppl = lm_gate
        out = (out.withColumn("perplexity",
                              curation.lm_perplexity_col(F.col(text_col),
                                                         c1, c2))
               .filter(F.col("perplexity") <= max_ppl))
        _n("rows_lm", out)
    # exact dedup: representatives only (left-semi against min-id per
    # fingerprint — the aggregate's keep_id set is small relative to df
    # only in the dup-heavy case, so join on the id, never collect)
    reps = (dedup.exact_dedup(out, text_col=text_col, id_col=id_col)
            .select(F.col("keep_id").alias(id_col)))
    out = out.join(reps, id_col, "left_semi")
    _n("rows_exact", out)
    if near_threshold is not None:
        pairs = dedup.minhash_lsh_pairs(out, text_col=text_col,
                                        id_col=id_col,
                                        threshold=near_threshold,
                                        bucket_cap=bucket_cap)
        out = dedup.dedup_keep(out, pairs, id_col=id_col)
        _n("rows_near", out)
    if domain_cap is not None:
        key_col, cap = domain_cap
        out = (curation.capped_by_key(out, key_col, id_col, cap)
               .drop("rank_in_key"))
        _n("rows_domain_cap", out)
    if sample_rate is not None or sample_rates is not None:
        out = curation.deterministic_sample(
            out, rate=sample_rate, id_col=id_col,
            strata_col=lang_col if sample_rates else None,
            rates=sample_rates)
        _n("rows_sampled", out)
    out = out.withColumn("token_count", T.token_count_col(F.col(text_col)))
    _n("rows_kept", out)
    return out
