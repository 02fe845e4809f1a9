"""Composed training-data curation pipeline (geolake_spark.pipeline)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import dedup
from geolake_spark.pipeline import curate_pages


def body(seed: int, n: int = 80) -> str:
    """~560-char doc of seed-distinct tokens: cross-doc shingle overlap is
    ~0, so only the planted pairs below are near-dups (a shared boilerplate
    prefix would make EVERY doc a near-dup of every other — repetition
    collapses the shingle set)."""
    return " ".join(f"w{seed}x{j}" for j in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    near_a = body(20)
    near_b = near_a.replace("w20x79", "w20x99")  # one-token mutation
    rows = [
        (1, body(1), "en"),           # kept
        (2, body(2), "de"),           # kept
        (3, body(3), "fr"),           # lang-gated out
        (4, "x", "en"),               # quality-gated out (junk body)
        (10, body(10), "en"),         # exact-dup pair: 10 kept (min id)
        (11, body(10), "en"),         #   11 dropped
        (20, near_a, "de"),           # near-dup pair: 20 kept (min id)
        (21, near_b, "de"),           #   21 dropped
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_curate_funnel_and_kept_set(corpus):
    funnel = {}
    kept = curate_pages(corpus, langs=["en", "de"], min_quality=0.2,
                        near_threshold=0.5, funnel=funnel)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    dedup.release_caches()
    assert ids == [1, 2, 10, 20]
    assert funnel == {"rows_in": 8, "rows_lang": 7, "rows_quality": 6,
                      "rows_exact": 5, "rows_near": 4, "rows_kept": 4}
    row = kept.filter(F.col("doc_id") == 1).first()
    assert 0.0 <= row["quality"] <= 1.0 and row["token_count"] == 80


def test_curate_stages_optional(corpus):
    # no gates, no near-dedup: only the exact-dup member goes
    kept = curate_pages(corpus, near_threshold=None)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [1, 2, 3, 4, 10, 20, 21]
    assert {"quality", "token_count"} <= set(kept.columns)


def test_curate_near_dedup_keeps_min_id(corpus):
    kept = curate_pages(corpus, near_threshold=0.5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    dedup.release_caches()
    assert 20 in ids and 21 not in ids  # min-id representative survives


def test_curate_repetition_gate(corpus, spark):
    """The Gopher gate drops a pasted-template page (dup-trigram coverage
    ~0.97) while every organic seed-distinct doc (coverage 0) survives,
    and the funnel records the stage."""
    template = (100, ("free shipping buy now " * 40).strip(), "en")
    aug = corpus.unionByName(spark.createDataFrame(
        pd.DataFrame([template], columns=["doc_id", "text", "lang"])))
    funnel = {}
    kept = curate_pages(aug, max_dup_trigram=0.5, near_threshold=0.5,
                        funnel=funnel)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    dedup.release_caches()
    assert 100 not in ids
    assert ids == [1, 2, 3, 4, 10, 20]  # no lang/quality gates requested
    assert funnel["rows_repetition"] == funnel["rows_in"] - 1


def test_curate_wide_stages(spark):
    """The round-5 wide stages compose: PII scrub makes the (unique
    before redaction) contact paragraphs identical, paragraph dedup then
    collapses them to one survivor; the per-source cap and deterministic
    sample narrow the tail."""
    def doc(i: int, src: str) -> tuple:
        t = (body(i, 40) + "\n\ncall me at 555-123-4567 or "
             f"user{i}@example.com\n\n" + body(1000 + i, 40))
        return (i, t, "en", src)
    rows = [doc(i, f"s{i % 2}") for i in range(12)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"]))
    funnel = {}
    kept = curate_pages(df, scrub_pii=True, paragraph_sep="\n\n",
                        near_threshold=None, domain_cap=("source", 4),
                        sample_rate=1.0, funnel=funnel)
    out = {r.doc_id: r for r in kept.collect()}
    # cap: 4 per source (first-4 by doc_id) out of 6 each
    assert sorted(out) == [0, 1, 2, 3, 4, 5, 6, 7]
    # doc 0 keeps its scrubbed contact paragraph; every later doc lost it
    texts = {r.doc_id: r.text for r in kept.select("doc_id", "text").collect()}
    assert "call me at <PHONE> or <EMAIL>" in texts[0]
    assert all("<PHONE>" not in texts[i] for i in sorted(out) if i != 0)
    assert "@example.com" not in texts[0]  # actually scrubbed, not moved
    assert funnel["rows_paragraph"] == 12 and funnel["rows_domain_cap"] == 8
    assert funnel["rows_sampled"] == 8  # rate 1.0 keeps all


def test_curate_sample_rates_stratified(spark):
    rows = [(i, body(i), "en" if i % 2 else "de") for i in range(40)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    kept = curate_pages(df, near_threshold=None, sample_rate=1.0,
                        sample_rates={"en": 0.0})
    langs = {r.lang for r in kept.select("lang").collect()}
    assert langs == {"de"}  # en sampled out entirely, de kept at 1.0


def test_curate_classifier_gate(corpus, spark):
    """The model-based gate drops exactly the rows the standalone scorer
    drops, adds clf_score, and records its funnel stage."""
    from geolake_spark.functions import text as tx
    w = tx.demo_classifier_weights(256)
    scored = {r.doc_id: r.s for r in corpus.select(
        "doc_id", tx.hashed_bow_score_col(F.col("text"), w, 0.0).alias("s")
    ).collect()}
    thr = sorted(scored.values())[len(scored) // 2]   # median: a real split
    funnel = {}
    kept = curate_pages(corpus, classifier=(w, 0.0, thr),
                        near_threshold=None, funnel=funnel)
    got = {r.doc_id: r.clf_score for r in
           kept.select("doc_id", "clf_score").collect()}
    # doc 11 is the exact-dup of 10 (dropped later); everything else with
    # score >= thr must survive with the same score the scorer computed
    want = {i: s for i, s in scored.items() if s >= thr and i != 11}
    assert got == want
    assert funnel["rows_classifier"] == sum(
        1 for s in scored.values() if s >= thr)
