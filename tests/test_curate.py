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
                      "rows_exact": 5, "rows_kept": 4}
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
