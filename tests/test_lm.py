"""Hashed bigram-LM perplexity (operators/curation.py lm_*): fluent
text scores lower than token salad; short-doc contract; codegen plan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import curation


@pytest.fixture(scope="module")
def model(spark):
    # corpus of patterned sentences: bigrams repeat heavily
    words = "the quick brown fox jumps over the lazy dog again".split()
    docs = [" ".join(words[i % 3:] + words[:i % 3]) for i in range(300)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(300), "text": docs}))
    c1, c2 = curation.lm_fit(df, d1=512, d2=2048)
    return df, c1, c2


def _ppl(spark, c1, c2, texts):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))
    return [r.p for r in df.select(
        curation.lm_perplexity_col(F.col("text"), c1, c2).alias("p"))
        .collect()]


def test_fluent_beats_salad(spark, model):
    _, c1, c2 = model
    fluent = "the quick brown fox jumps over the lazy dog"
    rng = np.random.RandomState(3)
    salad_words = ["zq%d" % i for i in range(9)]
    salad = " ".join(rng.permutation(salad_words))
    p_fluent, p_salad = _ppl(spark, c1, c2, [fluent, salad])
    assert p_fluent < p_salad / 10  # in-distribution text is FAR likelier


def test_short_doc_contract(spark, model):
    _, c1, c2 = model
    assert _ppl(spark, c1, c2, ["", "one"]) == [1.0, 1.0]


def test_fit_counts_normalize(model):
    # context counts == bigram counts in total (every bigram has one context)
    _, c1, c2 = model
    assert sum(c1) == sum(c2) > 0


def test_scoring_is_codegen(spark, model):
    df, c1, c2 = model
    plan = df.select(curation.lm_perplexity_col(F.col("text"), c1, c2)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_lm_gate(spark, model):
    """curate_pages lm_gate drops the out-of-distribution doc and keeps
    fluent ones; funnel records the stage."""
    from geolake_spark.pipeline import curate_pages
    from geolake_spark.operators import dedup
    df, c1, c2 = model
    salad = spark.createDataFrame(pd.DataFrame({
        "doc_id": [9001], "text": ["zq1 zq7 zq3 zq8 zq2 zq5 zq4 zq6 zq0"]}))
    corpus = df.limit(20).unionByName(salad)
    funnel = {}
    kept = curate_pages(corpus, lang_col="doc_id", lm_gate=(c1, c2, 100.0),
                        near_threshold=None, funnel=funnel)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    dedup.release_caches()
    assert 9001 not in ids and len(ids) > 0
    assert funnel["rows_lm"] == funnel["rows_in"] - 1
