"""DSIR importance resampling (operators/curation.py): selection really
prefers target-distributed docs; determinism; top-k plan shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import curation

D = 512


@pytest.fixture(scope="module")
def corpora(spark):
    # raw corpus: 200 docs about cooking, 200 about engines; target: a
    # small engine-only corpus.  Distinct vocabularies.
    cook = "pan salt oven butter flour sugar whisk bake simmer stir"
    eng = "piston torque valve crank bore stroke cam gear shaft rod"

    def doc(words, i):
        ws = words.split()
        return " ".join(ws[(i + j) % len(ws)] for j in range(12))

    raw = pd.DataFrame({
        "doc_id": range(400),
        "text": [doc(cook, i) for i in range(200)]
                + [doc(eng, i) for i in range(200)]})
    target = pd.DataFrame({
        "doc_id": range(40),
        "text": [doc(eng, i * 3) for i in range(40)]})
    return spark.createDataFrame(raw), spark.createDataFrame(target)


def test_selection_prefers_target_distribution(corpora):
    raw, target = corpora
    lr = curation.dsir_fit(target, raw, n_features=D)
    picked = curation.dsir_select(raw, lr, k=100).collect()
    engine_ids = sum(1 for r in picked if r.doc_id >= 200)
    # engine docs are half the raw corpus but should dominate the pick
    assert engine_ids >= 90
    # scores separate the two populations
    by_pop = {r.doc_id: r.dsir_score for r in picked}
    assert all(s > 0 for i, s in by_pop.items() if i >= 200)


def test_fit_is_deterministic_and_dense(corpora):
    raw, target = corpora
    a = curation.dsir_fit(target, raw, n_features=D)
    b = curation.dsir_fit(target, raw, n_features=D)
    assert a == b and len(a) == D
    # unseen buckets carry the smoothing ratio, not 0
    import math
    assert any(x != 0.0 for x in a)


def test_gumbel_adds_diversity_but_keeps_determinism(corpora):
    raw, target = corpora
    lr = curation.dsir_fit(target, raw, n_features=D)
    s1 = sorted(r.doc_id for r in curation.dsir_select(raw, lr, 50).collect())
    s2 = sorted(r.doc_id for r in curation.dsir_select(raw, lr, 50).collect())
    assert s1 == s2  # same hash -> same sample
    # the sample is not simply the top-50 by raw score (noise matters)
    top_by_score = [r.doc_id for r in raw.select(
        "doc_id", curation.dsir_score_col(F.col("text"), lr).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id").limit(50).collect()]
    assert s1 != sorted(top_by_score)


def test_topk_plan_no_global_sort(corpora):
    raw, target = corpora
    lr = curation.dsir_fit(target, raw, n_features=D)
    plan = curation.dsir_select(raw, lr, 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
