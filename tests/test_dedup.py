"""Dedup strategies against planted duplicates."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.functions import sim
from geolake_spark.operators import dedup

BASE = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the old broken mill near the river bank today")


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.RandomState(7)
    words = BASE.split()
    rows = []
    for i in range(40):
        w = list(rng.permutation(words))
        rows.append((i, " ".join(w)))
    # planted exact dup of 0 and near-dup of 1 (one word changed)
    rows.append((100, rows[0][1]))
    near = rows[1][1].split()
    near[5] = "changed"
    rows.append((101, " ".join(near)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup_finds_planted(docs):
    out = dedup.exact_dedup(docs).filter(F.col("dup_count") > 1).collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == 0 and out[0]["dup_count"] == 2


def test_minhash_estimates_jaccard():
    a = [f"sh{i}" for i in range(100)]
    b = [f"sh{i}" for i in range(50, 150)]  # true J = 50/150 = 1/3
    sa = sim.minhash_signature(a, num_perm=128)
    sb = sim.minhash_signature(b, num_perm=128)
    est = (sa == sb).mean()
    assert abs(est - 1 / 3) < 0.12


def test_minhash_lsh_finds_planted_pairs(docs):
    out = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 100) in pairs  # exact dup -> sig_sim 1.0
    assert (1, 101) in pairs  # near dup
    # permuted docs share words but not 3-shingles -> no false positives
    assert all(b in (100, 101) for _, b in pairs)


def test_simhash_planted(docs):
    out = dedup.simhash_pairs(docs, max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 100) in pairs
    h = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert h[(0, 100)] == 0


def test_ngram_jaccard_exact(docs):
    out = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 100)] == 1.0
    assert (1, 101) in pairs


def test_embedding_neardup_lsh_high_threshold(spark):
    rng = np.random.RandomState(3)
    base = rng.randn(20, 16).astype(np.float64)
    rows = [(i, list(base[i])) for i in range(20)]
    rows.append((100, list(base[0] + 1e-6)))  # near-identical to 0
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = dedup.embedding_neardup_pairs(df, threshold=0.999).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 100)}
