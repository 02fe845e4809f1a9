"""Bloom join pre-reduction (operators/blooms.py): no false negatives,
exactness of the composed join, real selectivity, codegen-only filter."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import blooms


@pytest.fixture(scope="module")
def sides(spark):
    big = spark.range(0, 200_000).select(F.col("id").alias("k"),
                                         (F.col("id") * 2).alias("v"))
    small = spark.range(0, 500).select(
        (F.col("id") * 97).alias("k"), F.lit("dim").alias("tag"))
    return big.cache(), small.cache()


def test_no_false_negatives_and_exact_join(sides):
    big, small = sides
    plain = big.join(small, "k").select("k", "v", "tag")
    bloomed = blooms.bloom_filtered_join(big, small, "k") \
        .select("k", "v", "tag")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, bloomed.collect()))


def test_filter_is_selective(sides):
    big, small = sides
    words = blooms.bloom_build(small, "k")
    passed = big.filter(
        blooms.bloom_contains_expr(F.col("k"), words)).count()
    matches = big.join(small, "k", "left_semi").count()
    # every true match passes; false positives stay rare (k=5, m=2^17,
    # 500 keys -> fp rate well under 1%)
    assert passed >= matches
    assert passed <= matches + 0.01 * 200_000


def test_words_are_small_and_dense_enough(sides):
    _, small = sides
    words = blooms.bloom_build(small, "k", m_bits=1 << 14, k=4)
    assert len(words) == (1 << 14) // 64
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words)
    assert 0 < set_bits <= 4 * 500


def test_filter_is_codegen_and_scan_stage(sides):
    big, small = sides
    words = blooms.bloom_build(small, "k")
    plan = big.filter(blooms.bloom_contains_expr(F.col("k"), words)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pre-shuffle scan-stage predicate


def test_outer_join_untouched_semantics(sides):
    big, small = sides
    # left join on the SMALL side as left: bloom only prunes the big
    # probe side in inner/semi shapes — assert inner is the API contract
    out = blooms.bloom_filtered_join(big, small, "k", how="inner")
    assert out.count() == big.join(small, "k").count()
