"""Deduplication operators for training-data pipelines.

Five strategies over a documents/pages table, all shuffle-conscious:

* exact          — groupBy(md5(text)), keep min-id representative
* minhash_lsh    — shingle -> MinHash signature (Arrow UDF) -> band bucket
                   join -> signature-similarity filter
* simhash        — 64-bit SimHash, candidate pairs via band equality on
                   16-bit chunks, Hamming-distance filter
* ngram_jaccard  — exact Jaccard on word n-gram sets via shingle equi-join
* embedding near-dup — cosine > threshold via (coarse bucket) self-join

Each returns DataFrames with deterministic representative selection so
results are oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geolake_spark.functions import sim
from geolake_spark.functions.text import fingerprint_col


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One representative row id per distinct text (min id, deterministic).
    Single hash-shuffle on the fingerprint; map-side partial min."""
    return (df.withColumn("fp", fingerprint_col(F.col(text_col)))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count")))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.5) -> DataFrame:
    """Candidate near-dup pairs (a < b) whose MinHash signature similarity
    >= threshold.  Shuffle is on band hashes (small), never all-pairs."""
    mh = sim.make_minhash_udf(num_perm=num_perm)
    sigs = df.select(F.col(id_col).alias("id"), mh(F.col(text_col)).alias("minhash"))
    banded = sim.lsh_bands(sigs, "minhash", num_perm, bands)
    a = banded.select(F.col("id").alias("id_a"), F.col("minhash").alias("mh_a"),
                      "band_id", "band_hash")
    b = banded.select(F.col("id").alias("id_b"), F.col("minhash").alias("mh_b"),
                      "band_id", "band_hash")
    cand = (a.join(b, ["band_id", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "mh_a", "mh_b").distinct())
    matches = F.size(F.filter(F.zip_with("mh_a", "mh_b", lambda x, y:
                                         (x == y).cast("int")), lambda v: v == 1))
    return (cand.withColumn("sig_sim", matches / F.lit(float(num_perm)))
            .filter(F.col("sig_sim") >= threshold)
            .select("id_a", "id_b", F.round("sig_sim", 6).alias("sig_sim")))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming; candidate
    generation by equality on one of four 16-bit chunks (pigeonhole: any pair
    within Hamming 3 of 64 bits agrees on >= one chunk)."""
    sh = df.select(F.col(id_col).alias("id"),
                   sim.simhash_udf(F.col(text_col)).alias("simhash"))
    chunks = F.array(*[
        F.struct(F.lit(i).alias("chunk_id"),
                 F.shiftrightunsigned(F.col("simhash"), i * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"))
        for i in range(4)])
    banded = (sh.withColumn("c", F.explode(chunks))
              .select("id", "simhash", "c.chunk_id", "c.chunk_val"))
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"),
                      "chunk_id", "chunk_val")
    b = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"),
                      "chunk_id", "chunk_val")
    return (a.join(b, ["chunk_id", "chunk_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct()
            .withColumn("hamming", sim.hamming64_col(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over word n-gram sets: distinct-shingle equi-join counts
    |A∩B|, set sizes via a pre-agg, |A∪B| = |A|+|B|-|A∩B|.  The join key is
    the shingle itself — common shingles are the skew risk, so extremely
    frequent shingles (df > 1000) are dropped (stop-shingles), stated."""
    shingled = (df.select(F.col(id_col).alias("id"),
                          F.explode(sim.shingles_col(F.col(text_col), n)).alias("sh"))
                .distinct())
    freq = shingled.groupBy("sh").agg(F.count("*").alias("df_count"))
    shingled = (shingled.join(freq, "sh").filter(F.col("df_count") <= 1000)
                .select("id", "sh"))
    sizes = shingled.groupBy("id").agg(F.count("*").alias("set_size"))
    a = shingled.select(F.col("id").alias("id_a"), "sh")
    b = shingled.select(F.col("id").alias("id_b"), "sh")
    inter = (a.join(b, "sh").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter_size")))
    return (inter
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("set_size").alias("size_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("set_size").alias("size_b")), "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter_size")
                / (F.col("size_a") + F.col("size_b") - F.col("inter_size")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def embedding_neardup_pairs(df: DataFrame, vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            threshold: float = 0.95) -> DataFrame:
    """Pairs with cosine >= threshold.  Candidates bucketed by sign of the
    leading components (random-hyperplane-style LSH using the raw axes);
    near-identical vectors share the bucket, turning O(n^2) into per-bucket
    joins.  High-threshold near-dup only (stated approximation: pairs
    differing in a leading-axis sign are missed — acceptable for
    threshold >= 0.9 near-dup mining; the brute-force path in ann.py is the
    exact oracle)."""
    sign_bucket = F.concat_ws("", *[
        (F.element_at(F.col(vec_col), i + 1) >= 0).cast("int").cast("string")
        for i in range(8)])
    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                  sign_bucket.alias("bucket"))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
    return (a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.round(sim.cosine_col(F.col("v_a"), F.col("v_b")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
