"""Similarity & dedup kernels: MinHash, SimHash, shingles, embedding cosine.

All heavy math is NumPy over Arrow batches (pandas UDFs); band-bucketing and
pair-joins happen as DataFrame joins so they distribute (SURVEY.md training-
data-pipeline mandate: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# Word shingles (n-grams) — JVM expressions so the DuckDB oracle can mirror
# ---------------------------------------------------------------------------


def words_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles_col(text: Column, n: int = 3) -> Column:
    """array<string> of word n-grams via sequence+transform (JVM-side)."""
    w = words_col(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(w, i + F.lit(j)) for j in range(n)]))


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """Stable 64-bit FNV-1a per shingle."""
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(14695981039346656037)
        for b in s.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(shingles: list[str], num_perm: int = 64,
                      seed: int = 1) -> np.ndarray:
    """(num_perm,) uint64 MinHash signature of a shingle set."""
    if not shingles:
        return np.full(num_perm, np.iinfo(np.int64).max, dtype=np.uint64)
    a, b = _perm_params(num_perm, seed)
    hv = np.unique(_hash_shingles(shingles)) % _MERSENNE
    # (num_perm, n) universal hashing, min over shingles
    vals = (np.outer(a, hv) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def make_minhash_udf(num_perm: int = 64, n: int = 3, seed: int = 1):
    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(text: pd.Series) -> pd.Series:
        a, b = _perm_params(num_perm, seed)
        out = []
        for s in text:
            toks = s.lower().split()
            sh = [" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 0))]
            if not sh:
                out.append(np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64))
                continue
            hv = np.unique(_hash_shingles(sh)) % _MERSENNE
            vals = (np.outer(a, hv) + b[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)
    return minhash_udf


def lsh_bands(df, sig_col: str = "minhash", num_perm: int = 64, bands: int = 16):
    """Explode a signature into (band_id, band_hash) rows for bucket joins.
    rows_per_band = num_perm // bands; candidate pairs share any bucket."""
    r = num_perm // bands
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band_id"),
                 F.xxhash64(F.concat_ws(",", *[
                     F.element_at(F.col(sig_col), b * r + i + 1).cast("string")
                     for i in range(r)])).alias("band_hash"))
        for b in range(bands)])
    return (df.withColumn("band", F.explode(band_structs))
              .select("*", "band.band_id", "band.band_hash").drop("band"))


# ---------------------------------------------------------------------------
# SimHash (64-bit) — bitwise majority over token hashes
# ---------------------------------------------------------------------------


@pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    out = np.empty(len(text), dtype=np.int64)
    for row, s in enumerate(text):
        toks = s.lower().split()
        if not toks:
            out[row] = 0
            continue
        hv = _hash_shingles(toks)
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        score = 2 * bits.sum(axis=0).astype(np.int64) - len(toks)
        sig = np.uint64(0)
        for i in np.nonzero(score > 0)[0]:
            sig |= np.uint64(1) << np.uint64(i)
        out[row] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def hamming64_col(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Embedding cosine — JVM higher-order functions (no Python in the hot path)
# ---------------------------------------------------------------------------


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))
