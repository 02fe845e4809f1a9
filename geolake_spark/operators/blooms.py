"""Bloom-filter join pre-reduction (Bloom 1970, the public structure).

The 100 TB problem: a selective join (fact table vs a filtered dim /
candidate id set) still SHUFFLES the whole big side before the join
drops 99% of it.  Spark's own runtime row-group bloom pushdown only
fires in narrow cases; this operator makes the reduction explicit and
engine-independent:

  1. :func:`bloom_build` — one map-side aggregation over the SMALL
     side's keys produces ``m/64`` bigint words (bit-OR combine);
     the collect is the filter itself (16 KB at m = 2^17), not data.
  2. :func:`bloom_contains_expr` — a pure codegen predicate testing the
     ``k`` md5-derived probe bits against the words riding the plan as
     ONE array literal.  Applied as a ``.filter`` on the big side it
     runs inside the SCAN stage — rows that cannot join are dropped
     before the exchange.
  3. :func:`bloom_filtered_join` — pre-filter + the real join.  Bloom
     false positives are removed by the join itself, so the composite
     is EXACT (asserted against the plain join in tests); false
     negatives are impossible.

Deterministic md5 probes (the repo's shared hash trick) make the filter
reproducible across engines — an oracle of the composed join is just
the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probe_hash(key: Column, i: int) -> Column:
    # seed '<i>:' — i stays single-digit (k <= 8), so seeds can't alias
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15),
        16, 10).cast("bigint"))


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 1 << 17,
                k: int = 5) -> list[int]:
    """``m_bits/64`` words from the distinct keys of ``df`` — ONE
    map-side-combinable aggregation; the result IS the filter."""
    assert m_bits % 64 == 0 and m_bits <= (1 << 24) and 1 <= k <= 8
    key = F.col(key_col)
    pos = F.explode(F.array(*[
        F.pmod(_probe_hash(key, i), F.lit(m_bits)) for i in range(k)]))
    rows = (df.select(pos.alias("p"))
            .select(F.shiftright(F.col("p"), 6).alias("w"),
                    F.col("p").bitwiseAND(F.lit(63)).alias("b"))
            .groupBy("w")
            .agg(F.bit_or(F.expr(
                "shiftleft(cast(1 as bigint), cast(b as int))"))
                .alias("mask"))
            .collect())
    words = [0] * (m_bits // 64)
    for r in rows:
        words[int(r["w"])] = int(r["mask"])
    return words


# bit n -> 2^n as int64 (n = 63 wraps to the sign bit) — a 64-element
# plan literal so the bit test needs no variable-amount shift
_BIT_MASKS = [1 << b for b in range(63)] + [-(2 ** 63)]


def bloom_contains_expr(key: Column, words: list[int],
                        k: int = 5) -> Column:
    """True iff every probe bit is set — pure codegen; ``words`` rides
    the plan as one array<bigint> literal and the bit masks as a
    64-element lookup (no variable shifts)."""
    m_bits = len(words) * 64
    w = F.lit(words)
    masks = F.lit(_BIT_MASKS)
    cond = F.lit(True)
    for i in range(k):
        p = F.pmod(_probe_hash(key, i), F.lit(m_bits))
        word = F.element_at(w, (F.shiftright(p, 6) + F.lit(1)).cast("int"))
        mask = F.element_at(
            masks, (p.bitwiseAND(F.lit(63)) + F.lit(1)).cast("int"))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_filtered_join(big: DataFrame, small: DataFrame, on: str,
                        how: str = "inner", m_bits: int = 1 << 17,
                        k: int = 5) -> DataFrame:
    """Exact join with the big side pre-reduced by the small side's
    bloom filter (scan-stage predicate; join removes false positives)."""
    words = bloom_build(small, on, m_bits, k)
    pred = bloom_contains_expr(F.col(on), words, k)
    return big.filter(pred).join(small, on, how)
