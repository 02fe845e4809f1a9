"""Distributed cardinality sketches (HyperLogLog).

At 100 TB, ``count_distinct`` is a full shuffle of every distinct key;
the HLL sketch (Flajolet et al. 2007, the public algorithm) reduces each
group to ``m = 2**p`` integer registers that combine with ``max`` — the
partial aggregation is map-side, the shuffle carries at most ``m`` rows
per group, and shards/days/snapshots merge without touching raw data.

Spark already ships ``approx_count_distinct``; this operator exists for
the pipeline capabilities that built-in can't give:

* the REGISTER TABLE is first-class (:func:`hll_sketch`) — persist it
  through the snapshot layer, merge across partitions/corpora later
  (:func:`hll_merge`), finish with :func:`hll_estimate`;
* the whole pipeline is deterministic, engine-independent integer/float
  arithmetic, so the DuckDB oracle (:func:`hll_sql`) replays it
  BIT-IDENTICALLY (value-hash parity) — impossible with the built-in's
  opaque binary sketch.

Hash: the repo's md5-prefix trick (functions/text.py hashed-BOW scorer)
— ``conv(substr(md5(key),1,15),16,10)`` in Spark equals
``('0x'||substr(md5(key),1,15))::BIGINT`` in DuckDB: a 60-bit value.
Low ``p`` bits pick the register; the remaining ``W = 60 - p`` bits give
``rho`` = leading-zero count + 1 via exact ``length(bin(w))`` (no
float log2).  The register sum uses INTEGER ``2**(SCALE - rho)`` terms
(SCALE = W + 1 <= 52 for p >= 9, within exact-double range) so the sum
is order-free — float summation order can't break oracle parity.

Estimator: alpha_m * m^2 / Z with the standard small-range linear
counting fallback (V empty registers -> m * ln(m / V)).  The 32-bit
large-range correction is irrelevant at 60 hash bits and is omitted.

Reference analogue: none — geolake has no sketches; SURVEY §6 mandates
scale-path aggregates beyond the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60


def _hash60(key: Column) -> Column:
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
            .cast("bigint"))


def _alpha(m: int) -> float:
    assert m >= 128, "use p >= 7"
    return 0.7213 / (1.0 + 1.079 / m)


def _register_cols(key: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) codegen expressions for one key."""
    assert 7 <= p <= 16
    m = 1 << p
    w_bits = _HASH_BITS - p
    h = _hash60(key)
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(w_bits + 1)) \
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
    return bucket, rho


def hll_sketch(df: DataFrame, key_col: str,
               group_cols: Sequence[str] = (), p: int = 9) -> DataFrame:
    """Register table ``(*group_cols, bucket, max_rho)`` — the mergeable
    partial sketch (<= 2**p rows per group).  Pure codegen expressions
    + one map-side-combinable groupBy."""
    bucket, rho = _register_cols(F.col(key_col), p)
    return (df.withColumn("bucket", bucket).withColumn("rho", rho)
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("max_rho")))


def hll_sketch_windowed(df: DataFrame, key_col: str, ts_col: str = "ts",
                        window: str = "1 hour", watermark: str = "1 day",
                        p: int = 9) -> DataFrame:
    """Event-time-windowed register table ``(window_start, bucket,
    max_rho)`` — works on batch AND streaming frames (``max`` is an
    incrementally-maintainable aggregate, so Structured Streaming
    finalizes a window's registers at the watermark and state stays
    <= 2**p rows per open window).  Finish windows downstream with
    :func:`hll_estimate` over ``group_cols=["window_start"]``."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    bucket, rho = _register_cols(F.col(key_col), p)
    return (src.withColumn("bucket", bucket).withColumn("rho", rho)
            .groupBy(F.window(ts_col, window).alias("w"), "bucket")
            .agg(F.max("rho").alias("max_rho"))
            .select(F.col("w.start").alias("window_start"),
                    "bucket", "max_rho"))


def hll_merge(*sketches: DataFrame,
              group_cols: Sequence[str] = ()) -> DataFrame:
    """Union register tables (shards, days, corpora) into one sketch:
    register-wise max.  ``merge(sketch(A), sketch(B)) ==
    sketch(A union B)`` exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy(*group_cols, "bucket")
            .agg(F.max("max_rho").alias("max_rho")))


def hll_estimate(sketch: DataFrame, group_cols: Sequence[str] = (),
                 p: int = 9) -> DataFrame:
    """Finish a register table into ``approx_distinct`` per group
    (round 4).  The register sum is exact integer math; absent
    registers contribute 2^0 = 1 each."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    assert scale <= 52, "p too small: integer register terms must be exact"
    # column-valued shift amount: the Python shiftleft wrapper only
    # accepts a literal int, the SQL function accepts expressions
    zint = F.sum(F.expr(
        f"shiftleft(cast(1 as bigint), cast({scale} - max_rho as int))"))
    present = F.count(F.lit(1))
    agg = (sketch.groupBy(*group_cols)
           .agg(zint.alias("_zint"), present.alias("_present")))
    z = (F.col("_zint").cast("double") / F.lit(float(1 << scale))
         + (F.lit(m) - F.col("_present")).cast("double"))
    raw = F.lit(_alpha(m) * m * m) / z
    v = (F.lit(m) - F.col("_present")).cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
        .otherwise(raw)
    return (agg.withColumn("approx_distinct", F.round(est, 4))
            .drop("_zint", "_present"))


def approx_distinct_hll(df: DataFrame, key_col: str,
                        group_cols: Sequence[str] = (),
                        p: int = 9) -> DataFrame:
    """sketch + estimate in one call (the common query path)."""
    return hll_estimate(hll_sketch(df, key_col, group_cols, p),
                        group_cols, p)


def hll_sql(table: str, key_expr: str, group_cols: Sequence[str] = (),
            p: int = 9) -> str:
    """DuckDB twin of :func:`approx_distinct_hll` — identical hash,
    register, and estimator arithmetic."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    scale = w_bits + 1
    gsel = "".join(f"{g}, " for g in group_cols)
    gby = ", ".join(group_cols) if group_cols else ""
    h = (f"('0x' || substr(md5(cast({key_expr} as varchar)), 1, 15))"
         f"::BIGINT")
    z = f"(cast(zint as double) / {float(1 << scale)!r} + ({m} - present))"
    raw = f"({_alpha(m) * m * m!r} / {z})"
    v = f"cast({m} - present as double)"
    est = (f"case when {raw} <= {2.5 * m!r} and {v} > 0 "
           f"then {float(m)!r} * ln({float(m)!r} / {v}) else {raw} end")
    return f"""
WITH hashed AS (
  SELECT {gsel}{h} AS h FROM {table}
), regs AS (
  SELECT {gsel}h & {m - 1} AS bucket,
         max(CASE WHEN h >> {p} = 0 THEN {w_bits + 1}
                  ELSE {w_bits + 1} - length(bin(h >> {p})) END) AS max_rho
  FROM hashed GROUP BY {gsel}bucket
), agg AS (
  SELECT {gsel}sum(cast(1 as bigint) << ({scale} - max_rho)) AS zint,
         count(*) AS present
  FROM regs{(' GROUP BY ' + gby) if gby else ''}
)
SELECT {gsel}round({est}, 4) AS approx_distinct FROM agg
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, the public algorithm):
# frequency estimation / heavy hitters in FIXED memory.  The sketch is a
# (depth x width) counter table — rows here, not executor state — so it
# persists through the snapshot layer and merges across shards/windows
# by cell-wise SUM (cms_merge).  Estimates are biased high only
# (min over depth); with the deterministic md5-row-seed hash the DuckDB
# oracle rebuilds the identical table and estimates.
# ---------------------------------------------------------------------------


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    # row-seeded hash: md5('<row>\x1f<key>'); \x1f cannot appear in the
    # cast of a numeric key, so seeds can't collide across rows
    return F.pmod(_hash60(F.concat(F.lit(f"{row}\x1f"),
                                   key.cast("string"))), F.lit(width))


def _cms_bucket_sql(key_expr: str, row: int, width: int) -> str:
    h = (f"('0x' || substr(md5('{row}' || chr(31) || "
         f"cast({key_expr} as varchar)), 1, 15))::BIGINT")
    return f"({h} % {width})"


def cms_sketch(df: DataFrame, key_col: str, depth: int = 4,
               width: int = 1024) -> DataFrame:
    """Counter table ``(r, c, cnt)`` (<= depth*width rows).  Each input
    row increments one cell per sketch row; the groupBy partial-
    aggregates map-side so the shuffle carries cells, not events."""
    k = F.col(key_col)
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 _cms_bucket(k, r, width).alias("c"))
        for r in range(depth)])
    return (df.select(F.explode(cells).alias("cell"))
            .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum: ``merge(cms(A), cms(B)) == cms(A ++ B)`` exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """``(key, est_count)`` for each candidate key: min over the depth
    cells, absent cells count 0.  The sketch side is <= depth*width
    rows — broadcast it; candidates stream map-side."""
    from pyspark.sql.functions import broadcast
    k = F.col(key_col)
    probes = keys.select(key_col, F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"), _cms_bucket(k, r, width).alias("c"))
        for r in range(depth)])).alias("cell")) \
        .select(key_col, F.col("cell.r").alias("r"),
                F.col("cell.c").alias("c"))
    joined = probes.join(broadcast(sketch), ["r", "c"], "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


def cms_heavy_hitters_sql(table: str, key_expr: str, threshold: int,
                          depth: int = 4, width: int = 1024,
                          out_col: str = "key") -> str:
    """DuckDB twin of sketch + estimate + threshold filter, with the
    exact count alongside (the overestimate-only property is visible:
    est_count >= n_exact always)."""
    buckets_src = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_bucket_sql('k', r, width)} AS c, k "
        f"FROM _cms_src" for r in range(depth))
    return f"""
WITH _cms_src AS (
  SELECT {key_expr} AS k FROM {table}
), _cms_cells AS (
  SELECT r, c, count(*) AS cnt FROM ({buckets_src}) GROUP BY r, c
), _cms_cand AS (
  SELECT DISTINCT k FROM _cms_src
), _cms_probe AS (
  {" UNION ALL ".join(
      f"SELECT k, {r} AS r, {_cms_bucket_sql('k', r, width)} AS c "
      f"FROM _cms_cand" for r in range(depth))}
), _cms_est AS (
  SELECT p.k, min(coalesce(s.cnt, 0)) AS est_count
  FROM _cms_probe p LEFT JOIN _cms_cells s USING (r, c) GROUP BY p.k
), _cms_exact AS (
  SELECT k, count(*) AS n_exact FROM _cms_src GROUP BY 1
)
SELECT e.k AS {out_col}, e.est_count, x.n_exact
FROM _cms_est e JOIN _cms_exact x USING (k)
WHERE e.est_count >= {threshold}
"""


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ---------------------------------------------------------------------------
# Exact percentiles (operators/.. corpus_profile) sort/shuffle every
# VALUE — at 100 TB that is the single most expensive aggregate in a
# profiling pass.  The fixed-bin histogram sketch reduces a group to at
# most ``nbins`` (bin, count) integer rows: binning is one codegen
# expression in the scan stage, the shuffle carries bins (not values),
# partial aggregation collapses map-side, and sketches from different
# shards/days/snapshots MERGE by summing counts (the same
# persist-then-merge contract as the HLL register table above).
# Quantiles come from the cumulative distribution with linear
# interpolation inside the landing bin — error is bounded by one bin
# width, the classic accuracy/size trade (t-digest territory; the
# fixed-bin variant is chosen because its arithmetic is deterministic
# integer + fixed-order scalar float, so the DuckDB oracle replays it
# bit-identically, which an adaptive sketch cannot offer).
#
# Contract: values are clamped into [lo, hi] (outliers land in the edge
# bins — documented, matches how profile ranges are chosen from schema
# knowledge); quantile q must be in (0, 1].


def hist_sketch(df: DataFrame, value_col: str, lo: float, hi: float,
                nbins: int = 128,
                group_cols: Sequence[str] = ()) -> DataFrame:
    """``(*group_cols, bin, cnt)`` — the persistable sketch table."""
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((v - F.lit(float(lo)))
                   / F.lit(float(hi) - float(lo)) * nbins), F.lit(0)),
        F.lit(nbins - 1)).cast("int")
    return (df.groupBy(*group_cols, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def hist_sketch_windowed(df: DataFrame, value_col: str, lo: float,
                         hi: float, nbins: int = 128,
                         ts_col: str = "ts", window: str = "1 hour",
                         watermark: str = "1 day") -> DataFrame:
    """Event-time-windowed sketch ``(window_start, bin, cnt)`` — works on
    batch AND streaming frames (``count`` is incrementally maintainable;
    Structured Streaming finalizes a window's bins at the watermark and
    state stays <= nbins rows per open window).  Finish downstream with
    :func:`hist_quantiles` over ``group_cols=["window_start"]`` — the
    streaming latency percentile dashboard in two operators."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((v - F.lit(float(lo)))
                   / F.lit(float(hi) - float(lo)) * nbins), F.lit(0)),
        F.lit(nbins - 1)).cast("int")
    return (src.groupBy(F.window(ts_col, window).alias("w"),
                        b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "bin", "cnt"))


def hist_merge(*sketches: DataFrame,
               group_cols: Sequence[str] = ()) -> DataFrame:
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy(*group_cols, "bin")
            .agg(F.sum("cnt").alias("cnt")))


def hist_quantiles(sketch: DataFrame, qs: Sequence[float],
                   lo: float, hi: float, nbins: int = 128,
                   group_cols: Sequence[str] = ()) -> DataFrame:
    """``(*group_cols, q, value)`` per requested quantile.

    The landing bin is the first (by bin order) whose cumulative count
    reaches ``q * total``; the value interpolates linearly inside it:
    ``lo + (bin + (r - cum_before)/cnt) * width``.  Expressed as a
    cumulative window over the (<= nbins-row-per-group) sketch — integer
    counts plus one fixed-shape scalar float expression, so the SQL
    mirror is bit-identical.  ``q`` must be in (0, 1]."""
    from pyspark.sql import Window
    width = (float(hi) - float(lo)) / nbins
    wc = (Window.partitionBy(*[F.col(c) for c in group_cols])
          .orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(*[F.col(c) for c in group_cols])
    c = (sketch.withColumn("cum", F.sum("cnt").over(wc))
         .withColumn("total", F.sum("cnt").over(wt))
         .withColumn("q", F.explode(
             F.array(*[F.lit(float(q)) for q in qs]))))
    r = F.col("q") * F.col("total")
    prev = F.col("cum") - F.col("cnt")
    value = (F.lit(float(lo))
             + (F.col("bin") + (r - prev) / F.col("cnt")) * F.lit(width))
    return (c.filter((F.col("cum") >= r) & (prev < r))
            .select(*group_cols, "q", F.round(value, 6).alias("value")))


def hist_sketch_sql(table: str, value_expr: str, lo: float, hi: float,
                    nbins: int = 128,
                    group_cols: Sequence[str] = ()) -> str:
    g = "".join(f"{c}, " for c in group_cols)
    b = (f"cast(least(greatest(floor((cast({value_expr} as double) - {float(lo)!r}) "
         f"/ {float(hi) - float(lo)!r} * {nbins}), 0), {nbins - 1}) as int)")
    return (f"SELECT {g}{b} AS bin, count(*) AS cnt "
            f"FROM {table} GROUP BY {g}bin")


def hist_quantiles_sql(table: str, value_expr: str, qs: Sequence[float],
                       lo: float, hi: float, nbins: int = 128,
                       group_cols: Sequence[str] = ()) -> str:
    """DuckDB twin: same binning, same cumulative-window landing-bin
    pick, same interpolation expression shape.

    (A list_reduce fold was tried first and abandoned: DuckDB 1.0
    evaluates struct-literal fields SEQUENTIALLY inside the reduce
    lambda, so later fields read the already-updated accumulator —
    silent wrong results vs Spark's snapshot semantics.  The window
    form is portable and is also what the Spark side runs.)"""
    g = "".join(f"{c}, " for c in group_cols)
    part = ("PARTITION BY " + ", ".join(group_cols)
            if group_cols else "")
    width = (float(hi) - float(lo)) / nbins
    sketch = hist_sketch_sql(table, value_expr, lo, hi, nbins, group_cols)
    qvals = ", ".join(f"(cast({float(q)!r} as double))" for q in qs)
    return f"""
WITH _hs AS ({sketch}),
_hc AS (
  SELECT {g}bin, cnt,
         sum(cnt) OVER ({part} ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER ({part}) AS total
  FROM _hs
),
_hq AS (SELECT * FROM _hc, (VALUES {qvals}) AS _q(q))
SELECT {g}q,
       round({float(lo)!r} + (bin + (q * total - (cum - cnt)) / cnt)
             * {width!r}, 6) AS value
FROM _hq
WHERE cum >= q * total AND (cum - cnt) < q * total"""
