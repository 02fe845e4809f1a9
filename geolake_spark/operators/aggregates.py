"""Temporal resample (A1) and dimension-average (A2).

Reference semantics: ``Workflow`` resample/average nodes
(/root/reference/datastore/workflow/workflow.py:121-155); allowed aggregators
max/nanmax/min/nanmin/mean/nanmean/sum/nansum (workflow.py:12-21).  Spark's
built-in aggregates already skip nulls, so the nan-variants map to the same
function after a NaN->null normalization; the plain variants propagate NaN
like NumPy when any NaN is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_AGGS = {"max": F.max, "min": F.min, "mean": F.avg, "sum": F.sum}

# Pandas/xarray-style frequency aliases -> Spark window durations
_FREQ = {"1H": "1 hour", "H": "1 hour", "6H": "6 hours", "1D": "1 day",
         "D": "1 day", "1W": "1 week", "W": "1 week", "1M": "1 month",
         "1Y": "1 year"}


def _resolve_agg(operator: str):
    name = operator.lower()
    nan_skipping = name.startswith("nan")
    if nan_skipping:
        name = name[3:]
    if name not in _AGGS:  # workflow.py:12-21 whitelist
        raise ValueError(f"unsupported aggregator: {operator}")
    return _AGGS[name], nan_skipping


def resample(df: DataFrame, operator: str, frequency: str,
             value_col: str = "value", ts_col: str = "ts",
             keys: list[str] | None = None, closed: str = "left") -> DataFrame:
    """Group ``value_col`` into fixed windows of ``frequency`` per key group.

    ``closed="right"`` (fixture /root/reference/datastore/tests/workflow/
    fixtures.py:44-54) makes the right edge inclusive / left exclusive, i.e. a
    timestamp exactly on a boundary belongs to the *earlier* window — mapped
    by shifting timestamps by -1 microsecond before bucketing.

    Output: keys + ``bucket_start timestamp`` + ``value`` (aggregated),
    map-side partial aggregation via Catalyst HashAggregate.
    """
    agg_fn, nan_skipping = _resolve_agg(operator)
    duration = _FREQ.get(frequency, frequency)
    if keys is None:
        keys = [c for c in df.columns if c not in (ts_col, value_col)]

    ts = F.col(ts_col)
    if closed == "right":
        ts = ts - F.expr("INTERVAL 1 MICROSECOND")
    val = F.col(value_col)
    if nan_skipping:
        val = F.when(F.isnan(val), F.lit(None)).otherwise(val)
    else:
        # NumPy plain max/sum propagate NaN; Spark max ignores NaN ordering
        # differences — make group-level NaN propagation explicit.
        return (df.groupBy(F.window(ts, duration).alias("w"), *keys)
                .agg(F.when(F.max(F.isnan(F.col(value_col)).cast("int")) == 1,
                            F.lit(float("nan")))
                     .otherwise(agg_fn(F.col(value_col))).alias(value_col))
                .withColumn("bucket_start", F.col("w.start")).drop("w"))
    return (df.groupBy(F.window(ts, duration).alias("w"), *keys)
            .agg(agg_fn(val).alias(value_col))
            .withColumn("bucket_start", F.col("w.start")).drop("w"))


def average(df: DataFrame, dim: str, value_col: str = "value") -> DataFrame:
    """Collapse one dimension by (nan-skipping) mean — workflow.py:144-155.
    Groups by every other column except the value."""
    keys = [c for c in df.columns if c not in (dim, value_col)]
    val = F.when(F.isnan(F.col(value_col)), F.lit(None)).otherwise(F.col(value_col))
    return df.groupBy(*keys).agg(F.avg(val).alias(value_col))


def interpolate_gaps(df: DataFrame, step: str = "1 hour",
                     entity_col: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value") -> DataFrame:
    """Regularize an irregular time series per entity: generate the
    step-spaced grid from each entity's first to last observation and
    linearly interpolate ``value_col`` between the surrounding
    observations (the temporal analogue of the W4 ``to_regular``
    spatial regrid; xarray ``interp``-style, public semantics).

    Plan shape: one groupBy for the per-entity bounds (map-side), one
    ``sequence``-explode producing the grid (no driver work — the grid
    materializes distributed), a union with the observations, and ONE
    window pass per direction (``last_value IGNORE NULLS`` backward,
    ``first_value IGNORE NULLS`` forward) — two sorts over the same
    per-entity partitioning, no joins.  Exact observation timestamps on
    the grid take their observed value (frac = 0); grid points at/after
    the last observation carry it forward (next is null -> prev).

    Float determinism: the interpolation is a single expression per row
    (no distributed float sums), so the DuckDB twin is bit-identical.

    Returns ``(entity, grid_ts, value, interpolated)``.
    """
    w_back = (Window.partitionBy(entity_col)
              .orderBy(F.col("_t"), F.col("_obs").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy(entity_col)
             .orderBy(F.col("_t"), F.col("_obs").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    bounds = (df.groupBy(entity_col)
              .agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")))
    grid = bounds.select(
        entity_col,
        F.explode(F.expr(f"sequence(_lo, _hi, interval {step})"))
        .alias("_t")).withColumn("_obs", F.lit(0)) \
        .withColumn("_v", F.lit(None).cast("double"))
    obs = df.select(entity_col, F.col(ts_col).alias("_t"),
                    F.lit(1).alias("_obs"),
                    F.col(value_col).cast("double").alias("_v"))

    u = grid.unionByName(obs)
    prev_v = F.last(F.col("_v"), ignorenulls=True).over(w_back)
    prev_t = F.last(F.when(F.col("_obs") == 1, F.col("_t")),
                    ignorenulls=True).over(w_back)
    next_v = F.first(F.col("_v"), ignorenulls=True).over(w_fwd)
    next_t = F.first(F.when(F.col("_obs") == 1, F.col("_t")),
                     ignorenulls=True).over(w_fwd)
    pu = F.unix_micros(F.col("_pt").cast("timestamp"))
    nu = F.unix_micros(F.col("_nt").cast("timestamp"))
    tu = F.unix_micros(F.col("_t").cast("timestamp"))
    frac = (tu - pu).cast("double") / (nu - pu).cast("double")
    interp = F.when(F.col("_nt").isNull() | (nu == pu), F.col("_pv")) \
        .otherwise(F.col("_pv")
                   + (F.col("_nv") - F.col("_pv")) * frac)
    return (u.withColumn("_pv", prev_v).withColumn("_pt", prev_t)
            .withColumn("_nv", next_v).withColumn("_nt", next_t)
            .filter(F.col("_obs") == 0)
            .select(entity_col, F.col("_t").alias("grid_ts"),
                    F.round(interp, 6).alias("value"),
                    (F.col("_pt") != F.col("_t")).alias("interpolated")))


def interpolate_gaps_sql(table: str, step: str = "1 hour",
                         entity_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value") -> str:
    """DuckDB twin of :func:`interpolate_gaps` (same window passes,
    IGNORE NULLS, integer-microsecond fractions)."""
    return f"""
WITH _ig_b AS (
    SELECT {entity_col}, min({ts_col}) AS lo, max({ts_col}) AS hi
    FROM {table} GROUP BY 1
), _ig_grid AS (
    SELECT {entity_col}, unnest(generate_series(lo, hi,
           interval {step})) AS t, 0 AS obs, NULL::DOUBLE AS v
    FROM _ig_b
), _ig_obs AS (
    SELECT {entity_col}, {ts_col} AS t, 1 AS obs,
           {value_col}::DOUBLE AS v
    FROM {table}
), _ig_u AS (
    SELECT * FROM _ig_grid UNION ALL SELECT * FROM _ig_obs
), _ig_w AS (
    SELECT {entity_col}, t, obs,
           last_value(v IGNORE NULLS) OVER wb AS pv,
           last_value(CASE WHEN obs = 1 THEN t END IGNORE NULLS)
             OVER wb AS pt,
           first_value(v IGNORE NULLS) OVER wf AS nv,
           first_value(CASE WHEN obs = 1 THEN t END IGNORE NULLS)
             OVER wf AS nt
    FROM _ig_u
    WINDOW wb AS (PARTITION BY {entity_col} ORDER BY t, obs DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY {entity_col} ORDER BY t, obs DESC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT {entity_col}, t AS grid_ts,
       round(CASE WHEN nt IS NULL OR epoch_us(nt) = epoch_us(pt) THEN pv
             ELSE pv + (nv - pv) *
                  (cast(epoch_us(t) - epoch_us(pt) as double)
                   / cast(epoch_us(nt) - epoch_us(pt) as double))
             END, 6) AS value,
       pt != t AS interpolated
FROM _ig_w WHERE obs = 0
"""


def mad_outliers(df: DataFrame, value_col: str, group_cols: list[str],
                 id_col: str = "event_id", k: float = 3.0) -> DataFrame:
    """Robust per-group outliers by median absolute deviation: a row is
    an outlier iff ``|x - median| > k * MAD`` where MAD = median of
    ``|x - median|`` within the group (the 3-sigma rule's
    robust-statistics twin — medians shrug off the very outliers that
    poison mean/stddev).  Returns the outlier rows as ``(id, *groups,
    value, med, mad)``.

    Parity contract: both medians come from exact-percentile
    interpolation (Spark ``percentile`` == DuckDB ``quantile_cont``,
    order-free over sorted values) ROUNDED to 6 dp, and the comparison
    runs on the rounded doubles — so a final-ulp interpolation
    difference cannot flip a boundary row.  Plan shape: two grouped
    percentile aggregations (group-count-sized results broadcast back),
    zero Python."""
    g = [F.col(c) for c in group_cols]
    med = (df.groupBy(*g)
           .agg(F.round(F.percentile(F.col(value_col), F.lit(0.5)), 6)
                .alias("med")))
    with_med = df.join(F.broadcast(med), group_cols)
    dev = with_med.withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("med")))
    mad = (dev.groupBy(*g)
           .agg(F.round(F.percentile(F.col("_dev"), F.lit(0.5)), 6)
                .alias("mad")))
    out = dev.join(F.broadcast(mad), group_cols)
    return (out.filter(F.col("_dev") > F.lit(k) * F.col("mad"))
            .select(F.col(id_col), *group_cols, F.col(value_col),
                    "med", "mad"))


def mad_outliers_sql(docs_sql: str, value_col: str, group_cols: list[str],
                     id_col: str = "event_id", k: float = 3.0) -> str:
    """DuckDB mirror of :func:`mad_outliers`."""
    gc = ", ".join(group_cols)
    return f"""
WITH _mo_b AS (
  SELECT * FROM ({docs_sql})
), _mo_m AS (
  SELECT {gc}, round(quantile_cont({value_col}, 0.5), 6) AS med
  FROM _mo_b GROUP BY {gc}
), _mo_d AS (
  SELECT b.*, m.med, abs(b.{value_col} - m.med) AS _dev
  FROM _mo_b b JOIN _mo_m m USING ({gc})
), _mo_s AS (
  SELECT {gc}, round(quantile_cont(_dev, 0.5), 6) AS mad
  FROM _mo_d GROUP BY {gc}
)
SELECT d.{id_col}, {', '.join('d.' + c for c in group_cols)},
       d.{value_col}, d.med, s.mad
FROM _mo_d d JOIN _mo_s s USING ({gc})
WHERE d._dev > {k!r} * s.mad"""


def ewma_last(df: DataFrame, entity_col: str, ts_col: str,
              value_col: str, alpha: float = 0.5) -> DataFrame:
    """Per-entity exponentially-weighted moving average after the LAST
    observation (recency-weighted activity score): fold
    ``acc = alpha*x + (1-alpha)*acc`` over the entity's values in
    ``(ts, value)`` order, seeded with the first value.  Returns
    ``(entity, n_obs, ewma)`` with ewma rounded to 9 dp.

    Determinism: the fold order is total — ties on ts break by value —
    and each step is the same two-multiply-one-add sequence in both
    engines, so the oracle replays it bit-identically (use an alpha
    exactly representable in binary, e.g. 0.5/0.25/0.375, to keep the
    per-step arithmetic exact-input).  Plan: one groupBy collecting the
    per-entity series; entities with pathological cardinality (one key
    = the whole table) are a skew risk like any collect_list — bound
    upstream, stated."""
    pairs = F.array_sort(F.collect_list(
        F.struct(F.col(ts_col).alias("t"),
                 F.col(value_col).cast("double").alias("v"))))
    fold = F.aggregate(
        F.slice(pairs, 2, F.greatest(F.size(pairs) - 1, F.lit(0))),
        F.element_at(pairs, 1)["v"],
        lambda acc, x: F.lit(alpha) * x["v"] + F.lit(1.0 - alpha) * acc)
    return (df.groupBy(F.col(entity_col).alias("entity"))
            .agg(F.count(F.lit(1)).alias("n_obs"),
                 F.round(fold, 9).alias("ewma")))


def ewma_last_sql(docs_sql: str, entity_col: str, ts_col: str,
                  value_col: str, alpha: float = 0.5) -> str:
    """DuckDB mirror of :func:`ewma_last`.  DuckDB's two-arg
    ``list_reduce`` seeds the accumulator with the FIRST element — the
    exact contract of the Spark fold (scalar acc, so the struct-literal
    fold pitfall does not apply)."""
    return f"""
WITH _ew_g AS (
  SELECT {entity_col} AS entity, count(*) AS n_obs,
         list(cast({value_col} AS DOUBLE)
              ORDER BY {ts_col}, {value_col}) AS vs
  FROM ({docs_sql}) GROUP BY 1
)
SELECT entity, n_obs,
       round(list_reduce(vs, (acc, x) ->
             {alpha!r} * x + {1.0 - alpha!r} * acc), 9) AS ewma
FROM _ew_g"""


def distribution_drift(old: DataFrame, new: DataFrame, value_col: str,
                       nbins: int = 10) -> DataFrame:
    """Snapshot-to-snapshot distribution comparison of a numeric column
    — the data-quality drift monitor.  Bin edges come from the OLD
    side's min/max (one agg row; the baseline defines the reference
    frame), both sides are histogrammed over those SHARED edges with
    out-of-range values clamped into the edge bins, and every bin row
    is emitted even when empty: ``(bin, lo, hi, n_old, n_new)``.

    Counts are integers (exact oracle); the PSI / KL-divergence
    finisher stays consumer-side (cross-engine libm logs are not
    bit-contracted — the PMI precedent).  Binning arithmetic is the
    fixed sequence floor((x - mn) / width) in both engines."""
    s = old.agg(F.min(value_col).alias("mn"),
                F.max(value_col).alias("mx")).collect()[0]
    mn, mx = float(s.mn), float(s.mx)
    width = (mx - mn) / nbins
    if width <= 0:
        width = 1.0  # degenerate constant baseline: one bin catches all

    def binned(df):
        b = F.floor((F.col(value_col) - F.lit(mn)) / F.lit(width))
        b = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1))
        return (df.select(b.cast("int").alias("bin"))
                .groupBy("bin").agg(F.count(F.lit(1)).alias("n")))

    spark = old.sparkSession
    bins = spark.range(nbins).select(F.col("id").cast("int").alias("bin"))
    out = (bins
           .join(binned(old).withColumnRenamed("n", "n_old"), "bin", "left")
           .join(binned(new).withColumnRenamed("n", "n_new"), "bin", "left"))
    lo = F.round(F.lit(mn) + F.col("bin") * F.lit(width), 6)
    hi = F.round(F.lit(mn) + (F.col("bin") + 1) * F.lit(width), 6)
    return out.select("bin", lo.alias("lo"), hi.alias("hi"),
                      F.coalesce("n_old", F.lit(0)).alias("n_old"),
                      F.coalesce("n_new", F.lit(0)).alias("n_new"))


def distribution_drift_sql(old_sql: str, new_sql: str, value_col: str,
                           nbins: int = 10) -> str:
    """DuckDB mirror of :func:`distribution_drift`."""
    def binned(src: str) -> str:
        b = (f"cast(least(greatest(floor(({value_col} - s.mn) / s.w), 0), "
             f"{nbins - 1}) AS INTEGER)")
        return (f"SELECT {b} AS bin, count(*) AS n "
                f"FROM ({src}), _dd_s s GROUP BY 1")

    return f"""
WITH _dd_m AS (
  SELECT min({value_col}) AS mn, max({value_col}) AS mx FROM ({old_sql})
), _dd_s AS (
  SELECT cast(mn AS DOUBLE) AS mn,
         (CASE WHEN (cast(mx AS DOUBLE) - cast(mn AS DOUBLE))
                    / {nbins} <= 0 THEN 1.0
          ELSE (cast(mx AS DOUBLE) - cast(mn AS DOUBLE)) / {nbins} END)
           AS w
  FROM _dd_m
), _dd_o AS ({binned(old_sql)}), _dd_n AS ({binned(new_sql)})
SELECT b.bin, round(s.mn + b.bin * s.w, 6) AS lo,
       round(s.mn + (b.bin + 1) * s.w, 6) AS hi,
       coalesce(o.n, 0) AS n_old, coalesce(n.n, 0) AS n_new
FROM (SELECT cast(range AS INTEGER) AS bin FROM range({nbins})) b
LEFT JOIN _dd_o o ON o.bin = b.bin
LEFT JOIN _dd_n n ON n.bin = b.bin
CROSS JOIN _dd_s s"""


def lag_features(df: DataFrame, entity_col: str, ts_col: str,
                 value_col: str, lags: int = 3) -> DataFrame:
    """Per-entity ML lag features: the previous ``lags`` values and the
    gap to the previous event — ``(entity, ts, value, value_lag1..k,
    gap_us)`` with nulls where history runs out.  One window shuffle on
    the entity key; every feature is a lag over the same (ts, value)-
    ordered frame, so Catalyst computes them in a single Window node
    (ties on ts break by value — total order, oracle-identical)."""
    out = df.select(F.col(entity_col).alias("entity"),
                    F.col(ts_col).alias("ts"),
                    F.col(value_col).alias("value"))
    w2 = Window.partitionBy("entity").orderBy(F.col("ts"), F.col("value"))
    for i in range(1, lags + 1):
        out = out.withColumn(f"value_lag{i}",
                             F.lag("value", i).over(w2))
    return out.withColumn(
        "gap_us",
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.lag("ts", 1).over(w2).cast("timestamp")))


def lag_features_sql(docs_sql: str, entity_col: str, ts_col: str,
                     value_col: str, lags: int = 3) -> str:
    """DuckDB mirror of :func:`lag_features`."""
    over = f"OVER (PARTITION BY {entity_col} ORDER BY {ts_col}, {value_col})"
    lag_cols = ", ".join(
        f"lag({value_col}, {i}) {over} AS value_lag{i}"
        for i in range(1, lags + 1))
    return (f"SELECT {entity_col} AS entity, {ts_col} AS ts, "
            f"{value_col} AS value, {lag_cols}, "
            f"epoch_us({ts_col}) - epoch_us(lag({ts_col}, 1) {over}) "
            f"AS gap_us FROM ({docs_sql})")


def ohlc_bars(df: DataFrame, ts_col: str, value_col: str,
              group_cols: list[str] | None = None,
              bucket: str = "hour") -> DataFrame:
    """Open/high/low/close bars per time bucket (and optional group):
    the telemetry/finance downsampling staple.  One partial-agg'd
    groupBy; open/close come from ``min/max(struct(ts, value))`` so ties
    on ``ts`` break by value — a total order, making the DuckDB oracle
    value-hash exact (the od_matrix struct-extrema precedent).  At scale
    this is a plain map-side-combined aggregation on (bucket, groups) —
    no window, no second shuffle."""
    gcols = list(group_cols or [])
    bar = F.date_trunc(bucket, F.col(ts_col).cast("timestamp")).alias("bar")
    pair = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    out = (df.groupBy(*gcols, bar)
           .agg(F.min(pair).alias("_o"), F.max(pair).alias("_c"),
                F.max(value_col).alias("high"),
                F.min(value_col).alias("low"),
                F.count(F.lit(1)).alias("n_obs")))
    return out.select(*gcols, "bar", F.col("_o.v").alias("open"), "high",
                      "low", F.col("_c.v").alias("close"), "n_obs")


def ohlc_bars_sql(docs_sql: str, ts_col: str, value_col: str,
                  group_cols: list[str] | None = None,
                  bucket: str = "hour") -> str:
    """DuckDB mirror of :func:`ohlc_bars` (struct extrema are
    lexicographic in both engines)."""
    gcols = list(group_cols or [])
    gsel = "".join(f"{c}, " for c in gcols)
    return f"""
SELECT {gsel}date_trunc('{bucket}', {ts_col}) AS bar,
       (min(struct_pack(t := {ts_col}, v := {value_col}))).v AS open,
       max({value_col}) AS high,
       min({value_col}) AS low,
       (max(struct_pack(t := {ts_col}, v := {value_col}))).v AS close,
       count(*) AS n_obs
FROM ({docs_sql})
GROUP BY ALL"""


def ohlc_bars_windowed(df: DataFrame, ts_col: str, value_col: str,
                       group_cols: list[str] | None = None,
                       window: str = "1 hour",
                       watermark: str = "1 day") -> DataFrame:
    """Event-time-windowed :func:`ohlc_bars` — works on batch AND
    streaming frames (min/max/count and the struct extrema are all
    incrementally maintainable, so Structured Streaming finalizes each
    bar at the watermark with O(1) state per open (window, group)).
    The streaming market-data/telemetry downsampler; same total-order
    open/close contract as the batch form (tested batch == streaming)."""
    gcols = list(group_cols or [])
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    pair = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    out = (src.groupBy(*gcols, F.window(ts_col, window).alias("w"))
           .agg(F.min(pair).alias("_o"), F.max(pair).alias("_c"),
                F.max(value_col).alias("high"),
                F.min(value_col).alias("low"),
                F.count(F.lit(1)).alias("n_obs")))
    return out.select(*gcols, F.col("w.start").alias("bar"),
                      F.col("_o.v").alias("open"), "high", "low",
                      F.col("_c.v").alias("close"), "n_obs")


def ab_zscores(events: DataFrame, metric_col: str = "event_type",
               variant_col: str = "variant", entity_col: str = "user_id",
               ) -> DataFrame:
    """Two-proportion A/B test per metric: an entity "converts" on a
    metric if it emitted >= 1 such event; denominators are ALL entities
    of the variant (not just converters).  Returns ``(metric, n_a, x_a,
    n_b, x_b, z)`` with the pooled two-proportion z-score rounded to
    6 dp — IEEE sqrt is correctly rounded, so the fixed op sequence is
    bit-identical across engines (the one spot trig/log would not be).

    Plan: one distinct-entities-per-variant rollup + one
    (metric, variant) distinct-converter rollup, both partial-agg'd,
    joined at metrics-size.  Zero-denominator guards yield NULL z."""
    tot = (events.groupBy(variant_col)
           .agg(F.count_distinct(F.col(entity_col)).alias("n")))
    n_a = F.max(F.when(F.col(variant_col) == "A", F.col("n"))).alias("n_a")
    n_b = F.max(F.when(F.col(variant_col) == "B", F.col("n"))).alias("n_b")
    totals = tot.agg(n_a, n_b)
    conv = (events.groupBy(metric_col, variant_col)
            .agg(F.count_distinct(F.col(entity_col)).alias("x"))
            .groupBy(F.col(metric_col).alias("metric"))
            .agg(F.coalesce(F.max(F.when(F.col(variant_col) == "A",
                                         F.col("x"))), F.lit(0)).alias("x_a"),
                 F.coalesce(F.max(F.when(F.col(variant_col) == "B",
                                         F.col("x"))), F.lit(0)).alias("x_b")))
    j = conv.crossJoin(F.broadcast(totals))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    xa, xb = F.col("x_a").cast("double"), F.col("x_b").cast("double")
    p = (xa + xb) / (na + nb)
    se = F.sqrt(p * (F.lit(1.0) - p) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0.0),
               F.round((xa / na - xb / nb) / se, 6))
    return j.select("metric", "n_a", "x_a", "n_b", "x_b", z.alias("z"))


def ab_zscores_sql(events_sql: str, metric_expr: str = "event_type",
                   variant_expr: str = "variant",
                   entity_expr: str = "user_id") -> str:
    """DuckDB mirror of :func:`ab_zscores` (same op sequence)."""
    return f"""
WITH _ab_tot AS (
  SELECT max(CASE WHEN v = 'A' THEN n END) AS n_a,
         max(CASE WHEN v = 'B' THEN n END) AS n_b
  FROM (SELECT {variant_expr} AS v, count(DISTINCT {entity_expr}) AS n
        FROM ({events_sql}) GROUP BY 1)
), _ab_conv AS (
  SELECT m AS metric,
         coalesce(max(CASE WHEN v = 'A' THEN x END), 0) AS x_a,
         coalesce(max(CASE WHEN v = 'B' THEN x END), 0) AS x_b
  FROM (SELECT {metric_expr} AS m, {variant_expr} AS v,
               count(DISTINCT {entity_expr}) AS x
        FROM ({events_sql}) GROUP BY 1, 2)
  GROUP BY 1
)
SELECT metric, n_a, x_a, n_b, x_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND
                 sqrt(((cast(x_a AS DOUBLE) + cast(x_b AS DOUBLE))
                       / (cast(n_a AS DOUBLE) + cast(n_b AS DOUBLE)))
                      * (1.0 - (cast(x_a AS DOUBLE) + cast(x_b AS DOUBLE))
                         / (cast(n_a AS DOUBLE) + cast(n_b AS DOUBLE)))
                      * (1.0 / cast(n_a AS DOUBLE)
                         + 1.0 / cast(n_b AS DOUBLE))) > 0.0
       THEN round((cast(x_a AS DOUBLE) / cast(n_a AS DOUBLE)
                   - cast(x_b AS DOUBLE) / cast(n_b AS DOUBLE))
                  / sqrt(((cast(x_a AS DOUBLE) + cast(x_b AS DOUBLE))
                          / (cast(n_a AS DOUBLE) + cast(n_b AS DOUBLE)))
                         * (1.0 - (cast(x_a AS DOUBLE) + cast(x_b AS DOUBLE))
                            / (cast(n_a AS DOUBLE) + cast(n_b AS DOUBLE)))
                         * (1.0 / cast(n_a AS DOUBLE)
                            + 1.0 / cast(n_b AS DOUBLE))), 6)
       END AS z
FROM _ab_conv, _ab_tot"""


def cusum_alarms(events: DataFrame, target_cents: int, slack_cents: int,
                 threshold_cents: int, entity_col: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 value_col: str = "value") -> DataFrame:
    """Two-sided CUSUM change-point detection per entity (Page 1954):
    the classic sequential drift detector for per-user metric shifts
    (spend creep, latency regressions, sensor drift).  High side folds
    ``s = max(0, s + (x - target - slack))``, low side symmetric; an
    alarm fires when either statistic exceeds ``threshold_cents``.
    Values are fixed-point integer cents (``round(value*100)``) so
    every step is exact int64 arithmetic.  Returns per entity:
    ``(entity, n_obs, max_hi, max_lo, n_alarms, first_alarm_id)``
    (first alarm by (ts, id) order; NULL when no alarm).

    The sequential fold is NOT computed as a fold: the reflected walk
    ``s_i = max(0, s_{i-1} + d_i)`` equals ``P_i - min(0, min_{j<=i}
    P_j)`` where ``P`` is the plain prefix sum of ``d`` — so two
    cumulative windows per side (sum, then running min) give the exact
    CUSUM trajectory with ONE hash-partition shuffle on the entity and
    zero per-row Python, and — unlike collect_list folds — a
    million-point entity streams through the window operator without
    materializing its track in a single agg buffer.  Reference analogue:
    none (geolake has no sequential stats); public-algorithm citation:
    E.S. Page, Biometrika 41 (1954)."""
    cents = F.round(F.col(value_col) * 100, 0).cast("bigint")
    d_hi = cents - F.lit(int(target_cents) + int(slack_cents))
    d_lo = F.lit(int(target_cents) - int(slack_cents)) - cents
    w = (Window.partitionBy("entity").orderBy("_cu_t", "_cu_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    p = (events.select(F.col(entity_col).alias("entity"),
                       F.col(ts_col).alias("_cu_t"),
                       F.col(id_col).alias("_cu_id"),
                       d_hi.alias("_cu_dh"), d_lo.alias("_cu_dl"))
         .select("entity", "_cu_t", "_cu_id",
                 F.sum("_cu_dh").over(w).alias("_cu_ph"),
                 F.sum("_cu_dl").over(w).alias("_cu_pl")))
    s_hi = F.col("_cu_ph") - F.least(F.lit(0), F.min("_cu_ph").over(w))
    s_lo = F.col("_cu_pl") - F.least(F.lit(0), F.min("_cu_pl").over(w))
    s = p.select("entity", "_cu_t", "_cu_id",
                 s_hi.alias("_cu_sh"), s_lo.alias("_cu_sl"))
    alarm = (F.col("_cu_sh") > threshold_cents) | \
            (F.col("_cu_sl") > threshold_cents)
    first = F.min(F.when(alarm, F.struct(F.col("_cu_t").alias("t"),
                                         F.col("_cu_id").alias("i"))))
    return (s.groupBy("entity")
            .agg(F.count(F.lit(1)).alias("n_obs"),
                 F.max("_cu_sh").alias("max_hi"),
                 F.max("_cu_sl").alias("max_lo"),
                 F.sum(alarm.cast("int")).alias("n_alarms"),
                 first["i"].alias("first_alarm_id")))


def cusum_alarms_sql(events_sql: str, target_cents: int, slack_cents: int,
                     threshold_cents: int, entity_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value") -> str:
    """DuckDB mirror of :func:`cusum_alarms` (same prefix-sum /
    running-min restatement; all-integer, so value-hash exact)."""
    hi = int(target_cents) + int(slack_cents)
    lo = int(target_cents) - int(slack_cents)
    h = int(threshold_cents)
    return f"""
WITH _cu_d AS (
  SELECT {entity_col} AS entity, {ts_col} AS t, {id_col} AS rid,
         cast(round(({value_col}) * 100) AS BIGINT) AS cents
  FROM ({events_sql})
), _cu_p AS (
  SELECT entity, t, rid,
         sum(cents - {hi}) OVER w AS ph,
         sum({lo} - cents) OVER w AS pl
  FROM _cu_d
  WINDOW w AS (PARTITION BY entity ORDER BY t, rid
               ROWS UNBOUNDED PRECEDING)
), _cu_s AS (
  SELECT entity, t, rid,
         ph - least(0, min(ph) OVER w) AS sh,
         pl - least(0, min(pl) OVER w) AS sl
  FROM _cu_p
  WINDOW w AS (PARTITION BY entity ORDER BY t, rid
               ROWS UNBOUNDED PRECEDING)
)
SELECT entity, count(*) AS n_obs, max(sh) AS max_hi, max(sl) AS max_lo,
       coalesce(sum(CASE WHEN sh > {h} OR sl > {h} THEN 1 ELSE 0 END), 0)
         AS n_alarms,
       (min(CASE WHEN sh > {h} OR sl > {h}
                 THEN struct_pack(t := t, i := rid) END)).i
         AS first_alarm_id
FROM _cu_s GROUP BY 1"""
