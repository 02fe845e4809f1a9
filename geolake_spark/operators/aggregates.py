"""Temporal resample (A1) and dimension-average (A2).

Reference semantics: ``Workflow`` resample/average nodes
(/root/reference/datastore/workflow/workflow.py:121-155); allowed aggregators
max/nanmax/min/nanmin/mean/nanmean/sum/nansum (workflow.py:12-21).  Spark's
built-in aggregates already skip nulls, so the nan-variants map to the same
function after a NaN->null normalization; the plain variants propagate NaN
like NumPy when any NaN is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
