"""Range/interval and as-of joins (SURVEY §2.3 J5 — absent in the reference,
mandatory for training-data pipelines: windowed labels, rate tables,
point-in-time feature joins).

* ``range_join`` — facts with a scalar ``v`` joined to intervals
  ``[lo, hi]``.  A naive theta-join is a nested loop; here both sides are
  bucketized on ``floor(v / width)`` (intervals explode to every bucket
  they overlap via a JVM ``sequence``), the join is a plain shuffle hash
  equi-join on the bucket id, and the exact BETWEEN predicate refines.
  Bucket width defaults to the average interval span (sampled from the
  interval side, which is the small one), so each interval lands in O(1)
  buckets and each fact in exactly one — candidate inflation is bounded.
* ``asof_join`` — for every left row, the most recent right row with
  ``right.ts <= left.ts`` per key: the classic point-in-time join.  Spark
  has no native ASOF; the distributed expression is union-and-carry-
  forward: tag both sides, union, and carry the right side's payload
  forward with ``last(ignorenulls) over (partition by key order by ts,
  tag rows unbounded preceding)`` — ONE shuffle on the key, no per-row
  Python, no driver loops.  DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(facts: DataFrame, intervals: DataFrame,
               value_col: str, lo_col: str = "lo", hi_col: str = "hi",
               bucket_width: float | None = None,
               how: str = "inner") -> DataFrame:
    """facts rows + interval columns where lo <= value <= hi (inner).

    ``intervals`` is the small side (a dimension of bands/windows); it is
    exploded to one row per covered bucket and broadcast when Spark deems
    it small enough — the fact table never shuffles on a theta condition.
    """
    if bucket_width is None:
        row = intervals.agg(
            F.avg(F.col(hi_col) - F.col(lo_col)).alias("w")).first()
        bucket_width = float(row["w"]) if row["w"] else 1.0
        bucket_width = max(bucket_width, 1e-9)
    w = float(bucket_width)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col(lo_col) / w).cast("bigint"),
                             F.floor(F.col(hi_col) / w).cast("bigint"))))
    fx = facts.withColumn("_bucket",
                          F.floor(F.col(value_col) / w).cast("bigint"))
    joined = (fx.join(F.broadcast(iv), "_bucket", how)
              .filter(F.col(value_col).between(F.col(lo_col), F.col(hi_col)))
              .drop("_bucket"))
    return joined


def asof_join(left: DataFrame, right: DataFrame,
              on: str = "ts", by: str | None = None,
              right_cols: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """For each left row: the latest right row with ``right.on <= left.on``
    (per ``by`` key when given).  Right rows with no earlier match yield
    nulls (left rows always survive).

    Physical shape: union(left-tagged, right-tagged) -> ONE window over
    (by, on, tag) carrying the right payload forward -> filter back to left
    rows.  Ties on ``on`` resolve to the right row (tag orders right rows
    first at equal timestamps), matching ASOF <= semantics.
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, by)]
    lcols = left.columns
    l_tag = left.withColumn("_tag", F.lit(1))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"{c}{suffix}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    r_tag = right.select(
        *([F.col(by)] if by else []),
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("_tag", F.lit(0))
    for c in lcols:
        if c != on and c != by:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=False)
    wspec = (Window.partitionBy(*([by] if by else []))
             .orderBy(F.col(on).asc(), F.col("_tag").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    out = unioned
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}",
                             F.last(f"{c}{suffix}", ignorenulls=True)
                             .over(wspec))
    return out.filter(F.col("_tag") == 1).drop("_tag")
