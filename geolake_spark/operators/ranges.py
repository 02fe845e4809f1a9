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
               how: str = "inner",
               max_buckets_per_interval: int = 1024,
               broadcast_rows: int = 1_000_000) -> DataFrame:
    """facts rows + interval columns where lo <= value <= hi.

    ``intervals`` is the small side (a dimension of bands/windows),
    exploded to one row per covered bucket — the fact table never shuffles
    on a theta condition.  ``how`` may be ``inner`` or ``left`` (the exact
    BETWEEN predicate lives in the JOIN CONDITION, so unmatched left facts
    survive with null interval columns); right/full are rejected because an
    interval's per-bucket explode rows would each surface as a separate
    unmatched row.  One pathologically wide interval cannot explode
    unboundedly: the bucket width is floored at
    ``max_span / max_buckets_per_interval``.  The exploded interval side is
    broadcast only while its estimated row count stays under
    ``broadcast_rows``; above that it falls back to a shuffle hash join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r} — "
            "right/outer would emit one unmatched row PER EXPLODED BUCKET "
            "of an interval")
    stats = intervals.agg(
        F.count("*").alias("n"),
        F.avg(F.col(hi_col) - F.col(lo_col)).alias("avg_w"),
        F.max(F.col(hi_col) - F.col(lo_col)).alias("max_w")).first()
    n_iv = int(stats["n"] or 0)
    avg_w = float(stats["avg_w"]) if stats["avg_w"] is not None else 1.0
    max_w = float(stats["max_w"]) if stats["max_w"] is not None else 0.0
    if bucket_width is None:
        bucket_width = avg_w or 1.0
    w = max(float(bucket_width), max_w / max_buckets_per_interval, 1e-9)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col(lo_col) / w).cast("bigint"),
                             F.floor(F.col(hi_col) / w).cast("bigint"))))
    est_exploded = n_iv * (avg_w / w + 2.0)
    if est_exploded <= broadcast_rows:
        iv = F.broadcast(iv)
    fxa = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / w).cast("bigint")).alias("_f")
    iva = iv.alias("_i")
    cond = ((F.col("_f._bucket") == F.col("_i._bucket"))
            & F.col(f"_f.{value_col}").between(F.col(f"_i.{lo_col}"),
                                               F.col(f"_i.{hi_col}")))
    return (fxa.join(iva, cond, how)
            .select(*[F.col(f"_f.{c}") for c in facts.columns],
                    *[F.col(f"_i.{c}") for c in intervals.columns]))


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
    first at equal timestamps), matching ASOF <= semantics.  When the right
    side has duplicate (by, on) rows the winner is the row with the
    greatest payload tuple (the window orders right rows by their payload
    columns too) — deterministic per run, unlike pandas merge_asof's
    "last input row" which has no distributed analogue.
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, by)]
    clash = [c for c in right_cols if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(
            f"left already has column(s) {[f'{c}{suffix}' for c in clash]} "
            f"— pass a different suffix")
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
    # payload columns as tiebreakers: duplicate-(by, on) right rows would
    # otherwise resolve arbitrarily per run (asc + carry-forward-last means
    # the greatest payload tuple wins; left rows sort after right at equal
    # ts via _tag, and their null payloads sort first, never winning a tie)
    wspec = (Window.partitionBy(*([by] if by else []))
             .orderBy(F.col(on).asc(), F.col("_tag").asc(),
                      *[F.col(f"{c}{suffix}").asc_nulls_first()
                        for c in right_cols])
             .rowsBetween(Window.unboundedPreceding, 0))
    out = unioned
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}",
                             F.last(f"{c}{suffix}", ignorenulls=True)
                             .over(wspec))
    return out.filter(F.col("_tag") == 1).drop("_tag")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          lo_col: str = "lo", hi_col: str = "hi",
                          bucket_width: float | None = None,
                          max_buckets_per_interval: int = 1024
                          ) -> DataFrame:
    """Interval x interval overlap join (session-vs-campaign windows,
    downtime-vs-deploy ranges): left and right rows where
    ``[lo, hi]`` ranges intersect (closed ends, touching counts).
    Both sides carry ``lo_col``/``hi_col``; other column names must not
    collide (rename upstream — the range_join contract).

    Scale shape: both sides explode to their covered width-``w``
    buckets and meet in a plain hash equi-join — never a theta join.
    A pair overlapping many buckets is emitted EXACTLY ONCE without
    any distinct shuffle: the join keeps only the bucket that OWNS the
    overlap start (``bucket == floor(max(lo_l, lo_r) / w)``) — that
    bucket exists on both sides by construction, every other shared
    bucket is dropped by the predicate.  Width defaults to the right
    side's average span (floored so one pathological interval explodes
    into at most ``max_buckets_per_interval`` rows)."""
    stats = right.agg(
        F.avg(F.col(hi_col) - F.col(lo_col)).alias("avg_w"),
        F.max(F.col(hi_col) - F.col(lo_col)).alias("max_w")).first()
    avg_w = float(stats["avg_w"]) if stats["avg_w"] is not None else 1.0
    max_w = float(stats["max_w"]) if stats["max_w"] is not None else 0.0
    if bucket_width is None:
        bucket_width = avg_w or 1.0
    w = max(float(bucket_width), max_w / max_buckets_per_interval, 1e-9)

    def cover(df):
        return df.withColumn(
            "_bucket",
            F.explode(F.sequence(
                F.floor(F.col(lo_col) / w).cast("bigint"),
                F.floor(F.col(hi_col) / w).cast("bigint"))))

    la = cover(left).alias("_l")
    ra = cover(right).alias("_r")
    llo, lhi = F.col(f"_l.{lo_col}"), F.col(f"_l.{hi_col}")
    rlo, rhi = F.col(f"_r.{lo_col}"), F.col(f"_r.{hi_col}")
    owner = F.floor(F.greatest(llo, rlo) / w).cast("bigint")
    cond = ((F.col("_l._bucket") == F.col("_r._bucket"))
            & (llo <= rhi) & (rlo <= lhi)
            & (F.col("_l._bucket") == owner))
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c not in (lo_col, hi_col)]
    return (la.join(ra, cond)
            .select(*[F.col(f"_l.{c}") for c in lcols],
                    *[F.col(f"_r.{c}") for c in rcols]))


def interval_overlap_join_sql(left_sql: str, right_sql: str,
                              lo_col: str = "lo", hi_col: str = "hi",
                              right_cols: str = "*") -> str:
    """DuckDB mirror of :func:`interval_overlap_join` — the plain
    theta join (the semantics, not the plan).  ``right_cols`` names
    the right side's non-range columns to emit."""
    return f"""
SELECT l.*, {right_cols}
FROM ({left_sql}) l JOIN ({right_sql}) r
  ON l.{lo_col} <= r.{hi_col} AND r.{lo_col} <= l.{hi_col}"""
