"""Z-order data layout — multi-dimensional clustering for scan pruning
(the Delta/Iceberg ``ZORDER BY`` analogue, public technique: Morton
1966 interleaved-bit space-filling curve).

Why it matters at 100 TB: parquet skips row groups/files via footer
min/max statistics, but those are only tight on the column the data
happens to be sorted by.  Sorting by the Z-value — the bit-interleave
of all clustering columns' quantized ranks — makes EVERY clustered
column's per-file range compact simultaneously, so a predicate on any
of them prunes files (tested: per-file lat x lon bbox area shrinks by
>10x vs the same data randomly laid out).

Plan shape: one range-min/max aggregation (a scalar per column), one
codegen projection for the Z-value (unrolled constant shifts, same
Morton machinery as the geohash cells), then
``repartitionByRange(z).sortWithinPartitions(z)`` — Spark's range
exchange samples, so files get balanced contiguous Z-ranges.  No UDFs,
no driver data.

Reference analogue: none (geolake delegates storage layout to the
filesystem); this extends the snapshot-commit layer (write.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .catalog import IcebergishTable
from .write import write_snapshot


def _quantize(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Rank of ``c`` in [lo, hi] on a 2**bits grid (clamped; constant
    columns land on 0)."""
    n = 1 << bits
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - F.lit(float(lo))) \
        / F.lit(float(hi - lo)) * F.lit(float(n))
    return F.least(F.greatest(F.floor(scaled), F.lit(0)),
                   F.lit(n - 1)).cast("long")


def morton_col(quantized: list[Column], bits: int) -> Column:
    """Interleave k quantized columns' bits: bit j of column i lands at
    position ``j*k + i`` (LSB first) — an unrolled OR of ``k*bits``
    constant shifts, pure whole-stage codegen."""
    k = len(quantized)
    assert k >= 1 and k * bits <= 62, "z-value must fit a bigint"
    v = F.lit(0).cast("long")
    for i, q in enumerate(quantized):
        for j in range(bits):
            v = v.bitwiseOR(F.shiftleft(
                F.shiftright(q, j).bitwiseAND(F.lit(1)), j * k + i))
    return v


def zorder_key_col(cols: list[Column], ranges: list[tuple[float, float]],
                   bits: int = 16) -> Column:
    return morton_col(
        [_quantize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)],
        bits)


def column_ranges(df: DataFrame, cols: list[str]) -> list[tuple[float, float]]:
    """One aggregation, 2*k scalars back — the only driver-side data."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [(float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"])) for c in cols]


def zorder_layout(df: DataFrame, zorder_cols: list[str], n_files: int,
                  bits: int = 16,
                  ranges: list[tuple[float, float]] | None = None) -> DataFrame:
    """Rows re-laid-out so each output partition covers a compact
    Z-range: range-exchange + in-partition sort on the Z-value, key
    dropped afterwards (it is derivable, not data)."""
    if ranges is None:
        ranges = column_ranges(df, zorder_cols)
    z = zorder_key_col([F.col(c) for c in zorder_cols], ranges, bits)
    return (df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z"))


def zorder_write(df: DataFrame, table: IcebergishTable,
                 partition_cols: list[str], zorder_cols: list[str],
                 total_files: int = 32, bits: int = 16,
                 resume: bool = False) -> dict:
    """Snapshot-committed write with Z-ordered file layout inside each
    table partition: range-exchange on ``(partition_cols..., z)`` so a
    task's rows share a dir-partition AND a compact Z-range, then a
    layout-preserving commit (``repartition=False`` — the default hash
    repartition would scramble the clustering)."""
    ranges = column_ranges(df, zorder_cols)
    z = zorder_key_col([F.col(c) for c in zorder_cols], ranges, bits)
    clustered = (df.withColumn("_z", z)
                 .repartitionByRange(total_files,
                                     *[F.col(c) for c in partition_cols],
                                     F.col("_z"))
                 .sortWithinPartitions(*partition_cols, "_z")
                 .drop("_z"))
    return write_snapshot(clustered, table, partition_cols, resume=resume,
                          repartition=False)
