"""Snapshot-committed, resumable partitioned writes.

``write_snapshot`` is the engine's sink: partition the DataFrame, write each
planned partition's parquet under the Iceberg-style layout, record a manifest
(row count + cell histogram) per partition, commit atomically.  On restart,
``resume=True`` anti-joins the planned partitions against the committed ones
and writes only the remainder (BASELINE.json "resumable from Iceberg-snapshot
checkpoints"; reference analogue: request state machine
/root/reference/datastore/dbmanager/dbmanager.py:42-49,102-132).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geolake_spark.catalog import IcebergishTable
from geolake_spark.metrics import partition_metrics


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   n_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table for shuffle-free co-located joins.

    Two tables bucketed by the same key/count join with NO Exchange on
    either side (verified by plan in tests) — the 100TB answer to repeated
    big-x-big joins on a stable key (e.g. pages and link-graph edges both
    bucketed by url hash): the shuffle is paid once at write time, every
    downstream join reads co-located buckets.  At cluster scale pick
    n_buckets ~= 2-4x total executor cores.
    """
    (df.write.mode(mode)
     .bucketBy(n_buckets, *bucket_cols)
     .sortBy(*(sort_cols or bucket_cols))
     .format("parquet")
     .saveAsTable(table_name))


def write_snapshot(df: DataFrame, table: IcebergishTable,
                   partition_cols: list[str],
                   resume: bool = False,
                   lat_col: str = "lat", lon_col: str = "lon",
                   repartition: bool = True,
                   target_file_mb: int | None = None) -> dict:
    """Write df into the table, one snapshot. Returns a summary dict.

    The whole write is ONE distributed job (partitionBy write) plus ONE
    metrics aggregation — planned/committed partition reconciliation happens
    on partition *values* (metadata), never on data rows.

    ``repartition=False`` preserves the incoming partitioning/ordering —
    layout.zorder_write pre-arranges rows by (partition, z-value) and a
    hash repartition here would scramble that clustering.

    ``target_file_mb`` sizes output files UP FRONT (the small-files
    problem is cheaper to prevent than to compact away): the plan-stats
    estimate (metadata-only, plans/estimate.py) picks the shuffle
    fan-out so each task writes ~one target-sized file per table
    partition it holds.  Plan stats over-estimate vs parquet encoding
    (they reflect in-memory row width), so files land under the target
    — the bound that matters.  Mutually exclusive with
    ``repartition=False``.
    """
    if not os.path.exists(os.path.join(table.meta_dir, "table-spec.json")):
        table.init(df.schema.json(), partition_cols)

    committed = table.committed_partitions() if resume else []
    skip_keys = {tuple(p[c] for c in partition_cols) for p in committed}

    work = df
    if skip_keys:
        # metadata-level anti-join as TYPED null-safe equality literals (the
        # committed JSON round-trips bool/int/float/str/null exactly, while
        # the earlier string-key compare broke on Python-vs-Spark renderings
        # — 'True' vs 'true' — and a null made the ~isin predicate null,
        # silently dropping the rows).  exceptAll/left_anti against a lifted
        # partition DF would shuffle the fact table; a literal predicate
        # prunes at the scan.  Partition counts are metadata-bounded.
        import functools
        import operator
        def match(key: tuple):
            return functools.reduce(operator.and_, [
                F.col(c).eqNullSafe(F.lit(v))
                for c, v in zip(partition_cols, key)])
        any_committed = functools.reduce(operator.or_,
                                         [match(k) for k in skip_keys])
        work = work.filter(~any_committed)

    planned = [r.asDict() for r in
               work.select(*partition_cols).distinct().collect()]
    if not planned:
        return {"snapshot_id": table.current_snapshot_id(),
                "written_partitions": 0, "skipped_partitions": len(skip_keys)}

    if target_file_mb is not None:
        assert repartition, "target_file_mb needs the repartition path"
        from geolake_spark.plans.estimate import estimate_df_bytes
        est = estimate_df_bytes(work)
        n_files = max(1, min(int(est // (target_file_mb * 1024 * 1024)) + 1,
                             100_000))
        # salt beyond the partition key so one table partition can span
        # several tasks/files instead of one giant file per partition
        laid_out = work.repartition(
            n_files, *[F.col(c) for c in partition_cols],
            F.spark_partition_id())
    elif repartition:
        laid_out = work.repartition(*[F.col(c) for c in partition_cols])
    else:
        laid_out = work
    (laid_out
     .write.mode("overwrite")
     .partitionBy(*partition_cols)
     .option("partitionOverwriteMode", "dynamic")
     .parquet(table.data_dir))

    # lineage metrics from the files just written (column-pruned scan of the
    # new partitions only): avoids re-running the whole upstream pipeline a
    # second time (pandas-UDF enrichment is expensive) and doubles as a
    # read-back validation of the write.
    spark = df.sparkSession
    back = spark.read.option("basePath", table.data_dir).parquet(
        *[table.partition_path(p) for p in planned])
    metrics = partition_metrics(back, partition_cols, lat_col, lon_col)
    for m in metrics:
        m["byte_size"] = _dir_bytes(table.partition_path(m["partition"]))
    snap_id = table.commit(metrics)
    return {"snapshot_id": snap_id, "written_partitions": len(metrics),
            "skipped_partitions": len(skip_keys),
            "rows": sum(m["row_count"] for m in metrics)}


def merge_snapshot(updates: DataFrame, table: IcebergishTable,
                   key_cols: list[str],
                   deletes: DataFrame | None = None) -> dict:
    """Copy-on-write MERGE (Iceberg/Delta ``MERGE INTO`` analogue): upsert
    ``updates`` by ``key_cols`` and optionally remove ``deletes`` keys,
    rewriting ONLY the table partitions the touched keys live in.

    Semantics (one new snapshot):

    * a current row whose key matches an update row is REPLACED,
    * an update row with an unseen key is INSERTED,
    * a current row whose key is in ``deletes`` (key_cols + partition
      cols) is REMOVED,
    * every row in an untouched partition is untouched — its files and
      manifests carry over to the new snapshot verbatim.

    Scale shape: the affected-partition set comes from a distinct on the
    partition columns (metadata-sized collect); the current-state read is
    MANIFEST-PRUNED to those partitions, so a 10-partition merge against
    a 100k-partition table scans 10 partitions; the anti-join runs over
    that slice only, with the updates side broadcastable when small.
    This is exactly the copy-on-write granularity trade Iceberg v1 makes
    (file-level there, partition-level here — our manifest unit).

    Contract: a key's partition values must not change across merges
    (standard CoW-merge constraint — a moved key must be deleted from
    its old partition explicitly via ``deletes``).  A key present in
    BOTH ``updates`` and ``deletes`` resolves update-wins (the old row
    is removed, the update row lands) — matched-delete-then-insert, the
    upsert reading of that conflict.

    Reference analogue: none — geolake's sink is append/overwrite only
    (executor writes whole products); MERGE extends the lakehouse
    surface (SURVEY §2 S9-S11) the way engines users expect.
    """
    spark = updates.sparkSession
    part_cols = table.table_spec()["partition_cols"]
    touched = updates.select(*part_cols)
    if deletes is not None:
        touched = touched.unionByName(deletes.select(*part_cols))
    affected = {tuple(r[c] for c in part_cols)
                for r in touched.distinct().collect()}
    live = {tuple(m["partition"][c] for c in part_cols)
            for m in table.manifests()}
    hit = affected & live

    merged = updates
    if hit:
        current = table.read(
            spark, partition_filter=lambda p:
            tuple(p[c] for c in part_cols) in hit)
        keys = updates.select(*key_cols)
        if deletes is not None:
            keys = keys.unionByName(deletes.select(*key_cols))
        survivors = current.join(keys.distinct(), key_cols, "left_anti")
        merged = survivors.unionByName(updates.select(*current.columns))
        # materialization barrier: the dynamic overwrite below replaces the
        # very files `merged` lazily reads — without a barrier Spark deletes
        # its own input mid-job (FAILED_READ_FILE).  Iceberg's CoW avoids
        # this by writing fresh files and swapping manifests; our in-place
        # partition overwrite needs the affected slice pinned first (slice-
        # sized, not table-sized — bounded by the partitions being merged).
        merged = merged.localCheckpoint(eager=True)
    n_deleted = 0
    if deletes is not None:
        n_deleted = (table.read(spark, partition_filter=lambda p:
                                tuple(p[c] for c in part_cols) in hit)
                     .join(deletes.select(*key_cols).distinct(),
                           key_cols, "left_semi").count()) if hit else 0

    out = write_snapshot(merged, table, part_cols)
    if deletes is not None and hit:
        # a partition whose rows were ALL deleted has nothing in `merged`,
        # so dynamic overwrite never touches it — drop it explicitly
        remaining = {tuple(r[c] for c in part_cols)
                     for r in merged.select(*part_cols).distinct().collect()}
        emptied = [dict(zip(part_cols, k)) for k in sorted(hit - remaining)]
        if emptied:
            out["snapshot_id"] = table.drop_partitions(emptied)
            out["dropped_partitions"] = len(emptied)
    out["merged_partitions"] = len(affected)
    out["deleted_rows"] = n_deleted
    return out
