#!/usr/bin/env python
"""spark-submit entrypoint: table maintenance (compaction + metadata GC).

    spark-submit --py-files geolake_spark.zip jobs/maintain.py \
        --table /path/table [--target-files 1] [--min-files 2] \
        [--keep-snapshots 2] [--dry-run]

The nightly OPTIMIZE every write-heavy table needs: every live
partition holding more than ``--min-files`` data files is rewritten to
``--target-files`` larger ones (catalog.compact_partition — count-
verified before the destructive swap, lineage metrics preserved, one
snapshot per compacted partition), then snapshot metadata older than
the newest ``--keep-snapshots`` is garbage-collected
(catalog.expire_snapshots).  ``--dry-run`` reports the plan without
touching anything.

Scale shape: the partition scan list comes from manifests (metadata),
each compaction is one partition-sized Spark job, and GC is pure
driver-side metadata — the table's other partitions are never read.
"""

from __future__ import annotations

import argparse
import glob
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--target-files", type=int, default=1)
    ap.add_argument("--min-files", type=int, default=2,
                    help="compact only partitions with more data files "
                         "than this")
    ap.add_argument("--keep-snapshots", type=int, default=2)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.session import get_spark

    table = IcebergishTable(args.table)
    plan = []
    for m in table.manifests():
        part = m["partition"]
        n = len(glob.glob(os.path.join(table.partition_path(part),
                                       "*.parquet")))
        if n > args.min_files:
            plan.append((part, n))
    summary = {"partitions_scanned": len(table.manifests()),
               "to_compact": len(plan), "compacted": 0, "rows": 0,
               "expired_snapshots": 0, "dry_run": args.dry_run}
    if args.dry_run:
        print({**summary, "plan": plan})
        return

    spark = get_spark("maintain", cores=args.cores)
    for part, _n in plan:
        info = table.compact_partition(spark, part,
                                       target_files=args.target_files)
        summary["compacted"] += 1
        summary["rows"] += info["rows"]
    gc = table.expire_snapshots(keep_last=args.keep_snapshots)
    summary["expired_snapshots"] = gc["removed_snapshots"]
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
