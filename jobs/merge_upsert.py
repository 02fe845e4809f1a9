#!/usr/bin/env python
"""spark-submit entrypoint: copy-on-write MERGE into an Iceberg-style table.

    spark-submit --py-files geolake_spark.zip jobs/merge_upsert.py \
        --table /path/table --updates /path/delta.parquet \
        [--deletes /path/tombstones.parquet] --key-cols url

The incremental-crawl maintenance pass: recrawled pages (same key)
replace their old rows, new pages insert, tombstones delete — and only
the table partitions the touched keys live in are rewritten (the
affected set is manifest-pruned, untouched partitions carry over
verbatim).  Deletes that empty a partition drop it atomically.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--updates", required=True)
    ap.add_argument("--deletes", default=None)
    ap.add_argument("--key-cols", default="url",
                    help="comma-separated merge key columns")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.session import get_spark
    from geolake_spark.write import merge_snapshot

    spark = get_spark("merge", cores=args.cores)
    table = IcebergishTable(args.table)
    updates = spark.read.parquet(args.updates)
    deletes = spark.read.parquet(args.deletes) if args.deletes else None
    info = merge_snapshot(updates, table,
                          key_cols=args.key_cols.split(","),
                          deletes=deletes)
    print(info)
    spark.stop()


if __name__ == "__main__":
    main()
