#!/usr/bin/env python
"""spark-submit entrypoint: ingest pages into an Iceberg-style table.

    spark-submit --py-files geolake_spark.zip jobs/ingest.py \
        --input /path/pages.parquet --table /path/table \
        [--partition-col lang] [--resume]

Reads raw pages, derives the geo column stack (packed cells res 5-9, S2,
tile z/x/y), re-extracts text and verifies the byte-identical invariant,
then commits a snapshot with per-partition lineage metrics.  --resume skips
partitions already committed (checkpoint restart).
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--partition-col", default="lang")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.functions import geo
    from geolake_spark.functions.text import extract_text_udf
    from geolake_spark.session import get_spark
    from geolake_spark.write import write_snapshot

    spark = get_spark("ingest", cores=args.cores)
    pages = spark.read.parquet(args.input)
    enriched = geo.with_geo_columns(pages)
    if "html" in pages.columns and "text" in pages.columns:
        bad = (enriched.withColumn("_t2", extract_text_udf(F.col("html")))
               .filter(F.col("_t2") != F.col("text")).count())
        if bad:
            raise SystemExit(f"text invariant violated on {bad} rows")
    info = write_snapshot(enriched, IcebergishTable(args.table),
                          [args.partition_col], resume=args.resume)
    print(info)
    spark.stop()


if __name__ == "__main__":
    main()
