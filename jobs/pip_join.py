#!/usr/bin/env python
"""spark-submit entrypoint: point-in-polygon join.

    spark-submit --py-files geolake_spark.zip jobs/pip_join.py \
        --pages /path/pages.parquet --polygons /path/polygons.parquet \
        --output /path/out [--res N]

Polygons parquet needs (polygon_id, rings) per FIXTURES.md §2.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--polygons", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geolake_spark.operators import joins
    from geolake_spark.session import get_spark

    spark = get_spark("pip_join", cores=args.cores)
    pages = spark.read.parquet(args.pages)
    polys = [{"polygon_id": r["polygon_id"], "rings": r["rings"]}
             for r in spark.read.parquet(args.polygons).collect()]
    out = joins.pip_join(pages, polys, res=args.res)
    out.write.mode("overwrite").parquet(args.output)
    print({"rows": spark.read.parquet(args.output).count(),
           "polygons": len(polys)})
    spark.stop()


if __name__ == "__main__":
    main()
