#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "throughput": {...}}

--scaling mode (north rule: efficiency >= 0.8 from N to 4N executors): run
the identical flagship job (pages -> cell assign -> PIP broadcast join ->
tile rollup) at local[8] and local[32] on the same input, report pages/sec
at both plus efficiency = T32 / (4 * T8), and write BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

BENCH_PAGES_SF = "1"   # 500k synthetic pages for throughput measurements


def _pages(spark, sf: str):
    from geolake_spark.sources import synth
    paths = synth.ensure_local_tables("/root/repo/data", sf)
    return spark.read.parquet(paths["pages"])


def flagship_job(spark, pages_sf: str = BENCH_PAGES_SF) -> int:
    """The north-rule job: cell assign -> PIP broadcast join -> tile rollup.
    Returns number of input pages processed."""
    from geolake_spark.operators import joins, tiles
    from geolake_spark.sources import synth
    pages = _pages(spark, pages_sf)
    hit = joins.pip_join(pages, synth.polygon_specs(), res=7)
    rolled = tiles.rollup_tiles(hit, zoom=8)
    rolled.write.mode("overwrite").format("noop").save()
    return pages.count()


def headline_queries(spark, sf_dir: str) -> dict[str, float]:
    """Per-query wall seconds on driver testdata + synthetic pages."""
    import __spark_entry__ as entrymod
    from geolake_spark.operators import joins, tiles
    from geolake_spark.sources import synth

    pages = _pages(spark, BENCH_PAGES_SF)
    polys = synth.polygon_specs()

    def pip_tiles():
        (tiles.rollup_tiles(joins.pip_join(pages, polys, res=7), zoom=8)
         .write.mode("overwrite").format("noop").save())

    def cell_hist():
        from geolake_spark.functions.geo import grid_cell_col
        (pages.withColumn("c", grid_cell_col(F.col("lat"), F.col("lon"), 7))
         .groupBy("c").count().write.mode("overwrite").format("noop").save())

    def knn():
        import pyarrow.parquet as pq
        paths = synth.ensure_local_tables("/root/repo/data", BENCH_PAGES_SF)
        probes = (pq.read_table(paths["query_points"]).to_pandas()
                  [["query_id", "lat", "lon"]])
        joins.knn_join(pages, probes, k=10, res=6).write \
            .mode("overwrite").format("noop").save()

    def text_pipeline():
        from geolake_spark.functions import text as tx
        (pages.select(
            tx.token_count_col(F.col("text")).alias("nt"),
            tx.lang_id_col(F.col("text")).alias("lg"),
            tx.fingerprint_col(F.col("text")).alias("fp"))
         .groupBy("lg").agg(F.count("*"), F.avg("nt"),
                            F.approx_count_distinct("fp"))
         .write.mode("overwrite").format("noop").save())

    def tpch_q1():
        entrymod.q_tpch_q1(spark, sf_dir).write \
            .mode("overwrite").format("noop").save()

    def top_revenue():
        entrymod.q_top_revenue_orders(spark, sf_dir).write \
            .mode("overwrite").format("noop").save()

    def dedup_exact():
        from geolake_spark.operators import dedup
        dedup.exact_dedup(pages.selectExpr("url as doc_id", "text")) \
            .write.mode("overwrite").format("noop").save()

    jobs = {"pip_tiles": pip_tiles, "cell_hist": cell_hist, "knn": knn,
            "text_pipeline": text_pipeline, "tpch_q1": tpch_q1,
            "top_revenue": top_revenue, "dedup_exact": dedup_exact}
    timings: dict[str, float] = {}
    for name, fn in jobs.items():
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
    return timings


def run_default() -> None:
    from geolake_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("geolake_bench", cores=cores)
    _pages(spark, BENCH_PAGES_SF).count()  # warm: materialize synth + JVM
    timings = headline_queries(spark, sf_dir)
    n_pages = _pages(spark, BENCH_PAGES_SF).count()
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "throughput": {
            "pip_tile_pages_per_sec": round(n_pages / timings["pip_tiles"], 1),
            "bench_pages": n_pages,
        },
        "cores": cores,
    }
    spark.stop()
    print(json.dumps(out))


def run_scaling(runs: int = 3) -> None:
    from geolake_spark.session import get_spark
    results = {}
    n_pages = None
    for cores in (8, 32):
        times = []
        spark = get_spark(f"geolake_scaling_{cores}", cores=cores)
        n_pages = flagship_job(spark, BENCH_PAGES_SF)  # warm (JIT, page cache)
        for _ in range(runs):
            t0 = time.time()
            flagship_job(spark, BENCH_PAGES_SF)
            times.append(time.time() - t0)
        spark.stop()
        med = sorted(times)[len(times) // 2]
        results[cores] = {"median_sec": round(med, 3),
                          "pages_per_sec": round(n_pages / med, 1),
                          "all_runs_sec": [round(t, 3) for t in times]}
    eff = results[32]["pages_per_sec"] / (4 * results[8]["pages_per_sec"])
    out = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {f"local[{c}]": results[c]["median_sec"] for c in results},
        "sf": BENCH_PAGES_SF,
        "detail": results,
        "pages": n_pages,
    }
    print(json.dumps(out))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

North rule: throughput scaling efficiency >= 0.8 between N and 4N executors,
evidenced in-sandbox by the identical flagship job (synthetic pages table,
{n_pages} rows: cell assign -> PIP broadcast join over 6 polygons -> tile
rollup z8) at local[8] vs local[32], {runs} measured runs each after warmup,
median reported.

| cluster | median sec | pages/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['median_sec']} | {results[8]['pages_per_sec']} |
| local[32] (4N) | {results[32]['median_sec']} | {results[32]['pages_per_sec']} |

**Scaling efficiency = {results[32]['pages_per_sec']} / (4 x {results[8]['pages_per_sec']}) = {eff:.3f}**

All runs (sec): local[8] {results[8]['all_runs_sec']}, local[32] {results[32]['all_runs_sec']}.
""")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run the N vs 4N scaling evidence job")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    if args.scaling:
        run_scaling(args.runs)
    else:
        run_default()
