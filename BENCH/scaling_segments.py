"""Segment-intersection scaling evidence (north rule: same job at two
parallelism levels, throughput + efficiency).

Synthetic road-grid corpus generated IN the job (spark.range +
arithmetic, no input I/O): N_SEGS alternating ~0.05-deg horizontal /
vertical segments scattered over a 100x90-deg area, so proper
crossings abound but cell-blocked candidate volume stays bounded
(~few segments per res-9 cell).  Runs segment_intersections end to end
(bbox cell cover, candidate self-join, integer orientation tests) and
reduces to a crossing count asserted non-trivial.

Run SOLO (no concurrent Spark/pytest) like bench.py mandates:
    python BENCH/scaling_segments.py
"""
import json
import os
import sys
import time

N_SEGS = 20_000_000
LEVELS = (2, 8, 32)
RUNS = 3
RES = 9


def run_level(cores: int) -> tuple[float, int]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    sys.path.insert(0, "/root/repo")
    from geolake_spark.operators.spatial import segment_intersections
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"seg-scale-{cores}")
             .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("GEOLAKE_DRIVER_MEM", "24g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    best = float("inf")
    crossings = 0
    for _ in range(RUNS):
        t0 = time.time()
        i = F.col("id")
        h = (i % 2 == 0)
        x1 = F.when(h, (i * 3 % 100000) / 1000.0) \
            .otherwise((i * 11 % 100000) / 1000.0)
        y1 = F.when(h, (i * 7 % 90000) / 1000.0) \
            .otherwise((i * 13 % 90000) / 1000.0)
        segs = spark.range(N_SEGS).select(
            i.alias("seg_id"), x1.alias("x1"), y1.alias("y1"),
            F.when(h, x1 + 0.05).otherwise(x1).alias("x2"),
            F.when(h, y1).otherwise(y1 + 0.05).alias("y2"))
        out = segment_intersections(segs, res=RES)
        n = out.count()
        dt = time.time() - t0
        crossings = int(n)
        assert crossings > 0, "trivial result — invalid run"
        best = min(best, dt)
    spark.stop()
    return best, crossings


def main():
    times = {}
    crossings = 0
    for c in LEVELS:
        t, crossings = run_level(c)
        times[f"local[{c}]"] = round(t, 3)
        print(f"local[{c}]: {t:.1f}s ({crossings} crossings)", flush=True)
    eff_2_8 = times["local[2]"] / (times["local[8]"] * 4)
    eff_8_32 = times["local[8]"] / (times["local[32]"] * 4)
    out = {
        "metric": "segment_intersection_scaling_N_to_4N",
        "value": round(eff_2_8, 3),
        "unit": "ratio",
        "queries": times,
        "sf": f"{N_SEGS} segments",
        "efficiency": {"2_to_8": round(eff_2_8, 3),
                       "8_to_32": round(eff_8_32, 3)},
        "segments_per_sec": {str(c): round(N_SEGS / times[f"local[{c}]"], 1)
                             for c in LEVELS},
        "crossings": crossings,
        "note": ("exact segment-intersection join end-to-end (bbox "
                 "cell cover, candidate self-join, integer orientation "
                 "tests); result asserted non-trivial each run; "
                 "best-of-3 per level, generated in-job (no input I/O)."),
    }
    with open("/root/repo/BENCH/scaling_segments_r05.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
