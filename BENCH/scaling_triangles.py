"""Triangle-counting scaling evidence (north rule: same job at two
parallelism levels, throughput + efficiency).

Synthetic power-law-ish graph generated IN the job (spark.range +
double-mod arithmetic, no disk I/O in the timed region beyond the
shuffle): ~N_EDGES edges over N_NODES nodes.  Runs triangle_counts
end-to-end (orientation, wedge stream, close join, per-node credit)
and reduces to (nodes, total_triangle_credits) so the result is
asserted non-trivial.

Run SOLO (no concurrent Spark/pytest) like bench.py mandates:
    python BENCH/scaling_triangles.py
"""
import json
import os
import sys
import time

N_EDGES = 10_000_000
N_NODES = 1_000_000
LEVELS = (2, 8, 32)
RUNS = 3


def run_level(cores: int) -> tuple[float, int, int]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    sys.path.insert(0, "/root/repo")
    from geolake_spark.operators.graph import triangle_counts
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"tri-scale-{cores}")
             .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("GEOLAKE_DRIVER_MEM", "24g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    best = float("inf")
    nodes = credits = 0
    for _ in range(RUNS):
        t0 = time.time()
        i = F.col("id")
        edges = spark.range(N_EDGES).select(
            ((i * i + 3 * i) % 2_000_003 % N_NODES).alias("src"),
            ((i * i * 5 + i * 13 + 7) % 2_000_029 % N_NODES).alias("dst"))
        out = triangle_counts(edges)
        row = out.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("triangles").alias("c")).collect()[0]
        dt = time.time() - t0
        nodes, credits = int(row["n"]), int(row["c"] or 0)
        assert nodes > 0 and credits > 0, "trivial result — invalid run"
        best = min(best, dt)
    spark.stop()
    return best, nodes, credits


def main():
    times = {}
    nodes = credits = 0
    for c in LEVELS:
        t, nodes, credits = run_level(c)
        times[f"local[{c}]"] = round(t, 3)
        print(f"local[{c}]: {t:.1f}s", flush=True)
    eff_2_8 = times["local[2]"] / (times["local[8]"] * 4)
    eff_8_32 = times["local[8]"] / (times["local[32]"] * 4)
    out = {
        "metric": "triangle_count_scaling_N_to_4N",
        "value": round(eff_2_8, 3),
        "unit": "ratio",
        "queries": times,
        "sf": f"{N_EDGES} edges x {N_NODES} nodes",
        "efficiency": {"2_to_8": round(eff_2_8, 3),
                       "8_to_32": round(eff_8_32, 3)},
        "edges_per_sec": {str(c): round(N_EDGES / times[f"local[{c}]"], 1)
                          for c in LEVELS},
        "nodes": nodes,
        "triangle_credits": credits,
        "note": ("degree-ordered triangle counting end-to-end "
                 "(orient, wedge stream, close join, per-node credit); "
                 "result asserted non-trivial each run; best-of-3 per "
                 "level, generated in-job (no input I/O)."),
    }
    with open("/root/repo/BENCH/scaling_triangles_r05.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
