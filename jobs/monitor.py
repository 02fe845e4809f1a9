#!/usr/bin/env python
"""spark-submit entrypoint: streaming CUSUM drift monitor.

    spark-submit --py-files geolake_spark.zip jobs/monitor.py \
        --events /path/drop_dir --output /path/alarms \
        --checkpoint /path/ckpt --target-cents 1000 \
        [--slack-cents 200] [--threshold-cents 5000] \
        [--max-files-per-trigger 4]

Watches a parquet drop directory of event files and maintains the
per-entity two-sided CUSUM statistics
(streaming/stateful.streaming_cusum) across micro-batches AND across
job restarts: the run uses trigger(availableNow) so each invocation
drains whatever files are new since the last run and exits — the
stream checkpoint persists both the file-source progress (already-seen
files are never reprocessed) and the applyInPandasWithState per-entity
state (the statistics CONTINUE, they don't restart).  Cron-driving
this job gives a production drift monitor with exactly-once ingest and
durable state, no always-on cluster.

Output: each micro-batch appends each touched entity's running summary
``(entity, n_obs, max_hi, max_lo, n_alarms, first_alarm_id)`` to the
output directory (foreachBatch append — parquet cannot upsert);
readers take the row with the highest n_obs per entity, which equals
the batch operator on all rows seen so far (the tested parity
contract).

Scale shape: state is seven scalars per entity sharded by entity hash;
each micro-batch is one shuffle; output volume is touched-entities
rows per batch, never event rows.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True,
                    help="parquet drop directory (event files appear "
                         "over time)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--target-cents", type=int, required=True)
    ap.add_argument("--slack-cents", type=int, default=0)
    ap.add_argument("--threshold-cents", type=int, default=5000)
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geolake_spark.session import get_spark
    from geolake_spark.streaming.stateful import streaming_cusum

    spark = get_spark("monitor", cores=args.cores)
    schema = spark.read.parquet(args.events).schema  # metadata-only
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", args.max_files_per_trigger)
              .parquet(args.events))
    out = streaming_cusum(stream, target_cents=args.target_cents,
                          slack_cents=args.slack_cents,
                          threshold_cents=args.threshold_cents)

    def write_batch(df, _epoch):
        df.write.mode("append").parquet(args.output)

    q = (out.writeStream.foreachBatch(write_batch)
         .outputMode("update")
         .option("checkpointLocation", args.checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    latest = spark.read.parquet(args.output)
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = Window.partitionBy("entity").orderBy(F.col("n_obs").desc())
    cur = (latest.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") == 1))
    print({"entities": cur.count(),
           "alarmed": cur.filter(F.col("n_alarms") > 0).count(),
           "rows_emitted": latest.count()})
    spark.stop()


if __name__ == "__main__":
    main()
