#!/usr/bin/env python
"""spark-submit entrypoint: sequence-packing plan for a curated corpus.

    spark-submit --py-files geolake_spark.zip jobs/pack.py \
        --input /path/corpus.parquet --table /path/packing \
        [--seq-len 2048] [--shards 32] [--resume]

Computes the GPT-style packing span layout (geolake_spark.operators.
curation.pack_sequences) over the corpus token counts and commits it
partitioned by shard through the snapshot layer — the deterministic
recipe means a resumed run reproduces the identical plan, so --resume
skips committed shards safely."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.functions import text as tx
    from geolake_spark.operators import curation
    from geolake_spark.session import get_spark
    from geolake_spark.write import write_snapshot

    spark = get_spark("pack", cores=args.cores)
    docs = spark.read.parquet(args.input)
    if "doc_id" not in docs.columns:
        # pages tables key on url: derive a stable numeric id (the span
        # plan needs a total order; xxhash64 is fixed-seed deterministic)
        docs = docs.withColumn("doc_id", F.xxhash64("url"))
    counted = docs.select(
        "doc_id", tx.token_count_col(F.col("text")).alias("n_tokens"))
    plan = curation.pack_sequences(counted, seq_len=args.seq_len,
                                   n_shards=args.shards)
    info = write_snapshot(plan, IcebergishTable(args.table), ["shard"],
                          resume=args.resume)
    total = plan.agg(
        F.sum("n_tokens").alias("tokens"),
        (F.max(F.col("seq_last")) + 1).alias("max_seqs_per_shard")).first()
    info = {**info, "total_tokens": int(total["tokens"] or 0),
            "seq_len": args.seq_len, "shards": args.shards}
    print(json.dumps(info))
    spark.stop()


if __name__ == "__main__":
    main()
