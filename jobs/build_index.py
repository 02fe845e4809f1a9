#!/usr/bin/env python
"""spark-submit entrypoint: build a PQ-compressed vector index as a table.

    spark-submit --py-files geolake_spark.zip jobs/build_index.py \
        --input /path/embeddings.parquet --table /path/pq_index \
        [--m 16] [--ksub 64] [--shards 8] [--resume]

The 100 TB shape: train codebooks once on a bounded sample (driver-side,
tiny), PQ-encode the whole table in one Arrow pass, and commit the
16x-smaller (id, codes) table through the snapshot layer partitioned by
``pmod(xxhash64(id), shards)`` — the same resumable-commit recipe as the
MinHash signature table (operators/dedup.py signatures_table).  The
codebooks are persisted as JSON next to the table so a query job can
ADC-score against the committed index without retraining; encoding is
deterministic given the codebooks, so ``--resume`` after a mid-write
failure skips committed shards and reproduces the rest bit-identically.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--ksub", type=int, default=64)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--sample-rows", type=int, default=65536)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.operators import ann
    from geolake_spark.session import get_spark
    from geolake_spark.write import write_snapshot

    spark = get_spark("build_index", cores=args.cores)
    vectors = spark.read.parquet(args.input)

    codebook_path = os.path.join(args.table, "pq_codebooks.json")
    if args.resume and os.path.exists(codebook_path):
        # resuming must reuse the ORIGINAL codebooks — retraining would
        # re-encode surviving shards differently than committed ones
        with open(codebook_path) as fh:
            saved = json.load(fh)
        codebooks = np.array(saved["codebooks"], dtype=np.float64)
    else:
        codebooks = ann.pq_train(vectors, m=args.m, ksub=args.ksub,
                                 vec_col=args.vec_col,
                                 sample_rows=args.sample_rows)
        os.makedirs(args.table, exist_ok=True)
        with open(codebook_path, "w") as fh:
            json.dump({"m": int(codebooks.shape[0]),
                       "ksub": int(codebooks.shape[1]),
                       "dsub": int(codebooks.shape[2]),
                       "codebooks": codebooks.tolist()}, fh)

    encoded = (ann.pq_encode(vectors, codebooks, vec_col=args.vec_col,
                             id_col=args.id_col)
               .withColumn("shard",
                           F.pmod(F.xxhash64(args.id_col), args.shards)))
    info = write_snapshot(encoded, IcebergishTable(args.table), ["shard"],
                          resume=args.resume)
    info = {**info, "m": int(codebooks.shape[0]),
            "ksub": int(codebooks.shape[1]),
            "codebooks": codebook_path}
    print(json.dumps(info))
    spark.stop()


if __name__ == "__main__":
    main()
