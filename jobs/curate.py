#!/usr/bin/env python
"""spark-submit entrypoint: curate a pages table into a training corpus.

    spark-submit --py-files geolake_spark.zip jobs/curate.py \
        --input /path/pages.parquet --table /path/corpus \
        [--langs en,de] [--scrub-pii] [--para-dedup] \
        [--min-quality 0.2] [--max-dup-trigram 0.5] \
        [--near-threshold 0.5] [--domain-cap host:1000] \
        [--sample-rate 0.1] \
        [--partition-col lang] [--resume] [--funnel]

The composed training-data pipeline (geolake_spark.pipeline.curate_pages):
language allowlist -> quality gate -> exact dedup -> MinHash near-dup keep,
then a snapshot commit partitioned by ``--partition-col`` with per-partition
lineage metrics.  --resume skips partitions already committed (checkpoint
restart, same contract as jobs/ingest.py).  --funnel adds per-stage row
counts to the summary (one extra scan per stage — audit mode, see
curate_pages docstring).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--langs", default=None,
                    help="comma-separated allowlist, e.g. en,de")
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--max-dup-trigram", type=float, default=None)
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact email/IPv4/phone spans before the gates")
    ap.add_argument("--para-dedup", action="store_true",
                    help="C4-style global paragraph dedup (sep = blank line)")
    ap.add_argument("--domain-cap", default=None, metavar="COL:N",
                    help="keep at most N docs per COL value, e.g. host:1000")
    ap.add_argument("--sample-rate", type=float, default=None,
                    help="deterministic hash-sample rate on the id column")
    ap.add_argument("--min-clf-score", type=float, default=None,
                    help="model-based quality gate threshold (CCNet-style "
                         "hashed-BoW linear classifier)")
    ap.add_argument("--clf-model", default=None, metavar="JSON",
                    help='path to {"weights": [...], "bias": b}; the '
                         "deterministic demo model when omitted")
    ap.add_argument("--max-perplexity", type=float, default=None,
                    help="CCNet-style gate: drop docs whose hashed "
                         "bigram-LM perplexity (model fit on the input "
                         "corpus itself) exceeds this")
    ap.add_argument("--near-threshold", type=float, default=0.5)
    ap.add_argument("--no-near-dedup", action="store_true")
    ap.add_argument("--partition-col", default="lang")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--funnel", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from geolake_spark.catalog import IcebergishTable
    from geolake_spark.operators import dedup
    from geolake_spark.pipeline import curate_pages
    from geolake_spark.session import get_spark
    from geolake_spark.write import write_snapshot

    spark = get_spark("curate", cores=args.cores)
    pages = spark.read.parquet(args.input)
    id_col = "url" if "url" in pages.columns else "doc_id"
    funnel: dict | None = {} if args.funnel else None
    dcap = None
    if args.domain_cap:
        col, n = args.domain_cap.rsplit(":", 1)
        dcap = (col, int(n))
    clf = None
    if args.min_clf_score is not None:
        from geolake_spark.functions import text as tx
        if args.clf_model:
            with open(args.clf_model) as fh:
                model = json.load(fh)
            clf = (model["weights"], float(model.get("bias", 0.0)),
                   args.min_clf_score)
        else:
            clf = (tx.demo_classifier_weights(4096), 0.0,
                   args.min_clf_score)
    lm_gate = None
    if args.max_perplexity is not None:
        from geolake_spark.operators import curation
        c1, c2 = curation.lm_fit(pages)
        lm_gate = (c1, c2, args.max_perplexity)
    kept = curate_pages(
        pages, id_col=id_col,
        langs=args.langs.split(",") if args.langs else None,
        scrub_pii=args.scrub_pii,
        paragraph_sep="\n\n" if args.para_dedup else None,
        min_quality=args.min_quality,
        max_dup_trigram=args.max_dup_trigram,
        classifier=clf,
        lm_gate=lm_gate,
        near_threshold=None if args.no_near_dedup else args.near_threshold,
        domain_cap=dcap,
        sample_rate=args.sample_rate,
        funnel=funnel)
    info = write_snapshot(kept, IcebergishTable(args.table),
                          [args.partition_col], resume=args.resume)
    dedup.release_caches()
    if funnel is not None:
        info = {**info, "funnel": funnel}
    print(json.dumps(info))
    spark.stop()


if __name__ == "__main__":
    main()
