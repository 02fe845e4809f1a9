#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT a replacement for bench.py (which is frozen for measurement): this
file exists so individual queries can be timed with the noop sink,
re-run quickly after a change, and have their ``explain("formatted")``
plans captured to ``plans/rNN/<query>_<suffix>.txt`` for the plan-diff
evidence the round writeup cites.

Usage:
  python bench_extra.py --queries pip_tiles,text_pipeline --runs 3
  python bench_extra.py --queries dedup_e2e --explain-dir plans/r06 \
      --suffix before
  python bench_extra.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

DATA_ROOT = "/root/repo/data"
PAGES_SF = "1"


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


class Suite:
    """Each query method returns either a DataFrame (timed via noop and
    explainable) or a callable (timed as-is, no plan capture)."""

    def __init__(self, spark):
        self.spark = spark
        self._pages_small = None
        self._uni = None

    # ---- shared corpora (built once, outside the timed region) ----
    @property
    def pages_small(self):
        if self._pages_small is None:
            from geolake_spark.sources import synth
            paths = synth.ensure_local_tables(DATA_ROOT, PAGES_SF)
            self._pages_small = self.spark.read.parquet(paths["pages"])
        return self._pages_small

    @property
    def uni(self):
        if self._uni is None:
            from geolake_spark.sources import synth
            p = synth.ensure_docs_multiscript(
                DATA_ROOT, synth.SF_ROWS[PAGES_SF])
            self._uni = self.spark.read.parquet(p)
        return self._uni

    def _dedup_corpus(self):
        base = self.pages_small.selectExpr("url as doc_id", "text")
        planted = (base.filter(F.crc32(F.col("doc_id")) % 25 == 0)
                   .selectExpr("concat(doc_id, '#dup') as doc_id",
                               "concat(text, ' near dup tail') as text"))
        return base.unionByName(planted)

    # ---- headline queries (mirrors bench.py's definitions) ----
    def q_pip_tiles(self):
        import bench
        df, _ = bench.build_flagship(self.spark, n_passes=1)
        return df

    def q_cell_hist(self):
        import bench
        from geolake_spark.functions.geo import grid_cell_col
        pages, _ = bench._scale_table(self.spark, 1)
        return (pages.withColumn(
            "c", grid_cell_col(F.col("lat"), F.col("lon"), 7))
            .groupBy("c").count())

    def q_knn(self):
        import pyarrow.parquet as pq
        from geolake_spark.operators import joins
        from geolake_spark.sources import synth
        paths = synth.ensure_local_tables(DATA_ROOT, "4")
        pages4 = self.spark.read.parquet(paths["pages"])
        probes = (pq.read_table(paths["query_points"]).to_pandas()
                  [["query_id", "lat", "lon"]])
        return joins.knn_join(pages4, probes, k=10, res=6)

    def q_text_pipeline(self):
        from geolake_spark.functions import text as tx
        return (self.pages_small.select(
            tx.token_count_col(F.col("text")).alias("nt"),
            tx.lang_id_col(F.col("text")).alias("lg"),
            tx.fingerprint_col(F.col("text")).alias("fp"))
            .groupBy("lg").agg(F.count("*"), F.avg("nt"),
                               F.approx_count_distinct("fp")))

    def q_lang_id_only(self):
        from geolake_spark.functions import text as tx
        return (self.pages_small.select(
            tx.lang_id_col(F.col("text")).alias("lg"))
            .groupBy("lg").count())

    def q_minhash_sigs(self):
        from geolake_spark.functions import sim
        sig = sim.make_signature_udf(num_perm=64)
        return (self.pages_small.select(sig(F.col("text")).alias("s"))
                .select("s.minhash", "s.simhash"))

    def q_minhash_sigs_uni(self):
        from geolake_spark.functions import sim
        sig = sim.make_signature_udf(num_perm=64)
        return (self.uni.select(sig(F.col("text")).alias("s"))
                .select("s.minhash", "s.simhash"))

    def q_dedup_e2e(self):
        from geolake_spark.operators import dedup
        corpus = self._dedup_corpus()

        def run():
            pairs = dedup.minhash_lsh_pairs(corpus, threshold=0.5)
            n = pairs.count()
            dedup.release_caches()
            return n
        return run

    def q_dedup_pairs_df(self):
        # plan-capture variant of dedup_e2e (DataFrame, not timed loop)
        from geolake_spark.operators import dedup
        return dedup.minhash_lsh_pairs(self._dedup_corpus(), threshold=0.5)

    def q_para_dedup(self):
        from geolake_spark.operators import curation
        uni = self.uni
        did = F.col("doc_id").cast("string")
        para_corpus = uni.select(
            "doc_id",
            F.concat_ws(
                "\n\n",
                F.substring(F.col("text"), 1, 120),
                F.concat(F.lit("shared boilerplate paragraph "),
                         (F.col("doc_id") % 1000).cast("string")),
                F.concat(F.lit("contact user"), did,
                         F.lit("@example.com or +1 (555) 123-"),
                         F.lpad((F.col("doc_id") % 10000).cast("string"),
                                4, "0")),
                F.expr("substring(text, 121)")).alias("text"))
        return curation.paragraph_dedup(para_corpus)

    def q_link_graph(self):
        from geolake_spark.operators import links as links_op
        uni = self.uni
        lid = F.col("doc_id")
        link_corpus = uni.select(
            "doc_id",
            F.concat(F.lit("https://www.site"),
                     (lid % 9973).cast("string"),
                     F.lit(".example"), (lid % 7).cast("string"),
                     F.lit("/p/"), lid.cast("string")).alias("url"),
            F.concat(
                F.lit('<html><body><p>'),
                F.substring(F.col("text"), 1, 160),
                F.lit('</p><a href="https://site'),
                ((lid * 7 + 1) % 9973).cast("string"),
                F.lit(".example"), ((lid * 7 + 1) % 7).cast("string"),
                F.lit('.com/x?utm_source=f&b=2&a=1">s</a>'),
                F.lit('<a href="/about/'), (lid % 11).cast("string"),
                F.lit('">a</a>'),
                F.when(lid % 3 == 0, F.concat(
                    F.lit('<a href="//cdn.assets'),
                    (lid % 4).cast("string"),
                    F.lit('.net/lib">c</a>'))).otherwise(F.lit("")),
                F.lit("</body></html>")).alias("html"))
        return links_op.link_graph(link_corpus, grain="domain")

    def q_crawl_audit(self):
        from geolake_spark.functions import text as tx_fn
        from geolake_spark.operators import links as links_mod
        from geolake_spark.operators import robots as robots_op
        spark = self.spark
        aid = F.col("id")
        a_host = F.concat(F.lit("www.site"), (aid % 9973).cast("string"),
                          F.lit(".example"), (aid % 7).cast("string"),
                          F.lit(".com"))
        a_m = aid % 8
        a_meta = (F.when(a_m == 0,
                         F.lit('<META NAME="robots" CONTENT="NOINDEX">'))
                  .when(a_m == 1,
                        F.lit('<meta content="index, nofollow" '
                              'name="robots">'))
                  .when(a_m == 7,
                        F.lit('<meta name="robots" content="none">'))
                  .otherwise(F.lit('<meta name="viewport" content="w">')))
        a_canon = (F.when(aid % 3 == 0, F.concat(
            F.lit('<link rel="canonical" href="/p/'),
            (aid - aid % 6).cast("string"), F.lit('">')))
            .otherwise(F.lit("")))
        audit_pages = spark.range(500_000).select(
            F.concat(F.lit("https://"), a_host, F.lit("/p/"),
                     aid.cast("string")).alias("url"),
            F.concat(F.lit("<html><head>"), a_meta, a_canon,
                     F.lit('</head><body><p>content here</p>'
                           '<a href="/x">x</a></body></html>'))
            .alias("html"))
        audit_rb = spark.range(69_811).select(
            F.concat(F.lit("www.site"), (aid % 9973).cast("string"),
                     F.lit(".example"), (aid % 7).cast("string"),
                     F.lit(".com")).alias("host"),
            F.when(aid % 2 == 0,
                   F.lit("User-agent: *\nDisallow: /p/1\nAllow: /p/12"))
            .otherwise(F.lit("User-agent: bot\nDisallow: /\n"
                             "User-agent: *\nDisallow: /*?s="))
            .alias("robots_txt"))
        pol = links_mod.crawl_policies(audit_pages)
        own = tx_fn.url_canonical_col(F.col("url"))
        keep = (pol.filter(~F.col("noindex"))
                .filter((F.col("canonical_url") == "")
                        | (F.col("canonical_url") == own)))
        return (robots_op.robots_check(keep.select("url"), audit_rb)
                .filter("allowed"))

    def q_ivf_train(self):
        from geolake_spark.operators import ann
        from geolake_spark.sources import synth
        emb_path = synth.ensure_embeddings(DATA_ROOT, 500_000)
        emb = self.spark.read.parquet(emb_path)

        def run():
            ann.kmeans_fit_distributed(emb, dim=synth.EMB_DIM,
                                       n_clusters=707, iters=2,
                                       init="sample")
        return run

    def q_ivf_query(self):
        from geolake_spark.operators import ann
        from geolake_spark.sources import synth
        emb_path = synth.ensure_embeddings(DATA_ROOT, 500_000)
        emb = self.spark.read.parquet(emb_path)
        centers = ann.kmeans_fit_distributed(emb, dim=synth.EMB_DIM,
                                             n_clusters=707, iters=2,
                                             init="sample")
        probes = (emb.filter(F.col("vec_id") % 15625 == 7)
                  .selectExpr("vec_id as probe_id",
                              "embedding as probe_vec").limit(32))

        def run():
            res = ann.ivf_topk(emb, probes, k=10, nprobe=16,
                               centers=centers)
            res.count()
        return run

    def q_pq_adc(self):
        from geolake_spark.operators import ann
        from geolake_spark.sources import synth
        emb_path = synth.ensure_embeddings(DATA_ROOT, 500_000)
        emb = self.spark.read.parquet(emb_path)
        probes = (emb.filter(F.col("vec_id") % 15625 == 7)
                  .selectExpr("vec_id as probe_id",
                              "embedding as probe_vec").limit(32))
        cb = ann.demo_pq_codebooks(dim=synth.EMB_DIM, m=16, ksub=64)

        def run():
            enc = ann.pq_encode(emb, cb)
            res = ann.pq_topk_table(enc, probes, k=10, codebooks=cb)
            res.count()
        return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="plan")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    names = [m[2:] for m in dir(Suite) if m.startswith("q_")]
    if args.list:
        print("\n".join(sorted(names)))
        return
    wanted = [q.strip() for q in args.queries.split(",") if q.strip()]
    for q in wanted:
        if q not in names:
            sys.exit(f"unknown query {q!r}; --list shows choices")

    from geolake_spark.session import get_spark
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("geolake_bench_extra", cores=cores)
    suite = Suite(spark)
    out: dict = {}
    for q in wanted:
        spark.sparkContext.setJobDescription(f"bench_extra:{q}")
        target = getattr(suite, f"q_{q}")()
        is_df = hasattr(target, "write")
        if args.explain_dir and is_df:
            os.makedirs(args.explain_dir, exist_ok=True)
            path = os.path.join(args.explain_dir,
                                f"{q}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(_explain_str(target))
            print(f"# wrote {path}", file=sys.stderr)

        def one(t=target, builder=getattr(suite, f"q_{q}"), df=is_df):
            # fresh plan per run (AQE stage-cache reuse otherwise)
            t2 = builder()
            t0 = time.time()
            if df:
                _noop(t2)
            else:
                t2()
            return time.time() - t0

        if args.runs > 0:
            for _ in range(args.warm):
                one()
            times = [one() for _ in range(args.runs)]
            out[q] = {"best": round(min(times), 3),
                      "all": [round(t, 3) for t in times]}
            print(f"# {q}: {out[q]}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
