"""Custom stateful streaming ops: state persists across micro-batches."""

import pytest
from pyspark.sql import functions as F

from geolake_spark.streaming import ingest, stateful


def _start(df, out, ckpt):
    return (df.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start())


def test_host_stats_accumulate_across_batches(spark, pages, tmp_path):
    drop = str(tmp_path / "drop")
    pages.repartition(4).write.parquet(drop)  # 4 files -> multiple batches
    stream = ingest.read_pages_stream(spark, drop, max_files_per_trigger=1)
    stats = stateful.host_crawl_stats(stream)
    q = (stats.writeStream.format("memory").queryName("hstats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = (spark.sql("select host, max(pages) as pages from hstats group by host")
           .toPandas().set_index("host")["pages"].to_dict())
    exp = (pages.withColumn("host", F.regexp_extract("url", r"https?://([^/]+)/", 1))
           .groupBy("host").count().toPandas().set_index("host")["count"].to_dict())
    assert got == exp  # final state equals the batch answer per host


def test_streaming_dedup_drops_cross_batch_repeats(spark, pages, tmp_path):
    drop = str(tmp_path / "drop")
    half = pages.limit(150)
    half.write.parquet(drop)                      # batch 1
    half.write.mode("append").parquet(drop)       # batch 2 = exact repeats
    stream = ingest.read_pages_stream(spark, drop, max_files_per_trigger=1)
    deduped = stateful.streaming_exact_dedup(stream)
    q = _start(deduped, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "out"))
    n_unique = half.select("text").distinct().count()
    assert out.select("fp").distinct().count() == n_unique
    assert out.count() == n_unique  # repeats dropped, incl. across batches
