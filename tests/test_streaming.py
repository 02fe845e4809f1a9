"""Structured Streaming ingest.

Append-mode semantics: only windows whose end <= final watermark
(max event time - delay) are finalized and emitted; the tail stays in state.
Tests therefore compare the stream output against the *finalized subset* of
the equivalent batch aggregation — that equality is the correctness claim.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from geolake_spark.functions.geo import grid_cell_col
from geolake_spark.streaming import ingest


def _batch_counts(pages):
    return (pages.withColumn("cell", grid_cell_col(F.col("lat"), F.col("lon"), 5))
            .groupBy(F.window("warc_ts", "1 hour").alias("w"), "cell")
            .agg(F.count("*").alias("page_count"))
            .select(F.col("w.start").alias("window_start"), "cell", "page_count"))


def _finalized(batch, pages, delay_hours=2):
    max_ts = pages.agg(F.max("warc_ts")).first()[0]
    wm = max_ts - datetime.timedelta(hours=delay_hours)
    return batch.filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= wm)


def test_stream_matches_batch_finalized_windows(spark, pages, tmp_path):
    drop = str(tmp_path / "drop")
    pages.repartition(3).write.parquet(drop)

    q = ingest.start_cell_count_stream(spark, drop, str(tmp_path / "out"),
                                       str(tmp_path / "ckpt"), res=5)
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "out"))
    exp = _finalized(_batch_counts(pages), pages)
    assert got.count() == exp.count()
    # value-level equality via anti-joins both ways
    assert got.join(exp, ["window_start", "cell", "page_count"],
                    "left_anti").count() == 0
    assert exp.join(got, ["window_start", "cell", "page_count"],
                    "left_anti").count() == 0


def test_stream_is_incremental(spark, pages, tmp_path):
    """restart with the same checkpoint: only new files are processed and
    the final emitted set equals the finalized batch subset."""
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half1 = pages.filter(F.month("warc_ts") <= 6)
    half2 = pages.filter(F.month("warc_ts") > 6)
    half1.write.parquet(drop)
    q = ingest.start_cell_count_stream(spark, drop, out, ckpt, res=5)
    q.awaitTermination(180)
    n1 = spark.read.parquet(out).count()
    exp1 = _finalized(_batch_counts(half1), half1).count()
    assert n1 == exp1

    half2.write.mode("append").parquet(drop)
    q2 = ingest.start_cell_count_stream(spark, drop, out, ckpt, res=5)
    q2.awaitTermination(180)
    got2 = spark.read.parquet(out)
    # all finalized windows of the full dataset are present exactly once
    exp2 = _finalized(_batch_counts(pages), pages)
    assert got2.join(exp2, ["window_start", "cell", "page_count"],
                     "left_anti").count() == 0
    assert exp2.join(got2, ["window_start", "cell", "page_count"],
                     "left_anti").count() == 0

def test_streaming_pip_join_explicit_res(spark, pages, tmp_path):
    """pip_join works on a streaming source with an explicit res (round-3
    advisor: without res it must raise instead of silently guessing a
    resolution whose cover would match nothing); results equal the batch
    join on the same data."""
    from geolake_spark.operators import joins
    from geolake_spark.sources import synth
    drop = str(tmp_path / "drop")
    pages.repartition(2).write.parquet(drop)
    stream = (spark.readStream.schema(pages.schema).parquet(drop)
              .withColumn("cell_r6",
                          grid_cell_col(F.col("lat"), F.col("lon"), 6)))
    with pytest.raises(ValueError, match="explicit res"):
        joins.pip_join(stream, synth.polygon_specs(), cell_col="cell_r6")
    out = joins.pip_join(stream, synth.polygon_specs(), res=6,
                         cell_col="cell_r6")
    q = (out.select("url", "polygon_id")
         .writeStream.format("memory").queryName("pipstream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["url"], r["polygon_id"])
           for r in spark.sql("select * from pipstream").collect()}
    exp = {(r["url"], r["polygon_id"])
           for r in joins.pip_join(pages, synth.polygon_specs(), res=6)
           .select("url", "polygon_id").collect()}
    assert got == exp and len(exp) > 0


def test_streaming_crawl_policies_equals_batch(spark, tmp_path):
    """crawl_policies is a stateless map stage — it runs unchanged on a
    streaming source and matches the batch operator row-for-row."""
    from geolake_spark.operators import links

    rows = [
        ("https://a.com/1",
         '<html><head><meta name="robots" content="noindex, follow">'
         '<link rel="canonical" href="/c"></head></html>'),
        ("https://a.com/2",
         '<html><head><meta content="index, nofollow" name="robots">'
         "</head></html>"),
        ("https://a.com/3", "<html></html>"),
    ]
    batch = spark.createDataFrame(rows, "url string, html string")
    drop = str(tmp_path / "drop")
    batch.repartition(2).write.parquet(drop)
    stream = spark.readStream.schema(batch.schema).parquet(drop)
    q = (links.crawl_policies(stream)
         .writeStream.format("memory").queryName("polstream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from polstream").collect()}
    exp = {tuple(r) for r in links.crawl_policies(batch).collect()}
    assert got == exp and len(exp) == 3


def test_streaming_ohlc_equals_batch_finalized(spark, tmp_path):
    """ohlc_bars_windowed on a stream == the batch call on the same data,
    restricted to watermark-finalized bars (incremental struct extrema)."""
    import datetime as dt

    from geolake_spark.operators import aggregates

    t0 = dt.datetime(2024, 5, 1)
    rows = [("a", t0 + dt.timedelta(minutes=7 * i + (i % 3)),
             float((i * 37) % 19) - 4.0) for i in range(120)]
    rows += [("b", t0 + dt.timedelta(minutes=11 * i), float(i % 7))
             for i in range(60)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, "
                               "value double")
    drop = str(tmp_path / "odrop")
    ev.filter(F.col("ts") < t0 + dt.timedelta(hours=5)) \
        .coalesce(1).write.mode("append").parquet(drop)
    ev.filter(F.col("ts") >= t0 + dt.timedelta(hours=5)) \
        .coalesce(1).write.mode("append").parquet(drop)

    batch = aggregates.ohlc_bars_windowed(ev, "ts", "value",
                                          ["event_type"], window="1 hour",
                                          watermark="2 hours")
    max_ts = ev.agg(F.max("ts")).first()[0]
    wm = max_ts - dt.timedelta(hours=2)
    finalized = {((r.event_type, r.bar)): (r.open, r.high, r.low, r.close,
                                           r.n_obs)
                 for r in batch.collect()
                 if r.bar + dt.timedelta(hours=1) <= wm}

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(drop))
    out = aggregates.ohlc_bars_windowed(stream, "ts", "value",
                                        ["event_type"], window="1 hour",
                                        watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("sohlc")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {((r.event_type, r.bar)): (r.open, r.high, r.low, r.close,
                                     r.n_obs)
           for r in spark.sql("select * from sohlc").collect()}
    assert got == finalized and len(finalized) > 5
