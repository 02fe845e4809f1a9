"""Streaming sessionization (streaming/ingest.sessionized_counts):
finalized stream output == batch session_window subset, and batch
session_window == the trips operator's segmentation on the same gap."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from geolake_spark.operators import trips
from geolake_spark.streaming import ingest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    # parquet loads TIMESTAMP_NTZ; session_window wants TIMESTAMP —
    # session tz is UTC so the cast is exact
    return (ev.select("event_id", "user_id",
                      F.col("ts").cast("timestamp").alias("ts"))
            .cache())


def _batch_sessions(events, gap="8 hours"):
    return (events.groupBy("user_id",
                           F.session_window(F.col("ts"), gap).alias("s"))
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.min("ts").alias("start_ts"),
                 F.max("ts").alias("end_ts"))
            .select("user_id", "start_ts", "end_ts", "n_points"))


def test_stream_matches_batch_finalized(spark, events, tmp_path):
    drop = str(tmp_path / "drop")
    events.repartition(3).write.parquet(drop)
    q = ingest.start_session_stream(
        spark, drop, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        schema=events.schema, gap="8 hours", watermark="1 day")
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "out"))
    max_ts = events.agg(F.max("ts")).first()[0]
    wm = max_ts - datetime.timedelta(days=1)
    # append mode emits a session once gap past its end <= watermark
    exp = _batch_sessions(events).filter(
        F.col("end_ts") + F.expr("INTERVAL 8 HOURS") <= F.lit(wm))
    cols = ["user_id", "start_ts", "end_ts", "n_points"]
    assert got.count() == exp.count() > 0
    assert got.join(exp, cols, "left_anti").count() == 0
    assert exp.join(got, cols, "left_anti").count() == 0


def test_batch_session_window_equals_trips_operator(spark, events):
    """same gap, same data: the native session_window rollup and the
    window-function trip segmentation agree session-for-session (no
    exactly-gap-sized gaps in microsecond-noise data)."""
    sess = _batch_sessions(events, "8 hours")
    tr = (trips.trip_stats(
        events.withColumn("lat", F.lit(0.0)).withColumn("lon", F.lit(0.0)),
        gap_minutes=480.0, id_col="event_id")
        .select("user_id", "start_ts", "end_ts", "n_points"))
    cols = ["user_id", "start_ts", "end_ts", "n_points"]
    assert sess.count() == tr.count() > 0
    assert sess.join(tr, cols, "left_anti").count() == 0


def test_streaming_windowed_hll(spark, events, tmp_path):
    """HLL registers stream: finalized streaming register rows == the
    batch windowed sketch, and per-window estimates track exact distinct
    counts (4-sigma at p=9)."""
    from geolake_spark.operators import sketches

    drop = str(tmp_path / "hll_drop")
    events.repartition(3).write.parquet(drop)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 4).parquet(drop))
    regs = sketches.hll_sketch_windowed(stream, "user_id", ts_col="ts",
                                        window="2 days",
                                        watermark="1 day", p=9)
    q = (regs.writeStream.format("parquet")
         .option("path", str(tmp_path / "hll_out"))
         .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "hll_out"))
    max_ts = events.agg(F.max("ts")).first()[0]
    wm = max_ts - datetime.timedelta(days=1)
    batch = sketches.hll_sketch_windowed(events, "user_id", ts_col="ts",
                                         window="2 days", p=9)
    exp = batch.filter(
        F.col("window_start") + F.expr("INTERVAL 2 DAYS") <= F.lit(wm))
    cols = ["window_start", "bucket", "max_rho"]
    assert got.count() == exp.count() > 0
    assert got.join(exp, cols, "left_anti").count() == 0

    # finish the streamed registers: estimates track exact distincts
    est = {r.window_start: r.approx_distinct for r in sketches.hll_estimate(
        got, ["window_start"], p=9).collect()}
    exact = {r.window_start: r.n for r in events.filter(
        F.col("ts").cast("timestamp") < wm).groupBy(
        F.window("ts", "2 days").alias("w")).agg(
        F.count_distinct("user_id").alias("n")).select(
        F.col("w.start").alias("window_start"), "n").collect()
        if r.window_start in est}
    for w, n in exact.items():
        assert abs(est[w] - n) / n < 0.19  # 4 sigma at m=512


def test_streaming_windowed_hist_quantiles(spark, events, tmp_path):
    """Histogram bins stream: finalized streaming bin rows == the batch
    windowed sketch, and window medians off the streamed sketch are
    within one bin width of the exact per-window median."""
    from geolake_spark.operators import sketches

    ev = events.withColumn(
        "value", ((F.col("event_id") * 37) % 500).cast("double"))
    drop = str(tmp_path / "hist_drop")
    ev.repartition(3).write.parquet(drop)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 4).parquet(drop))
    regs = sketches.hist_sketch_windowed(
        stream, "value", lo=0.0, hi=500.0, nbins=100,
        ts_col="ts", window="2 days", watermark="1 day")
    q = (regs.writeStream.format("parquet")
         .option("path", str(tmp_path / "hist_out"))
         .option("checkpointLocation", str(tmp_path / "hist_ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "hist_out"))
    max_ts = events.agg(F.max("ts")).first()[0]
    wm = max_ts - datetime.timedelta(days=1)
    batch = sketches.hist_sketch_windowed(
        ev, "value", lo=0.0, hi=500.0, nbins=100,
        ts_col="ts", window="2 days")
    exp = batch.filter(
        F.col("window_start") + F.expr("INTERVAL 2 DAYS") <= F.lit(wm))
    cols = ["window_start", "bin", "cnt"]
    assert got.count() == exp.count() > 0
    assert got.join(exp, cols, "left_anti").count() == 0

    med = {r.window_start: r.value for r in sketches.hist_quantiles(
        got, [0.5], lo=0.0, hi=500.0, nbins=100,
        group_cols=["window_start"]).collect()}
    exact = {r.window_start: r.m for r in ev.filter(
        F.col("ts").cast("timestamp") < wm).groupBy(
        F.window("ts", "2 days").alias("w")).agg(
        F.expr("percentile(value, 0.5)").alias("m")).select(
        F.col("w.start").alias("window_start"), "m").collect()
        if r.window_start in med}
    assert len(exact) > 0
    for w, m in exact.items():
        # two bin widths: exact percentile interpolates between order
        # stats, the sketch assumes uniform-in-bin — on coarse integer
        # values the definitional gap can cross one bin boundary
        assert abs(med[w] - m) <= 10.0


def test_streaming_trending_terms(spark, events, tmp_path):
    """Windowed term counts stream: finalized streaming rows == the
    batch windowed counts, and the per-window top-k finisher ranks the
    streamed table deterministically."""
    from geolake_spark.streaming import ingest

    docs = events.withColumn(
        "text", F.concat(F.lit("alpha beta "),
                         F.when(F.col("event_id") % 3 == 0,
                                F.lit("gamma gamma trending"))
                         .otherwise(F.lit("delta plain"))))
    drop = str(tmp_path / "tt_drop")
    docs.repartition(3).write.parquet(drop)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 4).parquet(drop))
    regs = ingest.term_counts_windowed(stream, window="2 days",
                                       watermark="1 day")
    q = (regs.writeStream.format("parquet")
         .option("path", str(tmp_path / "tt_out"))
         .option("checkpointLocation", str(tmp_path / "tt_ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "tt_out"))
    max_ts = events.agg(F.max("ts")).first()[0]
    wm = max_ts - datetime.timedelta(days=1)
    batch = ingest.term_counts_windowed(docs, window="2 days")
    exp = batch.filter(
        F.col("window_start") + F.expr("INTERVAL 2 DAYS") <= F.lit(wm))
    cols = ["window_start", "token", "cnt"]
    assert got.count() == exp.count() > 0
    assert got.join(exp, cols, "left_anti").count() == 0

    top = ingest.trending_topk(got, k=2).collect()
    by_w = {}
    for r in top:
        by_w.setdefault(r.window_start, []).append((r.rank, r.token))
    for w, ranked in by_w.items():
        ranked.sort()
        # 'alpha'/'beta' appear every event; 'gamma' appears 2x on 1/3
        # of events -> count ties alpha/beta; token asc breaks the tie
        assert ranked[0][1] == "alpha" and ranked[1][1] == "beta"


def test_streaming_page_links_stateless(spark, tmp_path):
    """Link extraction is a stateless streaming transformation: the
    per-link rows stream through append mode with no watermark and
    match the batch extraction row-for-row."""
    from geolake_spark.operators import links

    rows = [(f"https://s{i % 5}.com/p{i}",
             f'<a href="https://hub.com/{i % 7}">h</a><a href="/nav">n</a>')
            for i in range(60)]
    pages = spark.createDataFrame(rows, "url string, html string")
    drop = str(tmp_path / "pl_drop")
    pages.repartition(3).write.parquet(drop)
    stream = (spark.readStream.schema(pages.schema)
              .option("maxFilesPerTrigger", 2).parquet(drop))
    out = links.page_links(stream)
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "pl_out"))
         .option("checkpointLocation", str(tmp_path / "pl_ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.read.parquet(str(tmp_path / "pl_out"))
    exp = links.page_links(pages)
    cols = ["url", "href", "link_url"]
    assert got.count() == exp.count() == 120
    assert got.join(exp, cols, "left_anti").count() == 0


def test_stream_stream_click_join_matches_batch(spark, tmp_path):
    """impression_click_join: the SAME operator over two file streams
    (availableNow) emits exactly the batch interval-join rows — inner
    stream-stream matches emit as found, no watermark hold."""
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = ev.select("event_id", "user_id", "event_type",
                   F.col("ts").cast("timestamp").alias("ts"))
    imps = (ev.filter(F.col("event_type") == "view")
            .select(F.col("event_id").alias("imp_id"), "user_id",
                    F.col("ts").alias("imp_ts")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts").alias("click_ts")))
    batch = ingest.impression_click_join(imps, clicks, "30 minutes")

    idir, cdir = str(tmp_path / "imps"), str(tmp_path / "clicks")
    imps.repartition(3).write.parquet(idir)
    clicks.repartition(3).write.parquet(cdir)
    si = spark.readStream.schema(imps.schema) \
        .option("maxFilesPerTrigger", 2).parquet(idir)
    sc = spark.readStream.schema(clicks.schema) \
        .option("maxFilesPerTrigger", 2).parquet(cdir)
    out = ingest.impression_click_join(si, sc, "30 minutes")
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "out"))
    cols = ["imp_id", "click_id", "user_id", "imp_ts", "click_ts"]
    assert got.count() == batch.count() > 0
    assert got.join(batch, cols, "left_anti").count() == 0
    assert batch.join(got, cols, "left_anti").count() == 0
