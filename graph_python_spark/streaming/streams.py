"""Structured Streaming operators.

The reference has NO streaming surface (SURVEY.md §2.7) — its only
incremental notion is nonblocking mode + wait().  These operators extend the
engine for the training-data-pipeline setting: edge/event streams landing in
object storage, processed incrementally with watermarks.

Both helpers run equally against a bounded directory (tests drive them with
``processAllAvailable`` on a parquet dir) and an unbounded source at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

EDGE_SCHEMA = T.StructType([
    T.StructField("src", T.LongType()),
    T.StructField("dst", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def stream_windowed_events(spark: SparkSession, path: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event aggregation with late-data watermark."""
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("window.start").alias("w_start"), "event_type", "n", "total_value")
    )


def stream_degree_counts(spark: SparkSession, path: str,
                         watermark: str = "1 hour") -> DataFrame:
    """Incremental out-degree over an arriving edge stream — the streaming
    twin of ``reduce_rowwise(plus)``; complete-mode aggregation keyed by
    src, so each micro-batch only shuffles its delta (map-side combined)."""
    edges = spark.readStream.schema(EDGE_SCHEMA).parquet(path)
    return edges.groupBy("src").agg(F.count("*").alias("out_degree"))


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> None:
    """Drive a bounded stream to completion into an in-memory table."""
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode).trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
