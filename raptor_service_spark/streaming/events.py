"""Structured Streaming over the events table.

The reference has NO dataflow streaming (its only 'stream' is SSE token relay,
/root/reference/services/retrieval/response_service.py:123-172) — this module
is graft-new coverage: the same windowed aggregation defined once and run in
both batch and streaming mode (the Spark-idiomatic unification), so the
streaming path is testable against the batch result with an availableNow
trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_stats(events: DataFrame, window: str = "1 hour",
                         watermark: str | None = "2 hours") -> DataFrame:
    """Tumbling-window per-type stats; watermark bounds state when streaming."""
    src = events
    if watermark and events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def stream_events_from_dir(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a parquet directory (schema must be explicit)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def run_stream_to_memory(stream_df: DataFrame, query_name: str):
    """availableNow trigger: process everything currently in the source, then
    stop — the batch-parity harness for streaming tests."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
