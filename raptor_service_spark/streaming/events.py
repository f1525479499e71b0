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


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """availableNow trigger: process everything currently in the source, then
    stop — the batch-parity harness for streaming tests. ``output_mode``
    must be "append" for stateful operators that emit rows incrementally."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with EVERY click by
    the same user within the preceding ``lookback`` (the attribution-window
    join; the as-of operator keeps only the latest).

    Defined once for batch and streaming inputs. In streaming mode both
    sides carry watermarks and the time-range bound is what lets Spark
    expire buffered join state (without it, stream-stream inner join state
    grows forever); with them, state is O(users active in the window).
    Batch mode plans an equi-join on user_id with the range as a join
    filter — no blowup beyond the output size.
    """
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
        clicks = clicks.withWatermark("ts", watermark)
    p, c = purchases.alias("p"), clicks.alias("c")
    cond = (
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.round(F.col("c.value"), 6).alias("click_value"),
    )
