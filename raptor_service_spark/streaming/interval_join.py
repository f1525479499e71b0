"""Stream-stream interval join: click → purchase attribution.

The ONE Structured Streaming surface the module family didn't yet cover:
a watermarked stream-STREAM inner join with a time-range predicate (all
the stateful operators here are single-input aggregations/folds). Spark
buffers both sides in state and uses the watermark + range condition to
evict: a click older than (watermark − horizon) can never match a future
purchase, so state is bounded by rate × horizon — the exact semantics a
10^12-event attribution pipeline needs (reference analog: the
click/purchase tables the batch `asof_prior_click` / `click_purchase_join`
queries serve; this is their continuous twin).

Batch and streaming share ONE join-condition builder, so the parity test
(tests/test_streaming_interval_join.py) pins stream == batch exactly,
including pairs that straddle micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HORIZON_MIN = 30


def _split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return clicks, purchases


def _cond():
    return (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {HORIZON_MIN} MINUTES"))
    )


def _project(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("c_ts").cast("timestamp"))
        ).alias("lag_us"),
    )


def click_attribution_batch(events: DataFrame) -> DataFrame:
    """Every (click, purchase-of-same-user within 30 min after) pair."""
    clicks, purchases = _split(events)
    return _project(clicks.join(purchases, _cond()))


def click_attribution_stream(
    click_events: DataFrame, purchase_events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """The streaming twin: watermark BOTH sides, then the same interval
    join — Spark derives the state-eviction bound from the range
    predicate. Append output mode (inner stream-stream joins emit rows
    exactly once, when both sides have arrived)."""
    clicks, _ = _split(click_events)
    _, purchases = _split(purchase_events)
    return _project(
        clicks.withWatermark("c_ts", watermark).join(
            purchases.withWatermark("p_ts", watermark), _cond()
        )
    )
