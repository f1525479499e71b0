"""Native session_window aggregation — the built-in sibling of the custom
applyInPandasWithState sessionizer (`streaming/sessions.py`).

Spark's `F.session_window(ts, gap)` is the DECLARATIVE way to sessionize:
Catalyst owns the state store, merges overlapping windows, and the
watermark expires closed sessions — no Python state machine at all. A
10^12-event pipeline should prefer this form whenever the per-session
output is an aggregate (count/sum/min/max); the custom GroupState kernel
remains for semantics session_window can't express (e.g. emitting nothing
until a session closes with a computed payload).

Defined once over batch and stream (the events.py unification) so the
parity test pins: native batch == custom batch == native stream (closed
sessions), including sessions straddling micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_native(
    events: DataFrame, gap_minutes: int = 30, watermark: str | None = "2 hours"
) -> DataFrame:
    """Per (user, session) aggregate via the NATIVE session_window:
    output (user_id, session_start, session_end_ts, n_events).

    ``session_end_ts`` is the MAX event ts (the custom sessionizer's
    convention) — session_window.end adds the gap, so the two forms are
    aligned on the raw timestamps, not the padded window."""
    src = events
    if watermark and events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.col("user_id"),
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end_ts"),
        )
        .select("user_id", "session_start", "session_end_ts", "n_events")
    )
