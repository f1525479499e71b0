"""Streaming dedup — the stream analog of the batch dedup family (A4-A6,
exact_dedup): emit each key's FIRST event, suppress later duplicates.

Two variants over the same semantics:

  * ``dedup_stream_watermarked`` — built-in
    ``dropDuplicatesWithinWatermark``: state is BOUNDED (keys older than the
    watermark delay are dropped from the state store), the production path
    when duplicates arrive close together in event time — e.g. at-least-once
    ingest retries. Rows are emitted on first arrival.
  * ``first_seen_stream`` — ``applyInPandasWithState`` custom operator:
    exact first-seen over the whole stream (state O(distinct keys), one
    boolean+winner per key), the analog of the batch ``first_seen_dedup``
    window (rn = 1 by ts, event_id). Use when exactness beats bounded state.

Parity (tests/test_streaming_dedup.py): over time-ordered micro-batches both
variants equal the batch first-seen winners.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIRST_SEEN_SCHEMA = "user_id long, event_type string, ts timestamp, event_id long"
_STATE_SCHEMA = "seen boolean"


def dedup_stream_watermarked(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Bounded-state streaming dedup: duplicates arriving within ``delay``
    of the watermark are suppressed; state for older keys is evicted."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def first_seen_batch(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Batch twin: the (ts, event_id)-first row per key (A6 semantics)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "event_id")
    )


def first_seen_stream(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact first-seen per key across the whole stream.

    GroupState per key holds one boolean; the kernel emits the
    (ts, event_id)-smallest row of the FIRST micro-batch that contains the
    key and nothing afterwards. With time-ordered arrival this equals the
    batch first-seen winners.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        state.update((True,))
        win = pdf.sort_values(["ts", "event_id"], kind="stable").iloc[:1]
        yield win[["user_id", "event_type", "ts", "event_id"]]

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
