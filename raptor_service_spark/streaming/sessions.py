"""Stateful sessionization — the custom stateful streaming operator.

Graft-new coverage (the reference has no dataflow streaming, SURVEY §2.12):
per-user session assembly with a gap timeout, defined twice over the same
semantics:

  * ``sessionize_batch`` — pure DataFrame lag/cumsum windows (JVM codegen,
    oracle-checkable in ANSI SQL);
  * ``sessionize_stream`` — ``applyInPandasWithState`` keeping one open
    session per user in GroupState, emitting sessions as they CLOSE (a new
    event arrives more than ``gap`` after the previous one). State is
    O(users), bounded; the kernel is numpy-vectorized per Arrow batch.

Parity: over the same input, the stream's closed sessions equal the batch
result minus each user's final (still-open) session — asserted in
tests/test_sessions.py across multi-batch file triggers, which exercises
state carry-over between micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "last_us long, start_us long, n long, sv double"


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """All sessions per user: lag -> gap flag -> cumsum session id -> agg."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond precision, matching the stream kernel (which compares
    # microsecond gaps) and the DuckDB oracle (epoch_us): a truncated
    # whole-second comparison would merge pairs whose true gap lies in
    # (gap, gap+1) seconds that the other two paths split.
    gap = F.lit(gap_minutes * 60 * 1_000_000)
    # ts may be TIMESTAMP_NTZ (parquet); hop through timestamp (session TZ is
    # pinned UTC in session.py) to get epoch microseconds
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.withColumn(
        "new_sess",
        F.when(ts_us - F.lag(ts_us).over(w) > gap, 1).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(w))
    return flagged.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def closed_sessions_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessions minus each user's final one (streaming-parity target)."""
    from pyspark.sql import Window

    s = sessionize_batch(events, gap_minutes)
    w = Window.partitionBy("user_id")
    return (
        s.withColumn("mx", F.max("sess_id").over(w))
        .filter(F.col("sess_id") < F.col("mx"))
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


def _close_sessions_np(
    ts_us: np.ndarray, vals: np.ndarray, state: tuple | None, gap_us: int
) -> tuple[list[tuple[int, int, int, float]], tuple[int, int, int, float]]:
    """Vectorized session fold: returns (closed sessions, new open state).

    ``state`` is (last_us, start_us, n, sum_value) of the open session or
    None. Events must be pre-sorted by timestamp.
    """
    closed: list[tuple[int, int, int, float]] = []
    if state is not None and ts_us[0] - state[0] > gap_us:
        # the open session from state closes before this batch's first event
        last_us, start_us, n, sv = state
        closed.append((int(start_us), int(last_us), int(n), float(sv)))
        state = None

    # session boundaries inside this batch of events
    breaks = 1 + np.flatnonzero(ts_us[1:] - ts_us[:-1] > gap_us)
    seg_starts = np.concatenate(([0], breaks))
    seg_ends = np.concatenate((breaks, [len(ts_us)]))
    open_seg: tuple[int, int, int, float] | None = None
    for i, (a, b) in enumerate(zip(seg_starts, seg_ends)):
        seg_n = int(b - a)
        seg_sv = float(vals[a:b].sum())
        if i == 0 and state is not None:
            # first segment continues the open session from state; end must
            # never regress below the previously-seen last event (an
            # out-of-order event across micro-batches would otherwise shrink
            # the session end — there is no watermark to reject late data)
            last_us, start_us, n0, sv0 = state
            seg = (
                max(int(last_us), int(ts_us[b - 1])),
                int(start_us),
                int(n0) + seg_n,
                float(sv0) + seg_sv,
            )
        else:
            seg = (int(ts_us[b - 1]), int(ts_us[a]), seg_n, seg_sv)
        if b == len(ts_us):
            open_seg = seg  # last segment stays open
        else:
            closed.append((seg[1], seg[0], seg[2], seg[3]))
    assert open_seg is not None
    return closed, open_seg


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """applyInPandasWithState: emit sessions when a later event closes them.

    State per user: (last_us, start_us, n, sum_value) of the single open
    session — constant size, so total state is O(distinct users) regardless
    of stream length (the watermark-free analog of a session window; swap in
    EventTimeTimeout to also flush idle sessions at scale).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        ts_us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        vals = pdf["value"].to_numpy(dtype=np.float64)
        prev = tuple(state.get) if state.exists else None
        closed, open_seg = _close_sessions_np(ts_us, vals, prev, gap_us)
        state.update(open_seg)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(closed), key[0], dtype=np.int64),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": np.array([c[2] for c in closed], dtype=np.int64),
                    "sum_value": np.round([c[3] for c in closed], 6),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
