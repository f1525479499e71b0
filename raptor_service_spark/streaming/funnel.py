"""Stateful streaming conversion funnel — streaming twin of the batch
``event_funnel`` query (__spark_entry__.q_event_funnel).

Per-user sequential state machine over the view → click → purchase ladder:
a user advances a stage at the FIRST event of the next stage's type that is
strictly later (on the (ts, event_id) pair) than the event that entered the
current stage — exactly the batch query's "earliest view, earliest click
after it, earliest purchase after that". Defined twice over one semantics:

  * ``funnel_stages_batch`` — three sequential min(struct) aggregations
    (JVM, oracle-checkable; the counts query aggregates these rows);
  * ``funnel_stages_stream`` — ``applyInPandasWithState`` with state =
    (stage, anchor_us, anchor_eid): three numpy masked-argmin scans per
    Arrow batch, NO per-row Python. State is constant-size per key.

Every stage advance is emitted in the micro-batch it is observed and a
stage can never retreat, so stream output == batch output EXACTLY over the
same input — including advances that straddle micro-batches (view arrives
in batch 1, its click in batch 2), asserted in
tests/test_streaming_funnel.py. Late events older than the current anchor
are ignored by the strict-after mask — the same order reliance as batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGE_TYPES = ("view", "click", "purchase")
STAGE_SCHEMA = "user_id long, stage int, event_id long"
_STATE_SCHEMA = "stage int, anchor_us long, anchor_eid long"


def funnel_stages_batch(events: DataFrame) -> DataFrame:
    """(user_id, stage, event_id) of each user's stage-entering events.
    Input: (user_id, event_type, ts, event_id)."""
    tsl = F.unix_micros(F.col("ts").cast("timestamp"))
    base = events.select(
        "user_id", "event_type", tsl.alias("us"), "event_id"
    )
    strictly_after = lambda a: (F.col("us") > F.col(f"{a}.us")) | (
        (F.col("us") == F.col(f"{a}.us")) & (F.col("event_id") > F.col(f"{a}.event_id"))
    )
    anchors = []
    prev = None
    for stage, typ in enumerate(STAGE_TYPES, start=1):
        stg = base.filter(F.col("event_type") == typ)
        if prev is not None:
            stg = stg.join(prev, "user_id").filter(strictly_after("m"))
        cur = stg.groupBy("user_id").agg(F.min(F.struct("us", "event_id")).alias("m"))
        anchors.append(
            cur.select(
                "user_id",
                F.lit(stage).alias("stage"),
                F.col("m.event_id").alias("event_id"),
            )
        )
        prev = cur
    out = anchors[0]
    for a in anchors[1:]:
        out = out.unionByName(a)
    return out


def funnel_stages_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState twin: state = (stage, anchor_us, anchor_eid);
    at most len(STAGE_TYPES) vectorized scans per key per micro-batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        eid = pdf["event_id"].to_numpy(dtype=np.int64)
        typ = pdf["event_type"].to_numpy()
        stage, aus, aeid = state.get if state.exists else (0, -(2**62), -(2**62))
        out_rows = []
        while stage < len(STAGE_TYPES):
            want = STAGE_TYPES[stage]
            mask = (typ == want) & ((us > aus) | ((us == aus) & (eid > aeid)))
            idxs = np.flatnonzero(mask)
            if len(idxs) == 0:
                break
            i = int(idxs[0])
            stage, aus, aeid = stage + 1, int(us[i]), int(eid[i])
            out_rows.append((stage, aeid))
        state.update((int(stage), int(aus), int(aeid)))
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(out_rows), key[0], dtype=np.int64),
                    "stage": np.array([s for s, _ in out_rows], dtype=np.int32),
                    "event_id": np.array([e for _, e in out_rows], dtype=np.int64),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=STAGE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
