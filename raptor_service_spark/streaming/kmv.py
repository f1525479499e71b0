"""Streaming bottom-k (KMV) distinct-user sketch per cell — the stateful
twin of `operators.sketches.kmv_distinct_agg`.

State per cell is the sketch ITSELF: the k smallest (md5-hash, user_id)
pairs — bounded O(k) regardless of how many users the cell ever sees,
which is the whole point of the sketch at 10^12-event scale (the exact
distinct count would need unbounded per-key state; the estimate doesn't).
Each micro-batch merges the batch's candidate pairs into the stored
bottom-k (sketch merge == k-smallest of the union — the SAME merge
executors would use to combine partial sketches) and emits the current
estimate with a batch sequence number; the final emission per cell equals
the batch KMV estimate EXACTLY (asserted in tests/test_streaming_kmv.py,
including sketches straddling micro-batches).

Estimate rounding is HALF_UP via Decimal(repr(x)) to match F.round
(teleport.py's lesson: np.round / Python round are half-to-even).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from raptor_service_spark.operators.sketches import kmv_hash_py

OUT_SCHEMA = "cell long, n_sketch long, kmv_est double, batch_seq long"
_STATE_SCHEMA = "hs array<double>, us array<long>, seq long"


def _round_half_up6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def kmv_stream(points: DataFrame, k: int = 32) -> DataFrame:
    """Input: streaming (cell long, user_id long). Output: one row per
    updated cell per micro-batch with the sketch's current estimate."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        users = pdf["user_id"].unique()
        if state.exists:
            hs, us, seq = state.get
            sketch = set(zip(hs, us))
        else:
            sketch, seq = set(), 0
        sketch |= {(kmv_hash_py(int(u)), int(u)) for u in users}
        # keep the k smallest by (h, user_id) — the batch window's order
        kept = sorted(sketch)[:k]
        seq += 1
        state.update(([h for h, _ in kept], [u for _, u in kept], seq))
        if len(kept) == k:
            est = _round_half_up6((k - 1) / kept[-1][0])
        else:
            est = float(len(kept))
        yield pd.DataFrame(
            {
                "cell": np.array([key[0]], dtype=np.int64),
                "n_sketch": np.array([len(kept)], dtype=np.int64),
                "kmv_est": np.array([est], dtype=np.float64),
                "batch_seq": np.array([seq], dtype=np.int64),
            }
        )

    return points.groupBy("cell").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
