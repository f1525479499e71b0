"""Streaming EWMA anomaly monitor per cell — the ONLINE variant of the
batch q_ewma_anomaly screen (which uses a 24-term truncated window; the
streaming recurrence is the untruncated textbook filter, the form a
monitor actually runs because its state is two numbers).

State per cell: (ewma, last_hr, seq) — constant size forever. Each
micro-batch folds the cell's NEW hourly counts in hour order:

    ratio_t   = x_t / s_{t-1}          (the anomaly score BEFORE updating)
    s_t       = round(α·x_t + (1−α)·s_{t-1}, 9)

initialized s = x_first (no ratio emitted for the first hour). Hours
arriving out of order ACROSS micro-batches (hr <= stored last_hr) are
dropped, mirroring the monitor's no-rewind semantics. 9-dp HALF_UP
rounding per step makes the fold bit-identical to the pure-Python
reference asserted in tests/test_streaming_ewma.py (exact equality,
including folds straddling micro-batches and state restoration).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EWMA_ALPHA = 0.3

OUT_SCHEMA = "cell long, hr long, n long, baseline double, ratio double, batch_seq long"
_STATE_SCHEMA = "s double, last_hr long, seq long"


def _r9(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP))


def _r6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def ewma_fold(
    state: tuple[float, int] | None, rows: list[tuple[int, int]], alpha: float = EWMA_ALPHA
) -> tuple[tuple[float, int], list[tuple[int, int, float, float]]]:
    """Fold (hr, n) rows (assumed hr-sorted, deduplicated) into the (s,
    last_hr) state; returns the new state and the emitted (hr, n,
    baseline, ratio) rows. Shared by the streaming kernel and the test's
    pure-Python reference."""
    out = []
    s, last = state if state is not None else (None, None)
    for hr, n in rows:
        if last is not None and hr <= last:
            continue
        if s is None:
            s, last = float(n), hr
            continue
        ratio = _r6(n / s)
        out.append((hr, n, _r6(s), ratio))
        s = _r9(alpha * n + (1.0 - alpha) * s)
        last = hr
    return (s, last), out


def ewma_stream(counts: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Input: streaming (cell long, hr long, n long) hourly count rows.
    Output: one row per scored hour per micro-batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values("hr", kind="stable").drop_duplicates("hr")
        st = tuple(state.get)[:2] if state.exists else None
        if st is not None and st[0] is None:
            st = None
        seq = int(state.get[2]) + 1 if state.exists else 1
        (s, last), emitted = ewma_fold(
            st, list(zip(pdf["hr"].tolist(), pdf["n"].tolist())), alpha
        )
        state.update((float(s), int(last), seq))
        if not emitted:
            return
        yield pd.DataFrame(
            {
                "cell": np.full(len(emitted), key[0], dtype=np.int64),
                "hr": np.array([e[0] for e in emitted], dtype=np.int64),
                "n": np.array([e[1] for e in emitted], dtype=np.int64),
                "baseline": np.array([e[2] for e in emitted], dtype=np.float64),
                "ratio": np.array([e[3] for e in emitted], dtype=np.float64),
                "batch_seq": np.full(len(emitted), seq, dtype=np.int64),
            }
        )

    return counts.groupBy("cell").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
