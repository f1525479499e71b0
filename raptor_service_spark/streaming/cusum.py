"""Streaming two-sided CUSUM level-shift monitor per cell — the ONLINE
variant of the batch q_cusum_cells screen (which scores the whole day
series retrospectively; the monitor form is Page's cumulative-sum test,
the classic minimal-state change detector).

Self-calibrating: the first WARMUP hours of a cell estimate the reference
level mu0 = round(sum/WARMUP, 9) (no scores emitted while warming), then
allowance k = round(K_FRAC * mu0, 9) and threshold h = round(H_FRAC * mu0,
9). Per subsequent hour:

    s_pos = round(max(0, s_pos + (x - mu0 - k)), 9)
    s_neg = round(max(0, s_neg + (mu0 - k - x)), 9)
    alarm = s_pos > h or s_neg > h        (then both sides reset to 0 --
                                           the standard restart protocol)

State per cell: (warm_n, warm_sum, mu0, s_pos, s_neg, last_hr, seq) --
constant size forever. Hours arriving out of order ACROSS micro-batches
(hr <= stored last_hr) are dropped (no-rewind semantics, the ewma_stream
convention). 9-dp HALF_UP rounding per step makes the fold bit-identical
to the pure-Python reference asserted in tests/test_streaming_cusum.py
(exact equality, including folds straddling micro-batches).

Batch twin: q_cusum_cells (oracle-checked) scores the same corpus
retrospectively; this module is the monitor a deployment actually runs.
Reference analog: the ingest-rate guard rails of
/root/reference/services/core/build_tree_service.py recast as an online
control chart.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

CUSUM_WARMUP = 24
CUSUM_K_FRAC = 0.25
CUSUM_H_FRAC = 2.0

OUT_SCHEMA = (
    "cell long, hr long, n long, s_pos double, s_neg double, "
    "alarm boolean, batch_seq long"
)
_STATE_SCHEMA = (
    "warm_n long, warm_sum long, mu double, s_pos double, s_neg double, "
    "last_hr long, seq long"
)


def _r9(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP))


def cusum_fold(
    state: tuple | None,
    rows: list[tuple[int, int]],
    warmup: int = CUSUM_WARMUP,
    k_frac: float = CUSUM_K_FRAC,
    h_frac: float = CUSUM_H_FRAC,
) -> tuple[tuple, list[tuple[int, int, float, float, bool]]]:
    """Fold (hr, n) rows (hr-sorted, deduplicated) into the CUSUM state;
    returns the new state and the emitted (hr, n, s_pos, s_neg, alarm)
    rows. Shared by the streaming kernel and the test's pure-Python
    reference. State: (warm_n, warm_sum, mu0, s_pos, s_neg, last_hr)."""
    warm_n, warm_sum, mu, sp, sn, last = (
        state if state is not None else (0, 0, None, 0.0, 0.0, None)
    )
    out = []
    for hr, n in rows:
        if last is not None and hr <= last:
            continue
        last = hr
        if mu is None:
            warm_n += 1
            warm_sum += n
            if warm_n >= warmup:
                mu = _r9(warm_sum / warmup)
            continue
        k = _r9(k_frac * mu)
        h = _r9(h_frac * mu)
        sp = _r9(max(0.0, sp + (n - mu - k)))
        sn = _r9(max(0.0, sn + (mu - k - n)))
        alarm = sp > h or sn > h
        out.append((hr, n, sp, sn, alarm))
        if alarm:
            sp, sn = 0.0, 0.0
    return (warm_n, warm_sum, mu, sp, sn, last), out


def cusum_stream(
    counts: DataFrame,
    warmup: int = CUSUM_WARMUP,
    k_frac: float = CUSUM_K_FRAC,
    h_frac: float = CUSUM_H_FRAC,
) -> DataFrame:
    """Input: streaming (cell long, hr long, n long) hourly count rows.
    Output: one scored row per post-warmup hour per micro-batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values("hr", kind="stable").drop_duplicates("hr")
        if state.exists:
            warm_n, warm_sum, mu, sp, sn, last, seq = tuple(state.get)
            st = (warm_n, warm_sum, mu, sp, sn, last)
            seq = int(seq) + 1
        else:
            st, seq = None, 1
        (warm_n, warm_sum, mu, sp, sn, last), emitted = cusum_fold(
            st, list(zip(pdf["hr"].tolist(), pdf["n"].tolist())),
            warmup, k_frac, h_frac,
        )
        state.update(
            (int(warm_n), int(warm_sum), mu, float(sp), float(sn),
             int(last) if last is not None else -1, seq)
        )
        if not emitted:
            return
        yield pd.DataFrame(
            {
                "cell": np.full(len(emitted), key[0], dtype=np.int64),
                "hr": np.array([e[0] for e in emitted], dtype=np.int64),
                "n": np.array([e[1] for e in emitted], dtype=np.int64),
                "s_pos": np.array([e[2] for e in emitted], dtype=np.float64),
                "s_neg": np.array([e[3] for e in emitted], dtype=np.float64),
                "alarm": np.array([e[4] for e in emitted], dtype=bool),
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
