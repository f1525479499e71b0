"""Streaming HyperLogLog distinct-count per key — the stateful twin of
`operators.sketches.hll_distinct_agg`.

State per key is the sketch ITSELF: 256 one-byte register maxima —
constant-size forever, the canonical "count distinct users per key over an
unbounded stream" answer (vs the bottom-k KMV in streaming/kmv.py, HLL
state is fixed-size regardless of k and merges by element-wise MAX — the
same merge a 1000-executor batch job uses to combine partial sketches).

Each micro-batch folds the batch's (key, value) rows into the stored
registers (element-wise max — associative + commutative + idempotent, so
arrival order and batch boundaries cannot change the final state) and
emits the current estimate with a batch sequence number. The final
emission per key equals the batch twin EXACTLY — not approximately —
because the register arrays are identical by construction and the
estimator sums registers in EXACT integer arithmetic (Σ 2^(53−M), see
hll_estimate), so there is no float-accumulation-order term to diverge.
Asserted in tests/test_streaming_hll.py, including registers straddling
micro-batches. Estimate rounding is HALF_UP via Decimal to match F.round.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from raptor_service_spark.operators.sketches import (
    HLL_M,
    hll_estimate,
    hll_jrho_py,
)

OUT_SCHEMA = "grp long, occ long, hll_est double, batch_seq long"
_STATE_SCHEMA = "regs array<integer>, seq long"


def _round_half_up3(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("0.001"), ROUND_HALF_UP))


def hll_stream(points: DataFrame, key_col: str = "grp", val_col: str = "user_id") -> DataFrame:
    """Input: streaming (grp long, user_id long). Output: one row per
    updated key per micro-batch with the sketch's current estimate."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        if state.exists:
            regs_list, seq = state.get
            regs = list(regs_list)
        else:
            regs, seq = [0] * HLL_M, 0
        for v in pdf[val_col].unique():
            j, rho = hll_jrho_py(int(v))
            if rho > regs[j]:
                regs[j] = rho
        seq += 1
        state.update((regs, seq))
        est = _round_half_up3(hll_estimate(regs))
        yield pd.DataFrame(
            {
                "grp": np.array([key[0]], dtype=np.int64),
                "occ": np.array([sum(1 for m in regs if m > 0)], dtype=np.int64),
                "hll_est": np.array([est], dtype=np.float64),
                "batch_seq": np.array([seq], dtype=np.int64),
            }
        )

    return points.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
