"""Streaming PSI drift monitor — the continuous-query form of
`__spark_entry__.q_psi_drift`.

State per event type is the pair of bucket histograms themselves
(2 × bins longs — bounded forever), exactly the mergeable partial-agg
state the batch PSI reduces to; each micro-batch adds the batch's bucket
counts and emits the CURRENT total PSI with a sequence number. Bucket
bounds are fixed parameters (the deployed pattern: bounds come from a
reference/training period — a streaming operator cannot re-bucket history
when the observed min/max moves), so the final emission equals
`psi_batch` over the same input EXACTLY (tests/test_streaming_drift.py,
including histograms straddling micro-batches).

Rounding is HALF_UP via Decimal(repr(x)) to match F.round.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.streaming.kmv import _round_half_up6

OUT_SCHEMA = "event_type string, n_base long, n_cur long, psi double, batch_seq long"
_STATE_SCHEMA = "ha array<long>, hb array<long>, seq long"


def _bucket_col(value, lo: float, hi: float, bins: int):
    return F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((value - F.lit(lo)) / F.lit(hi - lo) * bins)
        ),
    ).cast("long")


def psi_batch(
    points: DataFrame, lo: float, hi: float, bins: int = 10
) -> DataFrame:
    """Batch PSI with FIXED bounds over (event_type, par, value) rows:
    per type, Laplace-smoothed bucket shares of par=0 vs par=1 and the
    total PSI Σ(p−q)·ln(p/q) — one partial+final agg."""
    b = points.withColumn("bucket", _bucket_col(F.col("value"), lo, hi, bins))
    cnt = b.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).alias("nb"),
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    j = cnt.join(tot, "event_type")
    p = (F.col("na") + 1).cast("double") / (F.col("ta") + bins)
    q = (F.col("nb") + 1).cast("double") / (F.col("tb") + bins)
    contrib = F.round((p - q) * F.log(p / q), 9)
    return (
        j.groupBy("event_type")
        .agg(
            F.max("ta").cast("long").alias("n_base"),
            F.max("tb").cast("long").alias("n_cur"),
            F.round(F.round(F.sum(contrib), 9), 6).alias("psi"),
        )
    )


def psi_stream(
    points: DataFrame, lo: float, hi: float, bins: int = 10
) -> DataFrame:
    """applyInPandasWithState twin: histograms as keyed state. NOTE: the
    smoothed PSI is recomputed from the FULL histograms each batch (state
    is the sufficient statistic), so convergence to psi_batch is exact.
    Buckets observed in this stream may miss entirely (0+1 smoothing
    keeps every contribution finite, same as the batch path)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        v = pdf["value"].to_numpy(dtype=np.float64)
        par = pdf["par"].to_numpy(dtype=np.int64)
        bucket = np.clip(
            np.floor((v - lo) / (hi - lo) * bins), 0, bins - 1
        ).astype(np.int64)
        if state.exists:
            ha, hb, seq = state.get
            ha, hb = np.array(ha, dtype=np.int64), np.array(hb, dtype=np.int64)
        else:
            ha = np.zeros(bins, dtype=np.int64)
            hb = np.zeros(bins, dtype=np.int64)
            seq = 0
        np.add.at(ha, bucket[par == 0], 1)
        np.add.at(hb, bucket[par == 1], 1)
        seq += 1
        state.update((ha.tolist(), hb.tolist(), seq))
        ta, tb = int(ha.sum()), int(hb.sum())
        # batch path only sees buckets with na+nb > 0 — same support here
        occ = (ha + hb) > 0
        p = (ha[occ] + 1) / (ta + bins)
        q = (hb[occ] + 1) / (tb + bins)
        contrib = np.array(
            [_round_half_up6_at(c, 9) for c in (p - q) * np.log(p / q)]
        )
        psi = _round_half_up6(_round_half_up6_at(float(contrib.sum()), 9))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_base": np.array([ta], dtype=np.int64),
                "n_cur": np.array([tb], dtype=np.int64),
                "psi": np.array([psi], dtype=np.float64),
                "batch_seq": np.array([seq], dtype=np.int64),
            }
        )

    return points.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _round_half_up6_at(x: float, dp: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP)
    )
