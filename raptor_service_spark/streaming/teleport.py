"""Stateful teleport (impossible-speed) detection — streaming twin of the
batch speed screen (__spark_entry__.q_speed_anomalies uses a robust global
cutoff; this operator is the ONLINE variant with a fixed km/h threshold,
since a global median is not computable incrementally per key).

Per-key state is the last seen fix (timestamp + lat/lng) — constant size,
total state O(distinct users). Each micro-batch: restore the last fix,
compute consecutive-leg haversine speeds numpy-vectorized per Arrow batch
(same float64 arithmetic as the Column/SQL forms in geo/distance.py), emit
every leg above the threshold in the micro-batch it is observed. No open
tail -> stream output == batch output EXACTLY over the same input
(asserted in tests/test_streaming_teleport.py across multi-batch file
triggers, including the cross-batch leg where the previous fix lives in
state). Events arriving out of order ACROSS micro-batches (strictly older
than the stored (ts, pid) fix) are dropped, mirroring the batch path's
(ts, pid) ordering; an event with ts EQUAL to the stored fix but a larger
pid is kept and advances the chain exactly as the batch lag window does.
Rounding is HALF_UP at 6 dp to match F.round (np.round is half-to-even
and diverges on exact .xxxxxx5 speeds).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.geo.distance import haversine_col, haversine_np

ANOMALY_SCHEMA = "user_id long, pid long, ts timestamp, speed_kmh double"
_STATE_SCHEMA = "last_us long, last_pid long, lat double, lng double"


def _round_half_up6(x: np.ndarray) -> np.ndarray:
    """HALF_UP at 6 dp with F.round's exact semantics. Spark rounds via
    BigDecimal.valueOf(double) — the SHORTEST decimal repr — then HALF_UP;
    np.round is banker's (half-to-even) and flips exact .xxxxxx5 values.
    Fast path: floor(x·1e6 + 0.5)/1e6 (vectorized). Elements whose scaled
    value lands within a few ulps of a .5 boundary (where the binary
    product disagrees with the shortest-decimal view, e.g. 1.0000025) are
    re-rounded exactly via Decimal(repr(x)) — Python repr is the same
    shortest-decimal algorithm as Java's Double.toString. inf/nan pass
    through the fast path untouched."""
    scaled = x * 1e6
    r = np.floor(scaled + 0.5) / 1e6
    finite = np.isfinite(scaled)
    frac = scaled - np.floor(scaled)
    near = finite & (np.abs(frac - 0.5) <= 4 * np.spacing(np.abs(scaled)))
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        for i in np.nonzero(near)[0]:
            r[i] = float(Decimal(repr(float(x[i]))).quantize(q, ROUND_HALF_UP))
    return r


def teleport_batch(points: DataFrame, max_kmh: float = 2000.0) -> DataFrame:
    """All above-threshold legs per key: lag window -> haversine / dt.
    Input: (user_id, pid, ts, lat, lng). One user-partitioned shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "pid")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    dt_h = (ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))) / F.lit(
        3600000000.0
    )
    leg = haversine_col(
        F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
    )
    return (
        points.withColumn("dt_h", dt_h)
        .withColumn("speed_kmh", F.round(leg / F.col("dt_h"), 6))
        .filter((F.col("dt_h") > 0) & (F.col("speed_kmh") > max_kmh))
        .select("user_id", "pid", "ts", "speed_kmh")
    )


def teleport_stream(points: DataFrame, max_kmh: float = 2000.0) -> DataFrame:
    """applyInPandasWithState twin: state = the last fix per user."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts", "pid"], kind="stable")
        ts_us = pdf["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        pids = pdf["pid"].to_numpy(dtype=np.int64)
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lng = pdf["lng"].to_numpy(dtype=np.float64)
        if state.exists:
            last_us, last_pid, plat, plng = state.get
            # Reject only data strictly OLDER than the stored (ts, pid) fix
            # — an equal-ts, larger-pid event is kept and advances the
            # chain, exactly like the batch lag window's (ts, pid) order.
            keep = (ts_us > last_us) | ((ts_us == last_us) & (pids > last_pid))
            pdf, ts_us, pids = pdf[keep], ts_us[keep], pids[keep]
            lat, lng = lat[keep], lng[keep]
            if not len(pdf):
                return
            prev_us = np.concatenate(([last_us], ts_us[:-1]))
            prev_lat = np.concatenate(([plat], lat[:-1]))
            prev_lng = np.concatenate(([plng], lng[:-1]))
        else:
            prev_us = np.concatenate(([ts_us[0]], ts_us[:-1]))
            prev_lat = np.concatenate(([lat[0]], lat[:-1]))
            prev_lng = np.concatenate(([lng[0]], lng[:-1]))
        state.update((int(ts_us[-1]), int(pids[-1]), float(lat[-1]), float(lng[-1])))
        dt_h = (ts_us - prev_us) / 3600000000.0
        with np.errstate(divide="ignore", invalid="ignore"):
            speed = _round_half_up6(
                haversine_np(prev_lat, prev_lng, lat, lng) / dt_h
            )
        hit = (dt_h > 0) & (speed > max_kmh)
        if hit.any():
            out = pdf[hit]
            yield pd.DataFrame(
                {
                    "user_id": np.full(int(hit.sum()), key[0], dtype=np.int64),
                    "pid": out["pid"].to_numpy(dtype=np.int64),
                    "ts": out["ts"].to_numpy(),
                    "speed_kmh": speed[hit],
                }
            )

    return points.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
