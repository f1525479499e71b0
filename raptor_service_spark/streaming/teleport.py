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
state). Events arriving out of order ACROSS micro-batches (older than the
stored fix) are dropped, mirroring the batch path's (ts, pid) ordering.
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
_STATE_SCHEMA = "last_us long, lat double, lng double"


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
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lng = pdf["lng"].to_numpy(dtype=np.float64)
        if state.exists:
            last_us, plat, plng = state.get
            keep = ts_us > last_us  # reject cross-batch late data
            pdf, ts_us, lat, lng = pdf[keep], ts_us[keep], lat[keep], lng[keep]
            if not len(pdf):
                return
            prev_us = np.concatenate(([last_us], ts_us[:-1]))
            prev_lat = np.concatenate(([plat], lat[:-1]))
            prev_lng = np.concatenate(([plng], lng[:-1]))
        else:
            prev_us = np.concatenate(([ts_us[0]], ts_us[:-1]))
            prev_lat = np.concatenate(([lat[0]], lat[:-1]))
            prev_lng = np.concatenate(([lng[0]], lng[:-1]))
        state.update((int(ts_us[-1]), float(lat[-1]), float(lng[-1])))
        dt_h = (ts_us - prev_us) / 3600000000.0
        with np.errstate(divide="ignore", invalid="ignore"):
            speed = np.round(
                haversine_np(prev_lat, prev_lng, lat, lng) / dt_h, 6
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
