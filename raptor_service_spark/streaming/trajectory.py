"""Stateful cell-transition stream — the streaming half of the OD matrix.

Graft-new streaming coverage (the reference has no dataflow streaming,
SURVEY §2.12): per-key detection of cross-cell movement, defined twice over
the same semantics:

  * ``cell_transitions_batch`` — grid encode + lag window (JVM codegen,
    oracle-shaped like __spark_entry__.q_user_od_flows);
  * ``cell_transitions_stream`` — ``applyInPandasWithState`` keeping ONE
    (last_us, last_cell) pair per key, emitting an (origin, destination)
    row the micro-batch the move is observed. State O(distinct keys); the
    grid encode is vectorized numpy per Arrow batch (geo/grid.cell_encode_np
    — the same formula as the codegen batch path).

Like the geofence stream there is no open tail: stream output == batch
output EXACTLY over the same input. Downstream, the OD matrix itself is a
plain windowed count over this transition stream (one additional stateful
agg, or a foreachBatch upsert into the catalog) — the transition extraction
is the part that needs custom state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import cell_encode_col, cell_encode_np

TRANSITION_SCHEMA = (
    "user_id long, pid long, ts timestamp, cell_from long, cell_to long"
)
_STATE_SCHEMA = "last_us long, last_cell long"


def cell_transitions_batch(points: DataFrame, res: int) -> DataFrame:
    """All cross-cell moves per key: encode -> lag -> change filter.
    Input: (user_id, pid, ts, lat, lng)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "pid")
    pts = points.withColumn(
        "cell", cell_encode_col(F.col("lat"), F.col("lng"), res)
    )
    return (
        pts.withColumn("prev", F.lag("cell").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("cell")))
        .select(
            "user_id",
            "pid",
            "ts",
            F.col("prev").alias("cell_from"),
            F.col("cell").alias("cell_to"),
        )
    )


def cell_transitions_stream(points: DataFrame, res: int) -> DataFrame:
    """applyInPandasWithState: emit each cross-cell move in the micro-batch
    it is observed. Cross-batch late events (older than the stored last_us)
    are dropped, mirroring the batch path's (ts, pid) order reliance."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts", "pid"], kind="stable")
        ts_us = pdf["ts"].astype("int64").to_numpy() // 1000
        cells = cell_encode_np(
            pdf["lat"].to_numpy(dtype=np.float64),
            pdf["lng"].to_numpy(dtype=np.float64),
            res,
        )
        if state.exists:
            last_us, last_cell = state.get
            keep = ts_us > last_us
            pdf, ts_us, cells = pdf[keep], ts_us[keep], cells[keep]
            if not len(pdf):
                return
            prev = np.concatenate(([last_cell], cells[:-1]))
        else:
            prev = np.concatenate(([cells[0]], cells[:-1]))  # first row: no move
        state.update((int(ts_us[-1]), int(cells[-1])))
        chg = prev != cells
        if chg.any():
            out = pdf[chg]
            yield pd.DataFrame(
                {
                    "user_id": np.full(int(chg.sum()), key[0], dtype=np.int64),
                    "pid": out["pid"].to_numpy(dtype=np.int64),
                    "ts": out["ts"].to_numpy(),
                    "cell_from": prev[chg].astype(np.int64),
                    "cell_to": cells[chg].astype(np.int64),
                }
            )

    return points.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
