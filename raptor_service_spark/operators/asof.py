"""As-of (temporal) join — graft-new operator (SURVEY §2.13).

Spark has no native ASOF JOIN; the naive formulation (range join + per-row
max) explodes into an O(|L|·|R|) BroadcastNestedLoop or a skewed range join.
The scalable shape used here is the classic union + ordered-window fill:

  1. tag left rows side=1, right rows side=0;
  2. union on (key, ts) with the right side's payload columns null on left;
  3. one window per key ordered by (ts, side, right-tiebreak):
     ``last(payload, ignorenulls=True)`` over unbounded-preceding rows
     carries the latest right payload forward onto every left row;
  4. keep side=1.

ONE shuffle on the join key, no row multiplication, skew bounded by the
busiest key's row count (same bound as any per-key window). Ties: a right
row at the identical timestamp IS matched (inclusive <=, side 0 sorts before
side 1); multiple right rows on one timestamp resolve to the largest
tiebreak column value — semantics pinned by the DuckDB oracle's
``ORDER BY r.ts DESC, r.<tiebreak> DESC LIMIT 1`` correlated form
(equivalent to DuckDB's native ASOF JOIN up to the explicit tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "prior_",
) -> DataFrame:
    """For each left row, attach the latest right row with right.ts <= left.ts
    (per ``key``). Right columns come back as ``prior_<col>`` (NULL when no
    prior right row exists — left-outer semantics)."""
    tb = tiebreak or payload_cols[0]
    order_cols = [F.col(ts).asc(), F.col("_side").asc(), F.col(f"_r_{tb}").asc_nulls_first()]
    l = left.withColumn("_side", F.lit(1))
    for c in payload_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(
        key,
        ts,
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    ).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
    drop = ["_side"] + [f"_r_{c}" for c in payload_cols]
    return filled.filter(F.col("_side") == 1).drop(*drop)
