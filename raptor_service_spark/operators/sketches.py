"""Relational bottom-k (KMV / theta family) distinct sketch.

The mergeable distinct-count sketch a 100 TB engine ships between executors
instead of raw value sets: per group keep the k smallest md5-uniform hashes
(O(k) state), estimate = (k-1)/h_(k), exact below k by construction. The
relational form here (dedupe → per-group rank window → k-th value) is
bit-reproducible in DuckDB, which is what lets the driver oracle-check it
(`__spark_entry__.q_kmv_distinct` / `q_kmv_set_ops`); the STREAMING form
(`raptor_service_spark.streaming.kmv`) maintains the identical sketch as
keyed state and must converge to this batch output exactly.

Reference analog: the per-tree vector-count preflights of
services/core/build_tree_service.py:85-100, generalized to the sketch
every level of a 10^12-row table needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KMV_DENOM = float(1 << 48)


def kmv_hash_col(key) -> "F.Column":
    """md5-uniform hash in (0, 1): identical doubles in Spark, DuckDB, and
    the streaming kernel's hashlib twin (exact integer / power-of-two)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast("long")
        / F.lit(KMV_DENOM)
    )


def kmv_hash_py(key: int) -> float:
    import hashlib

    return int(hashlib.md5(str(key).encode()).hexdigest()[:12], 16) / KMV_DENOM


def kmv_distinct_agg(
    pairs: DataFrame, k: int = 32, group_col: str = "cell", key_col: str = "user_id"
) -> DataFrame:
    """Per-group exact distinct count + KMV estimate over (group, key) rows.

    One dedupe agg + one group-keyed rank window; output columns
    (group_col, n_exact, n_kmv)."""
    from pyspark.sql import Window

    dedup = pairs.select(group_col, key_col).distinct()
    ranked = dedup.withColumn("h", kmv_hash_col(F.col(key_col))).withColumn(
        "rk",
        F.row_number().over(Window.partitionBy(group_col).orderBy("h", key_col)),
    )
    per = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("hk").isNotNull(), F.round(F.lit(float(k - 1)) / F.col("hk"), 6)
    ).otherwise(F.col("n_exact").cast("double"))
    return per.select(group_col, "n_exact", est.alias("n_kmv"))


# --- HyperLogLog (256 registers) --------------------------------------------

HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def hll_jrho_py(key) -> tuple[int, int]:
    """(register, rank) for one key: h = first 15 hex chars of md5(str(key))
    as a 60-bit int; j = h mod 256; rank = trailing zeros of h>>8, plus 1
    (53 when the remainder is all zeros). Exact integer twin of the Column
    form in __spark_entry__.q_hll_distinct and of the SQL oracle."""
    import hashlib

    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    j, w = h % HLL_M, h // HLL_M
    if w == 0:
        return j, 53
    return j, ((w & -w).bit_length() - 1) + 1


def hll_estimate(regs) -> float:
    """Estimator over a 256-slot register array (0 = empty): α·m²/Σ2^-M
    with the linear-counting small-range branch. Σ2^-M is computed as the
    EXACT integer Σ2^(53-M) (ranks are ≤ 53), so the sum is
    order-independent — the property that makes the streaming state's
    estimate equal the batch twin's bit for bit. Unrounded; callers round
    HALF_UP to 3 dp (the cross-engine display convention)."""
    import math

    s_int = sum(1 << (53 - int(m)) for m in regs)
    zero = sum(1 for m in regs if int(m) == 0)
    raw = HLL_ALPHA * HLL_M * HLL_M * float(2**53) / float(s_int)
    if raw <= 2.5 * HLL_M and zero > 0:
        return HLL_M * math.log(HLL_M / zero)
    return raw


def hll_distinct_agg(
    pairs: DataFrame, group_col: str = "grp", key_col: str = "user_id"
) -> DataFrame:
    """Per-group exact distinct + HLL-256 estimate over (group, key) rows —
    the batch twin of streaming/hll.py (same md5 register arithmetic as the
    global q_hll_distinct). ONE partial+final agg to (groups × ≤256) rows,
    then scalar math; output (group_col, n_exact, hll_est)."""
    g, k = F.col(group_col), F.col(key_col)
    h = F.conv(F.substring(F.md5(k.cast("string")), 1, 15), 16, 10).cast("long")
    hashed = pairs.select(g.alias("_g"), h.alias("h")).selectExpr(
        "_g", "h % 256 AS j", "h DIV 256 AS w"
    )
    regs = (
        hashed.withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(53)).otherwise(
                F.expr("bit_count((w & -w) - 1) + 1")
            ),
        )
        .groupBy("_g", "j")
        .agg(F.max("rho").alias("m"))
    )
    sums = regs.groupBy("_g").agg(
        F.count(F.lit(1)).alias("occ"),
        # EXACT integer register sum (order-independent): Σ 2^(53-m)
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - m)")).alias("s_int"),
    )
    exact = pairs.select(g.alias("_g"), k.alias("_k")).distinct().groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    raw = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(float(2**53)) / (
        (F.lit(HLL_M) - F.col("occ")).cast("long") * F.lit(2**53) + F.col("s_int")
    ).cast("double")
    zero = F.lit(HLL_M) - F.col("occ")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zero.cast("double")),
    ).otherwise(raw)
    return (
        sums.join(exact, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_exact",
            F.round(est, 3).alias("hll_est"),
        )
    )
