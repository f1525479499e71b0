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
