"""Bucketed table layout for co-located joins (SCALE.md / brief: "bucketing
for co-located joins").

Writing both sides of a recurring equi-join bucketed by the join key (same
bucket count) lets Spark plan the join WITHOUT an Exchange on either side:
each task zips bucket i of A with bucket i of B. On a 100 TB corpus this is
the difference between re-shuffling the fact table on every join and paying
the shuffle ONCE at write time — the Hive-bucketing analog of Iceberg's
``bucket(N, key)`` partition transform the north_star layout would use.

Requires a session with ``spark.sql.sources.bucketing.enabled`` (default
true) and tables in the session catalog (``saveAsTable`` — bucket metadata
lives in the metastore, not the parquet files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_also: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``bucket_col``.

    Sorting within buckets additionally removes the per-task Sort from
    sort-merge joins (plan shows SortMergeJoin with neither Exchange nor
    Sort on the bucketed sides). Pass ``path`` to create an EXTERNAL table
    at an explicit location (bucket metadata still lands in the catalog).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_also:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — co-located, no
    shuffle of either side (verify: the physical plan has no Exchange)."""
    return spark.table(left_table).join(spark.table(right_table), on)
