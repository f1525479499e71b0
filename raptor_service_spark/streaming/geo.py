"""Structured Streaming over geo-tagged points: live tile counts.

Graft-new streaming coverage for the spatial tier (the reference has no
dataflow streaming at all — see streaming/events.py header): the per-cell
occupancy that tile_histogram / tile_pyramid materialize in batch, kept
fresh from a point stream. One definition runs in BOTH modes — the batch
twin is what the parity test and the DuckDB-shaped checks compare against.

Streaming posture: the grid encode is the same whole-stage-codegen
arithmetic as batch (geo/grid.py cell_encode_col — no UDF in the hot path),
the state is the windowed per-cell count map (bounded by watermark x
occupied cells, NOT by points), and hot-cell skew hits the same partial
aggregation map-side combine as batch before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import cell_encode_col

POINTS_SCHEMA = "pid long, ts timestamp, lat double, lng double"


def windowed_tile_counts(
    points: DataFrame,
    res: int,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Tumbling-window per-cell point counts; watermark bounds state when
    streaming. Output: (window_start, cell, n_points)."""
    src = points
    if watermark and points.isStreaming:
        src = points.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window).alias("w"),
            cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_points")
    )


def stream_points_from_dir(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(POINTS_SCHEMA).parquet(path)
