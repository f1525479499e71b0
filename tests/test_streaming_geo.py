"""Streaming tile counts == batch tile counts (availableNow parity), and a
multi-microbatch run with late-but-inside-watermark data."""
from __future__ import annotations

import datetime as dt
import os

import numpy as np
from pyspark.sql import functions as F

from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.geo import (
    POINTS_SCHEMA,
    stream_points_from_dir,
    windowed_tile_counts,
)


def _point_rows(n=600, seed=13):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base + dt.timedelta(seconds=int(rng.integers(0, 6 * 3600))),
                float(rng.uniform(-85, 85)),
                float(rng.uniform(-180, 180)),
            )
        )
    return rows


def test_streaming_tile_counts_match_batch(spark, tmp_path):
    rows = _point_rows()
    batch = spark.createDataFrame(rows, POINTS_SCHEMA)
    expected = (
        windowed_tile_counts(batch, res=4)
        .orderBy("window_start", "cell")
        .toPandas()
    )

    src = str(tmp_path / "pts_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)

    stream = stream_points_from_dir(spark, src)
    assert stream.isStreaming
    q = run_stream_to_memory(windowed_tile_counts(stream, res=4), "tile_counts")
    q.awaitTermination(120)
    got = spark.table("tile_counts").orderBy("window_start", "cell").toPandas()
    assert got.equals(expected)


def test_streaming_tile_counts_multibatch_late_data(spark, tmp_path):
    # second micro-batch delivers events with earlier timestamps than the
    # first (late, but within the 2h watermark): complete-mode output must
    # still equal the batch aggregation of the union.
    rows = _point_rows(300, seed=17)
    early = [r for r in rows if r[1].hour >= 2]
    late = [r for r in rows if r[1].hour < 2]

    src = str(tmp_path / "pts_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, POINTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = stream_points_from_dir(spark, src)
    agg = windowed_tile_counts(stream, res=3, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tile_counts2")
        .outputMode("complete")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, POINTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    got = spark.table("tile_counts2").orderBy("window_start", "cell").toPandas()
    expected = (
        windowed_tile_counts(spark.createDataFrame(rows, POINTS_SCHEMA), res=3)
        .orderBy("window_start", "cell")
        .toPandas()
    )
    assert got.equals(expected)
