"""Streaming geofence transitions == batch transitions, exactly (no open
tail), including a transition that straddles two micro-batches."""
from __future__ import annotations

import datetime as dt
import os

import numpy as np

from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.geofence import (
    fence_transitions_batch,
    fence_transitions_stream,
)

FENCE = [(10.0, 20.0), (40.0, 60.0), (-20.0, 70.0)]  # (lat, lng), convex
PTS_SCHEMA = "user_id long, pid long, ts timestamp, lat double, lng double"


def _walk_rows(n_users=8, n_pts=80, seed=23):
    """Per-user random walks spanning the fence so edges are frequent."""
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows = []
    pid = 0
    for u in range(n_users):
        lat, lng = float(rng.uniform(-30, 50)), float(rng.uniform(0, 90))
        for i in range(n_pts):
            lat = float(np.clip(lat + rng.normal(0, 8), -60, 70))
            lng = float(np.clip(lng + rng.normal(0, 8), -30, 120))
            rows.append((u, pid, base + dt.timedelta(seconds=90 * i + u), lat, lng))
            pid += 1
    return rows


def _sorted_pdf(df):
    return (
        df.orderBy("user_id", "pid")
        .toPandas()
        .reset_index(drop=True)
    )


def test_stream_transitions_equal_batch(spark, tmp_path):
    rows = _walk_rows()
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    expected = _sorted_pdf(fence_transitions_batch(batch, FENCE))
    assert len(expected) > 10  # the walk must actually cross the fence

    src = str(tmp_path / "gf_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = run_stream_to_memory(
        fence_transitions_stream(stream, FENCE), "gf_out", output_mode="append"
    )
    q.awaitTermination(120)
    got = _sorted_pdf(spark.table("gf_out"))
    assert got.equals(expected)


def test_stream_transitions_straddle_microbatches(spark, tmp_path):
    # split by time so the state (last inside flag) carries a pending edge
    # across the micro-batch boundary for every user
    rows = _walk_rows(n_users=5, n_pts=60, seed=31)
    cut = dt.datetime(2024, 5, 1, 0, 45, 0)
    early = [r for r in rows if r[2] < cut]
    late = [r for r in rows if r[2] >= cut]
    assert early and late

    src = str(tmp_path / "gf_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, PTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = (
        fence_transitions_stream(stream, FENCE)
        .writeStream.format("memory")
        .queryName("gf_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    n_first = spark.table("gf_out2").count()
    spark.createDataFrame(late, PTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    got = _sorted_pdf(spark.table("gf_out2"))
    expected = _sorted_pdf(
        fence_transitions_batch(spark.createDataFrame(rows, PTS_SCHEMA), FENCE)
    )
    assert got.equals(expected)
    # both micro-batches must have contributed output
    assert 0 < n_first < len(expected)
