"""Streaming cell transitions == batch transitions, exactly, including a
move straddling two micro-batches; and the OD matrix folded from the
emitted stream equals the batch OD matrix."""
from __future__ import annotations

import datetime as dt
import os

import numpy as np
from pyspark.sql import functions as F

from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.trajectory import (
    cell_transitions_batch,
    cell_transitions_stream,
)

PTS_SCHEMA = "user_id long, pid long, ts timestamp, lat double, lng double"
RES = 3


def _walk_rows(n_users=6, n_pts=70, seed=47):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows, pid = [], 0
    for u in range(n_users):
        lat, lng = float(rng.uniform(-50, 50)), float(rng.uniform(-120, 120))
        for i in range(n_pts):
            lat = float(np.clip(lat + rng.normal(0, 12), -80, 80))
            lng = float(np.clip(lng + rng.normal(0, 12), -170, 170))
            rows.append((u, pid, base + dt.timedelta(seconds=60 * i + u), lat, lng))
            pid += 1
    return rows


def _sorted_pdf(df):
    return df.orderBy("user_id", "pid").toPandas().reset_index(drop=True)


def test_stream_transitions_equal_batch(spark, tmp_path):
    rows = _walk_rows()
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    expected = _sorted_pdf(cell_transitions_batch(batch, RES))
    assert len(expected) > 20

    src = str(tmp_path / "traj_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = run_stream_to_memory(
        cell_transitions_stream(stream, RES), "traj_out", output_mode="append"
    )
    q.awaitTermination(120)
    got = _sorted_pdf(spark.table("traj_out"))
    assert got.equals(expected)


def test_od_matrix_from_stream_matches_batch(spark, tmp_path):
    # two micro-batches split by time; fold the emitted transitions into the
    # OD matrix and compare against the one-shot batch aggregation
    rows = _walk_rows(n_users=4, n_pts=50, seed=53)
    cut = dt.datetime(2024, 5, 1, 0, 20, 0)
    early = [r for r in rows if r[2] < cut]
    late = [r for r in rows if r[2] >= cut]
    assert early and late

    src = str(tmp_path / "traj_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, PTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = (
        cell_transitions_stream(stream, RES)
        .writeStream.format("memory")
        .queryName("traj_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, PTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    got_od = (
        spark.table("traj_out2")
        .groupBy("cell_from", "cell_to")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cell_from", "cell_to")
        .toPandas()
    )
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    want_od = (
        cell_transitions_batch(batch, RES)
        .groupBy("cell_from", "cell_to")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cell_from", "cell_to")
        .toPandas()
    )
    assert got_od.equals(want_od)
