"""Streaming teleport detection == batch detection, exactly (no open
tail), including the leg that straddles two micro-batches (previous fix
restored from state)."""
from __future__ import annotations

import datetime as dt
import os

import numpy as np

from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.teleport import (
    teleport_batch,
    teleport_stream,
)

PTS_SCHEMA = "user_id long, pid long, ts timestamp, lat double, lng double"
MAX_KMH = 500.0


def _track_rows(n_users=6, n_pts=60, seed=41, jump_every=9):
    """Slow per-user walks with an occasional continental jump — the jumps
    are the teleports the screen must flag."""
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = []
    pid = 0
    for u in range(n_users):
        lat, lng = float(rng.uniform(-50, 50)), float(rng.uniform(-120, 120))
        for i in range(n_pts):
            if i and i % jump_every == 0:
                lat = float(np.clip(lat + rng.uniform(20, 40), -80, 80))
                lng = float(np.clip(lng + rng.uniform(30, 60), -170, 170))
            else:
                lat = float(np.clip(lat + rng.normal(0, 0.01), -80, 80))
                lng = float(np.clip(lng + rng.normal(0, 0.01), -170, 170))
            rows.append((u, pid, base + dt.timedelta(seconds=600 * i + u), lat, lng))
            pid += 1
    return rows


def _sorted_pdf(df):
    return df.orderBy("user_id", "pid").toPandas().reset_index(drop=True)


def test_stream_teleports_equal_batch(spark, tmp_path):
    rows = _track_rows()
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    expected = _sorted_pdf(teleport_batch(batch, MAX_KMH))
    assert len(expected) > 10  # the jumps must actually trip the threshold
    n_legs = len(rows) - 6
    assert len(expected) < n_legs / 2  # ...but normal walking must not

    src = str(tmp_path / "tp_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = run_stream_to_memory(
        teleport_stream(stream, MAX_KMH), "tp_out", output_mode="append"
    )
    q.awaitTermination(120)
    got = _sorted_pdf(spark.table("tp_out"))
    assert got.equals(expected)


def test_stream_teleports_straddle_microbatches(spark, tmp_path):
    # cut mid-track so the previous fix for every user lives in state when
    # the second micro-batch's first leg (possibly a jump) arrives
    rows = _track_rows(n_users=4, n_pts=40, seed=43)
    cut = dt.datetime(2024, 6, 1, 3, 0, 0)
    early = [r for r in rows if r[2] < cut]
    late = [r for r in rows if r[2] >= cut]
    assert early and late

    src = str(tmp_path / "tp_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, PTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = (
        teleport_stream(stream, MAX_KMH)
        .writeStream.format("memory")
        .queryName("tp_out2")
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

    got = _sorted_pdf(spark.table("tp_out2"))
    expected = _sorted_pdf(
        teleport_batch(spark.createDataFrame(rows, PTS_SCHEMA), MAX_KMH)
    )
    assert got.equals(expected)


def test_stream_equal_ts_across_microbatches(spark, tmp_path):
    """An event whose ts EQUALS the stored fix (larger pid) must be kept
    and advance the chain — the batch lag window keeps it, so the stream
    must too (round-2 advice: strict ts> dropped it). The kept event is a
    continental jump away, so the NEXT leg's speed depends on it: dropping
    it would mis-anchor that leg and flip the flag."""
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    t1 = t0 + dt.timedelta(minutes=10)
    early = [(7, 0, t0, 10.0, 10.0), (7, 1, t1, 10.001, 10.001)]
    late = [
        (7, 2, t1, 45.0, 80.0),  # equal ts, larger pid: dt=0 leg, advances chain
        (7, 3, t1 + dt.timedelta(minutes=10), 45.001, 80.001),
        (7, 4, t1 + dt.timedelta(minutes=20), 10.0, 10.0),  # jump back -> flag
    ]
    rows = early + late

    src = str(tmp_path / "tp_src3")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, PTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = (
        teleport_stream(stream, MAX_KMH)
        .writeStream.format("memory")
        .queryName("tp_out3")
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

    got = _sorted_pdf(spark.table("tp_out3"))
    expected = _sorted_pdf(
        teleport_batch(spark.createDataFrame(rows, PTS_SCHEMA), MAX_KMH)
    )
    # Batch flags ONLY pid=4 (the jump back). pid=3's leg is slow when
    # anchored at the equal-ts fix (45, 80); with the old strict-> drop the
    # stream anchored it at pid=1 (10, 10) instead and spuriously flagged
    # pid=3 — equality of the two sides is the whole assertion.
    assert expected["pid"].tolist() == [4]
    assert got.equals(expected)


def test_round_half_up_matches_spark_round(spark):
    """np.round is half-to-even; the stream kernel must round HALF_UP like
    F.round. Pin exact .xxxxxx5 values both ways."""
    from pyspark.sql import functions as F

    from raptor_service_spark.streaming.teleport import _round_half_up6

    vals = [0.0000005, 0.0000015, 1.0000025, 2.0000035, 123.4567895]
    got = _round_half_up6(np.array(vals, dtype=np.float64))
    exp = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6))
        .collect()
    ]
    assert list(got) == exp
