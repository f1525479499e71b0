"""Streaming dedup parity: both variants equal batch first-seen winners
over time-ordered micro-batches (state carried across maxFilesPerTrigger=1
batches)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from raptor_service_spark.streaming.dedup import (
    dedup_stream_watermarked,
    first_seen_batch,
    first_seen_stream,
)

KEYS = ["user_id", "event_type"]
SCHEMA = "event_id long, ts timestamp, user_id long, value double, event_type string"


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 40)
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
                "value", "event_type")
    )


def _two_file_source(events, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").collect()[0].m
    first = events.filter(F.col("ts") <= cut).orderBy("ts", "event_id")
    second = events.filter(F.col("ts") > cut).orderBy("ts", "event_id")
    first.coalesce(1).write.parquet(src + "/p0")
    time.sleep(1.1)
    second.coalesce(1).write.parquet(src + "/p1")
    return src


def _run(out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_first_seen_stream_matches_batch(spark, events, tmp_path):
    src = _two_file_source(events, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/p*")
    )
    _run(first_seen_stream(stream, KEYS), tmp_path, "first_seen")
    got = {
        (r.user_id, r.event_type, r.ts, r.event_id)
        for r in spark.table("first_seen").collect()
    }
    want = {
        (r.user_id, r.event_type, r.ts, r.event_id)
        for r in first_seen_batch(events, KEYS).collect()
    }
    assert got == want
    assert len(want) > 50


def test_watermarked_dedup_emits_one_row_per_key(spark, events, tmp_path):
    src = _two_file_source(events, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/p*")
    )
    # delay longer than the corpus time range -> every duplicate suppressed
    _run(
        dedup_stream_watermarked(stream, KEYS, delay="3650 days"),
        tmp_path,
        "wm_dedup",
    )
    got = spark.table("wm_dedup")
    n_keys = events.select(*KEYS).distinct().count()
    assert got.count() == n_keys
    assert got.select(*KEYS).distinct().count() == n_keys
    # each emitted row is a real event
    assert (
        got.join(events, ["event_id", "user_id", "event_type"], "left_anti").count()
        == 0
    )
