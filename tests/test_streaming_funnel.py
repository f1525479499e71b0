"""Streaming funnel stage machine == batch sequential-min funnel, exactly,
including stage advances that straddle micro-batches."""
from __future__ import annotations

import datetime as dt
import os

import numpy as np

from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.funnel import (
    funnel_stages_batch,
    funnel_stages_stream,
)

EV_SCHEMA = "user_id long, event_id long, ts timestamp, event_type string"
TYPES = ["view", "click", "purchase", "error", "signup"]


def _event_rows(n_users=10, n_ev=60, seed=7):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 6, 1)
    rows = []
    eid = 0
    for u in range(n_users):
        for i in range(n_ev):
            rows.append(
                (
                    u,
                    eid,
                    base + dt.timedelta(seconds=50 * i + u),
                    TYPES[int(rng.integers(0, len(TYPES)))],
                )
            )
            eid += 1
    return rows


def _sorted_pdf(df):
    return df.orderBy("user_id", "stage").toPandas().reset_index(drop=True)


def test_stream_funnel_equals_batch(spark, tmp_path):
    rows = _event_rows()
    batch = spark.createDataFrame(rows, EV_SCHEMA)
    expected = _sorted_pdf(funnel_stages_batch(batch))
    assert len(expected) > 15  # most users should complete several stages

    src = str(tmp_path / "fn_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = run_stream_to_memory(
        funnel_stages_stream(stream), "fn_out", output_mode="append"
    )
    q.awaitTermination(120)
    got = _sorted_pdf(spark.table("fn_out"))
    assert got.equals(expected)


def test_stream_funnel_straddles_microbatches(spark, tmp_path):
    """Views land in micro-batch 1, many clicks/purchases in batch 2 — the
    (stage, anchor) state must carry across the boundary."""
    rows = _event_rows(n_users=6, n_ev=40, seed=19)
    cut = dt.datetime(2024, 6, 1, 0, 10, 0)
    early = [r for r in rows if r[2] < cut]
    late = [r for r in rows if r[2] >= cut]
    assert early and late

    src = str(tmp_path / "fn_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (
        funnel_stages_stream(stream)
        .writeStream.format("memory")
        .queryName("fn_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    n_first = spark.table("fn_out2").count()
    spark.createDataFrame(late, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = _sorted_pdf(spark.table("fn_out2"))
    expected = _sorted_pdf(funnel_stages_batch(spark.createDataFrame(rows, EV_SCHEMA)))
    assert got.equals(expected)
    assert 0 < n_first < len(expected)


def test_stream_funnel_never_retreats_and_orders_strictly(spark, tmp_path):
    """A purchase BEFORE the first view must not advance the funnel; a
    click at the exact view timestamp advances only if its event_id is
    greater (strict (ts, event_id) order)."""
    base = dt.datetime(2024, 6, 2)
    rows = [
        # user 1: purchase first (ignored), then view -> click
        (1, 100, base, "purchase"),
        (1, 101, base + dt.timedelta(seconds=1), "view"),
        (1, 102, base + dt.timedelta(seconds=2), "click"),
        # user 2: click ties the view's ts with SMALLER event_id -> no advance
        (2, 201, base + dt.timedelta(seconds=1), "click"),
        (2, 202, base + dt.timedelta(seconds=1), "view"),
        # user 3: click ties the view's ts with LARGER event_id -> advance
        (3, 301, base + dt.timedelta(seconds=1), "view"),
        (3, 302, base + dt.timedelta(seconds=1), "click"),
    ]
    batch = spark.createDataFrame(rows, EV_SCHEMA)
    expected = _sorted_pdf(funnel_stages_batch(batch))

    src = str(tmp_path / "fn_src3")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = run_stream_to_memory(funnel_stages_stream(stream), "fn_out3", output_mode="append")
    q.awaitTermination(120)
    got = _sorted_pdf(spark.table("fn_out3"))
    assert got.equals(expected)

    per_user = {
        (r.user_id, r.stage): r.event_id for r in spark.table("fn_out3").collect()
    }
    assert per_user[(1, 1)] == 101 and per_user[(1, 2)] == 102
    assert (2, 2) not in per_user  # tie with smaller eid does not advance
    assert per_user[(3, 2)] == 302  # tie with larger eid advances
