"""Stream-stream interval join (click → purchase attribution) == the batch
join exactly, including pairs whose two sides arrive in different
micro-batches (the state-buffering semantics the watermark bounds)."""
from __future__ import annotations

import datetime as dt
import os

import numpy as np

from raptor_service_spark.streaming.interval_join import (
    click_attribution_batch,
    click_attribution_stream,
)

EV_SCHEMA = "user_id long, event_id long, ts timestamp, event_type string"
TYPES = ["view", "click", "purchase", "error", "signup"]


def _event_rows(n_users=8, n_ev=50, seed=5):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 6, 1)
    rows, eid = [], 0
    for u in range(n_users):
        for i in range(n_ev):
            rows.append(
                (
                    u,
                    eid,
                    base + dt.timedelta(seconds=200 * i + 13 * u),
                    TYPES[int(rng.integers(0, len(TYPES)))],
                )
            )
            eid += 1
    return rows


def _sorted_pdf(df):
    return (
        df.orderBy("user_id", "click_id", "purchase_id")
        .toPandas()
        .reset_index(drop=True)
    )


def test_stream_interval_join_equals_batch(spark, tmp_path):
    rows = _event_rows()
    batch = spark.createDataFrame(rows, EV_SCHEMA)
    expected = _sorted_pdf(click_attribution_batch(batch))
    assert len(expected) > 10  # the corpus actually produces attributions

    src = str(tmp_path / "ij_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    s1 = spark.readStream.schema(EV_SCHEMA).parquet(src)
    s2 = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (
        click_attribution_stream(s1, s2)
        .writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _sorted_pdf(spark.table("ij_out"))
    assert got.equals(expected)


def test_stream_interval_join_straddles_microbatches(spark, tmp_path):
    """Clicks land in micro-batch 1, their purchases in micro-batch 2 —
    the buffered click state must still produce the pair."""
    base = dt.datetime(2024, 6, 1)
    early = [
        (1, 1, base, "click"),
        (1, 2, base + dt.timedelta(minutes=5), "click"),
        (2, 3, base, "click"),
    ]
    late = [
        (1, 4, base + dt.timedelta(minutes=20), "purchase"),  # matches 1 AND 2
        (2, 5, base + dt.timedelta(minutes=45), "purchase"),  # outside horizon
    ]
    src = str(tmp_path / "ij_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    s1 = spark.readStream.schema(EV_SCHEMA).parquet(src)
    s2 = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (
        click_attribution_stream(s1, s2)
        .writeStream.format("memory")
        .queryName("ij_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = _sorted_pdf(spark.table("ij_out2"))
    all_rows = spark.createDataFrame(early + late, EV_SCHEMA)
    expected = _sorted_pdf(click_attribution_batch(all_rows))
    assert got.equals(expected)
    assert set(got["purchase_id"]) == {4}  # the 45-min purchase matched nothing
    assert len(got) == 2  # purchase 4 attributed to BOTH clicks 1 and 2
