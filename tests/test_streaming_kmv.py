"""Streaming KMV sketch == batch relational KMV, exactly: the bounded
bottom-k keyed state converges to the oracle-checked batch estimate,
including sketches whose k smallest hashes straddle micro-batches."""
from __future__ import annotations

import os

import numpy as np

from raptor_service_spark.operators.sketches import (
    kmv_distinct_agg,
    kmv_hash_col,
    kmv_hash_py,
)
from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.kmv import kmv_stream

PTS_SCHEMA = "cell long, user_id long"
K = 16


def _rows(n_cells=5, users_per_cell=60, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_cells):
        # overlapping user ranges; some cells below k after dedup
        n = users_per_cell if c % 2 == 0 else K // 2
        for u in rng.choice(1000, size=n, replace=False):
            rows.append((c, int(u)))
            if u % 3 == 0:  # duplicates the sketch must ignore
                rows.append((c, int(u)))
    return rows


def test_py_hash_matches_column_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "user_id long")
    got = {
        r.user_id: r.h
        for r in df.withColumn("h", kmv_hash_col(df.user_id)).collect()
    }
    for u, h in got.items():
        assert h == kmv_hash_py(u), u


def test_stream_kmv_equals_batch(spark, tmp_path):
    rows = _rows()
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    expected = {
        r.cell: (r.n_exact, r.n_kmv)
        for r in kmv_distinct_agg(batch, k=K).collect()
    }
    assert any(n >= K for n, _ in expected.values())  # some sketches full
    assert any(n < K for n, _ in expected.values())  # some exact-below-k

    src = str(tmp_path / "kmv_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = run_stream_to_memory(kmv_stream(stream, k=K), "kmv_out", "append")
    q.awaitTermination(120)
    out = spark.table("kmv_out").collect()
    last = {}
    for r in out:
        if r.cell not in last or r.batch_seq > last[r.cell].batch_seq:
            last[r.cell] = r
    assert set(last) == set(expected)
    for cell, r in last.items():
        n_exact, n_kmv = expected[cell]
        assert r.kmv_est == n_kmv, (cell, r.kmv_est, n_kmv)
        assert r.n_sketch == min(n_exact, K)


def test_stream_kmv_straddles_microbatches(spark, tmp_path):
    rows = _rows(n_cells=3, users_per_cell=80, seed=11)
    # split so each cell's smallest hashes are scattered across batches
    early = [r for i, r in enumerate(rows) if i % 2 == 0]
    late = [r for i, r in enumerate(rows) if i % 2 == 1]
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    expected = {
        r.cell: r.n_kmv for r in kmv_distinct_agg(batch, k=K).collect()
    }

    src = str(tmp_path / "kmv_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, PTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = (
        kmv_stream(stream, k=K)
        .writeStream.format("memory")
        .queryName("kmv_out2")
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
    out = spark.table("kmv_out2").collect()
    # at least two micro-batches actually ran (state was restored)
    assert max(r.batch_seq for r in out) >= 2
    last = {}
    for r in out:
        if r.cell not in last or r.batch_seq > last[r.cell].batch_seq:
            last[r.cell] = r
    for cell, r in last.items():
        assert r.kmv_est == expected[cell], (cell, r.kmv_est, expected[cell])
