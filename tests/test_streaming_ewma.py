"""Streaming EWMA monitor == the shared pure-Python fold, exactly —
including folds straddling micro-batches, state restoration, out-of-order
drops, and anomaly detection on a planted spike."""
from __future__ import annotations

import os

import numpy as np

from raptor_service_spark.streaming.ewma import ewma_fold, ewma_stream

SCHEMA = "cell long, hr long, n long"


def _rows(n_cells=3, hours=48, seed=21):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_cells):
        base = 20 + 10 * c
        for h in range(hours):
            n = int(base + rng.integers(-5, 6))
            if c == 0 and h == 40:
                n = base * 6  # planted spike
            rows.append((c, h, n))
    return rows


def _ref(rows):
    by_c = {}
    for c, h, n in sorted(rows, key=lambda r: (r[0], r[1])):
        by_c.setdefault(c, []).append((h, n))
    out = {}
    for c, hn in by_c.items():
        _, emitted = ewma_fold(None, hn)
        out[c] = emitted
    return out


def test_stream_ewma_equals_python_fold(spark, tmp_path):
    rows = _rows()
    ref = _ref(rows)
    src = str(tmp_path / "ew_src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows, SCHEMA).coalesce(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    from raptor_service_spark.streaming.events import run_stream_to_memory

    q = run_stream_to_memory(ewma_stream(stream), "ew_out", "append")
    q.awaitTermination(120)
    got = {}
    for r in spark.table("ew_out").collect():
        got.setdefault(r.cell, []).append((r.hr, r.n, r.baseline, r.ratio))
    for c in ref:
        assert sorted(got[c]) == sorted(ref[c]), c
    # the planted spike is the top ratio for cell 0
    top = max(got[0], key=lambda e: e[3])
    assert top[0] == 40 and top[3] > 3.0


def test_stream_ewma_straddles_microbatches(spark, tmp_path):
    rows = _rows(n_cells=2, hours=30, seed=33)
    ref = _ref(rows)
    early = [r for r in rows if r[1] < 15]
    late = [r for r in rows if r[1] >= 15]
    src = str(tmp_path / "ew_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ew_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    out = spark.table("ew_out2").collect()
    assert max(r.batch_seq for r in out) >= 2  # state restored
    got = {}
    for r in out:
        got.setdefault(r.cell, []).append((r.hr, r.n, r.baseline, r.ratio))
    for c in ref:
        assert sorted(got[c]) == sorted(ref[c]), c


def test_out_of_order_hours_dropped():
    state, emitted = ewma_fold(None, [(1, 10), (2, 12)])
    state2, emitted2 = ewma_fold(state, [(1, 99), (2, 99), (3, 11)])
    assert [e[0] for e in emitted2] == [3]  # hr 1, 2 replays dropped
    # baseline for hr 3 reflects hr-1/2 history, not the replayed 99s
    assert emitted2[0][2] < 20
