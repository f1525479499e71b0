"""Streaming PSI drift monitor == batch PSI with the same fixed bounds,
exactly — the histogram state is the sufficient statistic, so the final
emission per type matches `psi_batch` even when the histograms accumulate
across micro-batches."""
from __future__ import annotations

import os

import numpy as np

from raptor_service_spark.streaming.drift import psi_batch, psi_stream
from raptor_service_spark.streaming.events import run_stream_to_memory

SCHEMA = "event_type string, par int, value double"
LO, HI, BINS = 0.0, 100.0, 10


def _rows(seed=13, n=4000):
    rng = np.random.default_rng(seed)
    types = ["click", "view", "error"]
    rows = []
    for i in range(n):
        t = types[i % 3]
        par = int(i % 2)
        # arm 1 of 'click' drifts upward — PSI must be largest there
        base = 70.0 if (t == "click" and par == 1) else 40.0
        rows.append((t, par, float(np.round(rng.normal(base, 15.0), 2))))
    return rows


def _last_per_type(rows):
    last = {}
    for r in rows:
        if r.event_type not in last or r.batch_seq > last[r.event_type].batch_seq:
            last[r.event_type] = r
    return last


def test_stream_psi_equals_batch(spark, tmp_path):
    rows = _rows()
    batch = spark.createDataFrame(rows, SCHEMA)
    expected = {
        r.event_type: (r.n_base, r.n_cur, r.psi)
        for r in psi_batch(batch, LO, HI, BINS).collect()
    }
    # the drifted arm is detectable
    assert expected["click"][2] > 0.2 > expected["view"][2]

    src = str(tmp_path / "psi_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = run_stream_to_memory(psi_stream(stream, LO, HI, BINS), "psi_out", "append")
    q.awaitTermination(120)
    last = _last_per_type(spark.table("psi_out").collect())
    assert set(last) == set(expected)
    for t, r in last.items():
        nb, nc, psi = expected[t]
        assert (r.n_base, r.n_cur) == (nb, nc)
        assert r.psi == psi, (t, r.psi, psi)


def test_stream_psi_straddles_microbatches(spark, tmp_path):
    rows = _rows(seed=29, n=3000)
    early, late = rows[: len(rows) // 2], rows[len(rows) // 2 :]
    batch = spark.createDataFrame(rows, SCHEMA)
    expected = {
        r.event_type: r.psi for r in psi_batch(batch, LO, HI, BINS).collect()
    }

    src = str(tmp_path / "psi_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        psi_stream(stream, LO, HI, BINS)
        .writeStream.format("memory")
        .queryName("psi_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    out = spark.table("psi_out2").collect()
    assert max(r.batch_seq for r in out) >= 2  # state actually carried over
    last = _last_per_type(out)
    for t, r in last.items():
        assert r.psi == expected[t], (t, r.psi, expected[t])
