"""Streaming CUSUM monitor == the shared pure-Python fold, exactly —
including warmup calibration, folds straddling micro-batches (state with a
None mu mid-warmup), alarm-reset behavior, and detection of a planted
level shift."""
from __future__ import annotations

import os

import numpy as np

from raptor_service_spark.streaming.cusum import cusum_fold, cusum_stream

SCHEMA = "cell long, hr long, n long"


def _rows(n_cells=3, hours=72, seed=29, shift_cell=0, shift_at=48):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_cells):
        base = 20 + 10 * c
        for h in range(hours):
            n = int(base + rng.integers(-3, 4))
            if c == shift_cell and h >= shift_at:
                n += base  # planted sustained level shift
            rows.append((c, h, n))
    return rows


def _ref(rows):
    by_c = {}
    for c, h, n in sorted(rows, key=lambda r: (r[0], r[1])):
        by_c.setdefault(c, []).append((h, n))
    out = {}
    for c, hn in by_c.items():
        _, emitted = cusum_fold(None, hn)
        out[c] = emitted
    return out


def test_stream_cusum_equals_python_fold(spark, tmp_path):
    rows = _rows()
    ref = _ref(rows)
    src = str(tmp_path / "cs_src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows, SCHEMA).coalesce(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    from raptor_service_spark.streaming.events import run_stream_to_memory

    q = run_stream_to_memory(cusum_stream(stream), "cs_out", "append")
    q.awaitTermination(120)
    got = {}
    for r in spark.table("cs_out").collect():
        got.setdefault(r.cell, []).append((r.hr, r.n, r.s_pos, r.s_neg, r.alarm))
    for c in ref:
        assert sorted(got[c]) == sorted(ref[c]), c
    # the planted shift raises an alarm in cell 0 shortly after hr 48,
    # and the clean cells never alarm
    alarms0 = [e[0] for e in got[0] if e[4]]
    assert alarms0 and 48 <= min(alarms0) <= 54
    for c in (1, 2):
        assert not any(e[4] for e in got[c])


def test_stream_cusum_straddles_microbatches(spark, tmp_path):
    rows = _rows(n_cells=2, hours=60, seed=31)
    ref = _ref(rows)
    # split INSIDE the warmup window: the restored state carries a
    # mid-warmup (warm_n, warm_sum, mu=None) across the batch boundary
    early = [r for r in rows if r[1] < 10]
    late = [r for r in rows if r[1] >= 10]
    src = str(tmp_path / "cs_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        cusum_stream(stream)
        .writeStream.format("memory")
        .queryName("cs_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    out = spark.table("cs_out2").collect()
    assert max(r.batch_seq for r in out) >= 2  # state restored
    got = {}
    for r in out:
        got.setdefault(r.cell, []).append((r.hr, r.n, r.s_pos, r.s_neg, r.alarm))
    for c in ref:
        assert sorted(got[c]) == sorted(ref[c]), c


def test_alarm_resets_both_sides():
    # constant 10s calibrate mu=10; then a huge spike trips s_pos and the
    # NEXT row starts from a zeroed accumulator
    rows = [(h, 10) for h in range(24)] + [(24, 200), (25, 10)]
    _, emitted = cusum_fold(None, rows)
    spike = [e for e in emitted if e[0] == 24][0]
    after = [e for e in emitted if e[0] == 25][0]
    assert spike[4] is True and spike[2] > 0
    # post-reset: s_pos restarts from 0 + (10 - 10 - 2.5) -> clamped to 0
    assert after[2] == 0.0 and after[4] is False


def test_out_of_order_hours_dropped():
    rows = [(h, 10) for h in range(26)]
    state, emitted = cusum_fold(None, rows)
    state2, emitted2 = cusum_fold(state, [(20, 99), (25, 99), (26, 10)])
    assert [e[0] for e in emitted2] == [26]  # replays dropped
    # warmup counters unchanged by replays
    assert state2[0] == state[0] and state2[1] == state[1]
