"""Streaming space-saving top-k: exact == groupBy counts when capacity
covers the vocabulary; pure-Python reference parity + the (est, err)
sandwich under eviction pressure; state restored across micro-batches."""
from __future__ import annotations

import os
from collections import Counter

import numpy as np

from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.topk import spacesaving_fold, topk_stream

SCHEMA = "grp long, ord long, term string"
VOCAB = ["join", "scan", "hash", "sort", "agg", "merge", "filter", "window",
         "spill", "codegen", "shuffle", "broadcast"]


def _rows(n_grps=3, n=400, seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_grps):
        # Zipf-ish skew: low ids much more frequent
        draws = rng.zipf(1.6, size=n)
        for i, z in enumerate(draws):
            rows.append((g, i, VOCAB[min(int(z) - 1, len(VOCAB) - 1)]))
    return rows


def _last_state(out):
    max_seq = {}
    for r in out:
        max_seq[r.grp] = max(max_seq.get(r.grp, 0), r.batch_seq)
    state = {g: {} for g in max_seq}
    for r in out:
        if r.batch_seq == max_seq[r.grp]:
            state[r.grp][r.term] = (r.cnt, r.err)
    return state


def test_exact_when_capacity_covers_vocab(spark, tmp_path):
    rows = _rows()
    src = str(tmp_path / "tk_src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows, SCHEMA).coalesce(4).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = run_stream_to_memory(topk_stream(stream, m=len(VOCAB)), "tk_out", "append")
    q.awaitTermination(120)
    state = _last_state(spark.table("tk_out").collect())
    truth = {}
    for g, _, t in rows:
        truth.setdefault(g, Counter())[t] += 1
    assert set(state) == set(truth)
    for g in truth:
        got = {t: c for t, (c, e) in state[g].items()}
        assert got == dict(truth[g])
        assert all(e == 0 for _, (_, e) in state[g].items())


def test_eviction_bounds_and_python_parity(spark, tmp_path):
    m = 4
    rows = _rows(n_grps=2, n=300, seed=29)
    # python reference folds per group in ord order, across batch split
    early = [r for r in rows if r[1] < 150]
    late = [r for r in rows if r[1] >= 150]
    ref = {}
    for part in (early, late):
        by_g = {}
        for g, o, t in sorted(part, key=lambda r: r[1]):
            by_g.setdefault(g, []).append(t)
        for g, terms in by_g.items():
            ref[g] = spacesaving_fold(ref.get(g, {}), terms, m)

    src = str(tmp_path / "tk_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        topk_stream(stream, m=m)
        .writeStream.format("memory")
        .queryName("tk_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    out = spark.table("tk_out2").collect()
    assert max(r.batch_seq for r in out) >= 2
    state = _last_state(out)
    truth = {}
    for g, _, t in rows:
        truth.setdefault(g, Counter())[t] += 1
    for g, counters in state.items():
        assert counters == {t: v for t, v in ref[g].items()}  # kernel parity
        assert len(counters) <= m
        n = sum(truth[g].values())
        for t, (c, e) in counters.items():
            true_c = truth[g][t]
            assert c >= true_c, (t, c, true_c)  # overestimate only
            assert c - e <= true_c, (t, c, e, true_c)  # error-bounded
        # every term above the n/m guarantee threshold is tracked
        for t, true_c in truth[g].items():
            if true_c > n / m:
                assert t in counters, (t, true_c, n / m)
