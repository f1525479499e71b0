"""Stateful sessionization: numpy fold unit tests + streaming/batch parity
with state carried across micro-batches (maxFilesPerTrigger=1)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.streaming.sessions import (
    _close_sessions_np,
    closed_sessions_batch,
    sessionize_batch,
    sessionize_stream,
)

US = 1_000_000
GAP = 30 * 60 * US  # 30 min in us


def test_fold_single_session():
    ts = np.array([0, 10 * US, 20 * US])
    closed, open_seg = _close_sessions_np(ts, np.array([1.0, 2.0, 3.0]), None, GAP)
    assert closed == []
    assert open_seg == (20 * US, 0, 3, 6.0)


def test_fold_gap_splits():
    ts = np.array([0, 10 * US, GAP + 11 * US])
    closed, open_seg = _close_sessions_np(ts, np.ones(3), None, GAP)
    assert closed == [(0, 10 * US, 2, 2.0)]
    assert open_seg == (GAP + 11 * US, GAP + 11 * US, 1, 1.0)


def test_fold_state_continues():
    state = (5 * US, 0, 2, 4.0)  # open session: last=5s start=0 n=2 sv=4
    ts = np.array([10 * US])
    closed, open_seg = _close_sessions_np(ts, np.array([1.0]), state, GAP)
    assert closed == []
    assert open_seg == (10 * US, 0, 3, 5.0)


def test_fold_state_closes_first():
    state = (5 * US, 0, 2, 4.0)
    ts = np.array([GAP + 6 * US])
    closed, open_seg = _close_sessions_np(ts, np.array([1.0]), state, GAP)
    assert closed == [(0, 5 * US, 2, 4.0)]
    assert open_seg == (GAP + 6 * US, GAP + 6 * US, 1, 1.0)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 50)
        .select("event_id", "ts", "user_id", "value")
    )


def test_batch_sessions_shape(events):
    s = sessionize_batch(events, gap_minutes=30)
    n_sessions = s.count()
    n_users = events.select("user_id").distinct().count()
    assert n_sessions >= n_users  # at least one session per user
    # sessions never overlap per user: starts are strictly after previous ends
    bad = (
        s.alias("a")
        .join(s.alias("b"), "user_id")
        .filter(
            (F.col("a.sess_id") < F.col("b.sess_id"))
            & (F.col("b.session_start") <= F.col("a.session_end"))
        )
        .count()
    )
    assert bad == 0


def test_stream_matches_batch_across_microbatches(spark, events, tmp_path):
    # split input into two time-ordered files so state must carry between
    # micro-batches (maxFilesPerTrigger=1 -> two sequential batches)
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    cut = events.selectExpr(
        "percentile_approx(cast(ts as timestamp), 0.5) AS m"
    ).collect()[0].m
    first = events.filter(F.col("ts").cast("timestamp") <= cut)
    second = events.filter(F.col("ts").cast("timestamp") > cut)
    first.coalesce(1).write.parquet(src + "/p0")
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    second.coalesce(1).write.parquet(src + "/p1")

    schema = "event_id long, ts timestamp, user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/p*")
    )
    out = sessionize_stream(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in spark.table("closed_sessions").collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in closed_sessions_batch(events, gap_minutes=30).collect()
    }
    assert got == want
    assert len(want) > 0


def test_fold_property_any_batch_split_matches_naive():
    """Hypothesis: for ANY sorted event sequence and ANY split into
    micro-batches, folding batch-by-batch with state carry-over produces
    exactly the naive whole-sequence sessionization (closed + final open)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def naive(ts, vals, gap):
        sessions, start = [], 0
        for i in range(1, len(ts)):
            if ts[i] - ts[i - 1] > gap:
                sessions.append(
                    (int(ts[start]), int(ts[i - 1]), i - start,
                     float(vals[start:i].sum()))
                )
                start = i
        sessions.append(
            (int(ts[start]), int(ts[-1]), len(ts) - start,
             float(vals[start:].sum()))
        )
        return sessions

    @settings(max_examples=200, deadline=None)
    @given(
        deltas=st.lists(st.integers(0, 3 * GAP), min_size=1, max_size=40),
        cuts=st.lists(st.integers(0, 39), max_size=5),
        data=st.data(),
    )
    def check(deltas, cuts, data):
        ts = np.cumsum(np.array(deltas, dtype=np.int64))
        vals = np.arange(1.0, len(ts) + 1)
        bounds = sorted({c for c in cuts if 0 < c < len(ts)})
        pieces = np.split(np.arange(len(ts)), bounds)
        state, closed = None, []
        for idx in pieces:
            if not len(idx):
                continue
            c, state = _close_sessions_np(ts[idx], vals[idx], state, GAP)
            closed.extend(c)
        final = [(s[1], s[0], s[2], s[3]) for s in [state]]
        got = [(c[0], c[1], c[2], c[3]) for c in closed] + final
        assert got == naive(ts, vals, GAP)

    check()
