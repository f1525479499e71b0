"""Streaming HLL sketch == batch relational HLL, exactly: element-wise-max
register state is order/batch-boundary independent, and the integer register
sum makes the estimate itself bit-identical to the batch twin."""
from __future__ import annotations

import os

import numpy as np

from raptor_service_spark.operators.sketches import (
    HLL_M,
    hll_distinct_agg,
    hll_estimate,
    hll_jrho_py,
)
from raptor_service_spark.streaming.events import run_stream_to_memory
from raptor_service_spark.streaming.hll import hll_stream

PTS_SCHEMA = "grp long, user_id long"


def _rows(n_grps=4, users_per_grp=800, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_grps):
        n = users_per_grp if g % 2 == 0 else 40  # big + small sketches
        for u in rng.choice(100_000, size=n, replace=False):
            rows.append((g, int(u)))
            if u % 4 == 0:  # duplicates the sketch must ignore
                rows.append((g, int(u)))
    return rows


def test_py_registers_match_column_registers(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(i,) for i in range(500)], "user_id long")
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    got = (
        df.select(h.alias("h"))
        .selectExpr(
            "h % 256 AS j",
            "CASE WHEN h DIV 256 = 0 THEN 53 "
            "ELSE bit_count(((h DIV 256) & -(h DIV 256)) - 1) + 1 END AS rho",
        )
        .collect()
    )
    want = [hll_jrho_py(i) for i in range(500)]
    assert [(r.j, r.rho) for r in got] == want


def test_stream_hll_equals_batch(spark, tmp_path):
    rows = _rows()
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    expected = {
        r.grp: (r.n_exact, r.hll_est) for r in hll_distinct_agg(batch).collect()
    }
    src = str(tmp_path / "hll_src")
    os.makedirs(src, exist_ok=True)
    batch.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = run_stream_to_memory(hll_stream(stream), "hll_out", "append")
    q.awaitTermination(120)
    out = spark.table("hll_out").collect()
    last = {}
    for r in out:
        if r.grp not in last or r.batch_seq > last[r.grp].batch_seq:
            last[r.grp] = r
    assert set(last) == set(expected)
    for g, r in last.items():
        n_exact, est = expected[g]
        assert r.hll_est == est, (g, r.hll_est, est)  # EXACT equality
        # sketch accuracy: within 3 sigma of the 1.04/sqrt(256) bound
        assert abs(r.hll_est - n_exact) / n_exact < 0.20


def test_stream_hll_straddles_microbatches(spark, tmp_path):
    rows = _rows(n_grps=3, users_per_grp=600, seed=9)
    early = [r for i, r in enumerate(rows) if i % 2 == 0]
    late = [r for i, r in enumerate(rows) if i % 2 == 1]
    batch = spark.createDataFrame(rows, PTS_SCHEMA)
    expected = {r.grp: r.hll_est for r in hll_distinct_agg(batch).collect()}

    src = str(tmp_path / "hll_src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(early, PTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(PTS_SCHEMA).parquet(src)
    q = (
        hll_stream(stream)
        .writeStream.format("memory")
        .queryName("hll_out2")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(late, PTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    out = spark.table("hll_out2").collect()
    assert max(r.batch_seq for r in out) >= 2  # state actually restored
    last = {}
    for r in out:
        if r.grp not in last or r.batch_seq > last[r.grp].batch_seq:
            last[r.grp] = r
    for g, r in last.items():
        assert r.hll_est == expected[g], (g, r.hll_est, expected[g])


def test_merge_is_order_independent():
    """Element-wise max register merge: any partition of the value set in
    any order yields the same registers, hence the same estimate."""
    vals = list(range(2000))
    regs_fwd = [0] * HLL_M
    for v in vals:
        j, r = hll_jrho_py(v)
        regs_fwd[j] = max(regs_fwd[j], r)
    regs_rev = [0] * HLL_M
    for v in reversed(vals):
        j, r = hll_jrho_py(v)
        regs_rev[j] = max(regs_rev[j], r)
    assert regs_fwd == regs_rev
    assert hll_estimate(regs_fwd) == hll_estimate(regs_rev)
