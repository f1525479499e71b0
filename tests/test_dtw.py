"""DTW codegen DP (operators/dtw.py) vs the textbook O(L²) python DP."""

from __future__ import annotations

import numpy as np

from raptor_service_spark.operators.dtw import dtw_pairs, resample_traj


def _py_dtw(a, b):
    L = len(a)
    d = np.full((L, L), np.inf)
    for i in range(L):
        for j in range(L):
            c = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            if i == 0 and j == 0:
                d[i, j] = c
            elif i == 0:
                d[i, j] = c + d[i, j - 1]
            elif j == 0:
                d[i, j] = c + d[i - 1, j]
            else:
                d[i, j] = c + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return d[L - 1, L - 1]


def test_dtw_matches_python_dp(spark):
    rng = np.random.default_rng(13)
    L, n_users = 8, 10
    trajs = {
        u: [(float(x), float(y)) for x, y in
            zip(rng.uniform(-50, 50, L), rng.uniform(-50, 50, L))]
        for u in range(n_users)
    }
    df = spark.createDataFrame(
        [
            (u, [p[0] for p in t], [p[1] for p in t])
            for u, t in trajs.items()
        ],
        "uid long, xs array<double>, ys array<double>",
    )
    got = {(r.user_a, r.user_b): r.dtw for r in dtw_pairs(df, L).collect()}
    assert len(got) == n_users * (n_users - 1) // 2
    for (a, b), v in got.items():
        assert v == round(_py_dtw(trajs[a], trajs[b]), 6) or abs(
            v - _py_dtw(trajs[a], trajs[b])
        ) < 1e-9


def test_dtw_identical_and_shifted_trajectories(spark):
    L = 8
    base = [(float(i), 0.0) for i in range(L)]
    shifted = [(float(i), 3.0) for i in range(L)]
    df = spark.createDataFrame(
        [
            (1, [p[0] for p in base], [p[1] for p in base]),
            (2, [p[0] for p in base], [p[1] for p in base]),
            (3, [p[0] for p in shifted], [p[1] for p in shifted]),
        ],
        "uid long, xs array<double>, ys array<double>",
    )
    got = {(r.user_a, r.user_b): r.dtw for r in dtw_pairs(df, L).collect()}
    assert got[(1, 2)] == 0.0              # identical paths align for free
    assert got[(1, 3)] == 9.0 * L          # constant offset: L cells of dy²=9


def test_resample_exact_rank_selection(spark):
    # 20-point trajectory resampled to 8: indices floor(i*20/8)+1
    rows = [(5, i, float(i), float(-i), 1000 + i) for i in range(20)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lng double, lat double, us long"
    )
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.timestamp_micros(F.col("us") * 1000000))
    out = resample_traj(df, 8).collect()
    assert len(out) == 1
    want_idx = [int(i * 20 / 8) for i in range(8)]
    assert out[0].xs == [float(i) for i in want_idx]
    assert out[0].ys == [float(-i) for i in want_idx]


def _py_frechet(a, b):
    L = len(a)
    f = np.full((L, L), np.inf)
    for i in range(L):
        for j in range(L):
            c = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            if i == 0 and j == 0:
                f[i, j] = c
            elif i == 0:
                f[i, j] = max(c, f[i, j - 1])
            elif j == 0:
                f[i, j] = max(c, f[i - 1, j])
            else:
                f[i, j] = max(c, min(f[i - 1, j], f[i, j - 1], f[i - 1, j - 1]))
    return f[L - 1, L - 1]


def test_frechet_matches_python_dp(spark):
    rng = np.random.default_rng(29)
    L, n_users = 8, 8
    trajs = {
        u: [(float(x), float(y)) for x, y in
            zip(rng.uniform(-50, 50, L), rng.uniform(-50, 50, L))]
        for u in range(n_users)
    }
    df = spark.createDataFrame(
        [(u, [p[0] for p in t], [p[1] for p in t]) for u, t in trajs.items()],
        "uid long, xs array<double>, ys array<double>",
    )
    got = {(r.user_a, r.user_b): r.frechet for r in dtw_pairs(df, L).collect()}
    for (a, b), v in got.items():
        # engine output is rounded to 6 dp
        assert abs(v - _py_frechet(trajs[a], trajs[b])) < 1e-6


def test_hausdorff_matches_numpy(spark):
    from raptor_service_spark.operators.dtw import hausdorff_pairs

    rng = np.random.default_rng(41)
    L, n_users = 8, 8
    trajs = {
        u: np.stack([rng.uniform(-50, 50, L), rng.uniform(-50, 50, L)], axis=1)
        for u in range(n_users)
    }
    df = spark.createDataFrame(
        [(u, t[:, 0].tolist(), t[:, 1].tolist()) for u, t in trajs.items()],
        "uid long, xs array<double>, ys array<double>",
    )
    got = {(r.user_a, r.user_b): r.hausdorff
           for r in hausdorff_pairs(df, L).collect()}
    assert len(got) == n_users * (n_users - 1) // 2
    for (a, b), v in got.items():
        A, B = trajs[a], trajs[b]
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
        want = max(d2.min(axis=1).max(), d2.min(axis=0).max())
        assert abs(v - want) < 1e-6
        # bottleneck orderings: hausdorff (free matching) <= frechet (path)
