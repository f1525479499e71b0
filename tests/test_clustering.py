"""Lloyd's k-means determinism: exact parity with a numpy reference that
applies the same contract (smallest-id init, (dist, cid) argmin tie-break,
9 dp per-round centroid rounding, 6 dp output)."""

from __future__ import annotations

import numpy as np

from raptor_service_spark.operators.clustering import kmeans


def _np_kmeans(ids, xs, ys, k, n_iters):
    order = np.argsort(ids, kind="stable")
    xs, ys = np.asarray(xs, float), np.asarray(ys, float)
    init = order[:k]
    # numpy round is banker's — emulate SQL HALF_UP (away from zero) instead
    r9 = lambda v: np.sign(v) * np.floor(np.abs(v) * 1e9 + 0.5) / 1e9
    cents = [(i, r9(xs[j]), r9(ys[j])) for i, j in enumerate(init)]
    for _ in range(n_iters):
        cid_arr = np.array([c[0] for c in cents])
        cx = np.array([c[1] for c in cents])
        cy = np.array([c[2] for c in cents])
        d = (xs[:, None] - cx[None, :]) ** 2 + (ys[:, None] - cy[None, :]) ** 2
        assign = cid_arr[np.argmin(d, axis=1)]  # argmin takes first minimum = smallest cid
        cents = []
        for cid in sorted(set(assign.tolist())):
            m = assign == cid
            cents.append((cid, r9(xs[m].mean()), r9(ys[m].mean())))
        sizes = {cid: int((assign == cid).sum()) for cid, _, _ in cents}
    r6 = lambda v: np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
    return [(cid, sizes[cid], float(r6(cx)), float(r6(cy))) for cid, cx, cy in cents]


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    n = 3000
    # three separated blobs + uniform noise, on a 0.01 lattice (exact doubles)
    blob = lambda cx, cy, m: np.stack(
        [
            np.round(rng.normal(cx, 2.0, m), 2),
            np.round(rng.normal(cy, 2.0, m), 2),
        ],
        axis=1,
    )
    pts = np.concatenate(
        [blob(-30, 10, 1000), blob(20, -5, 1000), blob(5, 40, 800),
         np.stack([np.round(rng.uniform(-50, 50, 200), 2),
                   np.round(rng.uniform(-50, 50, 200), 2)], axis=1)]
    )
    ids = rng.permutation(len(pts)).astype(int)
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in zip(ids, pts)],
        "id long, x double, y double",
    )
    got = [
        (r.cid, r.n_points, r.cx, r.cy)
        for r in kmeans(df, k=6, n_iters=3).collect()
    ]
    want = _np_kmeans(ids, pts[:, 0], pts[:, 1], 6, 3)
    assert got == want


def test_kmeans_empty_cluster_drops_out(spark):
    # two far blobs, k=3 seeded with two points in one blob: one seed loses
    # all points after round 1 and must vanish from the output
    rows = [(0, 0.0, 0.0), (1, 0.5, 0.0), (2, 100.0, 0.0), (3, 100.5, 0.0),
            (4, 0.25, 0.5), (5, 100.25, 0.5)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = kmeans(df, k=3, n_iters=2).collect()
    assert sum(r.n_points for r in out) == len(rows)
    assert len(out) <= 3
