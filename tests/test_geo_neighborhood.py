"""Spatial kNN join (operators/geo_knn.py) and k-ring smoothing
(operators/neighborhood.py) vs numpy brute force."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import RES_MULTIPLIER, cell_encode_np
from raptor_service_spark.operators.geo_knn import geo_knn_join
from raptor_service_spark.operators.neighborhood import kring_smooth


def _points_df(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-85, 85, n).round(4)
    lng = rng.uniform(-179, 179, n).round(4)
    rows = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lat, lng))]
    return (
        spark.createDataFrame(rows, "pid long, lat double, lng double"),
        lat,
        lng,
    )


QUERIES = {"qa": (10.0, 20.0), "qb": (-60.0, 150.0), "qc": (80.0, -170.0)}


def _brute_topk(lat, lng, qla, qln, k):
    d = np.round(np.sqrt((lat - qla) ** 2 + (lng - qln) ** 2), 6)
    order = np.lexsort((np.arange(len(d)), d))[:k]
    return [(int(i), float(d[i])) for i in order]


@pytest.mark.parametrize("k", [1, 5, 17])
def test_geo_knn_join_exact(spark, k):
    df, lat, lng = _points_df(spark)
    out = geo_knn_join(df, QUERIES, k=k, res=6, payload_cols=("pid",))
    got = {
        qid: sorted(
            ((r["pid"], r["dist"]) for r in rows),
            key=lambda t: (t[1], t[0]),
        )
        for qid, rows in _group(out.collect()).items()
    }
    for qid, (qla, qln) in QUERIES.items():
        want = sorted(_brute_topk(lat, lng, qla, qln, k), key=lambda t: (t[1], t[0]))
        assert got[qid] == want, qid


def test_geo_knn_join_sparse_ring_expansion(spark):
    # 6 points clustered far from the query: ring 0..n around the query cell
    # are empty, so the planner must expand well past the first ring.
    rows = [(i, 80.0 + i * 0.01, 170.0) for i in range(6)]
    df = spark.createDataFrame(rows, "pid long, lat double, lng double")
    out = geo_knn_join(df, {"q": (-80.0, -170.0)}, k=3, res=6, payload_cols=("pid",))
    lat = np.array([r[1] for r in rows])
    lng = np.array([r[2] for r in rows])
    want = _brute_topk(lat, lng, -80.0, -170.0, 3)
    got = sorted(((r["pid"], r["dist"]) for r in out.collect()), key=lambda t: (t[1], t[0]))
    assert got == sorted(want, key=lambda t: (t[1], t[0]))


def _group(rows):
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r["qid"], []).append(r)
    return out


def test_kring_smooth_matches_numpy(spark):
    df, lat, lng = _points_df(spark, n=300, seed=11)
    res, k = 5, 1
    out = {r["cell"]: r for r in kring_smooth(df, res=res, k=k).collect()}

    cells = cell_encode_np(lat, lng, res)
    counts: dict[int, int] = {}
    for c in cells:
        counts[int(c)] = counts.get(int(c), 0) + 1
    n = 1 << res
    for cell, cnt in counts.items():
        rem = cell - res * RES_MULTIPLIER
        x, y = rem % n, rem // n
        ring_pts, ring_cells = 0, 0
        for dy in range(-k, k + 1):
            yy = y + dy
            if not (0 <= yy < n):
                continue
            for dx in range(-k, k + 1):
                nbr = res * RES_MULTIPLIER + yy * n + (x + dx) % n
                if nbr in counts:
                    ring_pts += counts[nbr]
                    ring_cells += 1
        row = out[cell]
        assert row["n_points"] == cnt
        assert row["ring_points"] == ring_pts
        assert row["n_ring_cells"] == ring_cells
    assert set(out) == set(counts)


def test_kring_smooth_pole_clamp_and_wrap(spark):
    # two points in the same lat band at lng extremes: at res 2 (n=4) the
    # x=0 and x=3 cells are 1-ring neighbors through the antimeridian wrap.
    rows = [(0, 89.0, -179.9), (1, 89.0, 179.9)]
    df = spark.createDataFrame(rows, "pid long, lat double, lng double")
    out = {r["cell"]: r for r in kring_smooth(df, res=2, k=1).collect()}
    assert len(out) == 2
    for r in out.values():
        assert r["n_points"] == 1
        assert r["ring_points"] == 2  # sees itself + the wrapped neighbor
        assert r["n_ring_cells"] == 2


def test_compact_cells_cover_and_minimality(spark):
    from raptor_service_spark.geo.grid import RES_MULTIPLIER, cell_parent_np
    from raptor_service_spark.operators.compact_cells import compact_cells

    rng = np.random.default_rng(41)
    res = 4
    n = 1 << res
    # dense-ish occupied set so full quads exist at several levels
    occupied = sorted(
        set(
            int(res * RES_MULTIPLIER + y * n + x)
            for x, y in zip(rng.integers(0, n, 900), rng.integers(0, n, 900))
        )
    )
    df = spark.createDataFrame([(c,) for c in occupied], "cell long")
    cover = [r["cell"] for r in compact_cells(df, res=res, min_res=1).collect()]

    # 1. disjoint + exact cover: expanding every cover cell to res-4
    #    descendants reproduces the occupied set exactly
    expanded = []
    for c in cover:
        r = c // RES_MULTIPLIER
        cells = [c]
        for rr in range(r, res):
            nxt = []
            nn = 1 << (rr + 1)
            for cc in cells:
                rem = cc - rr * RES_MULTIPLIER
                y, x = rem // (1 << rr), rem % (1 << rr)
                for dy in (0, 1):
                    for dx in (0, 1):
                        nxt.append(
                            (rr + 1) * RES_MULTIPLIER + (2 * y + dy) * nn + (2 * x + dx)
                        )
            cells = nxt
        expanded.extend(cells)
    assert sorted(expanded) == occupied
    assert len(expanded) == len(set(expanded))

    # 2. minimality: no complete sibling quad remains at any resolution > 1
    from collections import Counter

    by_res: dict[int, list[int]] = {}
    for c in cover:
        by_res.setdefault(int(c // RES_MULTIPLIER), []).append(c)
    for r, cs in by_res.items():
        if r <= 1:
            continue
        parents = Counter(int(p) for p in cell_parent_np(np.array(cs), r - 1))
        assert max(parents.values()) < 4
    assert len(cover) < len(occupied)  # actually compacted something


def test_uncompact_inverts_compact(spark):
    from raptor_service_spark.operators.compact_cells import (
        compact_cells,
        uncompact_cells_col,
    )

    rng = np.random.default_rng(43)
    res = 5
    n = 1 << res
    occupied = sorted(
        set(
            int(res * RES_MULTIPLIER + y * n + x)
            for x, y in zip(rng.integers(0, n, 2500), rng.integers(0, n, 2500))
        )
    )
    df = spark.createDataFrame([(c,) for c in occupied], "cell long")
    cover = compact_cells(df, res=res, min_res=0)
    back = sorted(
        r["c"]
        for r in cover.select(
            F.explode(uncompact_cells_col("cell", res)).alias("c")
        ).collect()
    )
    assert back == occupied


def test_within_distance_join_matches_bruteforce(spark):
    from raptor_service_spark.operators.pip_join import within_distance_join

    rng = np.random.default_rng(47)
    n = 250
    lat = rng.uniform(-85, 85, n).round(3)
    lng = rng.uniform(-180, 180, n).round(3)
    rows = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lat, lng))]
    df = spark.createDataFrame(rows, "pid long, lat double, lng double")
    eps = 10.0
    out = within_distance_join(df, df, eps=eps)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in out.filter(F.col("l.pid") < F.col("r.pid"))
        .select(F.col("l.pid").alias("id_a"), F.col("r.pid").alias("id_b"))
        .collect()
    )
    d = np.round(
        np.sqrt(
            (lat[:, None] - lat[None, :]) ** 2 + (lng[:, None] - lng[None, :]) ** 2
        ),
        6,
    )
    want = sorted(
        (i, j) for i in range(n) for j in range(i + 1, n) if d[i, j] <= eps
    )
    assert got == want
    assert got  # non-vacuous


def test_boundary_cells_matches_numpy(spark):
    from raptor_service_spark.operators.neighborhood import boundary_cells

    df, lat, lng = _points_df(spark, n=500, seed=11)
    res = 4
    got = {
        r["cell"]: (r["n_points"], r["n_occ_nbrs"], r["is_boundary"])
        for r in boundary_cells(df, res=res).collect()
    }

    cells = cell_encode_np(lat, lng, res)
    occ = {}
    for c in cells:
        occ[int(c)] = occ.get(int(c), 0) + 1
    n = 2**res
    base = res * RES_MULTIPLIER
    expected = {}
    for c, cnt in occ.items():
        rem = c - base
        y, x = divmod(rem, n)
        n_occ = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                yy = y + dy
                if not (0 <= yy < n):
                    continue  # pole clamp
                xx = (x + dx) % n  # lng wrap
                if base + yy * n + xx in occ:
                    n_occ += 1
        expected[c] = (cnt, n_occ, n_occ < 8)
    assert got == expected
    assert any(v[2] for v in got.values())  # sparse raster has boundary
    assert any(not v[2] for v in got.values())  # and interior


def test_boundary_cells_full_raster_interior_except_poles(spark):
    # every cell at res 3 occupied -> only the pole rows are boundary
    from raptor_service_spark.operators.neighborhood import boundary_cells

    res, n = 3, 8
    rows = []
    for y in range(n):
        for x in range(n):
            rows.append(
                (
                    y * n + x,
                    -90.0 + 180.0 * (y + 0.5) / n,
                    -180.0 + 360.0 * (x + 0.5) / n,
                )
            )
    df = spark.createDataFrame(rows, "pid long, lat double, lng double")
    out = boundary_cells(df, res=res).collect()
    assert len(out) == n * n
    base = res * RES_MULTIPLIER
    for r in out:
        y = (r["cell"] - base) // n
        assert r["is_boundary"] == (y in (0, n - 1))


def test_focal_gradient_matches_numpy_sobel(spark):
    """Sobel gradient of the occupancy raster vs an explicit numpy
    convolution with longitude wrap and latitude clamp."""
    import numpy as np

    from raptor_service_spark.geo.grid import RES_MULTIPLIER, cell_encode_np
    from raptor_service_spark.operators.neighborhood import focal_gradient

    res, n = 4, 16
    rng = np.random.default_rng(21)
    lat = rng.uniform(-89.0, 89.0, 1500)
    lng = rng.uniform(-179.0, 179.0, 1500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lng)], "lat double, lng double"
    )
    got = {r.cell: (r.n_points, r.gx, r.gy, r.grad2)
           for r in focal_gradient(df, res).collect()}

    # numpy raster
    cells = cell_encode_np(lat, lng, res)
    raster = np.zeros((n, n), dtype=np.int64)
    for c in cells:
        rem = int(c) - res * RES_MULTIPLIER
        raster[rem // n, rem % n] += 1
    base = res * RES_MULTIPLIER
    want = {}
    for y in range(n):
        for x in range(n):
            if raster[y, x] == 0:
                continue
            gx = gy = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dx, dy) == (0, 0):
                        continue
                    yy = y + dy
                    if not (0 <= yy < n):
                        continue
                    v = raster[yy, (x + dx) % n]
                    gx += dx * (2 - abs(dy)) * v
                    gy += dy * (2 - abs(dx)) * v
            want[base + y * n + x] = (int(raster[y, x]), gx, gy, gx * gx + gy * gy)
    assert got == want


def test_nn_distances_exact_vs_brute_force(spark):
    """Ring-doubling self-NN join vs numpy brute force, including a sparse
    far-away outlier whose NN is many rings out."""
    import numpy as np

    from raptor_service_spark.operators.geo_knn import nn_distances

    rng = np.random.default_rng(33)
    # dense blob + thin scatter + isolated pair at the antipodes
    xs = np.concatenate([rng.uniform(-1, 1, 300), rng.uniform(-170, 170, 60),
                         np.array([150.0, 151.3])])
    ys = np.concatenate([rng.uniform(-1, 1, 300), rng.uniform(-80, 80, 60),
                         np.array([-75.0, -74.2])])
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "pid long, px double, py double",
    )
    got = {r.pid: r.d1 for r in nn_distances(df, res=5, max_ring=64).collect()}
    dx = xs[:, None] - xs[None, :]
    dy = ys[:, None] - ys[None, :]
    dist = np.sqrt(dx * dx + dy * dy)
    np.fill_diagonal(dist, np.inf)
    want = dist.min(axis=1)
    assert set(got) == set(range(len(xs)))
    for i, w in enumerate(want):
        assert got[i] == w  # bit-exact: same subtract/multiply/sqrt chain


def test_nn_join_query_to_data_exact(spark):
    """Query→data nn_join vs numpy brute force: sparse query grid against
    a clustered data pattern (some queries resolve in ring 1, others need
    many doublings), plus nn identity determinism."""
    import numpy as np

    from raptor_service_spark.operators.geo_knn import nn_join

    rng = np.random.default_rng(41)
    qx = np.linspace(-170, 170, 18)
    qy = np.linspace(-80, 80, 18)
    queries = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(qx, qy))],
        "pid long, px double, py double",
    )
    dx_ = np.concatenate([rng.uniform(-5, 5, 200), rng.uniform(100, 140, 30)])
    dy_ = np.concatenate([rng.uniform(-5, 5, 200), rng.uniform(20, 60, 30)])
    data = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(dx_, dy_))],
        "did long, dx double, dy double",
    )
    got = {r.pid: (r.d1, r.nn_id) for r in nn_join(
        queries, data, res=4, max_ring=64
    ).collect()}
    dd = np.sqrt((qx[:, None] - dx_[None, :]) ** 2
                 + (qy[:, None] - dy_[None, :]) ** 2)
    assert set(got) == set(range(len(qx)))
    for i in range(len(qx)):
        best = dd[i].min()
        assert got[i][0] == best  # bit-exact same arithmetic chain
        # deterministic neighbor identity: smallest did among ties
        assert got[i][1] == int(np.flatnonzero(dd[i] == best).min())
