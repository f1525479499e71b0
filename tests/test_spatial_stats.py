"""Moran's I / Getis-Ord Gi* (operators/spatial_stats.py) vs numpy reference."""
from __future__ import annotations

import math

import numpy as np

from raptor_service_spark.geo.grid import RES_MULTIPLIER, cell_encode_np
from raptor_service_spark.operators.spatial_stats import getis_gi_star, morans_i

RES = 6


def _points(spark, n=1500, seed=11, blob_frac=0.6):
    """Part uniform, part a multi-cell dense blob (res-6 cells are ~2.8°, the
    blob's σ=5° spreads it over a ring of adjacent cells) — guarantees the
    density surface is genuinely spatially autocorrelated."""
    rng = np.random.default_rng(seed)
    nb = int(n * blob_frac)
    lat = np.concatenate(
        [rng.uniform(-85, 85, n - nb), rng.normal(40.0, 5.0, nb)]
    ).clip(-89.9, 89.9)
    lng = np.concatenate(
        [rng.uniform(-179, 179, n - nb), rng.normal(-74.0, 5.0, nb)]
    ).clip(-179.9, 179.9)
    rows = [(float(a), float(b)) for a, b in zip(lat, lng)]
    return spark.createDataFrame(rows, "lat double, lng double"), lat, lng


def _nbr(cell: int, res: int, dx: int, dy: int):
    n = 2**res
    base = res * RES_MULTIPLIER
    rem = cell - base
    y, x = rem // n, rem % n
    xx = ((x + dx) % n + n) % n
    yy = y + dy
    return base + yy * n + xx if 0 <= yy < n else None


_RING = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dx, dy) != (0, 0)]


def _cell_counts(lat, lng):
    cells = cell_encode_np(lat, lng, RES)
    occ: dict[int, float] = {}
    for c in cells:
        occ[int(c)] = occ.get(int(c), 0.0) + 1.0
    return occ


def test_morans_i_matches_numpy(spark):
    df, lat, lng = _points(spark)
    occ = _cell_counts(lat, lng)
    xs = np.array(list(occ.values()))
    n, m = len(occ), xs.mean()
    num = s0 = 0.0
    for c, x in occ.items():
        for dx, dy in _RING:
            nb = _nbr(c, RES, dx, dy)
            if nb is not None and nb in occ:
                num += (x - m) * (occ[nb] - m)
                s0 += 1
    want = round((n / s0) * num / ((xs - m) ** 2).sum(), 6)

    row = morans_i(df, res=RES).collect()[0]
    assert row["n_cells"] == n
    assert row["s0"] == s0
    assert row["morans_i"] == want
    assert row["expected_i"] == round(-1.0 / (n - 1), 6)
    # the blob makes density genuinely autocorrelated
    assert row["morans_i"] > row["expected_i"]


def test_getis_gi_star_matches_numpy(spark):
    df, lat, lng = _points(spark)
    occ = _cell_counts(lat, lng)
    xs = np.array(list(occ.values()))
    n, m = len(occ), xs.mean()
    s = math.sqrt((xs**2).mean() - m * m)
    rows = []
    for c, x in occ.items():
        nbrs = [occ[nb] for dx, dy in _RING
                if (nb := _nbr(c, RES, dx, dy)) is not None and nb in occ]
        k = 1.0 + len(nbrs)
        ring_sum = x + sum(nbrs)
        z = (ring_sum - m * k) / (s * math.sqrt((n * k - k * k) / (n - 1)))
        rows.append((c, int(x), int(ring_sum), int(k), round(z, 6)))
    want = sorted(rows, key=lambda r: (-r[4], r[0]))[:20]

    got = [
        (r["cell"], r["n_points"], r["ring_sum"], r["k_ring"], r["gi_z"])
        for r in getis_gi_star(df, res=RES, top_k=20).collect()
    ]
    assert got == want
    # hottest cell sits inside the blob: lat≈40, lng≈-74
    hot = want[0][0]
    nn = 2**RES
    rem = hot - RES * RES_MULTIPLIER
    y, x = rem // nn, rem % nn
    assert abs((y + 0.5) / nn * 180.0 - 90.0 - 40.0) < 25
    assert abs((x + 0.5) / nn * 360.0 - 180.0 - (-74.0)) < 35
