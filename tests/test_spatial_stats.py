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


# ---------------------------------------------------------------------------
# Ripley's K vs brute-force numpy pairs
# ---------------------------------------------------------------------------


def test_ripley_k_matches_bruteforce(spark):
    from raptor_service_spark.operators.spatial_stats import ripley_k

    rng = np.random.default_rng(7)
    n = 400
    lat = np.concatenate(
        [rng.uniform(-60, 60, n // 2), rng.normal(10.0, 1.0, n - n // 2)]
    ).clip(-84, 84)
    lng = np.concatenate(
        [rng.uniform(-170, 170, n // 2), rng.normal(30.0, 1.0, n - n // 2)]
    ).clip(-179, 179)
    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lat, lng))]
    df = spark.createDataFrame(rows, "id long, lat double, lng double")
    bands = [0.5, 1.5, 3.0]
    got = {r["d"]: r for r in ripley_k(df, bands).collect()}

    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lng[:, None] - lng[None, :]) ** 2
    dist = np.round(np.sqrt(d2), 6)
    area = (lat.max() - lat.min()) * (lng.max() - lng.min())
    for d in bands:
        n_pairs = int((np.triu(dist <= d, k=1)).sum())
        assert got[d]["n_pairs"] == n_pairs
        k_hat = area * 2.0 * n_pairs / (n * (n - 1))
        assert got[d]["k_hat"] == round(k_hat, 6)
        assert got[d]["l_hat"] == round(math.sqrt(k_hat / math.pi), 6)
    # the clustered half must push K above the CSR expectation pi*d^2
    assert got[1.5]["k_hat"] > math.pi * 1.5**2


def test_ripley_k_monotone_in_d(spark):
    from raptor_service_spark.operators.spatial_stats import ripley_k

    rng = np.random.default_rng(13)
    rows = [
        (i, float(a), float(b))
        for i, (a, b) in enumerate(
            zip(rng.uniform(-40, 40, 300), rng.uniform(-40, 40, 300))
        )
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lng double")
    out = ripley_k(df, [0.5, 1.0, 2.0, 4.0]).collect()
    ks = [r["k_hat"] for r in sorted(out, key=lambda r: r["d"])]
    assert ks == sorted(ks)


# ---------------------------------------------------------------------------
# Mann-Kendall vs a direct python evaluation
# ---------------------------------------------------------------------------


def _mk_reference(series: list[int]) -> tuple[int, float]:
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (series[j] > series[i]) - (series[j] < series[i])
    ties: dict[int, int] = {}
    for x in series:
        ties[x] = ties.get(x, 0) + 1
    tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_sum) / 18.0
    if var <= 0:
        return s, 0.0
    if s > 0:
        return s, (s - 1) / math.sqrt(var)
    if s < 0:
        return s, (s + 1) / math.sqrt(var)
    return s, 0.0


def test_mann_kendall_matches_reference(spark):
    from raptor_service_spark.operators.spatial_stats import mann_kendall_cells

    # three cells: strictly increasing, strictly decreasing, tie-heavy flat
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    series = {
        (45.0, 45.0): [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],   # increasing
        (-45.0, -45.0): [10, 9, 8, 7, 6, 5, 4, 3, 2, 1], # decreasing
        (45.0, -120.0): [3, 3, 3, 3, 3, 3, 3, 3, 3, 3],  # all tied
    }
    for (la, ln), xs in series.items():
        for day, cnt in enumerate(xs):
            for _ in range(cnt):
                rows.append((base + dt.timedelta(days=day), la, ln))
    df = spark.createDataFrame(rows, "ts timestamp, lat double, lng double")
    out = {r["cell"]: r for r in mann_kendall_cells(df, res=2, min_days=8).collect()}
    assert len(out) == 3

    from raptor_service_spark.geo.grid import cell_encode_np

    for (la, ln), xs in series.items():
        cell = int(cell_encode_np(np.array([la]), np.array([ln]), 2)[0])
        s, z = _mk_reference(xs)
        r = out[cell]
        assert r["s"] == s
        assert r["mk_z"] == round(z, 6)
        assert r["n_days"] == len(xs)
    labels = {r["trend"] for r in out.values()}
    assert labels == {"increasing", "decreasing", "flat"}


def test_mann_kendall_min_days_filter(spark):
    from raptor_service_spark.operators.spatial_stats import mann_kendall_cells

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(days=d), 10.0, 10.0) for d in range(3)]
    df = spark.createDataFrame(rows, "ts timestamp, lat double, lng double")
    assert mann_kendall_cells(df, res=2, min_days=8).count() == 0


# ---------------------------------------------------------------------------
# Local Moran's I (LISA)
# ---------------------------------------------------------------------------


def test_local_moran_matches_numpy(spark):
    from raptor_service_spark.operators.spatial_stats import local_morans_i

    df, lat, lng = _points(spark, n=1200, seed=21)
    occ = _cell_counts(lat, lng)
    xs = np.array(list(occ.values()))
    m = xs.mean()
    m2 = ((xs - m) ** 2).sum() / len(occ)
    got = {r["cell"]: r for r in local_morans_i(df, res=RES).collect()}
    checked = 0
    for c, x in occ.items():
        nbrs = [
            occ[nb]
            for dx, dy in _RING
            if (nb := _nbr(c, RES, dx, dy)) is not None and nb in occ
        ]
        if not nbrs:
            assert c not in got
            continue
        lag = sum(nbrs)
        k = len(nbrs)
        expect = (x - m) * (lag - k * m) / m2
        r = got[c]
        assert r["local_i"] == round(expect, 6)
        if x >= m and lag >= k * m:
            assert r["quadrant"] == "HH"
        elif x < m and lag < k * m:
            assert r["quadrant"] == "LL"
        checked += 1
    assert checked > 50


def test_local_moran_sums_to_global(spark):
    from raptor_service_spark.operators.spatial_stats import (
        local_morans_i,
        morans_i,
    )

    df, _, _ = _points(spark, n=1000, seed=31)
    g = morans_i(df, res=RES).collect()[0]
    local = local_morans_i(df, res=RES).collect()
    s_local = sum(r["local_i"] for r in local)
    # sum of LISA == global I * S0 (Anselin decomposition), up to 6-dp rounding
    assert abs(s_local - g["morans_i"] * g["s0"]) < 2e-6 * len(local) + 1e-3


def test_theil_sen_matches_numpy(spark):
    """Theil-Sen per-cell slope vs numpy median of pairwise slopes."""
    import numpy as np
    from pyspark.sql import functions as F

    from raptor_service_spark.geo.grid import cell_encode_np
    from raptor_service_spark.operators.spatial_stats import theil_sen_cells

    rng = np.random.default_rng(17)
    rows = []
    # two cells: one rising series, one noisy flat series
    for d in range(12):
        for _ in range(2 + d):           # rising count at (10, 10)
            rows.append((10.05, 10.05, d))
        for _ in range(int(5 + 3 * rng.random())):  # noisy at (-40, -40)
            rows.append((-39.95, -39.95, d))
    df = spark.createDataFrame(
        [(la, ln, d * 86400 + 100) for la, ln, d in rows],
        "lat double, lng double, epoch long",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    out = {r.cell: (r.n_days, r.ts_slope)
           for r in theil_sen_cells(df, res=3, min_days=8).collect()}

    for (la, ln) in ((10.05, 10.05), (-39.95, -39.95)):
        cell = int(cell_encode_np(np.array([la]), np.array([ln]), 3)[0])
        series = {}
        for rla, rln, d in rows:
            if (rla, rln) == (la, ln):
                series[d] = series.get(d, 0) + 1
        days = sorted(series)
        slopes = [
            (series[b] - series[a]) / (b - a)
            for i, a in enumerate(days)
            for b in days[i + 1:]
        ]
        want = round(float(np.median(slopes)), 6)
        assert out[cell][0] == len(days)
        assert abs(out[cell][1] - want) < 1e-6
    # the rising cell's slope is exactly 1 doc/day
    rising = int(cell_encode_np(np.array([10.05]), np.array([10.05]), 3)[0])
    assert out[rising][1] == 1.0


def test_cusum_detects_step_change_day(spark):
    """A series with a rate step at day 8 must report its change point at
    the step (the cumsum-deviation argmax), verified against numpy."""
    import numpy as np
    from pyspark.sql import functions as F

    from raptor_service_spark.geo.grid import cell_encode_np
    from raptor_service_spark.operators.spatial_stats import cusum_cells

    rows = []
    for d in range(16):
        rate = 2 if d < 8 else 10  # step up at day 8
        for _ in range(rate):
            rows.append((20.05, 20.05, d))
    df = spark.createDataFrame(
        [(la, ln, d * 86400 + 7) for la, ln, d in rows],
        "lat double, lng double, epoch long",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    out = cusum_cells(df, res=3, min_days=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cell == int(cell_encode_np(np.array([20.05]), np.array([20.05]), 3)[0])
    # numpy reference
    x = np.array([2] * 8 + [10] * 8, dtype=float)
    s = np.cumsum(x)
    k = np.arange(1, 17)
    dev = np.abs(s - k * s[-1] / 16)
    assert r.cp_day == int(np.argmax(dev))  # day ids are 0-based here
    assert abs(r.max_dev - round(float(dev.max()), 6)) < 1e-9
    assert r.cp_day == 7  # the last low-rate day maximizes the deviation


def test_join_counts_matches_numpy(spark):
    from raptor_service_spark.operators.spatial_stats import join_counts

    df, lat, lng = _points(spark, n=1200, seed=23)
    got = join_counts(df, RES).collect()[0].asDict()

    occ = _cell_counts(lat, lng)
    m = sum(occ.values()) / len(occ)
    black = {c for c, x in occ.items() if x > m}
    joins = {
        (min(c, nb), max(c, nb))
        for c in occ
        for dx, dy in _RING
        if (nb := _nbr(c, RES, dx, dy)) is not None and nb in occ
    }
    bb = sum(1 for a, b in joins if a in black and b in black)
    ww = sum(1 for a, b in joins if a not in black and b not in black)
    n, k, j = len(occ), len(black), len(joins)
    assert got["n_cells"] == n and got["n_black"] == k
    assert got["n_joins"] == j and got["bb"] == bb and got["ww"] == ww
    assert got["bw"] == j - bb - ww
    assert got["e_bb"] == round(j * k * (k - 1) / (n * (n - 1)), 6)
    # the blob makes black cells cluster: observed BB must exceed expectation
    assert got["bb"] > got["e_bb"]


def test_gearys_c_matches_numpy(spark):
    from raptor_service_spark.operators.spatial_stats import gearys_c

    # a SMOOTH unimodal density (sigma spans many res-6 cells): neighbor
    # counts are similar, so the difference-based C must read clustered
    # (<1). A sharp narrow blob would legitimately push C above 1 (steep
    # edges dominate the pair differences) — that regime is not asserted.
    rng = np.random.default_rng(29)
    lat = rng.normal(20, 15, 1200).clip(-89.9, 89.9)
    lng = rng.normal(-40, 30, 1200).clip(-179.9, 179.9)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lng)], "lat double, lng double"
    )
    got = gearys_c(df, RES).collect()[0].asDict()

    occ = _cell_counts(lat, lng)
    m = sum(occ.values()) / len(occ)
    ssd = round(sum((x - m) ** 2 for x in occ.values()), 9)
    pairs = [
        (occ[c], occ[nb])
        for c in occ
        for dx, dy in _RING
        if (nb := _nbr(c, RES, dx, dy)) is not None and nb in occ
    ]
    sq = round(sum((a - b) ** 2 for a, b in pairs), 9)
    n, w = len(occ), len(pairs)
    want = round((n - 1) * sq / (2.0 * w * ssd), 6)
    assert got["n_cells"] == n and got["w_pairs"] == w
    assert abs(got["geary_c"] - want) < 2e-6
    # the blob clusters density: difference-based C must fall below 1
    assert got["geary_c"] < 1.0
