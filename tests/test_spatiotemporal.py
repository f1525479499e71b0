"""Co-location join and segment-crossing join (operators/spatiotemporal.py)
vs brute force, plus adversarial segment-intersection geometry."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.operators.spatiotemporal import (
    colocation_pairs,
    seg_intersect_sql,
    segment_crossings,
    user_segments,
)


def _events(spark, n=500, n_users=12, seed=5):
    rng = np.random.default_rng(seed)
    rows = [
        (
            int(rng.integers(0, n_users)),
            int(i),
            float(rng.uniform(-80, 80)),
            float(rng.uniform(-170, 170)),
            int(rng.integers(0, 3_000_000)) * 1_000_000,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, lat double, lng double, us long"
    ).withColumn("ts", F.timestamp_micros(F.col("us")).cast("timestamp_ntz"))
    return df.drop("us"), rows


def test_colocation_matches_brute_force(spark):
    eps, tau_us = 12.0, 400_000 * 1_000_000
    df, rows = _events(spark)
    got = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in colocation_pairs(df, eps=eps, tau_us=tau_us).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for ua, _, la, ga, ta in rows:
        for ub, _, lb, gb, tb in rows:
            if ua < ub and abs(ta - tb) <= tau_us:
                if round(np.sqrt((la - lb) ** 2 + (ga - gb) ** 2), 6) <= eps:
                    want[(ua, ub)] = want.get((ua, ub), 0) + 1
    assert got == want and len(want) > 10


def test_segment_crossings_match_brute_force(spark):
    df, rows = _events(spark, n=400, n_users=10, seed=8)
    segs = user_segments(df, max_span=40.0)
    got = {
        (r["user_a"], r["user_b"]): r["n_crossings"]
        for r in segment_crossings(segs, res=3).collect()
    }
    # brute force: rebuild segments per user in (ts, event_id) order
    per_user: dict[int, list] = {}
    for u, eid, la, gn, ts in sorted(rows, key=lambda r: (r[0], r[4], r[1])):
        per_user.setdefault(u, []).append((gn, la))
    seg_list = []
    for u, pts in per_user.items():
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            if (x1, y1) != (x2, y2) and abs(x1 - x2) <= 40 and abs(y1 - y2) <= 40:
                seg_list.append((u, x1, y1, x2, y2))
    want: dict[tuple[int, int], int] = {}
    for sa in seg_list:
        for sb in seg_list:
            if sa[0] < sb[0] and _py_intersect(sa[1:], sb[1:]):
                k = (sa[0], sb[0])
                want[k] = want.get(k, 0) + 1
    assert got == want and len(want) >= 1


def _py_intersect(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    if not (
        max(ax1, ax2) >= min(bx1, bx2)
        and max(bx1, bx2) >= min(ax1, ax2)
        and max(ay1, ay2) >= min(by1, by2)
        and max(by1, by2) >= min(ay1, ay2)
    ):
        return False
    d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    return d1 * d2 <= 0 and d3 * d4 <= 0


CASES = [
    # proper crossing
    ((0, 0, 2, 2), (0, 2, 2, 0), True),
    # endpoint touch
    ((0, 0, 2, 0), (2, 0, 3, 5), True),
    # T-touch (endpoint on interior)
    ((0, 0, 4, 0), (2, 0, 2, 3), True),
    # collinear overlapping
    ((0, 0, 3, 0), (2, 0, 5, 0), True),
    # collinear disjoint — bbox clause must reject
    ((0, 0, 1, 0), (2, 0, 3, 0), False),
    # parallel, never meet
    ((0, 0, 3, 0), (0, 1, 3, 1), False),
    # one endpoint on the other's support line but OUTSIDE the segment
    ((0, 0, 2, 0), (3, 0, 3, 4), False),
    # near miss
    ((0, 0, 2, 2), (2.01, 0, 4, -2), False),
]


@pytest.mark.parametrize("a,b,want", CASES)
def test_seg_intersect_predicate_cases(spark, a, b, want):
    df = spark.createDataFrame(
        [tuple(float(v) for v in (*a, *b))],
        "ax1 double, ay1 double, ax2 double, ay2 double, "
        "bx1 double, by1 double, bx2 double, by2 double",
    )
    got = df.select(F.expr(seg_intersect_sql("a", "b")).alias("hit")).collect()[0][0]
    assert got is want
    assert _py_intersect(a, b) is want  # the python twin agrees


# ---------------------------------------------------------------------------
# one-pass Visvalingam-Whyatt simplification (q_trajectory_simplify kernel)
# ---------------------------------------------------------------------------


def test_vw_one_pass_semantics(spark):
    """Collinear interior points (zero triangle area) drop; a sharp corner
    and both endpoints survive — the kernel under q_trajectory_simplify."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    # user 1: straight line of 5 points (3 interior collinear -> dropped)
    # user 2: right-angle corner with a huge triangle at index 1 -> kept
    rows = []
    line = [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0), (0.0, 3.0), (0.0, 4.0)]
    corner = [(0.0, 0.0), (0.0, 20.0), (20.0, 20.0)]
    for i, (la, ln) in enumerate(line):
        rows.append((1, base + dt.timedelta(minutes=i), i, la, ln))
    for i, (la, ln) in enumerate(corner):
        rows.append((2, base + dt.timedelta(minutes=i), i, la, ln))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, lat double, lng double"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tau = 25.0
    p = (
        df.withColumn("lat0", F.lag("lat").over(w))
        .withColumn("lng0", F.lag("lng").over(w))
        .withColumn("lat2", F.lead("lat").over(w))
        .withColumn("lng2", F.lead("lng").over(w))
    )
    area = F.abs(
        (F.col("lat") - F.col("lat0")) * (F.col("lng2") - F.col("lng0"))
        - (F.col("lat2") - F.col("lat0")) * (F.col("lng") - F.col("lng0"))
    ) / F.lit(2.0)
    keep = (
        F.col("lat0").isNull() | F.col("lat2").isNull() | (area >= F.lit(tau))
    ).cast("int")
    got = {
        r["user_id"]: (r["n"], r["k"])
        for r in p.withColumn("keep", keep)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("keep").alias("k"))
        .collect()
    }
    assert got[1] == (5, 2)  # only the endpoints
    assert got[2] == (3, 3)  # corner area = 200 >= tau -> all survive


def test_snap_to_segments_matches_brute_force(spark):
    from raptor_service_spark.operators.spatiotemporal import snap_to_segments

    rng = np.random.default_rng(11)
    segs = spark.createDataFrame(
        [
            (int(u), float(x1), float(y1), float(x1 + dx), float(y1 + dy))
            for u, x1, y1, dx, dy in zip(
                rng.integers(0, 40, 300),
                rng.uniform(-60, 60, 300),
                rng.uniform(-60, 60, 300),
                rng.uniform(-8, 8, 300),
                rng.uniform(-8, 8, 300),
            )
            if (dx, dy) != (0.0, 0.0)
        ],
        "uid long, x1 double, y1 double, x2 double, y2 double",
    )
    pts = spark.createDataFrame(
        [
            (int(i), float(x), float(y))
            for i, (x, y) in enumerate(
                zip(rng.uniform(-65, 65, 400), rng.uniform(-65, 65, 400))
            )
        ],
        "pid long, px double, py double",
    )
    max_dist = 4.0
    got = {
        (r.pid): (r.uid, r.d2)
        for r in snap_to_segments(pts, segs, res=4, max_dist=max_dist).collect()
    }
    # numpy brute force with the same clamp + (d2, uid, coords) tie-break
    S = np.array(segs.collect(), dtype=float)  # uid, x1, y1, x2, y2
    want = {}
    for r in pts.collect():
        vx, vy = S[:, 3] - S[:, 1], S[:, 4] - S[:, 2]
        t = np.clip(((r.px - S[:, 1]) * vx + (r.py - S[:, 2]) * vy) / (vx**2 + vy**2), 0, 1)
        d2 = (r.px - (S[:, 1] + t * vx)) ** 2 + (r.py - (S[:, 2] + t * vy)) ** 2
        ok = d2 <= max_dist * max_dist
        if not ok.any():
            continue
        keys = sorted(
            (float(d2[j]), float(S[j, 0]), *map(float, S[j, 1:5]))
            for j in np.flatnonzero(ok)
        )
        want[r.pid] = (int(keys[0][1]), round(keys[0][0], 9))
    assert set(got) == set(want)
    for pid in want:
        assert got[pid][0] == want[pid][0]
        assert got[pid][1] == pytest.approx(want[pid][1], abs=1e-9)


def test_snap_clamps_to_endpoints_and_breaks_ties_by_uid(spark):
    from raptor_service_spark.operators.spatiotemporal import snap_to_segments

    segs = spark.createDataFrame(
        [
            (7, 0.0, 0.0, 10.0, 0.0),   # horizontal segment
            (3, 0.0, 2.0, 10.0, 2.0),   # parallel, equidistant from y=1
        ],
        "uid long, x1 double, y1 double, x2 double, y2 double",
    )
    pts = spark.createDataFrame(
        [
            (1, 5.0, 1.0),    # exact tie between uid 3 and 7 -> uid 3
            (2, 12.0, 0.0),   # beyond the right endpoint -> clamped, d2 = 4
            (3, 5.0, 0.0),    # on the segment -> d2 = 0
            (4, 50.0, 50.0),  # farther than max_dist -> absent
        ],
        "pid long, px double, py double",
    )
    out = {r.pid: (r.uid, r.d2) for r in snap_to_segments(pts, segs, 4, 3.0).collect()}
    assert out[1] == (3, 1.0)
    assert out[2] == (7, 4.0)
    assert out[3] == (7, 0.0)
    assert 4 not in out
