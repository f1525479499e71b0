"""Haversine km-radius join and one-pass tile pyramid vs brute force."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from raptor_service_spark.geo.distance import haversine_np
from raptor_service_spark.operators.pip_join import radius_join_km
from raptor_service_spark.operators.tiles import tile_pyramid


def _pts(spark, n=500, seed=3):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-85, 85, n).round(4)
    lng = rng.uniform(-180, 180, n).round(4)
    rows = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lat, lng))]
    return spark.createDataFrame(rows, "pid long, lat double, lng double"), lat, lng


def _brute(lat, lng, centers, r):
    out = set()
    for qid, (cla, cln) in centers.items():
        d = np.round(haversine_np(lat, lng, cla, cln), 6)
        out |= {(qid, int(i)) for i in np.flatnonzero(d <= r)}
    return out


def test_radius_join_km_matches_bruteforce(spark):
    df, lat, lng = _pts(spark)
    centers = {"a": (40.0, -74.0), "b": (-35.0, 149.0)}
    got = {
        (r["qid"], r["pid"])
        for r in radius_join_km(df, centers, 1200.0, res=5).collect()
    }
    assert got == _brute(lat, lng, centers, 1200.0)


def test_radius_join_km_polar_lng_widening(spark):
    # at 80°N a 900 km circle spans ~47° of longitude — the flat lat-pad-only
    # bbox would clip it; the 1/cos widening must not.
    df, lat, lng = _pts(spark, n=800, seed=9)
    centers = {"p": (80.0, 30.0)}
    got = {
        (r["qid"], r["pid"])
        for r in radius_join_km(df, centers, 900.0, res=5).collect()
    }
    assert got == _brute(lat, lng, centers, 900.0)
    assert got  # non-vacuous


def test_radius_join_km_antimeridian_wrap(spark):
    rows = [(0, 10.0, 179.5), (1, 10.0, -179.5), (2, 10.0, 170.0), (3, 10.0, 0.0)]
    df = spark.createDataFrame(rows, "pid long, lat double, lng double")
    lat = np.array([r[1] for r in rows])
    lng = np.array([r[2] for r in rows])
    centers = {"w": (10.0, 179.9)}
    got = {
        (r["qid"], r["pid"])
        for r in radius_join_km(df, centers, 300.0, res=6).collect()
    }
    want = _brute(lat, lng, centers, 300.0)
    assert (("w", 1) in got) and got == want  # point across the line found


def test_tile_pyramid_equals_per_res_aggs(spark):
    from raptor_service_spark.geo.grid import cell_encode_col

    df, _, _ = _pts(spark, n=400, seed=5)
    got = {
        (r["res"], r["cell"]): r["n_points"]
        for r in tile_pyramid(df, resolutions=(6, 4, 2)).collect()
    }
    want = {}
    for res in (6, 4, 2):
        rows = (
            df.groupBy(cell_encode_col(F.col("lat"), F.col("lng"), res).alias("cell"))
            .count()
            .collect()
        )
        for r in rows:
            want[(res, r["cell"])] = r["count"]
    assert got == want


def test_bbox_self_join_matches_bruteforce(spark):
    from raptor_service_spark.operators.bbox_join import bbox_self_join

    rng = np.random.default_rng(21)
    n = 200
    clat = rng.uniform(-80, 80, n)
    clng = rng.uniform(-170, 170, n)
    hlat = rng.uniform(0.5, 8.0, n)
    hlng = rng.uniform(0.5, 8.0, n)
    rows = [
        (int(i), float(clat[i] - hlat[i]), float(clat[i] + hlat[i]),
         float(clng[i] - hlng[i]), float(clng[i] + hlng[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, lat_lo double, lat_hi double, lng_lo double, lng_hi double"
    )
    got = sorted((r["id_a"], r["id_b"]) for r in bbox_self_join(df, res=5).collect())
    want = sorted(
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if rows[i][1] <= rows[j][2] and rows[j][1] <= rows[i][2]
        and rows[i][3] <= rows[j][4] and rows[j][3] <= rows[i][4]
    )
    assert got == want
    # duplicates must be suppressed even though wide boxes share many cells
    assert len(got) == len(set(got))


def test_bbox_self_join_edge_touch_counts(spark):
    from raptor_service_spark.operators.bbox_join import bbox_self_join

    rows = [
        (0, 0.0, 10.0, 0.0, 10.0),
        (1, 10.0, 20.0, 0.0, 10.0),   # touches box 0 along lat=10 edge
        (2, 30.0, 40.0, 50.0, 60.0),  # disjoint
    ]
    df = spark.createDataFrame(
        rows, "id long, lat_lo double, lat_hi double, lng_lo double, lng_hi double"
    )
    got = sorted((r["id_a"], r["id_b"]) for r in bbox_self_join(df, res=6).collect())
    assert got == [(0, 1)]


def _sat_np(A, B):
    # numpy twin of operators/polygon_join.sat_intersect_sql (CCW, closed)
    def separated(P, Q):
        for i in range(3):
            p, q = P[i], P[(i + 1) % 3]
            e = q - p
            if all((e[0] * (r[1] - p[1]) - e[1] * (r[0] - p[0])) < 0 for r in Q):
                return True
        return False
    return not separated(A, B) and not separated(B, A)


def _ccw_tri(rng):
    cx, cy = rng.uniform(-60, 60), rng.uniform(-60, 60)
    a, b, c, d, e = rng.uniform(0.5, 6.0, 5)
    return np.array([[cx, cy + a], [cx - b, cy - c], [cx + d, cy - e]])


def test_triangle_self_join_matches_numpy_sat(spark):
    from raptor_service_spark.operators.polygon_join import triangle_self_join

    rng = np.random.default_rng(31)
    tris = [_ccw_tri(rng) for _ in range(120)]
    rows = [
        (i, *(float(v) for p in t for v in p)) for i, t in enumerate(tris)
    ]
    df = spark.createDataFrame(
        rows, "id long, x1 double, y1 double, x2 double, y2 double, x3 double, y3 double"
    )
    got = sorted((r["id_a"], r["id_b"]) for r in triangle_self_join(df, res=5).collect())
    want = sorted(
        (i, j)
        for i in range(len(tris))
        for j in range(i + 1, len(tris))
        if _sat_np(tris[i], tris[j])
    )
    assert got == want
    assert got  # non-vacuous


def test_triangle_self_join_containment_and_disjoint_bbox_overlap(spark):
    from raptor_service_spark.operators.polygon_join import triangle_self_join

    rows = [
        # big triangle containing the small one (no edge crossings)
        (0, 0.0, 10.0, -10.0, -10.0, 10.0, -10.0),
        (1, 0.0, 1.0, -1.0, -1.0, 1.0, -1.0),
        # bboxes overlap triangle 0's but the triangle itself is outside
        # (tucked into the bbox corner past the hypotenuse-side edge)
        (2, -9.8, 9.8, -9.9, 9.0, -9.0, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, x1 double, y1 double, x2 double, y2 double, x3 double, y3 double"
    )
    got = sorted((r["id_a"], r["id_b"]) for r in triangle_self_join(df, res=6).collect())
    tris = [np.array(r[1:]).reshape(3, 2) for r in rows]
    want = sorted(
        (i, j)
        for i in range(3)
        for j in range(i + 1, 3)
        if _sat_np(tris[i], tris[j])
    )
    assert got == want
    assert (0, 1) in got  # containment counts as intersecting


def test_redact_pii_and_strip_markup(spark):
    from raptor_service_spark.functions.text import redact_pii, strip_markup

    cases = [
        (0, "mail a.b+c@x-y.co.uk and d@e.io now"),
        (1, "ssn 123-45-6789 then call +1 (555) 123-4567 ok"),
        (2, "<div class='x'><b>hi</b></div> &nbsp; 10.20.30.40 end"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(cases, "id long, t string")
    out = {
        r["id"]: r["s"]
        for r in df.select("id", strip_markup(redact_pii(F.col("t"))).alias("s")).collect()
    }
    assert out[0] == "mail [EMAIL] and [EMAIL] now"
    assert out[1] == "ssn [ID] then call [PHONE] ok"
    assert out[2] == "hi [IP] end"
    assert out[3] == "no pii here at all"
