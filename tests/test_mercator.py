"""Web-Mercator XYZ/quadkey encode (geo/mercator.py) vs the pure-python
slippy-map formulas, plus quadkey structural invariants."""
from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from raptor_service_spark.geo.mercator import (
    quadkey_parent_sql,
    quadkey_sql,
    xtile_sql,
    ytile_sql,
)


def _py_tiles(lat: float, lng: float, z: int) -> tuple[int, int]:
    n = 1 << z
    x = int(math.floor(round((lng + 180.0) / 360.0 * n, 6)))
    fr = (1.0 - math.log(math.tan(math.radians(lat)) + 1.0 / math.cos(math.radians(lat))) / math.pi) / 2.0
    y = int(math.floor(round(fr * n, 6)))
    return min(n - 1, max(0, x)), min(n - 1, max(0, y))


def _py_quadkey(x: int, y: int, z: int) -> str:
    out = []
    for i in range(z - 1, -1, -1):
        out.append(str(((y >> i) & 1) * 2 + ((x >> i) & 1)))
    return "".join(out)


def test_xyz_matches_python_formula(spark):
    rng = np.random.default_rng(3)
    lat = rng.uniform(-84.9, 84.9, 300)
    lng = rng.uniform(-179.9, 179.9, 300)
    rows = [(float(a), float(b)) for a, b in zip(lat, lng)]
    df = spark.createDataFrame(rows, "lat double, lng double")
    for z in (1, 4, 7):
        got = (
            df.select(
                "lat",
                "lng",
                F.expr(xtile_sql("lng", z)).alias("x"),
                F.expr(ytile_sql("lat", z)).alias("y"),
            )
            .collect()
        )
        for r in got:
            ex, ey = _py_tiles(r["lat"], r["lng"], z)
            assert (r["x"], r["y"]) == (ex, ey), (r["lat"], r["lng"], z)


def test_quadkey_interleave_and_parent(spark):
    z = 6
    n = 1 << z
    rng = np.random.default_rng(5)
    xs = rng.integers(0, n, 200)
    ys = rng.integers(0, n, 200)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
    )
    qk = quadkey_sql("x", "y", z)
    got = df.select(
        "x",
        "y",
        F.expr(qk).alias("qk"),
        F.expr(quadkey_parent_sql(qk, 2)).alias("qk_parent"),
    ).collect()
    for r in got:
        expect = _py_quadkey(r["x"], r["y"], z)
        assert r["qk"] == expect
        assert len(r["qk"]) == z
        assert r["qk_parent"] == expect[:-2]
        # parent quadkey == quadkey of the z-2 tile (prefix property)
        assert r["qk_parent"] == _py_quadkey(r["x"] >> 2, r["y"] >> 2, z - 2)


def test_ytile_clamps_at_mercator_domain(spark):
    df = spark.createDataFrame(
        [(84.99, 0.0), (-84.99, 0.0), (0.0, 179.99), (0.0, -179.99)],
        "lat double, lng double",
    )
    z = 3
    got = df.select(
        F.expr(xtile_sql("lng", z)).alias("x"),
        F.expr(ytile_sql("lat", z)).alias("y"),
    ).collect()
    for r in got:
        assert 0 <= r["x"] < (1 << z)
        assert 0 <= r["y"] < (1 << z)
