"""Point-in-polygon join: pruned filter-refine == brute-force exact (J10)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.datagen import gen_documents_df, gen_query_polygons
from raptor_service_spark.geo.grid import points_in_polygon_np
from raptor_service_spark.operators.pip_join import (
    point_in_polygon_join,
    point_in_polygon_join_bruteforce,
)


@pytest.fixture(scope="module")
def points(spark):
    docs = gen_documents_df(spark, 300, seed=31).select("doc_id", "lat", "lng").persist()
    docs.count()
    return docs


@pytest.fixture(scope="module")
def polygons():
    polys = gen_query_polygons(seed=31, n=6)
    return {f"q{i}": p for i, p in enumerate(polys)}


def _key_set(pdf):
    return set(zip(pdf.qid, pdf.doc_id))


def test_pruned_equals_bruteforce(points, polygons):
    pruned = point_in_polygon_join(points, polygons, res=6).toPandas()
    brute = point_in_polygon_join_bruteforce(points, polygons).toPandas()
    assert _key_set(pruned) == _key_set(brute)


def test_matches_numpy_oracle(points, polygons):
    got = point_in_polygon_join(points, polygons, res=7).toPandas()
    pts = points.toPandas()
    expect = set()
    for qid, poly in polygons.items():
        inside = points_in_polygon_np(pts.lat.values, pts.lng.values, poly)
        expect |= {(qid, d) for d in pts.doc_id.values[inside]}
    assert _key_set(got) == expect
    assert len(got) == len(expect)  # no duplicate pairs


def test_output_keeps_point_columns(points, polygons):
    got = point_in_polygon_join(points, polygons, res=6)
    assert set(got.columns) == {"doc_id", "lat", "lng", "qid"}


def test_plan_broadcasts_cells(points, polygons):
    plan = point_in_polygon_join(points, polygons, res=6)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_radius_join_matches_bruteforce(spark):
    """Filter-refine radius join == brute-force distance filter, including
    interior-cell fast-accepted rows and cells straddling the boundary."""
    import numpy as np
    from pyspark.sql import functions as F

    from raptor_service_spark.operators.pip_join import radius_join

    rng = np.random.default_rng(17)
    pts = spark.createDataFrame(
        [(int(i), float(la), float(ln)) for i, (la, ln) in enumerate(
            zip(rng.uniform(-85, 85, 3000), rng.uniform(-179, 179, 3000)))],
        "pid long, lat double, lng double",
    )
    centers = {"a": (10.0, 20.0), "b": (-40.0, -120.0)}
    radius = 18.0
    got = radius_join(pts, centers, radius, res=5).select("qid", "pid", "dist")
    rows = {(r.qid, r.pid) for r in got.collect()}
    exp = set()
    for q, (cla, cln) in centers.items():
        pdf = pts.toPandas()
        d = np.round(np.sqrt((pdf.lat - cla) ** 2 + (pdf.lng - cln) ** 2), 6)
        exp |= {(q, int(p)) for p, dd in zip(pdf.pid, d) if dd <= radius}
    assert rows == exp
    assert len(rows) > 20
    # dist values exact vs brute force on a sample
    one = got.orderBy("qid", "pid").limit(5).collect()
    for r in one:
        cla, cln = centers[r.qid]
        pr = pts.filter(F.col("pid") == r.pid).collect()[0]
        assert abs(r.dist - round(((pr.lat - cla) ** 2 + (pr.lng - cln) ** 2) ** 0.5, 6)) < 1e-9


def test_pip_donut_excludes_hole(spark, sf_dir):
    """Multi-ring (donut) composition: output = outer members minus hole
    members, and every output point is exactly inside-outer AND
    outside-hole by the numpy reference test."""
    import numpy as np
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from raptor_service_spark.geo.grid import points_in_polygon_np

    out = {r.doc_id for r in entry_mod.q_pip_donut(spark, sf_dir).collect()}
    d = entry_mod._read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = entry_mod._latlng_cols(F.col("doc_id"))
    rows = d.select("doc_id", lat.alias("lat"), lng.alias("lng")).collect()
    la = np.array([r.lat for r in rows])
    ln = np.array([r.lng for r in rows])
    in_o = points_in_polygon_np(la, ln, np.array(entry_mod._DONUT_OUTER))
    in_h = points_in_polygon_np(la, ln, np.array(entry_mod._DONUT_HOLE))
    want = {r.doc_id for r, o, h in zip(rows, in_o, in_h) if o and not h}
    assert out == want
    assert want  # the donut must actually contain docs at this sf
