"""Exact convex polygon ∩ polygon join (bbox filter + SAT refine).

The refine step GIS engines run after the bbox filter: two CONVEX polygons
with consistent CCW winding intersect iff no edge of either is a separating
axis (SAT). For fixed-arity polygons (triangles here) the whole test is a
closed-form boolean over the vertex coordinates — pure +,*,comparison
arithmetic — so ONE generated expression string runs identically JVM-side
(``F.expr``, whole-stage codegen) and in the DuckDB oracle. No UDF, no
geometry library.

Pipeline = bbox cover-cell equi-join (operators/bbox_join.py shapes: one
shuffle, canonical-corner-cell dedup) + the SAT predicate as a codegen
Filter. Closed semantics: polygons touching at an edge or vertex COUNT as
intersecting (SAT separation uses strict <).

Scale: identical to bbox_self_join — the SAT refine adds zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.operators.bbox_join import _xcol, _ycol, cover_cells_col
from raptor_service_spark.geo.grid import RES_MULTIPLIER


def _vert(prefix: str, i: int) -> tuple[str, str]:
    # (x, y) = (lng, lat): CCW winding is in the east-north plane
    return f"{prefix}_x{i}", f"{prefix}_y{i}"


def sat_separated_sql(a: str, b: str, nverts: int = 3) -> str:
    """TRUE iff some CCW edge of polygon ``a`` has every vertex of ``b``
    strictly outside (cross < 0). Columns: {a}_x1..{a}_x{n}, {a}_y1.. etc."""
    clauses = []
    for i in range(1, nverts + 1):
        j = i % nverts + 1
        px, py = _vert(a, i)
        qx, qy = _vert(a, j)
        outs = []
        for k in range(1, nverts + 1):
            rx, ry = _vert(b, k)
            cross = (
                f"(({qx} - {px}) * ({ry} - {py}) - ({qy} - {py}) * ({rx} - {px}))"
            )
            outs.append(f"{cross} < 0")
        clauses.append("(" + " AND ".join(outs) + ")")
    return "(" + " OR ".join(clauses) + ")"


def sat_intersect_sql(a: str, b: str, nverts: int = 3) -> str:
    """TRUE iff CCW convex polygons a and b intersect (closed semantics)."""
    return (
        f"(NOT {sat_separated_sql(a, b, nverts)} "
        f"AND NOT {sat_separated_sql(b, a, nverts)})"
    )


def triangle_self_join(
    tris: DataFrame,
    res: int,
    id_col: str = "id",
) -> DataFrame:
    """All intersecting distinct triangle pairs (id_a < id_b).

    Input columns: id, x1, y1, x2, y2, x3, y3 (CCW, x = lng, y = lat).
    Output: (id_a, id_b).
    """
    xs = [F.col(f"x{i}") for i in (1, 2, 3)]
    ys = [F.col(f"y{i}") for i in (1, 2, 3)]
    boxed = tris.select(
        F.col(id_col),
        *[c for i in (1, 2, 3) for c in (F.col(f"x{i}"), F.col(f"y{i}"))],
        F.least(*ys).alias("lat_lo"),
        F.greatest(*ys).alias("lat_hi"),
        F.least(*xs).alias("lng_lo"),
        F.greatest(*xs).alias("lng_hi"),
    )
    cov = boxed.select(
        "*",
        F.explode(
            cover_cells_col(
                F.col("lat_lo"), F.col("lat_hi"), F.col("lng_lo"), F.col("lng_hi"), res
            )
        ).alias("cell"),
    )
    a = cov.select(
        F.col(id_col).alias("aid"),
        F.col("cell"),
        F.col("lat_lo").alias("a_lat_lo"),
        F.col("lng_lo").alias("a_lng_lo"),
        F.col("lat_hi").alias("a_lat_hi"),
        F.col("lng_hi").alias("a_lng_hi"),
        *[F.col(f"x{i}").alias(f"a_x{i}") for i in (1, 2, 3)],
        *[F.col(f"y{i}").alias(f"a_y{i}") for i in (1, 2, 3)],
    )
    b = cov.select(
        F.col(id_col).alias("bid"),
        F.col("cell"),
        F.col("lat_lo").alias("b_lat_lo"),
        F.col("lng_lo").alias("b_lng_lo"),
        F.col("lat_hi").alias("b_lat_hi"),
        F.col("lng_hi").alias("b_lng_hi"),
        *[F.col(f"x{i}").alias(f"b_x{i}") for i in (1, 2, 3)],
        *[F.col(f"y{i}").alias(f"b_y{i}") for i in (1, 2, 3)],
    )
    bbox_overlap = (
        (F.col("a_lat_lo") <= F.col("b_lat_hi"))
        & (F.col("b_lat_lo") <= F.col("a_lat_hi"))
        & (F.col("a_lng_lo") <= F.col("b_lng_hi"))
        & (F.col("b_lng_lo") <= F.col("a_lng_hi"))
    )
    ilat = F.greatest(F.col("a_lat_lo"), F.col("b_lat_lo"))
    ilng = F.greatest(F.col("a_lng_lo"), F.col("b_lng_lo"))
    n = 2**res
    canon = (
        F.lit(res * RES_MULTIPLIER) + _ycol(ilat, res) * F.lit(n) + _xcol(ilng, res)
    )
    return (
        a.join(b, "cell")
        .filter(F.col("aid") < F.col("bid"))
        .filter(bbox_overlap)
        .filter(F.col("cell") == canon)  # bbox-level dedup, no distinct pass
        .filter(F.expr(sat_intersect_sql("a", "b")))
        .select(F.col("aid").alias("id_a"), F.col("bid").alias("id_b"))
    )
