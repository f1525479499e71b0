"""Spatio-temporal joins: co-location (contact) pairs and trajectory
segment crossings.

The reference joins candidates by vector proximity inside one collapsed
tree level (services/retrieval/retrieval_service.py collapsed mode); the
trajectory-analytics analogs over the tile grid are "who was near whom,
and when" (co-location join: pairs of users within eps degrees AND tau
seconds of each other) and "whose paths physically crossed" (segment
intersection join). Both use the filter-refine discipline every scale
spatial join in this repo follows:

  * candidates come from ONE equi-join on a composite (cell, time-bucket)
    or cover-cell key — never a cross join;
  * each qualifying pair is produced EXACTLY ONCE by construction (ring /
    reference-point technique), so no distinct shuffle is needed;
  * the exact predicate is pure codegen arithmetic, shared verbatim with
    the DuckDB oracle (IEEE ops on identical doubles are deterministic, so
    parity is by construction).

Scale shape at 100 TB: the event table is shuffled once on the composite
key; hot (cell, bucket) keys are bounded by the bucket width and AQE skew
split handles residual imbalance (same posture as within_distance_join).
Segment tables are built from one per-user window pass; the cover-cell
explode factor is capped by the max-span filter.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import cell_encode_col
from raptor_service_spark.operators.bbox_join import _xcol, _ycol, cover_cells_col
from raptor_service_spark.operators.neighborhood import kring_neighbor_col
from raptor_service_spark.geo.grid import RES_MULTIPLIER


def colocation_pairs(
    events: DataFrame,
    eps: float,
    tau_us: int,
    res: int | None = None,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Contact join: count event pairs of DIFFERENT users within ``eps``
    degrees (euclidean, rounded 6 dp — repo convention) and ``tau_us``
    microseconds of each other.

    Candidacy: left events keep their own (cell, bucket); right events
    explode to the 3x3 neighbor cells x {bucket-1, bucket, bucket+1} — any
    pair within eps and tau shares exactly one such composite key (the
    left's key is unique, the right ring covers it at most once), so every
    pair is found exactly once with no dedup pass. ``res`` defaults to the
    coarsest grid whose cell height covers eps.

    Output: (user_a, user_b, n_contacts) with user_a < user_b.
    """
    if res is None:
        res = max(0, int(math.floor(math.log2(180.0 / eps))))
    assert 180.0 / (1 << res) >= eps, "cell height must cover eps"

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(id_col).alias("uid"),
        F.col(lat_col).alias("plat"),
        F.col(lng_col).alias("plng"),
        us.alias("us"),
        cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("pcell"),
        F.floor(us / F.lit(tau_us)).cast("long").alias("tb"),
    )
    left = base.select(
        F.col("uid").alias("ua"),
        F.col("plat").alias("alat"),
        F.col("plng").alias("alng"),
        F.col("us").alias("aus"),
        F.col("pcell").alias("cell"),
        F.col("tb").alias("bkt"),
    )
    ring = F.filter(
        F.array_distinct(
            F.array(
                *[
                    kring_neighbor_col("pcell", res, dx, dy)
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ),
        lambda c: c.isNotNull(),
    )
    right = (
        base.select(
            F.col("uid").alias("ub"),
            F.col("plat").alias("blat"),
            F.col("plng").alias("blng"),
            F.col("us").alias("bus"),
            "pcell",
            "tb",
        )
        # two generators cannot share one projection — chain them
        .withColumn("cell", F.explode(ring))
        .withColumn(
            "bkt",
            F.explode(F.array(F.col("tb") - 1, F.col("tb"), F.col("tb") + 1)),
        )
        .drop("pcell", "tb")
    )
    dla = F.col("alat") - F.col("blat")
    dln = F.col("alng") - F.col("blng")
    dist = F.round(F.sqrt(dla * dla + dln * dln), 6)
    hits = (
        left.join(right, ["cell", "bkt"])
        .filter(F.col("ua") < F.col("ub"))
        .filter(F.abs(F.col("aus") - F.col("bus")) <= F.lit(tau_us))
        .filter(dist <= F.lit(eps))
    )
    return (
        hits.groupBy(F.col("ua").alias("user_a"), F.col("ub").alias("user_b"))
        .agg(F.count(F.lit(1)).alias("n_contacts"))
    )


def colocation_sql(
    events_sql: str,
    eps: float,
    tau_us: int,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lat_expr: str = "lat",
    lng_expr: str = "lng",
) -> str:
    """Brute-force DuckDB twin of colocation_pairs (same refine predicate;
    candidacy is exhaustive, so equality proves the exactly-once cover)."""
    return f"""
        WITH e AS (SELECT {id_col} AS uid, epoch_us({ts_col}) AS us,
                          {lat_expr} AS plat, {lng_expr} AS plng
                   FROM {events_sql})
        SELECT a.uid AS user_a, b.uid AS user_b, COUNT(*) AS n_contacts
        FROM e a JOIN e b ON a.uid < b.uid
        WHERE ABS(a.us - b.us) <= {tau_us}
          AND ROUND(SQRT((a.plat - b.plat) * (a.plat - b.plat)
                       + (a.plng - b.plng) * (a.plng - b.plng)), 6)
              <= CAST({eps!r} AS DOUBLE)
        GROUP BY 1, 2
    """


def seg_intersect_sql(a: str, b: str) -> str:
    """Closed-semantics segment-intersection predicate over two row prefixes
    ``a``/``b`` exposing (x1, y1, x2, y2) columns — ONE string that runs as
    Spark `F.expr` AND inside the DuckDB oracle.

    bbox-overlap AND orient(a, b1)*orient(a, b2) <= 0 AND
    orient(b, a1)*orient(b, a2) <= 0 — the CLRS straddle test; the bbox
    clause settles the all-collinear case, and a zero orientation with the
    opposite product <= 0 implies the touch point lies on both segments
    (the crossing of the two support lines is the zero's witness point).
    """

    def orient(px, py, qx, qy, rx, ry):
        return (
            f"(({qx} - {px}) * ({ry} - {py}) - ({qy} - {py}) * ({rx} - {px}))"
        )

    d1 = orient(f"{a}x1", f"{a}y1", f"{a}x2", f"{a}y2", f"{b}x1", f"{b}y1")
    d2 = orient(f"{a}x1", f"{a}y1", f"{a}x2", f"{a}y2", f"{b}x2", f"{b}y2")
    d3 = orient(f"{b}x1", f"{b}y1", f"{b}x2", f"{b}y2", f"{a}x1", f"{a}y1")
    d4 = orient(f"{b}x1", f"{b}y1", f"{b}x2", f"{b}y2", f"{a}x2", f"{a}y2")
    bbox = (
        f"GREATEST({a}x1, {a}x2) >= LEAST({b}x1, {b}x2) AND "
        f"GREATEST({b}x1, {b}x2) >= LEAST({a}x1, {a}x2) AND "
        f"GREATEST({a}y1, {a}y2) >= LEAST({b}y1, {b}y2) AND "
        f"GREATEST({b}y1, {b}y2) >= LEAST({a}y1, {a}y2)"
    )
    return f"({bbox} AND {d1} * {d2} <= 0 AND {d3} * {d4} <= 0)"


def user_segments(
    events: DataFrame,
    max_span: float,
    id_col: str = "user_id",
    ts_col: str = "ts",
    ord_col: str = "event_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Per-user consecutive-event segments (x=lng, y=lat), dropping
    zero-length segments and teleports longer than ``max_span`` degrees on
    either axis (which would otherwise blow up the cover-cell factor).

    Output: (uid, x1, y1, x2, y2). One user-partitioned window shuffle.
    """
    w = Window.partitionBy(id_col).orderBy(ts_col, ord_col)
    seg = (
        events.select(
            F.col(id_col).alias("uid"),
            F.col(lng_col).alias("x2"),
            F.col(lat_col).alias("y2"),
            F.lag(lng_col).over(w).alias("x1"),
            F.lag(lat_col).over(w).alias("y1"),
        )
        .filter(F.col("x1").isNotNull())
        .filter((F.col("x1") != F.col("x2")) | (F.col("y1") != F.col("y2")))
        .filter(
            (F.abs(F.col("x1") - F.col("x2")) <= max_span)
            & (F.abs(F.col("y1") - F.col("y2")) <= max_span)
        )
    )
    return seg


def segment_crossings(
    segs: DataFrame,
    res: int,
) -> DataFrame:
    """Trajectory-crossing join: for every pair of users, count segment
    pairs that physically intersect (closed semantics, touches included).

    Candidates: each segment explodes to the cover cells of its bbox at
    ``res`` (codegen sequence x sequence); one cell equi-join; duplicate
    suppression via the reference-point technique — a pair is emitted only
    in the cover cell of its intersection bbox's lower-left corner, so no
    distinct pass. Refine = the shared seg_intersect_sql arithmetic.

    Output: (user_a, user_b, n_crossings) with user_a < user_b.
    """
    cov = segs.select(
        "uid",
        "x1",
        "y1",
        "x2",
        "y2",
        F.explode(
            cover_cells_col(
                F.least("y1", "y2"),
                F.greatest("y1", "y2"),
                F.least("x1", "x2"),
                F.greatest("x1", "x2"),
                res,
            )
        ).alias("cell"),
    )
    a = cov.select(
        F.col("uid").alias("ua"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"),
        "cell",
    )
    b = cov.select(
        F.col("uid").alias("ub"),
        F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"),
        F.col("y2").alias("by2"),
        "cell",
    )
    ilat = F.greatest(
        F.least("ay1", "ay2"), F.least("by1", "by2")
    )
    ilng = F.greatest(
        F.least("ax1", "ax2"), F.least("bx1", "bx2")
    )
    n = 2**res
    canon = (
        F.lit(res * RES_MULTIPLIER) + _ycol(ilat, res) * F.lit(n) + _xcol(ilng, res)
    )
    hits = (
        a.join(b, "cell")
        .filter(F.col("ua") < F.col("ub"))
        .filter(F.col("cell") == canon)
        .filter(F.expr(seg_intersect_sql("a", "b")))
    )
    return (
        hits.groupBy(F.col("ua").alias("user_a"), F.col("ub").alias("user_b"))
        .agg(F.count(F.lit(1)).alias("n_crossings"))
    )


def segment_crossings_sql(events_sql: str, max_span: float, lat_expr: str, lng_expr: str) -> str:
    """Brute-force DuckDB twin: same window segment build, same predicate,
    exhaustive pair join — equality proves the cover-cell candidacy and the
    reference-point dedup.

    ``g`` is AS MATERIALIZED and the orientation products are computed in a
    projection level above the join: letting DuckDB inline the window CTE
    into both join sides and push the straddle arithmetic into the join
    filter trips an internal "flat vector" assertion (DuckDB 1.x bug) that
    invalidates the whole connection — which would cascade-fail every
    later oracle in the driver's single-connection sweep."""
    return f"""
        WITH p AS (SELECT user_id AS uid, ts, event_id,
                          {lng_expr} AS x, {lat_expr} AS y
                   FROM {events_sql}),
        s AS (SELECT uid, x AS x2, y AS y2,
                     LAG(x) OVER w AS x1, LAG(y) OVER w AS y1
              FROM p WINDOW w AS (PARTITION BY uid ORDER BY ts, event_id)),
        g AS MATERIALIZED (SELECT * FROM s
              WHERE x1 IS NOT NULL AND (x1 != x2 OR y1 != y2)
                AND ABS(x1 - x2) <= {max_span!r} AND ABS(y1 - y2) <= {max_span!r}),
        j AS (SELECT a.uid AS ua, b.uid AS ub,
                 ((a.x2 - a.x1) * (b.y1 - a.y1)
                  - (a.y2 - a.y1) * (b.x1 - a.x1)) AS d1,
                 ((a.x2 - a.x1) * (b.y2 - a.y1)
                  - (a.y2 - a.y1) * (b.x2 - a.x1)) AS d2,
                 ((b.x2 - b.x1) * (a.y1 - b.y1)
                  - (b.y2 - b.y1) * (a.x1 - b.x1)) AS d3,
                 ((b.x2 - b.x1) * (a.y2 - b.y1)
                  - (b.y2 - b.y1) * (a.x2 - b.x1)) AS d4
              FROM g a JOIN g b ON a.uid < b.uid
              WHERE GREATEST(a.x1, a.x2) >= LEAST(b.x1, b.x2)
                AND GREATEST(b.x1, b.x2) >= LEAST(a.x1, a.x2)
                AND GREATEST(a.y1, a.y2) >= LEAST(b.y1, b.y2)
                AND GREATEST(b.y1, b.y2) >= LEAST(a.y1, a.y2))
        SELECT ua AS user_a, ub AS user_b, COUNT(*) AS n_crossings
        FROM j WHERE d1 * d2 <= 0 AND d3 * d4 <= 0
        GROUP BY 1, 2
    """


# Point-to-segment squared distance over columns (px, py, x1, y1, x2, y2):
# project the point onto the segment's support line, clamp the parameter to
# [0, 1], measure to the clamped foot. One string shared verbatim by Spark
# F.expr and the DuckDB oracle — parity by construction. The projection
# parameter is repeated textually (2x) rather than materialized; the tree
# stays small enough for codegen.
def point_seg_d2_sql() -> str:
    vx, vy = "(x2 - x1)", "(y2 - y1)"
    tr = (
        f"(((px - x1) * {vx} + (py - y1) * {vy}) "
        f"/ ({vx} * {vx} + {vy} * {vy}))"
    )
    t = f"LEAST(GREATEST({tr}, CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))"
    dx = f"(px - (x1 + {t} * {vx}))"
    dy = f"(py - (y1 + {t} * {vy}))"
    return f"({dx} * {dx} + {dy} * {dy})"


def snap_to_segments(
    points: DataFrame,
    segs: DataFrame,
    res: int,
    max_dist: float,
) -> DataFrame:
    """Map-matching primitive: snap each point to its nearest segment
    within ``max_dist`` degrees (Euclidean point-to-segment distance).

    ``points``: (pid, px, py); ``segs``: (uid, x1, y1, x2, y2) — e.g. from
    `user_segments`, which already drops zero-length segments (the d2
    formula divides by the segment's squared length).

    Candidates: each segment explodes to the cover cells of its bbox
    EXPANDED by max_dist (Euclidean distance dominates per-axis distance,
    so every point within max_dist shares a cell — candidacy is complete);
    each point maps to its ONE cell, so a (point, segment) pair appears at
    most once and the per-point argmin needs no dedup. One cell equi-join
    is the only data shuffle; refine + argmin are codegen + one partial+
    final agg (min over the lexicographic (d2, uid, x1, y1, x2, y2) struct
    — deterministic tie-break).

    Output: (pid, uid, d2) with d2 rounded to 9 dp AFTER the argmin.
    """
    n = 2**res
    cov = segs.select(
        "uid",
        "x1",
        "y1",
        "x2",
        "y2",
        F.explode(
            cover_cells_col(
                F.least("y1", "y2") - F.lit(max_dist),
                F.greatest("y1", "y2") + F.lit(max_dist),
                F.least("x1", "x2") - F.lit(max_dist),
                F.greatest("x1", "x2") + F.lit(max_dist),
                res,
            )
        ).alias("cell"),
    )
    pc = points.select(
        "pid",
        "px",
        "py",
        (
            F.lit(res * RES_MULTIPLIER)
            + _ycol(F.col("py"), res) * F.lit(n)
            + _xcol(F.col("px"), res)
        ).alias("cell"),
    )
    cand = (
        pc.join(cov, "cell")
        .withColumn("d2", F.expr(point_seg_d2_sql()))
        .filter(F.col("d2") <= F.lit(max_dist * max_dist))
    )
    return (
        cand.groupBy("pid")
        .agg(F.min(F.struct("d2", "uid", "x1", "y1", "x2", "y2")).alias("m"))
        .select(
            "pid",
            F.col("m.uid").alias("uid"),
            F.round(F.col("m.d2"), 9).alias("d2"),
        )
    )


def snap_to_segments_sql(
    points_sql: str,
    events_sql: str,
    max_span: float,
    max_dist: float,
    lat_expr: str,
    lng_expr: str,
) -> str:
    """Brute-force DuckDB twin: same window segment build, exhaustive
    point x segment join with the SAME d2 string, same (d2, uid, …)
    argmin — equality proves the expanded-cover candidacy is complete.
    ``points_sql`` must yield (pid, px, py)."""
    d2 = point_seg_d2_sql()
    md2 = repr(max_dist * max_dist)
    return f"""
        WITH p AS (SELECT user_id AS uid, ts, event_id,
                          {lng_expr} AS x, {lat_expr} AS y
                   FROM {events_sql}),
        s AS (SELECT uid, x AS x2, y AS y2,
                     LAG(x) OVER w AS x1, LAG(y) OVER w AS y1
              FROM p WINDOW w AS (PARTITION BY uid ORDER BY ts, event_id)),
        g AS MATERIALIZED (SELECT * FROM s
              WHERE x1 IS NOT NULL AND (x1 != x2 OR y1 != y2)
                AND ABS(x1 - x2) <= {max_span!r} AND ABS(y1 - y2) <= {max_span!r}),
        pts AS (SELECT * FROM {points_sql}),
        cand AS (SELECT pts.pid, g.uid, g.x1, g.y1, g.x2, g.y2,
                        pts.px, pts.py, {d2} AS d2
                 FROM pts CROSS JOIN g),
        hit AS (SELECT pid, uid, d2,
                       ROW_NUMBER() OVER (
                           PARTITION BY pid
                           ORDER BY d2, uid, x1, y1, x2, y2
                       ) AS rn
                FROM cand WHERE d2 <= CAST({md2} AS DOUBLE))
        SELECT pid, uid, ROUND(d2, 9) AS d2 FROM hit WHERE rn = 1
    """
