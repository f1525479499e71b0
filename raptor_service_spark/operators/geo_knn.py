"""Spatial (lat/lng) k-nearest-neighbor join with grid-pruned candidates.

Geo twin of the embedding-space grid kNN (operators/knn.py): for each of a
small set of query points, return the exact k nearest data points by
euclidean degree-space distance, touching only the grid cells that can
possibly contain them.

Reference parity: this generalizes the reference's single-point retrieval
fan-out (services/retrieval/retrieval_service.py:96-141 — query embedding →
candidate cluster members → exact re-score) to geographic coordinates; the
candidate expansion primitive is the same k-ring used by the tile tree
(geo/grid.py kring_np) instead of GMM cluster membership.

Scale shape (100 TB):
  * one map-side-combinable ``groupBy(cell).count()`` over the points —
    the occupancy histogram the driver plans rings with (O(occupied cells)
    collected, never point rows);
  * one candidate pass: broadcast (qid, cell) list joined against the
    cell-encoded points — partition pruning when the table is written
    partitionBy(cell prefix); candidate volume is bounded by ring occupancy,
    not table size;
  * exact refine is a codegen sqrt + per-qid window top-k (rows after the
    window shuffle: O(n_queries * k)).

Exactness: rings expand until the histogram shows >= k candidates inside
ring r; every candidate in ring r lies within d_ub = (r+1) * hypot(ch, cw)
degrees, so the k-th neighbor distance <= d_ub. The final ring
R = floor((d_ub + ch) / ch) + 2 then covers every point at distance
<= d_ub + ch: a point with |dlat| <= d sits within dy <= d/ch + 1 cells
(worst case: query on a cell edge), and (R - 1) * ch >= d_ub + ch. The +ch
guard also absorbs the repo's 6-dp rounded-distance tie convention.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from raptor_service_spark.geo.grid import RES_MULTIPLIER, cell_encode_col, cell_encode_np


def _ring_cells(qx: int, qy: int, res: int, ring: int) -> np.ndarray:
    """Cell ids within Chebyshev distance ``ring`` (lng wrap, lat clamp)."""
    n = 1 << res
    dxs, dys = np.meshgrid(np.arange(-ring, ring + 1), np.arange(-ring, ring + 1))
    xs = (qx + dxs.ravel()) % n
    ys = qy + dys.ravel()
    ok = (ys >= 0) & (ys < n)
    return np.unique(
        np.int64(res) * RES_MULTIPLIER + ys[ok].astype(np.int64) * n + xs[ok].astype(np.int64)
    )


def geo_knn_join(
    points: DataFrame,
    queries: dict[str, tuple[float, float]],
    k: int,
    res: int = 6,
    max_ring: int = 64,
    lat_col: str = "lat",
    lng_col: str = "lng",
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact k nearest ``points`` per query, distance = degree-space euclid.

    Output: (qid, <payload_cols>, dist) with dist rounded to 6 dp and rows
    deterministically ordered by (round(dist, 6), first payload col) within
    each qid — the repo's cross-engine float convention.
    """
    spark = points.sparkSession
    n = 1 << res
    ch = 180.0 / n  # cell height (lat degrees); width is 2 * ch

    pts = points.withColumn(
        "_cell", cell_encode_col(F.col(lat_col), F.col(lng_col), res)
    )

    # --- plan rings from the occupancy histogram (one agg, O(cells) driver)
    qxy = {}
    for qid, (la, ln) in queries.items():
        cell = int(cell_encode_np(np.array([la]), np.array([ln]), res)[0])
        rem = cell - res * RES_MULTIPLIER
        qxy[qid] = (rem % n, rem // n)
    probe_rows = [
        (qid, int(c))
        for qid, (qx, qy) in qxy.items()
        for c in _ring_cells(qx, qy, res, max_ring)
    ]
    probe_df = spark.createDataFrame(probe_rows, "qid string, cell long")
    hist = (
        pts.groupBy(F.col("_cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(probe_df.select("cell").distinct()), "cell")
        .collect()
    )
    occ = {int(r["cell"]): int(r["cnt"]) for r in hist}

    cand_rows: list[tuple[str, int]] = []
    for qid, (qx, qy) in qxy.items():
        ring, got = 0, 0
        while ring < max_ring:
            got = sum(occ.get(int(c), 0) for c in _ring_cells(qx, qy, res, ring))
            if got >= k:
                break
            ring += 1
        d_ub = (ring + 1) * math.hypot(ch, 2.0 * ch)
        final_ring = min(max_ring, int(math.floor((d_ub + ch) / ch)) + 2)
        cand_rows.extend(
            (qid, int(c))
            for c in _ring_cells(qx, qy, res, final_ring)
            if int(c) in occ
        )
    cand_df = spark.createDataFrame(cand_rows, "qid string, cell long")

    centers_df = spark.createDataFrame(
        [(q, float(la), float(ln)) for q, (la, ln) in queries.items()],
        "qid string, clat double, clng double",
    )

    # --- one candidate pass: broadcast cell list, codegen refine, window top-k
    dla = F.col(lat_col) - F.col("clat")
    dln = F.col(lng_col) - F.col("clng")
    tie = payload_cols[0] if payload_cols else "_cell"
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col(tie).asc())
    return (
        pts.join(F.broadcast(cand_df), pts["_cell"] == cand_df["cell"], "inner")
        .join(F.broadcast(centers_df), "qid")
        .withColumn("dist", F.round(F.sqrt(dla * dla + dln * dln), 6))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("qid", *payload_cols, "dist")
    )


def nn_distances(
    points: DataFrame,
    res: int,
    max_ring: int = 32,
) -> DataFrame:
    """Self nearest-neighbor join: for EVERY point, the exact degree-space
    distance to its nearest OTHER point. The all-pairs-NN primitive under
    point-pattern statistics (Clark-Evans) and spacing audits.

    ``points``: (pid, px, py). Output: (pid, d1, nn_id) — d1 NOT rounded
    (callers aggregate first, round last); nn_id is the nearest neighbor's
    pid, ties broken to the smallest pid (struct-min), so downstream
    type-of-neighbor statistics (colocation quotient) are deterministic.
    """
    data = points.select(
        F.col("pid").alias("did"),
        F.col("px").alias("dx"),
        F.col("py").alias("dy"),
    )
    return nn_join(points, data, res, max_ring=max_ring, exclude_same_id=True)


def nn_join(
    queries: DataFrame,
    data: DataFrame,
    res: int,
    max_ring: int = 32,
    exclude_same_id: bool = False,
) -> DataFrame:
    """Exact nearest-DATA-point per QUERY point (degree-space euclid) — the
    query→data generalization of `nn_distances` (which delegates here with
    data = the query table itself and ``exclude_same_id=True``). The
    empty-space F-function and catchment audits need exactly this shape:
    sample/query points on one side, the observed point pattern on the
    other.

    ``queries``: (pid, px, py); ``data``: (did, dx, dy). Output:
    (pid, d1, nn_id) — d1 NOT rounded (callers aggregate first, round
    last); nn_id ties break to the smallest did (struct-min).

    Exactness by ring doubling: round R joins each unresolved query's
    (2R+1)² cover cells against the cell-keyed data table and keeps its
    best candidate; the answer is CONFIRMED when best < R·ch (ch = cell
    height — any point in an unexplored cell is at least R·ch away),
    otherwise the query retries at 2R. O(log max_ring) rounds; each round
    shuffles only unresolved queries × their cover cells — sparse regions
    pay more rings, dense regions resolve in round 1. Queries still
    unresolved past max_ring keep their best-so-far (or drop out if no
    data point was ever seen).
    """
    from raptor_service_spark.operators.bbox_join import cover_cells_col

    n = 1 << res
    ch = 180.0 / n
    pts = queries.select("pid", "px", "py").localCheckpoint(eager=True)
    data = data.select("did", "dx", "dy").withColumn(
        "cell", cell_encode_col(F.col("dy"), F.col("dx"), res)
    )
    resolved = None
    unresolved = pts
    ring = 1
    while ring <= max_ring:
        cov = unresolved.select(
            "pid",
            "px",
            "py",
            F.explode(
                cover_cells_col(
                    F.col("py") - F.lit(ring * ch),
                    F.col("py") + F.lit(ring * ch),
                    F.col("px") - F.lit(ring * 2 * ch),
                    F.col("px") + F.lit(ring * 2 * ch),
                    res,
                )
            ).alias("cell"),
        )
        hits = cov.join(data, "cell")
        if exclude_same_id:
            hits = hits.filter(F.col("pid") != F.col("did"))
        best = (
            hits.select(
                "pid",
                F.sqrt(
                    (F.col("px") - F.col("dx")) * (F.col("px") - F.col("dx"))
                    + (F.col("py") - F.col("dy")) * (F.col("py") - F.col("dy"))
                ).alias("d"),
                "did",
            )
            .groupBy("pid")
            # struct-min == min distance with a deterministic min-id
            # tie-break, so the NEIGHBOR IDENTITY comes out for free
            .agg(F.min(F.struct("d", "did")).alias("b"))
            .select("pid", F.col("b.d").alias("d1"), F.col("b.did").alias("nn_id"))
        )
        done = best.filter(F.col("d1") < F.lit(ring * ch)).localCheckpoint(
            eager=True
        )
        resolved = done if resolved is None else resolved.unionByName(done)
        unresolved = unresolved.join(done.select("pid"), "pid", "left_anti")
        if ring == max_ring or unresolved.isEmpty():
            # keep best-so-far for anything still open at the cap
            if ring == max_ring and not unresolved.isEmpty():
                rest = best.join(done.select("pid"), "pid", "left_anti")
                resolved = resolved.unionByName(rest)
            break
        unresolved = unresolved.localCheckpoint(eager=True)
        ring = min(ring * 2, max_ring)
    return resolved
