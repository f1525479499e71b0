"""Deterministic Lloyd's k-means over planar points (graft-new clustering).

The reference's pipeline clusters embeddings with GMM (RAPTOR's collapsed
tree, `services/core/build_tree_service.py`); the engine's grid ladder
replaces it for tree building, but a real iterative k-means is the classic
"would your engine survive an iterative ML loop?" operator — same dataflow
family as PageRank (`operators/cell_graph.py`), so it follows the same
cross-engine determinism recipe: fixed iteration count, centroids rounded
to 9 dp per iteration, final output rounded to 6 dp.

Scale shape (the MLlib recipe): centroids are O(k) and live on the driver;
each iteration is ONE full-table codegen projection (argmin over k literal
centroids — an F.when chain, no join, no shuffle of the points) followed by
a partial+final agg down to k rows. Nothing data-sized is ever collected;
a 100 TB point table does k·iters aggregates of k rows each.

Determinism contract (parity with the unrolled-CTE DuckDB oracle):
- init = the k points with smallest id (TakeOrderedAndProject, not a sort),
  cid assigned in id order;
- assignment argmin tie-breaks toward the smaller cid (strict `<` chain on
  lexicographic (dist, cid), expressed as `d_i <= d_j` for j > i);
- AVG is order-dependent across engines; the 9 dp per-iteration rounding
  absorbs the last-bit differences (PageRank precedent);
- empty clusters simply drop out of the next round (both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _assign(pts: DataFrame, cents: list[tuple[int, float, float]], x: str, y: str):
    """Argmin-over-literal-centroids column: nearest cid, ties -> smaller cid."""
    # explicit multiply, not **2 (pow() is libm — x*x is the shared form)
    dists = {
        cid: (F.col(x) - F.lit(cx)) * (F.col(x) - F.lit(cx))
        + (F.col(y) - F.lit(cy)) * (F.col(y) - F.lit(cy))
        for cid, cx, cy in cents
    }
    cids = sorted(dists)
    expr = F.lit(cids[-1])
    for i in range(len(cids) - 2, -1, -1):
        ci = cids[i]
        cond = None
        for cj in cids[i + 1 :]:
            c = dists[ci] <= dists[cj]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(ci)).otherwise(expr)
    return expr


def kmeans(
    pts: DataFrame,
    k: int = 8,
    n_iters: int = 4,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Run ``n_iters`` Lloyd rounds; return (cid, n_points, cx, cy) of the
    FINAL update, ordered by cid — sizes and 6 dp means of the last
    assignment."""
    spark = pts.sparkSession
    base = pts.select(
        F.col(id_col).alias("id"), F.col(x).alias("x"), F.col(y).alias("y")
    ).localCheckpoint(eager=True)

    # all rounding happens in Spark SQL (HALF_UP, matching DuckDB's
    # away-from-zero on these magnitudes) — Python's round() is banker's
    # and must not touch any value on the parity path
    init = (
        base.orderBy("id")
        .limit(k)
        .select(F.round("x", 9).alias("x"), F.round("y", 9).alias("y"), "id")
        .orderBy("id")
        .collect()
    )
    cents = [(i, r.x, r.y) for i, r in enumerate(init)]
    last = None
    for _ in range(n_iters):
        agg = (
            base.withColumn("cid", _assign(base, cents, "x", "y"))
            .groupBy("cid")
            .agg(
                F.round(F.avg("x"), 9).alias("cx"),
                F.round(F.avg("y"), 9).alias("cy"),
                F.count(F.lit(1)).alias("n_points"),
            )
        )
        last = agg.orderBy("cid").collect()
        cents = [(r.cid, r.cx, r.cy) for r in last]
    return (
        spark.createDataFrame(
            [(r.cid, r.n_points, r.cx, r.cy) for r in last],
            "cid int, n_points bigint, cx double, cy double",
        )
        .select(
            "cid",
            "n_points",
            F.round("cx", 6).alias("cx"),
            F.round("cy", 6).alias("cy"),
        )
        .orderBy("cid")
    )


def kmeans_sql(src_sql: str, k: int = 8, n_iters: int = 4) -> str:
    """DuckDB twin: the same rounds unrolled as a CTE chain. ``src_sql``
    must yield (id, x, y). Assignment is the relational argmin (CROSS JOIN
    k centroids + ROW_NUMBER over (dist, cid)) — same (dist, cid)
    lexicographic ordering as the engine's literal-centroid chain."""
    steps = []
    for t in range(1, n_iters + 1):
        steps.append(
            f"""a{t} AS (
            SELECT p.id, p.x, p.y, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.id
                       ORDER BY (p.x - c.cx) * (p.x - c.cx)
                              + (p.y - c.cy) * (p.y - c.cy), c.cid
                   ) AS rn
            FROM p CROSS JOIN c{t - 1} c
        ),
        c{t} AS (
            SELECT cid, ROUND(AVG(x), 9) AS cx, ROUND(AVG(y), 9) AS cy,
                   COUNT(*) AS n_points
            FROM a{t} WHERE rn = 1 GROUP BY 1
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH p AS (SELECT id, x, y FROM {src_sql}),
        c0 AS (
            SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid,
                   ROUND(x, 9) AS cx, ROUND(y, 9) AS cy
            FROM (SELECT * FROM p ORDER BY id LIMIT {k})
        ),
        {chain}
        SELECT cid, n_points, ROUND(cx, 6) AS cx, ROUND(cy, 6) AS cy
        FROM c{n_iters} ORDER BY cid
    """


def kmeans_centroids(
    pts: DataFrame,
    k: int = 8,
    n_iters: int = 4,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> list[tuple[int, float, float]]:
    """The same Lloyd rounds as ``kmeans`` but returning the FINAL 9-dp
    centroid list (cid, cx, cy) — the raw model, for downstream scoring
    (silhouette, assignment audits). O(k) driver rows per round."""
    base = pts.select(
        F.col(id_col).alias("id"), F.col(x).alias("x"), F.col(y).alias("y")
    ).localCheckpoint(eager=True)
    init = (
        base.orderBy("id")
        .limit(k)
        .select(F.round("x", 9).alias("x"), F.round("y", 9).alias("y"), "id")
        .orderBy("id")
        .collect()
    )
    cents = [(i, r.x, r.y) for i, r in enumerate(init)]
    for _ in range(n_iters):
        agg = (
            base.withColumn("cid", _assign(base, cents, "x", "y"))
            .groupBy("cid")
            .agg(
                F.round(F.avg("x"), 9).alias("cx"),
                F.round(F.avg("y"), 9).alias("cy"),
            )
        )
        cents = [(r.cid, r.cx, r.cy) for r in agg.orderBy("cid").collect()]
    return cents
