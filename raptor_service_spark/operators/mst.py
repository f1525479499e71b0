"""Borůvka minimum-spanning-tree over the occupied-cell adjacency graph.

The MST is the backbone of single-linkage / HDBSCAN-style spatial
clustering and of network-design summaries ("cheapest corridor set
connecting every occupied tile"). Borůvka is THE distributed MST
algorithm: every round each component picks its minimum outgoing edge
(one grouped min over the edge table), the chosen edges merge components
(hook + pointer-jumping shortcuts), and the component count at least
halves — O(log n) rounds, every step a join/agg Spark shuffles natively
(this is also exactly how GraphFrames' internal algorithms are shaped).

Determinism: edges carry the total order (w, a, b) — lexicographic
tie-break makes all weights distinct, so the MST is UNIQUE and both
engines converge to the identical edge set with pure-integer arithmetic
(no float protocol at all).

Merge correctness: each round's choice function q maps a component to
its min-edge partner; the functional graph of q has exactly one 2-cycle
per merge tree (the mutually-minimal pair — a classic Borůvka
invariant under distinct weights). Hook p(x) = min(x, q(x)) on the
2-cycle and q(x) elsewhere yields a proper forest; J pointer-jumping
steps (p = p∘p) with 2^J ≥ n collapse every tree to its root, so
component labels are exact — no "iterate until converged" loop the SQL
twin could truncate differently. Both engines run the SAME fixed
(rounds, jumps) schedule; exhausted rounds are provable no-ops.

Scale shape at 10^12 docs: the node set is occupied TILES (bounded by
the grid resolution, not the corpus), the per-round work is two
broadcast-size hash joins + a grouped min over O(tiles·8) edges, and
the component table shrinks geometrically. Reference analog: the
cluster-merge ladder of services/core/build_tree_service.py:85-161,
recast as the textbook distributed MST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from raptor_service_spark.geo.grid import cell_encode_col, cell_encode_sql
from raptor_service_spark.operators.cell_graph import _RING
from raptor_service_spark.operators.neighborhood import (
    kring_neighbor_col,
    kring_neighbor_sql,
)


def cell_edges(points: DataFrame, res: int) -> DataFrame:
    """(a, b, w) 8-adjacency edges between occupied cells, a < b,
    w = |count_a − count_b| (integer similarity-of-density weight)."""
    nodes = (
        points.select(cell_encode_col(F.col("lat"), F.col("lng"), res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nbrs = F.array(*[kring_neighbor_col("cell", res, dx, dy) for dx, dy in _RING])
    adj = nodes.select(
        F.col("cell").alias("a"),
        F.col("cnt").alias("acnt"),
        F.explode(F.filter(nbrs, lambda v: v.isNotNull())).alias("b"),
    )
    return (
        adj.join(
            nodes.select(F.col("cell").alias("b"), F.col("cnt").alias("bcnt")), "b"
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.abs(F.col("acnt") - F.col("bcnt")).alias("w"))
    )


def boruvka_mst(
    edges: DataFrame, rounds: int = 10, jumps: int = 10
) -> DataFrame:
    """MST edge set (cell_a, cell_b, w) of the undirected integer-weighted
    edge table, by fixed-schedule Borůvka (see module docstring). Requires
    2^rounds ≥ n for the node count n.

    The heavy step — each component's min outgoing edge over the full
    edge table — is a distributed grouped min. The label CONTRACTION
    (hook + pointer jumping) runs on the O(components) choice table,
    which is bounded by occupied TILES, not data: it is collected and
    contracted on the driver (the kmeans-centroid/frontier posture —
    O(tiles·rounds) driver state), then rebroadcast as the new label
    map. A lazy in-plan jump chain would double the logical plan per
    jump (p is referenced twice), so the driver contraction is also the
    plan-size-safe choice. The SQL twin unrolls hook + ``jumps``
    pointer-jump layers instead; both converge to the exact roots, so
    results are identical."""
    chosen_all, _comp, edges = _boruvka_loop(edges, rounds)
    if chosen_all is None:
        return edges.select(
            F.col("a").alias("cell_a"), F.col("b").alias("cell_b"), "w"
        ).limit(0)
    return (
        chosen_all.distinct()
        .select(F.col("a").alias("cell_a"), F.col("b").alias("cell_b"), "w")
        .orderBy("w", "cell_a", "cell_b")
    )


def graph_components(
    edges: DataFrame, rounds: int = 10, nodes: DataFrame | None = None
) -> DataFrame:
    """Connected-component labels (cell, comp) of the undirected edge
    table — the SAME Borůvka merge schedule run to exhaustion (a graph's
    MST forest spans exactly its components, so the final label table IS
    the component map; the root label is deterministic under the
    (w, a, b) total order). ``nodes`` (one ``cell`` column) adds isolated
    vertices as singleton components. Used for density-similarity raster
    segmentation (`cell_segmentation`)."""
    _chosen, comp, _edges = _boruvka_loop(edges, rounds, nodes=nodes)
    return comp


def _boruvka_loop(edges: DataFrame, rounds: int, nodes: DataFrame | None = None):
    edges = edges.localCheckpoint(eager=True)
    if nodes is None:
        nodes = (
            edges.select(F.col("a").alias("cell"))
            .unionByName(edges.select(F.col("b").alias("cell")))
            .distinct()
        )
    comp = (
        nodes.select("cell")
        .withColumn("comp", F.col("cell"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    chosen_all = None
    for _ in range(rounds):
        e2 = (
            edges.join(
                comp.select(F.col("cell").alias("a"), F.col("comp").alias("ca")),
                "a",
            )
            .join(
                comp.select(F.col("cell").alias("b"), F.col("comp").alias("cb")),
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
        )
        cand = e2.select(
            F.col("ca").alias("cm"),
            F.struct("w", "a", "b", F.col("cb").alias("oth")).alias("ch"),
        ).unionByName(
            e2.select(
                F.col("cb").alias("cm"),
                F.struct("w", "a", "b", F.col("ca").alias("oth")).alias("ch"),
            )
        )
        choice = cand.groupBy("cm").agg(F.min("ch").alias("ch")).select(
            "cm",
            F.col("ch.w").alias("w"),
            F.col("ch.a").alias("a"),
            F.col("ch.b").alias("b"),
            F.col("ch.oth").alias("oth"),
        )
        rows = choice.collect()  # O(components) ≤ occupied tiles
        if not rows:
            break
        picked = spark.createDataFrame(
            sorted({(r["w"], r["a"], r["b"]) for r in rows}),
            "w long, a long, b long",
        )
        chosen_all = (
            picked if chosen_all is None else chosen_all.unionByName(picked)
        )
        # hook: q maps comp -> min-edge partner; roots = min of each
        # mutual pair; then follow pointers to the root (exact — the SQL
        # twin's 2^jumps pointer-jump cover reaches the same fixpoint).
        q = {r["cm"]: r["oth"] for r in rows}
        p = {
            x: (min(x, qx) if q.get(qx) == x else qx) for x, qx in q.items()
        }
        roots = {}

        def _root(x: int) -> int:
            seen = []
            while x in p and p[x] != x and x not in roots:
                seen.append(x)
                x = p[x]
            r = roots.get(x, x)
            for s in seen:
                roots[s] = r
            return r

        mapping = [(x, _root(x)) for x in q]
        pmap = spark.createDataFrame(mapping, "comp long, p long")
        comp = (
            comp.join(F.broadcast(pmap), "comp", "left")
            .select("cell", F.coalesce("p", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
    return chosen_all, comp, edges


def boruvka_mst_sql(
    points_sql: str,
    res: int,
    rounds: int = 10,
    jumps: int = 10,
    max_w: int | None = None,
    final: str = "mst",
) -> str:
    """DuckDB twin: the SAME fixed (rounds, jumps) schedule unrolled as a
    CTE chain (the pagerank_sql technique). ``points_sql`` must yield
    (lat, lng) rows. ``max_w`` pre-filters edges (segmentation);
    ``final`` picks the MST edge list or the component label map."""
    cell = cell_encode_sql("lat", "lng", res)
    nbr = kring_neighbor_sql("n.cell", res, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    wfilter = "" if max_w is None else f" AND ABS(adj.acnt - y.cnt) <= {max_w}"
    ctes = [
        f"pts AS (SELECT lat, lng FROM ({points_sql}))",
        f"nodes AS (SELECT {cell} AS cell, COUNT(*) AS cnt FROM pts GROUP BY 1)",
        f"""adj AS (SELECT n.cell AS a, n.cnt AS acnt, {nbr} AS b
               FROM nodes n CROSS JOIN (VALUES {offs}) o(dx, dy)
               WHERE {nbr} IS NOT NULL)""",
        f"""edges AS MATERIALIZED (
               SELECT adj.a, adj.b, ABS(adj.acnt - y.cnt) AS w
               FROM adj JOIN nodes y ON adj.b = y.cell
               WHERE adj.a < adj.b{wfilter})""",
        "c0 AS (SELECT cell, cell AS comp FROM nodes)",
    ]
    pick_unions = []
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        ctes.append(
            f"""e{r} AS (SELECT e.a, e.b, e.w, ca.comp AS ca, cb.comp AS cb
               FROM edges e JOIN {prev} ca ON e.a = ca.cell
                            JOIN {prev} cb ON e.b = cb.cell
               WHERE ca.comp != cb.comp)"""
        )
        ctes.append(
            f"""ch{r} AS MATERIALIZED (
               SELECT cm, MIN(struct_pack(w := w, a := a, b := b, oth := oth))
                          AS ch
               FROM (SELECT ca AS cm, w, a, b, cb AS oth FROM e{r}
                     UNION ALL
                     SELECT cb AS cm, w, a, b, ca AS oth FROM e{r})
               GROUP BY 1)"""
        )
        ctes.append(f"q{r} AS (SELECT cm, ch.oth AS q FROM ch{r})")
        ctes.append(
            f"""p{r}_0 AS (
               SELECT d.comp,
                      COALESCE(CASE WHEN qq.q = d.comp
                                    THEN LEAST(d.comp, q1.q)
                                    ELSE q1.q END, d.comp) AS p
               FROM (SELECT DISTINCT comp FROM {prev}) d
               LEFT JOIN q{r} q1 ON d.comp = q1.cm
               LEFT JOIN q{r} qq ON q1.q = qq.cm)"""
        )
        for j in range(1, jumps + 1):
            # MATERIALIZED is load-bearing: each jump references its
            # predecessor twice, so inlining would double the plan per
            # jump (2^jumps blowup) — the SQL mirror of the lazy-lineage
            # trap the Spark side avoids by contracting on the driver.
            ctes.append(
                f"""p{r}_{j} AS MATERIALIZED (SELECT x.comp, y.p
                   FROM p{r}_{j - 1} x JOIN p{r}_{j - 1} y ON x.p = y.comp)"""
            )
        ctes.append(
            f"""c{r} AS MATERIALIZED (
               SELECT n.cell, p.p AS comp
               FROM {prev} n JOIN p{r}_{jumps} p ON n.comp = p.comp)"""
        )
        pick_unions.append(f"SELECT ch.w, ch.a, ch.b FROM ch{r}")
    chain = ",\n        ".join(ctes)
    picks = "\n               UNION\n               ".join(pick_unions)
    if final == "components":
        return f"""
        WITH {chain}
        SELECT cell, comp FROM c{rounds}
        ORDER BY cell
    """
    return f"""
        WITH {chain}
        SELECT a AS cell_a, b AS cell_b, CAST(w AS BIGINT) AS w
        FROM ({picks})
        ORDER BY w, cell_a, cell_b
    """
