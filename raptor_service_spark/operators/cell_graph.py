"""Graph algorithms over the occupied-cell lattice: BFS hop distance
(isochrone rings) and PageRank over the OD cell-transition graph.

The reference's tree traversal walks parent/child edges level by level
(services/retrieval/retrieval_service.py traversal mode; repositories/
node_repo_pg.py children/parent lookups); the grid analogs of "walk the
graph outward from a seed" and "rank nodes by incoming flow" are BFS hop
labeling over cell adjacency and PageRank over the origin-destination
transition graph. Both are ITERATIVE DataFrame loops — the pattern that
cannot be one SQL statement — with per-round ``localCheckpoint`` lineage
cuts (same convention as dedup_components).

Scale shape at 100 TB:

  * point rows are touched exactly once, by the occupancy / OD-flow
    aggregation that builds the node/edge tables (map-side combinable);
  * every BFS/PageRank round is ONE shuffled join + ONE agg over the
    O(occupied cells) table — never the points;
  * the frontier/rank tables are O(cells); nothing is collected to the
    driver except the loop-termination count (a scalar).

Cross-engine parity: BFS is integer arithmetic end to end (exact); PageRank
rounds each iteration's rank vector to 9 dp in BOTH engines, so the engines
iterate from identical inputs and float-sum-order noise (~1e-16) cannot
accumulate; the final output rounds to 6 dp. The DuckDB oracle runs BFS as a
recursive CTE and PageRank as the same iterations unrolled into a CTE chain.

Dangling nodes (no outgoing flow) intentionally leak their mass — the
"simple PageRank" variant — so the formula stays one join + one agg per
round in both engines; ranks still order nodes by incoming flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raptor_service_spark.operators.neighborhood import (
    _offsets,
    kring_neighbor_col,
    kring_neighbor_sql,
)

_RING = [(dx, dy) for dx, dy in _offsets(1) if (dx, dy) != (0, 0)]


def _adjacency(occ: DataFrame, res: int) -> DataFrame:
    """Directed (src, dst) edges between OCCUPIED 8-neighbors."""
    nbrs = F.filter(
        F.array(*[kring_neighbor_col("cell", res, dx, dy) for dx, dy in _RING]),
        lambda c: c.isNotNull(),
    )
    cand = occ.select(F.col("cell").alias("src"), F.explode(nbrs).alias("dst"))
    return cand.join(occ.select(F.col("cell").alias("dst")), "dst")


def bfs_hops(
    occ: DataFrame,
    seed_cell: int,
    res: int,
    max_hops: int = 6,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Hop distance from ``seed_cell`` over occupied-cell 8-adjacency.

    ``occ`` must hold one row per occupied cell (column ``cell``). Returns
    (cell, hops) for every cell within ``max_hops`` of the seed (seed
    included at 0; empty if the seed cell is not occupied). Each round is
    one equi-join frontier expansion + one anti-join against the visited
    set — O(frontier * 8) rows, never the full graph.

    ``edges`` (optional): a precomputed, materialized ``_adjacency(occ,
    res)`` over an ALREADY-DISTINCT ``occ`` — lets multi-seed callers
    (diameter probes) build the lattice once and share it across BFS runs
    instead of re-deriving it per seed.
    """
    if edges is None:
        occ = occ.select("cell").distinct().localCheckpoint(eager=True)
        edges = _adjacency(occ, res).localCheckpoint(eager=True)
    visited = (
        occ.filter(F.col("cell") == F.lit(seed_cell))
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for d in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.cell == edges.src)
            .select(F.col("dst").alias("cell"))
            .distinct()
            .join(visited, "cell", "left_anti")
            .withColumn("hops", F.lit(d).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bfs_hops_sql(
    base_cells_sql: str,
    seed_cell: int,
    res: int,
    max_hops: int = 6,
) -> str:
    """DuckDB recursive-CTE twin of bfs_hops.

    ``base_cells_sql`` must yield one column ``cell`` (duplicates fine).
    """
    nbr = kring_neighbor_sql("o.cell", res, "v.dx", "v.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH RECURSIVE occ AS (
            SELECT DISTINCT cell FROM ({base_cells_sql})
        ),
        e AS (
            SELECT o.cell AS src, {nbr} AS dst
            FROM occ o CROSS JOIN (VALUES {offs}) v(dx, dy)
            WHERE {nbr} IS NOT NULL
              AND {nbr} IN (SELECT cell FROM occ)
        ),
        r(cell, hops) AS (
            SELECT cell, 0 FROM occ WHERE cell = {seed_cell}
            UNION
            SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.cell
            WHERE r.hops < {max_hops}
        )
        SELECT cell, CAST(MIN(hops) AS BIGINT) AS hops FROM r GROUP BY 1
    """


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Weighted PageRank over a directed edge list, fixed iteration count.

    pr_{t+1}(v) = (1-d)/N + d * sum_{u->v} pr_t(u) * w(u,v) / outw(u),
    pr_0 = 1/N, each iteration rounded to 9 dp (cross-engine determinism);
    output (cell, pr) with pr rounded to 6 dp. Every round is one join of
    the O(nodes) rank table into the edge list + one partial+final agg; AQE
    broadcasts the rank side while it fits and shuffles on src/dst (the
    co-partition a bucketed edge table preserves) when it does not.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(w).alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("cell"))
        .unionByName(e.select(F.col("dst").alias("cell")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("share"))
        .localCheckpoint(eager=True)
    )
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(n_iters):
        contrib = (
            ew.join(pr.withColumnRenamed("cell", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("share")).alias("inflow"))
        )
        pr = (
            nodes.join(contrib, nodes.cell == contrib.dst, "left")
            .select(
                "cell",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)), 9
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("cell", F.round("pr", 6).alias("pr"))


def pagerank_sql(
    edges_sql: str,
    n_iters: int = 5,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of pagerank: the same iterations unrolled as a CTE chain.

    ``edges_sql`` must yield (src, dst, w).
    """
    d = f"CAST({damping!r} AS DOUBLE)"
    steps = []
    for t in range(1, n_iters + 1):
        steps.append(
            f"""p{t} AS (
            SELECT n.cell,
                   ROUND((1.0 - {d}) / s.n + {d} * COALESCE(i.inflow, 0.0), 9) AS pr
            FROM nodes n CROSS JOIN sz s
            LEFT JOIN (
                SELECT ew.dst, SUM(p.pr * ew.share) AS inflow
                FROM ew JOIN p{t - 1} p ON ew.src = p.cell
                GROUP BY ew.dst
            ) i ON n.cell = i.dst
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH e AS ({edges_sql}),
        nodes AS (SELECT DISTINCT src AS cell FROM e
                  UNION SELECT DISTINCT dst FROM e),
        sz AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        ow AS (SELECT src, SUM(w) AS outw FROM e GROUP BY 1),
        ew AS (SELECT e.src, e.dst, e.w / ow.outw AS share
               FROM e JOIN ow USING (src)),
        p0 AS (SELECT n.cell, 1.0 / s.n AS pr FROM nodes n CROSS JOIN sz s),
        {chain}
        SELECT cell, ROUND(pr, 6) AS pr FROM p{n_iters}
    """


def hits(
    edges: DataFrame,
    n_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg 1999) hub/authority scores over a directed edge
    list, fixed iteration count: a_t(v) = Σ_{u→v} h_{t-1}(u), h_t(u) =
    Σ_{u→v} a_t(v), each vector max-normalized and rounded to 9 dp per
    step (the pagerank cross-engine discipline; max-norm instead of L2
    keeps the oracle arithmetic a plain MAX). Output (cell, auth, hub),
    6 dp. Every round is two joins of the O(nodes) score table into the
    edge list + partial+final aggs; each max() is an O(1) broadcast
    scalar."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("cell"))
        .unionByName(e.select(F.col("dst").alias("cell")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.withColumn("h", F.lit(1.0))
    auth = None
    for _ in range(n_iters):
        raw_a = (
            e.join(hub.withColumnRenamed("cell", "src"), "src")
            .groupBy("dst")
            .agg(F.round(F.sum("h"), 9).alias("ar"))
        )
        amax = raw_a.agg(F.max("ar").alias("m"))
        auth = (
            nodes.join(raw_a, nodes.cell == raw_a.dst, "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "cell",
                F.round(F.coalesce("ar", F.lit(0.0)) / F.col("m"), 9).alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        raw_h = (
            e.join(auth.withColumnRenamed("cell", "dst"), "dst")
            .groupBy("src")
            .agg(F.round(F.sum("a"), 9).alias("hr"))
        )
        hmax = raw_h.agg(F.max("hr").alias("m"))
        hub = (
            nodes.join(raw_h, nodes.cell == raw_h.src, "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "cell",
                F.round(F.coalesce("hr", F.lit(0.0)) / F.col("m"), 9).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return auth.join(hub, "cell").select(
        "cell", F.round("a", 6).alias("auth"), F.round("h", 6).alias("hub")
    )


def hits_sql(edges_sql: str, n_iters: int = 3) -> str:
    """DuckDB twin of hits: identical unrolled iterations.

    ``edges_sql`` must yield (src, dst) rows (deduplicated here).
    """
    steps = []
    for t in range(1, n_iters + 1):
        steps.append(
            f"""ar{t} AS (
            SELECT e.dst, ROUND(SUM(p.h), 9) AS ar
            FROM e JOIN h{t - 1} p ON e.src = p.cell GROUP BY 1),
        a{t} AS (
            SELECT n.cell,
                   ROUND(COALESCE(r.ar, 0.0) / (SELECT MAX(ar) FROM ar{t}),
                         9) AS a
            FROM nodes n LEFT JOIN ar{t} r ON n.cell = r.dst),
        hr{t} AS (
            SELECT e.src, ROUND(SUM(p.a), 9) AS hr
            FROM e JOIN a{t} p ON e.dst = p.cell GROUP BY 1),
        h{t} AS (
            SELECT n.cell,
                   ROUND(COALESCE(r.hr, 0.0) / (SELECT MAX(hr) FROM hr{t}),
                         9) AS h
            FROM nodes n LEFT JOIN hr{t} r ON n.cell = r.src)"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
        nodes AS (SELECT DISTINCT src AS cell FROM e
                  UNION SELECT DISTINCT dst FROM e),
        h0 AS (SELECT cell, 1.0 AS h FROM nodes),
        {chain}
        SELECT n.cell, ROUND(a.a, 6) AS auth, ROUND(h.h, 6) AS hub
        FROM nodes n
        JOIN a{n_iters} a ON n.cell = a.cell
        JOIN h{n_iters} h ON n.cell = h.cell
    """


def sssp(
    occ_w: DataFrame,
    seed_cell: int,
    res: int,
    n_rounds: int = 8,
) -> DataFrame:
    """Weighted single-source shortest path (Bellman-Ford, fixed rounds)
    over the occupied-cell 8-adjacency — BFS's weighted sibling: entering
    cell v costs ``w(v)`` (an INTEGER congestion cost, so distances are
    exact in both engines; no float rounding protocol needed).

    ``occ_w``: one row per occupied cell, columns (cell, w). Returns
    (cell, dist) for every cell whose shortest path from the seed uses at
    most ``n_rounds`` edges (seed at 0). Each round relaxes every edge
    once: one join of the O(reached cells) dist table into the edge list +
    one min-agg — the textbook distributed Bellman-Ford; rounds are fixed
    (not converged) so the unrolled-CTE oracle iterates identically.
    """
    occ = occ_w.select("cell", "w").localCheckpoint(eager=True)
    ew = (
        _adjacency(occ.select("cell"), res)
        .join(
            occ.select(F.col("cell").alias("dst"), F.col("w").alias("wd")),
            "dst",
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        occ.filter(F.col("cell") == F.lit(seed_cell))
        .select("cell", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_rounds):
        relax = (
            dist.join(ew, dist.cell == ew.src)
            .select(F.col("dst").alias("cell"), (F.col("dist") + F.col("wd")).alias("dist"))
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("cell")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def sssp_sql(
    base_sql: str,
    seed_cell: int,
    res: int,
    n_rounds: int = 8,
) -> str:
    """DuckDB twin of sssp: the same relaxation rounds unrolled as a CTE
    chain. ``base_sql`` must yield (cell, w) — one row per occupied cell.
    """
    nbr = kring_neighbor_sql("o.cell", res, "v.dx", "v.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    steps = []
    for t in range(1, n_rounds + 1):
        steps.append(
            f"""d{t} AS (
            SELECT cell, MIN(dist) AS dist FROM (
                SELECT cell, dist FROM d{t - 1}
                UNION ALL
                SELECT e.dst AS cell, d.dist + e.wd AS dist
                FROM d{t - 1} d JOIN ew e ON e.src = d.cell
            ) GROUP BY 1
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH occ AS (SELECT cell, w FROM ({base_sql})),
        e AS (
            SELECT o.cell AS src, {nbr} AS dst
            FROM occ o CROSS JOIN (VALUES {offs}) v(dx, dy)
            WHERE {nbr} IS NOT NULL
              AND {nbr} IN (SELECT cell FROM occ)
        ),
        ew AS (SELECT e.src, e.dst, o.w AS wd FROM e JOIN occ o ON o.cell = e.dst),
        d0 AS (SELECT cell, CAST(0 AS BIGINT) AS dist FROM occ
               WHERE cell = {seed_cell}),
        {chain}
        SELECT cell, dist FROM d{n_rounds}
    """


# ---------------------------------------------------------------------------
# k-core decomposition — iterative degree peeling
# ---------------------------------------------------------------------------


def kcore(occ: DataFrame, res: int, k: int = 3, max_rounds: int = 8) -> DataFrame:
    """k-core subgraph of the occupied-cell 8-adjacency lattice.

    Classic peeling: repeatedly drop vertices whose degree in the SURVIVING
    subgraph is < k, until fixpoint (or ``max_rounds``). Returns
    (cell, deg) where deg is the vertex's degree INSIDE the k-core — the
    dense-region skeleton the sparse fringe peels away from (the grid
    analog of keeping only well-supported tree nodes,
    services/core/build_tree_service.py min-cluster checks).

    Scale shape: points touched once (occupancy agg upstream of ``occ``);
    every round is one degree agg + two semi-joins over the O(edges)
    table with a ``localCheckpoint`` lineage cut; the only driver value is
    the edge-count convergence scalar. The oracle unrolls ``max_rounds``
    peel steps as a CTE chain — peeling is monotone, so once Spark reaches
    the fixpoint early the extra unrolled rounds are no-ops and the two
    engines agree exactly (all-integer arithmetic).
    """
    occ = occ.select("cell").distinct().localCheckpoint(eager=True)
    edges = _adjacency(occ, res).localCheckpoint(eager=True)
    n_edges = edges.count()
    for _ in range(max_rounds):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        edges = (
            edges.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .localCheckpoint(eager=True)
        )
        n_now = edges.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    return (
        edges.groupBy(F.col("src").alias("cell"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy("cell")
    )


def kcore_sql(
    base_cells_sql: str, res: int, k: int = 3, max_rounds: int = 8
) -> str:
    """DuckDB twin of kcore: the identical peel unrolled max_rounds times."""
    nbr = kring_neighbor_sql("o.cell", res, "v.dx", "v.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    steps = []
    prev = "e0"
    for r in range(1, max_rounds + 1):
        steps.append(
            f"v{r} AS MATERIALIZED (SELECT src FROM {prev} GROUP BY src "
            f"HAVING COUNT(*) >= {k}),\n"
            f"        e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e "
            f"JOIN v{r} a ON e.src = a.src "
            f"JOIN v{r} b ON e.dst = b.src)"
        )
        prev = f"e{r}"
    chain = ",\n        ".join(steps)
    return f"""
        WITH occ AS (SELECT DISTINCT cell FROM ({base_cells_sql})),
        e0 AS MATERIALIZED (
            SELECT o.cell AS src, {nbr} AS dst
            FROM occ o CROSS JOIN (VALUES {offs}) v(dx, dy)
            WHERE {nbr} IS NOT NULL
              AND {nbr} IN (SELECT cell FROM occ)
        ),
        {chain}
        SELECT src AS cell, COUNT(*) AS deg FROM {prev} GROUP BY 1
    """


def ppr(
    edges: DataFrame,
    seed: int,
    n_iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank: the teleport mass lands entirely on ``seed``
    instead of spreading uniformly — "what is reachable FROM here",
    the query-biased variant retrieval and recommendation stacks use
    (random-walk-with-restart). pr_0 = 1{v=seed};
    pr_{t+1}(v) = (1-d)·1{v=seed} + d·Σ_{u→v} pr_t(u)·w(u,v)/outw(u),
    per-round 9-dp rounding (the pagerank cross-engine discipline).
    Dangling mass is dropped, as in pagerank. Edge input: (src, dst, w).
    Scale: identical to pagerank — one O(nodes) join per round into the
    edge list + partial+final agg."""
    e = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("cell"))
        .unionByName(e.select(F.col("dst").alias("cell")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("share"))
        .localCheckpoint(eager=True)
    )
    is_seed = F.when(F.col("cell") == seed, F.lit(1.0)).otherwise(F.lit(0.0))
    pr = nodes.withColumn("pr", is_seed)
    for _ in range(n_iters):
        contrib = (
            ew.join(pr.withColumnRenamed("cell", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("share")).alias("inflow"))
        )
        pr = (
            nodes.join(contrib, nodes.cell == contrib.dst, "left")
            .select(
                "cell",
                F.round(
                    (F.lit(1.0) - F.lit(damping)) * is_seed
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("cell", F.round("pr", 6).alias("pr"))


def ppr_sql(edges_sql: str, seed: int, n_iters: int = 5, damping: float = 0.85) -> str:
    """DuckDB twin of ppr: identical unrolled rounds."""
    d = f"CAST({damping!r} AS DOUBLE)"
    steps = []
    for t in range(1, n_iters + 1):
        steps.append(
            f"""p{t} AS (
            SELECT n.cell,
                   ROUND((1.0 - {d}) * (CASE WHEN n.cell = {seed}
                                             THEN 1.0 ELSE 0.0 END)
                         + {d} * COALESCE(i.inflow, 0.0), 9) AS pr
            FROM nodes n
            LEFT JOIN (
                SELECT ew.dst, SUM(p.pr * ew.share) AS inflow
                FROM ew JOIN p{t - 1} p ON ew.src = p.cell
                GROUP BY ew.dst
            ) i ON n.cell = i.dst
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH e AS ({edges_sql}),
        nodes AS (SELECT DISTINCT src AS cell FROM e
                  UNION SELECT DISTINCT dst FROM e),
        ow AS (SELECT src, SUM(w) AS outw FROM e GROUP BY 1),
        ew AS (SELECT e.src, e.dst, e.w / ow.outw AS share
               FROM e JOIN ow USING (src)),
        p0 AS (SELECT cell, CASE WHEN cell = {seed} THEN 1.0 ELSE 0.0 END AS pr
               FROM nodes),
        {chain}
        SELECT cell, ROUND(pr, 6) AS pr FROM p{n_iters}
    """


def lpa(
    edges: DataFrame,
    n_iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007, deterministic
    variant): labels start as node ids; each round every node adopts the
    label MOST FREQUENT among its neighbors, ties broken toward the
    SMALLEST label (the determinism knob — classic LPA breaks ties
    randomly, which can never be oracle-checked). Undirected: both edge
    orientations feed each node's neighborhood. Fixed ``n_iters`` rounds
    (no convergence test — cross-engine round count must match). Output
    (cell, label, n_members). Each round is one join of the O(nodes)
    label table into the edge list + a count agg + an argmax window over
    (node, label) counts — all node/edge bounded."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    nbr = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = nbr.select(F.col("a").alias("cell")).distinct().localCheckpoint(eager=True)
    lab = nodes.withColumn("label", F.col("cell"))
    w_arg = Window.partitionBy("a").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(n_iters):
        votes = (
            nbr.join(lab.withColumnRenamed("cell", "b"), "b")
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        lab = (
            votes.withColumn("rn", F.row_number().over(w_arg))
            .filter(F.col("rn") == 1)
            .select(F.col("a").alias("cell"), "label")
            .localCheckpoint(eager=True)
        )
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return lab.join(sizes, "label").select("cell", "label", "n_members")


def lpa_sql(edges_sql: str, n_iters: int = 4) -> str:
    """DuckDB twin of lpa: identical unrolled rounds (same argmax order)."""
    steps = []
    for t in range(1, n_iters + 1):
        steps.append(
            f"""v{t} AS (
            SELECT nbr.a, l.label, COUNT(*) AS cnt
            FROM nbr JOIN l{t - 1} l ON nbr.b = l.cell
            GROUP BY 1, 2
        ),
        l{t} AS (
            SELECT a AS cell, label FROM (
                SELECT a, label, ROW_NUMBER() OVER (
                    PARTITION BY a ORDER BY cnt DESC, label ASC) AS rn
                FROM v{t})
            WHERE rn = 1
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH e0 AS ({edges_sql}),
        e AS (SELECT DISTINCT a, b FROM (SELECT src AS a, dst AS b FROM e0
                                         UNION ALL SELECT dst, src FROM e0)),
        nbr AS (SELECT a, b FROM e),
        nodes AS (SELECT DISTINCT a AS cell FROM nbr),
        l0 AS (SELECT cell, cell AS label FROM nodes),
        {chain}
        SELECT l.cell, l.label, s.n_members
        FROM l{n_iters} l
        JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
              FROM l{n_iters} GROUP BY 1) s USING (label)
    """


def brandes_bounded(
    occ: DataFrame,
    seed_cell: int,
    res: int,
    max_hops: int = 4,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Single-source dependency accumulation of Brandes (2001) betweenness,
    horizon-bounded at ``max_hops`` — returns (cell, delta) for every cell
    reached at hops 1..H from the seed (delta = the seed's betweenness
    contribution to that cell). Sum over sampled seeds = the standard
    sampled betweenness estimator.

    Forward: level-synchronous BFS carrying sigma (shortest-path COUNTS,
    exact integers) — one frontier equi-join + anti-join per hop.
    Backward: delta(v) = sum over hop+1 successors w of
    sigma_v/sigma_w * (1 + delta_w), one 3-table join per hop, 9-dp
    rounds (the unrolled-CTE oracle replays identical arithmetic).
    ``edges``: optional prebuilt ``_adjacency`` over distinct ``occ``
    (the multi-seed sharing convention of bfs_hops)."""
    if edges is None:
        occ = occ.select("cell").distinct().localCheckpoint(eager=True)
        edges = _adjacency(occ, res).localCheckpoint(eager=True)
    f0 = (
        occ.filter(F.col("cell") == F.lit(seed_cell))
        .withColumn("sigma", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontiers = [f0]
    visited = f0.select("cell")
    for _ in range(max_hops):
        cand = frontiers[-1].join(
            edges, frontiers[-1].cell == edges.src
        ).select(F.col("dst").alias("cell"), "sigma")
        nf = (
            cand.join(visited, "cell", "left_anti")
            .groupBy("cell")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        frontiers.append(nf)
        visited = visited.unionByName(nf.select("cell")).localCheckpoint(eager=True)
    delta = frontiers[max_hops].withColumn("delta", F.lit(0.0).cast("double"))
    outs = [delta.select("cell", "delta")]
    for h in range(max_hops - 1, 0, -1):
        u = frontiers[h]
        succ = delta.select(
            F.col("cell").alias("wcell"),
            F.col("sigma").alias("wsigma"),
            F.col("delta").alias("wdelta"),
        )
        contrib = (
            u.join(edges, u.cell == edges.src)
            .join(succ, F.col("dst") == F.col("wcell"))
            .select(
                u.cell.alias("ucell"),
                F.round(
                    F.col("sigma").cast("double") / F.col("wsigma").cast("double")
                    * (F.lit(1.0) + F.col("wdelta")),
                    9,
                ).alias("term"),
            )
            .groupBy("ucell")
            .agg(F.round(F.sum("term"), 9).alias("dsum"))
        )
        delta = (
            u.join(contrib, u.cell == contrib.ucell, "left")
            .select(
                "cell",
                "sigma",
                F.round(F.coalesce("dsum", F.lit(0.0)), 9).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        outs.append(delta.select("cell", "delta"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.localCheckpoint(eager=True)


def ktruss(occ: DataFrame, res: int, k: int = 4, max_rounds: int = 4) -> DataFrame:
    """k-truss subgraph of the occupied-cell 8-adjacency lattice.

    Edge-peeling (Cohen 2008): repeatedly drop EDGES whose support —
    triangles through the edge in the SURVIVING subgraph — is < k-2,
    until fixpoint (or ``max_rounds``). The k-truss is strictly stronger
    cohesion than the k-core's degree rule (every kept edge is embedded
    in k-2 triangles), the community-skeleton extractor. Returns
    (cell, deg) = incident truss-edge count per surviving vertex.

    Scale shape: per round ONE triangle enumeration (two self-equi-joins
    of the O(edges) list — degree-bounded at 8 on the lattice, so
    O(edges·deg) rows) + one count filter, with a localCheckpoint lineage
    cut; the only driver value is the convergence scalar. Peeling is
    monotone, so the oracle's fixed unroll agrees with Spark's early
    convergence exactly (all-integer arithmetic, the kcore protocol).
    """
    occ = occ.select("cell").distinct().localCheckpoint(eager=True)
    edges = _adjacency(occ, res).localCheckpoint(eager=True)
    n_edges = edges.count()
    for _ in range(max_rounds):
        e1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        e2 = edges.select(F.col("src").alias("u2"), F.col("dst").alias("w"))
        e3 = edges.select(F.col("src").alias("v3"), F.col("dst").alias("w3"))
        sup = (
            e1.join(e2, (F.col("u") == F.col("u2")) & (F.col("w") != F.col("v")))
            .join(e3, (F.col("v3") == F.col("v")) & (F.col("w3") == F.col("w")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        edges = (
            sup.filter(F.col("sup") >= k - 2)
            .select(F.col("u").alias("src"), F.col("v").alias("dst"))
            .localCheckpoint(eager=True)
        )
        n_now = edges.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    return (
        edges.groupBy(F.col("src").alias("cell"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy("cell")
    )


def ktruss_sql(
    base_cells_sql: str, res: int, k: int = 4, max_rounds: int = 4
) -> str:
    """DuckDB twin of ktruss: the identical edge peel unrolled."""
    nbr = kring_neighbor_sql("o.cell", res, "v.dx", "v.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    steps = []
    prev = "e0"
    for r in range(1, max_rounds + 1):
        steps.append(
            f"""s{r} AS (
            SELECT e1.src, e1.dst, COUNT(*) AS sup
            FROM {prev} e1
            JOIN {prev} e2 ON e2.src = e1.src AND e2.dst != e1.dst
            JOIN {prev} e3 ON e3.src = e1.dst AND e3.dst = e2.dst
            GROUP BY 1, 2),
        e{r} AS MATERIALIZED (
            SELECT src, dst FROM s{r} WHERE sup >= {k - 2})"""
        )
        prev = f"e{r}"
    chain = ",\n        ".join(steps)
    return f"""
        WITH occ AS (SELECT DISTINCT cell FROM ({base_cells_sql})),
        e0 AS MATERIALIZED (
            SELECT o.cell AS src, {nbr} AS dst
            FROM occ o CROSS JOIN (VALUES {offs}) v(dx, dy)
            WHERE {nbr} IS NOT NULL
              AND {nbr} IN (SELECT cell FROM occ)
        ),
        {chain}
        SELECT src AS cell, COUNT(*) AS deg FROM {prev}
        GROUP BY 1 ORDER BY 1
    """


def katz(
    edges: DataFrame,
    n_iters: int = 4,
    alpha: float = 0.05,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Katz centrality over a directed edge list, fixed iteration count.

    x_{t+1}(v) = 1 + alpha * sum_{u->v} x_t(u)  with x_0 = 1 — the
    truncated Katz series sum_{k<=t} alpha^k paths_k(v) (Katz 1953),
    the walk-counting complement to `pagerank` (no out-degree
    normalization: prolific hubs inflate their targets instead of
    diluting). Adjacency is UNWEIGHTED distinct edges and alpha is
    fixed well under 1/lambda_max for the truncation to be the story,
    not divergence. Each round rounds to 9 dp (the pagerank
    cross-engine discipline); output (cell, katz) at 6 dp.

    Scale shape: identical to `pagerank` — every round is one join of
    the O(nodes) score table into the edge list + one partial+final
    agg; AQE broadcasts the score side while it fits.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("cell"))
        .unionByName(e.select(F.col("dst").alias("cell")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    x = nodes.withColumn("x", F.lit(1.0))
    for _ in range(n_iters):
        inflow = (
            e.join(x.withColumnRenamed("cell", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("x").alias("inflow"))
        )
        x = (
            nodes.join(inflow, nodes.cell == inflow.dst, "left")
            .select(
                "cell",
                F.round(
                    F.lit(1.0) + F.lit(alpha) * F.coalesce("inflow", F.lit(0.0)), 9
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return x.select("cell", F.round("x", 6).alias("katz"))


def katz_sql(edges_sql: str, n_iters: int = 4, alpha: float = 0.05) -> str:
    """DuckDB twin of katz: the same iterations unrolled as a CTE chain.

    ``edges_sql`` must yield (src, dst); edges are de-duplicated here.
    """
    a = f"CAST({alpha!r} AS DOUBLE)"
    steps = []
    for t in range(1, n_iters + 1):
        steps.append(
            f"""x{t} AS (
            SELECT n.cell,
                   ROUND(1.0 + {a} * COALESCE(i.inflow, 0.0), 9) AS x
            FROM nodes n
            LEFT JOIN (
                SELECT e.dst, SUM(p.x) AS inflow
                FROM e JOIN x{t - 1} p ON e.src = p.cell
                GROUP BY e.dst
            ) i ON n.cell = i.dst
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
        nodes AS (SELECT DISTINCT src AS cell FROM e
                  UNION SELECT DISTINCT dst FROM e),
        x0 AS (SELECT cell, 1.0 AS x FROM nodes),
        {chain}
        SELECT cell, ROUND(x, 6) AS katz FROM x{n_iters}
    """
