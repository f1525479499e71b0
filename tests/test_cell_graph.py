"""BFS hop distance and PageRank (operators/cell_graph.py) vs pure-Python
references on random graphs."""
from __future__ import annotations

from collections import deque

import numpy as np

from raptor_service_spark.geo.grid import RES_MULTIPLIER
from raptor_service_spark.operators.cell_graph import bfs_hops, pagerank

RES = 5
N = 2**RES
BASE = RES * RES_MULTIPLIER


def _occ_cells(seed=3, frac=0.45):
    rng = np.random.default_rng(seed)
    mask = rng.random((N, N)) < frac
    return {int(BASE + y * N + x) for y in range(N) for x in range(N) if mask[y, x]}


def _nbrs(cell):
    rem = cell - BASE
    y, x = rem // N, rem % N
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dx, dy) == (0, 0):
                continue
            yy = y + dy
            if 0 <= yy < N:
                yield BASE + yy * N + ((x + dx) % N + N) % N


def _py_bfs(occ, seed_cell, max_hops):
    if seed_cell not in occ:
        return {}
    dist = {seed_cell: 0}
    q = deque([seed_cell])
    while q:
        c = q.popleft()
        if dist[c] >= max_hops:
            continue
        for nb in _nbrs(c):
            if nb in occ and nb not in dist:
                dist[nb] = dist[c] + 1
                q.append(nb)
    return dist


def test_bfs_matches_python_bfs(spark):
    occ = _occ_cells()
    seed_cell = min(occ)
    df = spark.createDataFrame([(c,) for c in occ], "cell long")
    got = {r["cell"]: r["hops"] for r in bfs_hops(df, seed_cell, RES, 4).collect()}
    want = _py_bfs(occ, seed_cell, 4)
    assert got == want
    assert got[seed_cell] == 0 and max(got.values()) <= 4
    assert len(got) > 1  # the seed's component actually expanded


def test_bfs_unoccupied_seed_is_empty(spark):
    occ = _occ_cells()
    dead = next(c for c in range(BASE, BASE + N * N) if c not in occ)
    df = spark.createDataFrame([(c,) for c in occ], "cell long")
    assert bfs_hops(df, dead, RES, 3).count() == 0


def test_pagerank_matches_numpy(spark):
    rng = np.random.default_rng(9)
    n_nodes = 40
    edges = []
    for _ in range(160):
        s, d = rng.integers(0, n_nodes, 2)
        if s != d:
            edges.append((int(s), int(d), float(rng.integers(1, 6))))
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r["cell"]: r["pr"] for r in pagerank(df, n_iters=5, damping=0.85).collect()}

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, _, w in edges:
        outw[idx[s]] += w
    pr = np.full(n, 1.0 / n)
    for _ in range(5):
        inflow = np.zeros(n)
        for s, d, w in edges:
            inflow[idx[d]] += pr[idx[s]] * (w / outw[idx[s]])
        pr = np.round(0.15 / n + 0.85 * inflow, 9)
    want = {v: round(float(pr[idx[v]]), 6) for v in nodes}
    assert got == want
    # total rank stays <= 1 (dangling leak) and ranks discriminate
    assert sum(got.values()) <= 1.0 + 1e-6
    assert len(set(got.values())) > 5


# ---------------------------------------------------------------------------
# triangle enumeration (q_od_triangles kernel): a<b<c finds each exactly once
# ---------------------------------------------------------------------------


def test_triangle_enumeration_counts(spark):
    from pyspark.sql import functions as F

    # K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant 4-5
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "a long, b long",
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    rows = tri.collect()
    assert len(rows) == 4  # C(4,3) triangles in K4, each exactly once
    for r in rows:
        assert r["x"] < r["y"] < r["z"]
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("n"))
        .groupBy("n")
        .count()
        .collect()
    )
    got = {r["n"]: r["count"] for r in per_node}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # node 5 in none


def _py_bf(occ_w, seed_cell, n_rounds):
    """Round-limited Bellman-Ford reference: dist_t(v) = min over paths
    from the seed using at most t edges, edge cost = w(dst)."""
    if seed_cell not in occ_w:
        return {}
    dist = {seed_cell: 0}
    for _ in range(n_rounds):
        nxt = dict(dist)
        for u, du in dist.items():
            for v in _nbrs(u):
                if v in occ_w:
                    nd = du + occ_w[v]
                    if nd < nxt.get(v, float("inf")):
                        nxt[v] = nd
        dist = nxt
    return dist


def test_sssp_matches_python_bellman_ford(spark):
    from raptor_service_spark.operators.cell_graph import sssp

    occ = _occ_cells(seed=9, frac=0.5)
    occ_w = {c: 1 + (c % 7) for c in occ}
    seed_cell = sorted(occ)[len(occ) // 3]
    df = spark.createDataFrame(
        [(c, w) for c, w in occ_w.items()], "cell long, w long"
    )
    got = {r.cell: r.dist for r in sssp(df, seed_cell, RES, n_rounds=5).collect()}
    want = _py_bf(occ_w, seed_cell, 5)
    assert got == want


def test_sssp_unoccupied_seed_empty(spark):
    from raptor_service_spark.operators.cell_graph import sssp

    occ = _occ_cells(seed=9, frac=0.5)
    missing = next(c for c in range(BASE, BASE + N * N) if c not in occ)
    df = spark.createDataFrame(
        [(c, 1) for c in occ], "cell long, w long"
    )
    assert sssp(df, missing, RES, n_rounds=3).count() == 0


def _py_kcore(occ, k, max_rounds):
    surv = set(occ)
    converged = False
    for _ in range(max_rounds):
        keep = {c for c in surv if sum(1 for nb in _nbrs(c) if nb in surv) >= k}
        if keep == surv:
            converged = True
            break
        surv = keep
    return {c: sum(1 for nb in _nbrs(c) if nb in surv) for c in surv}, converged


def test_kcore_bounded_rounds_match_python(spark):
    """Same bounded-round semantics as the oracle unroll (8 peels)."""
    from raptor_service_spark.operators.cell_graph import kcore

    occ = _occ_cells(seed=9, frac=0.4)
    df = spark.createDataFrame([(c,) for c in occ], "cell long")
    got = {r["cell"]: r["deg"] for r in kcore(df, RES, k=3, max_rounds=8).collect()}
    want, _ = _py_kcore(occ, 3, 8)
    assert got == want
    assert 0 < len(got) < len(occ)  # something peeled, something survived


def test_kcore_fixpoint_is_true_core(spark):
    from raptor_service_spark.operators.cell_graph import kcore

    occ = _occ_cells(seed=9, frac=0.4)
    df = spark.createDataFrame([(c,) for c in occ], "cell long")
    got = {r["cell"]: r["deg"] for r in kcore(df, RES, k=3, max_rounds=64).collect()}
    want, converged = _py_kcore(occ, 3, 64)
    assert converged and got == want
    assert all(d >= 3 for d in got.values())  # true k-core at fixpoint


def test_kcore_empty_when_k_exceeds_max_degree(spark):
    from raptor_service_spark.operators.cell_graph import kcore

    occ = _occ_cells(seed=9, frac=0.05)  # sparse: few high-degree vertices
    df = spark.createDataFrame([(c,) for c in occ], "cell long")
    got = kcore(df, RES, k=9, max_rounds=8).count()  # degree <= 8 always
    assert got == 0


def _py_brandes_bounded(occ, seed_cell, max_hops):
    """Pure-Python H-bounded Brandes: returns {cell: delta} for hops 1..H."""
    from decimal import ROUND_HALF_UP, Decimal

    def r9(x):
        return float(Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    if seed_cell not in occ:
        return {}
    hops = {seed_cell: 0}
    sigma = {seed_cell: 1}
    frontier = [seed_cell]
    levels = {0: [seed_cell]}
    for h in range(1, max_hops + 1):
        nxt = {}
        for u in frontier:
            for nb in _nbrs(u):
                if nb in occ and nb not in hops:
                    nxt[nb] = nxt.get(nb, 0) + sigma[u]
        for v, s in nxt.items():
            hops[v] = h
            sigma[v] = s
        levels[h] = sorted(nxt)
        frontier = levels[h]
    delta = {c: 0.0 for c in levels[max_hops]}
    out = dict(delta)
    for h in range(max_hops - 1, 0, -1):
        nd = {}
        for u in levels[h]:
            terms = [
                r9(sigma[u] / sigma[w] * (1.0 + delta[w]))
                for w in _nbrs(u)
                if w in occ and hops.get(w) == h + 1
            ]
            nd[u] = r9(sum(terms)) if terms else 0.0
        delta = nd
        out.update(nd)
    return out


def test_brandes_bounded_matches_python(spark):
    from raptor_service_spark.operators.cell_graph import brandes_bounded

    occ = _occ_cells(seed=7, frac=0.5)
    seed_cell = min(occ)
    df = spark.createDataFrame([(c,) for c in occ], "cell long")
    got = {
        r["cell"]: r["delta"]
        for r in brandes_bounded(df, seed_cell, RES, max_hops=3).collect()
    }
    want = _py_brandes_bounded(occ, seed_cell, 3)
    assert set(got) == set(want)
    for c in want:
        assert abs(got[c] - want[c]) < 1e-9, (c, got[c], want[c])
    # sanity: some interior cell carries positive dependency
    assert any(v > 0 for v in got.values())


def _py_ktruss(occ, k, max_rounds):
    edges = {
        (u, v) for u in occ for v in _nbrs(u) if v in occ
    }
    for _ in range(max_rounds):
        sup = {}
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
        for u, v in edges:
            sup[(u, v)] = len(adj.get(u, set()) & adj.get(v, set()))
        nxt = {e for e in edges if sup[e] >= k - 2}
        if nxt == edges:
            break
        edges = nxt
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    return deg


def test_ktruss_matches_python(spark):
    from raptor_service_spark.operators.cell_graph import ktruss

    occ = _occ_cells(seed=11, frac=0.55)
    df = spark.createDataFrame([(c,) for c in occ], "cell long")
    got = {r["cell"]: r["deg"] for r in ktruss(df, RES, k=4, max_rounds=4).collect()}
    want = _py_ktruss(occ, 4, 4)
    assert got == want
    # the truss is a subgraph of the 3-core (every truss edge needs >= 2
    # triangle partners, forcing degree >= 3)
    assert all(d >= 3 for d in got.values())


def test_katz_matches_numpy(spark):
    from raptor_service_spark.operators.cell_graph import katz

    rng = np.random.default_rng(13)
    n_nodes = 30
    edges = sorted(
        {
            (int(s), int(d))
            for s, d in rng.integers(0, n_nodes, (120, 2))
            if s != d
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["cell"]: r["katz"] for r in katz(df, n_iters=4, alpha=0.05).collect()}

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    def rhu(v, dp):  # Spark ROUND is half-away-from-zero; np.round is half-even
        p = 10.0**dp
        return np.floor(np.abs(v) * p + 0.5) * np.sign(v) / p

    x = np.ones(len(nodes))
    for _ in range(4):
        inflow = np.zeros(len(nodes))
        for s, d in edges:
            inflow[idx[d]] += x[idx[s]]
        x = rhu(1.0 + 0.05 * inflow, 9)
    want = {v: float(rhu(x[idx[v]], 6)) for v in nodes}
    assert got == want
    # every score >= 1 (the constant injection) and in-degree-0 nodes stay at 1
    indeg0 = {v for v in nodes if all(d != v for _, d in edges)}
    assert all(got[v] == 1.0 for v in indeg0)
    assert min(got.values()) >= 1.0
