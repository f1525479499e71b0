"""Borůvka MST / components invariants vs a pure-Python Kruskal reference.

The distributed rounds must produce EXACTLY the unique MST under the
(w, a, b) total order — verified against union-find Kruskal on the same
edge list, including the adversarial long-chain case where a naive
min-label merge would need O(diameter) rounds (Borůvka's hook+contract
finishes in O(log n))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _kruskal(edges):
    """Reference MST under (w, a, b) lexicographic order; returns
    (mst_edge_set, component_map)."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for w, a, b in sorted(edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            mst.add((a, b, w))
    comps = {}
    for _, a, b in edges:
        comps[a] = find(a)
        comps[b] = find(b)
    return mst, comps


def _spark_edges(spark, triples):
    return spark.createDataFrame(
        [(a, b, w) for w, a, b in triples], "a long, b long, w long"
    )


def test_boruvka_matches_kruskal_random_graph(spark):
    from raptor_service_spark.operators.mst import boruvka_mst

    # deterministic pseudo-random sparse graph on 40 nodes
    edges = set()
    x = 7
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = x % 40
        b = (x // 40) % 40
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        w = (x // 1600) % 17
        edges.add((w, a, b))
    edges = sorted(edges)
    ref_mst, _ = _kruskal(edges)
    got = {
        (r["cell_a"], r["cell_b"], r["w"])
        for r in boruvka_mst(_spark_edges(spark, edges), rounds=7).collect()
    }
    assert got == ref_mst


def test_boruvka_long_chain_converges_in_log_rounds(spark):
    """1000-link path graph: naive min-label propagation needs ~1000
    rounds; Borůvka must finish the merge inside 10 (2^10 ≥ n)."""
    from raptor_service_spark.operators.mst import boruvka_mst

    n = 1001
    edges = [(i % 5, i, i + 1) for i in range(n - 1)]
    got = boruvka_mst(_spark_edges(spark, edges), rounds=10).collect()
    assert len(got) == n - 1  # a tree spanning the whole path


def test_graph_components_match_union_find(spark):
    from raptor_service_spark.operators.mst import graph_components

    edges = [(0, 1, 2), (0, 2, 3), (0, 10, 11), (1, 11, 12), (0, 20, 21)]
    _, ref = _kruskal(edges)
    comp = graph_components(_spark_edges(spark, edges), rounds=6)
    got = {r["cell"]: r["comp"] for r in comp.collect()}
    # same partition: two nodes share a reference root iff they share ours
    nodes = sorted(got)
    for i in nodes:
        for j in nodes:
            assert (got[i] == got[j]) == (ref[i] == ref[j]), (i, j)


def test_graph_components_isolated_singletons(spark):
    from raptor_service_spark.operators.mst import graph_components

    edges = _spark_edges(spark, [(1, 1, 2)])
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "cell long")
    got = {r["cell"]: r["comp"] for r in graph_components(
        edges, rounds=4, nodes=nodes
    ).collect()}
    assert got[99] == 99 and got[1] == got[2]


def test_mst_weight_is_minimal_vs_exhaustive(spark):
    """Tiny graph: MST total weight equals the brute-force minimum over
    all spanning trees (itertools over the 4-node complete graph)."""
    import itertools

    from raptor_service_spark.operators.mst import boruvka_mst

    edges = [(5, 0, 1), (3, 0, 2), (9, 0, 3), (2, 1, 2), (7, 1, 3), (4, 2, 3)]
    got = boruvka_mst(_spark_edges(spark, edges), rounds=4).collect()
    got_w = sum(r["w"] for r in got)
    best = None
    for combo in itertools.combinations(edges, 3):
        _, comps = _kruskal(list(combo))
        roots = {comps.get(v, v) for v in (0, 1, 2, 3)}
        if len(roots) == 1:
            tw = sum(w for w, _, _ in combo)
            best = tw if best is None else min(best, tw)
    assert got_w == best
