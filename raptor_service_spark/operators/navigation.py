"""Tree navigation ops (SURVEY §2.9 R7-R9, §2.3 J4-J6).

Reference: /root/reference/repositories/retrieval_repo.py:20-252 (node meta,
children, parent, siblings, path-to-root, texts-by-ids) and the MCP navigation
tools (/root/reference/mcp_local/tools/rag_navigation.py:8-63).

All are 1-2 hop joins on the edges DataFrame; the recursive CTE
(retrieval_repo.py:156-216) becomes a bounded driver loop of self-joins
(depth cap 10 — same cap as the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _e(edges: DataFrame) -> DataFrame:
    """Project to the pure adjacency columns (the stored table also carries a
    bookkeeping ``level`` column that would collide with nodes.level)."""
    return edges.select("parent_id", "child_id")


def node_children(nodes: DataFrame, edges: DataFrame, node_id: str) -> DataFrame:
    """Children of a node, stable (level, node_id) order (retrieval_repo.py:54-116)."""
    edges = _e(edges)
    return (
        edges.filter(F.col("parent_id") == node_id)
        .join(nodes, edges.child_id == nodes.node_id)
        .select("node_id", "level", "kind", "cell", "text")
        .orderBy("level", "node_id")
    )


def node_parent(nodes: DataFrame, edges: DataFrame, node_id: str) -> DataFrame:
    edges = _e(edges)
    return (
        edges.filter(F.col("child_id") == node_id)
        .join(nodes, edges.parent_id == nodes.node_id)
        .select("node_id", "level", "kind", "cell", "text")
    )


def node_siblings(nodes: DataFrame, edges: DataFrame, node_id: str) -> DataFrame:
    """Nodes sharing a parent, excluding self (retrieval_repo.py:118-154)."""
    edges = _e(edges)
    parents = edges.filter(F.col("child_id") == node_id).select("parent_id")
    return (
        edges.join(F.broadcast(parents), "parent_id")
        .filter(F.col("child_id") != node_id)
        .join(nodes, F.col("child_id") == nodes.node_id)
        .select("node_id", "level", "kind", "cell", "text")
        .orderBy("level", "node_id")
    )


def node_meta(nodes: DataFrame, edges: DataFrame, node_id: str) -> DataFrame:
    """Node row + children_count + parent_id — the reference's correlated
    scalar subqueries (retrieval_repo.py:40-41), decorrelated into aggregates
    + left joins (Catalyst would do the same to the subquery form)."""
    edges = _e(edges)
    child_counts = edges.groupBy("parent_id").agg(F.count("*").alias("children_count"))
    parent_of = edges.select(
        F.col("child_id").alias("node_id"), F.col("parent_id")
    )
    return (
        nodes.filter(F.col("node_id") == node_id)
        .join(child_counts, nodes.node_id == child_counts.parent_id, "left")
        .drop(child_counts.parent_id)
        .join(parent_of, "node_id", "left")
        .select(
            "node_id",
            "level",
            "kind",
            "cell",
            "text",
            F.coalesce("children_count", F.lit(0)).alias("children_count"),
            "parent_id",
        )
    )


def path_to_root(
    nodes: DataFrame, edges: DataFrame, node_id: str, max_depth: int = 10
) -> DataFrame:
    """Climb child->parent, emitting (node, depth), ordered by depth.

    Reference: WITH RECURSIVE with depth cap 10 (retrieval_repo.py:156-216).
    Iterative self-join loop — each hop is a broadcast lookup of one id.
    """
    spark = nodes.sparkSession
    out_rows = []
    current = node_id
    depth = 0
    # collect the edge map lazily one hop at a time (frontier is exactly 1 id)
    while current is not None and depth <= max_depth:
        out_rows.append((current, depth))
        row = edges.filter(F.col("child_id") == current).select("parent_id").limit(1).collect()
        current = row[0].parent_id if row else None
        depth += 1
    path = spark.createDataFrame(out_rows, "node_id string, depth int")
    return (
        path.join(nodes, "node_id")
        .select("node_id", "depth", "level", "kind", "text")
        .orderBy("depth")
    )


def node_texts(nodes: DataFrame, node_ids: list[str]) -> DataFrame:
    """WHERE node_id = ANY(...) (retrieval_repo.py:218-252)."""
    return nodes.filter(F.col("node_id").isin(list(node_ids))).select(
        "node_id", "level", "kind", "text"
    )
