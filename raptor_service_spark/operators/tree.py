"""Level-wise tile-tree build — RAPTOR's recursive build loop, Spark-first.

Reference: /root/reference/services/core/build_tree_service.py:85-161 (loop),
:198-216 (leaves), :318-400 (persist level), :363-365 (root promotion),
:109-114 (stall guard); cluster levels /root/reference/services/clustering/
clusterer.py:27-112 (UMAP+GMM) are replaced by grid-cell coarsening
(geo/grid.py): ascending one level == dropping to a coarser resolution.

Distributed-design notes (10^12-doc posture):
  * Each level is ONE shuffle: groupBy(parent_cell). No driver-side data.
  * Hot-cell skew (the reference's forced-single-cluster case) is handled by a
    SALTED TWO-PHASE top-K aggregation: the per-group summary inputs are capped
    at ``summary_cap`` children (the analog of the reference's token-budget
    prompt packing, utils/packing.py + voyage_client.py:253-280), and top-K by
    deterministic order is associative, so phase 1 aggregates (cell, salt)
    groups and phase 2 merges — no single reducer ever sees a whole hot cell.
  * Provenance links (node_id, chunk_id, rank) are carried as a DataFrame and
    joined upward level by level — never as ever-growing arrays.
  * All ids are deterministic (sha256) — reruns/resume produce identical
    trees, unlike the reference's uuid-suffixed ids (utils/render_id.py:21-22).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raptor_service_spark.functions.text import summary_node_id
from raptor_service_spark.functions.vector import hash_embed_udf
from raptor_service_spark.geo.grid import cell_encode_col, cell_parent_col
from raptor_service_spark.schema import N_DIM


@dataclass
class TreeParams:
    res_ladder: tuple[int, ...] = (8, 5, 2, 0)  # leaf res first, coarsening upward
    max_levels: int = 10  # reference raptor_config.py:23
    summary_cap: int = 32  # max children texts packed per summary (token-budget analog)
    summary_max_chars: int = 512  # reference summarizer max_tokens=512 analog
    salt_buckets: int = 16  # phase-1 salt fan-out for hot cells
    dim: int = N_DIM


@dataclass
class TileTree:
    nodes: DataFrame  # TILE_NODES + v (embedding)
    edges: DataFrame  # TILE_EDGES
    links: DataFrame  # NODE_CHUNKS
    levels: int = 0
    stats: list[dict] = field(default_factory=list)


def _leaf_nodes(spans: DataFrame, tree_id_col, res_leaf: int, dim: int) -> DataFrame:
    """Level-0 leaves from embedded spans (reference build_tree_service.py:198-216).

    Leaf node ids are derived from chunk_id (deterministic & shuffle-free);
    the reference's global counter id ({tree_id}::leaf::{idx:06d},
    utils/render_id.py:17-18) would need a global row_number — a single-reducer
    anti-pattern at 10^12 rows.
    """
    return spans.select(
        tree_id_col.alias("tree_id"),
        F.concat(tree_id_col, F.lit("::leaf::"), F.col("chunk_id")).alias("node_id"),
        F.col("dataset_id"),
        F.lit(0).alias("level"),
        F.lit("leaf").alias("kind"),
        cell_encode_col(F.col("lat"), F.col("lng"), res_leaf).alias("cell"),
        F.col("text"),
        F.col("chunk_id"),
        F.col("v"),
        # deterministic within-tree ordering key (doc_id, idx) -> one sortable string
        F.concat_ws("#", F.col("doc_id"), F.format_string("%09d", F.col("idx"))).alias("ord"),
    )


def _salted_capped_collect(
    cur: DataFrame, cap: int, salt_buckets: int
) -> DataFrame:
    """Two-phase skew-safe 'first cap children by ord' per (tree_id, parent_cell).

    top-K-by-order is associative: phase 1 takes the cap per (cell, salt),
    phase 2 merges the per-salt arrays and re-caps. Output: one row per parent
    cell with ordered child structs (ord, node_id, text) plus total child count.
    """
    item = F.struct(F.col("ord"), F.col("node_id"), F.col("text"))
    p1 = (
        cur.withColumn("salt", F.pmod(F.xxhash64("node_id"), F.lit(salt_buckets)))
        .groupBy("tree_id", "dataset_id", "parent_cell", "salt")
        .agg(
            F.slice(F.array_sort(F.collect_list(item)), 1, cap).alias("items"),
            F.count("*").alias("cnt"),
        )
    )
    return (
        p1.groupBy("tree_id", "dataset_id", "parent_cell")
        .agg(
            F.slice(F.array_sort(F.flatten(F.collect_list("items"))), 1, cap).alias("items"),
            F.sum("cnt").alias("n_children"),
        )
    )


def build_tile_tree(
    spans_embedded: DataFrame,
    params: TreeParams | None = None,
    catalog=None,
    table_prefix: str = "tree",
) -> TileTree:
    """Build the hierarchical tile tree from embedded, geo-anchored spans.

    ``spans_embedded`` columns: doc_id, dataset_id, idx, chunk_id, text, lat,
    lng, v (array<float>). Returns nodes/edges/links DataFrames. If ``catalog``
    (io.catalog.SnapshotCatalog) is given, each level is committed as a
    snapshot — the resume checkpoint (north_rule).
    """
    p = params or TreeParams()
    ladder = list(p.res_ladder)
    assert ladder == sorted(ladder, reverse=True), "res_ladder must be strictly coarsening"
    embed = hash_embed_udf(p.dim)

    tree_id_col = F.concat(F.col("dataset_id"), F.lit("::tree"))
    leaves = _leaf_nodes(spans_embedded, tree_id_col, ladder[0], p.dim)

    nodes_schema = "tree_id string, node_id string, dataset_id string, level int, kind string, cell long, text string, ord string"
    spark = spans_embedded.sparkSession

    all_nodes = [leaves.drop("chunk_id")]
    all_edges: list[DataFrame] = []
    # leaf links: rank 0 identity (reference build_tree_service.py:198-216)
    all_links = [
        leaves.select(
            "tree_id", "node_id", "chunk_id", F.lit(0).alias("rank"), "dataset_id"
        )
    ]
    stats: list[dict] = []

    cur = leaves.persist()
    cur_links = all_links[0]
    n_cur = cur.count()
    level = 0
    if catalog is not None:
        catalog.append(f"{table_prefix}_nodes", cur.drop("chunk_id"))
        catalog.append(f"{table_prefix}_links", cur_links)

    for parent_res in ladder[1:]:
        if n_cur <= 1 or level >= p.max_levels:
            break
        level += 1
        child_res = ladder[ladder.index(parent_res) - 1]

        cur = cur.withColumn(
            "parent_cell", cell_parent_col(F.col("cell"), child_res, parent_res)
        )

        grouped = _salted_capped_collect(cur, p.summary_cap, p.salt_buckets)
        n_groups = grouped.count()

        # stall guard (reference :109-114): coarsening guarantees n_groups <=
        # n_cur; if no progress, collapse everything into one group.
        forced_single = False
        if n_groups >= n_cur:
            forced_single = True
            grouped = (
                cur.withColumn("parent_cell", F.lit(0).cast("long"))
                .transform(lambda d: _salted_capped_collect(d, p.summary_cap, p.salt_buckets))
            )
            n_groups = 1

        parents = grouped.select(
            "tree_id",
            "dataset_id",
            F.col("parent_cell").alias("cell"),
            F.lit(level).alias("level"),
            F.substring(
                F.concat_ws("\n", F.transform("items", lambda s: s["text"])),
                1,
                p.summary_max_chars,
            ).alias("text"),
            F.col("n_children"),
        ).withColumn(
            "node_id", summary_node_id(F.col("tree_id"), F.col("level"), F.col("cell"))
        ).withColumn(
            # root promotion happens after counting the level (reference :363-365)
            "kind",
            F.when(F.lit(n_groups == 1), F.lit("root")).otherwise(F.lit("summary")),
        ).withColumn(
            "ord", F.concat_ws("#", F.lit(f"L{level}"), F.col("cell").cast("string"))
        )
        parents = parents.withColumn("v", embed(F.col("text"))).persist()

        # edges: every child -> its parent (not capped — caps affect only the
        # summary text, provenance stays complete, mirroring A6/A7 semantics)
        edges = cur.select(
            "tree_id",
            summary_node_id(F.col("tree_id"), F.lit(level), F.col("parent_cell")).alias(
                "parent_id"
            ),
            F.col("node_id").alias("child_id"),
            F.col("ord").alias("child_ord"),
        )
        if forced_single:
            edges = cur.select(
                "tree_id",
                summary_node_id(F.col("tree_id"), F.lit(level), F.lit(0).cast("long")).alias(
                    "parent_id"
                ),
                F.col("node_id").alias("child_id"),
                F.col("ord").alias("child_ord"),
            )

        # first-seen dedup of chunk provenance (reference utils/chunking.py:4-11;
        # rank assignment build_tree_service.py:342-349): order children by ord,
        # within child by child rank; first occurrence of a chunk wins.
        child_links = edges.join(
            cur_links.select(F.col("node_id").alias("child_id"), "chunk_id", "rank"),
            "child_id",
        )
        w_first = Window.partitionBy("parent_id", "chunk_id").orderBy("child_ord", "rank")
        w_rank = Window.partitionBy("parent_id").orderBy("child_ord", "rank")
        parent_links = (
            child_links.withColumn("rn", F.row_number().over(w_first))
            .filter(F.col("rn") == 1)
            .withColumn("new_rank", (F.row_number().over(w_rank) - 1).cast("int"))
            .select(
                "tree_id",
                F.col("parent_id").alias("node_id"),
                "chunk_id",
                F.col("new_rank").alias("rank"),
            )
            .join(parents.select(F.col("node_id"), "dataset_id"), "node_id")
        )

        edges_out = edges.select("tree_id", "parent_id", "child_id")
        stats.append(
            {"level": level, "groups": n_groups, "children": n_cur, "forced_single": forced_single}
        )

        if catalog is not None:
            catalog.append(f"{table_prefix}_nodes", parents.drop("n_children"))
            catalog.append(f"{table_prefix}_edges", edges_out)
            catalog.append(f"{table_prefix}_links", parent_links)

        all_nodes.append(parents.drop("n_children"))
        all_edges.append(edges_out)
        all_links.append(parent_links)

        cur.unpersist()
        cur = parents.select(
            "tree_id", "node_id", "dataset_id", "level", "kind", "cell", "text", "v", "ord"
        ).persist()
        cur_links = parent_links
        n_cur = n_groups
        if n_groups == 1:
            break

    nodes = all_nodes[0].select(
        "tree_id", "node_id", "dataset_id", "level", "kind", "cell", "text", "v", "ord"
    )
    for extra in all_nodes[1:]:
        nodes = nodes.unionByName(
            extra.select(
                "tree_id", "node_id", "dataset_id", "level", "kind", "cell", "text", "v", "ord"
            )
        )
    edges = (
        all_edges[0]
        if all_edges
        else spark.createDataFrame([], "tree_id string, parent_id string, child_id string")
    )
    for extra in all_edges[1:]:
        edges = edges.unionByName(extra)
    links = all_links[0].select("tree_id", "node_id", "chunk_id", "rank")
    for extra in all_links[1:]:
        links = links.unionByName(extra.select("tree_id", "node_id", "chunk_id", "rank"))

    return TileTree(nodes=nodes, edges=edges, links=links, levels=level, stats=stats)
