"""Snapshot catalog semantics + kill/resume reproducibility (FIXTURES.md §7).

north_rule: resumable from snapshot checkpoints with per-partition lineage +
metrics; reference upsert analogs chunk_repo_pg.py:16-35 (merge),
tree_repo_pg.py:14-50 (insert-if-absent), dataset_repo_pg.py:129-148 (delete).
"""

from __future__ import annotations

import pytest

from raptor_service_spark.datagen import gen_documents_df
from raptor_service_spark.functions.vector import embed_spans
from raptor_service_spark.io.catalog import SnapshotCatalog
from raptor_service_spark.operators.chunking import explode_spans
from raptor_service_spark.operators.tree import (
    TreeParams,
    build_tile_tree,
    build_tile_tree_checkpointed,
)

PARAMS = TreeParams(res_ladder=(6, 3, 0), summary_cap=16, salt_buckets=4, dim=16)


@pytest.fixture(scope="module")
def spans(spark):
    docs = gen_documents_df(spark, 30, seed=17)
    s = embed_spans(explode_spans(docs), dim=16).persist()
    s.count()
    return s


def _tree_signature(tree):
    nodes = sorted(
        map(tuple, tree.nodes.select("node_id", "level", "kind", "cell", "text").collect())
    )
    edges = sorted(map(tuple, tree.edges.select("parent_id", "child_id").collect()))
    links = sorted(map(tuple, tree.links.select("node_id", "chunk_id", "rank").collect()))
    return nodes, edges, links


# ---------------------------------------------------------------- catalog ops


def test_append_and_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    df1 = spark.createDataFrame([(1, "a")], "id int, s string")
    df2 = spark.createDataFrame([(2, "b")], "id int, s string")
    v1 = cat.append("t", df1)
    v2 = cat.append("t", df2)
    assert cat.read("t").count() == 2
    assert cat.read("t", version=v1).count() == 1  # time travel
    snaps = cat.snapshots("t")
    assert [s["version"] for s in snaps] == [v1, v2]
    assert all("rows_written" in s for s in snaps)  # lineage metrics


def test_merge_upsert_semantics(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    cat.append("t", spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"))
    cat.merge("t", spark.createDataFrame([(2, "B"), (3, "c")], "id int, s string"), ["id"])
    got = {(r.id, r.s) for r in cat.read("t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_insert_if_absent(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    cat.append("t", spark.createDataFrame([(1, "a")], "id int, s string"))
    cat.insert_if_absent("t", spark.createDataFrame([(1, "X"), (2, "b")], "id int, s string"), ["id"])
    got = {(r.id, r.s) for r in cat.read("t").collect()}
    assert got == {(1, "a"), (2, "b")}  # existing row NOT updated


def test_delete_where_and_rollback(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    cat.append("t", spark.createDataFrame([(1, "ds1"), (2, "ds2")], "id int, d string"))
    v_before = cat._current_version("t")
    cat.delete_where("t", "d = 'ds1'")
    assert [r.id for r in cat.read("t").collect()] == [2]
    cat.rollback("t", v_before)
    assert cat.read("t").count() == 2


# ------------------------------------------------------------- build/resume


def test_checkpointed_equals_inmemory(spark, spans, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    t_mem = build_tile_tree(spans, PARAMS)
    t_ckpt = build_tile_tree_checkpointed(spans, PARAMS, catalog=cat)
    assert _tree_signature(t_mem) == _tree_signature(t_ckpt)
    # per-level lineage recorded in snapshot props
    levels = [s["props"].get("level") for s in cat.snapshots("tree_nodes")]
    assert levels == sorted(levels)


def test_resume_after_simulated_crash(spark, spans, tmp_path):
    cat_full = SnapshotCatalog(str(tmp_path / "full"), spark)
    full = build_tile_tree_checkpointed(spans, PARAMS, catalog=cat_full)

    # crash simulation: build fully, then roll the nodes table back one level
    # (as if the job died after committing links+edges of the top level but
    # before committing its nodes)
    cat = SnapshotCatalog(str(tmp_path / "crash"), spark)
    build_tile_tree_checkpointed(spans, PARAMS, catalog=cat)
    node_snaps = cat.snapshots("tree_nodes")
    cat.rollback("tree_nodes", node_snaps[-2]["version"])
    max_level_after_rollback = (
        cat.read("tree_nodes").agg({"level": "max"}).collect()[0][0]
    )
    assert max_level_after_rollback < full.levels  # state is genuinely partial

    resumed = build_tile_tree_checkpointed(spans, PARAMS, catalog=cat, resume=True)
    assert _tree_signature(resumed) == _tree_signature(full)
    # orphan edge/link rows above the checkpoint were rolled back, not doubled
    edge_rows = resumed.edges.count()
    assert edge_rows == full.edges.count()


def test_resume_noop_when_complete(spark, spans, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    first = build_tile_tree_checkpointed(spans, PARAMS, catalog=cat)
    n_snaps = len(cat.snapshots("tree_nodes"))
    again = build_tile_tree_checkpointed(spans, PARAMS, catalog=cat, resume=True)
    assert _tree_signature(first) == _tree_signature(again)
    # complete tree -> no new node snapshots beyond resume bookkeeping
    assert len(cat.snapshots("tree_nodes")) == n_snaps


# ----------------------------------------------------- incremental ingest


def _spans_for(spark, n, seed, dim=16):
    from pyspark.sql import functions as F

    docs = gen_documents_df(spark, n, seed=seed).withColumn(
        "dataset_id", F.lit("ds-shared")
    )
    return embed_spans(explode_spans(docs), dim=dim)


def test_ingest_incremental_matches_full_rebuild(spark, tmp_path):
    """build(A) + ingest(B) == build(A ∪ B), table for table — summaries,
    budget packs, edges, and provenance links included (deterministic ids +
    complete re-aggregation of each dirty cell)."""
    from raptor_service_spark.operators.tree import ingest_incremental

    a = _spans_for(spark, 30, seed=70)
    b = _spans_for(spark, 12, seed=71)

    cat = SnapshotCatalog(str(tmp_path / "cat_inc"), spark)
    build_tile_tree_checkpointed(a, PARAMS, catalog=cat, prefix="t", resume=False)
    inc = ingest_incremental(b, cat, PARAMS, prefix="t")

    full = build_tile_tree(a.unionByName(b), PARAMS)
    assert _tree_signature(inc) == _tree_signature(full)
    # dirty-cell recompute really fired: level-1 snapshots carry ingest ops
    ops = [s["props"].get("op") for s in cat.snapshots("t_nodes")]
    assert "ingest" in ops


def test_ingest_incremental_demotes_stale_root(spark, tmp_path):
    """A one-doc corpus roots at level 1; ingesting a far-away doc must
    demote that root and grow the ladder exactly like a full rebuild."""
    from raptor_service_spark.operators.tree import ingest_incremental

    a = _spans_for(spark, 1, seed=72)
    b = _spans_for(spark, 6, seed=73)

    cat = SnapshotCatalog(str(tmp_path / "cat_root"), spark)
    t0 = build_tile_tree_checkpointed(a, PARAMS, catalog=cat, prefix="t", resume=False)
    inc = ingest_incremental(b, cat, PARAMS, prefix="t")
    full = build_tile_tree(a.unionByName(b), PARAMS)
    assert _tree_signature(inc) == _tree_signature(full)
    roots = inc.nodes.filter(inc.nodes.kind == "root").collect()
    assert len(roots) == 1


def test_ingest_incremental_multi_dataset(spark, tmp_path):
    """Two datasets share the catalog; ingesting a delta into one of them
    must leave the other tree untouched and still equal a full rebuild."""
    from pyspark.sql import functions as F

    from raptor_service_spark.operators.tree import ingest_incremental

    a1 = embed_spans(explode_spans(gen_documents_df(spark, 18, seed=74)), dim=16)
    a2 = embed_spans(explode_spans(gen_documents_df(spark, 10, seed=75)), dim=16)
    b1 = embed_spans(explode_spans(gen_documents_df(spark, 8, seed=76))
                     .withColumn("dataset_id", F.lit("ds-74")), dim=16)

    cat = SnapshotCatalog(str(tmp_path / "cat_multi"), spark)
    build_tile_tree_checkpointed(
        a1.unionByName(a2), PARAMS, catalog=cat, prefix="t", resume=False
    )
    inc = ingest_incremental(b1, cat, PARAMS, prefix="t")
    full = build_tile_tree(a1.unionByName(a2).unionByName(b1), PARAMS)
    assert _tree_signature(inc) == _tree_signature(full)
    roots = inc.nodes.filter(inc.nodes.kind == "root").select("dataset_id").collect()
    assert sorted(r.dataset_id for r in roots) == ["ds-74", "ds-75"]


def test_compact_binpacks_files_and_preserves_rows(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    for i in range(5):  # 5 commits -> 5 data dirs of small files
        cat.append("t", spark.createDataFrame([(i, f"s{i}")], "id int, s string"))
    before = {(r.id, r.s) for r in cat.read("t").collect()}
    v_pre = cat._current_version("t")
    v = cat.compact("t", target_file_bytes=1 << 30)  # everything into 1 file
    m = cat._manifest("t")
    assert m["operation"] == "compact" and m["version"] == v
    assert len(m["files"]) == 1
    assert len(cat._data_files(m["files"])) == 1
    assert {(r.id, r.s) for r in cat.read("t").collect()} == before
    # pre-compaction snapshot still time-travels
    assert cat.read("t", version=v_pre).count() == 5
    assert m["props"]["files_before"] >= 5 and m["props"]["files_after"] == 1


def test_expire_snapshots_bounds_storage(spark, tmp_path):
    import os

    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    for i in range(6):
        cat.append("t", spark.createDataFrame([(i, "x")], "id int, s string"))
    cat.compact("t", target_file_bytes=1 << 30)
    expired = cat.expire_snapshots("t", keep_last=2)
    assert expired == list(range(1, 6))  # v1..v5 dropped, v6 + v7(compact) kept
    assert [s["version"] for s in cat.snapshots("t")] == [6, 7]
    # current read unaffected; expired versions no longer readable
    assert cat.read("t").count() == 6
    with pytest.raises(FileNotFoundError):
        cat._manifest("t", 3)
    # unreferenced data dirs physically deleted, retained ones kept
    data_root = os.path.join(cat._tdir("t"), "data")
    live = set()
    for s in cat.snapshots("t"):
        live.update(s["files"])
    assert {os.path.join(data_root, n) for n in os.listdir(data_root)} == live


def test_schema_evolution_add_column(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    cat.append("t", spark.createDataFrame([(1, "a")], "id int, s string"))
    # add a column: old rows read back NULL for it
    v2 = cat.append(
        "t",
        spark.createDataFrame([(2, "b", 9.5)], "id int, s string, score double"),
        merge_schema=True,
    )
    got = {(r.id, r.s, r.score) for r in cat.read("t").collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}
    assert cat._manifest("t")["props"]["schema_added_columns"] == ["score"]
    # an append omitting an evolved column gets NULL-filled, not rejected
    cat.append(
        "t", spark.createDataFrame([(3, "c")], "id int, s string"), merge_schema=True
    )
    got = {(r.id, r.score) for r in cat.read("t").collect()}
    assert got == {(1, None), (2, 9.5), (3, None)}
    # pre-evolution snapshot time-travels WITHOUT the new column
    assert "score" not in cat.read("t", version=v2 - 1).columns


def test_delete_matching_join_based(spark, tmp_path):
    """Join-based DELETE (VERDICT r3 item 5): key-set rides an anti-join,
    scoped by an extra predicate; rows outside the predicate survive even
    when their keys match."""
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    cat.append(
        "t",
        spark.createDataFrame(
            [(1, 0, "a"), (2, 0, "b"), (1, 1, "c"), (3, 1, "d")],
            "k int, level int, s string",
        ),
    )
    keys = spark.createDataFrame([(1,), (3,)], "k int")
    cat.delete_matching("t", keys, ["k"], extra_predicate="level = 1")
    got = {(r.k, r.level, r.s) for r in cat.read("t").collect()}
    assert got == {(1, 0, "a"), (2, 0, "b")}
    # unscoped delete drops every matching key
    cat.delete_matching("t", keys, ["k"])
    assert {(r.k, r.s) for r in cat.read("t").collect()} == {(2, "b")}


def test_delete_null_predicate_keeps_rows(spark, tmp_path):
    """SQL DELETE removes rows where the predicate is TRUE; NULL-predicate
    rows are KEPT (NULL is not TRUE) — the Iceberg-twin contract (ADVICE r4).
    Both delete_where and scoped delete_matching must honor it."""
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    rows = [(1, 1, "a"), (2, None, "b"), (3, 2, "c")]
    cat.append("t", spark.createDataFrame(rows, "k int, level int, s string"))
    # level = 1 is NULL for k=2 -> that row must survive the delete
    cat.delete_where("t", "level = 1")
    got = {(r.k, r.level) for r in cat.read("t").collect()}
    assert got == {(2, None), (3, 2)}

    cat2 = SnapshotCatalog(str(tmp_path / "cat2"), spark)
    cat2.append("t", spark.createDataFrame(rows, "k int, level int, s string"))
    keys = spark.createDataFrame([(1,), (2,)], "k int")
    cat2.delete_matching("t", keys, ["k"], extra_predicate="level = 1")
    got2 = {(r.k, r.level) for r in cat2.read("t").collect()}
    assert got2 == {(2, None), (3, 2)}


def test_iceberg_sql_twins_golden(spark, tmp_path):
    """Every catalog commit records the exact Iceberg SQL the cluster-side
    deployment would run (VERDICT r3 item 9) — golden-pinned so the
    jar-present swap is mechanical."""
    from raptor_service_spark.io.catalog import (
        iceberg_compact_sql,
        iceberg_delete_matching_sql,
        iceberg_expire_snapshots_sql,
        iceberg_rollback_sql,
        iceberg_time_travel_sql,
    )

    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    cat.append("t", df)
    cat.merge("t", spark.createDataFrame([(1, "z")], "id int, s string"), ["id"])
    cat.insert_if_absent("t", df, ["id"])
    cat.delete_where("t", "id = 99")
    cat.delete_matching(
        "t", spark.createDataFrame([(1,)], "id int"), ["id"],
        extra_predicate="s = 'never'",
    )
    twins = [s["props"].get("iceberg_sql") for s in cat.snapshots("t")]
    assert twins == [
        "INSERT INTO t SELECT * FROM _staging",
        "MERGE INTO t t USING _staging s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        "MERGE INTO t t USING _staging s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT *",
        "DELETE FROM t WHERE id = 99",
        "DELETE FROM t t WHERE (s = 'never') AND "
        "EXISTS (SELECT 1 FROM _doomed_keys k WHERE k.id = t.id)",
    ]
    assert iceberg_time_travel_sql("t", 3) == "SELECT * FROM t VERSION AS OF 3"
    assert iceberg_rollback_sql("t", 2) == "CALL system.rollback_to_snapshot('t', 2)"
    assert (
        iceberg_expire_snapshots_sql("t", 3)
        == "CALL system.expire_snapshots(table => 't', retain_last => 3)"
    )
    assert iceberg_compact_sql("t", 134217728) == (
        "CALL system.rewrite_data_files(table => 't', options => "
        "map('target-file-size-bytes', '134217728'))"
    )
    assert iceberg_delete_matching_sql("t", ["a", "b"]) == (
        "DELETE FROM t t WHERE EXISTS "
        "(SELECT 1 FROM _doomed_keys k WHERE k.a = t.a AND k.b = t.b)"
    )
