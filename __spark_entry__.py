"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: grid-compacted collapsed retrieval (tile centroids
                -> candidate cells -> exact cosine top-k) on sf0.001.
queries()     — one entry per implemented operator from SURVEY.md §2 and the
                training-data pipeline brief (dedup / similarity / text / geo).
oracle_sql()  — DuckDB-equivalent SQL for every oracle-checkable query.

Parity techniques (see raptor_service_spark.operators.dedup docstring):
  * all text hashing is md5 (identical hex in Spark and DuckDB);
  * geo cell ids are pure +,*,floor arithmetic (identical in both engines);
  * doc coordinates derive from a multiplicative integer hash of doc_id
    (exact integer math both sides);
  * float outputs are ROUND(x, 6) on both sides; ordering keys round first
    and tie-break on ids (SURVEY §7.4.1).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raptor_service_spark.datagen import gen_query_vectors
from raptor_service_spark.functions.text import (
    fingerprint,
    lang_id,
    lang_id_sql,
    normalize_query_sql,
    quality_score,
    quality_score_sql,
)
from raptor_service_spark.functions.vector import cosine_dist_col, cosine_sim_col
from raptor_service_spark.geo.grid import (
    cell_encode_col,
    cell_encode_sql,
    cell_parent_col,
    cell_parent_sql,
)
from raptor_service_spark.operators.knn import grid_knn_sql
from raptor_service_spark.operators.dedup import (
    canonical_docs_sql,
    cosine_neardup_bucketed_sql,
    cosine_neardup_exact,
    cosine_neardup_exact_sql,
    repetition_scores_sql,
    exact_dedup,
    exact_dedup_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
    shingles_sql,
    simhash_pairs,
    simhash_pairs_sql,
)

# ---------------------------------------------------------------------------
# shared deterministic constructions
# ---------------------------------------------------------------------------

# multiplicative-hash geo anchor for driver docs: exact int math on BIGINT
_HM, _HMOD = 2654435761, 2147483648


def _latlng_cols(doc_id_col):
    h = F.pmod(doc_id_col.cast("long") * F.lit(_HM), F.lit(_HMOD))
    lat = (F.pmod(h, F.lit(1700)).cast("double") / F.lit(10.0)) - F.lit(85.0) + F.lit(0.05)
    lng = (
        F.pmod(F.floor(h / F.lit(1700)), F.lit(3580)).cast("double") / F.lit(10.0)
    ) - F.lit(179.0) + F.lit(0.05)
    return lat, lng


def _latlng_sql(doc_expr: str) -> tuple[str, str]:
    h = f"(({doc_expr} * {_HM}) % {_HMOD})"
    lat = f"(({h} % 1700) / 10.0 - 85.0 + 0.05)"
    lng = f"((CAST(FLOOR({h} / 1700) AS BIGINT) % 3580) / 10.0 - 179.0 + 0.05)"
    return lat, lng


QVEC = np.round(gen_query_vectors(seed=99, n=1, dim=64)[0], 6)
QVEC_SQL = "[" + ", ".join(f"{x:.6f}" for x in QVEC) + "]"


def _round_half_up(x, dp: int):
    """DuckDB/Spark ROUND semantics (half away from zero) for numpy —
    np.round is half-to-even and diverges on exact .5 scaled values."""
    p = 10.0**dp
    return np.copysign(np.floor(np.abs(np.asarray(x, dtype=np.float64)) * p + 0.5), x) / p

TRI = [(10.0, 20.0), (40.0, 60.0), (-20.0, 70.0)]  # (lat, lng)
RECT = [(-30.0, -120.0), (-30.0, -60.0), (10.0, -60.0), (10.0, -120.0)]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_with_dups(spark, sf_dir) -> DataFrame:
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionByName(d.select((F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text"))


_DOCS_WITH_DUPS_SQL = (
    "(SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents)"
)


def _emb_with_dups(spark, sf_dir) -> DataFrame:
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.unionByName(
        e.select((F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding")
    )


_EMB_WITH_DUPS_SQL = (
    "(SELECT vec_id, embedding FROM embeddings "
    "UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings)"
)


# ---------------------------------------------------------------------------
# flagship: grid-compacted collapsed retrieval (oracle-checkable end to end)
# ---------------------------------------------------------------------------


def grid_collapsed_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage tile retrieval over driver tables (R5 recast, J8, A7):

    leaves = documents ⋈ embeddings; level-1 tile nodes = per-cell centroid
    (elementwise mean via dim codegen'd SUM aggs + COUNT, map-side partial);
    stage 1 = top-3 cells by centroid cosine; stage 2 = exact cosine top-8
    inside candidate cells. Cites reference collapsed path
    /root/reference/repositories/retrieval_repo.py:254-348.
    """
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lat, lng = _latlng_cols(F.col("doc_id"))
    leaves = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .withColumn("cell4", cell_encode_col(lat, lng, 4))
        .withColumn("cell2", cell_parent_col(F.col("cell4"), 4, 2))
        .select("doc_id", "embedding", "cell2")
    )
    # Centroid per cell as dim fixed-width SUM aggregates + one COUNT: fully
    # codegen'd with map-side partial aggregation, so the single exchange
    # carries only (cells x dim+1 doubles) per map partition — no row
    # explosion, no Python. (Replaces a posexplode that materialized n*dim
    # rows through the aggregate.)
    dim = 64
    cents = (
        leaves.groupBy("cell2")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(F.col("embedding")[i]).alias(f"s{i}") for i in range(dim)],
        )
        .select(
            "cell2",
            F.array(*[F.col(f"s{i}") / F.col("cnt") for i in range(dim)]).alias(
                "centroid"
            ),
        )
    )
    s1 = (
        cents.withColumn("cdist", F.round(cosine_dist_col(F.col("centroid"), QVEC), 6))
        .orderBy(F.col("cdist").asc(), F.col("cell2").asc())
        .limit(3)
    )
    cells = [r.cell2 for r in s1.collect()]
    return (
        leaves.filter(F.col("cell2").isin(cells))
        .withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), QVEC), 6))
        .orderBy(F.col("dist").asc(), F.col("doc_id").asc())
        .limit(8)
        .select("doc_id", "dist")
    )


def _grid_collapsed_retrieval_sql() -> str:
    lat, lng = _latlng_sql("d.doc_id")
    cell4 = cell_encode_sql(lat, lng, 4)
    cell2 = cell_parent_sql("cell4", 4, 2)
    demb = "list_transform(l.embedding, x -> CAST(x AS DOUBLE))"
    return f"""
        WITH leaves AS (
            SELECT d.doc_id, e.embedding, {cell4} AS cell4
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ),
        leaves2 AS (SELECT doc_id, embedding, {cell2} AS cell2 FROM leaves),
        cent_elems AS (
            SELECT cell2, t.i AS i, AVG(CAST(embedding[t.i] AS DOUBLE)) AS m
            FROM leaves2, UNNEST(generate_series(1, 64)) t(i)
            GROUP BY cell2, t.i
        ),
        cents AS (
            SELECT cell2, list(m ORDER BY i) AS centroid FROM cent_elems GROUP BY cell2
        ),
        s1 AS (
            SELECT cell2,
                   ROUND(1.0 - list_cosine_similarity(centroid, {QVEC_SQL}), 6) AS cdist
            FROM cents ORDER BY cdist ASC, cell2 ASC LIMIT 3
        )
        SELECT l.doc_id,
               ROUND(1.0 - list_cosine_similarity({demb}, {QVEC_SQL}), 6) AS dist
        FROM leaves2 l JOIN s1 ON l.cell2 = s1.cell2
        ORDER BY dist ASC, l.doc_id ASC LIMIT 8
    """


def grid_traversal_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traversal beam retrieval over driver tables (R6 recast with a real
    oracle): root -> res2 tile centroids -> res4 tile centroids -> leaves,
    taking the GLOBAL top-beam ACROSS parents at each level (the reference
    applies LIMIT :k globally, not per parent — SURVEY §2.5 parity; cites
    /root/reference/repositories/retrieval_repo.py:350-436). Frontiers are
    O(beam) driver lists -> literal IN filters (partition-prunable); each
    level is one centroid agg + TakeOrderedAndProject."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lat, lng = _latlng_cols(F.col("doc_id"))
    leaves = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .withColumn("cell4", cell_encode_col(lat, lng, 4))
        .select("doc_id", "embedding", "cell4")
    )
    dim = 64
    # ONE full-data aggregation: per-res4-cell partial sums + count. The res2
    # level re-aggregates those partials (shuffle carries cells x (dim+1)
    # doubles, not leaves) — the two-level rollup shape that survives 100x.
    sums4 = leaves.groupBy("cell4").agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(F.col("embedding")[i]).alias(f"s{i}") for i in range(dim)],
    )

    def _to_centroid(df, cell_col):
        return df.select(
            cell_col,
            F.array(*[F.col(f"s{i}") / F.col("cnt") for i in range(dim)]).alias(
                "centroid"
            ),
        )

    cents4 = _to_centroid(sums4, "cell4")
    cents2 = _to_centroid(
        sums4.withColumn("cell2", cell_parent_col(F.col("cell4"), 4, 2))
        .groupBy("cell2")
        .agg(
            F.sum("cnt").alias("cnt"),
            *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)],
        ),
        "cell2",
    )
    f2 = [
        r.cell2
        for r in cents2.withColumn(
            "d", F.round(cosine_dist_col(F.col("centroid"), QVEC2), 6)
        )
        .orderBy(F.col("d").asc(), F.col("cell2").asc())
        .limit(3)
        .collect()
    ]
    f1 = [
        r.cell4
        for r in cents4.filter(cell_parent_col(F.col("cell4"), 4, 2).isin(f2))
        .withColumn("d", F.round(cosine_dist_col(F.col("centroid"), QVEC2), 6))
        .orderBy(F.col("d").asc(), F.col("cell4").asc())
        .limit(3)
        .collect()
    ]
    return (
        leaves.filter(F.col("cell4").isin(f1))
        .withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), QVEC2), 6))
        .orderBy(F.col("dist").asc(), F.col("doc_id").asc())
        .limit(8)
        .select("doc_id", "dist")
    )


def _grid_traversal_retrieval_sql() -> str:
    lat, lng = _latlng_sql("d.doc_id")
    cell4 = cell_encode_sql(lat, lng, 4)
    demb = "list_transform(l.embedding, x -> CAST(x AS DOUBLE))"
    parent = cell_parent_sql("cell4", 4, 2)
    return f"""
        WITH leaves AS (
            SELECT d.doc_id, e.embedding, {cell4} AS cell4
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ),
        c4e AS (
            SELECT cell4, t.i AS i, AVG(CAST(embedding[t.i] AS DOUBLE)) AS m
            FROM leaves, UNNEST(generate_series(1, 64)) t(i)
            GROUP BY cell4, t.i
        ),
        cents4 AS (SELECT cell4, list(m ORDER BY i) AS centroid FROM c4e GROUP BY cell4),
        l2 AS (SELECT doc_id, embedding, {parent} AS cell2 FROM leaves),
        c2e AS (
            SELECT cell2, t.i AS i, AVG(CAST(embedding[t.i] AS DOUBLE)) AS m
            FROM l2, UNNEST(generate_series(1, 64)) t(i)
            GROUP BY cell2, t.i
        ),
        cents2 AS (SELECT cell2, list(m ORDER BY i) AS centroid FROM c2e GROUP BY cell2),
        f2 AS (
            SELECT cell2,
                   ROUND(1.0 - list_cosine_similarity(centroid, {QVEC2_SQL}), 6) AS d
            FROM cents2 ORDER BY d ASC, cell2 ASC LIMIT 3
        ),
        f1 AS (
            SELECT cell4,
                   ROUND(1.0 - list_cosine_similarity(centroid, {QVEC2_SQL}), 6) AS d
            FROM cents4 WHERE {parent} IN (SELECT cell2 FROM f2)
            ORDER BY d ASC, cell4 ASC LIMIT 3
        )
        SELECT l.doc_id,
               ROUND(1.0 - list_cosine_similarity({demb}, {QVEC2_SQL}), 6) AS dist
        FROM leaves l
        WHERE l.cell4 IN (SELECT cell4 FROM f1)
        ORDER BY dist ASC, l.doc_id ASC LIMIT 8
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return grid_collapsed_retrieval(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# relational operator battery (SURVEY §2.1-2.8 over driver tables)
# ---------------------------------------------------------------------------


def q_lineitem_agg(spark, sf_dir):
    """A-class agg (TPC-H Q1 shape): partial+final hash agg, no Python."""
    return (
        _read(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("cnt"),
        )
    )


def q_orders_status_stats(spark, sf_dir):
    """A1: count/min/max per group (dataset_repo_pg.py:20-29)."""
    return (
        _read(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("first_dt"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("last_dt"),
        )
    )


def q_sum_qty_per_segment(spark, sf_dir):
    """A3 3-way join + sum (dataset_repo_pg.py:156-161 shape)."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    l = _read(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"), F.count("*").alias("n_items"))
    )


def q_distinct_event_types(spark, sf_dir):
    """A4: SELECT DISTINCT (dataset_repo_pg.py:164-168)."""
    return _read(spark, sf_dir, "events").select("event_type").distinct()


def q_semi_join_orders(spark, sf_dir):
    """J3 semi-join: orders of BUILDING-segment customers, count by priority."""
    c = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _read(spark, sf_dir, "orders")
    return (
        o.join(c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_anti_join_customers(spark, sf_dir):
    """§2.7 anti-join (delete-predicate form): customers with no orders."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


def q_topk_lineitems(spark, sf_dir):
    """T1 global top-k (TakeOrderedAndProject)."""
    return (
        _read(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(10)
    )


def q_latest_order_per_customer(spark, sf_dir):
    """T2 latest-per-group via window (retrieval_repo.py:363-371 shape)."""
    from pyspark.sql import Window

    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("latest_dt"),
        )
    )


def q_orders_page(spark, sf_dir):
    """T5/S8 stable offset paging via row_number (dataset_repo_pg.py:102-110)."""
    from pyspark.sql import Window

    o = _read(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 20) & (F.col("rn") <= 30))
        .select("o_orderkey", "o_custkey", F.col("rn").cast("long").alias("rn"))
    )


def q_events_ordered_scan(spark, sf_dir):
    """T4/S9 ordered scan (chunk order invariant read path)."""
    return (
        _read(spark, sf_dir, "events")
        .orderBy(F.col("user_id").asc(), F.col("ts").asc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id", "user_id", "event_type")
    )


def q_order_count_per_customer(spark, sf_dir):
    """J6 decorrelated scalar subquery: per-customer order count incl. zeros."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        c.join(cnt, c.c_custkey == cnt.o_custkey, "left")
        .select("c_custkey", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    )


def q_supplier_siblings(spark, sf_dir):
    """J5 sibling join: supplier pairs sharing a nation, excluding self."""
    s = _read(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("sup_a"), F.col("s_nationkey").alias("nk"))
    b = s.select(F.col("s_suppkey").alias("sup_b"), F.col("s_nationkey").alias("nk"))
    return a.join(b, "nk").filter(F.col("sup_a") < F.col("sup_b")).select(
        "sup_a", "sup_b", F.col("nk").alias("nationkey")
    )


def q_top2_orders_per_customer(spark, sf_dir):
    """§2.5 per-group top-k window (the per-parent expand_k variant)."""
    from pyspark.sql import Window

    o = _read(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), F.col("rn").cast("long").alias("rn"))
    )


def q_events_hourly_stats(spark, sf_dir):
    """Streaming-unified windowed agg, batch mode (streaming/events.py)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def q_json_props(spark, sf_dir):
    """F10 JSON parse + agg (utils/json.py analog)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 6).alias("avg_k"), F.sum("k").alias("sum_k"))
    )


def q_user_sessions(spark, sf_dir):
    """Gap-based sessionization, batch form (streaming/sessions.py — the
    applyInPandasWithState streaming twin is parity-tested in
    tests/test_sessions.py): lag -> gap flag -> cumsum session id -> agg."""
    from raptor_service_spark.streaming.sessions import sessionize_batch

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return sessionize_batch(ev, gap_minutes=30).select(
        "user_id",
        F.col("sess_id").cast("long").alias("sess_id"),
        F.date_format(F.col("session_start").cast("timestamp"), "yyyy-MM-dd HH:mm:ss").alias("start_dt"),
        F.date_format(F.col("session_end").cast("timestamp"), "yyyy-MM-dd HH:mm:ss").alias("end_dt"),
        "n_events",
        "sum_value",
    )


def q_filtered_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-agg — every predicate and both
    columns must reach the parquet reader (PushedFilters/ReadSchema), the
    agg is one partial+final combine, zero joins, zero Python."""
    l = _read(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> two fact joins -> agg ->
    global top-10 (TakeOrderedAndProject after partial/final agg)."""
    c = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    o = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_path_to_root(spark, sf_dir):
    """R7 recursive path-to-root as a distributed batch op (retrieval_repo.py
    :156-216 WITH RECURSIVE, depth cap 10): every start key climbs the
    arithmetic hierarchy parent(k)=floor(k/10) to the root, one bounded
    driver-loop level per hop — each level is a narrow map (no shuffle), the
    final union is the recursive CTE's UNION ALL."""
    start = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(F.col("o_orderkey").alias("start_key"))
        .distinct()
    )
    frontier = start.select(
        "start_key", F.col("start_key").alias("node"), F.lit(0).cast("long").alias("depth")
    )
    levels = [frontier]
    for _ in range(10):
        frontier = frontier.filter(F.col("node") > 0).select(
            "start_key",
            F.floor(F.col("node") / 10).cast("long").alias("node"),
            (F.col("depth") + 1).alias("depth"),
        )
        levels.append(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def q_first_seen_dedup(spark, sf_dir):
    """A6 order-preserving dedup-union (utils/chunking.py:4-11): per user keep
    the FIRST occurrence of each event_type (by ts, event_id) and re-rank in
    first-seen order — the exact window construction from SURVEY §2.4/A6 that
    materializes the reference's tree_node_chunks.rank."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .select("user_id", "event_type", "rank")
    )


def q_revenue_by_nation(spark, sf_dir):
    """TPC-H Q5 shape with explicit broadcast of the dimension chain
    (region -> nation): the small sides never shuffle the fact table; at
    100 TB the only shuffles left are the two fact equi-joins + final agg."""
    r = _read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _read(spark, sf_dir, "nation")
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    l = _read(spark, sf_dir, "lineitem")
    dim = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        c.join(dim, c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def q_price_bucket_range_join(spark, sf_dir):
    """J11 range/interval join: orders banded against a tiny bucket table on
    o_totalprice BETWEEN lo AND hi — broadcast nested-loop on the literal
    side, never a shuffle of the fact table."""
    buckets = F.broadcast(
        spark.createDataFrame(
            [("low", 0.0, 100000.0), ("mid", 100000.0, 250000.0), ("high", 250000.0, 1e12)],
            "bucket string, lo double, hi double",
        )
    )
    o = _read(spark, sf_dir, "orders")
    return (
        o.join(
            buckets,
            (o.o_totalprice >= F.col("lo")) & (o.o_totalprice < F.col("hi")),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


def q_scalar_funcs(spark, sf_dir):
    """F1/F2/F3/F5 scalar battery (utils/regex.py:4-5, persist_document.py:33,
    render_id.py:17-18, token.py:98-106): md5 checksum, Summary-prefix strip,
    formatted chunk id, char truncation — all whole-stage-codegen JVM exprs."""
    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("checksum"),
        F.regexp_replace(F.col("text"), r"(?i)^summary:\s*", "").substr(1, 20).alias("cleaned_head"),
        F.format_string("%d::leaf::%06d", F.col("doc_id"), F.col("doc_id") % 1000).alias("leaf_id"),
        F.substring(F.col("text"), 1, 40).alias("truncated"),
        F.length(F.col("text")).cast("long").alias("n_chars"),
    )


def q_doc_winnow_fp(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing, the MOSS scheme):
    per-doc distinct window-min gram hashes, aggregated to (n_fp, fp_min,
    fp_sum) so the compare stays small. operators/dedup.winnow_fingerprints."""
    from raptor_service_spark.operators.dedup import winnow_fingerprints

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    fp = winnow_fingerprints(d)
    return fp.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.sum("fp").alias("fp_sum"),
    )


def _doc_winnow_fp_sql() -> str:
    from raptor_service_spark.operators.dedup import winnow_fingerprints_sql

    inner = winnow_fingerprints_sql("(SELECT * FROM documents WHERE doc_id < 300) s")
    return f"""
        SELECT id AS doc_id, COUNT(*) AS n_fp, MIN(fp) AS fp_min,
               CAST(SUM(fp) AS BIGINT) AS fp_sum
        FROM ({inner}) GROUP BY 1
    """


def q_doc_token_stats(spark, sf_dir):
    """Both token counters from the brief — whitespace and BPE-ish regex —
    per language."""
    from raptor_service_spark.functions.text import token_count, token_count_bpe

    d = _read(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(token_count(F.col("text")).cast("long")).alias("ws_tokens"),
        F.sum(token_count_bpe(F.col("text")).cast("long")).alias("bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


def _doc_token_stats_sql() -> str:
    from raptor_service_spark.functions.text import token_count_bpe_sql, token_count_sql

    return f"""
        SELECT lang,
               CAST(SUM({token_count_sql('text')}) AS BIGINT) AS ws_tokens,
               CAST(SUM({token_count_bpe_sql('text')}) AS BIGINT) AS bpe_tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """


def q_events_quantiles(spark, sf_dir):
    """Exact per-group quantiles (continuous interpolation — matches DuckDB
    quantile_cont bit-for-bit at 6 dp). Exact percentile buffers each
    group's values; at 100 TB swap to approx_percentile (t-digest sketch,
    mergeable partial agg) — the exact form is kept here because it is
    oracle-checkable."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.count("*").alias("n_events"),
    )


def q_query_normalize(spark, sf_dir):
    """Query length policy battery (query_rewrite_service.py:48-67): caps
    scaled to the driver docs' token range so all three branches fire —
    pass-through, truncate-to-target, reject(NULL)."""
    from raptor_service_spark.functions.text import normalize_query, token_count

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    nq = normalize_query(F.col("text"), soft_cap=50, hard_cap=90, target_tokens=30)
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.length(nq).cast("long").alias("norm_len"),
        F.coalesce(F.substring(nq, 1, 24), F.lit("<rejected>")).alias("norm_head"),
    )


def q_event_type_setops(spark, sf_dir):
    """§2.7 set ops: INTERSECT/EXCEPT of event-type sets between the even and
    odd event-id halves of the stream."""
    ev = _read(spark, sf_dir, "events")
    even = ev.filter(F.col("event_id") % 2 == 0).select("event_type")
    odd = ev.filter(F.col("event_id") % 2 == 1).select("event_type")
    both = even.intersect(odd).withColumn("src", F.lit("both"))
    only_even = even.subtract(odd).withColumn("src", F.lit("only_even"))
    only_odd = odd.subtract(even).withColumn("src", F.lit("only_odd"))
    return both.unionByName(only_even).unionByName(only_odd)


# ---------------------------------------------------------------------------
# text analysis battery (graft brief: lang-id, quality, tokens, fingerprint)
# ---------------------------------------------------------------------------


def q_doc_tokens_by_lang(spark, sf_dir):
    from raptor_service_spark.functions.text import token_count

    d = _read(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
        F.count("*").alias("n_docs"),
    )


def q_doc_quality_top20(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return (
        d.withColumn("quality", quality_score(F.col("text")))
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", "quality")
    )


def q_doc_langid_counts(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return d.withColumn("pred_lang", lang_id(F.col("text"))).groupBy("pred_lang").agg(
        F.count("*").alias("n_docs")
    )


def q_doc_hash_split(spark, sf_dir):
    """Deterministic md5-bucket train/valid/test split + per-split stats —
    assignment depends only on doc_id (stable across re-runs/appends/
    partitionings), the property RNG-based df.sample cannot give."""
    from raptor_service_spark.functions.text import hash_split, token_count

    d = _read(spark, sf_dir, "documents")
    return (
        d.withColumn("split", hash_split(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text")).cast("long")).alias("n_tokens"),
        )
    )


def q_top_terms_per_lang(spark, sf_dir):
    """Per-language top-5 terms by frequency (explode -> two-phase count ->
    per-group window top-k) — corpus summarization for dataset cards."""
    d = _read(spark, sf_dir, "documents")
    w = F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    counts = (
        d.select("lang", w)
        .filter(F.col("term") != "")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    win = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 5)
        .select("lang", "term", "n", F.col("rk").cast("long").alias("rk"))
    )


def q_doc_fingerprint_dedup(spark, sf_dir):
    return exact_dedup(_docs_with_dups(spark, sf_dir))


_SHINGLE_CACHE: dict = {}


def _shared_shingles3(spark, sf_dir):
    """The (id, g) 3-gram stream over _docs_with_dups, derived and
    PERSISTED once per (application, sf_dir) and shared by minhash_pairs,
    neardup_components, doc_repetition, and ngram_jaccard — the
    materialize-the-shingle-table-once pattern a 100 TB curation pipeline
    runs (one scan + one window shuffle feed four operators instead of
    four re-derivations). Content is identical to a per-query derivation
    (shingle_rows is deterministic), so every oracle is unchanged."""
    from raptor_service_spark.operators.dedup import shingle_rows

    if os.environ.get("SPARK_GRAFT_SHARE_SHINGLES", "1") == "0":
        return None  # measurement/bypass knob: consumers re-derive per query

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SHINGLE_CACHE:
        _SHINGLE_CACHE.clear()  # one live corpus at a time; bounded memory
        _SHINGLE_CACHE[key] = shingle_rows(
            _docs_with_dups(spark, sf_dir), "text", "doc_id", k=3
        ).persist()
    return _SHINGLE_CACHE[key]


def q_minhash_pairs(spark, sf_dir):
    """bands=8 (two md5 calls per shingle): at threshold 0.7 the per-pair
    LSH miss probability is (1-0.7)^8 ≈ 6.6e-5 — half the hashing cost of
    bands=16 for a negligible recall change. The oracle uses the same
    signature, so outputs still match exactly (same candidacy predicate)."""
    return minhash_lsh_pairs(
        _docs_with_dups(spark, sf_dir),
        threshold=0.7,
        bands=8,
        shingles=_shared_shingles3(spark, sf_dir),
    )


def q_neardup_components(spark, sf_dir):
    """Near-dup clustering: connected components over the MinHash pair list +
    canonical (min-id) selection — the keep/drop verdict a training pipeline
    materializes after pair generation. Spark side is the alternating
    large/small-star algorithm (O(log n) rounds); DuckDB oracle is a
    recursive-CTE transitive closure."""
    from raptor_service_spark.operators.dedup import canonical_docs

    docs = _docs_with_dups(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, threshold=0.7, bands=8, shingles=_shared_shingles3(spark, sf_dir)
    )
    return canonical_docs(docs, pairs)


def q_doc_repetition(spark, sf_dir):
    """Duplicate 3-gram fraction per doc (Gopher-style repetition filter)."""
    from raptor_service_spark.operators.dedup import repetition_scores

    return repetition_scores(
        _docs_with_dups(spark, sf_dir), shingles=_shared_shingles3(spark, sf_dir)
    )


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(
        _docs_with_dups(spark, sf_dir),
        threshold=0.6,
        shingles=_shared_shingles3(spark, sf_dir),
    )


def q_cosine_neardup(spark, sf_dir):
    return cosine_neardup_exact(_emb_with_dups(spark, sf_dir), threshold=0.5)


def q_cosine_neardup_lsh(spark, sf_dir):
    """Scale path: projection-cell bucketing prunes the pair space before
    exact cosine. Oracle-checked: the DuckDB twin reproduces the SAME bucket
    candidacy via projected_cell_sql, so the approximate path's exact output
    (not just recall) is verified; recall vs the exact variant is additionally
    pytest-asserted in tests/test_dedup.py."""
    from raptor_service_spark.operators.dedup import cosine_neardup_bucketed

    return cosine_neardup_bucketed(_emb_with_dups(spark, sf_dir), threshold=0.5)


QVEC2 = np.round(gen_query_vectors(seed=98, n=1, dim=64)[0], 6)
QVEC2_SQL = "[" + ", ".join(f"{x:.6f}" for x in QVEC2) + "]"


def q_knn_multi(spark, sf_dir):
    """J8 multi-query brute-force kNN: ONE data pass for many queries
    (operators/knn.py brute_force_knn_multi — per-Arrow-batch GEMM local
    top-k, then a per-qid window merge; shuffle carries batches*k rows)."""
    from raptor_service_spark.operators.knn import brute_force_knn_multi

    e = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    out = brute_force_knn_multi(e, np.stack([QVEC, QVEC2]), ["qa", "qb"], k=5)
    return out.select("qid", "id", F.round("dist", 6).alias("dist"))


_COLBERT_QS = [
    np.round(gen_query_vectors(seed=111 + i, n=1, dim=64)[0], 6) for i in range(4)
]
_COLBERT_GROUP = 4


def q_colbert_maxsim(spark, sf_dir):
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020):
    documents are MULTI-VECTOR (here: groups of 4 consecutive embeddings —
    the per-span vector shape of the interleaved corpus) and score(doc) =
    Σ_{{q ∈ query}} max_{{d ∈ doc}} cos(q, d) — every query vector matches
    its best span, summed. Fully relational MaxSim: one pass computes the
    4 query cosines per span vector (codegen zip_with kernels), a per-doc
    agg takes the 4 MAXes and sums them, TakeOrderedAndProject emits the
    top-10. At 100 TB: no join, no shuffle beyond the one doc-keyed agg —
    the scan dominates exactly as a late-interaction index scan should.
    Per-q maxes pre-rounded 9 dp (fold-free MAX, sum of 4 rounded terms),
    score 6 dp."""
    e = _read(spark, sf_dir, "embeddings").select(
        F.floor(F.col("vec_id") / _COLBERT_GROUP).cast("long").alias("doc_grp"),
        F.col("embedding").alias("v"),
    )
    sims = e.select(
        "doc_grp",
        *[
            cosine_sim_col(F.col("v"), q).alias(f"s{i}")
            for i, q in enumerate(_COLBERT_QS)
        ],
    )
    maxes = sims.groupBy("doc_grp").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        *[F.round(F.max(f"s{i}"), 9).alias(f"m{i}") for i in range(len(_COLBERT_QS))],
    )
    score = None
    for i in range(len(_COLBERT_QS)):
        term = F.col(f"m{i}")
        score = term if score is None else score + term
    return (
        maxes.select(
            "doc_grp", "n_vecs", F.round(score, 6).alias("maxsim_score")
        )
        .orderBy(F.col("maxsim_score").desc(), "doc_grp")
        .limit(10)
    )


def _colbert_maxsim_sql() -> str:
    qlits = [
        "[" + ", ".join(f"{x:.6f}" for x in q) + "]" for q in _COLBERT_QS
    ]
    demb = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    sims = ", ".join(
        f"list_cosine_similarity({demb}, {ql}) AS s{i}"
        for i, ql in enumerate(qlits)
    )
    maxes = ", ".join(
        f"ROUND(MAX(s{i}), 9) AS m{i}" for i in range(len(qlits))
    )
    total = " + ".join(f"m{i}" for i in range(len(qlits)))
    return f"""
        WITH sims AS (
            SELECT CAST(FLOOR(vec_id / {_COLBERT_GROUP}) AS BIGINT) AS doc_grp,
                   {sims}
            FROM embeddings),
        maxes AS (
            SELECT doc_grp, COUNT(*) AS n_vecs, {maxes}
            FROM sims GROUP BY 1)
        SELECT doc_grp, n_vecs, ROUND({total}, 6) AS maxsim_score
        FROM maxes
        ORDER BY maxsim_score DESC, doc_grp
        LIMIT 10
    """


def q_knn_filtered(spark, sf_dir):
    """Filtered vector search (J8 ∘ P1 — the composition every RAG metadata
    filter needs): kNN restricted to docs passing a metadata predicate. The
    predicate lands in the documents scan (PushedFilters) and the left-semi
    join prunes vectors BEFORE any distance is computed; at scale the same
    plan partition-prunes a doc-partitioned embedding table."""
    keep = (
        _read(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 300))
        .select("doc_id")
    )
    e = _read(spark, sf_dir, "embeddings")
    cand = e.join(keep, e.vec_id == keep.doc_id, "left_semi")
    return (
        cand.withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), QVEC), 6))
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "dist")
    )


def q_knn_top10(spark, sf_dir):
    """J8 brute-force kNN for one literal query vector."""
    e = _read(spark, sf_dir, "embeddings")
    return (
        e.withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), QVEC), 6))
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", "dist")
    )


# ---------------------------------------------------------------------------
# geo battery
# ---------------------------------------------------------------------------


def q_doc_cells(spark, sf_dir):
    """Vectorized grid encode + parent (UDF-free, whole-stage codegen)."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    out = d.withColumn("cell9", cell_encode_col(lat, lng, 9))
    return out.withColumn("cell4", cell_parent_col(F.col("cell9"), 9, 4))


def q_tile_histogram(spark, sf_dir):
    """Raster tile materialization: per-cell point counts (payload checked in
    pytest; count grid is the oracle-able projection)."""
    from raptor_service_spark.operators.tiles import rasterize_points_to_tiles

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return rasterize_points_to_tiles(pts, res=4, grid=8).select("cell", "n_points")


def q_pip_docs(spark, sf_dir):
    """J10 point-in-polygon join vs two fixed polygons."""
    from raptor_service_spark.operators.pip_join import point_in_polygon_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    polys = {"tri": np.array(TRI), "rect": np.array(RECT)}
    return point_in_polygon_join(pts, polys, res=6).select("qid", "doc_id")


# donut polygon: convex outer ring + convex hole strictly inside it
# (vertices off the 0.05-lattice so no doc sits exactly on an edge)
_DONUT_OUTER = [(-25.13, 80.17), (-25.13, 140.33), (35.27, 140.33), (35.27, 80.17)]
_DONUT_HOLE = [(-5.61, 100.23), (-5.61, 120.41), (15.87, 120.41), (15.87, 100.23)]


def q_pip_donut(spark, sf_dir):
    """Point-in-polygon-with-HOLES join (multi-ring GIS semantics): docs
    inside the outer ring but not in the hole. Pure composition of the
    existing filter-refine PIP operator — inner membership via the
    broadcast polyfill join, hole removal via a LEFT ANTI join on the
    hole's (much smaller) membership. No new kernel; the anti join carries
    O(hole hits) rows."""
    from raptor_service_spark.operators.pip_join import point_in_polygon_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    outer = point_in_polygon_join(pts, {"donut": np.array(_DONUT_OUTER)}, res=6)
    hole = point_in_polygon_join(pts, {"donut": np.array(_DONUT_HOLE)}, res=6)
    return outer.join(
        hole.select("qid", "doc_id"), ["qid", "doc_id"], "left_anti"
    ).select("qid", "doc_id")


def _pip_donut_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    inside_o = _convex_inside_expr(_DONUT_OUTER, lat, lng)
    inside_h = _convex_inside_expr(_DONUT_HOLE, lat, lng)
    return (
        f"SELECT 'donut' AS qid, doc_id FROM documents "
        f"WHERE {inside_o} AND NOT {inside_h}"
    )


_RADIUS_CENTERS = {"c1": (30.0, -80.0), "c2": (-20.0, 140.0), "c3": (50.0, 10.0)}
_RADIUS = 25.0


def q_radius_join_docs(spark, sf_dir):
    """Within-radius distance join (filter-refine, interior-cell fast
    accept, codegen sqrt refine — operators/pip_join.radius_join) of driver
    docs against three literal centers."""
    from raptor_service_spark.operators.pip_join import radius_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return radius_join(pts, _RADIUS_CENTERS, _RADIUS, res=5).select(
        "qid", "doc_id", "dist"
    )


def _radius_join_docs_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    vals = ", ".join(
        f"('{q}', {la}, {ln})" for q, (la, ln) in _RADIUS_CENTERS.items()
    )
    d = f"sqrt(({lat} - clat) * ({lat} - clat) + ({lng} - clng) * ({lng} - clng))"
    return f"""
        SELECT qid, doc_id, ROUND({d}, 6) AS dist
        FROM documents CROSS JOIN (VALUES {vals}) q(qid, clat, clng)
        WHERE ROUND({d}, 6) <= {_RADIUS}
    """


_GEOKNN_QUERIES = {"g1": (48.8, 2.3), "g2": (-33.8, 151.2), "g3": (40.7, -74.0)}


def q_geo_knn_docs(spark, sf_dir):
    """Spatial kNN join (operators/geo_knn.py): exact 5 nearest driver docs
    per literal query point, candidates pruned to occupancy-planned k-rings,
    refine is codegen sqrt + per-qid window top-k."""
    from raptor_service_spark.operators.geo_knn import geo_knn_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return geo_knn_join(
        pts, _GEOKNN_QUERIES, k=5, res=6, payload_cols=("doc_id",)
    )


def _geo_knn_docs_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    vals = ", ".join(
        f"('{q}', {la}, {ln})" for q, (la, ln) in _GEOKNN_QUERIES.items()
    )
    d = f"sqrt(({lat} - clat) * ({lat} - clat) + ({lng} - clng) * ({lng} - clng))"
    return f"""
        SELECT qid, doc_id, ROUND({d}, 6) AS dist
        FROM documents CROSS JOIN (VALUES {vals}) q(qid, clat, clng)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY ROUND({d}, 6), doc_id) <= 5
    """


def _doc_boxes(spark, sf_dir) -> DataFrame:
    """Deterministic per-doc boxes: center at the doc's geo anchor, half
    sizes 1..5 deg lat / 1..7 deg lng from the id (same arithmetic in SQL)."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    hlat = (F.pmod(F.col("doc_id"), F.lit(5)) + F.lit(1)).cast("double")
    hlng = (F.pmod(F.floor(F.col("doc_id") / F.lit(5)), F.lit(7)) + F.lit(1)).cast(
        "double"
    )
    return d.select(
        "doc_id",
        (lat - hlat).alias("lat_lo"),
        (lat + hlat).alias("lat_hi"),
        (lng - hlng).alias("lng_lo"),
        (lng + hlng).alias("lng_hi"),
    )


def q_bbox_overlap_docs(spark, sf_dir):
    """Rectangle spatial self-join (operators/bbox_join.py): overlapping
    doc-box pairs via grid cover-cell equi-join; duplicates suppressed at
    the canonical intersection-corner cell (no distinct shuffle)."""
    from raptor_service_spark.operators.bbox_join import bbox_self_join

    return bbox_self_join(_doc_boxes(spark, sf_dir), res=5, id_col="doc_id")


def _bbox_overlap_docs_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    return f"""
        WITH b AS (
            SELECT doc_id,
                   {lat} - h1 AS lat_lo, {lat} + h1 AS lat_hi,
                   {lng} - h2 AS lng_lo, {lng} + h2 AS lng_hi
            FROM (SELECT doc_id,
                         CAST(doc_id % 5 + 1 AS DOUBLE) AS h1,
                         CAST(CAST(FLOOR(doc_id / 5) AS BIGINT) % 7 + 1
                              AS DOUBLE) AS h2
                  FROM documents))
        SELECT a.doc_id AS id_a, c.doc_id AS id_b
        FROM b a JOIN b c
          ON a.doc_id < c.doc_id
         AND a.lat_lo <= c.lat_hi AND c.lat_lo <= a.lat_hi
         AND a.lng_lo <= c.lng_hi AND c.lng_lo <= a.lng_hi
    """


def q_compact_cover(spark, sf_dir):
    """Minimal multi-res cover of the occupied res-4 doc cells
    (operators/compact_cells.py — H3 `compact` analog): complete sibling
    quads promoted to parents down to res 1; each ladder step is one agg +
    one anti-join on the occupied-cell set."""
    from raptor_service_spark.operators.compact_cells import compact_cells

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    cells = d.select(cell_encode_col(lat, lng, 4).alias("cell"))
    return compact_cells(cells, res=4, min_res=1)


def _compact_cover_sql() -> str:
    from raptor_service_spark.operators.compact_cells import compact_cells_sql

    lat, lng = _latlng_sql("doc_id")
    base = f"SELECT {cell_encode_sql(lat, lng, 4)} AS cell FROM documents"
    return compact_cells_sql(base, res=4, min_res=1)


def q_cover_uncompact_roundtrip(spark, sf_dir):
    """compact → uncompact == identity (operators/compact_cells.py): the
    compacted multi-res cover of the occupied res-4 cells, expanded back to
    res 4 with the closed-form block expansion. The oracle is simply the
    DISTINCT res-4 cell set — a strong semantic check of both directions."""
    from raptor_service_spark.operators.compact_cells import (
        compact_cells,
        uncompact_cells_col,
    )

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    cells = d.select(cell_encode_col(lat, lng, 4).alias("cell"))
    cover = compact_cells(cells, res=4, min_res=1)
    return cover.select(
        F.explode(uncompact_cells_col("cell", 4)).alias("cell")
    )


def _cover_uncompact_roundtrip_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    cell4 = cell_encode_sql(lat, lng, 4)
    return f"SELECT DISTINCT {cell4} AS cell FROM documents"


_EPS_DEG = 8.0


def q_doc_pairs_within(spark, sf_dir):
    """ε-distance self-join (operators/pip_join.within_distance_join): doc
    pairs within 8° (the driver corpus is ~6° sparse, so this is
    non-vacuous); 3x3 neighbor-cell equi-join at the auto-picked res finds
    each pair exactly once (no dedup shuffle)."""
    from raptor_service_spark.operators.pip_join import within_distance_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    out = within_distance_join(pts, pts, eps=_EPS_DEG)
    return (
        out.filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            "dist",
        )
    )


def _doc_pairs_within_sql() -> str:
    lat_a, lng_a = _latlng_sql("a.doc_id")
    lat_b, lng_b = _latlng_sql("b.doc_id")
    d = (
        f"sqrt(({lat_a} - {lat_b}) * ({lat_a} - {lat_b}) + "
        f"({lng_a} - {lng_b}) * ({lng_a} - {lng_b}))"
    )
    return f"""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, ROUND({d}, 6) AS dist
        FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        WHERE ROUND({d}, 6) <= {_EPS_DEG}
    """


def q_pip_zonal_stats(spark, sf_dir):
    """Zonal statistics: per query polygon, count + token stats of the docs
    inside (PIP join → one partial+final agg)."""
    from raptor_service_spark.functions.text import token_count
    from raptor_service_spark.operators.pip_join import point_in_polygon_join

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    polys = {"tri": np.array(TRI), "rect": np.array(RECT)}
    hits = point_in_polygon_join(pts, polys, res=6)
    return hits.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
    )


def _pip_zonal_stats_sql() -> str:
    from raptor_service_spark.functions.text import token_count_sql

    tri_sql = _convex_pip_sql("tri", TRI)
    rect_sql = _convex_pip_sql("rect", RECT)
    return f"""
        SELECT qid, COUNT(*) AS n_docs,
               CAST(SUM({token_count_sql("d.text")}) AS BIGINT) AS total_tokens,
               MIN(doc_id) AS min_doc
        FROM ({tri_sql} UNION ALL {rect_sql}) h
        JOIN documents d USING (doc_id)
        GROUP BY 1
    """


_BM25_TERMS = ["vector", "merge", "stream"]
_RRF_K = 60


def q_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval (operators/bm25.py): relational postings →
    broadcast idf → codegen score → top-10. The keyword leg the reference
    lacks (vector-only retrieve, retrieval_service.py:96-141)."""
    from raptor_service_spark.operators.bm25 import bm25_topk

    return bm25_topk(
        _read(spark, sf_dir, "documents").select("doc_id", "text"),
        _BM25_TERMS,
        10,
    )


def q_hybrid_retrieval(spark, sf_dir):
    """Hybrid keyword+vector retrieval with reciprocal-rank fusion:
    RRF(d) = Σ_legs 1/(60 + rank_leg(d)) over the BM25 top-50 and the
    cosine top-50 — the standard fusion that needs no score calibration;
    pure rank arithmetic, so exactly reproducible in SQL."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import bm25_topk

    kw = bm25_topk(
        _read(spark, sf_dir, "documents").select("doc_id", "text"),
        _BM25_TERMS,
        50,
    ).withColumn(
        "kw_rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ),
    )
    e = _read(spark, sf_dir, "embeddings")
    vec = (
        e.withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), QVEC), 6))
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(50)
        .withColumn(
            "vec_rank",
            F.row_number().over(
                Window.orderBy(F.col("dist").asc(), F.col("vec_id").asc())
            ),
        )
        .select(F.col("vec_id").alias("doc_id"), "vec_rank")
    )
    fused = (
        kw.select("doc_id", "kw_rank")
        .join(vec, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("kw_rank")), F.lit(0.0))
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0)
                ),
                9,
            ),
        )
    )
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", "rrf")
    )


def _bm25_sql_entry(k: int) -> str:
    from raptor_service_spark.operators.bm25 import bm25_sql

    return bm25_sql("documents", _BM25_TERMS, k)


def _hybrid_retrieval_sql() -> str:
    return f"""
        WITH kw AS (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                   AS kw_rank
            FROM ({_bm25_sql_entry(50)})),
        vec AS (
            SELECT vec_id AS doc_id,
                   ROW_NUMBER() OVER (ORDER BY dist ASC, vec_id ASC) AS vec_rank
            FROM (SELECT vec_id,
                         ROUND(1.0 - list_cosine_similarity(
                             list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             {QVEC_SQL}), 6) AS dist
                  FROM embeddings ORDER BY dist ASC, vec_id ASC LIMIT 50))
        SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({_RRF_K} + kw_rank), 0.0)
                     + COALESCE(1.0 / ({_RRF_K} + vec_rank), 0.0), 9) AS rrf
        FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
        ORDER BY rrf DESC, doc_id ASC LIMIT 10
    """


def q_user_travel(spark, sf_dir):
    """Trajectory length per user: events ordered by (ts, event_id), each
    event anchored via the hash geo anchor of its event_id, consecutive-leg
    haversine summed — one window shuffle + one agg."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.distance import haversine_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng).filter(
        F.col("user_id") < 50
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    leg = haversine_col(
        F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
    )
    return (
        pts.withColumn("leg_km", leg)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("leg_km"), 6).alias("travel_km"),
        )
    )


def _user_travel_sql() -> str:
    from raptor_service_spark.geo.distance import haversine_sql

    lat, lng = _latlng_sql("event_id")
    d = haversine_sql("plat", "plng", "lat", "lng")
    return f"""
        WITH p AS (
            SELECT user_id, {lat} AS lat, {lng} AS lng,
                   LAG({lat}) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS plat,
                   LAG({lng}) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS plng
            FROM events WHERE user_id < 50)
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM({d}), 6) AS travel_km
        FROM p GROUP BY 1
    """


def q_geo_clusters(spark, sf_dir):
    """DBSCAN-style spatial clustering (ε-graph connected components):
    pairs from within_distance_join (each pair found once, no dedup pass)
    → min-label propagation (operators/dedup.dedup_components, one shuffle
    per round) → per-doc cluster label + cluster size. The geo twin of the
    near-dup component labeling."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.dedup import dedup_components
    from raptor_service_spark.operators.pip_join import within_distance_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    pairs = (
        within_distance_join(pts, pts, eps=_EPS_DEG)
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
    )
    comp = dedup_components(pairs)
    out = d.join(comp, d["doc_id"] == comp["id"], "left").select(
        "doc_id", F.coalesce("comp", "doc_id").alias("cluster")
    )
    return out.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    )


def _geo_clusters_sql() -> str:
    pairs = f"SELECT id_a AS doc_a, id_b AS doc_b FROM ({_doc_pairs_within_sql()})"
    return f"""
        WITH RECURSIVE pr AS ({pairs}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pr
            UNION SELECT doc_b, doc_a FROM pr
        ),
        reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        ),
        comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        sel AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster
                FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
        SELECT doc_id, cluster,
               COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
        FROM sel
    """


_DBSCAN_EPS, _DBSCAN_MINPTS = 12.0, 4


def q_geo_dbscan(spark, sf_dir):
    """Full DBSCAN semantics (extends q_geo_clusters' minPts=1 case): core
    points have ≥ minPts neighbors within ε (self included), clusters are
    components of the core-core ε-graph, border points adopt the smallest
    cluster label among their core neighbors, the rest is noise. All inputs
    come from ONE ε-join pass (within_distance_join — each ordered pair
    found exactly once); labeling is the O(edges) min-label loop."""
    from raptor_service_spark.operators.dedup import dedup_components
    from raptor_service_spark.operators.pip_join import within_distance_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    pairs = within_distance_join(pts, pts, eps=_DBSCAN_EPS).select(
        F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
    )
    # neighbor counts INCLUDE the self-pair the ε-join emits at dist 0
    core = (
        pairs.groupBy("a")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _DBSCAN_MINPTS)
        .select(F.col("a").alias("id"))
    )
    core_edges = (
        pairs.filter(F.col("a") < F.col("b"))
        .join(core.select(F.col("id").alias("a")), "a")
        .join(core.select(F.col("id").alias("b")), "b")
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    )
    comp = dedup_components(core_edges)
    core_lab = core.join(comp, "id", "left").select(
        "id", F.coalesce("comp", "id").alias("cluster")
    )
    border_lab = (
        pairs.join(core_lab.withColumnRenamed("id", "b"), "b")
        .join(core.withColumnRenamed("id", "a"), "a", "left_anti")
        .groupBy("a")
        .agg(F.min("cluster").alias("cluster"))
    )
    out = (
        d.join(core_lab.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .withColumnRenamed("cluster", "core_cluster")
        .join(border_lab.withColumnRenamed("a", "doc_id"), "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.when(F.col("core_cluster").isNotNull(), F.lit("core"))
        .when(F.col("cluster").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise"))
        .alias("role"),
        F.coalesce("core_cluster", "cluster").alias("cluster"),
    )


def _geo_dbscan_sql() -> str:
    lat_a, lng_a = _latlng_sql("a.doc_id")
    lat_b, lng_b = _latlng_sql("b.doc_id")
    dd = (
        f"sqrt(({lat_a} - {lat_b}) * ({lat_a} - {lat_b}) + "
        f"({lng_a} - {lng_b}) * ({lng_a} - {lng_b}))"
    )
    return f"""
        WITH RECURSIVE pr AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM documents a JOIN documents b ON a.doc_id < b.doc_id
            WHERE ROUND({dd}, 6) <= {_DBSCAN_EPS!r}),
        sym AS (SELECT id_a AS a, id_b AS b FROM pr
                UNION ALL SELECT id_b, id_a FROM pr),
        cnt AS (SELECT d.doc_id, 1 + COUNT(s.b) AS n
                FROM documents d LEFT JOIN sym s ON s.a = d.doc_id
                GROUP BY 1),
        core AS (SELECT doc_id FROM cnt WHERE n >= {_DBSCAN_MINPTS}),
        ce AS (SELECT a, b FROM sym
               WHERE a IN (SELECT doc_id FROM core)
                 AND b IN (SELECT doc_id FROM core)),
        reach(id, r) AS (
            SELECT a, a FROM ce
            UNION
            SELECT e.a, reach.r FROM ce e JOIN reach ON e.b = reach.id),
        comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
        core_lab AS (SELECT c.doc_id AS id, COALESCE(m.comp, c.doc_id) AS cluster
                     FROM core c LEFT JOIN comp m ON m.id = c.doc_id),
        border_lab AS (
            SELECT s.a AS id, MIN(cl.cluster) AS cluster
            FROM sym s JOIN core_lab cl ON s.b = cl.id
            WHERE s.a NOT IN (SELECT doc_id FROM core)
            GROUP BY 1)
        SELECT d.doc_id,
               CASE WHEN c.cluster IS NOT NULL THEN 'core'
                    WHEN b.cluster IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               COALESCE(c.cluster, b.cluster) AS cluster
        FROM documents d
        LEFT JOIN core_lab c ON c.id = d.doc_id
        LEFT JOIN border_lab b ON b.id = d.doc_id
    """


def q_geofence_transitions(spark, sf_dir):
    """Geofence enter/exit detection: per-user event stream, membership in
    the TRI fence as the codegen convex cross-product boolean (the same
    generated string runs in the oracle), transitions via lag over the
    (ts, event_id) order — one window shuffle."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = (
        ev.filter(F.col("user_id") < 30)
        .withColumn("lat", lat)
        .withColumn("lng", lng)
        .withColumn("inside", F.expr(_convex_inside_expr(TRI, "lat", "lng")))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = pts.withColumn("prev", F.lag("inside").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("prev") != F.col("inside"))
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("at"),
        F.when(F.col("inside"), F.lit("enter")).otherwise(F.lit("exit")).alias(
            "direction"
        ),
    )


def _geofence_transitions_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    inside = _convex_inside_expr(TRI, lat, lng)
    return f"""
        WITH m AS (
            SELECT user_id, event_id, ts, {inside} AS inside,
                   LAG({inside}) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
            FROM events WHERE user_id < 30)
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS at,
               CASE WHEN inside THEN 'enter' ELSE 'exit' END AS direction
        FROM m WHERE prev IS NOT NULL AND prev != inside
    """


def _gravity_xy_sql() -> tuple[str, str]:
    """Shared (x, y) regressor strings over columns (cell_from, cell_to,
    n_trips, pop_o, pop_d): x = ln(centroid distance) via 0.5·ln(dist²)
    (no sqrt), y = ln(flow / (pop_o·pop_d)). One string, both engines."""
    from raptor_service_spark.geo.grid import cell_center_sql

    olat, olng = cell_center_sql("cell_from", _GRAV_RES)
    dlat, dlng = cell_center_sql("cell_to", _GRAV_RES)
    d2 = (
        f"(({olat} - {dlat}) * ({olat} - {dlat})"
        f" + ({olng} - {dlng}) * ({olng} - {dlng}))"
    )
    x = f"(0.5 * LN({d2}))"
    y = "LN(CAST(n_trips AS DOUBLE) / (pop_o * pop_d))"
    return x, y


_GRAV_RES = 3
# OLS closed form over the ROUNDED sums (columns n, sx, sy, sxy, sxx) —
# identical string in both engines, so the ratio is deterministic.
_GRAV_BETA = "((n * sxy - sx * sy) / (n * sxx - sx * sx))"


def q_gravity_fit(spark, sf_dir):
    """Gravity-model calibration over the OD flow matrix: OLS fit of
    ln(flow / (pop_o·pop_d)) on ln(centroid distance) — the distance-decay
    exponent β (and intercept α) of trip distribution, the classic spatial-
    interaction model. Points are touched twice (OD window, occupancy agg);
    everything after operates on the O(OD pairs) table: two broadcast pop
    joins, a codegen ln-projection, ONE scalar agg; the four float sums are
    rounded to 9 dp before the closed-form ratio (cross-engine protocol)."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, _GRAV_RES))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flows = (
        pts.withColumn("prev_cell", F.lag("cell").over(w))
        .filter(F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell")))
        .groupBy(F.col("prev_cell").alias("cell_from"), F.col("cell").alias("cell_to"))
        .agg(F.count(F.lit(1)).alias("n_trips"))
    )
    pop = pts.groupBy("cell").agg(F.count(F.lit(1)).alias("pop"))
    j = (
        flows.join(
            F.broadcast(pop.select(F.col("cell").alias("cell_from"), F.col("pop").alias("pop_o"))),
            "cell_from",
        )
        .join(
            F.broadcast(pop.select(F.col("cell").alias("cell_to"), F.col("pop").alias("pop_d"))),
            "cell_to",
        )
    )
    xs, ys = _gravity_xy_sql()
    xy = j.select(F.expr(xs).alias("lx"), F.expr(ys).alias("ly"))
    sums = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("lx"), 9).alias("sx"),
        F.round(F.sum("ly"), 9).alias("sy"),
        F.round(F.sum(F.col("lx") * F.col("ly")), 9).alias("sxy"),
        F.round(F.sum(F.col("lx") * F.col("lx")), 9).alias("sxx"),
    )
    return sums.select(
        F.col("n").alias("n_pairs"),
        F.round(F.expr(_GRAV_BETA), 6).alias("beta"),
        F.round(F.expr(f"(sy - {_GRAV_BETA} * sx) / n"), 6).alias("alpha"),
    )


def _gravity_fit_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _GRAV_RES)
    xs, ys = _gravity_xy_sql()
    return f"""
        WITH p AS (SELECT user_id, ts, event_id, {cell} AS cell FROM events),
        f AS (SELECT cell, LAG(cell) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_cell
              FROM p),
        fl AS (SELECT prev_cell AS cell_from, cell AS cell_to,
                      COUNT(*) AS n_trips
               FROM f WHERE prev_cell IS NOT NULL AND prev_cell != cell
               GROUP BY 1, 2),
        pop AS (SELECT cell, COUNT(*) AS pop FROM p GROUP BY 1),
        j AS (SELECT fl.cell_from, fl.cell_to, fl.n_trips,
                     po.pop AS pop_o, pd.pop AS pop_d
              FROM fl JOIN pop po ON po.cell = fl.cell_from
                      JOIN pop pd ON pd.cell = fl.cell_to),
        xy AS (SELECT {xs} AS lx, {ys} AS ly FROM j),
        s AS (SELECT COUNT(*) AS n,
                     ROUND(SUM(lx), 9) AS sx, ROUND(SUM(ly), 9) AS sy,
                     ROUND(SUM(lx * ly), 9) AS sxy,
                     ROUND(SUM(lx * lx), 9) AS sxx
              FROM xy)
        SELECT n AS n_pairs,
               ROUND({_GRAV_BETA}, 6) AS beta,
               ROUND((sy - {_GRAV_BETA} * sx) / n, 6) AS alpha
        FROM s
    """


def q_event_funnel(spark, sf_dir):
    """Sequential conversion funnel (view → click AFTER that view →
    purchase AFTER that click), the product-analytics staple: per user,
    earliest view; earliest click strictly after it; earliest purchase
    strictly after that — strictness on the (ts, event_id) pair so ties
    are deterministic. All-integer one-row output (exact oracle compare).
    Scale shape: three map-side-combinable per-user min-aggs + two
    user-keyed joins of O(users) tables — events are scanned once per
    stage with the stage's type filter pushed to parquet."""
    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    tsl = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select("user_id", "event_type", tsl.alias("us"), "event_id")
    views = (
        base.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.struct("us", "event_id")).alias("v"))
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(
            (F.col("us") > F.col("v.us"))
            | ((F.col("us") == F.col("v.us")) & (F.col("event_id") > F.col("v.event_id")))
        )
        .groupBy("user_id")
        .agg(F.min(F.struct("us", "event_id")).alias("c"))
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(
            (F.col("us") > F.col("c.us"))
            | ((F.col("us") == F.col("c.us")) & (F.col("event_id") > F.col("c.event_id")))
        )
        .groupBy("user_id")
        .agg(F.lit(1).alias("one"))
    )
    n_users = base.select("user_id").distinct().count()
    return (
        views.agg(F.count(F.lit(1)).alias("n_view"))
        .join(F.broadcast(clicks.agg(F.count(F.lit(1)).alias("n_click_after_view"))))
        .join(
            F.broadcast(
                purchases.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
            )
        )
        .select(
            F.lit(n_users).cast("long").alias("n_users"),
            "n_view",
            "n_click_after_view",
            "n_purchase_after_click",
        )
    )


def _event_funnel_sql() -> str:
    strict = lambda a, b: f"({a}.us > {b}.us OR ({a}.us = {b}.us AND {a}.event_id > {b}.event_id))"
    return f"""
        WITH base AS (SELECT user_id, event_type,
                             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
                      FROM events),
        v AS (SELECT user_id, MIN({{'us': us, 'event_id': event_id}}) AS m FROM base
              WHERE event_type = 'view' GROUP BY 1),
        vv AS (SELECT user_id, m.us AS us, m.event_id AS event_id FROM v),
        c AS (SELECT b.user_id, MIN({{'us': b.us, 'event_id': b.event_id}}) AS m
              FROM base b JOIN vv ON b.user_id = vv.user_id
              WHERE b.event_type = 'click' AND {strict('b', 'vv')}
              GROUP BY 1),
        cc AS (SELECT user_id, m.us AS us, m.event_id AS event_id FROM c),
        p AS (SELECT b.user_id
              FROM base b JOIN cc ON b.user_id = cc.user_id
              WHERE b.event_type = 'purchase' AND {strict('b', 'cc')}
              GROUP BY 1)
        SELECT (SELECT COUNT(DISTINCT user_id) FROM base) AS n_users,
               (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_click_after_view,
               (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """


def q_funnel_stages(spark, sf_dir):
    """Per-user funnel stage-entry events (the row-level form behind
    `event_funnel`'s counts, and the batch twin of the STREAMING funnel
    state machine — `streaming/funnel.py`, exact stream==batch parity in
    tests/test_streaming_funnel.py)."""
    from raptor_service_spark.streaming.funnel import funnel_stages_batch

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    return funnel_stages_batch(ev)


def _funnel_stages_sql() -> str:
    strict = lambda a: f"(b.us > {a}.us OR (b.us = {a}.us AND b.event_id > {a}.event_id))"
    return f"""
        WITH base AS (SELECT user_id, event_type,
                             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
                      FROM events),
        v AS (SELECT user_id, MIN({{'us': us, 'event_id': event_id}}) AS m
              FROM base WHERE event_type = 'view' GROUP BY 1),
        vv AS (SELECT user_id, m.us AS us, m.event_id AS event_id FROM v),
        c AS (SELECT b.user_id, MIN({{'us': b.us, 'event_id': b.event_id}}) AS m
              FROM base b JOIN vv ON b.user_id = vv.user_id
              WHERE b.event_type = 'click' AND {strict('vv')}
              GROUP BY 1),
        cc AS (SELECT user_id, m.us AS us, m.event_id AS event_id FROM c),
        p AS (SELECT b.user_id, MIN({{'us': b.us, 'event_id': b.event_id}}) AS m
              FROM base b JOIN cc ON b.user_id = cc.user_id
              WHERE b.event_type = 'purchase' AND {strict('cc')}
              GROUP BY 1)
        SELECT user_id, 1 AS stage, event_id FROM vv
        UNION ALL
        SELECT user_id, 2 AS stage, m.event_id FROM c
        UNION ALL
        SELECT user_id, 3 AS stage, m.event_id FROM p
    """


def q_user_od_flows(spark, sf_dir):
    """Origin-destination flow matrix: per-user consecutive event pairs,
    each end encoded to its res-3 grid cell, cross-cell transitions counted
    per (cell_from, cell_to). One window shuffle + one partial+final agg —
    the standard trajectory-analytics rollup over the tile grid."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 3))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flows = pts.withColumn("prev_cell", F.lag("cell").over(w)).filter(
        F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell"))
    )
    return (
        flows.groupBy(
            F.col("prev_cell").alias("cell_from"), F.col("cell").alias("cell_to")
        )
        .agg(F.count(F.lit(1)).alias("n_trips"))
        .filter(F.col("n_trips") >= 3)
    )


def _user_od_flows_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH p AS (
            SELECT user_id, ts, event_id, {cell} AS cell FROM events),
        f AS (
            SELECT cell,
                   LAG(cell) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_cell
            FROM p)
        SELECT prev_cell AS cell_from, cell AS cell_to, COUNT(*) AS n_trips
        FROM f WHERE prev_cell IS NOT NULL AND prev_cell != cell
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """


def q_user_stay_points(spark, sf_dir):
    """Stay-point (dwell) detection: per-user runs of consecutive events in
    the same res-2 cell, gaps-and-islands run ids from a windowed running
    sum of cell-change flags, dwell = microsecond span of the run. Two
    window passes over one user-partitioned shuffle + one agg."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 2))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("cell").over(w).isNull() | (F.lag("cell").over(w) != F.col("cell")),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        pts.withColumn("run", run)
        .groupBy("user_id", "run", "cell")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            .cast("long")
            .alias("dwell_us"),
        )
        .filter(F.col("n_events") >= 2)
        .drop("run")
    )


def _user_stay_points_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 2)
    return f"""
        WITH p AS (
            SELECT user_id, ts, event_id, {cell} AS cell FROM events),
        c AS (
            SELECT *, CASE WHEN LAG(cell) OVER w IS NULL
                            OR LAG(cell) OVER w != cell
                      THEN 1 ELSE 0 END AS chg
            FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        r AS (
            SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS BIGINT) AS run
            FROM c)
        SELECT user_id, cell, COUNT(*) AS n_events,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS dwell_us
        FROM r GROUP BY user_id, run, cell HAVING COUNT(*) >= 2
    """


def q_traj_cells(spark, sf_dir):
    """Trajectory rasterization (vector→raster): each consecutive event
    pair per user is a segment; 9 evenly-spaced interpolation points along
    it are cell-encoded at res 3 and the per-user covered-cell set is the
    distinct union. Window lag + JVM sequence explode + distinct — the
    cheap deterministic supercover used to burn GPS tracks onto the tile
    grid. Interpolation arithmetic is the identical double formula in both
    engines."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = (
        ev.filter(F.col("user_id") < 20)
        .withColumn("lat", lat)
        .withColumn("lng", lng)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        pts.withColumn("plat", F.lag("lat").over(w))
        .withColumn("plng", F.lag("lng").over(w))
        .filter(F.col("plat").isNotNull())
    )
    t = F.col("i") / F.lit(8.0)
    ilat = F.col("plat") + (F.col("lat") - F.col("plat")) * t
    ilng = F.col("plng") + (F.col("lng") - F.col("plng")) * t
    return (
        seg.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(8))))
        .select("user_id", cell_encode_col(ilat, ilng, 3).alias("cell"))
        .distinct()
    )


def _traj_cells_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    ilat = "(plat + (lat - plat) * (i / 8.0))"
    ilng = "(plng + (lng - plng) * (i / 8.0))"
    cell = cell_encode_sql(ilat, ilng, 3)
    return f"""
        WITH p AS (
            SELECT user_id, ts, event_id, {lat} AS lat, {lng} AS lng
            FROM events WHERE user_id < 20),
        s AS (
            SELECT user_id, lat, lng,
                   LAG(lat) OVER w AS plat, LAG(lng) OVER w AS plng
            FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT DISTINCT user_id, {cell} AS cell
        FROM s CROSS JOIN generate_series(0, 8) g(i)
        WHERE plat IS NOT NULL
    """


def q_hot_cells(spark, sf_dir):
    """Hot-cell skew diagnostic over the SKEWED synthetic corpus (datagen
    hotspots): res-4 occupancy counts, global share, top 20. The agg output
    is tiny (≤ occupied cells), so the global-total window runs on the
    aggregated table — one partial+final agg plus an O(cells) window. This
    is the planner input for salting factors (operators/tree.py skew
    handling)."""
    from pyspark.sql import Window

    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.geo.grid import cell_encode_col

    docs = gen_documents_df(spark, 300, seed=62).select("doc_id", "lat", "lng")
    counts = docs.groupBy(
        cell_encode_col(F.col("lat"), F.col("lng"), 4).alias("cell")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        counts.withColumn("share", F.round(F.col("n_docs") / total, 6))
        .orderBy(F.col("n_docs").desc(), F.col("cell").asc())
        .limit(20)
    )


def _hot_cells_sql(n_docs: int = 300, seed: int = 62) -> str:
    """VALUES oracle from the deterministic local generator (same rows as
    the distributed mapInPandas path), independent SQL recount."""
    from raptor_service_spark.datagen import _gen_doc
    from raptor_service_spark.geo.grid import cell_encode_sql

    # CAST AS DOUBLE: a bare 16-digit repr parses as DECIMAL in DuckDB,
    # which can overflow DECIMAL(18) in (lat + 90.0) and would in any case
    # use exact-decimal arithmetic where Spark uses IEEE doubles
    vals = ", ".join(
        f"(CAST({_gen_doc(seed, i)['lat']!r} AS DOUBLE),"
        f" CAST({_gen_doc(seed, i)['lng']!r} AS DOUBLE))"
        for i in range(n_docs)
    )
    cell = cell_encode_sql("lat", "lng", 4)
    return f"""
        WITH d AS (SELECT * FROM (VALUES {vals}) t(lat, lng)),
        c AS (
            SELECT {cell} AS cell, COUNT(*) AS n_docs FROM d GROUP BY 1)
        SELECT cell, n_docs,
               ROUND(n_docs / (SELECT CAST(SUM(n_docs) AS DOUBLE) FROM c), 6)
                   AS share
        FROM c ORDER BY n_docs DESC, cell ASC LIMIT 20
    """


def q_media_caption_attach(spark, sf_dir):
    """Interleaved caption attachment: each media span is paired with the
    nearest PRECEDING text span of the same document (offset order) — the
    alignment step a multimodal training pipeline runs before captioned
    image export. One doc-partitioned window over the exploded spans; the
    span-sequence invariant (kind, text, media_ref, order) guarantees the
    window order is the authoring order."""
    from pyspark.sql import Window

    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans

    docs = gen_documents_df(spark, 30, seed=61)
    sp = explode_spans(docs).select("doc_id", "kind", "text", "media_ref", "offset")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cap = F.last(
        F.when(F.col("media_ref") == "", F.col("text")), ignorenulls=True
    ).over(w)
    return (
        sp.withColumn("caption", cap)
        .filter(F.col("media_ref") != "")
        .select(
            "doc_id",
            "media_ref",
            "kind",
            F.coalesce("caption", F.lit("")).alias("caption"),
        )
    )


def _media_caption_attach_sql(n_docs: int = 30, seed: int = 61) -> str:
    """VALUES oracle: full interleaved span rows from the deterministic
    generator; DuckDB recomputes the preceding-text window independently."""
    from raptor_service_spark.datagen import _gen_doc

    vals = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        for s in d["spans"]:
            vals.append(
                f"('{d['doc_id']}', '{s['kind']}', '{s['text']}', "
                f"'{s['media_ref']}', {s['offset']})"
            )
    return (
        "WITH s AS (SELECT * FROM (VALUES "
        + ", ".join(vals)
        + ') t(doc_id, kind, text, media_ref, "offset")), '
        "m AS (SELECT doc_id, kind, media_ref, "
        "LAST_VALUE(CASE WHEN media_ref = '' THEN text END IGNORE NULLS) "
        'OVER (PARTITION BY doc_id ORDER BY "offset" '
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS caption FROM s) "
        "SELECT doc_id, media_ref, kind, COALESCE(caption, '') AS caption "
        "FROM m WHERE media_ref != ''"
    )


def q_tile_topk_docs(spark, sf_dir):
    """Per-tile ranking (tile-server op): top-3 documents by quality score
    inside every occupied res-2 cell. WindowGroupLimit pushes the rank<=3
    cut below the exchange, so the shuffle carries at most 3 rows per cell
    per map task — the per-group top-k the reference's per-cluster summary
    selection needs at serving time."""
    from pyspark.sql import Window

    from raptor_service_spark.functions.text import quality_score
    from raptor_service_spark.geo.grid import cell_encode_col

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    lat, lng = _latlng_cols(F.col("doc_id"))
    scored = d.withColumn("cell", cell_encode_col(lat, lng, 2)).withColumn(
        "quality", quality_score(F.col("text"))
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("cell", F.col("rk").cast("long").alias("rk"), "doc_id", "quality")
    )


def _tile_topk_docs_sql() -> str:
    from raptor_service_spark.functions.text import quality_score_sql
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, 2)
    qual = quality_score_sql("text")
    return f"""
        WITH s AS (
            SELECT doc_id, {cell} AS cell, {qual} AS quality FROM documents)
        SELECT cell,
               CAST(ROW_NUMBER() OVER (PARTITION BY cell
                                       ORDER BY quality DESC, doc_id ASC)
                    AS BIGINT) AS rk,
               doc_id, quality
        FROM s QUALIFY rk <= 3
    """


def q_cell_coverage_gap(spark, sf_dir):
    """Coverage-gap audit: res-4 cells that receive event traffic but hold
    no indexed documents — the tile tree's 'demand without supply' set.
    Two map-side-combined distincts + one EXCEPT on O(occupied cells)."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat_e, lng_e = _latlng_cols(F.col("event_id"))
    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat_d, lng_d = _latlng_cols(F.col("doc_id"))
    ecells = ev.select(cell_encode_col(lat_e, lng_e, 4).alias("cell")).distinct()
    dcells = d.select(cell_encode_col(lat_d, lng_d, 4).alias("cell")).distinct()
    return ecells.subtract(dcells)


def _cell_coverage_gap_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat_e, lng_e = _latlng_sql("event_id")
    lat_d, lng_d = _latlng_sql("doc_id")
    ce = cell_encode_sql(lat_e, lng_e, 4)
    cd = cell_encode_sql(lat_d, lng_d, 4)
    return f"""
        SELECT DISTINCT {ce} AS cell FROM events
        EXCEPT
        SELECT DISTINCT {cd} AS cell FROM documents
    """


def q_trending_cells(spark, sf_dir):
    """Spatio-temporal change detection: per-cell hourly event counts, then
    hour-over-hour delta via a cell-partitioned lag window; top 15 rises.
    Two shuffles — the (cell, hour) partial+final count and the per-cell
    window — both on aggregated (occupied cell × hour) rows, never points."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    hourly = (
        ev.withColumn("cell", cell_encode_col(lat, lng, 3))
        .groupBy("cell", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cell").orderBy("hr")
    return (
        hourly.withColumn("delta", F.col("n") - F.lag("n").over(w))
        .filter(F.col("delta").isNotNull())
        .orderBy(F.col("delta").desc(), F.col("cell").asc(), F.col("hr").asc())
        .limit(15)
        .select(
            "cell",
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n",
            "delta",
        )
    )


def _trending_cells_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH h AS (
            SELECT {cell} AS cell, date_trunc('hour', ts) AS hr,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2),
        d AS (
            SELECT cell, hr, n,
                   n - LAG(n) OVER (PARTITION BY cell ORDER BY hr) AS delta
            FROM h)
        SELECT cell, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour, n, delta
        FROM d WHERE delta IS NOT NULL
        ORDER BY delta DESC, cell ASC, hr ASC LIMIT 15
    """


_IDW_CENTERS = {"c1": (12.0, 30.0), "c2": (-25.0, -100.0), "c3": (48.0, 110.0)}
_IDW_RADIUS = 25.0


def q_idw_interpolation(spark, sf_dir):
    """Inverse-distance-weighted field estimate at query centers: the
    filter-refine radius join (broadcast candidate cells, codegen sqrt)
    feeds a per-center weighted mean of event values — the spatial
    interpolation a tile-level heat layer needs. One partial+final agg
    after a shuffle-free join."""
    from raptor_service_spark.operators.pip_join import radius_join

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    hits = radius_join(pts, _IDW_CENTERS, _IDW_RADIUS, res=4)
    wgt = F.lit(1.0) / (F.col("dist") + F.lit(0.001))
    return hits.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum(F.col("value") * wgt) / F.sum(wgt), 6).alias("idw_value"),
    )


def _idw_interpolation_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    centers = ", ".join(
        f"('{q}', {la!r}, {ln!r})" for q, (la, ln) in _IDW_CENTERS.items()
    )
    return f"""
        WITH p AS (
            SELECT value, {lat} AS lat, {lng} AS lng FROM events),
        c AS (SELECT * FROM (VALUES {centers}) t(qid, clat, clng)),
        h AS (
            SELECT qid, value,
                   ROUND(SQRT((lat - clat) * (lat - clat)
                              + (lng - clng) * (lng - clng)), 6) AS dist
            FROM p CROSS JOIN c)
        SELECT qid, COUNT(*) AS n_points,
               ROUND(SUM(value * (1.0 / (dist + 0.001)))
                     / SUM(1.0 / (dist + 0.001)), 6) AS idw_value
        FROM h WHERE dist <= {_IDW_RADIUS!r} GROUP BY qid
    """


def q_cell_boundaries(spark, sf_dir):
    """Raster morphology over the doc-occupancy raster: boundary vs interior
    cells of the occupied region at res 4 (operators/neighborhood.py
    boundary_cells — ring explode + self-join on the occupied-CELL table,
    one point shuffle total)."""
    from raptor_service_spark.operators.neighborhood import boundary_cells

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return boundary_cells(pts, res=4)


def _cell_boundaries_sql() -> str:
    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat, lng = _latlng_sql("doc_id")
    cell4 = cell_encode_sql(lat, lng, 4)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dy in range(-1, 2)
        for dx in range(-1, 2)
        if (dx, dy) != (0, 0)
    )
    nbr = kring_neighbor_sql("c.cell", 4, "o.dx", "o.dy")
    return f"""
        WITH c AS (SELECT {cell4} AS cell, COUNT(*) AS n_points
                   FROM documents GROUP BY 1),
        p AS (SELECT c.cell, c.n_points, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL)
        SELECT p.cell, MAX(p.n_points) AS n_points,
               COUNT(c2.cell) AS n_occ_nbrs,
               COUNT(c2.cell) < 8 AS is_boundary
        FROM p LEFT JOIN c c2 ON p.nbr = c2.cell
        GROUP BY 1
    """


_HEAT_REF_US = 1706659200 * 1_000_000  # 2024-01-31 00:00:00 UTC
_HEAT_TAU_US = 7 * 86400 * 1_000_000.0  # 7-day decay constant


def q_cell_heat_decay(spark, sf_dir):
    """Time-decayed heat layer: per res-3 cell, sum of exp(-age/τ) event
    weights relative to a fixed reference instant — the freshness-weighted
    occupancy a live tile heatmap serves. One partial+final agg; the decay
    weight is codegen arithmetic (exp parity with DuckDB is the same IEEE
    contract the haversine queries already rely on)."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    age_us = F.lit(_HEAT_REF_US) - F.unix_micros(F.col("ts").cast("timestamp"))
    w = F.exp(-age_us / F.lit(_HEAT_TAU_US))
    return (
        ev.withColumn("cell", cell_encode_col(lat, lng, 3))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(w), 6).alias("heat"),
        )
    )


def _cell_heat_decay_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    w = f"EXP(-({_HEAT_REF_US} - epoch_us(ts)) / {_HEAT_TAU_US!r})"
    return f"""
        SELECT {cell} AS cell, COUNT(*) AS n_events,
               ROUND(SUM({w}), 6) AS heat
        FROM events GROUP BY 1
    """


def q_cell_top_terms(spark, sf_dir):
    """Geo-text crossover: per res-2 cell, top-3 terms across the documents
    anchored there — the regional vocabulary summary a dataset card shows
    per map region. Explode → two-phase (cell, term) count → per-cell
    window top-k (WindowGroupLimit cuts below the exchange)."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    lat, lng = _latlng_cols(F.col("doc_id"))
    terms = d.withColumn("cell", cell_encode_col(lat, lng, 2)).select(
        "cell", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    counts = (
        terms.filter(F.col("term") != "")
        .groupBy("cell", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    win = Window.partitionBy("cell").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 3)
        .select("cell", "term", "n", F.col("rk").cast("long").alias("rk"))
    )


def _cell_top_terms_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, 2)
    return f"""
        WITH t AS (
            SELECT {cell} AS cell,
                   UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS term
            FROM documents),
        c AS (
            SELECT cell, term, COUNT(*) AS n FROM t
            WHERE term != '' GROUP BY 1, 2)
        SELECT cell, term, n,
               CAST(ROW_NUMBER() OVER (PARTITION BY cell
                                       ORDER BY n DESC, term ASC) AS BIGINT) AS rk
        FROM c QUALIFY rk <= 3
    """


_ASSIGN_EPS = 5.0


def q_nearest_doc_assignment(spark, sf_dir):
    """Bounded-ε nearest-neighbor assignment (visit attribution): each event
    is attributed to its closest document within ε degrees — the table×table
    k=1 spatial join. The ε-bound is what makes it scale: candidates come
    from the one-shuffle cell/ring equi-join (each pair found exactly once),
    then a per-event WindowGroupLimit keeps the minimum. Events with no doc
    within ε drop out (same rule in the oracle)."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.pip_join import within_distance_join

    ev = _read(spark, sf_dir, "events").select("event_id").filter(
        F.col("event_id") < 2000
    )
    lat_e, lng_e = _latlng_cols(F.col("event_id"))
    epts = ev.withColumn("lat", lat_e).withColumn("lng", lng_e)
    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat_d, lng_d = _latlng_cols(F.col("doc_id"))
    dpts = d.withColumn("lat", lat_d).withColumn("lng", lng_d)
    pairs = within_distance_join(epts, dpts, eps=_ASSIGN_EPS).select(
        F.col("l.event_id").alias("event_id"),
        F.col("r.doc_id").alias("doc_id"),
        "dist",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("dist").asc(), F.col("doc_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_id", "doc_id", "dist")
    )


def _nearest_doc_assignment_sql() -> str:
    lat_e, lng_e = _latlng_sql("e.event_id")
    lat_d, lng_d = _latlng_sql("d.doc_id")
    dist = (
        f"ROUND(SQRT(({lat_e} - {lat_d}) * ({lat_e} - {lat_d})"
        f" + ({lng_e} - {lng_d}) * ({lng_e} - {lng_d})), 6)"
    )
    return f"""
        SELECT e.event_id, d.doc_id, {dist} AS dist
        FROM events e CROSS JOIN documents d
        WHERE e.event_id < 2000 AND {dist} <= {_ASSIGN_EPS!r}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.event_id
                                   ORDER BY dist ASC, d.doc_id ASC) = 1
    """


def q_user_home_cells(spark, sf_dir):
    """Per-user home cell: the res-3 cell where the user has the most
    events (ties broken by cell id) — the anchor-location primitive of
    trajectory analytics. Two-phase (user, cell) count, then a per-user
    WindowGroupLimit argmax."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    counts = (
        ev.withColumn("cell", cell_encode_col(lat, lng, 3))
        .groupBy("user_id", "cell")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("cell").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "cell", "n_events")
    )


def _user_home_cells_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH c AS (
            SELECT user_id, {cell} AS cell, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2)
        SELECT user_id, cell, n_events
        FROM c QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY n_events DESC, cell ASC) = 1
    """


def q_events_value_histogram(spark, sf_dir):
    """Equi-width histogram of event values (width 25, clamped to 20 bins):
    one codegen bin Project + one partial+final agg — the profiling scan a
    pipeline runs before choosing quantization/binning constants."""
    ev = _read(spark, sf_dir, "events").select("value")
    bin_ = F.least(F.lit(19), F.floor(F.col("value") / F.lit(25.0))).cast("long")
    return (
        ev.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


def _events_value_histogram_sql() -> str:
    return """
        SELECT LEAST(19, CAST(FLOOR(value / 25.0) AS BIGINT)) AS bin,
               COUNT(*) AS n,
               ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
        FROM events GROUP BY 1
    """


def q_cell_value_median(spark, sf_dir):
    """Exact per-cell median of event values (res 3): Spark's exact
    `percentile` aggregate (sort-based within the group) vs DuckDB
    `median` — both interpolate the even-count midpoint. Group cardinality
    is O(occupied cells), so the sort cost is per-cell, never global."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    lat, lng = _latlng_cols(F.col("event_id"))
    return (
        ev.withColumn("cell", cell_encode_col(lat, lng, 3))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        )
    )


def _cell_value_median_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        SELECT {cell} AS cell, COUNT(*) AS n_events,
               ROUND(MEDIAN(value), 6) AS median_value
        FROM events GROUP BY 1
    """


def q_media_density_per_cell(spark, sf_dir):
    """Interleaved × spatial crossover: per res-2 cell, the media-span
    share of the synthetic corpus anchored there — the modality-mix map a
    multimodal training pipeline balances against. Span counting is a JVM
    higher-order filter on the spans array (no explode, no Python); one
    partial+final agg."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.geo.grid import cell_encode_col

    docs = gen_documents_df(spark, 200, seed=63)
    per_doc = docs.select(
        cell_encode_col(F.col("lat"), F.col("lng"), 2).alias("cell"),
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", lambda s: s["media_ref"] != "")).alias("n_media"),
    )
    return per_doc.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.sum("n_media").cast("long").alias("n_media"),
        F.round(F.sum("n_media") / F.sum("n_spans"), 6).alias("media_frac"),
    )


def _media_density_per_cell_sql(n_docs: int = 200, seed: int = 63) -> str:
    """VALUES oracle: per-doc ground truth from the deterministic generator
    (lat, lng, span counts); DuckDB recomputes the spatial aggregation
    independently."""
    from raptor_service_spark.datagen import _gen_doc
    from raptor_service_spark.geo.grid import cell_encode_sql

    vals = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        n_media = sum(1 for s in d["spans"] if s["media_ref"])
        vals.append(
            f"(CAST({d['lat']!r} AS DOUBLE), CAST({d['lng']!r} AS DOUBLE), "
            f"{len(d['spans'])}, {n_media})"
        )
    cell = cell_encode_sql("lat", "lng", 2)
    return f"""
        WITH d AS (SELECT * FROM (VALUES {', '.join(vals)})
                   t(lat, lng, n_spans, n_media))
        SELECT {cell} AS cell, COUNT(*) AS n_docs,
               CAST(SUM(n_spans) AS BIGINT) AS n_spans,
               CAST(SUM(n_media) AS BIGINT) AS n_media,
               ROUND(SUM(n_media) / CAST(SUM(n_spans) AS DOUBLE), 6) AS media_frac
        FROM d GROUP BY 1
    """


def q_user_gyration(spark, sf_dir):
    """Radius of gyration per user (mobility dispersion): RMS distance from
    the user's own centroid, in the algebraic one-pass form
    sqrt(E[lat²]−E[lat]² + E[lng²]−E[lng]²) — ONE partial+final agg, no
    second pass over the events. Degree-space euclid (the repo's planar
    convention); greatest(0, ·) guards the tiny negative residue float
    cancellation can leave."""
    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    var = (
        F.avg(F.col("lat") * F.col("lat"))
        - F.avg("lat") * F.avg("lat")
        + F.avg(F.col("lng") * F.col("lng"))
        - F.avg("lng") * F.avg("lng")
    )
    return pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), var)), 6).alias("gyration_deg"),
    )


def _user_gyration_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH p AS (SELECT user_id, {lat} AS lat, {lng} AS lng FROM events)
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SQRT(GREATEST(0.0,
                   AVG(lat * lat) - AVG(lat) * AVG(lat)
                   + AVG(lng * lng) - AVG(lng) * AVG(lng))), 6) AS gyration_deg
        FROM p GROUP BY 1
    """


def q_user_cell_entropy(spark, sf_dir):
    """Exploration diversity per user: Shannon entropy of the user's res-3
    cell-visit distribution, −Σ p·ln p. Two-phase (user, cell) count, then
    a per-user agg that reuses the same partitioning — the standard
    mobility-predictability feature."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    counts = (
        ev.withColumn("cell", cell_encode_col(lat, lng, 3))
        .groupBy("user_id", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n")
    ent = -F.sum(F.col("sn") * F.log(F.col("sn")))
    return (
        counts.groupBy("user_id")
        .agg(
            tot.cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            (F.sum(F.col("n") * F.log("n")) / tot).alias("_snlogn"),
        )
        .select(
            "user_id",
            "n_events",
            "n_cells",
            F.round(
                F.log(F.col("n_events")) - F.col("_snlogn"), 6
            ).alias("entropy"),
        )
    )


def _user_cell_entropy_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH c AS (
            SELECT user_id, {cell} AS cell, COUNT(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
               COUNT(*) AS n_cells,
               ROUND(LN(CAST(SUM(n) AS BIGINT))
                     - SUM(n * LN(n)) / SUM(n), 6) AS entropy
        FROM c GROUP BY 1
    """


def q_doc_scrub(spark, sf_dir):
    """Training-data scrub stage (functions/text.py redact_pii +
    strip_markup): PII is injected deterministically per doc (the driver
    corpus has none), then redacted and markup-stripped; the output is the
    scrubbed-text fingerprint + per-token redaction counts — all chained
    codegen regexp_replace, no UDF."""
    from raptor_service_spark.functions.text import redact_pii, strip_markup

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = F.concat(
        F.format_string(
            "Contact u%d@mail.example.com or +1 555-000-1234 ref 123-45-6789 "
            "at 10.0.0.%d <b>now</b> &amp; done. ",
            F.col("doc_id"),
            F.pmod(F.col("doc_id"), F.lit(200)),
        ),
        F.col("text"),
    )
    red = strip_markup(redact_pii(dirty))

    def _count(tok: str):
        return (F.size(F.split(red, f"\\[{tok}\\]")) - 1).cast("long")

    return d.select(
        "doc_id",
        F.md5(red).alias("scrub_fp"),
        _count("EMAIL").alias("n_emails"),
        _count("PHONE").alias("n_phones"),
        _count("ID").alias("n_ids"),
        _count("IP").alias("n_ips"),
    )


def _doc_scrub_sql() -> str:
    from raptor_service_spark.functions.text import redact_pii_sql, strip_markup_sql

    dirty = (
        "('Contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com or "
        "+1 555-000-1234 ref 123-45-6789 at 10.0.0.' || "
        "CAST(doc_id % 200 AS VARCHAR) || ' <b>now</b> &amp; done. ' || text)"
    )
    red = strip_markup_sql(redact_pii_sql(dirty))
    counts = ", ".join(
        f"CAST(len(string_split({red}, '[{tok}]')) - 1 AS BIGINT) AS n_{name}"
        for tok, name in (
            ("EMAIL", "emails"),
            ("PHONE", "phones"),
            ("ID", "ids"),
            ("IP", "ips"),
        )
    )
    return f"SELECT doc_id, md5({red}) AS scrub_fp, {counts} FROM documents"


def q_events_tile_hourly(spark, sf_dir):
    """Batch twin of the streaming tile-count aggregation (streaming/geo.py
    windowed_tile_counts — ONE definition for both modes; stream/batch
    parity is pytest-asserted in tests/test_streaming_geo.py). Points =
    events with the user's hash geo anchor."""
    from raptor_service_spark.streaming.geo import windowed_tile_counts

    ev = _read(spark, sf_dir, "events").select("ts", "user_id")
    lat, lng = _latlng_cols(F.col("user_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    out = windowed_tile_counts(pts, res=4, window="1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "cell",
        "n_points",
    )


def _events_tile_hourly_sql() -> str:
    lat, lng = _latlng_sql("user_id")
    cell4 = cell_encode_sql(lat, lng, 4)
    return f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               {cell4} AS cell, COUNT(*) AS n_points
        FROM events GROUP BY 1, 2
    """


def _tri_param_cols():
    """Five 1..4-degree params from the id (same arithmetic in SQL)."""
    d = F.col("doc_id")
    return [
        (F.pmod(F.floor(d / F.lit(4**i)), F.lit(4)) + F.lit(1)).cast("double")
        for i in range(5)
    ]


def q_tri_overlap_docs(spark, sf_dir):
    """Exact polygon∩polygon join (operators/polygon_join.py): per-doc CCW
    triangles (apex-up construction guarantees winding), bbox cover-cell
    candidates, codegen SAT refine — same generated expression as the SQL
    oracle."""
    from raptor_service_spark.operators.polygon_join import triangle_self_join

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    a, b, c, e, g = _tri_param_cols()
    tris = d.select(
        "doc_id",
        lng.alias("x1"),
        (lat + a).alias("y1"),
        (lng - b).alias("x2"),
        (lat - c).alias("y2"),
        (lng + e).alias("x3"),
        (lat - g).alias("y3"),
    )
    return triangle_self_join(tris, res=5, id_col="doc_id")


def _tri_overlap_docs_sql() -> str:
    from raptor_service_spark.operators.polygon_join import sat_intersect_sql

    lat, lng = _latlng_sql("doc_id")
    params = [
        f"(CAST(FLOOR(doc_id / {4**i}) AS BIGINT) % 4 + 1)" for i in range(5)
    ]
    a, b, c, e, g = params
    verts = (
        f"{lng} AS x1, {lat} + {a} AS y1, "
        f"{lng} - {b} AS x2, {lat} - {c} AS y2, "
        f"{lng} + {e} AS x3, {lat} - {g} AS y3"
    )
    ren_a = ", ".join(f"x{i} AS a_x{i}, y{i} AS a_y{i}" for i in (1, 2, 3))
    ren_b = ", ".join(f"x{i} AS b_x{i}, y{i} AS b_y{i}" for i in (1, 2, 3))
    return f"""
        WITH t AS (SELECT doc_id, {verts} FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM (SELECT doc_id, {ren_a} FROM t) a
        JOIN (SELECT doc_id, {ren_b} FROM t) b
          ON a.doc_id < b.doc_id AND {sat_intersect_sql("a", "b")}
    """


_KM_CENTERS = {"k1": (48.8, 2.3), "k2": (-33.8, 151.2), "k3": (75.0, -40.0)}
_KM_RADIUS = 900.0


def q_radius_km_docs(spark, sf_dir):
    """Great-circle within-900-km join (operators/pip_join.radius_join_km):
    wrap-aware bbox candidate cells + codegen haversine refine; k3 sits at
    75°N where the 1/cos lng widening matters."""
    from raptor_service_spark.operators.pip_join import radius_join_km

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return radius_join_km(pts, _KM_CENTERS, _KM_RADIUS, res=5).select(
        "qid", "doc_id", "dist_km"
    )


def _radius_km_docs_sql() -> str:
    from raptor_service_spark.geo.distance import haversine_sql

    lat, lng = _latlng_sql("doc_id")
    vals = ", ".join(
        f"('{q}', {la}, {ln})" for q, (la, ln) in _KM_CENTERS.items()
    )
    d = haversine_sql(lat, lng, "clat", "clng")
    return f"""
        SELECT qid, doc_id, ROUND({d}, 6) AS dist_km
        FROM documents CROSS JOIN (VALUES {vals}) q(qid, clat, clng)
        WHERE ROUND({d}, 6) <= {_KM_RADIUS}
    """


def q_tile_pyramid(spark, sf_dir):
    """Multi-resolution rollup (operators/tiles.tile_pyramid): counts at res
    6/4/2 from ONE scan + ONE shuffle (exploded parent ladder, partial agg
    map-side)."""
    from raptor_service_spark.operators.tiles import tile_pyramid

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return tile_pyramid(pts, resolutions=(6, 4, 2))


def _tile_pyramid_sql() -> str:
    from raptor_service_spark.geo.grid import RES_MULTIPLIER

    lat, lng = _latlng_sql("doc_id")
    cell6 = cell_encode_sql(lat, lng, 6)
    p4 = cell_parent_sql(cell6, 6, 4)
    p2 = cell_parent_sql(cell6, 6, 2)
    return f"""
        SELECT CAST(FLOOR(cell / {RES_MULTIPLIER}) AS BIGINT) AS res,
               cell, COUNT(*) AS n_points
        FROM (SELECT unnest([{cell6}, {p4}, {p2}]) AS cell FROM documents)
        GROUP BY 1, 2
    """


def q_density_gradient(spark, sf_dir):
    """Map-algebra focal statistics: Sobel gradient of the res-5 document
    density raster — per occupied cell, (gx, gy, |∇|²) of the count
    surface, all-integer so the oracle compare is EXACT. The weighted ring
    is a literal struct array exploded JVM-side; one point shuffle, then
    O(occupied cells) join + agg. See `operators/neighborhood.py`."""
    from raptor_service_spark.operators.neighborhood import focal_gradient

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return focal_gradient(pts, res=5)


def _density_gradient_sql() -> str:
    from raptor_service_spark.operators.neighborhood import focal_gradient_sql

    lat, lng = _latlng_sql("doc_id")
    cell5 = cell_encode_sql(lat, lng, 5)
    return focal_gradient_sql("documents", cell5, res=5)


def q_clark_evans(spark, sf_dir):
    """Clark-Evans nearest-neighbor index over document points: R =
    observed mean NN distance / expected (0.5/√λ) under complete spatial
    randomness, λ = n over the point bbox area — R < 1 clustered, ≈ 1
    random, → 2.15 maximally dispersed. NN distances come from the exact
    ring-doubling self-NN join (`operators/geo_knn.py:nn_distances`);
    the statistic is two tiny global aggs. The brute-force oracle proves
    the self-NN join exact."""
    from raptor_service_spark.operators.geo_knn import nn_distances

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(F.col("doc_id").alias("pid"), lng.alias("px"), lat.alias("py"))
    nn = nn_distances(pts, res=5)
    bbox = pts.agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("px") - F.min("px")).alias("w"),
        (F.max("py") - F.min("py")).alias("h"),
    )
    stats = nn.agg(F.round(F.avg("d1"), 9).alias("md9"))
    return (
        stats.join(F.broadcast(bbox))
        .select(
            F.col("n").alias("n_points"),
            F.round("md9", 6).alias("mean_nnd"),
            F.round(
                F.col("md9") * F.lit(2.0) * F.sqrt(F.col("n") / (F.col("w") * F.col("h"))),
                6,
            ).alias("r_index"),
        )
    )


def _clark_evans_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    return f"""
        WITH p AS (SELECT doc_id AS pid, {lng} AS px, {lat} AS py FROM documents),
        d AS (SELECT a.pid,
                     MIN(SQRT((a.px - b.px) * (a.px - b.px)
                            + (a.py - b.py) * (a.py - b.py))) AS d1
              FROM p a JOIN p b ON a.pid != b.pid
              GROUP BY 1),
        s AS (SELECT ROUND(AVG(d1), 9) AS md9 FROM d),
        bb AS (SELECT COUNT(*) AS n, MAX(px) - MIN(px) AS w,
                      MAX(py) - MIN(py) AS h FROM p)
        SELECT bb.n AS n_points,
               ROUND(s.md9, 6) AS mean_nnd,
               ROUND(s.md9 * 2.0 * SQRT(bb.n / (bb.w * bb.h)), 6) AS r_index
        FROM s CROSS JOIN bb
    """


def q_cell_kring_smooth(spark, sf_dir):
    """K-ring neighborhood smoothing (operators/neighborhood.py): per
    occupied res-6 cell, own count + 1-ring summed count + occupied-ring
    size. Ring expansion is a literal (dx, dy) array exploded JVM-side."""
    from raptor_service_spark.operators.neighborhood import kring_smooth

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    return kring_smooth(pts, res=6, k=1)


def _cell_kring_smooth_sql() -> str:
    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat, lng = _latlng_sql("doc_id")
    cell6 = cell_encode_sql(lat, lng, 6)
    offs = ", ".join(
        f"({dx}, {dy})" for dy in range(-1, 2) for dx in range(-1, 2)
    )
    nbr = kring_neighbor_sql("c.cell", 6, "o.dx", "o.dy")
    return f"""
        WITH c AS (SELECT {cell6} AS cell, COUNT(*) AS n_points
                   FROM documents GROUP BY 1),
        p AS (SELECT c.cell, c.n_points, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL)
        SELECT p.cell, MAX(p.n_points) AS n_points,
               CAST(SUM(COALESCE(c2.n_points, 0)) AS BIGINT) AS ring_points,
               COUNT(c2.cell) AS n_ring_cells
        FROM p LEFT JOIN c c2 ON p.nbr = c2.cell
        GROUP BY 1
    """


def q_spans_explode(spark, sf_dir):
    """Span pipeline on driver docs: split to 10-word spans, explode with
    ordered idx + chunk ids (S9/T4 invariant; chunk_service.py:27 id scheme)."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim("text"), r"\s+")
    n = F.size(w)
    spans = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / 10).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(w, i * 10 + 1, 10)),
    )
    out = d.select("doc_id", F.posexplode(spans).alias("idx", "span_text"))
    return out.select(
        "doc_id",
        F.col("idx").cast("long").alias("idx"),
        "span_text",
        F.least(F.lit(10), F.size(F.split("span_text", r"\s+"))).cast("long").alias("token_cnt"),
        F.format_string("%d::c%d", F.col("doc_id"), F.col("idx")).alias("chunk_id"),
    )


# ---------------------------------------------------------------------------
# engine-native queries (non-SQL-expressible: rows-only driver check; deep
# semantics covered by pytest oracles in tests/)
# ---------------------------------------------------------------------------


def q_simhash_pairs(spark, sf_dir):
    return simhash_pairs(_docs_with_dups(spark, sf_dir), max_hamming=3).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


QVEC3 = np.round(gen_query_vectors(seed=101, n=1, dim=64)[0], 6)


def q_grid_knn_ann(spark, sf_dir):
    """Grid-compacted ANN (J8 scale path). Oracle-checked: grid_knn_sql
    replicates bucket cells AND the occupancy ring planner in DuckDB, so the
    approximate path's exact candidate rule + output is verified (recall vs
    brute force is additionally pytest-asserted in tests/test_ann_index.py)."""
    from raptor_service_spark.operators.knn import grid_knn, with_projected_cell

    e = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("v")
    )
    cellified = with_projected_cell(e, res=4)
    return grid_knn(cellified, QVEC3, 10, res=4).select(
        "id", F.round("dist", 6).alias("dist")
    )


QVEC_IVF = np.round(gen_query_vectors(seed=103, n=1, dim=64)[0], 6)
QVEC_IVF_SQL = "[" + ", ".join(f"{x:.6f}" for x in QVEC_IVF) + "]"

_IVF_LISTS, _IVF_ITERS, _IVF_NPROBE = 16, 3, 6


def q_ivf_knn_ann(spark, sf_dir):
    """IVF centroid-quantizer ANN with the DETERMINISTIC spherical k-means
    trainer (operators/ivf.py:train_ivf_centroids_det — smallest-id init,
    9-dp per-round rounding, argmax tie -> smaller cid): train 3 Lloyd
    rounds, assign every vector its list, probe the 6 of 16 lists nearest
    the query, exact cosine top-10 inside the probed lists only. Fully
    oracle-checked (round-3: the training rounds unroll as MATERIALIZED
    CTEs in DuckDB — the kmeans_geo technique); the sampled k-means++
    production trainer stays covered by ivf_knn_exact + tests/test_ivf.py.
    Reference semantics: pgvector HNSW ANN probe
    (/root/reference/db/models/embeddings.py:38-43)."""
    from raptor_service_spark.operators.ivf import (
        best_list_col,
        normalize_vec_col,
        train_ivf_centroids_det,
    )

    e = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
    )
    # Materialize the 9-dp-normalized vectors ONCE: the argmax expression
    # references the vector 16×dim times, and without the checkpoint
    # Catalyst's CollapseProject would inline the normalize subtree into
    # every reference (measured: this dominated the query's wall time).
    vnd = e.withColumn("vn", normalize_vec_col(F.col("v"))).localCheckpoint(
        eager=True
    )
    cents = train_ivf_centroids_det(
        vnd, n_lists=_IVF_LISTS, iters=_IVF_ITERS, vec_col="vn", pre_normalized=True
    )
    # probe ranking in-engine (O(k) rows) so the 9-dp round + tie-break is
    # the same HALF_UP arithmetic as the oracle, never Python's banker's
    cdf = spark.createDataFrame(
        [(cid, cv) for cid, cv in cents], "cid int, cv array<double>"
    )
    from raptor_service_spark.operators.ivf import _dot_lit_col

    probe = [
        r.cid
        for r in cdf.select(
            "cid", F.round(_dot_lit_col("cv", list(QVEC_IVF)), 9).alias("qd")
        )
        .orderBy(F.col("qd").desc(), "cid")
        .limit(_IVF_NPROBE)
        .collect()
    ]
    cand = vnd.withColumn("cid", best_list_col("vn", cents)).filter(
        F.col("cid").isin([int(p) for p in probe])
    )
    return (
        cand.withColumn("dist", F.round(cosine_dist_col(F.col("v"), QVEC_IVF), 6))
        .orderBy(F.col("dist").asc(), F.col("id").asc())
        .limit(10)
        .select("id", "dist")
    )


def _ivf_knn_ann_sql() -> str:
    """DuckDB twin of q_ivf_knn_ann: the 3 deterministic training rounds
    unrolled as MATERIALIZED CTEs (the kmeans_geo recipe), same 9-dp
    rounding at every stage, ROW_NUMBER (dot DESC, cid) assignment."""
    rounds = []
    for t in range(1, _IVF_ITERS + 1):
        rounds.append(
            f"""a{t} AS (
            SELECT id, vn, cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY id
                       ORDER BY ROUND(list_dot_product(vn, cv), 9) DESC, cid
                   ) AS rn
            FROM pv CROSS JOIN c{t - 1}),
        m{t} AS (
            SELECT cid, i, ROUND(AVG(vn[i]), 9) AS mv
            FROM a{t} CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) ix
            WHERE rn = 1 GROUP BY 1, 2),
        c{t} AS MATERIALIZED (
            SELECT cid,
                   CASE WHEN nrm = 0 THEN l
                        ELSE list_transform(l, x -> ROUND(x / nrm, 9)) END AS cv
            FROM (SELECT cid, list(mv ORDER BY i) AS l,
                         ROUND(SQRT(SUM(mv * mv)), 9) AS nrm
                  FROM m{t} GROUP BY cid))"""
        )
    chain = ",\n        ".join(rounds)
    last = f"c{_IVF_ITERS}"
    return f"""
        WITH p AS MATERIALIZED (
            SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        pv AS MATERIALIZED (
            SELECT id,
                   CASE WHEN nrm = 0 THEN v
                        ELSE list_transform(v, x -> ROUND(x / nrm, 9)) END AS vn
            FROM (SELECT id, v,
                         ROUND(SQRT(list_dot_product(v, v)), 9) AS nrm
                  FROM p)),
        c0 AS (
            SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid, vn AS cv
            FROM (SELECT id, vn FROM pv ORDER BY id LIMIT {_IVF_LISTS})),
        {chain},
        probe AS (
            SELECT cid FROM {last}
            ORDER BY ROUND(list_dot_product(cv, {QVEC_IVF_SQL}), 9) DESC, cid
            LIMIT {_IVF_NPROBE}),
        af AS (
            SELECT id, cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY id
                       ORDER BY ROUND(list_dot_product(vn, cv), 9) DESC, cid
                   ) AS rn
            FROM pv CROSS JOIN {last})
        SELECT p.id,
               ROUND(1.0 - list_cosine_similarity(p.v, {QVEC_IVF_SQL}), 6) AS dist
        FROM p
        JOIN af ON af.id = p.id AND af.rn = 1
        WHERE af.cid IN (SELECT cid FROM probe)
        ORDER BY dist ASC, p.id ASC
        LIMIT 10
    """


def q_ivf_knn_exact(spark, sf_dir):
    """IVF ANN probed exhaustively (nprobe = n_lists): the probe set covers
    every list, so the result is the EXACT cosine top-10 (the property
    tests/test_ivf.py asserts) — which puts the full IVF dataflow (sampled
    spherical k-means train, mapInPandas list assignment, probe filter,
    in-list refine) under the driver's value-checked oracle gate, with a
    plain brute-force SQL twin. 6-dp round + numeric-id tie-break per the
    repo's cross-engine float convention."""
    from raptor_service_spark.operators.ivf import (
        assign_ivf_lists,
        train_ivf_centroids,
    )

    e = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    cents = train_ivf_centroids(e, n_lists=16, sample_n=2000, iters=5)
    listed = assign_ivf_lists(e, cents)
    probe = list(range(len(cents)))  # exhaustive: nprobe = n_lists
    cand = listed.filter(F.col("list_id").isin(probe))
    return (
        cand.withColumn("dist", F.round(cosine_dist_col(F.col("v"), QVEC_IVF), 6))
        .orderBy(F.col("dist").asc(), F.col("id").asc())
        .limit(10)
        .select("id", "dist")
    )


def q_tree_build_synthetic(spark, sf_dir):
    """Full tile-tree build on the synthetic interleaved corpus (R1-R4).
    Round-3: fully oracle-checked — the deterministic generator's per-doc
    (lat, lng, n_spans) rows are emitted as a golden VALUES table (the
    span_roundtrip_check technique) and the ladder arithmetic (leaf cells →
    distinct-parent coarsening → stall guard → root promotion, reference
    build_tree_service.py:85-161,363-365) replays in DuckDB. n_docs is
    fixed (sf-independent) so the oracle SQL is one static string."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.functions.vector import embed_spans
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.tree import TreeParams, build_tile_tree

    docs = gen_documents_df(spark, _SYNTREE_N, seed=_SYNTREE_SEED)
    spans = embed_spans(explode_spans(docs), dim=32)
    tree = build_tile_tree(spans, TreeParams(res_ladder=(6, 3, 0), dim=32))
    return (
        tree.nodes.groupBy(F.col("level").cast("long").alias("level"), "kind")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("level", "kind")
    )


_SYNTREE_N, _SYNTREE_SEED = 100, 55


def _tree_build_synthetic_sql() -> str:
    """Golden-VALUES oracle: the generator's (lat, lng, n_spans) per doc —
    every span inherits its doc's location, so the leaf cell ladder is pure
    DuckDB arithmetic over 100 VALUES rows (same guard/promotion structure
    as _tree_build_docs_sql)."""
    from raptor_service_spark.datagen import _gen_doc

    vals = []
    for i in range(_SYNTREE_N):
        d = _gen_doc(_SYNTREE_SEED, i)
        vals.append(f"({d['lat']!r}, {d['lng']!r}, {len(d['spans'])})")
    c6 = cell_encode_sql("lat", "lng", 6)
    c3_of_c6 = cell_parent_sql("c6", 6, 3)
    c0_of_c3 = cell_parent_sql("c3", 3, 0)
    return f"""
        WITH d(lat, lng, n_spans) AS (VALUES {', '.join(vals)}),
        leaves AS (SELECT {c6} AS c6, n_spans FROM d),
        l1cells AS (SELECT DISTINCT {c3_of_c6} AS c3 FROM leaves),
        g AS (
            SELECT (SELECT CAST(SUM(n_spans) AS BIGINT) FROM leaves) AS n_leaves,
                   (SELECT COUNT(*) FROM l1cells) AS n1,
                   (SELECT COUNT(DISTINCT {c0_of_c3}) FROM l1cells) AS n2
        ),
        eff AS (
            SELECT n_leaves,
                   CASE WHEN n1 >= n_leaves THEN 1 ELSE n1 END AS eff1,
                   CASE WHEN n2 >= (CASE WHEN n1 >= n_leaves THEN 1 ELSE n1 END)
                        THEN 1 ELSE n2 END AS eff2
            FROM g
        )
        SELECT CAST(0 AS BIGINT) AS level, 'leaf' AS kind,
               CAST(n_leaves AS BIGINT) AS n_nodes FROM eff
        UNION ALL
        SELECT 1, CASE WHEN eff1 = 1 THEN 'root' ELSE 'summary' END,
               CAST(eff1 AS BIGINT) FROM eff
        UNION ALL
        SELECT 2, CASE WHEN eff2 = 1 THEN 'root' ELSE 'summary' END,
               CAST(eff2 AS BIGINT) FROM eff WHERE eff1 > 1
        ORDER BY level, kind
    """


def q_reranked_retrieval(spark, sf_dir):
    """Two-stage retrieve + rerank (reference retrieval_service.py:143-157):
    stage 1 = cosine top-50 over documents ⋈ embeddings; stage 2 =
    rerank_chunks fusion (0.7 * exact cosine sim + 0.3 * quality prior),
    top-10. Fully oracle-checkable — the external reranker model is
    replaced by the deterministic fusion score."""
    from raptor_service_spark.operators.retrieval import rerank_chunks

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    leaves = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", F.col("embedding").alias("v")
    )
    cand = (
        leaves.withColumn("dist", cosine_dist_col(F.col("v"), QVEC))
        .orderBy(F.round(F.col("dist"), 9).asc(), F.col("doc_id").asc())
        .limit(50)
    )
    out = rerank_chunks(cand, QVEC, id_col="doc_id", top_k=10)
    return out.select("doc_id", F.round("dist", 6).alias("dist"), "rerank_score")


def _reranked_retrieval_sql() -> str:
    demb = "list_transform(e.embedding, x -> CAST(x AS DOUBLE))"
    qual = quality_score_sql("text")
    return f"""
        WITH scored AS (
            SELECT d.doc_id, d.text,
                   1.0 - list_cosine_similarity({demb}, {QVEC_SQL}) AS dist
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ),
        cand AS (
            SELECT * FROM scored ORDER BY ROUND(dist, 9) ASC, doc_id ASC LIMIT 50
        )
        SELECT doc_id, ROUND(dist, 6) AS dist,
               ROUND(0.7 * (1.0 - dist) + 0.3 * {qual}, 6) AS rerank_score
        FROM cand
        ORDER BY ROUND(0.7 * (1.0 - dist) + 0.3 * {qual}, 6) DESC, doc_id ASC
        LIMIT 10
    """


def q_tree_build_docs(spark, sf_dir):
    """Tile-tree build (R1-R4) over the DRIVER documents table — the
    oracle-checkable twin of tree_build_synthetic: spans come from the
    10-word split (q_spans_explode scheme) and each span's geography from
    the _latlng arithmetic keyed on doc_id*1000+idx, so the full ladder
    (leaf cells -> parent coarsening -> stall guard -> root promotion,
    reference build_tree_service.py:85-161,363-365) is reproducible as
    DuckDB arithmetic. Runs the REAL build_tile_tree code path (salted
    capped collect, provenance links, root promotion) and reports per-level
    (level, kind, n_nodes)."""
    from raptor_service_spark.functions.vector import embed_spans
    from raptor_service_spark.operators.tree import TreeParams, build_tile_tree

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim("text"), r"\s+")
    n = F.size(w)
    spans = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / 10).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(w, i * 10 + 1, 10)),
    )
    flat = d.select("doc_id", F.posexplode(spans).alias("idx", "span_text"))
    lat, lng = _latlng_cols(F.col("doc_id") * F.lit(1000) + F.col("idx"))
    spans_embedded = embed_spans(
        flat.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit("ds-docs").alias("dataset_id"),
            F.col("idx").cast("int").alias("idx"),
            F.format_string("%d::c%d", F.col("doc_id"), F.col("idx")).alias("chunk_id"),
            F.col("span_text").alias("text"),
            lat.alias("lat"),
            lng.alias("lng"),
        ),
        dim=32,
    )
    tree = build_tile_tree(spans_embedded, TreeParams(res_ladder=(6, 3, 0), dim=32))
    return tree.nodes.groupBy(
        F.col("level").cast("long").alias("level"), "kind"
    ).agg(F.count("*").alias("n_nodes"))


def _tree_build_docs_sql() -> str:
    """DuckDB oracle for q_tree_build_docs: per-level node counts from the
    same ladder arithmetic, including the stall guard (forced single group
    when a level fails to shrink) and root promotion (kind='root' iff the
    level has exactly one group)."""
    lat, lng = _latlng_sql("(doc_id * 1000 + idx)")
    c6 = cell_encode_sql(lat, lng, 6)
    c3_of_c6 = cell_parent_sql("c6", 6, 3)
    c0_of_c3 = cell_parent_sql("c3", 3, 0)
    return f"""
        WITH w AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents
        ),
        sp AS (
            SELECT doc_id, t.i AS idx
            FROM w, UNNEST(generate_series(0,
                 CAST(FLOOR((len(words) - 1) / 10) AS BIGINT))) t(i)
        ),
        leaves AS (SELECT {c6} AS c6 FROM sp),
        l1cells AS (SELECT DISTINCT {c3_of_c6} AS c3 FROM leaves),
        g AS (
            SELECT (SELECT COUNT(*) FROM leaves) AS n_leaves,
                   (SELECT COUNT(*) FROM l1cells) AS n1,
                   (SELECT COUNT(DISTINCT {c0_of_c3}) FROM l1cells) AS n2
        ),
        eff AS (
            SELECT n_leaves,
                   CASE WHEN n1 >= n_leaves THEN 1 ELSE n1 END AS eff1,
                   -- level-2 runs only when level 1 kept >1 group; its own
                   -- stall guard forces a single group if it fails to shrink
                   CASE WHEN n2 >= (CASE WHEN n1 >= n_leaves THEN 1 ELSE n1 END)
                        THEN 1 ELSE n2 END AS eff2
            FROM g
        )
        SELECT CAST(0 AS BIGINT) AS level, 'leaf' AS kind,
               CAST(n_leaves AS BIGINT) AS n_nodes FROM eff
        UNION ALL
        SELECT 1, CASE WHEN eff1 = 1 THEN 'root' ELSE 'summary' END,
               CAST(eff1 AS BIGINT) FROM eff
        UNION ALL
        SELECT 2, CASE WHEN eff2 = 1 THEN 'root' ELSE 'summary' END,
               CAST(eff2 AS BIGINT) FROM eff WHERE eff1 > 1
    """


QVEC_SYN_COLLAPSED = np.round(gen_query_vectors(seed=57, n=1, dim=32)[0], 6)
QVEC_SYN_TRAVERSAL = np.round(gen_query_vectors(seed=59, n=1, dim=32)[0], 6)
_QSYN_COLLAPSED_SQL = "[" + ", ".join(f"{x:.6f}" for x in QVEC_SYN_COLLAPSED) + "]"
_QSYN_TRAVERSAL_SQL = "[" + ", ".join(f"{x:.6f}" for x in QVEC_SYN_TRAVERSAL) + "]"


def _retrieval_result_cols(out):
    """Driver-comparable projection of a retrieval result: idx widened to
    long, dist rounded 6 dp (the cross-engine float convention)."""
    return out.select(
        "chunk_id",
        "doc_id",
        F.col("idx").cast("long").alias("idx"),
        "text",
        F.round("dist", 6).alias("dist"),
    )


def q_tree_build_overlap(spark, sf_dir):
    """GMM soft multi-membership emulation (C3 parity, reference
    utils/cluster.py:45-53: posterior > 0.1 joins multiple clusters):
    tile-tree build with overlap_kring=1 — every leaf additionally joins
    the OCCUPIED res-3 cells in its 1-ring, so summaries/edges/links carry
    the overlap. Reports level-1 membership stats: occupied nodes, total
    memberships (primary + secondary), children with >= 2 parents. The
    default hard-assignment path is untouched (tree_build_docs pins it)."""
    from raptor_service_spark.functions.vector import embed_spans
    from raptor_service_spark.operators.tree import TreeParams, build_tile_tree

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.trim("text"), r"\s+")
    n = F.size(w)
    spans = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / 10).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(w, i * 10 + 1, 10)),
    )
    flat = d.select("doc_id", F.posexplode(spans).alias("idx", "span_text"))
    lat, lng = _latlng_cols(F.col("doc_id") * F.lit(1000) + F.col("idx"))
    spans_embedded = embed_spans(
        flat.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit("ds-docs").alias("dataset_id"),
            F.col("idx").cast("int").alias("idx"),
            F.format_string("%d::c%d", F.col("doc_id"), F.col("idx")).alias("chunk_id"),
            F.col("span_text").alias("text"),
            lat.alias("lat"),
            lng.alias("lng"),
        ),
        dim=32,
    )
    tree = build_tile_tree(
        spans_embedded, TreeParams(res_ladder=(6, 3, 0), dim=32, overlap_kring=1)
    )
    e1 = tree.edges.filter(F.col("level") == 1)
    stats = e1.agg(
        F.countDistinct("parent_id").alias("n_nodes"),
        F.count(F.lit(1)).alias("n_memberships"),
    )
    multi = (
        e1.groupBy("child_id")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .agg(F.count(F.lit(1)).alias("n_multi_children"))
    )
    return stats.crossJoin(multi)


def _tree_build_overlap_sql() -> str:
    """DuckDB twin: the same 10-word span ladder, primary c3 assignment,
    1-ring neighbor arithmetic (kring_neighbor_sql — wrap on lng, NULL
    clamp at poles), occupied-cell semi-join, membership counts."""
    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat, lng = _latlng_sql("(doc_id * 1000 + idx)")
    c6 = cell_encode_sql(lat, lng, 6)
    c3 = cell_parent_sql("c6", 6, 3)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dy in range(-1, 2)
        for dx in range(-1, 2)
        if (dx, dy) != (0, 0)
    )
    nbr = kring_neighbor_sql("p.cell", 3, "o.dx", "o.dy")
    return f"""
        WITH w AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
            FROM documents),
        sp AS (
            SELECT doc_id, t.i AS idx
            FROM w, UNNEST(generate_series(0,
                 CAST(FLOOR((len(words) - 1) / 10) AS BIGINT))) t(i)),
        prim0 AS (SELECT doc_id, idx, {c6} AS c6 FROM sp),
        prim AS (SELECT doc_id, idx, {c3} AS cell FROM prim0),
        occ AS (SELECT DISTINCT cell FROM prim),
        sec AS (
            SELECT DISTINCT p.doc_id, p.idx, {nbr} AS cell
            FROM prim p CROSS JOIN (VALUES {offs}) o(dx, dy)
            WHERE {nbr} IS NOT NULL AND {nbr} != p.cell
              AND {nbr} IN (SELECT cell FROM occ)),
        memb AS (
            SELECT doc_id, idx, cell FROM prim
            UNION ALL SELECT doc_id, idx, cell FROM sec),
        per_child AS (
            SELECT doc_id, idx, COUNT(*) AS m FROM memb GROUP BY 1, 2)
        SELECT (SELECT COUNT(DISTINCT cell) FROM memb) AS n_nodes,
               (SELECT COUNT(*) FROM memb) AS n_memberships,
               (SELECT COUNT(*) FROM per_child WHERE m >= 2) AS n_multi_children
    """


def q_collapsed_retrieval_synthetic(spark, sf_dir):
    """Engine-native collapsed retrieval (R5) on the synthetic corpus.
    Round-3: fully oracle-checked. The REAL pipeline runs here (distributed
    datagen → explode → hash-embed → build_tile_tree → collapsed_retrieve);
    the DuckDB twin gets the deterministic corpus + the summarizer/embedder
    model outputs as golden VALUES (an independent pure-Python replay of
    the budget-pack + SHAKE embedding — the 'model' side, like QVEC) and
    performs ALL retrieval math relationally: cell ladder arithmetic,
    stage-1 top-expand_k summary ranking, member expansion, DISTINCT,
    exact-cosine re-rank. Reference retrieval_repo.py:254-348."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.functions.vector import embed_spans
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.retrieval import collapsed_retrieve
    from raptor_service_spark.operators.tree import TreeParams, build_tile_tree

    docs = gen_documents_df(spark, 40, seed=56)
    spans = embed_spans(explode_spans(docs), dim=32).persist()
    tree = build_tile_tree(spans, TreeParams(res_ladder=(6, 3, 0), dim=32))
    chunks = spans.select("chunk_id", "doc_id", "idx", "text", "v")
    out = collapsed_retrieve(
        tree, chunks, QVEC_SYN_COLLAPSED, "ds-56", top_k=8, expand_k=5
    )
    return _retrieval_result_cols(out)


def q_traversal_retrieval_synthetic(spark, sf_dir):
    """Engine-native traversal-beam retrieval (R6) on the synthetic corpus;
    round-3 fully oracle-checked (same golden-VALUES scheme as the
    collapsed twin; the beam hops — root → global-top-8 level-1 cells →
    global-top-8 leaves → gather re-rank — unroll as SQL stages).
    Reference retrieval_repo.py:350-436."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.functions.vector import embed_spans
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.retrieval import traversal_retrieve
    from raptor_service_spark.operators.tree import TreeParams, build_tile_tree

    docs = gen_documents_df(spark, 40, seed=58)
    spans = embed_spans(explode_spans(docs), dim=32).persist()
    tree = build_tile_tree(spans, TreeParams(res_ladder=(6, 3, 0), dim=32))
    chunks = spans.select("chunk_id", "doc_id", "idx", "text", "v")
    out = traversal_retrieve(tree, chunks, QVEC_SYN_TRAVERSAL, "ds-58", top_k=8)
    return _retrieval_result_cols(out)


# --- golden-VALUES twin machinery for the synthetic retrieval oracles -------


def _py_token_count(t: str) -> int:
    """Pure-Python twin of functions.text.token_count."""
    import re as _re

    t = t.strip()
    return 0 if t == "" else len(_re.split(r"\s+", t))


def _py_budget_pack(items: list[dict], cap: int = 32, budget: int = 320) -> list[dict]:
    """Twin of operators.tree._budget_slice: longest ord-prefix within
    ``cap`` children and ``budget`` tokens, >= 1 item."""
    packed, cum = [], 0
    for it in items[: min(cap, budget)]:
        cum += it["tok"]
        if cum > budget:
            break
        packed.append(it)
    return packed if packed else items[:1]


def _synth_spans_py(n_docs: int, seed: int, dim: int = 32) -> list[dict]:
    """The deterministic corpus, span-flat, with float32 hash embeddings —
    the exact rows explode_spans+embed_spans produce (offsets are generated
    strictly increasing, so array_sort is a no-op and idx == position)."""
    from raptor_service_spark.datagen import _gen_doc
    from raptor_service_spark.functions.vector import hash_embed_np

    spans = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        for idx, s in enumerate(sorted(d["spans"], key=lambda x: x["offset"])):
            spans.append(
                {
                    "doc_id": d["doc_id"],
                    "idx": idx,
                    "chunk_id": f"{d['doc_id']}::c{idx}",
                    "text": s["text"],
                    "lat": d["lat"],
                    "lng": d["lng"],
                }
            )
    vecs = hash_embed_np([s["text"] for s in spans], dim).astype(np.float32)
    for s, v in zip(spans, vecs):
        s["v"] = [float(x) for x in v]
    return spans


def _synth_tree_nodes_py(spans: list[dict], seed: int, dim: int = 32) -> list[dict]:
    """Independent pure-Python replay of build_tile_tree's summary layer on
    the synthetic corpus (res ladder 6→3→0): per-res3-cell members sorted by
    ord=(doc_id#idx), greedy token-budget pack (cap 32 / budget 320 /
    tok=max(count,1)), '\\n'-join truncated to 512 chars, float32 SHAKE
    embedding; level-2 root over the level-1 summaries (res 0 is the single
    global cell, so level 2 always roots). node_id = sha256(tree|lvl|cell),
    matching functions.text.summary_node_id."""
    import hashlib as _hl

    from raptor_service_spark.functions.vector import hash_embed_np
    from raptor_service_spark.geo.grid import cell_encode_np, cell_parent_np

    tree_id = f"ds-{seed}::tree"
    c6 = cell_encode_np([s["lat"] for s in spans], [s["lng"] for s in spans], 6)
    c3 = cell_parent_np(c6, 3)
    groups: dict[int, list[dict]] = {}
    for s, c in zip(spans, c3):
        groups.setdefault(int(c), []).append(s)
    single = len(groups) == 1
    lvl1 = []
    for cell, members in sorted(groups.items()):
        items = sorted(
            (
                {
                    "ord": f"{m['doc_id']}#{m['idx']:09d}",
                    "text": m["text"],
                    "tok": max(_py_token_count(m["text"]), 1),
                }
                for m in members
            ),
            key=lambda x: x["ord"],
        )
        text = "\n".join(it["text"] for it in _py_budget_pack(items))[:512]
        lvl1.append(
            {
                "node_id": _hl.sha256(f"{tree_id}|1|{cell}".encode()).hexdigest(),
                "level": 1,
                "cell": int(cell),
                "kind": "root" if single else "summary",
                "text": text,
            }
        )
    nodes = list(lvl1)
    if not single:
        items = sorted(
            (
                {
                    "ord": f"L1#{n['cell']}",
                    "text": n["text"],
                    "tok": max(_py_token_count(n["text"]), 1),
                }
                for n in lvl1
            ),
            key=lambda x: x["ord"],
        )
        text = "\n".join(it["text"] for it in _py_budget_pack(items))[:512]
        nodes.append(
            {
                "node_id": _hl.sha256(f"{tree_id}|2|0".encode()).hexdigest(),
                "level": 2,
                "cell": 0,
                "kind": "root",
                "text": text,
            }
        )
    vecs = hash_embed_np([n["text"] for n in nodes], dim).astype(np.float32)
    for n, v in zip(nodes, vecs):
        n["v"] = [float(x) for x in v]
    return nodes


def _vec_lit_sql(v: list[float]) -> str:
    """Exact float literal list (shortest-roundtrip repr → same double)."""
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"


def _synth_base_sql(n_docs: int, seed: int) -> tuple[str, bool]:
    """Shared WITH-prefix for both retrieval oracles: golden chunk VALUES
    (+ computed cell ladder) and golden node VALUES. Returns (sql, single)."""
    spans = _synth_spans_py(n_docs, seed)
    nodes = _synth_tree_nodes_py(spans, seed)
    single = not any(n["level"] == 2 for n in nodes)
    crows = ", ".join(
        "('{cid}', '{did}', {idx}, '{txt}', {lat!r}, {lng!r}, {v})".format(
            cid=s["chunk_id"],
            did=s["doc_id"],
            idx=s["idx"],
            txt=s["text"].replace("'", "''"),
            lat=s["lat"],
            lng=s["lng"],
            v=_vec_lit_sql(s["v"]),
        )
        for s in spans
    )
    nrows = ", ".join(
        f"('{n['node_id']}', {n['level']}, {n['cell']}, '{n['kind']}', {_vec_lit_sql(n['v'])})"
        for n in nodes
    )
    c6 = cell_encode_sql("lat", "lng", 6)
    c3 = cell_parent_sql("c6", 6, 3)
    return (
        f"""
        WITH chunks0 AS MATERIALIZED (
            SELECT chunk_id, doc_id, idx, text, lat, lng, CAST(v AS DOUBLE[]) AS v
            FROM (VALUES {crows}) t(chunk_id, doc_id, idx, text, lat, lng, v)),
        cc AS MATERIALIZED (
            SELECT chunk_id, doc_id, idx, text, v, {c3} AS c3
            FROM (SELECT *, {c6} AS c6 FROM chunks0)),
        nodes AS MATERIALIZED (
            SELECT node_id, level, cell, kind, CAST(v AS DOUBLE[]) AS v
            FROM (VALUES {nrows}) t(node_id, level, cell, kind, v))""",
        single,
    )


def _collapsed_retrieval_synthetic_sql() -> str:
    base, _single = _synth_base_sql(40, 56)
    q = _QSYN_COLLAPSED_SQL
    return f"""{base},
        picked AS (
            SELECT node_id, level, cell FROM nodes
            WHERE kind IN ('summary', 'root')
            ORDER BY ROUND(1.0 - list_cosine_similarity(v, {q}), 9) ASC,
                     node_id ASC
            LIMIT 5),
        cand AS (
            SELECT DISTINCT cc.chunk_id FROM cc JOIN picked p
              ON (p.level = 1 AND cc.c3 = p.cell) OR p.level = 2)
        SELECT cc.chunk_id, cc.doc_id, CAST(cc.idx AS BIGINT) AS idx, cc.text,
               ROUND(1.0 - list_cosine_similarity(cc.v, {q}), 6) AS dist
        FROM cc JOIN cand USING (chunk_id)
        ORDER BY ROUND(1.0 - list_cosine_similarity(cc.v, {q}), 9) ASC,
                 cc.chunk_id ASC
        LIMIT 8
    """


def _traversal_retrieval_synthetic_sql() -> str:
    base, single = _synth_base_sql(40, 58)
    q = _QSYN_TRAVERSAL_SQL
    # hop 1: children of the root. With the 2-level tree (the actual shape
    # for this corpus — asserted at build time), those are ALL level-1
    # nodes; beam = GLOBAL top-8 across parents (reference LIMIT :k).
    f1 = (
        f"""
        f1 AS (
            SELECT cell FROM nodes WHERE level = 1
            ORDER BY ROUND(1.0 - list_cosine_similarity(v, {q}), 9) ASC,
                     node_id ASC
            LIMIT 8),"""
        if not single
        else """
        f1 AS (SELECT cell FROM nodes WHERE level = 1),"""
    )
    return f"""{base},{f1}
        frontier AS (
            SELECT cc.chunk_id FROM cc JOIN f1 ON cc.c3 = f1.cell
            ORDER BY ROUND(1.0 - list_cosine_similarity(cc.v, {q}), 9) ASC,
                     cc.chunk_id ASC
            LIMIT 8)
        SELECT cc.chunk_id, cc.doc_id, CAST(cc.idx AS BIGINT) AS idx, cc.text,
               ROUND(1.0 - list_cosine_similarity(cc.v, {q}), 6) AS dist
        FROM cc JOIN frontier USING (chunk_id)
        ORDER BY ROUND(1.0 - list_cosine_similarity(cc.v, {q}), 9) ASC,
                 cc.chunk_id ASC
        LIMIT 8
    """


def q_asof_prior_click(spark, sf_dir):
    """As-of join (graft-new §2.13): every purchase event gets the latest
    click by the same user at or before its timestamp — union + per-key
    ordered window fill (ONE shuffle, no range-join blowup); oracle is the
    deterministic correlated form of DuckDB's ASOF JOIN."""
    from raptor_service_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    out = asof_join(
        ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id", "value"
        ),
        key="user_id",
        ts="ts",
        payload_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("prior_event_id").alias("click_id"),
        F.round("prior_value", 6).alias("click_value"),
    )


_ASOF_PRIOR_CLICK_SQL = """
    SELECT l.event_id, l.user_id,
           (SELECT r.event_id FROM events r
            WHERE r.user_id = l.user_id AND r.event_type = 'click'
              AND r.ts <= l.ts
            ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS click_id,
           (SELECT ROUND(r.value, 6) FROM events r
            WHERE r.user_id = l.user_id AND r.event_type = 'click'
              AND r.ts <= l.ts
            ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS click_value
    FROM events l WHERE l.event_type = 'purchase'
"""


def q_click_purchase_join(spark, sf_dir):
    """Interval (attribution-window) join: every click by the same user in
    the 30 min before each purchase. The SAME operator runs as a
    watermarked stream-stream join (streaming/events.py — state expires by
    the time bound); batch mode plans an equi-join on user_id with the
    range as a join filter. Parity: tests/test_tiles_nav_streaming.py."""
    from raptor_service_spark.streaming.events import click_purchase_interval_join

    ev = _read(spark, sf_dir, "events")
    return click_purchase_interval_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


_CLICK_PURCHASE_SQL = """
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
           ROUND(c.value, 6) AS click_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
     AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
"""


def q_events_rollup(spark, sf_dir):
    """ROLLUP grouping-sets aggregation: per (event_type, day), per
    event_type, and grand total in one pass (Spark expands grouping sets
    inside a single partial+final hash aggregate)."""
    ev = _read(spark, sf_dir, "events")
    d = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return (
        ev.select(F.col("event_type"), d.alias("day"), "value")
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


_EVENTS_ROLLUP_SQL = """
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY ROLLUP (event_type, day)
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf_dir):
    """Pivot (long→wide reshape): per-day value sums with one column per
    event type. The type list is supplied explicitly so Spark skips the
    extra distinct-scan pass and plans ONE partial+final hash aggregate
    (pivot_first, whole-stage codegen) — at scale the wide table is built
    in the same single shuffle as a plain groupBy."""
    ev = _read(spark, sf_dir, "events")
    d = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return (
        ev.select(d.alias("day"), "event_type", "value")
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.round(F.sum("value"), 4))
    )


_EVENTS_PIVOT_SQL = (
    "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
    + ", ".join(
        f"ROUND(SUM(value) FILTER (WHERE event_type = '{t}'), 4) AS {t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY 1"
)


def q_events_sliding(spark, sf_dir):
    """Hopping-window aggregation (2 h windows sliding 1 h): each event
    lands in exactly two windows; Spark expands the membership inline (no
    self-union) and aggregates in one shuffle. The identical window spec
    drives the streaming path (streaming/events.py), so batch and stream
    share window semantics."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_EVENTS_SLIDING_SQL = """
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM (SELECT event_type, value,
                 unnest([date_trunc('hour', ts),
                         date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
          FROM events)
    GROUP BY 1, 2
"""


def q_user_running_stats(spark, sf_dir):
    """Window frames: per-user cumulative sum (UNBOUNDED PRECEDING) and
    3-row moving average over the event stream ordered by (ts, event_id) —
    the running-aggregate shape behind rate counters and drift monitors.
    One shuffle on user_id serves both frames."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    ob = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(ob.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "cum_value"
        ),
        F.round(F.avg("value").over(ob.rowsBetween(-2, 0)), 6).alias("mov_avg3"),
    )


_USER_RUNNING_SQL = """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 4) AS cum_value,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
    FROM events WHERE user_id < 20
"""


def q_train_decontam(spark, sf_dir):
    """Benchmark decontamination: train-split docs sharing any distinct word
    5-gram with a held-out test-split doc — the n-gram-overlap contamination
    check run before every training round. One equi-join on the relational
    gram stream (same shingle machinery as MinHash); 5-word keys keep
    per-gram fan-out bounded and the join is AQE-skew-splittable."""
    from raptor_service_spark.functions.text import hash_split
    from raptor_service_spark.operators.dedup import distinct_shingle_rows

    d = _read(spark, sf_dir, "documents").withColumn(
        "split", hash_split(F.col("doc_id"))
    )
    tr = distinct_shingle_rows(d.filter(F.col("split") == "train"), k=5)
    te = distinct_shingle_rows(d.filter(F.col("split") == "test"), k=5)
    return (
        tr.join(te.withColumnRenamed("id", "bench_id"), "g")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


QVEC_Q = np.round(
    QVEC.astype(np.float64) * (127.0 / np.max(np.abs(QVEC.astype(np.float64))))
).astype(np.int64)
_QVEC_Q_SQL = "[" + ", ".join(f"{int(v)}.0" for v in QVEC_Q) + "]"
_QVEC_Q_NORM = float(np.sqrt(np.sum(QVEC_Q.astype(np.float64) ** 2)))


def q_knn_quantized(spark, sf_dir):
    """Int8-quantized kNN: per-vector max-abs symmetric quantization
    (embedding → integer codes, 4× memory/IO reduction at index time), then
    exact dot-product cosine on the codes. All code arithmetic is
    integer-in-double — exactly representable, so engine-order-independent
    and oracle bit-exact. At scale the codes column replaces the float
    vectors in the ANN index; this verifies the quantize + score path."""
    e = _read(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda x: x.cast("double"))
    mx = F.array_max(F.transform(xd, lambda x: F.abs(x)))
    q = F.transform(xd, lambda x: F.round(x * F.lit(127.0) / mx))
    qq = F.array(*[F.lit(float(v)) for v in QVEC_Q])
    dot = F.aggregate(
        F.zip_with(q, qq, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nq = F.sqrt(
        F.aggregate(F.transform(q, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    dist = F.lit(1.0) - dot / (nq * F.lit(_QVEC_Q_NORM))
    return (
        e.select("vec_id", F.round(dist, 6).alias("qdist"))
        .orderBy(F.col("qdist").asc(), F.col("vec_id").asc())
        .limit(10)
    )


QVEC_PQ = np.round(gen_query_vectors(seed=107, n=1, dim=64)[0], 6)


def q_pq_knn(spark, sf_dir):
    """Product-quantization kNN with codegen ADC scoring (operators/pq.py):
    codebooks trained driver-side (deterministic numpy Lloyd, O(m·k·dsub)
    driver state), then encode (literal-arithmetic argmin) AND score
    (literal ADC table lookup) run as whole-stage-codegen expressions — a
    lossy ANN path whose oracle is bit-exact because the identical
    generated strings execute in DuckDB."""
    from raptor_service_spark.operators.pq import (
        adc_score_expr,
        adc_tables,
        pq_code_expr,
        pq_dist_array_exprs,
        train_pq_codebooks,
    )

    books = train_pq_codebooks()
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    for s, ds in enumerate(pq_dist_array_exprs(books, "embedding", "spark")):
        e = e.withColumn(f"ds{s}", F.expr(ds))
    for s in range(books.shape[0]):
        e = e.withColumn(f"pc{s}", F.expr(pq_code_expr(f"ds{s}", "spark")))
    tables = adc_tables(books, QVEC_PQ)
    score = F.expr(
        adc_score_expr(tables, [f"pc{s}" for s in range(books.shape[0])], "spark")
    )
    return (
        e.select("vec_id", F.round(score, 6).alias("pqdist"))
        .orderBy(F.col("pqdist").asc(), F.col("vec_id").asc())
        .limit(10)
    )


def _pq_knn_sql() -> str:
    from raptor_service_spark.operators.pq import (
        adc_score_expr,
        adc_tables,
        pq_code_expr,
        pq_dist_array_exprs,
        train_pq_codebooks,
    )

    books = train_pq_codebooks()
    m = books.shape[0]
    ds = pq_dist_array_exprs(books, "embedding", "duckdb")
    ds_cols = ", ".join(f"{d} AS ds{s}" for s, d in enumerate(ds))
    pc_cols = ", ".join(
        f"{pq_code_expr(f'ds{s}', 'duckdb')} AS pc{s}" for s in range(m)
    )
    adc = adc_score_expr(adc_tables(books, QVEC_PQ), [f"pc{s}" for s in range(m)], "duckdb")
    return f"""
        WITH d AS (SELECT vec_id, {ds_cols} FROM embeddings),
        c AS (SELECT vec_id, {pc_cols} FROM d)
        SELECT vec_id, ROUND({adc}, 6) AS pqdist
        FROM c ORDER BY pqdist ASC, vec_id ASC LIMIT 10
    """


def q_span_roundtrip_check(spark, sf_dir):
    """Span-sequence invariant as a query: rows violating equality (expect 0
    mismatches; returns per-doc ok flags)."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans, regroup_spans

    docs = gen_documents_df(spark, 50, seed=60)
    flat = explode_spans(docs)
    back = regroup_spans(flat)
    orig = docs.select(
        "doc_id", F.expr("array_sort(spans, (a, b) -> a.offset - b.offset)").alias("spans")
    )
    return (
        orig.alias("o")
        .join(back.alias("b"), "doc_id")
        .select("doc_id", (F.col("o.spans") == F.col("b.spans")).alias("spans_equal"))
    )


def q_media_features(spark, sf_dir):
    """Multimodal feature extraction (UDF surface 7) from DECODED pixels:
    round 3 replaced the decode stub with the real RTv1|w|h|RLE raster
    codec (operators/tiles.py:encode_raster/decode_raster) — the feature is
    the first 8 pixels of the parsed raster. Oracle-checked: the corpus is
    deterministic from (seed, i) alone (datagen._gen_doc, pure numpy), so
    the oracle embeds the expected media spans as VALUES and recomputes the
    pixel feature INDEPENDENTLY in DuckDB SQL (quantized md5 arithmetic —
    encode∘decode is identity, pinned separately by the round-trip and
    corrupt-input pytests)."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.tiles import media_features

    docs = gen_documents_df(spark, 30, seed=61)
    return media_features(explode_spans(docs), dim=8).select(
        "doc_id", "media_ref", "kind", "feature"
    )


def _media_features_sql(n_docs: int = 30, seed: int = 61, dim: int = 8) -> str:
    """DuckDB twin of q_media_features: VALUES input from the deterministic
    generator + an independent SQL recomputation of the decoded-pixel
    feature. Pixel i of the synthetic raster is the 16-level quantization
    (b // 16 * 17) of byte i of the md5 chain; the first 16 bytes are
    md5(media_ref) itself, so the first 8 pixels are pure SQL arithmetic."""
    from raptor_service_spark.datagen import _gen_doc

    vals = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        for s in d["spans"]:
            if s["media_ref"]:
                vals.append(f"('{d['doc_id']}', '{s['media_ref']}', '{s['kind']}')")
    feature = (
        "list_transform(range(0, "
        + str(dim)
        + "), i -> CAST(('0x' || substr(md5(media_ref), 2 * i + 1, 2))::INTEGER"
        " // 16 * 17 AS DOUBLE) / 255.0)"
    )
    return (
        "SELECT doc_id, media_ref, kind, "
        + feature
        + " AS feature FROM (VALUES "
        + ", ".join(vals)
        + ") t(doc_id, media_ref, kind)"
    )


def _span_roundtrip_sql(n_docs: int = 50, seed: int = 60) -> str:
    """Golden oracle for the span-sequence invariant: every deterministic doc
    must round-trip explode->regroup equal (doc ids from the pure-Python
    generator; any Spark-side ordering regression yields FALSE rows that
    mismatch)."""
    from raptor_service_spark.datagen import doc_id_for

    vals = ", ".join(f"('{doc_id_for(seed, i)}', TRUE)" for i in range(n_docs))
    return f"SELECT * FROM (VALUES {vals}) t(doc_id, spans_equal)"


# ---------------------------------------------------------------------------
# spatial statistics: Moran's I, Getis-Ord Gi* (operators/spatial_stats.py)
# ---------------------------------------------------------------------------


def q_morans_i(spark, sf_dir):
    """Global spatial autocorrelation of the res-5 document density surface
    (queen 1-ring weights over occupied cells). One point shuffle, then
    O(occupied cells) ring join — scale notes in operators/spatial_stats.py."""
    from raptor_service_spark.operators.spatial_stats import morans_i

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    return morans_i(d.withColumn("lat", lat).withColumn("lng", lng), res=5)


def _morans_i_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import morans_i_sql

    lat, lng = _latlng_sql("doc_id")
    return morans_i_sql("documents", lat, lng, res=5)


def q_getis_hotspots(spark, sf_dir):
    """Getis-Ord Gi* hot-spot z-scores per occupied res-4 cell, 20 hottest.
    Same ring algebra as morans_i; z rounded to 6 dp, tie-broken on cell."""
    from raptor_service_spark.operators.spatial_stats import getis_gi_star

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    return getis_gi_star(
        d.withColumn("lat", lat).withColumn("lng", lng), res=4, top_k=20
    )


def _getis_hotspots_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import getis_gi_sql

    lat, lng = _latlng_sql("doc_id")
    return getis_gi_sql("documents", lat, lng, res=4, top_k=20)


# ---------------------------------------------------------------------------
# trajectory-similarity join: users whose visited-cell sets match
# ---------------------------------------------------------------------------


def q_similar_users(spark, sf_dir):
    """Exact trajectory-similarity join: Jaccard >= 0.5 between per-user
    visited res-4 cell SETS, via the generic prefix-filtered set-similarity
    join (operators/dedup.py set_jaccard_pairs — ids are users, elements are
    cells; candidacy bound and exactness argument identical to
    ngram_jaccard_pairs). A twin cohort (user_id + 1000, same events) is
    unioned in so the expected output provably contains J=1.0 pairs. Scale:
    no all-pairs anywhere — the inverted index is frequency-pruned, hot cells
    fall outside every prefix."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.dedup import set_jaccard_pairs

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .filter(F.col("user_id") < 50)
    )
    ev = ev.unionByName(
        ev.select("event_id", (F.col("user_id") + F.lit(1000)).alias("user_id"))
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    cells = ev.select(
        F.col("user_id").alias("id"), cell_encode_col(lat, lng, 4).alias("g")
    ).dropDuplicates(["id", "g"])
    pairs = set_jaccard_pairs(cells, threshold=0.5)
    return pairs.select(
        F.col("doc_a").alias("user_a"), F.col("doc_b").alias("user_b"), "jaccard"
    )


def _similar_users_sql() -> str:
    from raptor_service_spark.operators.dedup import jaccard_sql

    lat, lng = _latlng_sql("event_id")
    cell4 = cell_encode_sql(lat, lng, 4)
    jac = jaccard_sql("a.gs", "b.gs")
    return f"""
        WITH e AS (SELECT event_id, user_id FROM events WHERE user_id < 50
                   UNION ALL
                   SELECT event_id, user_id + 1000 FROM events WHERE user_id < 50),
        c AS (SELECT DISTINCT user_id AS id, {cell4} AS g FROM e),
        s AS (SELECT id, list(g) AS gs FROM c GROUP BY 1)
        SELECT a.id AS user_a, b.id AS user_b, ROUND({jac}, 6) AS jaccard
        FROM s a JOIN s b ON a.id < b.id
        WHERE ROUND({jac}, 6) >= 0.5
    """


# ---------------------------------------------------------------------------
# boilerplate profile: corpus-frequent n-gram fraction per document
# ---------------------------------------------------------------------------


def q_doc_boilerplate(spark, sf_dir):
    """Boilerplate signal for training-data curation: per document, the
    fraction of its distinct word bigrams that are corpus-common (document
    frequency >= 5% of docs), histogrammed into 10 buckets. Scale shape: the
    gram stream shuffles once into the df agg (map-side combinable) and once
    into the per-doc fraction agg; the df table joins back gram-to-gram —
    no doc x doc pairs anywhere. The bucket is a single double division in
    both engines, so parity is exact."""
    from raptor_service_spark.operators.dedup import distinct_shingle_rows

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs")))
    dg = distinct_shingle_rows(d, "text", "doc_id", k=2)
    freq = dg.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        dg.join(freq, "g")
        .crossJoin(n_docs)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # df >= 5% of docs as EXACT integer math (df * 20 >= n_docs):
            # a float 0.05 * n literal is DECIMAL in DuckDB but double in
            # Spark and the two can disagree at the boundary.
            F.sum(
                (F.col("df") * F.lit(20) >= F.col("n_docs")).cast("long")
            ).alias("n_common"),
        )
    )
    bucket = F.floor((F.col("n_common") * F.lit(10.0)) / F.col("n")).cast("long")
    return (
        per_doc.groupBy(F.least(bucket, F.lit(9)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("n_common") / F.col("n")), 6).alias("avg_frac"),
        )
    )


def _doc_boilerplate_sql() -> str:
    from raptor_service_spark.operators.dedup import shingles_sql

    sh = shingles_sql("text", 2)
    return f"""
        WITH d AS (SELECT doc_id AS id, {sh} AS sh FROM documents),
        t AS (SELECT COUNT(*) AS n_docs FROM documents),
        g AS (SELECT id, UNNEST(sh) AS g FROM d),
        f AS (SELECT g, COUNT(*) AS df FROM g GROUP BY 1),
        p AS (SELECT g.id, COUNT(*) AS n,
                     SUM(CASE WHEN f.df * 20 >= t.n_docs THEN 1 ELSE 0 END) AS n_common
              FROM g JOIN f USING (g) CROSS JOIN t
              GROUP BY 1)
        SELECT LEAST(CAST(FLOOR((n_common * 10.0) / n) AS BIGINT), 9) AS bucket,
               COUNT(*) AS n_docs,
               ROUND(AVG(CAST(n_common AS DOUBLE) / n), 6) AS avg_frac
        FROM p GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Z-order (Morton) layout: space-filling-curve bucketing for scan locality
# ---------------------------------------------------------------------------


def _morton_sql(x: str, y: str, bits: int = 8) -> str:
    """Morton interleave of two < 2**bits ints as pure +/floor/% arithmetic
    (no bitwise ops), one shared string for Spark F.expr AND DuckDB —
    parity by construction."""
    terms = [
        f"((CAST(FLOOR({x} / {2 ** b}) AS BIGINT) % 2) * {4 ** b} "
        f"+ (CAST(FLOOR({y} / {2 ** b}) AS BIGINT) % 2) * {2 * 4 ** b})"
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def q_zorder_layout(spark, sf_dir):
    """Z-order data layout audit (the Delta/Iceberg OPTIMIZE ZORDER analog):
    docs are Morton-encoded on their res-8 grid (x, y), hashed into 16
    contiguous z-ranges, and each range reports its (x, y) bounding box —
    tight boxes are WHY a z-sorted file layout prunes 2-D range scans: a
    z-range bucket of 4096 codes can only span a 64x64 block. At 100 TB this
    is the write-side `sortWithinPartitions(z)` recipe; the audit itself is
    two codegen projections and one agg."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    n = 256
    x = F.least(
        F.greatest(F.floor((lng + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    y = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    pts = d.select(x.alias("x"), y.alias("y"))
    z = F.expr(_morton_sql("x", "y"))
    return (
        pts.select("x", "y", F.floor(z / F.lit(4096)).cast("long").alias("zbucket"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def _zorder_layout_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    n = 256
    x = f"LEAST(GREATEST(CAST(FLOOR(({lng} + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    y = f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    z = _morton_sql("x", "y")
    return f"""
        WITH p AS (SELECT {x} AS x, {y} AS y FROM documents)
        SELECT CAST(FLOOR({z} / 4096) AS BIGINT) AS zbucket,
               COUNT(*) AS n_docs,
               MIN(x) AS min_x, MAX(x) AS max_x,
               MIN(y) AS min_y, MAX(y) AS max_y
        FROM p GROUP BY 1
    """


def q_hilbert_layout(spark, sf_dir):
    """Hilbert-curve data layout audit — the locality-superior sibling of
    `q_zorder_layout` (same res-8 grid, same 4096-code buckets) for the
    OPTIMIZE-by-curve write recipe. Unlike Morton, EVERY consecutive pair of
    Hilbert codes is a grid-adjacent cell (verified exhaustively in
    tests/test_geo.py), so bucket bounding boxes have no seam jumps. The
    whole encode is one codegen Project (order=8 levels of +,*,floor,%
    CASE arithmetic, shared verbatim with the DuckDB oracle); the audit is
    one partial+final agg — zero extra shuffles at 100 TB."""
    from raptor_service_spark.geo.hilbert import hilbert_withcolumns

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    n = 256
    x = F.least(
        F.greatest(F.floor((lng + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    y = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    pts = hilbert_withcolumns(d.select(x.alias("x"), y.alias("y")), 8)
    return (
        pts.select("x", "y", F.floor(F.col("hd") / F.lit(4096)).cast("long").alias("hbucket"))
        .groupBy("hbucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def _hilbert_layout_sql() -> str:
    from raptor_service_spark.geo.hilbert import hilbert_sql_chain

    lat, lng = _latlng_sql("doc_id")
    n = 256
    x = f"LEAST(GREATEST(CAST(FLOOR(({lng} + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    y = f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    chain = hilbert_sql_chain(8, f"(SELECT {x} AS x, {y} AS y FROM documents)")
    return f"""
        WITH {chain}
        SELECT CAST(FLOOR(hd / 4096) AS BIGINT) AS hbucket,
               COUNT(*) AS n_docs,
               MIN(x) AS min_x, MAX(x) AS max_x,
               MIN(y) AS min_y, MAX(y) AS max_y
        FROM h GROUP BY 1
    """


def q_hex_density(spark, sf_dir):
    """H3-style hexagonal density map: docs are binned into 0.5-degree
    pointy-top hexes (axial coords via the cube-round walk, `geo/hexgrid.py`
    — shared arithmetic with the oracle), counted per hex, and the top-20
    densest hexes report their integer hex-ring distance from the global
    peak. Scale shape: encode is a codegen Project; the density map is one
    partial+final agg on (hq, hr); the peak is a 1-row broadcast (the hex
    table is O(occupied hexes), never O(rows))."""
    from raptor_service_spark.geo.hexgrid import hex_dist_sql, hex_withcolumns

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(lng.alias("x"), lat.alias("y"))
    hexes = (
        hex_withcolumns(pts, 0.5, "x", "y")
        .groupBy("hq", "hr")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    peak = (
        hexes.orderBy(F.desc("n_docs"), "hq", "hr")
        .limit(1)
        .select(F.col("hq").alias("pq"), F.col("hr").alias("pr"))
    )
    dist = hex_dist_sql("hq", "hr", "pq", "pr")
    return (
        hexes.join(F.broadcast(peak))
        .select("hq", "hr", "n_docs", F.expr(dist).alias("ring_from_peak"))
        .orderBy(F.desc("n_docs"), "hq", "hr")
        .limit(20)
    )


def _hex_density_sql() -> str:
    from raptor_service_spark.geo.hexgrid import hex_cte_sql, hex_dist_sql

    lat, lng = _latlng_sql("doc_id")
    chain = hex_cte_sql(f"(SELECT {lng} AS x, {lat} AS y FROM documents)", 0.5, "x", "y")
    dist = hex_dist_sql("hq", "hr", "pq", "pr")
    return f"""
        WITH {chain},
        c AS (SELECT hq, hr, COUNT(*) AS n_docs FROM hx GROUP BY 1, 2),
        p AS (SELECT hq AS pq, hr AS pr FROM c ORDER BY n_docs DESC, hq, hr LIMIT 1)
        SELECT hq, hr, n_docs, {dist} AS ring_from_peak
        FROM c CROSS JOIN p
        ORDER BY n_docs DESC, hq, hr LIMIT 20
    """


def q_geohash_coverage(spark, sf_dir):
    """Geohash coverage map (ST_GeoHash analog): docs are geohash6-encoded
    (base32 via pure-arithmetic bit interleave, `geo/geohash.py`, verified
    char-exact against the canonical subdivision algorithm), then rolled up
    by their geohash4 prefix — prefix truncation IS spatial containment, so
    this is the layout/bbox-predicate story in string form. Top-30 prefixes
    report doc count and distinct-gh6 sub-cell coverage. One codegen Project
    + one agg (count-distinct expands to the standard two-phase plan)."""
    from raptor_service_spark.geo.geohash import geohash_withcolumn

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = geohash_withcolumn(
        d.select(lat.alias("glat"), lng.alias("glng")), "glat", "glng", "gh6", 6
    )
    return (
        pts.groupBy(F.substring("gh6", 1, 4).alias("gh4"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("gh6").alias("n_gh6"),
        )
        .orderBy(F.desc("n_docs"), "gh4")
        .limit(30)
    )


def _geohash_coverage_sql() -> str:
    from raptor_service_spark.geo.geohash import geohash_cte_sql

    lat, lng = _latlng_sql("doc_id")
    chain = geohash_cte_sql(
        f"(SELECT {lat} AS glat, {lng} AS glng FROM documents)",
        "glat", "glng", "gh6", 6,
    )
    return f"""
        WITH {chain}
        SELECT SUBSTRING(gh6, 1, 4) AS gh4,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT gh6) AS n_gh6
        FROM gh GROUP BY 1
        ORDER BY n_docs DESC, gh4 LIMIT 30
    """


def q_kmeans_geo(spark, sf_dir):
    """Deterministic Lloyd's k-means (k=8, 4 rounds) over doc (lng, lat)
    points — the iterative-ML dataflow check alongside PageRank. The engine
    path is the MLlib recipe: O(k) centroids on the driver, each round ONE
    codegen argmin projection over the points (no join, no point shuffle)
    + a partial+final agg to k rows; the oracle unrolls the same rounds as
    CTEs with per-round 9 dp centroid rounding (cross-engine determinism,
    PageRank precedent). See `operators/clustering.py`."""
    from raptor_service_spark.operators.clustering import kmeans

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(F.col("doc_id").alias("id"), lng.alias("x"), lat.alias("y"))
    return kmeans(pts, k=8, n_iters=4)


def _kmeans_geo_sql() -> str:
    from raptor_service_spark.operators.clustering import kmeans_sql

    lat, lng = _latlng_sql("doc_id")
    src = f"(SELECT doc_id AS id, {lng} AS x, {lat} AS y FROM documents)"
    return kmeans_sql(src, k=8, n_iters=4)


# z-range scan: bbox → minimal Morton ranges → range-join pruning audit
_ZR_BOX = (99, 177, 135, 206)  # cells of lat [5,55] × lng [-40,70] at n=256


def _zr_ranges() -> list[tuple[int, int]]:
    from raptor_service_spark.geo.zranges import zrange_decompose

    return zrange_decompose(*_ZR_BOX, 8)


def q_zrange_scan(spark, sf_dir):
    """SFC scan pruning in action: a fixed geographic bbox is decomposed
    into its MINIMAL set of contiguous Morton ranges (driver-side quadtree
    planner, `geo/zranges.py` — exact-cover property tested exhaustively),
    and docs are counted per range via `z BETWEEN lo AND hi`. On a
    z-sorted table each range is a parquet row-group min/max prune — the
    read amortizes to O(perimeter) range reads instead of a full scan.
    The planner output is a literal VALUES list shared verbatim with the
    oracle; the z column uses the same `_morton_sql` arithmetic as the
    layout audit."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    n = 256
    x = F.least(
        F.greatest(F.floor((lng + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    y = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    pts = d.select(x.alias("x"), y.alias("y")).select(
        F.expr(_morton_sql("x", "y")).alias("z")
    )
    ranges = spark.createDataFrame(_zr_ranges(), "z_lo long, z_hi long")
    return (
        pts.join(
            F.broadcast(ranges),
            (F.col("z") >= F.col("z_lo")) & (F.col("z") <= F.col("z_hi")),
        )
        .groupBy("z_lo", "z_hi")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _zrange_scan_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    n = 256
    x = f"LEAST(GREATEST(CAST(FLOOR(({lng} + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    y = f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    z = _morton_sql("x", "y")
    vals = ", ".join(f"({lo}, {hi})" for lo, hi in _zr_ranges())
    return f"""
        WITH p AS (SELECT {x} AS x, {y} AS y FROM documents),
        pz AS (SELECT {z} AS z FROM p)
        SELECT r.z_lo, r.z_hi, COUNT(*) AS n_docs
        FROM pz JOIN (VALUES {vals}) r(z_lo, z_hi)
          ON pz.z >= r.z_lo AND pz.z <= r.z_hi
        GROUP BY 1, 2
    """


def _hr_ranges() -> list[tuple[int, int]]:
    from raptor_service_spark.geo.zranges import hilbert_range_decompose

    return hilbert_range_decompose(*_ZR_BOX, 8)


def q_hilbert_range_scan(spark, sf_dir):
    """Hilbert twin of `zrange_scan` over the SAME bbox: the quad subtree
    property makes every quad one contiguous hd interval, and Hilbert's
    no-seam locality yields FEWER, tighter ranges than Morton (asserted in
    tests) — the practical reason OPTIMIZE-by-Hilbert beats z-order for
    2-D scans. Same broadcast range-join audit; ranges shared verbatim
    with the oracle."""
    from raptor_service_spark.geo.hilbert import hilbert_withcolumns

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    n = 256
    x = F.least(
        F.greatest(F.floor((lng + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    y = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    # Cut lineage before the non-equi join: CollapseProject would otherwise
    # substitute the 8-level rotate-reflect chain INTO the join predicate
    # (each level doubles the references — exponential expression blowup;
    # Catalyst spins for minutes). In practice hd is a STORED layout column
    # (it exists so the table can be written sorted by it), so materializing
    # it here mirrors the real deployment, not a workaround.
    pts = (
        hilbert_withcolumns(d.select(x.alias("x"), y.alias("y")), 8)
        .select("hd")
        .localCheckpoint(eager=True)
    )
    ranges = spark.createDataFrame(_hr_ranges(), "hd_lo long, hd_hi long")
    return (
        pts.join(
            F.broadcast(ranges),
            (F.col("hd") >= F.col("hd_lo")) & (F.col("hd") <= F.col("hd_hi")),
        )
        .groupBy("hd_lo", "hd_hi")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _hilbert_range_scan_sql() -> str:
    from raptor_service_spark.geo.hilbert import hilbert_sql_chain

    lat, lng = _latlng_sql("doc_id")
    n = 256
    x = f"LEAST(GREATEST(CAST(FLOOR(({lng} + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    y = f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    chain = hilbert_sql_chain(8, f"(SELECT {x} AS x, {y} AS y FROM documents)")
    vals = ", ".join(f"({lo}, {hi})" for lo, hi in _hr_ranges())
    return f"""
        WITH {chain}
        SELECT r.hd_lo, r.hd_hi, COUNT(*) AS n_docs
        FROM h JOIN (VALUES {vals}) r(hd_lo, hd_hi)
          ON h.hd >= r.hd_lo AND h.hd <= r.hd_hi
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# movement compass rose: octant histogram of per-user displacement vectors
# ---------------------------------------------------------------------------

# Octant of a nonzero (dlat, dlng) displacement by EXACT sign/magnitude
# comparisons — no atan2 (libm results are not bit-guaranteed across
# engines; comparisons on identical doubles are). Sectors clockwise from
# north: 0=N..NE(incl 45), 1=NE..E, 2=E..SE(incl 135), 3=SE..S, 4=S..SW
# (incl 225), 5=SW..W, 6=W..NW(incl 315), 7=NW..N. One shared CASE string
# for Spark F.expr and DuckDB.
_OCTANT_SQL = """CASE
    WHEN dlng >= 0 AND dlat > 0 AND dlat >= dlng THEN 0
    WHEN dlng > 0 AND dlat > 0 AND dlng > dlat THEN 1
    WHEN dlng > 0 AND dlat <= 0 AND dlng >= -dlat THEN 2
    WHEN dlng > 0 AND dlat < 0 AND -dlat > dlng THEN 3
    WHEN dlng <= 0 AND dlat < 0 AND -dlat >= -dlng THEN 4
    WHEN dlng < 0 AND dlat < 0 AND -dlng > -dlat THEN 5
    WHEN dlng < 0 AND dlat >= 0 AND -dlng >= dlat THEN 6
    ELSE 7 END"""


def q_bearing_rose(spark, sf_dir):
    """Per-user movement-direction histogram: each consecutive event pair is
    a displacement vector, classified into one of 8 compass octants by exact
    comparisons (shared CASE string — no libm). Window lag on (user, ts) is
    the only shuffle; zero-displacement pairs are dropped."""
    from pyspark.sql import Window

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < 30)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        pts.withColumn("dlat", F.col("lat") - F.lag("lat").over(w))
        .withColumn("dlng", F.col("lng") - F.lag("lng").over(w))
        .filter(
            F.col("dlat").isNotNull() & ((F.col("dlat") != 0) | (F.col("dlng") != 0))
        )
    )
    return (
        seg.select("user_id", F.expr(_OCTANT_SQL).cast("long").alias("sector"))
        .groupBy("user_id", "sector")
        .agg(F.count(F.lit(1)).alias("n_moves"))
    )


def _bearing_rose_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH p AS (SELECT user_id, ts, event_id, {lat} AS lat, {lng} AS lng
                   FROM events WHERE user_id < 30),
        s AS (SELECT user_id,
                     lat - LAG(lat) OVER w AS dlat,
                     lng - LAG(lng) OVER w AS dlng
              FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, CAST(({_OCTANT_SQL}) AS BIGINT) AS sector,
               COUNT(*) AS n_moves
        FROM s
        WHERE dlat IS NOT NULL AND (dlat != 0 OR dlng != 0)
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# co-visitation (association) mining over cells
# ---------------------------------------------------------------------------


def q_cell_covisit(spark, sf_dir):
    """Market-basket mining over the tile grid: pairs of res-3 cells
    visited by the same user (support >= 3 users), with lift =
    n_users_both * n_users_total / (n_users_a * n_users_b), rounded 6 dp —
    the location co-occurrence signal behind 'people who go here also go
    there'. Scale shape: the distinct (user, cell) basket table is the only
    point-derived shuffle; the per-user pair explode is bounded by
    cells-per-user squared (baskets are small by construction — res-3 has
    64 cells); per-cell and total supports broadcast back onto the
    aggregated pair table."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    basket = ev.select(
        "user_id", cell_encode_col(lat, lng, 3).alias("cell")
    ).dropDuplicates(["user_id", "cell"])
    tot = F.broadcast(
        basket.agg(F.count_distinct("user_id").alias("n_users"))
    )
    supp = basket.groupBy("cell").agg(F.count(F.lit(1)).alias("s"))
    a = basket.select("user_id", F.col("cell").alias("cell_a"))
    b = basket.select("user_id", F.col("cell").alias("cell_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("cell_a") < F.col("cell_b"))
        .groupBy("cell_a", "cell_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    sa = supp.select(F.col("cell").alias("cell_a"), F.col("s").alias("s_a"))
    sb = supp.select(F.col("cell").alias("cell_b"), F.col("s").alias("s_b"))
    return (
        pairs.join(F.broadcast(sa), "cell_a")
        .join(F.broadcast(sb), "cell_b")
        .crossJoin(tot)
        .select(
            "cell_a",
            "cell_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.col("n_users")).cast("double")
                / (F.col("s_a") * F.col("s_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


def _cell_covisit_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH basket AS (SELECT DISTINCT user_id, {cell} AS cell FROM events),
        tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM basket),
        supp AS (SELECT cell, COUNT(*) AS s FROM basket GROUP BY 1),
        pairs AS (
            SELECT a.cell AS cell_a, b.cell AS cell_b, COUNT(*) AS n_both
            FROM basket a JOIN basket b
              ON a.user_id = b.user_id AND a.cell < b.cell
            GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        SELECT p.cell_a, p.cell_b, p.n_both,
               ROUND(CAST(p.n_both * t.n_users AS DOUBLE)
                     / CAST(sa.s * sb.s AS DOUBLE), 6) AS lift
        FROM pairs p
        JOIN supp sa ON p.cell_a = sa.cell
        JOIN supp sb ON p.cell_b = sb.cell
        CROSS JOIN tot t
    """


# ---------------------------------------------------------------------------
# skyline (Pareto front) + per-stratum percentile-rank normalization
# ---------------------------------------------------------------------------


def q_doc_skyline(spark, sf_dir):
    """Pareto-front extraction over (quality, token_count): docs no other
    doc strictly dominates — the multi-objective shortlist a curation
    pipeline keeps when two metrics cannot be traded off a priori.
    Domination: q' >= q AND t' >= t AND (q' > q OR t' > t); duplicate
    (q, t) points are mutually non-dominating and all survive.

    Distributed 2-D skyline WITHOUT the O(n^2) anti-join: per-q max t
    (partial+final agg), then ONE running-max window over the DISTINCT-q
    table (bounded by metric cardinality, never the corpus — the same
    SinglePartition-on-aggregated-rows posture as hot_cells); a doc is on
    the front iff it carries its q-group's max t and beats every
    strictly-higher-q group's max. The brute-force NOT EXISTS oracle
    proves the window formulation."""
    from pyspark.sql import Window

    from raptor_service_spark.functions.text import quality_score, token_count

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        token_count(F.col("text")).cast("long").alias("t"),
    )
    gmax = base.groupBy("q").agg(F.max("t").alias("gmax_t"))
    w = Window.orderBy(F.desc("q")).rowsBetween(Window.unboundedPreceding, -1)
    front_q = gmax.withColumn("prev_max", F.max("gmax_t").over(w)).filter(
        F.col("prev_max").isNull() | (F.col("prev_max") < F.col("gmax_t"))
    )
    return (
        base.join(F.broadcast(front_q), "q")
        .filter(F.col("t") == F.col("gmax_t"))
        .select("doc_id", "q", "t")
    )


def _doc_skyline_sql() -> str:
    from raptor_service_spark.functions.text import quality_score_sql, token_count_sql

    q = quality_score_sql("text")
    t = token_count_sql("text")
    return f"""
        WITH b AS (SELECT doc_id, {q} AS q, CAST({t} AS BIGINT) AS t
                   FROM documents)
        SELECT doc_id, q, t FROM b a
        WHERE NOT EXISTS (
            SELECT 1 FROM b o
            WHERE o.q >= a.q AND o.t >= a.t AND (o.q > a.q OR o.t > a.t))
    """


def q_doc_quality_percentile(spark, sf_dir):
    """Per-language percentile-rank normalization of the quality score —
    the cross-stratum calibration step before global threshold filtering
    (a 0.6 in one language is not a 0.6 in another). percent_rank ties
    depend only on the score, so the value is deterministic without a
    tie-break column; one window per stratum over (lang) partitions."""
    from pyspark.sql import Window

    from raptor_service_spark.functions.text import lang_id, quality_score

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
    )
    w = Window.partitionBy("lang").orderBy("q")
    return base.select(
        "doc_id", "lang", "q", F.round(F.percent_rank().over(w), 6).alias("q_pct")
    )


def _doc_quality_percentile_sql() -> str:
    from raptor_service_spark.functions.text import lang_id_sql, quality_score_sql

    lang = lang_id_sql("text")
    q = quality_score_sql("text")
    return f"""
        WITH b AS (SELECT doc_id, {lang} AS lang, {q} AS q FROM documents)
        SELECT doc_id, lang, q,
               ROUND(PERCENT_RANK() OVER (PARTITION BY lang ORDER BY q), 6)
                   AS q_pct
        FROM b
    """


# ---------------------------------------------------------------------------
# time-series resampling: hourly gap-fill + forward fill; per-cell trend slope
# ---------------------------------------------------------------------------


def q_user_hourly_fill(spark, sf_dir):
    """Per-user hourly resample with gap-fill and forward fill: a dense
    hour grid from each user's first to last event hour, event counts per
    hour (0 on gaps), and the last-known cell carried forward — the
    trajectory regularization step upstream of any fixed-step model.

    Scale shape: one (user, hour) partial+final agg over events (with the
    per-hour last-event pick as a max(struct) — no second window over raw
    events), then a per-user sequence explode bounded by the span in hours
    and one user-partitioned fill window over the AGGREGATED grid."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < 10)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(
        "user_id",
        (F.floor(us / F.lit(3_600_000_000)).cast("long")).alias("hr"),
        F.struct(
            us.alias("us"),
            F.col("event_id").alias("eid"),
            cell_encode_col(lat, lng, 4).alias("cell"),
        ).alias("pick"),
    )
    hourly = pts.groupBy("user_id", "hr").agg(
        F.count(F.lit(1)).alias("n"), F.max("pick").getField("cell").alias("cell")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hr"], "left")
        .select(
            "user_id",
            "hr",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("cell", ignorenulls=True).over(w).alias("cell_filled"),
        )
    )


def _user_hourly_fill_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 4)
    return f"""
        WITH e AS (SELECT user_id, event_id,
                          CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
                          epoch_us(ts) AS us, {cell} AS cell
                   FROM events WHERE user_id < 10),
        last_ev AS (
            SELECT user_id, hr, cell FROM e
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, hr
                                       ORDER BY us DESC, event_id DESC) = 1),
        hourly AS (
            SELECT c.user_id, c.hr, c.n, l.cell
            FROM (SELECT user_id, hr, COUNT(*) AS n FROM e GROUP BY 1, 2) c
            JOIN last_ev l USING (user_id, hr)),
        spans AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1
                  FROM hourly GROUP BY 1),
        grid AS (SELECT s.user_id, UNNEST(generate_series(s.h0, s.h1)) AS hr
                 FROM spans s)
        SELECT g.user_id, g.hr, COALESCE(h.n, 0) AS n_events,
               last_value(h.cell IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hr
                   ROWS UNBOUNDED PRECEDING) AS cell_filled
        FROM grid g LEFT JOIN hourly h USING (user_id, hr)
    """


_TREND_BASE_HR = 473352  # floor(epoch('2024-01-01') / 3600): keeps x tiny/exact


def q_cell_trend_slope(spark, sf_dir):
    """Emerging-hotspot detection: per res-4 cell, the OLS slope of hourly
    event counts over the hour index. x (hour index) and y (counts) are
    small integers, so every sum in the closed-form slope is an EXACTLY
    representable double — cross-engine parity is exact, not rounded.
    Two partial+final aggs on aggregated rows ((cell,hour) then cell);
    top-20 by |slope| via TakeOrderedAndProject."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hc = ev.select(
        cell_encode_col(lat, lng, 4).alias("cell"),
        (F.floor(us / F.lit(3_600_000_000)).cast("long") - F.lit(_TREND_BASE_HR)).alias(
            "x"
        ),
    ).groupBy("cell", "x").agg(F.count(F.lit(1)).alias("y"))
    stats = hc.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return (
        stats.filter(F.col("n_hours") >= 2)
        .select("cell", "n_hours", F.round(slope, 9).alias("slope"))
        .orderBy(F.desc(F.abs(F.col("slope"))), "cell")
        .limit(20)
    )


def _cell_trend_slope_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 4)
    return f"""
        WITH hc AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT)
                       - {_TREND_BASE_HR} AS x,
                   COUNT(*) AS y
            FROM events GROUP BY 1, 2),
        s AS (
            SELECT cell, COUNT(*) AS n_hours,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM hc GROUP BY 1)
        SELECT cell, CAST(n_hours AS BIGINT) AS n_hours,
               ROUND(CAST(n_hours * sxy - sx * sy AS DOUBLE)
                     / CAST(n_hours * sxx - sx * sx AS DOUBLE), 9) AS slope
        FROM s WHERE n_hours >= 2
        ORDER BY ABS(ROUND(CAST(n_hours * sxy - sx * sy AS DOUBLE)
                     / CAST(n_hours * sxx - sx * sx AS DOUBLE), 9)) DESC, cell
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# duplicated-substring screen (Lee et al., "Deduplicating Training Data
# Makes Language Models Better": exact substring dedup via suffix automata;
# here the scalable windowed-hash form) + Mann-Kendall emerging hotspots
# ---------------------------------------------------------------------------

_DUPSUB_WIN, _DUPSUB_STRIDE = 60, 20


def q_doc_dup_substrings(spark, sf_dir):
    """Char-window duplicated-substring screen over the corpus-with-dups:
    every ``win``-char window at ``stride`` offsets is hashed; a window is
    duplicated when its hash occurs >1 time corpus-wide; per doc the
    duplicated windows merge into maximal runs (gaps-and-islands over
    offsets) and the duplicated-char fraction is reported — the operator
    behind 'cut every substring that appears elsewhere in the training
    set' (Lee et al. 2022; the reference deletes whole duplicate docs,
    dataset_repo_pg.py:129-148 — this is the sub-document generalization).

    Scale shape at 100 TB: the window stream is len/stride rows per doc
    (stride trades recall granularity for row count), generated JVM-side;
    ONE global hash-count shuffle (partial+final, map-side combine) marks
    duplicated hashes; the join back is hash-equi; run merging is ONE
    doc-keyed window. No doc×doc work anywhere."""
    win, stride = _DUPSUB_WIN, _DUPSUB_STRIDE
    from pyspark.sql import Window

    d = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    n = F.length("text")
    offs = F.transform(
        F.sequence(F.lit(0), F.floor((n - win) / stride).cast("int")),
        lambda i: i * stride,
    )
    wins = (
        d.filter(n >= win)
        .select("doc_id", "text", n.alias("n_chars"), F.explode(offs).alias("off"))
        .select(
            "doc_id",
            "n_chars",
            "off",
            F.md5(F.expr(f"substring(text, off + 1, {win})")).alias("h"),
        )
    )
    dup_h = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") > 1
    )
    dup = wins.join(dup_h.select("h"), "h")
    w = Window.partitionBy("doc_id").orderBy("off")
    runs = (
        dup.withColumn(
            "new_run",
            (F.col("off") - F.lag("off").over(w) > F.lit(win)).cast("int"),
        )
        .withColumn("run_id", F.sum(F.coalesce("new_run", F.lit(0))).over(w))
        .groupBy("doc_id", "n_chars", "run_id")
        .agg((F.max("off") + F.lit(win) - F.min("off")).alias("run_chars"))
    )
    return (
        runs.groupBy("doc_id", "n_chars")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("run_chars").alias("dup_chars"),
        )
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            "n_runs",
            "dup_chars",
            F.round(F.col("dup_chars") / F.col("n_chars").cast("double"), 6).alias(
                "dup_frac"
            ),
        )
        .orderBy(F.col("dup_frac").desc(), "doc_id")
        .limit(20)
    )


def _doc_dup_substrings_sql() -> str:
    win, stride = _DUPSUB_WIN, _DUPSUB_STRIDE
    return f"""
        WITH d AS (SELECT doc_id, text, length(text) AS n_chars
                   FROM {_DOCS_WITH_DUPS_SQL} t0 WHERE length(text) >= {win}),
        wins AS (
            SELECT doc_id, n_chars, t.i * {stride} AS off,
                   md5(substr(text, t.i * {stride} + 1, {win})) AS h
            FROM d, UNNEST(generate_series(0,
                 CAST(FLOOR((n_chars - {win}) / {stride}) AS BIGINT))) t(i)),
        dup_h AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1),
        dup AS (SELECT w.* FROM wins w JOIN dup_h USING (h)),
        flagged AS (
            SELECT doc_id, n_chars, off,
                   CASE WHEN off - LAG(off) OVER (PARTITION BY doc_id
                        ORDER BY off) > {win} THEN 1 ELSE 0 END AS new_run
            FROM dup),
        runs AS (
            SELECT doc_id, n_chars,
                   SUM(new_run) OVER (PARTITION BY doc_id ORDER BY off) AS run_id,
                   off
            FROM flagged),
        per_run AS (
            SELECT doc_id, n_chars, run_id,
                   MAX(off) + {win} - MIN(off) AS run_chars
            FROM runs GROUP BY 1, 2, 3)
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               COUNT(*) AS n_runs,
               CAST(SUM(run_chars) AS BIGINT) AS dup_chars,
               ROUND(CAST(SUM(run_chars) AS DOUBLE) / n_chars, 6) AS dup_frac
        FROM per_run GROUP BY doc_id, n_chars
        ORDER BY dup_frac DESC, doc_id
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# stratified deterministic sampling + activity bitmask profiling
# ---------------------------------------------------------------------------

_STRAT_QUOTA = 30


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: the first 30 docs per language in
    md5(doc_id) order — the reproducible per-stratum quota sampler a
    training-data pipeline uses for balanced eval sets (stable under
    re-runs, appends, and repartitioning).

    Scale shape: ranking the FULL table in one per-language window is a
    skew hazard (one reducer per stratum), so the window runs only on
    survivors of an exact histogram pre-prune: a 256-bucket count per
    (lang, first-md5-byte) — tiny, map-side combinable — yields the first
    bucket whose running total covers the quota; only rows at-or-below
    that bucket (about quota + one bucket width per stratum) reach the
    window. Bucket order equals md5-string order (fixed-width lowercase
    hex), so the prune is exact, proven by the QUALIFY oracle over the
    full table."""
    from pyspark.sql import Window

    from raptor_service_spark.functions.text import lang_id

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.md5(F.col("doc_id").cast("string"))
    base = d.select(
        "doc_id", lang_id(F.col("text")).alias("lang"), h.alias("h")
    ).withColumn("b", F.conv(F.substring("h", 1, 2), 16, 10).cast("long"))
    hist = base.groupBy("lang", "b").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut = (
        hist.withColumn("cum", F.sum("n").over(wcum))
        .filter(F.col("cum") >= _STRAT_QUOTA)
        .groupBy("lang")
        .agg(F.min("b").alias("cutoff"))
    )
    survivors = base.join(F.broadcast(cut), "lang", "left").filter(
        F.col("b") <= F.coalesce("cutoff", F.lit(255))
    )
    wrk = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= _STRAT_QUOTA)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
    )


def _doc_stratified_sample_sql() -> str:
    from raptor_service_spark.functions.text import lang_id_sql

    lang = lang_id_sql("text")
    return f"""
        WITH d AS (SELECT doc_id, {lang} AS lang,
                          md5(CAST(doc_id AS VARCHAR)) AS h
                   FROM documents)
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id)
                    AS BIGINT) AS rk
        FROM d
        QUALIFY rk <= {_STRAT_QUOTA}
    """


def q_user_activity_mask(spark, sf_dir):
    """Per-user hour-of-day activity bitmask (bit h set = any event in hour
    h) — the compact temporal fingerprint behind bot/shift detection. The
    mask is SUM(DISTINCT 2^hour): exact integer arithmetic in both engines
    (POWER is exact for 2^0..2^23), one partial+final distinct agg."""
    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    hr = F.hour(F.col("ts").cast("timestamp"))
    bit = F.expr("CAST(POWER(2, hour(CAST(ts AS TIMESTAMP))) AS BIGINT)")
    return (
        ev.withColumn("hr", hr)
        .withColumn("bit", bit)
        .groupBy("user_id")
        .agg(
            F.sum_distinct("bit").alias("hour_mask"),
            F.count_distinct("hr").alias("n_active_hours"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _user_activity_mask_sql() -> str:
    return """
        SELECT user_id,
               CAST(SUM(DISTINCT CAST(POWER(2, hour(ts)) AS BIGINT)) AS BIGINT)
                   AS hour_mask,
               CAST(COUNT(DISTINCT hour(ts)) AS BIGINT) AS n_active_hours,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    """


# ---------------------------------------------------------------------------
# spatio-temporal joins: co-location, segment crossings
# ---------------------------------------------------------------------------

_COLOC_EPS, _COLOC_TAU_US = 15.0, 6 * 3600 * 1_000_000
_XING_SPAN, _XING_RES = 30.0, 3


def q_user_colocation(spark, sf_dir):
    """Co-location (contact) join: event pairs of different users within 15
    degrees AND 6 hours of each other, counted per user pair. ONE composite
    (cell, time-bucket) equi-join — the right side rings out 3x3 cells x 3
    buckets so each pair is found exactly once; refine is shared codegen
    arithmetic. The exhaustive-oracle equality proves the candidacy cover."""
    from raptor_service_spark.operators.spatiotemporal import colocation_pairs

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < 40)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    return colocation_pairs(pts, eps=_COLOC_EPS, tau_us=_COLOC_TAU_US)


def _user_colocation_sql() -> str:
    from raptor_service_spark.operators.spatiotemporal import colocation_sql

    lat, lng = _latlng_sql("event_id")
    return colocation_sql(
        "(SELECT * FROM events WHERE user_id < 40) ev",
        eps=_COLOC_EPS,
        tau_us=_COLOC_TAU_US,
        lat_expr=lat,
        lng_expr=lng,
    )


_COTRAVEL_RES, _COTRAVEL_MIN_RUN = 3, 2


def q_cotravel_pairs(spark, sf_dir):
    """Co-TRAVEL detection (the sequential upgrade of the co-location
    contact join): user pairs that share a (res-3 cell, day) bucket on
    >= 2 CONSECUTIVE days — traveling TOGETHER, not merely meeting once.
    The trajectory-privacy / convoy-mining primitive (Jeung et al. convoy
    queries): presence buckets per user (DISTINCT — multiple pings in one
    bucket collapse), one (cell, day) self-join for shared days, then
    gaps-and-islands over each pair's shared-day sequence for the longest
    consecutive run. Output: pairs with max_run >= 2, their longest run
    and total shared days.

    Scale shape at 100 TB: points collapse to presence buckets FIRST (the
    only point-row shuffle); the self-join fans out per (cell, hour)
    bucket occupancy (the co-location candidate bound — hot buckets are
    the quantity being reported); runs are ONE pair-keyed window over the
    shared-hour rows. All-integer output — exact parity."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < 150)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    pres = (
        ev.select(
            "user_id",
            cell_encode_col(lat, lng, _COTRAVEL_RES).alias("cell"),
            day.alias("hr"),
        )
        .distinct()
    )
    a, b = pres.alias("a"), pres.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.hr") == F.col("b.hr"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("ua"),
            F.col("b.user_id").alias("ub"),
            F.col("a.hr").alias("hr"),
        )
        .distinct()  # two shared cells in one hour count once
    )
    w = Window.partitionBy("ua", "ub").orderBy("hr")
    runs = (
        shared.withColumn(
            "brk", (F.col("hr") - F.lag("hr").over(w) > 1).cast("int")
        )
        .withColumn("run_id", F.sum(F.coalesce("brk", F.lit(0))).over(w))
        .groupBy("ua", "ub", "run_id")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("ua", "ub")
        .agg(
            F.max("run_len").alias("max_run"),
            F.sum("run_len").alias("shared_days"),
        )
        .filter(F.col("max_run") >= _COTRAVEL_MIN_RUN)
        .select(
            F.col("ua").alias("user_a"),
            F.col("ub").alias("user_b"),
            "max_run",
            F.col("shared_days").cast("long").alias("shared_days"),
        )
        .orderBy("user_a", "user_b")
    )


def _cotravel_pairs_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _COTRAVEL_RES)
    return f"""
        WITH pres AS (
            SELECT DISTINCT user_id, {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS hr
            FROM events WHERE user_id < 150),
        shared AS (
            SELECT DISTINCT a.user_id AS ua, b.user_id AS ub, a.hr
            FROM pres a JOIN pres b
              ON a.cell = b.cell AND a.hr = b.hr AND a.user_id < b.user_id),
        flagged AS (
            SELECT ua, ub, hr,
                   CASE WHEN hr - LAG(hr) OVER (PARTITION BY ua, ub
                        ORDER BY hr) > 1 THEN 1 ELSE 0 END AS brk
            FROM shared),
        runs AS (
            SELECT ua, ub,
                   SUM(brk) OVER (PARTITION BY ua, ub ORDER BY hr) AS run_id
            FROM flagged),
        per_run AS (
            SELECT ua, ub, run_id, COUNT(*) AS run_len
            FROM runs GROUP BY 1, 2, 3)
        SELECT ua AS user_a, ub AS user_b,
               CAST(MAX(run_len) AS BIGINT) AS max_run,
               CAST(SUM(run_len) AS BIGINT) AS shared_days
        FROM per_run GROUP BY 1, 2
        HAVING MAX(run_len) >= {_COTRAVEL_MIN_RUN}
        ORDER BY 1, 2
    """


_REACH_SEED_USER, _REACH_ROUNDS = 0, 12


def q_contact_reach(spark, sf_dir):
    """Temporal (time-respecting) reachability over the co-location contact
    graph — the contact-tracing / influence-spread primitive: user 0 is
    'exposed' at their first active day; exposure propagates along contact
    edges (ua, ub, day) only FORWARD in time (a contact infects only if it
    happens at-or-after the carrier's own exposure day), and each user
    records their EARLIEST possible exposure day. Classic temporal-graph
    semantics (Holme & Saramäki) — a plain transitive closure would
    overcount by ignoring edge ordering.

    Spark: min-day frontier iteration (the dedup_components dataflow) —
    each round one join of the O(users) exposure table against the
    aggregated contact-edge table + a min-agg; rounds bounded by the
    temporal diameter (≤ days in corpus); localCheckpoint per round.
    Oracle: DuckDB recursive CTE over (user, day) states with the same
    day-ordering predicate, MIN per user. All-integer output."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    pres = ev.select(
        "user_id",
        cell_encode_col(lat, lng, 3).alias("cell"),
        day.alias("day"),
    ).distinct()
    a, b = pres.alias("a"), pres.alias("b")
    # One row per DIRECTED contact pair with its sorted day list: the
    # per-(ua,ub) collect_set replaces the edge-day distinct (one shuffle,
    # not two) and shrinks every propagation round's join from
    # O(edge-days) to O(pairs) — each round then picks the earliest
    # applicable day array-side instead of re-scanning all day copies.
    contacts = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("ua"),
            F.col("b.user_id").alias("ub"),
            F.col("a.day").alias("day"),
        )
        .groupBy("ua", "ub")
        .agg(F.sort_array(F.collect_set("day")).alias("days"))
        .localCheckpoint(eager=True)
    )
    seed_day = (
        pres.filter(F.col("user_id") == _REACH_SEED_USER)
        .agg(F.min("day"))
        .collect()[0][0]
    )
    inf = spark.createDataFrame(
        [(_REACH_SEED_USER, int(seed_day))], "user_id long, day_exposed long"
    ).localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(_REACH_ROUNDS):
        spread = (
            inf.join(contacts, inf.user_id == contacts.ua)
            .select(
                F.col("ub").alias("user_id"),
                # earliest contact day at-or-after the carrier's exposure
                F.array_min(
                    F.filter("days", lambda d: d >= F.col("day_exposed"))
                ).alias("day_exposed"),
            )
            .filter(F.col("day_exposed").isNotNull())
        )
        new_inf = (
            inf.unionByName(spread)
            .groupBy("user_id")
            .agg(F.min("day_exposed").alias("day_exposed"))
            .localCheckpoint(eager=True)
        )
        # monotone iteration (users only added, days only decrease), so the
        # fixpoint test is ONE agg: unchanged (count, sum(day))
        sig = tuple(
            new_inf.agg(
                F.count(F.lit(1)), F.sum("day_exposed")
            ).collect()[0]
        )
        inf = new_inf
        if sig == prev_sig:
            break
        prev_sig = sig
    return inf.orderBy("user_id")


def _contact_reach_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH RECURSIVE pres AS (
            SELECT DISTINCT user_id, {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day
            FROM events),
        contacts AS (
            SELECT DISTINCT a.user_id AS ua, b.user_id AS ub, a.day
            FROM pres a JOIN pres b
              ON a.cell = b.cell AND a.day = b.day
             AND a.user_id != b.user_id),
        seed AS (SELECT {_REACH_SEED_USER} AS user_id, MIN(day) AS day
                 FROM pres WHERE user_id = {_REACH_SEED_USER}),
        states(user_id, day) AS (
            SELECT user_id, day FROM seed
            UNION
            SELECT c.ub, c.day
            FROM states s JOIN contacts c
              ON c.ua = s.user_id AND c.day >= s.day)
        SELECT user_id, CAST(MIN(day) AS BIGINT) AS day_exposed
        FROM states GROUP BY 1 ORDER BY 1
    """


def q_traj_crossings(spark, sf_dir):
    """Trajectory-crossing join: per user pair, how many of their movement
    segments physically intersect (closed semantics). Cover-cell candidates
    + reference-point dedup (pair emitted only in its intersection bbox's
    corner cell — no distinct shuffle); the exact test is the shared CLRS
    straddle arithmetic. Teleport segments (> 30 deg span) are dropped to
    bound the cover factor."""
    from raptor_service_spark.operators.spatiotemporal import (
        segment_crossings,
        user_segments,
    )

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < 25)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    segs = user_segments(pts, max_span=_XING_SPAN)
    return segment_crossings(segs, res=_XING_RES)


def _traj_crossings_sql() -> str:
    from raptor_service_spark.operators.spatiotemporal import segment_crossings_sql

    lat, lng = _latlng_sql("event_id")
    return segment_crossings_sql(
        "(SELECT * FROM events WHERE user_id < 25) ev",
        max_span=_XING_SPAN,
        lat_expr=lat,
        lng_expr=lng,
    )


_SNAP_SPAN, _SNAP_DIST, _SNAP_RES = 30.0, 5.0, 4


def q_snap_points(spark, sf_dir):
    """Map-matching primitive: snap each ping of one user cohort (user_id %
    5 == 1) to the nearest trajectory segment of another (user_id % 5 == 3)
    within 5 degrees — clamped point-to-line projection as ONE shared
    arithmetic string. Candidates via max_dist-expanded cover cells (each
    point has one cell, so pairs never duplicate and the per-point argmin
    is a plain struct-min agg); the exhaustive-join oracle proves the
    candidacy complete. See `operators/spatiotemporal.py`."""
    from raptor_service_spark.operators.spatiotemporal import (
        snap_to_segments,
        user_segments,
    )

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    roads = ev.filter(F.col("user_id") % 5 == 3).withColumn("lat", lat).withColumn("lng", lng)
    segs = user_segments(roads, max_span=_SNAP_SPAN)
    pts = (
        ev.filter(F.col("user_id") % 5 == 1)
        .select(F.col("event_id").alias("pid"), lng.alias("px"), lat.alias("py"))
    )
    return snap_to_segments(pts, segs, res=_SNAP_RES, max_dist=_SNAP_DIST)


def _snap_points_sql() -> str:
    from raptor_service_spark.operators.spatiotemporal import snap_to_segments_sql

    lat, lng = _latlng_sql("event_id")
    return snap_to_segments_sql(
        points_sql=f"(SELECT event_id AS pid, {lng} AS px, {lat} AS py "
        "FROM events WHERE user_id % 5 = 1)",
        events_sql="(SELECT * FROM events WHERE user_id % 5 = 3) ev",
        max_span=_SNAP_SPAN,
        max_dist=_SNAP_DIST,
        lat_expr=lat,
        lng_expr=lng,
    )


_VIT_L, _VIT_K, _VIT_EPS, _VIT_COHORT = 6, 3, 25.0, 40


def q_viterbi_match(spark, sf_dir):
    """HMM map-matching (Newson & Krumm 2009, the hidden-Markov matcher
    behind every map-matching service): each user's trajectory, resampled
    to L=6 fixes (the dtw_pairs rank arithmetic), is matched to the
    document 'road node' set — candidate states per fix are the K=3
    nearest nodes within ε (ring-join, never fix × node), emission cost =
    fix→node distance, transition cost = |node-to-node distance −
    fix-step distance| (the Newson-Krumm route/great-circle discrepancy in
    its straight-line form). The Viterbi DP unrolls over the L fixed steps
    as relational min-aggregations — the kmeans_geo/dtw unroll technique —
    so the whole matcher is value-checked against an unrolled-CTE DuckDB
    twin whose candidate stage is the EXHAUSTIVE join (proving the ring
    candidacy complete). Output: per user the matched end node + total
    path cost.

    Scale shape at 100 TB: one user-window resample (points touched once),
    one ε ring-join for candidates, then L−1 rounds of join+min-agg on the
    O(users × K) DP table. All users advance in parallel; no per-user
    driver work, no UDF. Float convention: costs rounded 9 dp per step
    (min is order-free), 6 dp at the output."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.pip_join import within_distance_join

    L, K = _VIT_L, _VIT_K
    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _VIT_COHORT)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        F.col("user_id").alias("uid"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        lat.alias("lat"),
        lng.alias("lng"),
    )
    fixes = (
        ranked.select(
            "uid", "rn", "n", "lat", "lng",
            F.explode(F.sequence(F.lit(0), F.lit(L - 1))).alias("i"),
        )
        .filter(F.col("rn") == F.floor(F.col("i") * F.col("n") / L) + 1)
        .select("uid", "i", "lat", "lng")
    )
    d = _read(spark, sf_dir, "documents").select("doc_id")
    nlat, nlng = _latlng_cols(F.col("doc_id"))
    nodes = d.select(
        F.col("doc_id").alias("nid"), nlat.alias("lat"), nlng.alias("lng")
    )
    call = within_distance_join(fixes, nodes, eps=_VIT_EPS).select(
        F.col("l.uid").alias("uid"),
        F.col("l.i").alias("i"),
        F.col("r.nid").alias("nid"),
        F.col("r.lng").alias("nx"),
        F.col("r.lat").alias("ny"),
        F.col("dist").alias("e"),
    )
    wk = Window.partitionBy("uid", "i").orderBy(F.col("e").asc(), F.col("nid").asc())
    cand = (
        call.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= K)
        .drop("rk")
    )
    ok = (
        cand.groupBy("uid")
        .agg(F.countDistinct("i").alias("ni"))
        .filter(F.col("ni") == L)
        .select("uid")
    )
    # O(users × L × K) rows; materialized once, read back L+1 times by the
    # per-step filters below
    cand = cand.join(F.broadcast(ok), "uid").localCheckpoint(eager=True)

    wf = Window.partitionBy("uid").orderBy("i")
    dx = F.col("lng") - F.col("px")
    dy = F.col("lat") - F.col("py")
    gd = (
        fixes.withColumn("px", F.lag("lng").over(wf))
        .withColumn("py", F.lag("lat").over(wf))
        .filter(F.col("px").isNotNull())
        .select(
            "uid",
            F.col("i").alias("t"),
            F.round(F.sqrt(dx * dx + dy * dy), 9).alias("gd"),
        )
    )

    dp = cand.filter(F.col("i") == 0).select(
        "uid", "nid", "nx", "ny", F.round(F.col("e"), 9).alias("cost")
    )
    for t in range(1, L):
        ct = cand.filter(F.col("i") == t).select(
            "uid",
            F.col("nid").alias("cnid"),
            F.col("nx").alias("cnx"),
            F.col("ny").alias("cny"),
            F.col("e").alias("ce"),
        )
        g = gd.filter(F.col("t") == t).select("uid", "gd")
        tdx = F.col("nx") - F.col("cnx")
        tdy = F.col("ny") - F.col("cny")
        trans = F.round(F.abs(F.sqrt(tdx * tdx + tdy * tdy) - F.col("gd")), 9)
        step = (
            dp.join(ct, "uid")
            .join(g, "uid")
            .select("uid", "cnid", "cnx", "cny", "ce", (F.col("cost") + trans).alias("tc"))
        )
        dp = (
            step.groupBy("uid", "cnid", "cnx", "cny", "ce")
            .agg(F.round(F.min("tc"), 9).alias("mc"))
            .select(
                "uid",
                F.col("cnid").alias("nid"),
                F.col("cnx").alias("nx"),
                F.col("cny").alias("ny"),
                F.round(F.col("mc") + F.col("ce"), 9).alias("cost"),
            )
        )
    best = dp.groupBy("uid").agg(
        F.min(
            F.struct(F.round(F.col("cost"), 6).alias("c"), F.col("nid").alias("nid"))
        ).alias("b")
    )
    return best.select(
        F.col("uid").alias("user_id"),
        F.col("b.nid").alias("end_node"),
        F.col("b.c").alias("match_cost"),
    ).orderBy("user_id")


def _viterbi_match_sql() -> str:
    L, K, eps = _VIT_L, _VIT_K, _VIT_EPS
    lat, lng = _latlng_sql("event_id")
    nlat, nlng = _latlng_sql("doc_id")
    edist = "SQRT((f.x - n.nx) * (f.x - n.nx) + (f.y - n.ny) * (f.y - n.ny))"
    dps = []
    for t in range(1, L):
        dps.append(f"""dp{t} AS (
            SELECT uid, cnid AS nid, cnx AS nx, cny AS ny,
                   ROUND(mc + ce, 9) AS cost
            FROM (
                SELECT c.uid, c.nid AS cnid, c.nx AS cnx, c.ny AS cny,
                       c.e AS ce,
                       ROUND(MIN(p.cost
                             + ROUND(ABS(SQRT((p.nx - c.nx) * (p.nx - c.nx)
                                            + (p.ny - c.ny) * (p.ny - c.ny))
                                         - g.gd), 9)), 9) AS mc
                FROM dp{t - 1} p
                JOIN c ON c.uid = p.uid AND c.i = {t}
                JOIN gd g ON g.uid = p.uid AND g.t = {t}
                GROUP BY c.uid, c.nid, c.nx, c.ny, c.e))""")
    chain = ",\n        ".join(dps)
    return f"""
        WITH p AS (SELECT user_id AS uid, ts, event_id,
                          {lng} AS x, {lat} AS y
                   FROM events WHERE user_id < {_VIT_COHORT}),
        r AS (SELECT uid, x, y,
                     ROW_NUMBER() OVER (PARTITION BY uid
                                        ORDER BY ts, event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY uid) AS n
              FROM p),
        fx AS (SELECT r.uid, v.i, r.x, r.y
               FROM r JOIN (SELECT UNNEST(RANGE({L})) AS i) v
                 ON r.rn = CAST(FLOOR(v.i * r.n / {L}) AS BIGINT) + 1),
        nodes AS (SELECT doc_id AS nid, {nlng} AS nx, {nlat} AS ny
                  FROM documents),
        call AS (
            SELECT f.uid, f.i, n.nid, n.nx, n.ny, ROUND({edist}, 6) AS e
            FROM fx f JOIN nodes n ON ROUND({edist}, 6) <= {eps!r}),
        cand AS (
            SELECT uid, i, nid, nx, ny, e FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY uid, i
                                             ORDER BY e, nid) AS rk
                FROM call) WHERE rk <= {K}),
        ok AS (SELECT uid FROM cand GROUP BY uid
               HAVING COUNT(DISTINCT i) = {L}),
        c AS MATERIALIZED (SELECT cand.* FROM cand JOIN ok USING (uid)),
        gd AS MATERIALIZED (
            SELECT uid, i AS t,
                   ROUND(SQRT((x - px) * (x - px) + (y - py) * (y - py)), 9)
                       AS gd
            FROM (SELECT uid, i, x, y,
                         LAG(x) OVER (PARTITION BY uid ORDER BY i) AS px,
                         LAG(y) OVER (PARTITION BY uid ORDER BY i) AS py
                  FROM fx) WHERE px IS NOT NULL),
        dp0 AS (SELECT uid, nid, nx, ny, ROUND(e, 9) AS cost
                FROM c WHERE i = 0),
        {chain}
        SELECT uid AS user_id, nid AS end_node, ROUND(cost, 6) AS match_cost
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY uid
                        ORDER BY ROUND(cost, 6), nid) AS rk
              FROM dp{L - 1})
        WHERE rk = 1
        ORDER BY user_id
    """


_DTW_L, _DTW_COHORT = 8, 30


def q_dtw_pairs(spark, sf_dir):
    """DTW trajectory similarity for a 30-user cohort, resampled to 8
    points — the L×L dynamic program unrolled anti-diagonal by
    anti-diagonal into flat codegen Projects (NO UDF, no Python; the same
    cell formulas run as a CTE chain in the oracle, so floats are
    bit-identical by construction). All-pairs is inherently quadratic:
    callers bound the cohort or block first. See `operators/dtw.py`."""
    from raptor_service_spark.operators.dtw import dtw_pairs, resample_traj

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _DTW_COHORT)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    return dtw_pairs(resample_traj(pts, _DTW_L), _DTW_L)


def _dtw_pairs_sql() -> str:
    from raptor_service_spark.operators.dtw import dtw_pairs_sql

    lat, lng = _latlng_sql("event_id")
    return dtw_pairs_sql(
        f"(SELECT * FROM events WHERE user_id < {_DTW_COHORT}) ev",
        _DTW_L,
        lat_expr=lat,
        lng_expr=lng,
    )


def q_hausdorff_pairs(spark, sf_dir):
    """Symmetric Hausdorff distance (squared, 6 dp) for the same 30-user
    cohort as `dtw_pairs` — the set-to-set bottleneck metric (no path
    monotonicity). The metric is ONE nested higher-order-function
    projection (transform → array_min → array_max), fully codegen: no
    explode, no UDF, no extra rows. See `operators/dtw.py`."""
    from raptor_service_spark.operators.dtw import hausdorff_pairs, resample_traj

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _DTW_COHORT)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    return hausdorff_pairs(resample_traj(pts, _DTW_L), _DTW_L)


def _hausdorff_pairs_sql() -> str:
    from raptor_service_spark.operators.dtw import hausdorff_pairs_sql

    lat, lng = _latlng_sql("event_id")
    return hausdorff_pairs_sql(
        f"(SELECT * FROM events WHERE user_id < {_DTW_COHORT}) ev",
        _DTW_L,
        lat_expr=lat,
        lng_expr=lng,
    )


# ---------------------------------------------------------------------------
# cell-graph algorithms: BFS isochrone, PageRank (operators/cell_graph.py)
# ---------------------------------------------------------------------------

_ISO_RES, _ISO_HOPS = 5, 6


def _iso_seed_cell() -> int:
    """Cell of doc_id=1's synthetic position — identical constant for both
    engines (Python replica of _latlng_cols + the numpy grid encoder)."""
    from raptor_service_spark.geo.grid import cell_encode_np

    h = (1 * _HM) % _HMOD
    lat = (h % 1700) / 10.0 - 85.0 + 0.05
    lng = ((h // 1700) % 3580) / 10.0 - 179.0 + 0.05
    return int(cell_encode_np([lat], [lng], _ISO_RES)[0])


def q_cell_isochrone(spark, sf_dir):
    """BFS hop-distance rings (isochrone) from doc 1's cell over the
    occupied res-5 document cells, 8-adjacency, <= 6 hops. Iterative
    frontier expansion — one equi-join + anti-join per round over the
    O(occupied cells) table; the recursive-CTE oracle proves the loop."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import bfs_hops

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ = d.select(cell_encode_col(lat, lng, _ISO_RES).alias("cell"))
    return bfs_hops(occ, _iso_seed_cell(), res=_ISO_RES, max_hops=_ISO_HOPS)


def _cell_isochrone_sql() -> str:
    from raptor_service_spark.operators.cell_graph import bfs_hops_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _ISO_RES)
    return bfs_hops_sql(
        f"SELECT {cell} AS cell FROM documents",
        _iso_seed_cell(),
        res=_ISO_RES,
        max_hops=_ISO_HOPS,
    )


def q_cell_sssp(spark, sf_dir):
    """Weighted shortest path (Bellman-Ford, 8 fixed rounds) from doc 1's
    cell over occupied res-5 document cells: entering a cell costs
    1 + its doc count — an integer congestion cost, so distances are EXACT
    across engines (no float protocol). Per round: one join of the
    O(reached) dist table into the edge list + one min-agg; the oracle
    unrolls the same rounds as CTEs. See `operators/cell_graph.py`."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import sssp

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ_w = (
        d.select(cell_encode_col(lat, lng, _ISO_RES).alias("cell"))
        .groupBy("cell")
        .agg((F.lit(1) + F.count(F.lit(1))).alias("w"))
    )
    return sssp(occ_w, _iso_seed_cell(), res=_ISO_RES, n_rounds=8)


def _cell_sssp_sql() -> str:
    from raptor_service_spark.operators.cell_graph import sssp_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _ISO_RES)
    return sssp_sql(
        f"SELECT {cell} AS cell, 1 + COUNT(*) AS w FROM documents GROUP BY 1",
        _iso_seed_cell(),
        res=_ISO_RES,
        n_rounds=8,
    )


def q_cell_pagerank(spark, sf_dir):
    """PageRank over the res-3 OD cell-transition graph (edge weight =
    transition count): which tiles do trajectories flow INTO. Fixed 5
    damped iterations, per-iteration 9-dp rounding for cross-engine
    determinism; the oracle unrolls the identical iterations as a CTE
    chain. Points are touched once (the OD window + count); every
    iteration joins/aggregates the O(cells) tables only."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import pagerank

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 3))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        pts.withColumn("prev_cell", F.lag("cell").over(w))
        .filter(F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell")))
        .groupBy(F.col("prev_cell").alias("src"), F.col("cell").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return pagerank(edges, n_iters=5, damping=0.85)


def _cell_pagerank_sql() -> str:
    from raptor_service_spark.operators.cell_graph import pagerank_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    edges = f"""
        SELECT prev_cell AS src, cell AS dst, CAST(COUNT(*) AS DOUBLE) AS w
        FROM (SELECT cell, LAG(cell) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_cell
              FROM (SELECT user_id, ts, event_id, {cell} AS cell FROM events))
        WHERE prev_cell IS NOT NULL AND prev_cell != cell
        GROUP BY 1, 2
    """
    return pagerank_sql(edges, n_iters=5, damping=0.85)


# ---------------------------------------------------------------------------
# sorted-neighborhood dedup (the record-linkage classic, 6th dedup family)
# ---------------------------------------------------------------------------


def q_snm_pairs(spark, sf_dir):
    """Blocked sorted-neighborhood near-dup join over the duplicated corpus:
    sort by normalized text key per block, compare each record with its 3
    successors only (O(n·w) candidates — no hashing, no inverted index),
    exact word-set Jaccard >= 0.6 verify. Twin docs have identical keys, so
    they are adjacent and surface at jaccard 1.0
    (operators/dedup.py:snm_pairs scale + miss-model notes)."""
    from raptor_service_spark.operators.dedup import snm_pairs

    return snm_pairs(_docs_with_dups(spark, sf_dir), window=3, threshold=0.6)


def _snm_pairs_sql() -> str:
    from raptor_service_spark.operators.dedup import snm_pairs_sql

    return snm_pairs_sql(_DOCS_WITH_DUPS_SQL, window=3, threshold=0.6)


# ---------------------------------------------------------------------------
# triangle counting on the OD cell graph (mobility-graph cohesion)
# ---------------------------------------------------------------------------


def q_od_triangles(spark, sf_dir):
    """Per-cell triangle participation on the undirected OD graph: distinct
    movement edges → oriented (a < b) edge list → the standard two-join
    triangle enumeration (each triangle found exactly once as a < b < c) →
    per-node counts. The classic graph-cohesion statistic over the same
    mobility edges as cell_pagerank. Scale shape: event rows cross ONE
    window shuffle into the edge agg; triangle joins run on the O(occupied
    cells²)-bounded DISTINCT edge table — never on raw events; the a < b < c
    orientation makes dedup free."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 3))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    moves = pts.withColumn("prev_cell", F.lag("cell").over(w)).filter(
        F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell"))
    )
    edges = (
        moves.select(
            F.least("prev_cell", "cell").alias("a"),
            F.greatest("prev_cell", "cell").alias("b"),
        )
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, (F.col("e1.b") == F.col("e2.a")))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("cell")
    )


def _od_triangles_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH pts AS (SELECT user_id, ts, event_id, {cell} AS cell FROM events),
        mv AS (SELECT cell, LAG(cell) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev_cell
               FROM pts),
        edges AS (SELECT DISTINCT LEAST(prev_cell, cell) AS a,
                                  GREATEST(prev_cell, cell) AS b
                  FROM mv WHERE prev_cell IS NOT NULL AND prev_cell != cell),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM edges e1
                JOIN edges e2 ON e1.b = e2.a
                JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT cell, COUNT(*) AS n_triangles
        FROM (SELECT x AS cell FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY cell
        ORDER BY cell
    """


# ---------------------------------------------------------------------------
# MMR diversification re-rank (diversity-aware retrieval, grouped kernel)
# ---------------------------------------------------------------------------

_MMR_N, _MMR_K, _MMR_LAM = 15, 5, 0.7


def _cos_cols(va, vb):
    """Cosine between two vector COLUMNS — the same sequential zip_with fold
    as functions/vector.cosine_sim_col (proven 6-dp DuckDB parity)."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def q_mmr_retrieval(spark, sf_dir):
    """Diversity-aware retrieval: per query, top-15 cosine candidates are
    greedily re-ranked by Maximal Marginal Relevance (k=5, λ=0.7) — relevance
    minus redundancy against what's already picked. Relevance and pairwise
    sims are 6-dp JVM folds; the sequential selection (inexpressible as a
    window/join) runs as ONE grouped Arrow kernel over per-query O(N²) pair
    rows, shuffling once on qid regardless of corpus or query count
    (operators/mmr.py scale notes)."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.mmr import mmr_select

    e = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cands = []
    for qid, qv in (("qa", QVEC), ("qb", QVEC3)):
        from raptor_service_spark.functions.vector import cosine_sim_col

        rel = F.round(cosine_sim_col(F.col("embedding"), qv), 6)
        cands.append(
            e.select(
                F.lit(qid).alias("qid"),
                F.col("vec_id").alias("id"),
                rel.alias("rel"),
                F.col("embedding").alias("v"),
            )
            .orderBy(F.desc("rel"), F.asc("id"))
            .limit(_MMR_N)
        )
    cand = cands[0].unionByName(cands[1])
    a = cand.select("qid", F.col("id").alias("id_a"), F.col("rel").alias("rel_a"), F.col("v").alias("va"))
    b = cand.select("qid", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, "qid").select(
        "qid",
        "id_a",
        "rel_a",
        "id_b",
        F.round(_cos_cols(F.col("va"), F.col("vb")), 6).alias("sim"),
    )
    return mmr_select(pairs, k=_MMR_K, lam=_MMR_LAM)


def _mmr_retrieval_sql() -> str:
    from raptor_service_spark.operators.mmr import mmr_oracle_sql

    qvec3_sql = "[" + ", ".join(f"{x:.6f}" for x in QVEC3) + "]"
    cand_sql = f"""
        SELECT qid, id, rel FROM (
            SELECT q.qid, e.vec_id AS id,
                   ROUND(list_cosine_similarity(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) AS rel,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.qid
                       ORDER BY ROUND(list_cosine_similarity(
                           list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                       e.vec_id) AS rn
            FROM embeddings e
            CROSS JOIN (VALUES ('qa', {QVEC_SQL}), ('qb', {qvec3_sql})) q(qid, qv))
        WHERE rn <= {_MMR_N}
    """
    sims_sql = f"""
        SELECT a.qid, a.id AS id_a, b.id AS id_b,
               ROUND(list_cosine_similarity(
                   list_transform(ea.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(eb.embedding, x -> CAST(x AS DOUBLE))), 6) AS sim
        FROM cand a JOIN cand b ON a.qid = b.qid
        JOIN embeddings ea ON ea.vec_id = a.id
        JOIN embeddings eb ON eb.vec_id = b.id
    """
    return mmr_oracle_sql(cand_sql, sims_sql, k=_MMR_K, lam=_MMR_LAM)


# ---------------------------------------------------------------------------
# LISA: local Moran's I cluster/outlier map
# ---------------------------------------------------------------------------


def q_local_moran(spark, sf_dir):
    """Anselin local Moran's I per occupied res-5 cell with HH/LL/HL/LH
    quadrant labels — the per-cell decomposition of the global morans_i
    query: where the hot clusters, cold clusters, and spatial outliers sit.
    Same one-point-shuffle + O(cells) ring-join shape as morans_i."""
    from raptor_service_spark.operators.spatial_stats import local_morans_i

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    return local_morans_i(
        d.withColumn("lat", lat).withColumn("lng", lng), res=5
    )


def _local_moran_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import local_morans_sql

    lat, lng = _latlng_sql("doc_id")
    return local_morans_sql("documents", lat, lng, res=5)


# ---------------------------------------------------------------------------
# unigram-LM perplexity quality filter (the rare-word outlier detector)
# ---------------------------------------------------------------------------


def q_doc_perplexity(spark, sf_dir):
    """Per-document unigram negative log-likelihood against the corpus's own
    unigram model — the perplexity filter every LM data pipeline runs (docs
    whose words are corpus-rare score high and get reviewed/dropped). Top-20
    most-perplexing docs. Scale shape: the token stream shuffles once into
    the corpus count agg (map-side combinable) and once joining counts back
    token-to-token (AQE-handled; never doc x doc); the scalar total
    broadcasts. NLL is avg(-ln p) rounded 6 dp in both engines."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    cnts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = cnts.agg(F.sum("cnt").cast("double").alias("total"))
    scored = (
        toks.join(cnts, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(-F.ln(F.col("cnt") / F.col("total"))), 6).alias("nll"),
        )
    )
    return scored.orderBy(F.desc("nll"), "doc_id").limit(20)


def _doc_perplexity_sql() -> str:
    return """
        WITH toks AS (
            SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
            FROM documents),
        cnts AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY 1),
        tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM cnts)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(-LN(cnt / total)), 6) AS nll
        FROM toks JOIN cnts USING (w) CROSS JOIN tot
        GROUP BY doc_id
        ORDER BY nll DESC, doc_id
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# trajectory simplification: one-pass Visvalingam-Whyatt area filter
# ---------------------------------------------------------------------------

_VW_TAU = 25.0  # degree² effective-area threshold


def q_trajectory_simplify(spark, sf_dir):
    """Per-user trajectory simplification summary: one-pass Visvalingam-
    Whyatt — each interior point's effective triangle area against its
    ordered neighbors (lag/lead), dropped when below τ; endpoints always
    survive. Output per user: point count, kept count, 6-dp compression
    ratio. ONE window shuffle (partitionBy user, orderBy ts); the area is
    a codegen cross product — no Python, no self-join. The iterative VW
    refinement would re-run this pass; a single pass is the standard
    streaming variant."""
    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        "user_id", "ts", "event_id", lat.alias("lat"), lng.alias("lng")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        pts.withColumn("lat0", F.lag("lat").over(w))
        .withColumn("lng0", F.lag("lng").over(w))
        .withColumn("lat2", F.lead("lat").over(w))
        .withColumn("lng2", F.lead("lng").over(w))
    )
    area = F.abs(
        (F.col("lat") - F.col("lat0")) * (F.col("lng2") - F.col("lng0"))
        - (F.col("lat2") - F.col("lat0")) * (F.col("lng") - F.col("lng0"))
    ) / F.lit(2.0)
    keep = (
        F.col("lat0").isNull() | F.col("lat2").isNull() | (area >= F.lit(_VW_TAU))
    ).cast("int")
    out = p.withColumn("keep", keep).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.round(F.sum("keep") / F.count(F.lit(1)), 6).alias("keep_ratio"),
    )
    return out.orderBy("user_id")


def _trajectory_simplify_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH pts AS (SELECT user_id, ts, event_id, {lat} AS lat, {lng} AS lng
                     FROM events),
        p AS (SELECT user_id, lat, lng,
                     LAG(lat)  OVER w AS lat0, LAG(lng)  OVER w AS lng0,
                     LEAD(lat) OVER w AS lat2, LEAD(lng) OVER w AS lng2
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        k AS (SELECT user_id,
                     CASE WHEN lat0 IS NULL OR lat2 IS NULL
                               OR ABS((lat - lat0) * (lng2 - lng0)
                                    - (lat2 - lat0) * (lng - lng0)) / 2.0
                                  >= {_VW_TAU!r} THEN 1 ELSE 0 END AS keep
              FROM p)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(keep) AS BIGINT) AS n_kept,
               ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_ratio
        FROM k GROUP BY user_id
        ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# end-to-end curation pipeline: quality → lang → dedup → split → stats
# ---------------------------------------------------------------------------


def q_curation_pipeline(spark, sf_dir):
    """The full training-data curation chain as ONE declarative plan:
    quality-score filter (>= 0.5) → language-ID filter (drop 'und') →
    whole-doc exact dedup (first occurrence by fingerprint) → deterministic
    md5 train/valid/test split → per (split, lang) corpus stats. Every stage
    is codegen expressions over one scan; dedup is the only extra shuffle
    (window on the fingerprint); stats are one partial+final agg. This is
    the composition the individual oracle-checked stages exist FOR."""
    from raptor_service_spark.functions.text import hash_split, token_count

    d = _docs_with_dups(spark, sf_dir)
    scored = d.select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lang"),
        token_count(F.col("text")).alias("toks"),
        fingerprint(F.col("text")).alias("fp"),
    ).filter((F.col("q") >= 0.5) & (F.col("lang") != "und"))
    from pyspark.sql import Window

    win = Window.partitionBy("fp").orderBy("doc_id")
    kept = scored.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") == 1)
    out = (
        kept.withColumn("split", hash_split(F.col("doc_id")))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
        )
    )
    return out.orderBy("split", "lang")


def _curation_pipeline_sql() -> str:
    from raptor_service_spark.functions.text import (
        fingerprint_sql,
        hash_split_sql,
        token_count_sql,
    )

    return f"""
        WITH scored AS (
            SELECT doc_id,
                   {quality_score_sql('text')} AS q,
                   {lang_id_sql('text')} AS lang,
                   {token_count_sql('text')} AS toks,
                   {fingerprint_sql('text')} AS fp
            FROM {_DOCS_WITH_DUPS_SQL}
        ),
        f AS (SELECT * FROM scored WHERE q >= 0.5 AND lang != 'und'),
        kept AS (SELECT * FROM (
                    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                                                 ORDER BY doc_id) AS rn
                    FROM f) WHERE rn = 1)
        SELECT {hash_split_sql('doc_id')} AS split, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               ROUND(AVG(q), 6) AS avg_quality
        FROM kept
        GROUP BY 1, 2
        ORDER BY split, lang
    """


# ---------------------------------------------------------------------------
# web-Mercator XYZ / quadkey tiling (the map-serving address space)
# ---------------------------------------------------------------------------

_QK_ZOOM = 5


def q_quadkey_tiles(spark, sf_dir):
    """Occupied web-Mercator tiles at zoom 5 with doc counts and the zoom-3
    parent quadkey — the slippy-map/XYZ address space a tile server fetches,
    alongside the engine's native equirectangular grid. Encode is ONE
    generated arithmetic string (geo/mercator.py) run as F.expr here and
    verbatim in the oracle; the rollup groups on the BIGINT (x, y) pair and
    renders quadkey strings only per OUTPUT group."""
    from raptor_service_spark.geo.mercator import (
        quadkey_parent_sql,
        quadkey_sql,
        xtile_sql,
        ytile_sql,
    )

    lat_s, lng_s = _latlng_sql("doc_id")
    d = _read(spark, sf_dir, "documents").select("doc_id")
    tiles = d.select(
        F.expr(xtile_sql(lng_s, _QK_ZOOM)).alias("x"),
        F.expr(ytile_sql(lat_s, _QK_ZOOM)).alias("y"),
    )
    agg = tiles.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_docs"))
    qk = quadkey_sql("x", "y", _QK_ZOOM)
    return agg.select(
        F.expr(qk).alias("quadkey"),
        F.expr(quadkey_parent_sql(qk, 2)).alias("quadkey_z3"),
        "x",
        "y",
        "n_docs",
    ).orderBy("quadkey")


def _quadkey_tiles_sql() -> str:
    from raptor_service_spark.geo.mercator import (
        quadkey_parent_sql,
        quadkey_sql,
        xtile_sql,
        ytile_sql,
    )

    lat_s, lng_s = _latlng_sql("doc_id")
    qk = quadkey_sql("x", "y", _QK_ZOOM)
    return f"""
        WITH t AS (SELECT {xtile_sql(lng_s, _QK_ZOOM)} AS x,
                          {ytile_sql(lat_s, _QK_ZOOM)} AS y
                   FROM documents),
        a AS (SELECT x, y, COUNT(*) AS n_docs FROM t GROUP BY 1, 2)
        SELECT {qk} AS quadkey, {quadkey_parent_sql(qk, 2)} AS quadkey_z3,
               x, y, n_docs
        FROM a ORDER BY quadkey
    """


# ---------------------------------------------------------------------------
# sub-document dedup: span-level first-occurrence + reassembly
# ---------------------------------------------------------------------------


def q_span_dedup(spark, sf_dir):
    """Paragraph-level (span) exact dedup with document reassembly over the
    duplicated corpus — the sub-document pass a training pipeline runs after
    whole-doc dedup (twin docs keep 0 spans; genuinely repeated 10-word
    windows inside originals dedup too). One window shuffle on the span
    hash + one reassembly agg (operators/dedup.py:span_dedup_reassemble)."""
    from raptor_service_spark.operators.dedup import span_dedup_reassemble

    return span_dedup_reassemble(_docs_with_dups(spark, sf_dir))


def _span_dedup_sql() -> str:
    from raptor_service_spark.operators.dedup import span_dedup_sql

    return span_dedup_sql(_DOCS_WITH_DUPS_SQL)


# ---------------------------------------------------------------------------
# point-pattern statistics: Ripley's K and Mann-Kendall emerging hotspots
# ---------------------------------------------------------------------------

_RIPLEY_BANDS = [0.5, 1.0, 2.0]


def q_ripley_k(spark, sf_dir):
    """Multi-band Ripley's K / L over the document point pattern (degree
    space, naive edge handling): is the corpus spatially clustered, and at
    what scale? Pairs come from ONE grid ε-join at the widest band — no
    all-pairs join (operators/spatial_stats.py:ripley_k scale notes)."""
    from raptor_service_spark.operators.spatial_stats import ripley_k

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(F.col("doc_id").alias("id"), lat.alias("lat"), lng.alias("lng"))
    return ripley_k(pts, bands=_RIPLEY_BANDS)


def _ripley_k_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import ripley_k_sql

    lat, lng = _latlng_sql("doc_id")
    return ripley_k_sql("documents", "doc_id", lat, lng, bands=_RIPLEY_BANDS)


def q_emerging_hotspots(spark, sf_dir):
    """Space-time-cube trend classification: per res-3 cell, the Mann-Kendall
    z over the daily event-count series labels the cell increasing /
    decreasing / flat — the 'emerging hot spot' companion of the static
    Getis-Ord Gi*. Event rows see exactly one shuffle (the (cell, day)
    cube agg); the day-pair join is bounded by the calendar, not the data
    (operators/spatial_stats.py:mann_kendall_cells scale notes)."""
    from raptor_service_spark.operators.spatial_stats import mann_kendall_cells

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        F.col("ts"), lat.alias("lat"), lng.alias("lng")
    )
    return mann_kendall_cells(pts, res=3, min_days=8)


def _emerging_hotspots_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import mann_kendall_sql

    lat, lng = _latlng_sql("event_id")
    return mann_kendall_sql(
        "(SELECT event_id, ts FROM events)", lat, lng, res=3, min_days=8
    )


def q_cusum_cells(spark, sf_dir):
    """Per-cell CUSUM change-point day (max deviation of the cumulative
    daily count from a constant-rate line) — completes the trend family:
    Mann-Kendall = direction, Theil-Sen = magnitude, CUSUM = WHEN. See
    `operators/spatial_stats.py`."""
    from raptor_service_spark.operators.spatial_stats import cusum_cells

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(F.col("ts"), lat.alias("lat"), lng.alias("lng"))
    return cusum_cells(pts, res=3, min_days=8)


def _cusum_cells_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import cusum_sql

    lat, lng = _latlng_sql("event_id")
    return cusum_sql("(SELECT event_id, ts FROM events)", lat, lng, res=3, min_days=8)


def q_theil_sen(spark, sf_dir):
    """Per-cell Theil-Sen slope (median of pairwise daily-count slopes) —
    the robust trend magnitude next to Mann-Kendall's direction test; same
    one-shuffle space-time-cube shape. See `operators/spatial_stats.py`."""
    from raptor_service_spark.operators.spatial_stats import theil_sen_cells

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(F.col("ts"), lat.alias("lat"), lng.alias("lng"))
    return theil_sen_cells(pts, res=3, min_days=8)


def _theil_sen_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import theil_sen_sql

    lat, lng = _latlng_sql("event_id")
    return theil_sen_sql("(SELECT event_id, ts FROM events)", lat, lng, res=3, min_days=8)


_KANON_K, _KANON_LADDER = 5, (8, 6, 4, 2, 0)


def q_kanon_cells(spark, sf_dir):
    """k-anonymous location generalization (the privacy scrub a training
    pipeline applies before releasing location-derived features): each
    user's res-8 home cell is coarsened up the parent ladder (8→6→4→2→0)
    to the FINEST resolution whose cell contains ≥ k=5 users' homes — the
    classic spatial k-anonymity hierarchy walk, closed-form over the
    ladder (no iteration: all levels counted in one agg, per-user argmax
    of qualifying levels). All-integer → exact oracle. Scale shape: one
    (user, cell) count shuffle + WindowGroupLimit argmax; the ladder
    explode (×5) and the level-occupancy agg run on the O(users) home
    table."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col, cell_parent_col

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    counts = (
        ev.withColumn("cell", cell_encode_col(lat, lng, _KANON_LADDER[0]))
        .groupBy("user_id", "cell")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("cell").asc()
    )
    home = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "cell")
    )
    ladder = home.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("res"),
                        (
                            F.col("cell")
                            if r == _KANON_LADDER[0]
                            else cell_parent_col("cell", _KANON_LADDER[0], r)
                        ).alias("acell"),
                    )
                    for r in _KANON_LADDER
                ]
            )
        ).alias("lv"),
    ).select("user_id", F.col("lv.res").alias("res"), F.col("lv.acell").alias("acell"))
    occ = ladder.groupBy("res", "acell").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        ladder.join(occ, ["res", "acell"])
        .filter(F.col("n_users") >= _KANON_K)
        .groupBy("user_id")
        .agg(F.max(F.struct("res", "acell", "n_users")).alias("m"))
        .select(
            "user_id",
            F.col("m.res").alias("anon_res"),
            F.col("m.acell").alias("anon_cell"),
            F.col("m.n_users").alias("n_sharing"),
        )
    )


def _kanon_cells_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql, cell_parent_sql

    lat, lng = _latlng_sql("event_id")
    top = _KANON_LADDER[0]
    cell = cell_encode_sql(lat, lng, top)
    levels = ", ".join(
        f"({r}, {'h.cell' if r == top else cell_parent_sql('h.cell', top, r)})"
        for r in _KANON_LADDER
    )
    return f"""
        WITH c AS (SELECT user_id, {cell} AS cell, COUNT(*) AS n_events
                   FROM events GROUP BY 1, 2),
        h AS (SELECT user_id, cell FROM (
                  SELECT user_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY n_events DESC, cell) AS rk
                  FROM c) WHERE rk = 1),
        ladder AS (SELECT h.user_id, v.res, v.acell
                   FROM h CROSS JOIN LATERAL (VALUES {levels}) v(res, acell)),
        occ AS (SELECT res, acell, COUNT(*) AS n_users
                FROM ladder GROUP BY 1, 2),
        q AS (SELECT l.user_id, l.res, l.acell, o.n_users,
                     ROW_NUMBER() OVER (PARTITION BY l.user_id
                                        ORDER BY l.res DESC) AS rk
              FROM ladder l JOIN occ o
                ON o.res = l.res AND o.acell = l.acell
              WHERE o.n_users >= {_KANON_K})
        SELECT user_id, res AS anon_res, acell AS anon_cell,
               n_users AS n_sharing
        FROM q WHERE rk = 1
    """


_PACK_BUDGET = 4096


def q_seq_packing(spark, sf_dir):
    """Sequence packing — the GPT-style pretraining batcher: docs are laid
    end-to-end in a deterministic (md5, doc_id) order and SPLIT into fixed
    4096-token context windows; each doc reports its window span
    (bin_start, bin_end) and in-window offset. Closed form over a running
    token cumsum (one window over the deterministic order — at 100 TB the
    order key is a range-partitioned sort, the same one-exchange shape as
    any global ordering); all-integer, exact oracle."""
    from pyspark.sql import Window

    from raptor_service_spark.functions.text import token_count

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.md5(F.col("doc_id").cast("string"))
    base = d.select(
        "doc_id", h.alias("h"), token_count(F.col("text")).cast("long").alias("tok")
    ).filter(F.col("tok") > 0)
    w = (
        Window.orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum", F.sum("tok").over(w))
    return cum.select(
        "doc_id",
        "tok",
        F.floor((F.col("cum") - F.col("tok")) / _PACK_BUDGET).cast("long").alias("bin_start"),
        F.floor((F.col("cum") - 1) / _PACK_BUDGET).cast("long").alias("bin_end"),
        ((F.col("cum") - F.col("tok")) % _PACK_BUDGET).cast("long").alias("bin_offset"),
    )


def _seq_packing_sql() -> str:
    from raptor_service_spark.functions.text import token_count_sql

    tok = token_count_sql("text")
    return f"""
        WITH base AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                   CAST({tok} AS BIGINT) AS tok
            FROM documents),
        c AS (SELECT doc_id, tok,
                     SUM(tok) OVER (ORDER BY h, doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS cum
              FROM base WHERE tok > 0)
        SELECT doc_id, tok,
               CAST(FLOOR((cum - tok) / {_PACK_BUDGET}) AS BIGINT) AS bin_start,
               CAST(FLOOR((cum - 1) / {_PACK_BUDGET}) AS BIGINT) AS bin_end,
               CAST((cum - tok) % {_PACK_BUDGET} AS BIGINT) AS bin_offset
        FROM c
    """


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix — the product-analytics staple next
    to the funnel: users are cohorted by first-activity week; cell
    (cohort_week, week_offset) counts cohort members active that many
    weeks later. All-integer (exact oracle). Scale shape: one (user, week)
    distinct agg over events (map-side combinable), one per-user min agg,
    one broadcast-able O(users) join, one final count agg."""
    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    week = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(604800)
    ).cast("long")
    uw = ev.select("user_id", week.alias("week")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def _cohort_retention_sql() -> str:
    return """
        WITH uw AS (SELECT DISTINCT user_id,
                           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 604800)
                                AS BIGINT) AS week
                    FROM events),
        c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
        SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
               COUNT(DISTINCT uw.user_id) AS n_active
        FROM uw JOIN c ON uw.user_id = c.user_id
        GROUP BY 1, 2
    """


def q_adoption_curve(spark, sf_dir):
    """Daily adoption curve: new users per day (first activity) and the
    running cumulative user count — one per-user min agg + one day agg +
    one cumulative window over the O(days) daily table. All-integer."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    day = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(86400)
    ).cast("long")
    first = ev.select("user_id", day.alias("day")).groupBy("user_id").agg(
        F.min("day").alias("day")
    )
    daily = first.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select("day", "n_new", F.sum("n_new").over(w).alias("cum_users"))


def _adoption_curve_sql() -> str:
    return """
        WITH f AS (SELECT user_id,
                          MIN(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400)
                                   AS BIGINT)) AS day
                   FROM events GROUP BY 1),
        d AS (SELECT day, COUNT(*) AS n_new FROM f GROUP BY 1)
        SELECT day, n_new,
               CAST(SUM(n_new) OVER (ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS BIGINT)
                   AS cum_users
        FROM d
    """


_PMI_MIN_COUNT, _PMI_TOPK = 20, 25


def q_pmi_bigrams(spark, sf_dir):
    """PMI bigram collocations — the corpus-statistics classic (which word
    pairs co-occur more than chance): pmi = ln((c_ab/N_bi)·(N_uni/c_a)·
    (N_uni/c_b)), top-25 by PMI among bigrams seen ≥ 50 times. Bigrams are
    built ARRAY-side (transform over the token array — identical
    construction in DuckDB's list_transform, no window/self-join); counts
    are two hash aggs; the unigram/total joins broadcast (vocab-sized).
    Scale: docs are scanned once; everything after is O(vocab²)-bounded."""
    d = _read(spark, sf_dir, "documents").select("text")
    toks = d.select(
        F.split(F.trim(F.col("text")), r"\s+").alias("arr")
    ).filter(F.size("arr") >= 2)
    uni = toks.select(F.explode("arr").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c_w")
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(arr) - 1), "
                    "i -> concat(element_at(arr, i), '_', element_at(arr, i + 1)))"
                )
            ).alias("ab")
        )
        .groupBy("ab")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .withColumn("a", F.substring_index("ab", "_", 1))
        .withColumn("b", F.substring_index("ab", "_", -1))
    )
    n_uni = uni.agg(F.sum("c_w").cast("long").alias("n_uni"))
    n_bi = toks.select((F.size("arr") - 1).alias("k")).agg(
        F.sum("k").cast("long").alias("n_bi")
    )
    j = (
        bi.join(F.broadcast(uni.select(F.col("w").alias("a"), F.col("c_w").alias("c_a"))), "a")
        .join(F.broadcast(uni.select(F.col("w").alias("b"), F.col("c_w").alias("c_b"))), "b")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
    )
    pmi = F.expr(
        "ROUND(LN(((CAST(c_ab AS DOUBLE) / n_bi) * n_uni / c_a) * n_uni / c_b), 6)"
    )
    return (
        j.select("a", "b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(_PMI_TOPK)
    )


def _pmi_bigrams_sql() -> str:
    return f"""
        WITH t AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS arr
                   FROM documents
                   WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 2),
        uni AS (SELECT UNNEST(arr) AS w FROM t),
        u AS (SELECT w, COUNT(*) AS c_w FROM uni GROUP BY 1),
        bg AS (SELECT UNNEST(list_transform(range(1, len(arr)),
                                            i -> arr[i] || '_' || arr[i + 1])) AS ab
               FROM t),
        b AS (SELECT ab, COUNT(*) AS c_ab FROM bg GROUP BY 1
              HAVING COUNT(*) >= {_PMI_MIN_COUNT}),
        nu AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_uni FROM u),
        nb AS (SELECT CAST(SUM(len(arr) - 1) AS BIGINT) AS n_bi FROM t),
        j AS (SELECT split_part(b.ab, '_', 1) AS a,
                     split_part(b.ab, '_', 2) AS b, b.c_ab,
                     ua.c_w AS c_a, ub.c_w AS c_b, nu.n_uni, nb.n_bi
              FROM b JOIN u ua ON ua.w = split_part(b.ab, '_', 1)
                     JOIN u ub ON ub.w = split_part(b.ab, '_', 2)
                     CROSS JOIN nu CROSS JOIN nb)
        SELECT a, b, c_ab,
               ROUND(LN(((CAST(c_ab AS DOUBLE) / n_bi) * n_uni / c_a)
                        * n_uni / c_b), 6) AS pmi
        FROM j
        ORDER BY pmi DESC, a, b LIMIT {_PMI_TOPK}
    """


_WS_K = 50


def q_weighted_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    each doc draws u ∈ (0,1) and ranks by key = ln(u)/w (equivalent to
    u^(1/w); higher weight → stochastically better rank); the global top-k
    is an exact weighted sample. Deterministic and engine-portable: u is
    the doc's md5 prefix scaled by 2⁻³² (exact dyadic rational — no RNG),
    w = n_chars; one codegen projection + TakeOrderedAndProject, no
    shuffle of the corpus. The reproducible quality-weighted sampler a
    curation pipeline uses for eval-set draws."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        d.select("doc_id", "n_chars", F.round(key, 9).alias("skey"))
        .orderBy(F.desc("skey"), "doc_id")
        .limit(_WS_K)
    )


def _weighted_sample_sql() -> str:
    return f"""
        WITH d AS (
            SELECT doc_id, n_chars,
                   (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) + 1.0) / 4294967296.0 AS u
            FROM documents)
        SELECT doc_id, n_chars, ROUND(LN(u) / CAST(n_chars AS DOUBLE), 9) AS skey
        FROM d
        ORDER BY skey DESC, doc_id LIMIT {_WS_K}
    """


def q_user_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern: within a user's DISTINCT active days, the
    quantity day − row_number() is constant exactly along a consecutive
    run, so one distinct agg + one window + one max-of-counts gives the
    streak. All-integer. One (user) shuffle; islands never materialize
    pairs."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    day = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(86400)
    ).cast("long")
    days = ev.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


def _user_streaks_sql() -> str:
    return """
        WITH d AS (SELECT DISTINCT user_id,
                          CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400)
                               AS BIGINT) AS day
                   FROM events),
        i AS (SELECT user_id, day,
                     day - ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY day) AS grp
              FROM d),
        r AS (SELECT user_id, grp, COUNT(*) AS run_len
              FROM i GROUP BY 1, 2)
        SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak,
               COUNT(*) AS n_streaks
        FROM r GROUP BY 1
    """


_BENFORD_DIGIT_SQL = (
    "CAST(FLOOR(CASE "
    "WHEN ABS(value) >= 100.0 THEN ABS(value) / 100.0 "
    "WHEN ABS(value) >= 10.0 THEN ABS(value) / 10.0 "
    "WHEN ABS(value) >= 1.0 THEN ABS(value) "
    "WHEN ABS(value) >= 0.1 THEN ABS(value) * 10.0 "
    "ELSE ABS(value) * 100.0 END) AS INT)"
)


def q_benford_values(spark, sf_dir):
    """Benford first-digit audit of the event `value` column — the
    data-quality screen: per leading digit 1-9 of |value|, observed count,
    Benford-expected count (N·log10(1+1/d), a literal-constant table
    shared with the oracle), and the χ² contribution. Codegen digit
    extraction + one 9-group agg."""
    ev = _read(spark, sf_dir, "events").select("value").filter(
        F.abs(F.col("value")) > 0
    )
    # leading digit by an exact comparison ladder (values are bounded in
    # [0.01, 1000) by the generator): every branch is one IEEE multiply/
    # divide — bit-identical across engines, no libm log10 whose 1-ulp
    # slack could flip FLOOR at power-of-ten boundaries. The ladder is ONE
    # string shared with the oracle; rows whose scaled mantissa rounds
    # outside [1, 9] (boundary doubles) are excluded IDENTICALLY by both.
    obs = (
        ev.select(F.expr(_BENFORD_DIGIT_SQL).alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    n = obs.agg(F.sum("n_obs").cast("long").alias("n_total"))
    exp = F.expr("n_total * LOG10(1.0 + 1.0 / digit)")
    return (
        obs.join(F.broadcast(n))
        .select(
            "digit",
            "n_obs",
            F.round(exp, 6).alias("n_exp"),
            F.round((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6).alias(
                "chi2_part"
            ),
        )
    )


def _benford_values_sql() -> str:
    return f"""
        WITH v AS (SELECT value FROM events WHERE ABS(value) > 0),
        o AS (SELECT digit, COUNT(*) AS n_obs
              FROM (SELECT {_BENFORD_DIGIT_SQL} AS digit FROM v)
              WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
        t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM o)
        SELECT digit, n_obs,
               ROUND(n_total * LOG10(1.0 + 1.0 / digit), 6) AS n_exp,
               ROUND((n_obs - n_total * LOG10(1.0 + 1.0 / digit))
                     * (n_obs - n_total * LOG10(1.0 + 1.0 / digit))
                     / (n_total * LOG10(1.0 + 1.0 / digit)), 6) AS chi2_part
        FROM o CROSS JOIN t
    """


# Pearson r from the six rounded sums — one shared closed-form string per
# pair (a, b) over columns n, s_<a>, s_<b>, s_<a><a>, s_<b><b>, s_<a><b>.
def _pearson_expr(a: str, b: str) -> str:
    return (
        f"ROUND((n * s_{a}{b} - s_{a} * s_{b}) / "
        f"(SQRT(n * s_{a}{a} - s_{a} * s_{a}) * "
        f"SQRT(n * s_{b}{b} - s_{b} * s_{b})), 6)"
    )


def q_value_correlations(spark, sf_dir):
    """Pearson correlation screen: r(value, hour-of-day), r(value, lat),
    r(value, lng) in ONE scalar aggregate — the feature/leakage screen a
    training pipeline runs before using a column. All sums rounded to 9 dp
    before the shared closed-form ratio (the OLS/gravity protocol); hour
    is exact integer arithmetic."""
    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "value")
    lat, lng = _latlng_cols(F.col("event_id"))
    hour = F.floor(
        (F.unix_timestamp(F.col("ts").cast("timestamp")) % 86400) / F.lit(3600)
    ).cast("double")
    base = ev.select(
        F.col("value").alias("v"), hour.alias("h"), lat.alias("a"), lng.alias("g")
    )
    s = lambda c: F.round(F.sum(c), 9)
    sums = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        s(F.col("v")).alias("s_v"),
        s(F.col("v") * F.col("v")).alias("s_vv"),
        s(F.col("h")).alias("s_h"),
        s(F.col("h") * F.col("h")).alias("s_hh"),
        s(F.col("v") * F.col("h")).alias("s_vh"),
        s(F.col("a")).alias("s_a"),
        s(F.col("a") * F.col("a")).alias("s_aa"),
        s(F.col("v") * F.col("a")).alias("s_va"),
        s(F.col("g")).alias("s_g"),
        s(F.col("g") * F.col("g")).alias("s_gg"),
        s(F.col("v") * F.col("g")).alias("s_vg"),
    )
    return sums.select(
        F.col("n").cast("long").alias("n_events"),
        F.expr(_pearson_expr("v", "h")).alias("r_value_hour"),
        F.expr(_pearson_expr("v", "a")).alias("r_value_lat"),
        F.expr(_pearson_expr("v", "g")).alias("r_value_lng"),
    )


def _value_correlations_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH base AS (
            SELECT value AS v,
                   CAST(FLOOR((CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)))
                                    AS BIGINT) % 86400)
                              / 3600) AS DOUBLE) AS h,
                   {lat} AS a, {lng} AS g
            FROM events),
        sums AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   ROUND(SUM(v), 9) AS s_v, ROUND(SUM(v * v), 9) AS s_vv,
                   ROUND(SUM(h), 9) AS s_h, ROUND(SUM(h * h), 9) AS s_hh,
                   ROUND(SUM(v * h), 9) AS s_vh,
                   ROUND(SUM(a), 9) AS s_a, ROUND(SUM(a * a), 9) AS s_aa,
                   ROUND(SUM(v * a), 9) AS s_va,
                   ROUND(SUM(g), 9) AS s_g, ROUND(SUM(g * g), 9) AS s_gg,
                   ROUND(SUM(v * g), 9) AS s_vg
            FROM base)
        SELECT CAST(n AS BIGINT) AS n_events,
               {_pearson_expr('v', 'h')} AS r_value_hour,
               {_pearson_expr('v', 'a')} AS r_value_lat,
               {_pearson_expr('v', 'g')} AS r_value_lng
        FROM sums
    """


# ---------------------------------------------------------------------------
# trajectory speed anomalies — robust MAD outlier screen (session 6)
# ---------------------------------------------------------------------------


def _weighted_median(hist: DataFrame, val: str, cnt: str) -> DataFrame:
    """Exact interpolated median (quantile_cont semantics: index (n-1)/2,
    linear interpolation) computed from a (value, count) HISTOGRAM — the
    shuffle and the cumulative window run over DISTINCT values only, never
    raw rows, so quantizing the value bounds the state at any scale. Returns
    a 1-row DataFrame (med)."""
    from pyspark.sql import Window

    wcum = Window.orderBy(val).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum(cnt).over(wcum))
    tot = cum.agg(F.max("cum").alias("n"))
    j = cum.crossJoin(F.broadcast(tot))
    i = (F.col("n") - F.lit(1)) / F.lit(2.0)
    vlo = F.min(F.when(F.col("cum") >= F.floor(i) + 1, F.col(val)))
    vhi = F.min(F.when(F.col("cum") >= F.ceil(i) + 1, F.col(val)))
    return j.agg(
        vlo.alias("vlo"), vhi.alias("vhi"), F.max(i - F.floor(i)).alias("frac")
    ).select(
        (F.col("vlo") + F.col("frac") * (F.col("vhi") - F.col("vlo"))).alias("med")
    )


def q_speed_anomalies(spark, sf_dir):
    """Teleport detection: per-user consecutive-event speeds (haversine km /
    elapsed hours, quantized to 0.01 km/h), flagged when above the robust
    cutoff median + 3·1.4826·MAD. Scale shape: one user-partitioned window
    builds the legs; median and MAD come from _weighted_median over the
    DISTINCT-speed histogram (quantization bounds the cumulative-window
    state — never a raw-row global sort); the cutoff broadcasts back onto
    the aggregated legs. Oracle computes the same statistic with
    quantile_cont. Top-20 fastest anomalous legs."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.distance import haversine_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    dt_h = (ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))) / F.lit(
        3600000000.0
    )
    leg = haversine_col(
        F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
    )
    legs = (
        pts.withColumn("dt_h", dt_h)
        .withColumn("leg_km", leg)
        .filter(F.col("dt_h") > 0)
        .select(
            "user_id",
            "event_id",
            F.round(F.col("leg_km") / F.col("dt_h"), 2).alias("speed_kmh"),
        )
    )
    hist = legs.groupBy("speed_kmh").agg(F.count(F.lit(1)).alias("c"))
    med = _weighted_median(hist, "speed_kmh", "c").select(
        F.round("med", 6).alias("med")
    )
    dev_hist = (
        hist.crossJoin(F.broadcast(med))
        .groupBy(
            F.round(F.abs(F.col("speed_kmh") - F.col("med")), 6).alias("dv")
        )
        .agg(F.sum("c").alias("c"))
    )
    mad = _weighted_median(dev_hist, "dv", "c").select(
        F.round("med", 6).alias("mad")
    )
    cut = (
        med.crossJoin(mad)
        .select(
            F.round(F.col("med") + F.lit(4.4478) * F.col("mad"), 6).alias("cutoff")
        )
    )
    return (
        legs.crossJoin(F.broadcast(cut))
        .filter(F.col("speed_kmh") > F.col("cutoff"))
        .orderBy(F.col("speed_kmh").desc(), "event_id")
        .limit(20)
    )


def _speed_anomalies_sql() -> str:
    from raptor_service_spark.geo.distance import haversine_sql

    lat, lng = _latlng_sql("event_id")
    hav = haversine_sql("plat", "plng", "lat", "lng")
    return f"""
        WITH pts AS (
            SELECT event_id, ts, user_id, {lat} AS lat, {lng} AS lng
            FROM events),
        lagged AS (
            SELECT user_id, event_id, lat, lng,
                   LAG(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS plat,
                   LAG(lng) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS plng,
                   (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                       / 3600000000.0 AS dt_h
            FROM pts),
        legs AS (
            SELECT user_id, event_id, ROUND({hav} / dt_h, 2) AS speed_kmh
            FROM lagged WHERE dt_h > 0),
        med AS (SELECT ROUND(quantile_cont(speed_kmh, 0.5), 6) AS med FROM legs),
        mad AS (SELECT ROUND(quantile_cont(
                    ROUND(ABS(speed_kmh - med), 6), 0.5), 6) AS mad
                FROM legs CROSS JOIN med),
        cut AS (SELECT ROUND(med + 4.4478 * mad, 6) AS cutoff
                FROM med CROSS JOIN mad)
        SELECT user_id, event_id, speed_kmh, cutoff
        FROM legs CROSS JOIN cut
        WHERE speed_kmh > cutoff
        ORDER BY speed_kmh DESC, event_id
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# Kulldorff-style space-time scan statistic (session 6)
# ---------------------------------------------------------------------------

_SCAN_RES, _SCAN_MAX_DAYS, _SCAN_TOPK = 3, 7, 10


def q_spacetime_scan(spark, sf_dir):
    """Kulldorff space-time scan (cylindrical zones, Poisson LLR): every
    (res-3 cell) × (contiguous day window ≤ 7 days) is a candidate cluster;
    expected count under the null is cell_total · window_total / C (the
    space-time permutation model); LLR = c·ln(c/e) + (C−c)·ln((C−c)/(C−e))
    for over-dense zones. Top-10 zones by LLR — the disease-outbreak /
    event-burst detector over the tile grid.

    Scale shape: points are touched ONCE (the (cell, day) cube agg); zone
    enumeration joins the cube against the O(days·max_len) window list and
    re-aggregates — all work is on aggregated tables bounded by
    cells × calendar, never points. Exact-integer counts; LLR doubles
    rounded 6 dp; ties broken (cell, d1, d2)."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    day = F.expr("CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 86400000000.0) AS BIGINT)")
    cube = (
        ev.select(cell_encode_col(lat, lng, _SCAN_RES).alias("cell"), day.alias("day"))
        .groupBy("cell", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    day_tot = cube.groupBy("day").agg(F.sum("c").alias("dc"))
    cell_tot = cube.groupBy("cell").agg(F.sum("c").alias("cc"))
    tot = cube.agg(F.sum("c").alias("C"))
    wins = (
        day_tot.select(F.col("day").alias("d1"))
        .select("d1", F.explode(F.sequence(F.lit(0), F.lit(_SCAN_MAX_DAYS - 1))).alias("len"))
        .select("d1", (F.col("d1") + F.col("len")).alias("d2"))
    )
    win_tot = (
        wins.join(
            F.broadcast(day_tot),
            (F.col("day") >= F.col("d1")) & (F.col("day") <= F.col("d2")),
        )
        .groupBy("d1", "d2")
        .agg(F.sum("dc").alias("wc"))
    )
    zone = (
        cube.join(
            F.broadcast(wins),
            (F.col("day") >= F.col("d1")) & (F.col("day") <= F.col("d2")),
        )
        .groupBy("cell", "d1", "d2")
        .agg(F.sum("c").alias("zc"))
    )
    e = F.col("cc") * F.col("wc") / F.col("C")
    zc, C = F.col("zc").cast("double"), F.col("C").cast("double")
    llr = F.when(
        zc > e,
        zc * F.log(zc / e) + (C - zc) * F.log((C - zc) / (C - e)),
    ).otherwise(F.lit(0.0))
    return (
        zone.join(F.broadcast(cell_tot), "cell")
        .join(F.broadcast(win_tot), ["d1", "d2"])
        .crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "d1",
            "d2",
            F.col("zc").alias("n_obs"),
            F.round(e, 6).alias("n_exp"),
            F.round(llr, 6).alias("llr"),
        )
        .orderBy(F.col("llr").desc(), "cell", "d1", "d2")
        .limit(_SCAN_TOPK)
    )


def _spacetime_scan_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _SCAN_RES)
    return f"""
        WITH cube AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2),
        day_tot AS (SELECT day, SUM(c) AS dc FROM cube GROUP BY 1),
        cell_tot AS (SELECT cell, SUM(c) AS cc FROM cube GROUP BY 1),
        tot AS (SELECT SUM(c) AS C FROM cube),
        wins AS (
            SELECT d1, d1 + len AS d2 FROM
                (SELECT day AS d1 FROM day_tot) CROSS JOIN
                (SELECT unnest(generate_series(0, {_SCAN_MAX_DAYS - 1})) AS len)),
        win_tot AS (
            SELECT d1, d2, SUM(dc) AS wc
            FROM wins JOIN day_tot ON day BETWEEN d1 AND d2
            GROUP BY 1, 2),
        zone AS (
            SELECT cell, d1, d2, SUM(c) AS zc
            FROM cube JOIN wins ON day BETWEEN d1 AND d2
            GROUP BY 1, 2, 3),
        scored AS (
            SELECT z.cell, z.d1, z.d2, z.zc,
                   ct.cc * wt.wc / CAST(t.C AS DOUBLE) AS e,
                   CAST(z.zc AS DOUBLE) AS zcd, CAST(t.C AS DOUBLE) AS Cd
            FROM zone z
            JOIN cell_tot ct ON z.cell = ct.cell
            JOIN win_tot wt ON z.d1 = wt.d1 AND z.d2 = wt.d2
            CROSS JOIN tot t)
        SELECT cell, d1, d2, CAST(zc AS BIGINT) AS n_obs,
               ROUND(e, 6) AS n_exp,
               ROUND(CASE WHEN zcd > e
                     THEN zcd * LN(zcd / e) + (Cd - zcd) * LN((Cd - zcd) / (Cd - e))
                     ELSE 0.0 END, 6) AS llr
        FROM scored
        ORDER BY llr DESC, cell, d1, d2
        LIMIT {_SCAN_TOPK}
    """


# ---------------------------------------------------------------------------
# spatial Gini of cell occupancy (session 6)
# ---------------------------------------------------------------------------


def q_cell_gini(spark, sf_dir):
    """Gini coefficient of res-4 cell occupancy — the one-number spatial
    inequality summary (0 = events spread evenly over occupied cells,
    → 1 = all mass in a few hot tiles). Exact ranked-sum form
    G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over counts ranked ascending with
    a deterministic cell tie-break; ALL arithmetic is integer until the
    final division. Points shuffle once; the rank window runs on the
    O(occupied cells) table."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    occ = (
        ev.select(cell_encode_col(lat, lng, 4).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy(F.col("x").asc(), F.col("cell").asc())
    ranked = occ.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("x").alias("n_points"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("x"))
            / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def _cell_gini_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 4)
    return f"""
        WITH occ AS (
            SELECT {cell} AS cell, COUNT(*) AS x FROM events GROUP BY 1),
        ranked AS (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, cell ASC) AS i
            FROM occ)
        SELECT COUNT(*) AS n_cells, CAST(SUM(x) AS BIGINT) AS n_points,
               ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
                     - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
        FROM ranked
    """


# ---------------------------------------------------------------------------
# per-user burstiness (session 6)
# ---------------------------------------------------------------------------


def q_user_burstiness(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of per-user inter-arrival
    times: B → 1 bursty, 0 Poisson, −1 periodic — the behavioral screen
    separating humans from schedulers/bots. One user window builds gaps
    (exact integer seconds); per-user moments are one partial+final agg
    with 9-dp pre-rounded sums; users with ≥ 30 gaps, top-20 by B."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.floor(
        (ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp")))
        / F.lit(1000000.0)
    ).cast("double")
    gaps = (
        ev.withColumn("g", gap)
        .filter(F.col("g").isNotNull() & (F.col("g") >= 0))
        .select("user_id", "g")
    )
    mom = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.sum("g"), 9).alias("sg"),
        F.round(F.sum(F.col("g") * F.col("g")), 9).alias("sgg"),
    )
    m = F.col("sg") / F.col("n_gaps")
    sd = F.sqrt(F.col("sgg") / F.col("n_gaps") - m * m)
    return (
        mom.filter(F.col("n_gaps") >= 30)
        .select(
            "user_id",
            "n_gaps",
            F.round((sd - m) / (sd + m), 6).alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), "user_id")
        .limit(20)
    )


def _user_burstiness_sql() -> str:
    return """
        WITH gaps AS (
            SELECT user_id,
                   CAST(FLOOR((epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                        / 1000000.0) AS DOUBLE) AS g
            FROM events
            QUALIFY g IS NOT NULL AND g >= 0),
        mom AS (
            SELECT user_id, COUNT(*) AS n_gaps,
                   ROUND(SUM(g), 9) AS sg,
                   ROUND(SUM(g * g), 9) AS sgg
            FROM gaps GROUP BY 1)
        SELECT user_id, n_gaps,
               ROUND((SQRT(sgg / n_gaps - (sg / n_gaps) * (sg / n_gaps))
                      - sg / n_gaps)
                     / (SQRT(sgg / n_gaps - (sg / n_gaps) * (sg / n_gaps))
                      + sg / n_gaps), 6) AS burstiness
        FROM mom WHERE n_gaps >= 30
        ORDER BY burstiness DESC, user_id
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# char entropy + Markov next-cell (session 6)
# ---------------------------------------------------------------------------


def q_doc_char_entropy(spark, sf_dir):
    """Per-document character-level Shannon entropy — the compressibility /
    gibberish screen (templated or repeated text scores low, encrypted or
    random blobs high). H = ln n − Σ k·ln k / n over the per-doc char
    histogram (the same exact decomposition as user_cell_entropy, so the
    only float work happens on AGGREGATED (doc, char) counts). Bottom-20
    most-compressible docs."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    # Guard: sequence(1, 0) descends in Spark, so empty text must be
    # filtered before the transform (DuckDB's generate_series(1, 0) is
    # empty; an empty doc has no defined entropy row on either side).
    chars = d.filter(F.length("text") >= 1).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text)), i -> substring(text, i, 1))"
            )
        ).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("k"))
    ent = hist.groupBy("doc_id").agg(
        F.sum("k").alias("n_chars"),
        F.round(
            F.log(F.sum("k").cast("double"))
            - F.sum(F.col("k") * F.log(F.col("k").cast("double")))
            / F.sum("k").cast("double"),
            6,
        ).alias("entropy"),
    )
    return ent.orderBy(F.col("entropy").asc(), "doc_id").limit(20)


def _doc_char_entropy_sql() -> str:
    return """
        WITH chars AS (
            SELECT doc_id, unnest(list_transform(
                generate_series(1, length(text)),
                i -> substring(text, i, 1))) AS ch
            FROM documents),
        hist AS (SELECT doc_id, ch, COUNT(*) AS k FROM chars GROUP BY 1, 2),
        ent AS (
            SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_chars,
                   ROUND(LN(CAST(SUM(k) AS DOUBLE))
                         - SUM(k * LN(CAST(k AS DOUBLE)))
                           / CAST(SUM(k) AS DOUBLE), 6) AS entropy
            FROM hist GROUP BY 1)
        SELECT doc_id, n_chars, entropy FROM ent
        ORDER BY entropy ASC, doc_id
        LIMIT 20
    """


def q_cell_markov(spark, sf_dir):
    """First-order Markov next-cell prediction over the OD transition
    graph: for each res-3 cell, the top-3 most likely next cells with
    exact count-ratio probabilities — the 'where do trajectories go from
    here' table that powers location prediction. Points shuffle once (the
    per-user lag window); everything after runs on the aggregated
    transition counts; the rank is a WindowGroupLimit on integer counts
    (no float ordering)."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 3))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        pts.withColumn("prev_cell", F.lag("cell").over(w))
        .filter(
            F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell"))
        )
        .groupBy(F.col("prev_cell").alias("from_cell"), F.col("cell").alias("to_cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("from_cell").agg(F.sum("n").alias("n_from"))
    wr = Window.partitionBy("from_cell").orderBy(
        F.col("n").desc(), F.col("to_cell").asc()
    )
    return (
        trans.join(tot, "from_cell")
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 3)
        .select(
            "from_cell",
            "to_cell",
            "n",
            F.round(F.col("n") / F.col("n_from").cast("double"), 6).alias("p"),
            "rk",
        )
        .orderBy("from_cell", "rk")
    )


def _cell_markov_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH pts AS (
            SELECT user_id, ts, event_id, {cell} AS cell FROM events),
        lagged AS (
            SELECT cell AS to_cell,
                   LAG(cell) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_cell
            FROM pts),
        trans AS (
            SELECT from_cell, to_cell, COUNT(*) AS n
            FROM lagged
            WHERE from_cell IS NOT NULL AND from_cell != to_cell
            GROUP BY 1, 2),
        tot AS (SELECT from_cell, CAST(SUM(n) AS BIGINT) AS n_from
                FROM trans GROUP BY 1)
        SELECT t.from_cell, t.to_cell, t.n,
               ROUND(t.n / CAST(o.n_from AS DOUBLE), 6) AS p, rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY from_cell
                       ORDER BY n DESC, to_cell ASC) AS rk
            FROM trans) t
        JOIN tot o ON t.from_cell = o.from_cell
        WHERE rk <= 3
        ORDER BY t.from_cell, rk
    """


# ---------------------------------------------------------------------------
# span modality transition matrix (session 6, interleaved axis)
# ---------------------------------------------------------------------------


def q_span_transitions(spark, sf_dir):
    """First-order Markov transition matrix over span KINDS in document
    order — the interleaving fingerprint of the corpus (how often a header
    is followed by text, text by an image, ...). Built ARRAY-side from the
    ordered spans column (adjacent-kind pairs via transform — offset order
    is the array order by construction); one partial+final agg; transition
    probabilities are exact count ratios. Oracle: per-doc kind sequences
    from the pure-Python generator twin as VALUES, aggregated
    independently."""
    from raptor_service_spark.datagen import gen_documents_df

    docs = gen_documents_df(spark, 200, seed=63)
    # Guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being empty,
    # so a single-span doc must be filtered out before the transform (the
    # DuckDB oracle's generate_series(2, 1) is empty; parity requires this).
    pairs = docs.filter(F.expr("size(spans) >= 2")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(spans) - 1), "
                "i -> concat(spans[i - 1].kind, '>', spans[i].kind))"
            )
        ).alias("tr")
    )
    cnt = pairs.groupBy("tr").agg(F.count(F.lit(1)).alias("n"))
    tot = (
        cnt.withColumn("from_kind", F.substring_index("tr", ">", 1))
        .groupBy("from_kind")
        .agg(F.sum("n").alias("n_from"))
    )
    return (
        cnt.withColumn("from_kind", F.substring_index("tr", ">", 1))
        .withColumn("to_kind", F.substring_index("tr", ">", -1))
        .join(F.broadcast(tot), "from_kind")
        .select(
            "from_kind",
            "to_kind",
            "n",
            F.round(F.col("n") / F.col("n_from").cast("double"), 6).alias("p"),
        )
        .orderBy("from_kind", "to_kind")
    )


def _span_transitions_sql(n_docs: int = 200, seed: int = 63) -> str:
    from raptor_service_spark.datagen import _gen_doc

    vals = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        kinds = ",".join(s["kind"] for s in d["spans"])
        vals.append(f"('{kinds}')")
    return f"""
        WITH d AS (SELECT string_split(kinds, ',') AS ks
                   FROM (VALUES {', '.join(vals)}) t(kinds)),
        pairs AS (
            SELECT unnest(list_transform(generate_series(2, len(ks)),
                          i -> ks[i - 1] || '>' || ks[i])) AS tr
            FROM d),
        cnt AS (SELECT tr, COUNT(*) AS n FROM pairs GROUP BY 1),
        tot AS (SELECT split_part(tr, '>', 1) AS from_kind,
                       CAST(SUM(n) AS BIGINT) AS n_from
                FROM cnt GROUP BY 1)
        SELECT t.from_kind, split_part(c.tr, '>', 2) AS to_kind, c.n,
               ROUND(c.n / CAST(t.n_from AS DOUBLE), 6) AS p
        FROM cnt c JOIN tot t ON split_part(c.tr, '>', 1) = t.from_kind
        ORDER BY t.from_kind, to_kind
    """


# ---------------------------------------------------------------------------
# standard deviational ellipse + Knox space-time test (session 6)
# ---------------------------------------------------------------------------


def q_deviational_ellipse(spark, sf_dir):
    """Standard deviational ellipse (directional distribution) of the event
    cloud: mean center, orientation θ of the major axis, and the two axis
    standard deviations — the one-row summary GIS suites print for any
    point layer. Closed-form from second moments (one scalar agg, 9-dp
    pre-rounded sums; the rotation is the eigendecomposition of the 2×2
    covariance, written out so both engines run the identical arithmetic):

        θ = atan2(2·Sxy, Sxx − Syy) / 2
        σ1,2 = sqrt((Sxx + Syy)/2 ± sqrt(((Sxx − Syy)/2)² + Sxy²))
    """
    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(lng.alias("x"), lat.alias("y"))
    mom = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum("x"), 9).alias("sx"),
        F.round(F.sum("y"), 9).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 9).alias("sxx"),
        F.round(F.sum(F.col("y") * F.col("y")), 9).alias("syy"),
        F.round(F.sum(F.col("x") * F.col("y")), 9).alias("sxy"),
    )
    mx, my = F.col("sx") / F.col("n"), F.col("sy") / F.col("n")
    cxx = F.col("sxx") / F.col("n") - mx * mx
    cyy = F.col("syy") / F.col("n") - my * my
    cxy = F.col("sxy") / F.col("n") - mx * my
    half = (cxx - cyy) / F.lit(2.0)
    root = F.sqrt(half * half + cxy * cxy)
    mid = (cxx + cyy) / F.lit(2.0)
    return mom.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(mx, 6).alias("center_x"),
        F.round(my, 6).alias("center_y"),
        F.round(F.atan2(F.lit(2.0) * cxy, cxx - cyy) / F.lit(2.0), 6).alias(
            "theta"
        ),
        F.round(F.sqrt(mid + root), 6).alias("sigma_major"),
        F.round(F.sqrt(mid - root), 6).alias("sigma_minor"),
    )


def _deviational_ellipse_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH p AS (SELECT {lng} AS x, {lat} AS y FROM events),
        mom AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   ROUND(SUM(x), 9) AS sx, ROUND(SUM(y), 9) AS sy,
                   ROUND(SUM(x * x), 9) AS sxx, ROUND(SUM(y * y), 9) AS syy,
                   ROUND(SUM(x * y), 9) AS sxy
            FROM p)
        SELECT CAST(n AS BIGINT) AS n_points,
               ROUND(sx / n, 6) AS center_x,
               ROUND(sy / n, 6) AS center_y,
               ROUND(ATAN2(2.0 * (sxy / n - (sx / n) * (sy / n)),
                           (sxx / n - (sx / n) * (sx / n))
                         - (syy / n - (sy / n) * (sy / n))) / 2.0, 6) AS theta,
               ROUND(SQRT(((sxx / n - (sx / n) * (sx / n))
                          + (syy / n - (sy / n) * (sy / n))) / 2.0
                        + SQRT((((sxx / n - (sx / n) * (sx / n))
                               - (syy / n - (sy / n) * (sy / n))) / 2.0)
                              * (((sxx / n - (sx / n) * (sx / n))
                               - (syy / n - (sy / n) * (sy / n))) / 2.0)
                              + (sxy / n - (sx / n) * (sy / n))
                              * (sxy / n - (sx / n) * (sy / n)))), 6)
                   AS sigma_major,
               ROUND(SQRT(((sxx / n - (sx / n) * (sx / n))
                          + (syy / n - (sy / n) * (sy / n))) / 2.0
                        - SQRT((((sxx / n - (sx / n) * (sx / n))
                               - (syy / n - (sy / n) * (sy / n))) / 2.0)
                              * (((sxx / n - (sx / n) * (sx / n))
                               - (syy / n - (sy / n) * (sy / n))) / 2.0)
                              + (sxy / n - (sx / n) * (sy / n))
                              * (sxy / n - (sx / n) * (sy / n)))), 6)
                   AS sigma_minor
        FROM mom
    """


# ---------------------------------------------------------------------------
# Knox space-time interaction test (session 6)
# ---------------------------------------------------------------------------

_KNOX_N, _KNOX_DELTA, _KNOX_TAU = 3000, 4.0, 3600


def q_knox_test(spark, sf_dir):
    """Knox space-time interaction: are events that are close in SPACE also
    disproportionately close in TIME (disease-surveillance / incident-
    clustering screen)? X = pairs within δ AND τ; under independence
    E[X] = S·T / P with S space-close pairs, T time-close pairs, P all
    pairs (closed form). Ratio ≫ 1 ⇒ interaction.

    Scale shape: S and X come from ONE grid ε-join (each pair once,
    carrying timestamps); T from the 1-D analog — a τ-bucket join with
    ±1-bucket explode and canonical pair dedup; P is arithmetic. No
    all-pairs join anywhere; the oracle is the brute-force quadratic."""
    from raptor_service_spark.operators.pip_join import within_distance_join

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts")
        .filter(F.col("event_id") < _KNOX_N)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(
        F.col("event_id").alias("id"),
        ts_us.alias("t_us"),
        lat.alias("lat"),
        lng.alias("lng"),
    )
    sp = within_distance_join(pts, pts, eps=_KNOX_DELTA).filter(
        F.col("l.id") < F.col("r.id")
    )
    tau_us = _KNOX_TAU * 1_000_000
    s_x = sp.agg(
        F.count(F.lit(1)).alias("s_pairs"),
        F.sum(
            (F.abs(F.col("l.t_us") - F.col("r.t_us")) <= tau_us).cast("long")
        ).alias("x_pairs"),
    )
    a = pts.select("id", "t_us", F.floor(F.col("t_us") / tau_us).alias("k"))
    b = a.select(
        F.col("id").alias("id_b"),
        F.col("t_us").alias("t_b"),
        F.explode(
            F.array(F.col("k") - 1, F.col("k"), F.col("k") + 1)
        ).alias("k"),
    )
    t_cnt = (
        a.join(b, "k")
        .filter(F.col("id") < F.col("id_b"))
        .filter(F.abs(F.col("t_us") - F.col("t_b")) <= tau_us)
        .select(
            F.least("id", "id_b").alias("pa"), F.greatest("id", "id_b").alias("pb")
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("t_pairs"))
    )
    n_tot = pts.agg(F.count(F.lit(1)).alias("n"))
    p = (F.col("n") * (F.col("n") - 1) / F.lit(2)).cast("double")
    e_x = F.col("s_pairs") * F.col("t_pairs") / p
    return (
        s_x.crossJoin(F.broadcast(t_cnt))
        .crossJoin(F.broadcast(n_tot))
        .select(
            "n",
            "s_pairs",
            "t_pairs",
            "x_pairs",
            F.round(e_x, 6).alias("e_x"),
            F.round(F.col("x_pairs") / e_x, 6).alias("knox_ratio"),
        )
    )


def _knox_test_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    tau_us = _KNOX_TAU * 1_000_000
    return f"""
        WITH p AS (
            SELECT event_id AS id, epoch_us(ts) AS t_us,
                   {lat} AS lat, {lng} AS lng
            FROM events WHERE event_id < {_KNOX_N}),
        pr AS (
            SELECT ROUND(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                            + (a.lng - b.lng) * (a.lng - b.lng)), 6) AS dist,
                   ABS(a.t_us - b.t_us) AS dt_us
            FROM p a JOIN p b ON a.id < b.id),
        agg AS (
            SELECT COUNT(CASE WHEN dist <= {_KNOX_DELTA!r} THEN 1 END)
                       AS s_pairs,
                   COUNT(CASE WHEN dt_us <= {tau_us} THEN 1 END) AS t_pairs,
                   COUNT(CASE WHEN dist <= {_KNOX_DELTA!r}
                              AND dt_us <= {tau_us} THEN 1 END) AS x_pairs,
                   (SELECT COUNT(*) FROM p) AS n
            FROM pr)
        SELECT n, CAST(s_pairs AS BIGINT) AS s_pairs,
               CAST(t_pairs AS BIGINT) AS t_pairs,
               CAST(x_pairs AS BIGINT) AS x_pairs,
               ROUND(s_pairs * t_pairs
                     / CAST(n * (n - 1) / 2 AS DOUBLE), 6) AS e_x,
               ROUND(x_pairs / (s_pairs * t_pairs
                     / CAST(n * (n - 1) / 2 AS DOUBLE)), 6) AS knox_ratio
        FROM agg
    """


# ---------------------------------------------------------------------------
# bivariate cross-K (session 6)
# ---------------------------------------------------------------------------

_XK_BANDS = [1.0, 2.0, 4.0]


def q_cross_k(spark, sf_dir):
    """Bivariate Ripley cross-K between click and purchase events: does
    one type spatially attract the other beyond chance (K_AB above π·d²)?
    One grid ε-join at the widest band produces every cross pair exactly
    once; bands are conditional sums over that stream
    (operators/spatial_stats.py:cross_k)."""
    from raptor_service_spark.operators.spatial_stats import cross_k

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select("event_id", "event_type", lat.alias("lat"), lng.alias("lng"))
    a = pts.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("id"), "lat", "lng"
    )
    b = pts.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id"), "lat", "lng"
    )
    return cross_k(a, b, _XK_BANDS)


def _cross_k_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import cross_k_sql

    lat, lng = _latlng_sql("event_id")
    return cross_k_sql(
        "(SELECT * FROM events WHERE event_type = 'click')",
        "(SELECT * FROM events WHERE event_type = 'purchase')",
        "event_id",
        "event_id",
        lat,
        lng,
        _XK_BANDS,
    )


# ---------------------------------------------------------------------------
# quadrat-count CSR test + hourly autocorrelation (session 6)
# ---------------------------------------------------------------------------


def q_quadrat_csr(spark, sf_dir):
    """Quadrat-count test of complete spatial randomness: partition the
    world into res-3 quadrats, compare observed per-quadrat counts with
    the uniform expectation via the χ² index of dispersion (VMR ≫ 1 ⇔
    clustered). ALL res-3 quadrats count — including empty ones, whose
    number is known in closed form (2^res·2^res) — so the statistic is the
    textbook one without materializing empty cells. One point shuffle;
    scalars after."""
    from raptor_service_spark.geo.grid import cell_encode_col

    res = 3
    n_cells = (1 << res) * (1 << res)
    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    occ = (
        ev.select(cell_encode_col(lat, lng, res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    # chi2 = sum_cells (x - m)^2 / m over ALL cells; empty cells each
    # contribute m, so chi2 = sum_occ((x-m)^2)/m + (n_cells - occ) * m
    # with m = N / n_cells. All terms exact rationals of integers.
    return occ.agg(
        F.sum("x").alias("n_points"), F.count(F.lit(1)).alias("n_occ"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        "n_points",
        F.lit(n_cells).cast("long").alias("n_quadrats"),
        "n_occ",
        F.round(
            (F.col("sxx") - F.lit(2.0) * F.col("n_points") * F.col("n_points")
             / F.lit(n_cells)
             + F.col("n_occ") * (F.col("n_points") / F.lit(n_cells))
             * (F.col("n_points") / F.lit(n_cells)))
            / (F.col("n_points") / F.lit(n_cells))
            + (F.lit(n_cells) - F.col("n_occ"))
            * (F.col("n_points") / F.lit(n_cells)),
            6,
        ).alias("chi2"),
    )


def _quadrat_csr_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    res = 3
    n_cells = (1 << res) * (1 << res)
    cell = cell_encode_sql(lat, lng, res)
    return f"""
        WITH occ AS (
            SELECT {cell} AS cell, COUNT(*) AS x FROM events GROUP BY 1),
        s AS (SELECT CAST(SUM(x) AS BIGINT) AS n_points,
                     COUNT(*) AS n_occ,
                     CAST(SUM(x * x) AS BIGINT) AS sxx
              FROM occ)
        SELECT n_points, CAST({n_cells} AS BIGINT) AS n_quadrats, n_occ,
               ROUND(
                 (sxx - 2.0 * n_points * n_points / {n_cells}
                  + n_occ * (n_points / CAST({n_cells} AS DOUBLE))
                  * (n_points / CAST({n_cells} AS DOUBLE)))
                 / (n_points / CAST({n_cells} AS DOUBLE))
                 + ({n_cells} - n_occ)
                 * (n_points / CAST({n_cells} AS DOUBLE)), 6) AS chi2
        FROM s
    """


_ACF_LAGS = 6


def q_hourly_acf(spark, sf_dir):
    """Autocorrelation function of the global hourly event-count series at
    lags 1..6 — the seasonality screen (daily rhythm shows as a ridge at
    the 24-lag harmonic; here short lags capture burst persistence). The
    series is the AGGREGATED (hour, count) table; each lag is one
    self-join on hour+lag; moments come from one scalar agg with 9-dp
    pre-rounded sums. Missing hours count as zero via the dense hour
    ladder (sequence explode between min and max hour)."""
    ev = _read(spark, sf_dir, "events").select("ts")
    hour = F.expr(
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000.0) AS BIGINT)"
    )
    occ = ev.select(hour.alias("h")).groupBy("h").agg(
        F.count(F.lit(1)).alias("x")
    )
    span = occ.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    dense = (
        span.select(
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
        )
        .join(occ, "h", "left")
        .select("h", F.coalesce("x", F.lit(0)).cast("double").alias("x"))
    )
    mom = dense.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum("x"), 9).alias("sx"),
        F.round(F.sum(F.col("x") * F.col("x")), 9).alias("sxx"),
    )
    lags = spark.createDataFrame(
        [(k,) for k in range(1, _ACF_LAGS + 1)], "lag long"
    )
    a = dense.select(F.col("h").alias("ha"), F.col("x").alias("xa"))
    b = dense.select(F.col("h").alias("hb"), F.col("x").alias("xb"))
    prods = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("hb") == F.col("ha") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("npairs"),
            F.round(F.sum(F.col("xa") * F.col("xb")), 9).alias("sxy"),
        )
    )
    m = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - m * m
    return (
        prods.crossJoin(F.broadcast(mom))
        .select(
            "lag",
            F.round(
                (F.col("sxy") / F.col("npairs") - m * m) / var, 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def _hourly_acf_sql() -> str:
    return f"""
        WITH occ AS (
            SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
                   COUNT(*) AS x
            FROM events GROUP BY 1),
        span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM occ),
        dense AS (
            SELECT g.h, CAST(COALESCE(occ.x, 0) AS DOUBLE) AS x
            FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM span) g
            LEFT JOIN occ ON g.h = occ.h),
        mom AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   ROUND(SUM(x), 9) AS sx,
                   ROUND(SUM(x * x), 9) AS sxx
            FROM dense),
        prods AS (
            SELECT l.lag, CAST(COUNT(*) AS DOUBLE) AS npairs,
                   ROUND(SUM(a.x * b.x), 9) AS sxy
            FROM (SELECT unnest(generate_series(1, {_ACF_LAGS})) AS lag) l
            CROSS JOIN dense a
            JOIN dense b ON b.h = a.h + l.lag
            GROUP BY 1)
        SELECT lag,
               ROUND((sxy / npairs - (sx / n) * (sx / n))
                     / (sxx / n - (sx / n) * (sx / n)), 6) AS acf
        FROM prods CROSS JOIN mom
        ORDER BY lag
    """


# ---------------------------------------------------------------------------
# Huff gravity market-share model (session 6)
# ---------------------------------------------------------------------------

_HUFF_EPS = 8.0


def q_huff_demand(spark, sf_dir):
    """Huff gravity model: each event (consumer) splits its unit demand
    over candidate documents (stores) within ε, proportionally to
    attractiveness / distance² (attractiveness = n_chars); per-store
    expected demand = Σ shares — the retail-catchment workhorse. Scale
    shape: candidates come from the one-shuffle ε cell/ring equi-join
    (never consumer × store); the per-event normalization is a window over
    the bounded candidate group; demand is one partial+final agg. Top-20
    stores by demand."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.pip_join import within_distance_join

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id")
        .filter(F.col("event_id") < 4000)
    )
    lat_e, lng_e = _latlng_cols(F.col("event_id"))
    epts = ev.withColumn("lat", lat_e).withColumn("lng", lng_e)
    d = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lat_d, lng_d = _latlng_cols(F.col("doc_id"))
    dpts = d.withColumn("lat", lat_d).withColumn("lng", lng_d)
    pairs = within_distance_join(epts, dpts, eps=_HUFF_EPS).select(
        F.col("l.event_id").alias("event_id"),
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.n_chars").alias("a"),
        "dist",
    )
    wgt = F.col("a") / F.greatest(
        F.col("dist") * F.col("dist"), F.lit(0.000001)
    )
    w = Window.partitionBy("event_id")
    # Repo convention: pre-round the per-pair share to 9 dp before the
    # per-doc SUM so Spark-vs-DuckDB summation-order ulp noise cannot flip
    # the 6-dp rounded demand on knife-edge values.
    shares = pairs.withColumn("p", F.round(wgt / F.sum(wgt).over(w), 9))
    return (
        shares.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.round(F.sum("p"), 6).alias("demand"),
        )
        .orderBy(F.col("demand").desc(), "doc_id")
        .limit(20)
    )


def _huff_demand_sql() -> str:
    lat_e, lng_e = _latlng_sql("event_id")
    lat_d, lng_d = _latlng_sql("doc_id")
    return f"""
        WITH e AS (SELECT event_id, {lat_e} AS lat, {lng_e} AS lng
                   FROM events WHERE event_id < 4000),
        s AS (SELECT doc_id, n_chars, {lat_d} AS lat, {lng_d} AS lng
              FROM documents),
        pairs AS (
            SELECT e.event_id, s.doc_id, s.n_chars AS a,
                   ROUND(SQRT((e.lat - s.lat) * (e.lat - s.lat)
                            + (e.lng - s.lng) * (e.lng - s.lng)), 6) AS dist
            FROM e JOIN s
              ON ROUND(SQRT((e.lat - s.lat) * (e.lat - s.lat)
                          + (e.lng - s.lng) * (e.lng - s.lng)), 6)
                 <= {_HUFF_EPS!r}),
        shares AS (
            SELECT doc_id,
                   ROUND((a / GREATEST(dist * dist, 0.000001))
                         / SUM(a / GREATEST(dist * dist, 0.000001))
                             OVER (PARTITION BY event_id), 9) AS p
            FROM pairs)
        SELECT doc_id, COUNT(*) AS n_reached, ROUND(SUM(p), 6) AS demand
        FROM shares GROUP BY 1
        ORDER BY demand DESC, doc_id
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# fixed-threshold teleport flags (streaming twin's batch path) (session 6)
# ---------------------------------------------------------------------------

_TP_KMH = 1000000.0


def q_teleport_flags(spark, sf_dir):
    """Fixed-threshold teleport screen — the BATCH path of the stateful
    streaming detector (`streaming/teleport.py`; stream==batch parity
    pytest-asserted in tests/test_streaming_teleport.py). Top-20 fastest
    flagged legs over the event anchors."""
    from raptor_service_spark.streaming.teleport import teleport_batch

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        "user_id",
        F.col("event_id").alias("pid"),
        "ts",
        lat.alias("lat"),
        lng.alias("lng"),
    )
    return (
        teleport_batch(pts, _TP_KMH)
        .orderBy(F.col("speed_kmh").desc(), "pid")
        .limit(20)
        .select(
            "user_id",
            "pid",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "speed_kmh",
        )
    )


def _teleport_flags_sql() -> str:
    from raptor_service_spark.geo.distance import haversine_sql

    lat, lng = _latlng_sql("event_id")
    hav = haversine_sql("plat", "plng", "lat", "lng")
    return f"""
        WITH pts AS (
            SELECT user_id, event_id AS pid, ts, {lat} AS lat, {lng} AS lng
            FROM events),
        lagged AS (
            SELECT user_id, pid, ts, lat, lng,
                   LAG(lat) OVER (PARTITION BY user_id ORDER BY ts, pid) AS plat,
                   LAG(lng) OVER (PARTITION BY user_id ORDER BY ts, pid) AS plng,
                   (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, pid))
                       / 3600000000.0 AS dt_h
            FROM pts),
        legs AS (
            SELECT user_id, pid, ts, ROUND({hav} / dt_h, 6) AS speed_kmh
            FROM lagged WHERE dt_h > 0)
        SELECT user_id, pid,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, speed_kmh
        FROM legs WHERE speed_kmh > {_TP_KMH!r}
        ORDER BY speed_kmh DESC, pid
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# BPE merge training (session 6)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 5


def q_bpe_merges(spark, sf_dir):
    """Byte-pair-encoding merge training, the real thing at dictionary
    scale: like sentencepiece, the trainer operates on the DISTINCT-word
    count table (O(vocab) rows, one corpus scan builds it), never the raw
    token stream. Each round counts adjacent symbol pairs weighted by word
    frequency, picks the argmax (count desc, pair asc — deterministic),
    and rewrites the symbol strings with two non-overlapping literal
    replace passes (identical leftmost-scan semantics in both engines;
    documented approximation of exhaustive re-scan). Only the single
    argmax row ever reaches the driver per round. Output: the first 5
    merges (round, pair, merged, cnt) — the learned tokenizer prefix."""
    d = _read(spark, sf_dir, "documents").select("text")
    vocab = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "sym", F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 "))
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    cur = vocab
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            # guard: Spark's sequence(1, 0) DESCENDS instead of being empty,
            # so single-symbol words must be filtered before the transform
            cur.filter(F.size(F.split(F.trim("sym"), " ")) >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(trim(sym), ' ')) - 1), "
                        "i -> concat(element_at(split(trim(sym), ' '), i), ' ', "
                        "element_at(split(trim(sym), ' '), i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(F.col("c").desc(), F.col("pair").asc()).limit(1).collect()
        if not best:
            break
        pair, c = best[0]["pair"], int(best[0]["c"])
        merged = pair.replace(" ", "")
        merges.append((r, pair, merged, c))
        tgt, rep = F.lit(f" {pair} "), F.lit(f" {merged} ")
        cur = (
            cur.withColumn("sym", F.replace(F.col("sym"), tgt, rep))
            .withColumn("sym", F.replace(F.col("sym"), tgt, rep))
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        merges, "round long, pair string, merged string, cnt long"
    ).orderBy("round")


def _bpe_merges_sql() -> str:
    steps = []
    prev = "w0"
    for r in range(1, _BPE_ROUNDS + 1):
        steps.append(
            f"""p{r} AS MATERIALIZED (
            SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM (
                SELECT cnt, unnest(list_transform(
                    generate_series(1, len(a) - 1),
                    i -> a[i] || ' ' || a[i + 1])) AS pair
                FROM (SELECT cnt,
                             regexp_split_to_array(trim(sym), ' ') AS a
                      FROM {prev}))
            GROUP BY 1),
        b{r} AS MATERIALIZED (
            SELECT {r} AS round, pair, replace(pair, ' ', '') AS merged, c
            FROM p{r} ORDER BY c DESC, pair ASC LIMIT 1),
        w{r} AS MATERIALIZED (
            SELECT w, cnt,
                   replace(replace(sym,
                       ' ' || (SELECT pair FROM b{r}) || ' ',
                       ' ' || (SELECT merged FROM b{r}) || ' '),
                       ' ' || (SELECT pair FROM b{r}) || ' ',
                       ' ' || (SELECT merged FROM b{r}) || ' ') AS sym
            FROM {prev})"""
        )
        prev = f"w{r}"
    chain = ",\n        ".join(steps)
    union = " UNION ALL ".join(
        f"SELECT round, pair, merged, c AS cnt FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
        WITH w0 AS MATERIALIZED (
            SELECT w, cnt,
                   ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sym
            FROM (
                SELECT w, COUNT(*) AS cnt FROM (
                    SELECT unnest(regexp_split_to_array(
                        lower(trim(text)), '\\s+')) AS w
                    FROM documents)
                GROUP BY 1)),
        {chain}
        SELECT round, pair, merged, cnt FROM ({union})
        ORDER BY round
    """


# ---------------------------------------------------------------------------
# bigram LM perplexity (session 6)
# ---------------------------------------------------------------------------


def q_doc_bigram_ppl(spark, sf_dir):
    """Per-document bigram-LM negative log-likelihood with Laplace
    smoothing: P(w2|w1) = (c(w1w2)+1)/(c(w1·)+V) from the corpus's own
    bigram model — the order-sensitive upgrade of the unigram perplexity
    filter (templated text scores low, shuffled/rare-order text high).
    Top-20 most-perplexing docs. Scale shape: bigrams are built ARRAY-side
    (no window/self-join); corpus counts are two hash aggs; the score join
    is bigram-stream ⋈ aggregated counts (AQE-handled skew), never
    doc × doc; V broadcasts."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    arrs = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("arr")
    ).filter(F.size("arr") >= 2)
    bis = arrs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(arr) - 1), "
                "i -> concat(element_at(arr, i), '_', element_at(arr, i + 1)))"
            )
        ).alias("ab"),
    )
    c2 = bis.groupBy("ab").agg(F.count(F.lit(1)).alias("c_ab"))
    c1 = (
        bis.select(F.substring_index("ab", "_", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_1"))
    )
    vocab = (
        arrs.select(F.explode("arr").alias("w"))
        .agg(F.count_distinct("w").cast("double").alias("v"))
    )
    scored = (
        bis.join(c2, "ab")
        .withColumn("w1", F.substring_index("ab", "_", 1))
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(-F.ln((F.col("c_ab") + 1) / (F.col("c_1") + F.col("v")))), 6
            ).alias("nll"),
        )
    )
    return scored.orderBy(F.desc("nll"), "doc_id").limit(20)


def _doc_bigram_ppl_sql() -> str:
    return """
        WITH arrs AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
            FROM documents WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 2),
        bis AS (
            SELECT doc_id, unnest(list_transform(
                generate_series(1, len(arr) - 1),
                i -> arr[i] || '_' || arr[i + 1])) AS ab
            FROM arrs),
        c2 AS (SELECT ab, COUNT(*) AS c_ab FROM bis GROUP BY 1),
        c1 AS (SELECT split_part(ab, '_', 1) AS w1, COUNT(*) AS c_1
               FROM bis GROUP BY 1),
        vocab AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v FROM (
            SELECT unnest(arr) AS w FROM arrs)),
        scored AS (
            SELECT b.doc_id, COUNT(*) AS n_bigrams,
                   ROUND(AVG(-LN((c2.c_ab + 1) / (c1.c_1 + vocab.v))), 6)
                       AS nll
            FROM bis b
            JOIN c2 ON b.ab = c2.ab
            JOIN c1 ON split_part(b.ab, '_', 1) = c1.w1
            CROSS JOIN vocab
            GROUP BY 1)
        SELECT doc_id, n_bigrams, nll FROM scored
        ORDER BY nll DESC, doc_id
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# G-function, mixture resampling, inter-arrival fit (session 6)
# ---------------------------------------------------------------------------

_GF_BANDS = [5.0, 6.0, 7.0, 8.0]


def q_g_function(spark, sf_dir):
    """Nearest-neighbor distance distribution G(d) — the empirical CDF of
    per-point NN distances at fixed bands, the spacing companion to
    Ripley's K (G above the CSR curve ⇔ clustered at that range). NN
    distances come from the exact ring-doubling self-NN join; the band
    evaluation is one broadcast ladder join over the aggregated NN table."""
    from raptor_service_spark.operators.geo_knn import nn_distances

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(F.col("doc_id").alias("pid"), lng.alias("px"), lat.alias("py"))
    nn = nn_distances(pts, res=5)
    bands = spark.createDataFrame([(b,) for b in _GF_BANDS], "band double")
    return (
        nn.crossJoin(F.broadcast(bands))
        .groupBy("band")
        .agg(
            F.sum((F.col("d1") <= F.col("band")).cast("long")).alias("n_le"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "band",
            "n_le",
            "n",
            F.round(F.col("n_le") / F.col("n").cast("double"), 6).alias("g"),
        )
        .orderBy("band")
    )


def _g_function_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    bands = ", ".join(f"({b!r})" for b in _GF_BANDS)
    return f"""
        WITH p AS (SELECT doc_id AS pid, {lng} AS px, {lat} AS py FROM documents),
        d AS (SELECT a.pid,
                     MIN(SQRT((a.px - b.px) * (a.px - b.px)
                            + (a.py - b.py) * (a.py - b.py))) AS d1
              FROM p a JOIN p b ON a.pid != b.pid
              GROUP BY 1)
        SELECT band, CAST(SUM(CAST(d1 <= band AS INT)) AS BIGINT) AS n_le,
               COUNT(*) AS n,
               ROUND(SUM(CAST(d1 <= band AS INT)) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS g
        FROM d CROSS JOIN (SELECT CAST(band AS DOUBLE) AS band FROM (VALUES {bands}) t(band)) b
        GROUP BY band
        ORDER BY band
    """


_MIX_TARGET = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 0.8, "zh": 0.6}


def q_mixture_resample(spark, sf_dir):
    """Deterministic mixture resampling for training-data curation:
    down-sample each language to a target keep-rate via an md5-uniform
    per-doc draw (stable under re-runs, appends, and repartitioning — the
    same doc always gets the same verdict). One scan, one agg; the rate
    map rides as a literal CASE expression. Reports kept/total per lang."""
    rate = F.create_map(
        *[F.lit(x) for kv in _MIX_TARGET.items() for x in kv]
    )[F.col("lang")]
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    d = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        d.withColumn("keep", (u < rate).cast("long"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.round(F.sum("keep") / F.count(F.lit(1)).cast("double"), 6).alias(
                "kept_frac"
            ),
        )
        .orderBy("lang")
    )


def _mixture_resample_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v!r}" for k, v in _MIX_TARGET.items()
    )
    return f"""
        WITH d AS (
            SELECT lang,
                   CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)),
                         1, 8))::BIGINT AS DOUBLE) / 4294967296.0 AS u,
                   CASE lang {cases} END AS rate
            FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CAST(u < rate AS INT)) AS BIGINT) AS n_kept,
               ROUND(SUM(CAST(u < rate AS INT)) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS kept_frac
        FROM d GROUP BY 1 ORDER BY 1
    """


_DSIR_B = 256


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc by
    how target-like its hashed-feature distribution is — log w(doc) =
    Σ_tokens [ln p̂_target(bucket) − ln p̂_raw(bucket)] over md5-hashed
    unigram buckets (B=256, Laplace-smoothed). Target = the deterministic
    'test' hash split (the same stable split train_decontam protects); the
    top-scoring docs are what DSIR resamples into the training mixture.
    (hash_split import is function-local like the other split consumers.)

    Scale shape at 100 TB: the token stream is touched ONCE per role (two
    partial+final bucket aggs — 256-row outputs); the per-feature
    log-ratio table is a 256-row BROADCAST; the per-doc score is one
    doc-keyed agg. No doc×doc work, no model inference. Float convention:
    per-bucket log-ratio pre-rounded 9 dp (ln ulps differ across libm
    implementations), per-doc sum rounded 6 dp."""
    from raptor_service_spark.functions.text import hash_split

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
        % F.lit(_DSIR_B)
    )
    wb = words.select("doc_id", bucket.alias("b"), hash_split(F.col("doc_id")).alias("split"))
    raw = wb.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = wb.filter(F.col("split") == "test").groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    totals = wb.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum((F.col("split") == "test").cast("long")).alias("nt"),
    )
    feat = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce("ct", F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("nt") + F.lit(_DSIR_B)).cast("double")
                )
                - F.log(
                    (F.col("cr") + F.lit(1)).cast("double")
                    / (F.col("nr") + F.lit(_DSIR_B)).cast("double")
                ),
                9,
            ).alias("lr"),
        )
    )
    return (
        wb.join(F.broadcast(feat), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("log_w"),
        )
        .orderBy(F.col("log_w").desc(), "doc_id")
        .limit(20)
    )


def _dsir_weights_sql() -> str:
    from raptor_service_spark.functions.text import hash_split_sql

    split = hash_split_sql("doc_id")
    return f"""
        WITH words AS (
            SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)),
                   '\\s+')) AS w, {split} AS split
            FROM documents),
        wb AS (
            SELECT doc_id, split,
                   ('0x' || substr(md5(w), 1, 8))::BIGINT % {_DSIR_B} AS b
            FROM words WHERE w != ''),
        raw AS (SELECT b, COUNT(*) AS cr FROM wb GROUP BY 1),
        tgt AS (SELECT b, COUNT(*) AS ct FROM wb WHERE split = 'test'
                GROUP BY 1),
        totals AS (
            SELECT COUNT(*) AS nr,
                   CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
                        AS BIGINT) AS nt
            FROM wb),
        feat AS (
            SELECT raw.b,
                   ROUND(LN(CAST(COALESCE(ct, 0) + 1 AS DOUBLE)
                            / CAST(nt + {_DSIR_B} AS DOUBLE))
                         - LN(CAST(cr + 1 AS DOUBLE)
                              / CAST(nr + {_DSIR_B} AS DOUBLE)), 9) AS lr
            FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN totals)
        SELECT doc_id, COUNT(*) AS n_tokens, ROUND(SUM(lr), 6) AS log_w
        FROM wb JOIN feat ON wb.b = feat.b
        GROUP BY 1
        ORDER BY log_w DESC, doc_id
        LIMIT 20
    """


_PIPT_RES, _PIPT_N, _PIPT_SEED = 5, 6, 72


def _pipt_polys() -> list:
    """The polygon-table fixtures: generator polygons scaled 4x about
    their vertex centroid (the raw 2-15 degree query polygons are sized
    for dense regional corpora; against the globe-spread doc points the
    scaled set yields a few hundred hits — a meaningful join). One shared
    Python source feeds BOTH the Spark createDataFrame rows and the
    oracle's VALUES literals, so vertex floats are identical by
    construction. Clipping after scaling can bend a vertex inward; the
    half-plane kernel rule both engines share is exact regardless."""
    from raptor_service_spark.datagen import gen_query_polygons

    out = []
    for poly in gen_query_polygons(seed=_PIPT_SEED, n=_PIPT_N):
        c = poly.mean(axis=0)
        big = c + 4.0 * (poly - c)
        big[:, 0] = np.clip(big[:, 0], -89.0, 89.0)
        big[:, 1] = np.clip(big[:, 1], -179.9, 179.9)
        out.append([[float(a), float(b)] for a, b in big])
    return out


def q_pip_polygon_table(spark, sf_dir):
    """TABLE-driven point-in-polygon join — polygons arrive as a DataFrame
    (qid, verts), not a driver dict, so the polygon side can itself be
    millions of rows at 100 TB: polyfill runs DISTRIBUTED (mapInPandas per
    polygon row → (qid, cover cell)), the candidate stage is a cell
    equi-join, and the refine is a pure-codegen expression over the verts
    array (NO UDF): inside = every directed edge cross product has one
    sign — the closed half-plane intersection (exactly the polygon for
    convex inputs; its kernel otherwise), orientation-free via min≥0 OR
    max≤0. The oracle runs the EXHAUSTIVE points × polygons join with the
    bit-identical rule, proving the cover-cell candidacy complete.
    Output per polygon: hit count + exact doc_id checksum."""
    from raptor_service_spark.geo.grid import cell_encode_col, polyfill

    pt = spark.createDataFrame(
        [(f"q{k}", poly) for k, poly in enumerate(_pipt_polys())],
        "qid string, verts array<array<double>>",
    )

    def fill(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for qid, verts in zip(b["qid"], b["verts"]):
                cells, _ = polyfill(
                    np.array([[v[0], v[1]] for v in verts], dtype=np.float64),
                    _PIPT_RES,
                )
                rows.extend((qid, int(c)) for c in cells)
            yield pd.DataFrame(rows, columns=["qid", "cell"])

    cells = pt.mapInPandas(fill, "qid string, cell long")
    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(
        "doc_id", lat.alias("lat"), lng.alias("lng")
    ).withColumn("cell", cell_encode_col(F.col("lat"), F.col("lng"), _PIPT_RES))
    # no broadcast HINT: AQE auto-broadcasts the small polygon side here;
    # a genuinely huge polygon table falls back to a shuffle join on the
    # same keys (the claim in the docstring) rather than OOMing the driver
    cand = pts.join(cells, "cell").join(pt, "qid")
    crosses = (
        "transform(sequence(0, size(verts) - 1), i -> "
        "(verts[(i + 1) % size(verts)][1] - verts[i][1]) * (lat - verts[i][0]) "
        "- (verts[(i + 1) % size(verts)][0] - verts[i][0]) * (lng - verts[i][1]))"
    )
    inside = F.expr(
        f"array_min({crosses}) >= 0 OR array_max({crosses}) <= 0"
    )
    return (
        cand.filter(inside)
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
        .orderBy("qid")
    )


def _pip_polygon_table_sql() -> str:
    vals = ", ".join(
        "('q{k}', [{vs}])".format(
            k=k,
            vs=", ".join(f"[{a!r}, {b!r}]" for a, b in poly),
        )
        for k, poly in enumerate(_pipt_polys())
    )
    lat, lng = _latlng_sql("doc_id")
    crosses = (
        "list_transform(range(1, len(verts) + 1), i -> "
        "(verts[i % len(verts) + 1][2] - verts[i][2]) * (lat - verts[i][1]) "
        "- (verts[i % len(verts) + 1][1] - verts[i][1]) * (lng - verts[i][2]))"
    )
    return f"""
        WITH polys(qid, verts) AS (VALUES {vals}),
        pts AS (SELECT doc_id, {lat} AS lat, {lng} AS lng FROM documents),
        cand AS (SELECT p.doc_id, p.lat, p.lng, q.qid, q.verts
                 FROM pts p CROSS JOIN polys q)
        SELECT qid, COUNT(*) AS n_hits,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
        FROM cand
        WHERE list_aggregate({crosses}, 'min') >= 0
           OR list_aggregate({crosses}, 'max') <= 0
        GROUP BY 1 ORDER BY 1
    """


_PCA_DIM, _PCA_ROUNDS = 64, 8


def q_pca_top_component(spark, sf_dir):
    """Top principal component of the embedding table by POWER ITERATION —
    the dimensionality audit an embedding pipeline runs (anisotropy /
    matryoshka-truncation checks; Arora et al.'s 'common discourse vector'
    removal uses exactly this vector). Three stages, all distributed:

      1. moments — ONE mapInPandas pass emits per-Arrow-batch partial
         (n, Σx[64], Σxxᵀ[4096]) rows (the block outer-product form — at
         100 TB the shuffle carries O(partitions) rows of 4 KB, never a
         64×-exploded corpus); partials reduce via one posexplode + agg;
         the reduced moment sums are ROUNDED AT 5 dp — magnitudes are
         O(n·0.015), so the grid dwarfs fold-order ulp noise by ~10⁹ and
         every downstream value becomes a pure function of identical
         inputs on both engines (a bare 9-dp round on the CANCELLING
         covariance subtraction measurably flipped knife edges ~4%/run).
      2. covariance — C[i,j] = g/n − (s_i/n)(s_j/n) with NO rounding:
         exact IEEE ops on bit-identical rounded moments are themselves
         bit-identical across engines; rounding here would quantize onto
         a lattice whose next-stage sums land EXACTLY on half boundaries,
         where engine rounding implementations legitimately disagree (the
         failure mode this operator's first draft hit).
      3. iteration — 8 unrolled power rounds RELATIONALLY on (i, j, c):
         w = ROUND(C·v, 9) (the only fold-order-sensitive sums), ‖w‖ =
         ROUND(sqrt(Σw²), 9) (sqrt de-lattices), v = w/‖w‖ EXACT (pure
         function of identical inputs — rounding v would re-lattice the
         next round's products); start v₀ = 1/√dim. The DuckDB twin
         unrolls the same rounds as MATERIALIZED CTEs.

    Output: the 64 loadings of the principal axis + the Rayleigh
    eigenvalue estimate, both 6 dp (computed from the final w via a fresh
    sqrt, never by re-rounding a 9-dp value — a 9-dp lattice point can sit
    exactly on a 6-dp half boundary)."""
    e = _read(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    dim = _PCA_DIM

    def gram(batches):
        import pandas as pd

        for b in batches:
            if not len(b):
                continue
            mat = np.array(b["v"].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(mat)],
                    "s": [mat.sum(axis=0).tolist()],
                    "g": [(mat.T @ mat).reshape(-1).tolist()],
                }
            )

    partials = e.mapInPandas(
        gram, "n long, s array<double>, g array<double>"
    )
    tot = partials.agg(F.sum("n").alias("n"))
    s_tab = (
        partials.select(F.posexplode("s").alias("i", "x"))
        .groupBy("i")
        .agg(F.round(F.sum("x"), 5).alias("s"))
    )
    g_tab = (
        partials.select(F.posexplode("g").alias("k", "x"))
        .groupBy("k")
        .agg(F.round(F.sum("x"), 5).alias("g"))
        .select(
            (F.col("k") / dim).cast("int").alias("i"),
            (F.col("k") % dim).cast("int").alias("j"),
            "g",
        )
    )
    cov = (
        g_tab.join(s_tab.select(F.col("i"), F.col("s").alias("si")), "i")
        .join(s_tab.select(F.col("i").alias("j"), F.col("s").alias("sj")), "j")
        .crossJoin(F.broadcast(tot))
        .select(
            "i",
            "j",
            (
                F.col("g") / F.col("n")
                - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n"))
            ).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    v0 = float(1.0 / np.sqrt(dim))
    # per-round: ONE small agg job over the cached 4096-row cov table with
    # the current v as a literal array (no join, no per-round checkpoint —
    # a fully lazy 8-round plan cost 3x more in Catalyst re-analysis, and
    # eager per-round checkpoints 2x in scheduler round-trips; measured).
    # The norm is rounded on the driver with BigDecimal-identical HALF_UP
    # (Decimal on the shortest repr — the teleport codec technique);
    # division is an exact IEEE op, so v stays bit-identical to an
    # in-engine formulation.
    import math as _math
    from decimal import ROUND_HALF_UP, Decimal

    def _r9(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000000001"), ROUND_HALF_UP))

    v = [v0] * dim
    lam_raw = 0.0
    for _ in range(_PCA_ROUNDS):
        lit = F.array(*[F.lit(float(x)) for x in v])
        rows = (
            cov.groupBy("i")
            .agg(
                F.round(
                    F.sum(F.col("c") * F.element_at(lit, F.col("j") + 1)), 9
                ).alias("w")
            )
            .collect()
        )
        wmap = {r.i: r.w for r in rows}
        ws = [wmap.get(i, 0.0) for i in range(dim)]
        s2 = 0.0
        for x in ws:  # fixed i-order fold; 9-dp round absorbs the oracle's
            s2 += x * x  # arbitrary-order SUM
        lam_raw = _math.sqrt(s2)
        nrm = _r9(lam_raw)
        v = [x / nrm for x in ws]
    out = spark.createDataFrame(
        [(int(i), float(x)) for i, x in enumerate(v)], "i long, v double"
    )
    return out.select(
        "i",
        F.round("v", 6).alias("loading"),
        F.round(F.lit(float(lam_raw)), 6).alias("eigenvalue"),
    ).orderBy("i")


def _pca_top_component_sql() -> str:
    dim, rounds = _PCA_DIM, _PCA_ROUNDS
    v0 = float(1.0 / np.sqrt(dim))
    steps = []
    for t in range(1, rounds + 1):
        steps.append(
            f"""w{t} AS (
            SELECT c.i, ROUND(SUM(c.c * v.v), 9) AS w
            FROM cov c JOIN v{t - 1} v ON c.j = v.j
            GROUP BY c.i),
        n{t} AS (SELECT ROUND(SQRT(SUM(w * w)), 9) AS nrm FROM w{t}),
        v{t} AS MATERIALIZED (
            SELECT i AS j, w / nrm AS v
            FROM w{t} CROSS JOIN n{t})"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        tot AS (SELECT COUNT(*) AS n FROM e),
        el AS MATERIALIZED (
            SELECT t.i - 1 AS i, v[t.i] AS x
            FROM e CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) t),
        s_tab AS MATERIALIZED (SELECT i, ROUND(SUM(x), 5) AS s FROM el GROUP BY 1),
        g_tab AS MATERIALIZED (
            SELECT t1.i - 1 AS i, t2.j - 1 AS j,
                   ROUND(SUM(v[t1.i] * v[t2.j]), 5) AS g
            FROM e
            CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) t1
            CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS j) t2
            GROUP BY 1, 2),
        cov AS MATERIALIZED (
            SELECT g.i, g.j,
                   g.g / t.n - (si.s / t.n) * (sj.s / t.n) AS c
            FROM g_tab g
            JOIN s_tab si ON si.i = g.i
            JOIN s_tab sj ON sj.i = g.j
            CROSS JOIN tot t),
        v0 AS (SELECT unnest(generate_series(0, {dim - 1})) AS j, {v0!r} AS v),
        {chain}
        SELECT v.j AS i, ROUND(v.v, 6) AS loading, lam.eigenvalue
        FROM v{rounds} v CROSS JOIN
             (SELECT ROUND(SQRT(SUM(w * w)), 6) AS eigenvalue
              FROM w{rounds}) lam
        ORDER BY i
    """


_HRW_SHARDS = 8


def q_rendezvous_shards(spark, sf_dir):
    """Rendezvous (highest-random-weight) sharding — the stable document →
    shard assignment a 100 TB pipeline uses so that adding/removing one
    worker moves ONLY that worker's documents (consistent-hashing
    guarantee, Thaler & Ravishankar 1996). weight(doc, s) = md5(doc|s);
    shard = argmax. Reports per-shard counts plus, per shard, how many of
    its docs would RE-assign to it if shard 0 left — the minimal-disruption
    property as data: only shard-0 docs move, and they spread by the same
    argmax over the survivors. One scan, one agg; the argmax over the
    8-way literal weights is pure codegen (no shuffle before
    the count agg)."""
    d = _read(spark, sf_dir, "documents").select("doc_id")

    def wgt(s):
        return F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"|{s}")))

    def argmax(shards):
        # max over (weight, shard) structs; md5 collisions impossible at
        # corpus scale, shard id breaks the tie deterministically anyway
        return F.array_max(
            F.array(
                *[
                    F.struct(wgt(s).alias("w"), F.lit(s).alias("s"))
                    for s in shards
                ]
            )
        ).getField("s")

    full = argmax(range(_HRW_SHARDS))
    without0 = argmax(range(1, _HRW_SHARDS))
    return (
        d.select(full.alias("shard"), without0.alias("shard_minus0"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("shard") != F.col("shard_minus0")).cast("long")).alias(
                "n_moved_if_0_leaves"
            ),
        )
        .orderBy("shard")
    )


def _rendezvous_shards_sql() -> str:
    def wgt(s):
        return f"md5(CAST(doc_id AS VARCHAR) || '|{s}')"

    def argmax(shards):
        structs = ", ".join(
            f"{{'w': {wgt(s)}, 's': {s}}}" for s in shards
        )
        return f"list_max([{structs}]).s"

    full = argmax(range(_HRW_SHARDS))
    without0 = argmax(range(1, _HRW_SHARDS))
    return f"""
        WITH a AS (
            SELECT {full} AS shard, {without0} AS shard_minus0
            FROM documents)
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN shard != shard_minus0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved_if_0_leaves
        FROM a GROUP BY 1 ORDER BY 1
    """


def q_interarrival_fit(spark, sf_dir):
    """Exponential fit + one-sample KS distance for per-user event
    inter-arrival times (whole-second gaps): λ̂ = 1/mean from exact integer
    sums, then D = sup over the value HISTOGRAM of the two-sided gap
    between the empirical CDF and 1−exp(−λx). The burstiness screen for
    event streams (KS far above ~1.36/√n ⇒ not Poisson). Scale shape: one
    user window builds gaps; everything after runs on the O(distinct
    seconds) histogram (quantization bounds the cumulative window)."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.floor((ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))) / F.lit(1000000.0)).cast("long")
    gaps = (
        ev.withColumn("gap_s", gap)
        .filter(F.col("gap_s").isNotNull() & (F.col("gap_s") >= 0))
        .select("gap_s")
    )
    hist = gaps.groupBy("gap_s").agg(F.count(F.lit(1)).alias("c"))
    tot = hist.agg(
        F.sum("c").alias("n"), F.sum(F.col("gap_s") * F.col("c")).alias("s")
    )
    wc = Window.orderBy("gap_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(wc))
    lam = F.col("n").cast("double") / F.col("s").cast("double")
    cdf = F.lit(1.0) - F.exp(-lam * F.col("gap_s").cast("double"))
    ks_at = F.greatest(
        F.abs(F.col("cum").cast("double") / F.col("n") - cdf),
        F.abs((F.col("cum") - F.col("c")).cast("double") / F.col("n") - cdf),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n_gaps"),
            F.round(F.max(lam), 9).alias("lambda_hat"),
            F.round(F.max(ks_at), 6).alias("ks_dist"),
        )
        .select(
            "n_gaps",
            F.round(F.col("lambda_hat"), 6).alias("lambda_hat"),
            "ks_dist",
        )
    )


def _interarrival_fit_sql() -> str:
    return """
        WITH gaps AS (
            SELECT CAST(FLOOR((epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id))
                       / 1000000.0) AS BIGINT) AS gap_s
            FROM events
            QUALIFY gap_s IS NOT NULL AND gap_s >= 0),
        hist AS (SELECT gap_s, COUNT(*) AS c FROM gaps GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                       CAST(SUM(gap_s * c) AS BIGINT) AS s FROM hist),
        cum AS (SELECT gap_s, c,
                       SUM(c) OVER (ORDER BY gap_s
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM hist)
        SELECT MAX(n) AS n_gaps,
               ROUND(ROUND(MAX(CAST(n AS DOUBLE) / s), 9), 6) AS lambda_hat,
               ROUND(MAX(GREATEST(
                   ABS(CAST(cum AS DOUBLE) / n
                       - (1.0 - EXP(-(CAST(n AS DOUBLE) / s)
                                    * CAST(gap_s AS DOUBLE)))),
                   ABS(CAST(cum - c AS DOUBLE) / n
                       - (1.0 - EXP(-(CAST(n AS DOUBLE) / s)
                                    * CAST(gap_s AS DOUBLE)))))), 6) AS ks_dist
        FROM cum CROSS JOIN tot
    """


# ---------------------------------------------------------------------------
# k-DOP directional hulls per region (session 6)
# ---------------------------------------------------------------------------

_DOP_D = 8


def _dop_dirs() -> list[tuple[float, float]]:
    import math

    return [
        (math.cos(2 * math.pi * i / _DOP_D), math.sin(2 * math.pi * i / _DOP_D))
        for i in range(_DOP_D)
    ]


def q_cluster_hulls(spark, sf_dir):
    """Per-region k-DOP hull (discrete-orientation convex approximation):
    for each res-2 document cell with >= 20 points, the 8 directional
    extreme points (argmax of x·cosθ + y·sinθ), chained by direction into
    a polygon whose shoelace area approximates the cluster's convex-hull
    footprint. One agg pass — no sort, no iteration, no pairwise work:
    each extreme is a max(struct) with a deterministic larger-id
    tie-break, identical in both engines; the area is a FIXED arithmetic
    expression over the 8 extremes (same op order both engines). The
    scalable stand-in for exact convex hulls at 100 TB (k-DOP bounding
    volumes)."""
    from raptor_service_spark.geo.grid import cell_encode_col

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(
        "doc_id",
        lng.alias("x"),
        lat.alias("y"),
        cell_encode_col(lat, lng, 2).alias("cell"),
    )
    aggs = [F.count(F.lit(1)).alias("n_points")]
    for i, (c, s) in enumerate(_dop_dirs()):
        proj = F.col("x") * F.lit(c) + F.col("y") * F.lit(s)
        aggs.append(
            F.max(F.struct(proj.alias("p"), F.col("doc_id").alias("pid"),
                           F.col("x").alias("hx"), F.col("y").alias("hy"))
                  ).alias(f"m{i}")
        )
    g = pts.groupBy("cell").agg(*aggs).filter(F.col("n_points") >= 20)
    shoelace = None
    for i in range(_DOP_D):
        j = (i + 1) % _DOP_D
        term = (
            F.col(f"m{i}.hx") * F.col(f"m{j}.hy")
            - F.col(f"m{j}.hx") * F.col(f"m{i}.hy")
        )
        shoelace = term if shoelace is None else shoelace + term
    return g.select(
        "cell",
        "n_points",
        F.round(F.abs(shoelace) / F.lit(2.0), 6).alias("hull_area"),
    ).orderBy("cell")


def _cluster_hulls_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql("y", "x", 2)
    sel = ["COUNT(*) AS n_points"]
    for i, (c, s) in enumerate(_dop_dirs()):
        sel.append(
            f"MAX(struct_pack(p := x * {c!r} + y * {s!r}, pid := doc_id, "
            f"hx := x, hy := y)) AS m{i}"
        )
    terms = " + ".join(
        f"((m{i}).hx * (m{(i + 1) % _DOP_D}).hy"
        f" - (m{(i + 1) % _DOP_D}).hx * (m{i}).hy)"
        for i in range(_DOP_D)
    )
    return f"""
        WITH p AS (SELECT doc_id, {lng} AS x, {lat} AS y FROM documents),
        g AS (
            SELECT {cell} AS cell, {', '.join(sel)}
            FROM p GROUP BY 1)
        SELECT cell, n_points,
               ROUND(ABS({terms}) / 2.0, 6) AS hull_area
        FROM g WHERE n_points >= 20
        ORDER BY cell
    """


# ---------------------------------------------------------------------------
# colocation quotient + Heaps'-law vocabulary growth (session 6)
# ---------------------------------------------------------------------------

_CLQ_N = 2000


def q_colocation_quotient(spark, sf_dir):
    """Colocation quotient CLQ(A→B) between event types: the share of
    A-points whose nearest neighbor is type B, normalized by B's global
    share — CLQ > 1 means A co-locates with B beyond chance (the
    categorical point-pattern analog of cross-K). Nearest neighbors come
    from the exact ring-doubling self-NN join (`operators/geo_knn.py:
    nn_distances`, now carrying the neighbor's identity with a
    deterministic min-id tie-break); the brute-force oracle proves both
    the NN assignment and the quotient. Restricted to event_id < 2000 so
    the O(n²) oracle stays cheap — the engine path is the same at any n."""
    from raptor_service_spark.operators.geo_knn import nn_distances

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .filter(F.col("event_id") < _CLQ_N)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(F.col("event_id").alias("pid"), lng.alias("px"), lat.alias("py"))
    nn = nn_distances(pts, res=6)
    ta = ev.select(F.col("event_id").alias("pid"), F.col("event_type").alias("ta"))
    tb = ev.select(
        F.col("event_id").alias("nn_id"), F.col("event_type").alias("tb")
    )
    typed = nn.join(ta, "pid").join(tb, "nn_id")
    per_a = typed.groupBy("ta", "tb").agg(F.count(F.lit(1)).alias("c"))
    na = F.broadcast(
        ev.groupBy(F.col("event_type").alias("ta")).agg(
            F.count(F.lit(1)).alias("n_a")
        )
    )
    nb = F.broadcast(
        ev.groupBy(F.col("event_type").alias("tb")).agg(
            F.count(F.lit(1)).alias("n_b")
        )
    )
    tot = F.broadcast(ev.agg(F.count(F.lit(1)).alias("n")))
    return (
        per_a.join(na, "ta")
        .join(nb, "tb")
        .crossJoin(tot)
        .select(
            "ta",
            "tb",
            "c",
            F.round(
                (F.col("c") / F.col("n_a"))
                / (F.col("n_b") / (F.col("n") - F.lit(1.0))),
                6,
            ).alias("clq"),
        )
        .orderBy("ta", "tb")
    )


def _colocation_quotient_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH e AS (SELECT event_id, event_type, {lng} AS px, {lat} AS py
                   FROM events WHERE event_id < {_CLQ_N}),
        nn AS (
            SELECT a.event_id AS pid, b.event_id AS nn_id
            FROM e a JOIN e b ON a.event_id != b.event_id
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY a.event_id
                ORDER BY SQRT((a.px - b.px) * (a.px - b.px)
                            + (a.py - b.py) * (a.py - b.py)), b.event_id) = 1),
        typed AS (
            SELECT ea.event_type AS ta, eb.event_type AS tb
            FROM nn JOIN e ea ON nn.pid = ea.event_id
                    JOIN e eb ON nn.nn_id = eb.event_id),
        per_a AS (SELECT ta, tb, COUNT(*) AS c FROM typed GROUP BY 1, 2),
        na AS (SELECT event_type AS ta, COUNT(*) AS n_a FROM e GROUP BY 1),
        nb AS (SELECT event_type AS tb, COUNT(*) AS n_b FROM e GROUP BY 1),
        tot AS (SELECT COUNT(*) AS n FROM e)
        SELECT p.ta, p.tb, p.c,
               ROUND((p.c / CAST(na.n_a AS DOUBLE))
                     / (nb.n_b / (tot.n - 1.0)), 6) AS clq
        FROM per_a p JOIN na ON p.ta = na.ta JOIN nb ON p.tb = nb.tb
        CROSS JOIN tot
        ORDER BY p.ta, p.tb
    """


def q_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary growth: distinct vocabulary size after the
    first k documents (k on a doubling ladder), plus the log-log OLS
    exponent β (natural text β ≈ 0.4-0.6; templated corpora saturate).
    Scale shape: first-occurrence doc per term is ONE min-agg over the
    term stream; the cumulative curve is a broadcast ladder join over the
    O(vocab) aggregated table — points are never re-scanned per k."""
    d = _read(spark, sf_dir, "documents")
    from raptor_service_spark.operators.dedup import words_col

    first = (
        d.select("doc_id", F.explode(words_col(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    ks = [25, 50, 100, 200, 400]
    ladder = spark.createDataFrame([(k,) for k in ks], "k long")
    curve = (
        first.crossJoin(F.broadcast(ladder))
        .filter(F.col("first_doc") < F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    xy = curve.select(
        "k",
        "vocab",
        F.log(F.col("k").cast("double")).alias("x"),
        F.log(F.col("vocab").cast("double")).alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.round(F.sum("x"), 9).alias("sx"),
        F.round(F.sum("y"), 9).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 9).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 9).alias("sxy"),
    )
    beta = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        xy.select("k", "vocab")
        .crossJoin(F.broadcast(sums.select(F.round(beta, 6).alias("heaps_beta"))))
        .orderBy("k")
    )


def _heaps_law_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    ks = "(25), (50), (100), (200), (400)"
    return f"""
        WITH first AS (
            SELECT term, MIN(doc_id) AS first_doc FROM (
                SELECT doc_id, unnest({w}) AS term FROM documents)
            GROUP BY 1),
        ladder AS (SELECT k FROM (VALUES {ks}) t(k)),
        curve AS (
            SELECT k, COUNT(*) AS vocab
            FROM first CROSS JOIN ladder WHERE first_doc < k
            GROUP BY 1),
        xy AS (SELECT k, vocab, LN(CAST(k AS DOUBLE)) AS x,
                      LN(CAST(vocab AS DOUBLE)) AS y FROM curve),
        sums AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS m,
                   ROUND(SUM(x), 9) AS sx, ROUND(SUM(y), 9) AS sy,
                   ROUND(SUM(x * x), 9) AS sxx, ROUND(SUM(x * y), 9) AS sxy
            FROM xy)
        SELECT CAST(xy.k AS BIGINT) AS k, CAST(xy.vocab AS BIGINT) AS vocab,
               ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
                   AS heaps_beta
        FROM xy CROSS JOIN sums
        ORDER BY k
    """


# ---------------------------------------------------------------------------
# Geary's C + corpus-statistics (Zipf, Burrows' Delta) (session 6)
# ---------------------------------------------------------------------------


def q_gearys_c(spark, sf_dir):
    """Geary's contiguity ratio C over res-4 event occupancy — the
    difference-based complement of Moran's I (C<1 clustered). Same scale
    shape as morans_i: one point shuffle, ring join over occupied cells
    (operators/spatial_stats.py:gearys_c)."""
    from raptor_service_spark.operators.spatial_stats import gearys_c

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(lat.alias("lat"), lng.alias("lng"))
    return gearys_c(pts, res=4)


def _gearys_c_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import gearys_c_sql

    lat, lng = _latlng_sql("event_id")
    return gearys_c_sql("events", lat, lng, res=4)


def q_zipf_slope(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    ln(freq) ~ ln(rank) across the top-100 terms — the corpus-health
    screen (natural text ≈ −1; synthetic/templated text deviates).
    Scale shape: one term-count agg (partial+final); the rank window runs
    on the O(vocab) aggregated table; the regression is a scalar agg with
    9-dp pre-rounded sums so both engines divide identical doubles."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(words_col(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    top = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 100
    )
    xy = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.round(F.sum("x"), 9).alias("sx"),
        F.round(F.sum("y"), 9).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 9).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 9).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("k").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 6).alias(
            "intercept"
        ),
    )


def _zipf_slope_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH freq AS (
            SELECT term, COUNT(*) AS n FROM (
                SELECT unnest({w}) AS term FROM documents)
            GROUP BY 1),
        top AS (
            SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) AS rank
            FROM freq QUALIFY rank <= 100),
        xy AS (SELECT LN(CAST(rank AS DOUBLE)) AS x,
                      LN(CAST(n AS DOUBLE)) AS y FROM top),
        sums AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                   ROUND(SUM(x), 9) AS sx, ROUND(SUM(y), 9) AS sy,
                   ROUND(SUM(x * x), 9) AS sxx, ROUND(SUM(x * y), 9) AS sxy
            FROM xy)
        SELECT CAST(k AS BIGINT) AS n_terms,
               ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
                   AS zipf_slope,
               ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
                     6) AS intercept
        FROM sums
    """


_DELTA_TOP = 30


def q_source_delta(spark, sf_dir):
    """Burrows' Delta stylometric distance between document sources: z-score
    the relative frequencies of the top-30 corpus terms across sources, then
    Delta(a,b) = mean |z_a − z_b| — the authorship/provenance clustering
    signal used to spot near-duplicate crawls or templated sources.

    Scale shape: token stream feeds (source, term) and per-source totals as
    partial+final aggs; the dense source×term grid, the per-term moments,
    and the source-pair join all run on aggregated tables bounded by
    sources × top-terms; 9-dp pre-rounded sums give cross-engine parity."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(words_col(F.col("text"))).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    top = freq.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _DELTA_TOP
    ).select("term")
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    totals = toks.groupBy("source").agg(F.count(F.lit(1)).alias("tot"))
    grid = (
        totals.crossJoin(F.broadcast(top))
        .join(st, ["source", "term"], "left")
        .select(
            "source",
            "term",
            (F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("tot")).alias(
                "f"
            ),
        )
    )
    mom = grid.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("ns"),
        F.round(F.sum("f"), 9).alias("sf"),
        F.round(F.sum(F.col("f") * F.col("f")), 9).alias("sff"),
    )
    z = (
        grid.join(F.broadcast(mom), "term")
        .withColumn("mu", F.col("sf") / F.col("ns"))
        .withColumn(
            "sg", F.sqrt(F.col("sff") / F.col("ns") - F.col("mu") * F.col("mu"))
        )
        .filter(F.col("sg") > 0)
        .select("source", "term", ((F.col("f") - F.col("mu")) / F.col("sg")).alias("z"))
    )
    a = z.select(F.col("source").alias("src_a"), "term", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("src_b"), "term", F.col("z").alias("zb"))
    return (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            (F.round(F.sum(F.abs(F.col("za") - F.col("zb"))), 9) / F.count(F.lit(1)))
            .alias("d_raw"),
        )
        .select(
            "src_a", "src_b", "n_terms", F.round(F.col("d_raw"), 6).alias("delta")
        )
    )


def _source_delta_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH toks AS (
            SELECT source, unnest({w}) AS term FROM documents),
        freq AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
        top AS (
            SELECT term FROM (
                SELECT term, ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) AS rk
                FROM freq) WHERE rk <= {_DELTA_TOP}),
        st AS (SELECT source, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        totals AS (SELECT source, COUNT(*) AS tot FROM toks GROUP BY 1),
        grid AS (
            SELECT t.source, p.term,
                   CAST(COALESCE(st.c, 0) AS DOUBLE) / t.tot AS f
            FROM totals t CROSS JOIN top p
            LEFT JOIN st ON st.source = t.source AND st.term = p.term),
        mom AS (
            SELECT term, CAST(COUNT(*) AS DOUBLE) AS ns,
                   ROUND(SUM(f), 9) AS sf, ROUND(SUM(f * f), 9) AS sff
            FROM grid GROUP BY 1),
        z AS (
            SELECT g.source, g.term,
                   (g.f - m.sf / m.ns)
                   / SQRT(m.sff / m.ns - (m.sf / m.ns) * (m.sf / m.ns)) AS z
            FROM grid g JOIN mom m ON g.term = m.term
            WHERE SQRT(m.sff / m.ns - (m.sf / m.ns) * (m.sf / m.ns)) > 0)
        SELECT a.source AS src_a, b.source AS src_b,
               COUNT(*) AS n_terms,
               ROUND(ROUND(SUM(ABS(a.z - b.z)), 9) / COUNT(*), 6) AS delta
        FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# adaptive quadtree tiling (session 6)
# ---------------------------------------------------------------------------

_QT_MIN, _QT_MAX, _QT_CAP = 1, 6, 50


def q_quadtree_bins(spark, sf_dir):
    """Adaptive quadtree tiling of the event cloud: starting at res 1, any
    cell holding more than cap=50 points splits into its 4 children, down
    to res 6 — dense metros get fine tiles, empty ocean stays coarse (the
    adaptive analog of the fixed-res tile tree; mirrors the reference's
    max-cluster-size split loop, services/core/build_tree_service.py).
    A point's tile is the COARSEST ladder cell with occupancy <= cap
    (occupancy is monotone along the ladder, so this IS the quadtree leaf).

    Scale shape: points touched ONCE (res-6 occupancy agg); every coarser
    occupancy is a rollup of occ6 via the closed-form parent (aggregated
    rows only); ladder explode ×6 runs on the occupied-cell table; leaf
    pick is a min(struct) agg. Exact integers end to end."""
    from raptor_service_spark.geo.grid import cell_encode_col, cell_parent_col

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    occ6 = (
        ev.select(cell_encode_col(lat, lng, _QT_MAX).alias("cell6"))
        .groupBy("cell6")
        .agg(F.count(F.lit(1)).alias("n6"))
    )
    ladder = occ6.select(
        "cell6",
        "n6",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cell_parent_col(F.col("cell6"), _QT_MAX, r).alias("anc"),
                    )
                    for r in range(_QT_MIN, _QT_MAX + 1)
                ]
            )
        ).alias("s"),
    ).select("cell6", "n6", F.col("s.r").alias("r"), F.col("s.anc").alias("anc"))
    occ_all = ladder.groupBy("r", "anc").agg(F.sum("n6").alias("occ"))
    assign = ladder.join(occ_all, ["r", "anc"]).filter(
        (F.col("occ") <= _QT_CAP) | (F.col("r") == _QT_MAX)
    )
    pick = assign.groupBy("cell6").agg(
        F.min(F.struct("r", "anc", "occ")).alias("p")
    )
    return (
        pick.select(
            F.col("p.r").alias("res"),
            F.col("p.anc").alias("cell"),
            F.col("p.occ").alias("n_points"),
        )
        .distinct()
        .orderBy("res", "cell")
    )


def _quadtree_bins_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql, cell_parent_sql

    lat, lng = _latlng_sql("event_id")
    cell6 = cell_encode_sql(lat, lng, _QT_MAX)
    branches = " UNION ALL ".join(
        f"SELECT cell6, n6, {r} AS r, "
        f"{cell_parent_sql('cell6', _QT_MAX, r)} AS anc FROM p6"
        for r in range(_QT_MIN, _QT_MAX + 1)
    )
    return f"""
        WITH p6 AS (
            SELECT {cell6} AS cell6, COUNT(*) AS n6 FROM events GROUP BY 1),
        ladder AS ({branches}),
        occ_all AS (SELECT r, anc, CAST(SUM(n6) AS BIGINT) AS occ
                    FROM ladder GROUP BY 1, 2),
        assign AS (
            SELECT l.cell6, l.r, l.anc, o.occ
            FROM ladder l JOIN occ_all o ON l.r = o.r AND l.anc = o.anc
            WHERE o.occ <= {_QT_CAP} OR l.r = {_QT_MAX}),
        pick AS (
            SELECT cell6, r, anc, occ,
                   ROW_NUMBER() OVER (PARTITION BY cell6 ORDER BY r) AS rn
            FROM assign)
        SELECT DISTINCT r AS res, anc AS cell, occ AS n_points
        FROM pick WHERE rn = 1
        ORDER BY res, cell
    """


# ---------------------------------------------------------------------------
# join-count statistics + k-core peeling (session 6)
# ---------------------------------------------------------------------------


def q_join_counts(spark, sf_dir):
    """Cliff-Ord black/white join-count statistics over res-3 event
    occupancy: binarize cells at the global mean count, count queen-adjacent
    BB/BW/WW joins (each pair once), compare with nonfree-sampling
    expectations. One point shuffle; ring join over O(occupied cells); all
    counts exact integers (operators/spatial_stats.py:join_counts)."""
    from raptor_service_spark.operators.spatial_stats import join_counts

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(lat.alias("lat"), lng.alias("lng"))
    return join_counts(pts, res=3)


def _join_counts_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import join_counts_sql

    lat, lng = _latlng_sql("event_id")
    return join_counts_sql("events", lat, lng, res=3)


def q_cell_kcore(spark, sf_dir):
    """k-core (k=3) of the occupied res-5 document-cell lattice: iterative
    degree peeling to the dense skeleton, fixpoint within 8 rounds; the
    oracle unrolls the identical peel as a CTE chain (peeling is monotone,
    so early convergence agrees with the full unroll). Per round: one
    degree agg + two semi-joins over O(edges)
    (operators/cell_graph.py:kcore)."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import kcore

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ = d.select(cell_encode_col(lat, lng, _ISO_RES).alias("cell"))
    return kcore(occ, res=_ISO_RES, k=3, max_rounds=8)


def _cell_kcore_sql() -> str:
    from raptor_service_spark.operators.cell_graph import kcore_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _ISO_RES)
    return kcore_sql(
        f"SELECT {cell} AS cell FROM documents", res=_ISO_RES, k=3, max_rounds=8
    )


# ---------------------------------------------------------------------------
# PassJoin edit-distance fuzzy join + TF-IDF keyword extraction (session 6)
# ---------------------------------------------------------------------------


_TITLE_SPARK = "array_join(slice(split(trim(text), ' '), 1, 3), ' ')"
_TITLE_SQL = "array_to_string(list_slice(string_split(trim(text), ' '), 1, 3), ' ')"


def q_fuzzy_title_pairs(spark, sf_dir):
    """Exact edit-distance<=2 similarity join on document 'titles' (first 3
    words) via the PassJoin partition scheme — pigeonhole segments turn the
    fuzzy join into a bounded-fanout EQUI-join (15 probe / 75 index rows per
    string, constants in d), verified with JVM codegen levenshtein. The
    fuzzy-key analog of the reference's checksum dedup
    (repositories/chunk_repo.py upsert keys). Oracle is the brute-force
    levenshtein self-join, proving the partition scheme loses no pair."""
    from raptor_service_spark.operators.dedup import passjoin_pairs

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TITLE_SPARK).alias("title")
    )
    return passjoin_pairs(d, "doc_id", "title", max_dist=2).orderBy(
        "doc_a", "doc_b"
    )


def _fuzzy_title_pairs_sql() -> str:
    from raptor_service_spark.operators.dedup import passjoin_pairs_sql

    return passjoin_pairs_sql(
        f"SELECT doc_id AS id, {_TITLE_SQL} AS k FROM documents", max_dist=2
    )


def q_doc_tfidf_terms(spark, sf_dir):
    """TF-IDF keyword extraction: top-3 terms per document (docs 0-99) with
    corpus-wide document frequency. Scale shape: term explode feeds two
    partial+final aggs (tf per (doc, term); df per term over the FULL
    corpus); the tf⋈df equi-join shuffles on term (both sides aggregated —
    never raw token rows); N arrives as a broadcast scalar; per-doc top-3 is
    a WindowGroupLimit rank. Ranking uses the 6-dp ROUNDED score in BOTH
    engines so ties break identically (score DESC, term ASC)."""
    from pyspark.sql import Window
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(words_col(F.col("text"))).alias("term"))
    df_tbl = terms.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    tot = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs")))
    tf = (
        terms.filter(F.col("doc_id") < 100)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.join(df_tbl, "term")
        .crossJoin(tot)
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "score", "rk")
    )


def _doc_tfidf_terms_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH terms AS (
            SELECT doc_id, unnest({w}) AS term FROM documents),
        dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
        tot AS (SELECT COUNT(*) AS n_docs FROM documents),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM terms
            WHERE doc_id < 100 GROUP BY 1, 2),
        scored AS (
            SELECT t.doc_id, t.term, t.tf,
                   ROUND(t.tf * LN(CAST(n_docs AS DOUBLE) / df), 6) AS score
            FROM tf t JOIN dfreq USING (term) CROSS JOIN tot)
        SELECT doc_id, term, tf, score, rk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, term ASC) AS rk
            FROM scored)
        WHERE rk <= 3
    """


# ---------------------------------------------------------------------------
# geostatistics (semivariogram + model fit), IPF matrix balancing, and the
# distributed-sketch trio (KMV distinct, Bloom semi-join, count-min sketch)
# ---------------------------------------------------------------------------

_VG_SAMPLE_MOD, _VG_HMAX, _VG_BINW = 4, 6.0, 1.0


def _vg_points(spark, sf_dir):
    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "value")
        .filter(F.col("event_id") % _VG_SAMPLE_MOD == 0)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    return ev.withColumn("lat", lat).withColumn("lng", lng)


_VG_BIN_CACHE: dict = {}
_VG_PAIR_CACHE: dict = {}


def _vg_pairs(spark, sf_dir):
    """The ε-ring pair stream (dist, va, vb, dx, dy), derived and PERSISTED
    once per (application, sf_dir) — shared by the omnidirectional bins
    (`_vg_bins`) and the directional variogram (one ring join feeds both;
    the shingle-stream sharing pattern)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _VG_PAIR_CACHE:
        return _VG_PAIR_CACHE[key]
    from raptor_service_spark.operators.pip_join import within_distance_join

    pts = _vg_points(spark, sf_dir)
    pr = within_distance_join(pts, pts, eps=_VG_HMAX).filter(
        F.col("l.event_id") < F.col("r.event_id")
    )
    out = pr.select(
        "dist",
        F.col("l.value").alias("va"),
        F.col("r.value").alias("vb"),
        (F.col("r.lng") - F.col("l.lng")).alias("dx"),
        (F.col("r.lat") - F.col("l.lat")).alias("dy"),
    )
    _VG_PAIR_CACHE.clear()  # one live corpus at a time; bounded memory
    _VG_PAIR_CACHE[key] = out.persist()
    return _VG_PAIR_CACHE[key]


def _vg_bins(spark, sf_dir):
    """Shared per-bin (n_pairs, sum dist, sum sqdiff) stream for the
    semivariogram and its model fit: the ε-ring pair join (each pair found
    exactly once — no dedup shuffle) feeds ONE partial+final agg to
    <= hmax/binw rows. 9-dp post-sum rounding per repo convention.
    The aggregated bin table (≤ 6 rows) is persisted once per
    (application, sf_dir) — the shingle-stream sharing pattern — so the
    fit query reuses the pair join instead of re-deriving it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _VG_BIN_CACHE:
        return _VG_BIN_CACHE[key]
    pr = _vg_pairs(spark, sf_dir)
    dv = F.col("va") - F.col("vb")
    pairs = pr.select(
        F.floor(F.col("dist") / F.lit(_VG_BINW)).cast("long").alias("bin"),
        F.col("dist"),
        F.round(dv * dv, 9).alias("sq"),
    ).filter(F.col("bin") < F.lit(int(_VG_HMAX / _VG_BINW)))
    bins = pairs.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("dist"), 9).alias("sd"),
        F.round(F.sum("sq"), 9).alias("ss"),
    )
    _VG_BIN_CACHE.clear()  # one live corpus at a time; bounded memory
    _VG_BIN_CACHE[key] = bins.persist()
    return _VG_BIN_CACHE[key]


def q_semivariogram(spark, sf_dir):
    """Empirical semivariogram of the event value field — THE geostatistics
    primitive under kriging/interpolation QA: γ(h) = mean((v_i−v_j)²)/2 over
    point pairs binned by separation distance. Pairs come from the ε-ring
    cell join (3×3 neighbor explode at auto res, each pair exactly once);
    the variogram itself is one agg over <= 6 bins. Oracle: brute-force
    pair join with bit-identical distance/rounding arithmetic.

    Scale shape at 100 TB: the deterministic %-sample bounds the pair
    stream; candidates are ring-bounded (never all-pairs); output is
    O(n_bins). Reference analog: the retrieval-quality score histograms of
    services/retrieval_service.py recast as spatial structure functions."""
    b = _vg_bins(spark, sf_dir)
    return b.select(
        "bin",
        "n_pairs",
        F.round(F.col("sd") / F.col("n_pairs"), 6).alias("avg_h"),
        F.round(F.col("ss") / (F.lit(2.0) * F.col("n_pairs")), 6).alias("gamma"),
    )


def q_variogram_fit(spark, sf_dir):
    """Linear variogram-model fit γ(h) ≈ nugget + slope·h by OLS over the
    empirical bins (bin midpoints vs 6-dp γ values — both engines regress
    identical doubles; 9-dp pre-rounded sums per repo convention). The
    nugget/slope pair is the input to kriging weights and to
    sensor-noise-floor QA. Runs entirely on the O(n_bins) aggregated
    table."""
    b = _vg_bins(spark, sf_dir)
    xy = b.select(
        ((F.col("bin").cast("double") + F.lit(0.5)) * F.lit(_VG_BINW)).alias("x"),
        F.round(F.col("ss") / (F.lit(2.0) * F.col("n_pairs")), 6).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.round(F.sum("x"), 9).alias("sx"),
        F.round(F.sum("y"), 9).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("x")), 9).alias("sxx"),
        F.round(F.sum(F.col("x") * F.col("y")), 9).alias("sxy"),
    )
    det = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / det
    return s.select(
        F.col("k").cast("long").alias("n_bins"),
        F.when(F.col("k") > 1, F.round(slope, 6)).alias("slope"),
        F.when(
            F.col("k") > 1,
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 6),
        ).alias("nugget"),
    )


def _vg_pairs_sql() -> str:
    lat_a, lng_a = _latlng_sql("a.event_id")
    lat_b, lng_b = _latlng_sql("b.event_id")
    d = (
        f"ROUND(sqrt(({lat_a} - {lat_b}) * ({lat_a} - {lat_b}) + "
        f"({lng_a} - {lng_b}) * ({lng_a} - {lng_b})), 6)"
    )
    nb = int(_VG_HMAX / _VG_BINW)
    return f"""
        pts AS (SELECT event_id, value FROM events
                WHERE event_id % {_VG_SAMPLE_MOD} = 0),
        pr AS (
            SELECT CAST(FLOOR({d} / {_VG_BINW}) AS BIGINT) AS bin, {d} AS dist,
                   ROUND((a.value - b.value) * (a.value - b.value), 9) AS sq
            FROM pts a JOIN pts b ON a.event_id < b.event_id
            WHERE {d} <= {_VG_HMAX}),
        bins AS (
            SELECT bin, COUNT(*) AS n_pairs, ROUND(SUM(dist), 9) AS sd,
                   ROUND(SUM(sq), 9) AS ss
            FROM pr WHERE bin < {nb} GROUP BY 1)
    """


def _semivariogram_sql() -> str:
    return f"""
        WITH {_vg_pairs_sql()}
        SELECT bin, n_pairs, ROUND(sd / n_pairs, 6) AS avg_h,
               ROUND(ss / (2.0 * n_pairs), 6) AS gamma
        FROM bins
    """


def _variogram_fit_sql() -> str:
    return f"""
        WITH {_vg_pairs_sql()},
        xy AS (
            SELECT (CAST(bin AS DOUBLE) + 0.5) * {_VG_BINW} AS x,
                   ROUND(ss / (2.0 * n_pairs), 6) AS y
            FROM bins),
        s AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS k, ROUND(SUM(x), 9) AS sx,
                   ROUND(SUM(y), 9) AS sy, ROUND(SUM(x * x), 9) AS sxx,
                   ROUND(SUM(x * y), 9) AS sxy
            FROM xy)
        SELECT CAST(k AS BIGINT) AS n_bins,
               CASE WHEN k > 1 THEN
                 ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) END AS slope,
               CASE WHEN k > 1 THEN
                 ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
                       6) END AS nugget
        FROM s
    """


_IPF_RES, _IPF_ROUNDS = 3, 3


def q_od_ipf_balance(spark, sf_dir):
    """IPF / Furness balancing of the OD flow matrix — the transport-
    planning workhorse: the even-day transition matrix (seed) is scaled by
    alternating row/column passes to match the odd-day origin outflow and
    destination inflow margins (3 rounds, 9-dp per-scaling rounding so the
    unrolled DuckDB CTEs converge on identical doubles).

    Scale shape at 100 TB: the ONLY point-row cost is the user-partitioned
    lag window + one partial+final agg to the O(cells²) matrix; every IPF
    round is two aggs + two broadcast-sized joins on that aggregated
    table — the driver never collects anything."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        cell_encode_col(lat, lng, _IPF_RES).alias("cell"),
        day.alias("day"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = pts.withColumn("prev_cell", F.lag("cell").over(w)).filter(
        F.col("prev_cell").isNotNull()
    )
    seed = (
        tr.filter(F.col("day") % 2 == 0)
        .groupBy(F.col("prev_cell").alias("i"), F.col("cell").alias("j"))
        .agg(F.count(F.lit(1)).alias("t0"))
    )
    odd = tr.filter(F.col("day") % 2 == 1)
    rt = odd.groupBy(F.col("prev_cell").alias("i")).agg(
        F.count(F.lit(1)).alias("rt")
    )
    ct = odd.groupBy(F.col("cell").alias("j")).agg(F.count(F.lit(1)).alias("ct"))
    # localCheckpoint per round (the k-core/components lineage-cut pattern):
    # each round references m twice (m ⋈ agg(m)), so without the cut the
    # point-row transition window re-evaluates 2^(2·rounds) times — the
    # checkpointed matrix is O(cells²) rows, so the cut is free.
    m = (
        seed.join(rt, "i")
        .join(ct, "j")
        .select("i", "j", "t0", F.col("t0").cast("double").alias("t"), "rt", "ct")
        .localCheckpoint(eager=False)
    )
    for _ in range(_IPF_ROUNDS):
        rs = m.groupBy("i").agg(F.round(F.sum("t"), 9).alias("rs"))
        m = (
            m.join(rs, "i")
            .withColumn("t", F.round(F.col("t") * F.col("rt") / F.col("rs"), 9))
            .drop("rs")
        )
        cs = m.groupBy("j").agg(F.round(F.sum("t"), 9).alias("cs"))
        m = (
            m.join(cs, "j")
            .withColumn("t", F.round(F.col("t") * F.col("ct") / F.col("cs"), 9))
            .drop("cs")
            .localCheckpoint(eager=False)
        )
    # t is already the 9-dp per-round value; a further 6-dp display rounding
    # would RE-round a short decimal (ties at the 7th-9th dp are ~1e-3/row,
    # and Spark HALF_UP vs C-library rounding disagree on them) — so the
    # 9-dp value IS the output, per the knife-edge lesson in ADVICE.md.
    return m.select(
        F.col("i").alias("cell_from"),
        F.col("j").alias("cell_to"),
        "t0",
        F.col("t").alias("t_bal"),
    )


def _od_ipf_balance_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _IPF_RES)
    rounds = []
    prev = "m0"
    for r in range(_IPF_ROUNDS):
        rounds.append(
            f"""rs{r} AS (SELECT i, ROUND(SUM(t), 9) AS rs FROM {prev} GROUP BY 1),
        mr{r} AS (
            SELECT m.i, m.j, m.t0, ROUND(m.t * m.rt / rs.rs, 9) AS t, m.rt, m.ct
            FROM {prev} m JOIN rs{r} rs ON m.i = rs.i),
        cs{r} AS (SELECT j, ROUND(SUM(t), 9) AS cs FROM mr{r} GROUP BY 1),
        mc{r} AS (
            SELECT m.i, m.j, m.t0, ROUND(m.t * m.ct / cs.cs, 9) AS t, m.rt, m.ct
            FROM mr{r} m JOIN cs{r} cs ON m.j = cs.j)"""
        )
        prev = f"mc{r}"
    body = ",\n        ".join(rounds)
    return f"""
        WITH p AS (
            SELECT user_id, ts, event_id, {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day
            FROM events),
        tr AS (
            SELECT cell, day,
                   LAG(cell) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_cell
            FROM p),
        seed AS (
            SELECT prev_cell AS i, cell AS j, COUNT(*) AS t0
            FROM tr WHERE prev_cell IS NOT NULL AND day % 2 = 0 GROUP BY 1, 2),
        rt AS (
            SELECT prev_cell AS i, COUNT(*) AS rt
            FROM tr WHERE prev_cell IS NOT NULL AND day % 2 = 1 GROUP BY 1),
        ct AS (
            SELECT cell AS j, COUNT(*) AS ct
            FROM tr WHERE prev_cell IS NOT NULL AND day % 2 = 1 GROUP BY 1),
        m0 AS (
            SELECT s.i, s.j, s.t0, CAST(s.t0 AS DOUBLE) AS t, rt.rt, ct.ct
            FROM seed s JOIN rt ON s.i = rt.i JOIN ct ON s.j = ct.j),
        {body}
        SELECT i AS cell_from, j AS cell_to, t0, t AS t_bal
        FROM {prev}
    """


_KMV_K, _KMV_RES = 32, 2
_KMV_DENOM = float(1 << 48)


def q_kmv_distinct(spark, sf_dir):
    """KMV / bottom-k (theta-sketch family) distinct-count estimation of
    per-cell unique users: estimate = (k−1)/h_(k) where h_(k) is the k-th
    smallest md5-uniform hash — next to exact COUNT(DISTINCT) for error
    audit. THE mergeable distinct sketch a 100 TB engine ships between
    executors instead of raw value sets: per partition keep the k smallest
    hashes (O(k) state), merge = k-smallest of the union. Here the sketch
    is computed relationally (dedupe → per-cell rank window → k-th value,
    operators/sketches.py) so DuckDB reproduces it bit-exactly; cells with
    < k users fall back to the exact count (the sketch is exact until
    full). The streaming twin (`streaming/kmv.py`) maintains the identical
    sketch as bounded keyed state and converges to THIS output exactly."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.sketches import kmv_distinct_agg

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pairs = ev.select(cell_encode_col(lat, lng, _KMV_RES).alias("cell"), "user_id")
    return kmv_distinct_agg(pairs, k=_KMV_K)


def _kmv_distinct_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _KMV_RES)
    return f"""
        WITH cu AS (SELECT DISTINCT {cell} AS cell, user_id FROM events),
        hu AS (
            SELECT cell, user_id,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                     / {_KMV_DENOM} AS h
            FROM cu),
        r AS (
            SELECT cell, h,
                   ROW_NUMBER() OVER (PARTITION BY cell
                                      ORDER BY h, user_id) AS rk
            FROM hu),
        per AS (
            SELECT cell, COUNT(*) AS n_exact,
                   MAX(CASE WHEN rk = {_KMV_K} THEN h END) AS hk
            FROM r GROUP BY 1)
        SELECT cell, n_exact,
               CASE WHEN hk IS NOT NULL THEN ROUND({float(_KMV_K - 1)} / hk, 6)
                    ELSE CAST(n_exact AS DOUBLE) END AS n_kmv
        FROM per
    """


_BLOOM_M = 4096


def _bloom_pos(key):
    hx = F.md5(key.cast("string"))
    p1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % _BLOOM_M
    p2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % _BLOOM_M
    return p1, p2


def q_bloom_semi_join(spark, sf_dir):
    """Bloom-filtered semi-join with false-positive accounting: a 4096-bit
    k=2 Bloom filter built over BUILDING-segment customer keys pre-filters
    the orders probe BEFORE the exact membership join — the
    runtime-filter / DPP technique that turns a 100 TB shuffle join into a
    map-side scan prune (Spark's own spark.sql.optimizer.runtimeFilter,
    made explicit and measurable). Output per order status: probes, Bloom
    passes, true members, false positives, and the realized FP rate vs the
    (1−e^{-kn/m})^k design point. All bit positions are md5 arithmetic —
    bit-exact in both engines."""
    cust = _read(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    )
    p1, p2 = _bloom_pos(F.col("key"))
    bits = (
        build.select(p1.alias("pos"))
        .unionByName(build.select(p2.alias("pos")))
        .distinct()
    )
    orders = _read(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    q1, q2 = _bloom_pos(F.col("o_custkey"))
    probe = orders.withColumn("p1", q1).withColumn("p2", q2)
    b1 = bits.select(F.col("pos").alias("p1"), F.lit(1).alias("b1_hit"))
    b2 = bits.select(F.col("pos").alias("p2"), F.lit(1).alias("b2_hit"))
    truth = build.select(F.col("key").alias("o_custkey"), F.lit(1).alias("is_true"))
    flagged = (
        probe.join(F.broadcast(b1), "p1", "left")
        .join(F.broadcast(b2), "p2", "left")
        .join(F.broadcast(truth), "o_custkey", "left")
        .withColumn(
            "pass",
            (F.col("b1_hit").isNotNull() & F.col("b2_hit").isNotNull()).cast(
                "long"
            ),
        )
        .withColumn("hit", F.col("is_true").isNotNull().cast("long"))
    )
    agg = flagged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("pass").alias("n_pass"),
        F.sum("hit").alias("n_true"),
        F.sum(F.col("pass") * (F.lit(1) - F.col("hit"))).alias("n_false_pos"),
    )
    nonmember = F.col("n_probe") - F.col("n_true")
    return agg.select(
        "o_orderstatus",
        "n_probe",
        "n_pass",
        "n_true",
        "n_false_pos",
        F.when(
            nonmember > 0, F.round(F.col("n_false_pos") / nonmember, 6)
        ).alias("fp_rate"),
    )


def _bloom_semi_join_sql() -> str:
    def pos(expr: str, off: int) -> str:
        return (
            f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), {off}, 8))::BIGINT"
            f" % {_BLOOM_M})"
        )

    return f"""
        WITH build AS (
            SELECT c_custkey AS key FROM customer
            WHERE c_mktsegment = 'BUILDING'),
        bits AS (
            SELECT DISTINCT pos FROM (
                SELECT {pos('key', 1)} AS pos FROM build
                UNION ALL SELECT {pos('key', 9)} AS pos FROM build)),
        f AS (
            SELECT o_orderstatus,
                   CASE WHEN {pos('o_custkey', 1)} IN (SELECT pos FROM bits)
                         AND {pos('o_custkey', 9)} IN (SELECT pos FROM bits)
                        THEN 1 ELSE 0 END AS pass,
                   CASE WHEN o_custkey IN (SELECT key FROM build)
                        THEN 1 ELSE 0 END AS hit
            FROM orders)
        SELECT o_orderstatus, COUNT(*) AS n_probe,
               CAST(SUM(pass) AS BIGINT) AS n_pass,
               CAST(SUM(hit) AS BIGINT) AS n_true,
               CAST(SUM(pass * (1 - hit)) AS BIGINT) AS n_false_pos,
               CASE WHEN COUNT(*) - SUM(hit) > 0 THEN
                 ROUND(CAST(SUM(pass * (1 - hit)) AS DOUBLE)
                       / (COUNT(*) - SUM(hit)), 6) END AS fp_rate
        FROM f GROUP BY 1
    """


_CMS_W, _CMS_D, _CMS_TOP = 512, 3, 20


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch frequency estimation audited against exact counts:
    a d=3 × w=512 CMS over the corpus term stream, then the exact top-20
    terms are point-queried (estimate = min over the d counters) and the
    guaranteed-one-sided overcount is reported per term. THE bounded-memory
    frequency sketch for 100 TB streams: counters are mergeable partial
    aggs (O(d·w) state per partition), never a per-term hash table. All
    integer md5 arithmetic — exact parity."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(words_col(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def bucket(r: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.col("term"), F.lit(f"#{r}"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    sk = counts.select(F.lit(0).alias("r"), bucket(0).alias("bucket"), "n")
    for r in range(1, _CMS_D):
        sk = sk.unionByName(
            counts.select(F.lit(r).alias("r"), bucket(r).alias("bucket"), "n")
        )
    counters = sk.groupBy("r", "bucket").agg(F.sum("n").cast("long").alias("c"))
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    top = counts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _CMS_TOP
    )
    est = top.select(
        "term", "n", F.col("rk").cast("long").alias("rk"),
        *[bucket(r).alias(f"b{r}") for r in range(_CMS_D)],
    )
    for r in range(_CMS_D):
        cr = counters.filter(F.col("r") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("c").alias(f"c{r}")
        )
        est = est.join(F.broadcast(cr), f"b{r}")
    mn = F.least(*[F.col(f"c{r}") for r in range(_CMS_D)])
    return est.select(
        "term",
        F.col("n").alias("n_exact"),
        mn.alias("n_cms"),
        (mn - F.col("n")).alias("overcount"),
        "rk",
    )


def _cms_heavy_hitters_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    b = (
        f"(('0x' || substr(md5(t.term || '#' || c.r), 1, 8))::BIGINT % {_CMS_W})"
    )
    return f"""
        WITH terms AS (SELECT unnest({w}) AS term FROM documents),
        counts AS (
            SELECT term, COUNT(*) AS n FROM terms WHERE term != '' GROUP BY 1),
        sk AS (
            SELECT rr.r,
                   ('0x' || substr(md5(term || '#' || rr.r), 1, 8))::BIGINT
                     % {_CMS_W} AS bucket,
                   n
            FROM counts CROSS JOIN (VALUES (0), (1), (2)) rr(r)),
        counters AS (
            SELECT r, bucket, CAST(SUM(n) AS BIGINT) AS c
            FROM sk GROUP BY 1, 2),
        top AS (
            SELECT term, n, rk FROM (
                SELECT term, n,
                       ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) AS rk
                FROM counts)
            WHERE rk <= {_CMS_TOP})
        SELECT t.term, t.n AS n_exact, MIN(c.c) AS n_cms,
               MIN(c.c) - t.n AS overcount, t.rk
        FROM top t JOIN counters c ON c.bucket = {b}
        GROUP BY t.term, t.n, t.rk
    """


# ---------------------------------------------------------------------------
# histogram quantile sketch, matryoshka retrieval audit, BPE apply,
# KMV set operations
# ---------------------------------------------------------------------------

_HQ_BINS = 128
_HQ_QS = (0.5, 0.95, 0.99)


def q_histogram_quantiles(spark, sf_dir):
    """Histogram-sketch quantile estimation audited against exact order
    statistics: per event type, P50/P95/P99 of the value column from a
    128-bin equi-width histogram (the mergeable O(bins) state a 100 TB
    engine keeps per partition — Spark's approxQuantile idea, made
    deterministic) next to the exact type-1 quantile (value at rank
    ⌈q·n⌉), with the signed sketch error per row. The exact path costs a
    per-group sort ONCE here for audit; at scale only the histogram runs.
    All bin arithmetic is shared-double identical in both engines."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_type", "event_id", "value")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    qdf = spark.createDataFrame([(q,) for q in _HQ_QS], "q double")
    tq = st.crossJoin(F.broadcast(qdf)).withColumn(
        "k", F.ceil(F.col("q") * F.col("n")).cast("long")
    )
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("value", "event_id")
        ),
    )
    exact = tq.join(
        ranked.select("event_type", F.col("rn").alias("k"), "value"),
        ["event_type", "k"],
    ).select("event_type", "q", "k", F.col("value").alias("exact"), "mn", "mx")
    width = F.col("mx") - F.col("mn")
    evb = ev.join(F.broadcast(st), "event_type").withColumn(
        "bin",
        F.when(
            width > 0,
            F.least(
                F.lit(_HQ_BINS - 1),
                F.floor((F.col("value") - F.col("mn")) / width * _HQ_BINS),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    cum = (
        evb.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cumn",
            F.sum("c").over(
                Window.partitionBy("event_type")
                .orderBy("bin")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    binq = (
        exact.join(cum.select("event_type", "bin", "cumn"), "event_type")
        .filter(F.col("cumn") >= F.col("k"))
        .groupBy("event_type", "q", "k", "exact", "mn", "mx")
        .agg(F.min("bin").alias("binq"))
    )
    est = F.round(
        F.col("mn")
        + (F.col("binq") + 1) * (F.col("mx") - F.col("mn")) / F.lit(float(_HQ_BINS)),
        6,
    )
    return binq.select(
        "event_type",
        "q",
        "k",
        "exact",
        est.alias("est"),
        F.round(est - F.col("exact"), 6).alias("err"),
    )


def _histogram_quantiles_sql() -> str:
    qs = ", ".join(f"({q})" for q in _HQ_QS)
    return f"""
        WITH ev AS (SELECT event_type, event_id, value FROM events),
        st AS (
            SELECT event_type, COUNT(*) AS n, MIN(value) AS mn, MAX(value) AS mx
            FROM ev GROUP BY 1),
        tq AS (
            SELECT st.*, CAST(qq.q AS DOUBLE) AS q,
                   CAST(CEIL(CAST(qq.q AS DOUBLE) * st.n) AS BIGINT) AS k
            FROM st CROSS JOIN (VALUES {qs}) qq(q)),
        ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn
            FROM ev),
        exact AS (
            SELECT t.event_type, t.q, t.k, r.value AS exact, t.mn, t.mx
            FROM tq t JOIN ranked r
              ON r.event_type = t.event_type AND r.rn = t.k),
        evb AS (
            SELECT e.event_type,
                   CASE WHEN s.mx > s.mn THEN LEAST({_HQ_BINS - 1},
                        CAST(FLOOR((e.value - s.mn) / (s.mx - s.mn)
                             * {_HQ_BINS}) AS BIGINT))
                        ELSE 0 END AS bin
            FROM ev e JOIN st s ON e.event_type = s.event_type),
        cum AS (
            SELECT event_type, bin,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                                ROWS UNBOUNDED PRECEDING) AS cumn
            FROM (SELECT event_type, bin, COUNT(*) AS c
                  FROM evb GROUP BY 1, 2)),
        binq AS (
            SELECT x.event_type, x.q, x.k, x.exact, x.mn, x.mx,
                   MIN(c.bin) AS binq
            FROM exact x JOIN cum c ON c.event_type = x.event_type
            WHERE c.cumn >= x.k
            GROUP BY 1, 2, 3, 4, 5, 6)
        SELECT event_type, q, k, exact,
               ROUND(mn + (binq + 1) * (mx - mn) / {float(_HQ_BINS)}, 6) AS est,
               ROUND(ROUND(mn + (binq + 1) * (mx - mn) / {float(_HQ_BINS)}, 6)
                     - exact, 6) AS err
        FROM binq
    """


_MAT_DIM = 16


def q_matryoshka_recall(spark, sf_dir):
    """Matryoshka / truncated-dimension retrieval audit: top-10 by cosine
    over the FIRST 16 dims vs top-10 over the full 64 — the
    coarse-to-fine trick (truncated prefix scan, full-dim rerank of
    survivors) that cuts ANN scan IO 4×. Output is the full-outer join of
    the two top-10 rank lists; recall@10 is the row overlap. Both scans
    are one codegen pass each, TakeOrderedAndProject finals."""
    from pyspark.sql import Window

    e = _read(spark, sf_dir, "embeddings")
    full = (
        e.withColumn("d", F.round(cosine_dist_col(F.col("embedding"), QVEC), 6))
        .withColumn(
            "rank_full",
            F.row_number().over(Window.orderBy("d", "vec_id")).cast("long"),
        )
        .filter(F.col("rank_full") <= 10)
        .select("vec_id", "rank_full")
    )
    from raptor_service_spark.functions.vector import cosine_dist_col as _cd

    trunc = (
        e.withColumn(
            "d",
            F.round(
                _cd(F.slice(F.col("embedding"), 1, _MAT_DIM), QVEC[:_MAT_DIM]), 6
            ),
        )
        .withColumn(
            "rank_trunc",
            F.row_number().over(Window.orderBy("d", "vec_id")).cast("long"),
        )
        .filter(F.col("rank_trunc") <= 10)
        .select("vec_id", "rank_trunc")
    )
    return full.join(trunc, "vec_id", "full_outer").select(
        "vec_id", "rank_full", "rank_trunc"
    )


def _matryoshka_recall_sql() -> str:
    qtrunc = "[" + ", ".join(f"{x:.6f}" for x in QVEC[:_MAT_DIM]) + "]"
    return f"""
        WITH full10 AS (
            SELECT vec_id, rank_full FROM (
                SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
                    ROUND(1.0 - list_cosine_similarity(
                        list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        {QVEC_SQL}), 6), vec_id) AS rank_full
                FROM embeddings)
            WHERE rank_full <= 10),
        trunc10 AS (
            SELECT vec_id, rank_trunc FROM (
                SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
                    ROUND(1.0 - list_cosine_similarity(
                        list_transform(embedding[1:{_MAT_DIM}],
                                       x -> CAST(x AS DOUBLE)),
                        {qtrunc}), 6), vec_id) AS rank_trunc
                FROM embeddings)
            WHERE rank_trunc <= 10)
        SELECT COALESCE(f.vec_id, t.vec_id) AS vec_id, f.rank_full, t.rank_trunc
        FROM full10 f FULL OUTER JOIN trunc10 t ON f.vec_id = t.vec_id
    """


# fixed merge vocabulary over the synthetic corpus's character stream
_BPE_APPLY_MERGES = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("r", "o"), ("ro", "w"),
    ("j", "o"), ("jo", "i"), ("joi", "n"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
]


def q_bpe_encode(spark, sf_dir):
    """BPE tokenizer APPLICATION (the encode side of bpe_merges): each word
    is spaced into characters and a fixed 16-merge vocabulary is applied in
    rank order as literal ' a b ' → ' ab ' replacements (two passes per
    merge — the second pass catches the boundary-space consumed by
    non-overlapping left-to-right replacement; exact for runs ≤ 4, and
    bit-identical in both engines since literal replace semantics agree).
    Output: top-20 subword tokens by corpus frequency — the vocabulary-hit
    profile a tokenizer rollout is audited by. The whole encode is a chain
    of 32 codegen string ops; no Python, no shuffle before the count."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    word = F.explode(words_col(F.col("text"))).alias("word")
    ws = d.select(word).filter(F.col("word") != "")
    spaced = F.concat(
        F.lit(" "), F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")), F.lit(" ")
    )
    for a, b in _BPE_APPLY_MERGES:
        for _ in range(2):
            spaced = F.replace(spaced, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    toks = ws.select(F.explode(F.split(F.trim(spaced), " ")).alias("tok")).filter(
        F.length("tok") > 1  # the vocabulary-HIT profile: merged subwords only
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .select("tok", "n", "rk")
    )


def _bpe_encode_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    expr = "' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' '"
    for a, b in _BPE_APPLY_MERGES:
        for _ in range(2):
            expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return f"""
        WITH ws AS (
            SELECT unnest({w}) AS word FROM documents),
        toks AS (
            SELECT unnest(string_split(trim({expr}), ' ')) AS tok
            FROM ws WHERE word != '')
        SELECT tok, n, rk FROM (
            SELECT tok, COUNT(*) AS n,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rk
            FROM toks WHERE LENGTH(tok) > 1 GROUP BY tok)
        WHERE rk <= 20
    """


def q_kmv_set_ops(spark, sf_dir):
    """Theta-sketch-style SET OPERATIONS on KMV sketches: per res-2 cell,
    estimate |A ∪ B| and |A ∩ B| for A = users seen on even days, B = odd
    days — union = the k smallest hashes of A ∪ B (exactly the merge of
    the two per-set sketches, which is WHY KMV scales: executors ship O(k)
    states, never user sets), intersection via the theta Jaccard (fraction
    of the union sketch present in both sets). Exact counts ride alongside
    for the error audit; below-k cells are exact by construction."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    pres = (
        ev.select(
            cell_encode_col(lat, lng, _KMV_RES).alias("cell"),
            "user_id",
            (day % 2).alias("par"),
        )
        .groupBy("cell", "user_id")
        .agg(
            F.max((F.col("par") == 0).cast("int")).alias("in_a"),
            F.max((F.col("par") == 1).cast("int")).alias("in_b"),
        )
    )
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        / F.lit(_KMV_DENOM)
    )
    ranked = pres.withColumn("h", h).withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("cell").orderBy("h", "user_id")),
    )
    per = ranked.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_union"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_inter"),
        F.max(F.when(F.col("rk") == _KMV_K, F.col("h"))).alias("hk"),
        F.sum(
            F.when(
                (F.col("rk") <= _KMV_K) & (F.col("in_a") == 1) & (F.col("in_b") == 1),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("both_in_theta"),
        F.least(F.count(F.lit(1)), F.lit(_KMV_K).cast("long")).alias("kk"),
    )
    union_est = F.when(
        F.col("hk").isNotNull(), F.round(F.lit(float(_KMV_K - 1)) / F.col("hk"), 6)
    ).otherwise(F.col("n_union").cast("double"))
    inter_est = F.round(
        F.col("both_in_theta") / F.col("kk") * union_est, 6
    )
    return per.select(
        "cell",
        "n_union",
        union_est.alias("union_est"),
        "n_inter",
        inter_est.alias("inter_est"),
    )


def _kmv_set_ops_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _KMV_RES)
    return f"""
        WITH pres AS (
            SELECT {cell} AS cell, user_id,
                   MAX(CASE WHEN CAST(FLOOR(epoch_us(ts) / 86400000000)
                                 AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS in_a,
                   MAX(CASE WHEN CAST(FLOOR(epoch_us(ts) / 86400000000)
                                 AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END) AS in_b
            FROM events GROUP BY 1, 2),
        ranked AS (
            SELECT cell, user_id, in_a, in_b,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                     / {_KMV_DENOM} AS h,
                   ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1,
                        12))::BIGINT / {_KMV_DENOM}, user_id) AS rk
            FROM pres),
        per AS (
            SELECT cell, COUNT(*) AS n_union,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter,
                   MAX(CASE WHEN rk = {_KMV_K} THEN h END) AS hk,
                   SUM(CASE WHEN rk <= {_KMV_K} AND in_a = 1 AND in_b = 1
                            THEN 1 ELSE 0 END) AS both_in_theta,
                   LEAST(COUNT(*), {_KMV_K}) AS kk
            FROM ranked GROUP BY 1)
        SELECT cell, n_union,
               CASE WHEN hk IS NOT NULL THEN ROUND({float(_KMV_K - 1)} / hk, 6)
                    ELSE CAST(n_union AS DOUBLE) END AS union_est,
               n_inter,
               ROUND(both_in_theta / kk
                     * CASE WHEN hk IS NOT NULL
                            THEN ROUND({float(_KMV_K - 1)} / hk, 6)
                            ELSE CAST(n_union AS DOUBLE) END, 6) AS inter_est
        FROM per
    """


# ---------------------------------------------------------------------------
# binary-quantized retrieval audit, drift statistics (PSI + two-sample KS),
# Fellegi-Sunter record-linkage scoring, seasonal occupancy profile
# ---------------------------------------------------------------------------


def _sign_code_halves(q: np.ndarray) -> tuple[int, int]:
    c0 = sum(1 << i for i in range(32) if q[i] > 0)
    c1 = sum(1 << i for i in range(32) if q[32 + i] > 0)
    return c0, c1


def q_binary_quant_recall(spark, sf_dir):
    """Binary (sign-bit) quantization retrieval audit — the 64×-compression
    end of the quantization ladder (f32 → int8 → PQ → 1 bit): each 64-dim
    embedding collapses to a 64-bit sign code, candidates rank by Hamming
    distance (two bit_count(xor) ops), and the top-10 is joined full-outer
    against the exact cosine top-10. At 100 TB the code column is 64 B →
    8 B per vector, and Hamming scan is pure codegen integer ops — this
    query MEASURES what that buys/costs in recall. Codes are built by ONE
    posexplode + conditional-sum agg (bit-exact in both engines)."""
    from pyspark.sql import Window

    e = _read(spark, sf_dir, "embeddings")
    q0, q1 = _sign_code_halves(QVEC)
    pe = e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), pos % 32)")
    codes = pe.groupBy("vec_id").agg(
        F.sum(F.when((F.col("v") > 0) & (F.col("pos") < 32), bit).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when((F.col("v") > 0) & (F.col("pos") >= 32), bit).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    ham = (
        F.bit_count(F.expr(f"c0 ^ CAST({q0} AS BIGINT)"))
        + F.bit_count(F.expr(f"c1 ^ CAST({q1} AS BIGINT)"))
    ).cast("long")
    binr = (
        codes.withColumn("hd", ham)
        .withColumn(
            "rank_bin",
            F.row_number().over(Window.orderBy("hd", "vec_id")).cast("long"),
        )
        .filter(F.col("rank_bin") <= 10)
        .select("vec_id", "hd", "rank_bin")
    )
    full = (
        e.withColumn("d", F.round(cosine_dist_col(F.col("embedding"), QVEC), 6))
        .withColumn(
            "rank_full",
            F.row_number().over(Window.orderBy("d", "vec_id")).cast("long"),
        )
        .filter(F.col("rank_full") <= 10)
        .select("vec_id", "rank_full")
    )
    return full.join(binr, "vec_id", "full_outer").select(
        "vec_id", "rank_full", "rank_bin", "hd"
    )


def _binary_quant_recall_sql() -> str:
    q0, q1 = _sign_code_halves(QVEC)
    return f"""
        WITH pe AS (
            SELECT vec_id, g.generate_series AS pos,
                   embedding[g.generate_series + 1] AS v
            FROM embeddings, generate_series(0, 63) g),
        codes AS (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN v > 0 AND pos < 32
                            THEN (CAST(1 AS BIGINT) << (pos % 32))
                            ELSE 0 END) AS BIGINT) AS c0,
                   CAST(SUM(CASE WHEN v > 0 AND pos >= 32
                            THEN (CAST(1 AS BIGINT) << (pos % 32))
                            ELSE 0 END) AS BIGINT) AS c1
            FROM pe GROUP BY 1),
        binr AS (
            SELECT vec_id, hd, rank_bin FROM (
                SELECT vec_id,
                       bit_count(xor(c0, CAST({q0} AS BIGINT)))
                       + bit_count(xor(c1, CAST({q1} AS BIGINT))) AS hd,
                       ROW_NUMBER() OVER (ORDER BY
                           bit_count(xor(c0, CAST({q0} AS BIGINT)))
                           + bit_count(xor(c1, CAST({q1} AS BIGINT))),
                           vec_id) AS rank_bin
                FROM codes)
            WHERE rank_bin <= 10),
        full10 AS (
            SELECT vec_id, rank_full FROM (
                SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
                    ROUND(1.0 - list_cosine_similarity(
                        list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        {QVEC_SQL}), 6), vec_id) AS rank_full
                FROM embeddings)
            WHERE rank_full <= 10)
        SELECT COALESCE(f.vec_id, b.vec_id) AS vec_id, f.rank_full,
               b.rank_bin, CAST(b.hd AS BIGINT) AS hd
        FROM full10 f FULL OUTER JOIN binr b ON f.vec_id = b.vec_id
    """


_PSI_BINS = 10


def q_psi_drift(spark, sf_dir):
    """Population Stability Index — THE data-drift screen between two
    slices of a feature distribution (here: even-day vs odd-day event
    values per event type): 10 equal-width buckets over the slice-union
    range, Laplace-smoothed shares, PSI contribution (p−q)·ln(p/q) per
    bucket. At 100 TB both slices reduce to O(types × bins) partial-agg
    state in ONE pass — the monitoring job a training pipeline runs per
    ingestion batch (PSI > 0.2 = investigate)."""
    ev = _read(spark, sf_dir, "events").select("event_type", "ts", "value")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    ev = ev.withColumn("par", (day % 2).cast("int"))
    st = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    b = ev.join(F.broadcast(st), "event_type").withColumn(
        "bucket",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(_PSI_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * _PSI_BINS
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    cnt = b.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).alias("nb"),
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    j = cnt.join(F.broadcast(tot), "event_type")
    p = (F.col("na") + 1).cast("double") / (F.col("ta") + _PSI_BINS)
    q = (F.col("nb") + 1).cast("double") / (F.col("tb") + _PSI_BINS)
    return j.select(
        "event_type",
        "bucket",
        F.col("na").cast("long").alias("n_base"),
        F.col("nb").cast("long").alias("n_cur"),
        F.round((p - q) * F.log(p / q), 6).alias("psi"),
    )


def _psi_drift_sql() -> str:
    return f"""
        WITH ev AS (
            SELECT event_type, value,
                   CAST(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) % 2
                        AS INT) AS par
            FROM events),
        st AS (SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
               FROM ev GROUP BY 1),
        b AS (
            SELECT e.event_type, e.par,
                   CASE WHEN s.mx > s.mn THEN LEAST({_PSI_BINS - 1},
                        CAST(FLOOR((e.value - s.mn) / (s.mx - s.mn)
                             * {_PSI_BINS}) AS BIGINT))
                        ELSE 0 END AS bucket
            FROM ev e JOIN st s ON e.event_type = s.event_type),
        cnt AS (
            SELECT event_type, bucket,
                   SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS na,
                   SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS nb
            FROM b GROUP BY 1, 2),
        tot AS (SELECT event_type, SUM(na) AS ta, SUM(nb) AS tb
                FROM cnt GROUP BY 1)
        SELECT c.event_type, c.bucket,
               CAST(c.na AS BIGINT) AS n_base, CAST(c.nb AS BIGINT) AS n_cur,
               ROUND((CAST(c.na + 1 AS DOUBLE) / (t.ta + {_PSI_BINS})
                      - CAST(c.nb + 1 AS DOUBLE) / (t.tb + {_PSI_BINS}))
                     * LN((CAST(c.na + 1 AS DOUBLE) / (t.ta + {_PSI_BINS}))
                          / (CAST(c.nb + 1 AS DOUBLE) / (t.tb + {_PSI_BINS}))),
                     6) AS psi
        FROM cnt c JOIN tot t ON c.event_type = t.event_type
    """


def q_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the even-day and
    odd-day value distributions, per event type — the nonparametric drift
    test next to PSI: D = max |F_a(x) − F_b(x)| over the pooled support,
    computed as ONE cumulative window over the per-value count table
    (never a sample×sample join). Exact-rational ECDFs in identical
    doubles; reject flag at the α=0.05 asymptotic critical value."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_type", "ts", "value")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    cnt = (
        ev.withColumn("par", (day % 2).cast("int"))
        .groupBy("event_type", "value")
        .agg(
            F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cnt.withColumn("cuma", F.sum("ca").over(w)).withColumn(
        "cumb", F.sum("cb").over(w)
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    d = (
        cum.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "na",
            "nb",
            F.abs(
                F.col("cuma").cast("double") / F.col("na")
                - F.col("cumb").cast("double") / F.col("nb")
            ).alias("diff"),
        )
        .groupBy("event_type", "na", "nb")
        .agg(F.round(F.max("diff"), 6).alias("d_stat"))
    )
    crit = F.round(
        F.lit(1.358)
        * F.sqrt(
            (F.col("na") + F.col("nb")).cast("double") / (F.col("na") * F.col("nb"))
        ),
        6,
    )
    return d.select(
        "event_type",
        "na",
        "nb",
        "d_stat",
        crit.alias("crit_05"),
        (F.col("d_stat") > crit).cast("int").alias("reject"),
    )


def _ks_two_sample_sql() -> str:
    return """
        WITH ev AS (
            SELECT event_type, value,
                   CAST(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) % 2
                        AS INT) AS par
            FROM events),
        cnt AS (
            SELECT event_type, value,
                   SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS cb
            FROM ev GROUP BY 1, 2),
        cum AS (
            SELECT event_type, value,
                   SUM(ca) OVER (PARTITION BY event_type ORDER BY value
                                 ROWS UNBOUNDED PRECEDING) AS cuma,
                   SUM(cb) OVER (PARTITION BY event_type ORDER BY value
                                 ROWS UNBOUNDED PRECEDING) AS cumb
            FROM cnt),
        tot AS (
            SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb
            FROM cnt GROUP BY 1),
        d AS (
            SELECT c.event_type, t.na, t.nb,
                   ROUND(MAX(ABS(CAST(c.cuma AS DOUBLE) / t.na
                                 - CAST(c.cumb AS DOUBLE) / t.nb)), 6) AS d_stat
            FROM cum c JOIN tot t ON c.event_type = t.event_type
            GROUP BY 1, 2, 3)
        SELECT event_type, na, nb, d_stat,
               ROUND(1.358 * SQRT(CAST(na + nb AS DOUBLE) / (na * nb)), 6)
                 AS crit_05,
               CAST(d_stat > ROUND(1.358 * SQRT(CAST(na + nb AS DOUBLE)
                                                / (na * nb)), 6) AS INT)
                 AS reject
        FROM d
    """


# Fellegi-Sunter log2(m/u) agreement weights (literal design constants)
_FS_W_SRC, _FS_W_LEN, _FS_W_JAC = 2.169925, 1.736966, 4.087463
_FS_THRESHOLD = 4.0


def q_fellegi_sunter(spark, sf_dir):
    """Fellegi-Sunter record-linkage scoring over blocked candidates: the
    probabilistic-ER decision model on top of the blocking the dedup suite
    already provides. Blocking key = first 32 chars (exact-prefix block,
    the duplicated corpus's natural key); per pair, three field
    agreements — source equality, length-within-20, word-set Jaccard
    ≥ 0.5 — each contributing its literal log2(m/u) weight; pairs above
    the match threshold emit with their agreement pattern. Candidates are
    ONE block equi-join (never doc×doc); the agreement tests are codegen
    set/string ops."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    dd = d.unionByName(
        d.select(
            (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
            "text",
            # perturb the twin's metadata so agreements are non-trivial
            F.when(F.col("doc_id") % 3 == 0, F.lit("srcX")).otherwise(
                F.col("source")
            ).alias("source"),
            (F.col("n_chars") + F.when(F.col("doc_id") % 5 == 0, 50).otherwise(0)
             ).alias("n_chars"),
        )
    )
    from raptor_service_spark.operators.dedup import words_col

    blocked = dd.select(
        "doc_id",
        "source",
        "n_chars",
        F.substring("text", 1, 32).alias("blk"),
        F.array_distinct(words_col(F.col("text"))).alias("ws"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    uni = F.size(F.array_union(F.col("a.ws"), F.col("b.ws")))
    agree_src = (F.col("a.source") == F.col("b.source")).cast("int")
    agree_len = (
        F.abs(F.col("a.n_chars") - F.col("b.n_chars")) < 20
    ).cast("int")
    agree_jac = (inter.cast("double") / uni >= 0.5).cast("int")
    score = F.round(
        agree_src * F.lit(_FS_W_SRC)
        + agree_len * F.lit(_FS_W_LEN)
        + agree_jac * F.lit(_FS_W_JAC),
        6,
    )
    return (
        pairs.select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            agree_src.alias("agree_src"),
            agree_len.alias("agree_len"),
            agree_jac.alias("agree_jac"),
            score.alias("score"),
        )
        .filter(F.col("score") >= _FS_THRESHOLD)
    )


def _fellegi_sunter_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH dd AS (
            SELECT doc_id, text, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text,
                   CASE WHEN doc_id % 3 = 0 THEN 'srcX' ELSE source END AS source,
                   n_chars + CASE WHEN doc_id % 5 = 0 THEN 50 ELSE 0 END
                     AS n_chars
            FROM documents),
        blocked AS (
            SELECT doc_id, source, n_chars, substr(text, 1, 32) AS blk,
                   list_distinct({w}) AS ws
            FROM dd),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS agree_src,
                   CASE WHEN ABS(a.n_chars - b.n_chars) < 20 THEN 1 ELSE 0 END
                     AS agree_len,
                   CASE WHEN CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
                             / len(list_distinct(list_concat(a.ws, b.ws)))
                             >= 0.5 THEN 1 ELSE 0 END AS agree_jac
            FROM blocked a JOIN blocked b
              ON a.blk = b.blk AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, agree_src, agree_len, agree_jac,
               ROUND(agree_src * CAST({_FS_W_SRC} AS DOUBLE)
                     + agree_len * CAST({_FS_W_LEN} AS DOUBLE)
                     + agree_jac * CAST({_FS_W_JAC} AS DOUBLE), 6) AS score
        FROM pairs
        WHERE ROUND(agree_src * CAST({_FS_W_SRC} AS DOUBLE)
                    + agree_len * CAST({_FS_W_LEN} AS DOUBLE)
                    + agree_jac * CAST({_FS_W_JAC} AS DOUBLE), 6)
              >= {_FS_THRESHOLD}
    """


_SEAS_RES, _SEAS_MIN = 2, 48


def q_cell_seasonal(spark, sf_dir):
    """Hour-of-day seasonal occupancy profile per res-2 cell: seasonal
    index = hod count / (cell mean per hour) — the diurnal fingerprint
    that separates residential/commercial tiles and feeds anomaly
    baselines. ONE (cell, hod) partial+final agg over the points; the
    index divides by the per-cell total on the aggregated table (window,
    no second scan). Exact integer counts; 6-dp index."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    hod = F.hour(F.col("ts").cast("timestamp")).cast("long")
    cnt = (
        ev.select(
            cell_encode_col(lat, lng, _SEAS_RES).alias("cell"), hod.alias("hod")
        )
        .groupBy("cell", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cell")
    tot = F.sum("n").over(w)
    return (
        cnt.withColumn("cell_total", tot.cast("long"))
        .filter(F.col("cell_total") >= _SEAS_MIN)
        .select(
            "cell",
            "hod",
            "n",
            "cell_total",
            F.round(
                F.col("n").cast("double")
                / (F.col("cell_total").cast("double") / 24.0),
                6,
            ).alias("seasonal_idx"),
        )
    )


def _cell_seasonal_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _SEAS_RES)
    return f"""
        WITH cnt AS (
            SELECT {cell} AS cell,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2),
        t AS (
            SELECT cell, hod, n,
                   CAST(SUM(n) OVER (PARTITION BY cell) AS BIGINT) AS cell_total
            FROM cnt)
        SELECT cell, hod, n, cell_total,
               ROUND(CAST(n AS DOUBLE) / (CAST(cell_total AS DOUBLE) / 24.0), 6)
                 AS seasonal_idx
        FROM t WHERE cell_total >= {_SEAS_MIN}
    """


# ---------------------------------------------------------------------------
# radiation OD model, A/B proportion test, BH-FDR hotspots, EWMA anomalies
# ---------------------------------------------------------------------------

_RAD_RES, _RAD_TOPC, _RAD_TOPK = 3, 24, 50


def q_radiation_model(spark, sf_dir):
    """Radiation model of spatial interaction (Simini et al. 2012) — the
    parameter-free alternative to the gravity model the repo already
    calibrates: predicted flow T_ij = m_i·(m_i·m_j) / ((m_i+s_ij)(m_i+m_j+s_ij))
    where s_ij = total mass strictly closer to i than j is (excluding both
    endpoints). Masses are res-3 cell occupancies; the intervening-
    opportunity sum s_ij is a triple join that runs ENTIRELY on the
    aggregated top-24-cell table (24³ ≈ 14k rows) — the points shuffle
    once into the masses. Distances compare SQUARED center offsets (exact
    float multiply/add — no rounding hazard in the strict < predicate)."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    cells = (
        ev.select(cell_encode_col(lat, lng, _RAD_RES).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    top = (
        cells.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("m").desc(), F.col("cell"))),
        )
        .filter(F.col("rk") <= _RAD_TOPC)
        .drop("rk")
    )
    from raptor_service_spark.geo.grid import RES_MULTIPLIER

    n = 2**_RAD_RES
    rem = F.col("cell") - F.lit(_RAD_RES * RES_MULTIPLIER)
    cy = F.floor(rem / n).cast("long")
    cx = rem - cy * n
    ctr = top.withColumn(
        "clat", -90.0 + (cy + 0.5) * 180.0 / n
    ).withColumn("clng", -180.0 + (cx + 0.5) * 360.0 / n)
    a, b, c = ctr.alias("a"), ctr.alias("b"), ctr.alias("c")

    def d2(p, q):
        dla = F.col(f"{p}.clat") - F.col(f"{q}.clat")
        dln = F.col(f"{p}.clng") - F.col(f"{q}.clng")
        return dla * dla + dln * dln

    pairs = a.join(b, F.col("a.cell") != F.col("b.cell"))
    sij = (
        pairs.join(
            c,
            (F.col("c.cell") != F.col("a.cell"))
            & (F.col("c.cell") != F.col("b.cell"))
            & (d2("a", "c") < d2("a", "b")),
            "left",
        )
        .groupBy(
            F.col("a.cell").alias("cell_from"),
            F.col("b.cell").alias("cell_to"),
            F.col("a.m").alias("mi"),
            F.col("b.m").alias("mj"),
        )
        .agg(F.coalesce(F.sum("c.m"), F.lit(0)).cast("long").alias("s_ij"))
    )
    t = (
        F.col("mi").cast("double")
        * (F.col("mi") * F.col("mj")).cast("double")
        / (
            (F.col("mi") + F.col("s_ij")).cast("double")
            * (F.col("mi") + F.col("mj") + F.col("s_ij")).cast("double")
        )
    )
    from pyspark.sql import Window as W2

    out = sij.select(
        "cell_from", "cell_to", "mi", "mj", "s_ij", F.round(t, 6).alias("t_rad")
    )
    w = W2.orderBy(F.col("t_rad").desc(), "cell_from", "cell_to")
    return (
        out.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _RAD_TOPK)
    )


def _radiation_model_sql() -> str:
    from raptor_service_spark.geo.grid import cell_center_sql, cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _RAD_RES)
    clat, clng = cell_center_sql("cell", _RAD_RES)
    return f"""
        WITH cells AS (
            SELECT {cell} AS cell, COUNT(*) AS m FROM events GROUP BY 1),
        top AS (
            SELECT cell, m FROM (
                SELECT cell, m,
                       ROW_NUMBER() OVER (ORDER BY m DESC, cell) AS rk
                FROM cells)
            WHERE rk <= {_RAD_TOPC}),
        ctr AS (
            SELECT cell, m, {clat} AS clat, {clng} AS clng FROM top),
        sij AS (
            SELECT a.cell AS cell_from, b.cell AS cell_to,
                   a.m AS mi, b.m AS mj,
                   CAST(COALESCE(SUM(c.m), 0) AS BIGINT) AS s_ij
            FROM ctr a JOIN ctr b ON a.cell != b.cell
            LEFT JOIN ctr c
              ON c.cell != a.cell AND c.cell != b.cell
             AND (a.clat - c.clat) * (a.clat - c.clat)
                 + (a.clng - c.clng) * (a.clng - c.clng)
               < (a.clat - b.clat) * (a.clat - b.clat)
                 + (a.clng - b.clng) * (a.clng - b.clng)
            GROUP BY 1, 2, 3, 4),
        scored AS (
            SELECT cell_from, cell_to, mi, mj, s_ij,
                   ROUND(CAST(mi AS DOUBLE) * CAST(mi * mj AS DOUBLE)
                         / (CAST(mi + s_ij AS DOUBLE)
                            * CAST(mi + mj + s_ij AS DOUBLE)), 6) AS t_rad
            FROM sij)
        SELECT cell_from, cell_to, mi, mj, s_ij, t_rad, rk FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY t_rad DESC, cell_from,
                                         cell_to) AS rk
            FROM scored)
        WHERE rk <= {_RAD_TOPK}
    """


_AB_VALUE_CUT = 100.0


def q_ab_proportions(spark, sf_dir):
    """Two-proportion z-test per event type — the experimentation-analytics
    primitive: even-day traffic is the control arm, odd-day the treatment,
    success = value > 100; z = (p̂_a−p̂_b)/√(p̂(1−p̂)(1/n_a+1/n_b)) with the
    pooled rate. ONE partial+final agg over the events; 9-dp pre-rounded
    shares so both engines divide identical doubles; |z| > 1.96 flag."""
    ev = _read(spark, sf_dir, "events").select("event_type", "ts", "value")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    ok = (F.col("value") > _AB_VALUE_CUT).cast("long")
    agg = (
        ev.withColumn("par", (day % 2).cast("int"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).cast("long").alias("na"),
            F.sum(F.when(F.col("par") == 0, ok).otherwise(0)).cast("long").alias("xa"),
            F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).cast("long").alias("nb"),
            F.sum(F.when(F.col("par") == 1, ok).otherwise(0)).cast("long").alias("xb"),
        )
    )
    pa = F.col("xa").cast("double") / F.col("na")
    pb = F.col("xb").cast("double") / F.col("nb")
    pp = (F.col("xa") + F.col("xb")).cast("double") / (F.col("na") + F.col("nb"))
    se = F.sqrt(pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    z = F.round((pa - pb) / se, 6)
    return agg.select(
        "event_type",
        "na",
        "xa",
        "nb",
        "xb",
        F.round(pa, 6).alias("p_ctl"),
        F.round(pb, 6).alias("p_trt"),
        z.alias("z"),
        (F.abs(z) > 1.96).cast("int").alias("significant"),
    )


def _ab_proportions_sql() -> str:
    return f"""
        WITH ev AS (
            SELECT event_type, value,
                   CAST(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) % 2
                        AS INT) AS par
            FROM events),
        agg AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                   CAST(SUM(CASE WHEN par = 0 AND value > {_AB_VALUE_CUT}
                            THEN 1 ELSE 0 END) AS BIGINT) AS xa,
                   CAST(SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                   CAST(SUM(CASE WHEN par = 1 AND value > {_AB_VALUE_CUT}
                            THEN 1 ELSE 0 END) AS BIGINT) AS xb
            FROM ev GROUP BY 1)
        SELECT event_type, na, xa, nb, xb,
               ROUND(CAST(xa AS DOUBLE) / na, 6) AS p_ctl,
               ROUND(CAST(xb AS DOUBLE) / nb, 6) AS p_trt,
               ROUND((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                     / SQRT((CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1.0 / na + 1.0 / nb)), 6) AS z,
               CAST(ABS(ROUND((CAST(xa AS DOUBLE) / na
                               - CAST(xb AS DOUBLE) / nb)
                     / SQRT((CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1.0 / na + 1.0 / nb)), 6)) > 1.96 AS INT)
                 AS significant
        FROM agg
    """


_FDR_ALPHA = 0.05

# Abramowitz-Stegun 26.2.17 normal upper-tail: ONE shared arithmetic string
# evaluated as a Spark expression AND inside the DuckDB oracle (the repo's
# shared-expression parity trick; `z` must be a non-negative expression).
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)


def _phi_upper_sql(zexpr: str) -> str:
    t = f"(1.0 / (1.0 + 0.2316419 * {zexpr}))"
    poly = (
        f"({_AS_B[0]} * {t} + {_AS_B[1]} * POWER({t}, 2) + {_AS_B[2]} * POWER({t}, 3)"
        f" + {_AS_B[3]} * POWER({t}, 4) + {_AS_B[4]} * POWER({t}, 5))"
    )
    return f"(EXP(-({zexpr}) * ({zexpr}) / 2.0) / 2.5066282746310002 * {poly})"


def q_fdr_hotspots(spark, sf_dir):
    """Benjamini-Hochberg FDR correction over the Getis-Ord hot-spot field
    — the multiple-testing discipline a production hot-spot monitor needs
    (hundreds of cells tested simultaneously; per-cell α=0.05 would flag
    ~5% of a CSR field). Per occupied cell: two-sided p from |gi_z| via
    the shared A&S 26.2.17 polynomial (identical arithmetic string in
    both engines), BH step-up at α=0.05 via ONE rank window + max-rank
    threshold. Everything after the z-field runs on O(occupied cells)."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.spatial_stats import getis_gi_star

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    z = getis_gi_star(
        d.withColumn("lat", lat).withColumn("lng", lng), res=4, top_k=None
    ).select("cell", "gi_z")
    p = F.least(
        F.round(2.0 * F.expr(_phi_upper_sql("ABS(gi_z)")), 6), F.lit(1.0)
    )
    scored = z.withColumn("p", p)
    w = Window.orderBy("p", "cell")
    ranked = scored.withColumn("rk", F.row_number().over(w).cast("long")).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy())
    )
    flagged = ranked.withColumn(
        "bh_ok",
        (F.col("p") <= F.col("rk") * _FDR_ALPHA / F.col("m")).cast("int"),
    )
    kmax = flagged.agg(
        F.coalesce(F.max(F.when(F.col("bh_ok") == 1, F.col("rk"))), F.lit(0))
        .cast("long")
        .alias("kmax")
    )
    return (
        flagged.crossJoin(F.broadcast(kmax))
        .select(
            "cell",
            "gi_z",
            "p",
            "rk",
            (F.col("rk") <= F.col("kmax")).cast("int").alias("rejected"),
        )
    )


def _fdr_hotspots_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import getis_gi_sql

    lat, lng = _latlng_sql("doc_id")
    zsql = getis_gi_sql("documents", lat, lng, res=4, top_k=None)
    pu = _phi_upper_sql("ABS(gi_z)")
    return f"""
        WITH zfield AS ({zsql}),
        scored AS (
            SELECT cell, gi_z,
                   LEAST(ROUND(2.0 * {pu}, 6), 1.0) AS p
            FROM zfield),
        ranked AS (
            SELECT cell, gi_z, p,
                   ROW_NUMBER() OVER (ORDER BY p, cell) AS rk,
                   COUNT(*) OVER () AS m
            FROM scored),
        kmax AS (
            SELECT COALESCE(MAX(CASE WHEN p <= rk * {_FDR_ALPHA} / m
                                     THEN rk END), 0) AS kmax
            FROM ranked)
        SELECT r.cell, r.gi_z, r.p, r.rk,
               CAST(r.rk <= k.kmax AS INT) AS rejected
        FROM ranked r CROSS JOIN kmax k
    """


_EWMA_RES, _EWMA_ALPHA, _EWMA_LB, _EWMA_TOPK = 2, 0.3, 24, 20


def q_ewma_anomaly(spark, sf_dir):
    """EWMA baseline anomaly screen per res-2 cell: hourly counts, baseline
    = normalized Σ α(1−α)^(k−1)·x_(t−k) over the last 24 hours (closed-form
    — the recurrence unrolled as 24 codegen lag terms over ONE cell-keyed
    window; weights renormalize over the lags actually present), flag the
    top-20 hours by count/baseline ratio. The online-monitoring twin of
    trending_cells/cusum_cells with the textbook exponential baseline."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    hr = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3_600_000_000)
    ).cast("long")
    cnt = (
        ev.select(cell_encode_col(lat, lng, _EWMA_RES).alias("cell"), hr.alias("hr"))
        .groupBy("cell", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cell").orderBy("hr")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(1, _EWMA_LB + 1):
        wk = _EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** (k - 1)
        lagk = F.lag("n", k).over(w)
        gap_ok = (F.col("hr") - F.lag("hr", k).over(w)) == k  # contiguous hours only
        num = num + F.when(lagk.isNotNull() & gap_ok, F.lit(wk) * lagk).otherwise(0.0)
        den = den + F.when(lagk.isNotNull() & gap_ok, F.lit(wk)).otherwise(0.0)
    scored = cnt.withColumn(
        "baseline", F.when(den > 0, F.round(num / den, 6))
    ).withColumn(
        "ratio",
        F.when(
            F.col("baseline") >= 1.0,
            F.round(F.col("n") / F.col("baseline"), 6),
        ),
    )
    top = Window.orderBy(F.col("ratio").desc(), "cell", "hr")
    return (
        scored.filter(F.col("ratio").isNotNull())
        .withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _EWMA_TOPK)
        .select("cell", "hr", "n", "baseline", "ratio", "rk")
    )


def _ewma_anomaly_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _EWMA_RES)
    num_terms, den_terms = [], []
    for k in range(1, _EWMA_LB + 1):
        wk = _EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** (k - 1)
        lagn = f"LAG(n, {k}) OVER (PARTITION BY cell ORDER BY hr)"
        laghr = f"LAG(hr, {k}) OVER (PARTITION BY cell ORDER BY hr)"
        cond = f"{lagn} IS NOT NULL AND hr - {laghr} = {k}"
        num_terms.append(f"CASE WHEN {cond} THEN {wk!r} * {lagn} ELSE 0.0 END")
        den_terms.append(f"CASE WHEN {cond} THEN {wk!r} ELSE 0.0 END")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
        WITH cnt AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2),
        ew AS (
            SELECT cell, hr, n, ({num}) AS num, ({den}) AS den FROM cnt),
        scored AS (
            SELECT cell, hr, n,
                   CASE WHEN den > 0 THEN ROUND(num / den, 6) END AS baseline
            FROM ew),
        rated AS (
            SELECT cell, hr, n, baseline,
                   CASE WHEN baseline >= 1.0
                        THEN ROUND(n / baseline, 6) END AS ratio
            FROM scored)
        SELECT cell, hr, n, baseline, ratio, rk FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY ratio DESC, cell, hr) AS rk
            FROM rated WHERE ratio IS NOT NULL)
        WHERE rk <= {_EWMA_TOPK}
    """


# ---------------------------------------------------------------------------
# pseudo-relevance feedback, commute-flow inference, Chaikin smoothing
# ---------------------------------------------------------------------------

_PRF_FB_DOCS, _PRF_FB_TERMS, _PRF_TOPK = 5, 3, 10


def q_prf_expansion(spark, sf_dir):
    """Pseudo-relevance-feedback retrieval (Rocchio/RM3-lite) — the classic
    two-pass IR loop completing the repo's retrieval stack (BM25 → hybrid
    RRF → rerank → MMR → PRF): BM25 first pass, top-5 feedback docs, top-3
    expansion terms by tf·idf from those docs (original terms and short
    tokens excluded), then a SECOND BM25 pass over the expanded term set.
    FULLY relational — the expansion terms stay a DataFrame (no driver
    round-trip); the postings index builds ONCE (localCheckpoint, the
    persisted-index stand-in) and feeds both passes, term stats, and the
    expansion scorer. Output: final top-10 (doc_id, score)."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import B, K1, doc_postings

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    post = doc_postings(docs).localCheckpoint(eager=False)
    dlen = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dlen.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avg_dl"))
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avg_dl")
    )
    contrib = idf * F.col("tf") * F.lit(K1 + 1.0) / denom

    def bm25_pass(terms_df):
        hit = post.join(F.broadcast(terms_df), "term")
        return (
            hit.join(F.broadcast(dfreq), "term")
            .join(dlen, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.round(F.sum(contrib), 6).alias("score"))
        )

    q0 = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    first = bm25_pass(q0)
    fb = (
        first.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("score").desc(), "doc_id")),
        )
        .filter(F.col("rk") <= _PRF_FB_DOCS)
        .select("doc_id")
    )
    exp_scored = (
        post.join(F.broadcast(fb), "doc_id")
        .groupBy("term")
        .agg(F.sum("tf").alias("fb_tf"))
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .filter(~F.col("term").isin(list(_BM25_TERMS)) & (F.length("term") >= 3))
        .select("term", F.round(F.col("fb_tf") * idf, 6).alias("escore"))
    )
    exp = (
        exp_scored.withColumn(
            "erk",
            F.row_number().over(Window.orderBy(F.col("escore").desc(), "term")),
        )
        .filter(F.col("erk") <= _PRF_FB_TERMS)
        .select("term")
    )
    second = bm25_pass(q0.unionByName(exp).distinct())
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        second.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _PRF_TOPK)
        .select("doc_id", "score", "rk")
    )


def _prf_expansion_sql() -> str:
    from raptor_service_spark.operators.bm25 import B, K1, TOKEN_PATTERN

    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    idf = "ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))"
    score_from = f"""
        FROM post p
        JOIN dfreq f USING (term)
        JOIN dlen l USING (doc_id)
        CROSS JOIN stats s"""
    contrib = (
        f"{idf} * p.tf * {K1 + 1.0} "
        f"/ (p.tf + {K1} * ({1.0 - B} + {B} * l.dl / s.avg_dl))"
    )
    return f"""
        WITH post AS (
            SELECT doc_id, t.term, COUNT(*) AS tf
            FROM documents,
                 unnest(regexp_extract_all(lower(text),
                        '{TOKEN_PATTERN}', 0)) AS t(term)
            GROUP BY 1, 2),
        dlen AS (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avg_dl FROM dlen),
        dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
        first AS (
            SELECT p.doc_id, ROUND(SUM({contrib}), 6) AS score
            {score_from}
            WHERE p.term IN ({terms})
            GROUP BY 1),
        fb AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
                FROM first)
            WHERE rk <= {_PRF_FB_DOCS}),
        exp AS (
            SELECT term FROM (
                SELECT e.term,
                       ROW_NUMBER() OVER (ORDER BY e.escore DESC, e.term) AS erk
                FROM (
                    SELECT p.term,
                           ROUND(SUM(p.tf) * {idf}, 6) AS escore
                    FROM post p
                    JOIN fb USING (doc_id)
                    JOIN dfreq f USING (term)
                    CROSS JOIN stats s
                    WHERE p.term NOT IN ({terms}) AND LENGTH(p.term) >= 3
                    GROUP BY p.term, f.df, s.n_docs) e)
            WHERE erk <= {_PRF_FB_TERMS}),
        qexp AS (
            SELECT DISTINCT term FROM (
                SELECT unnest(ARRAY[{terms}]) AS term
                UNION ALL SELECT term FROM exp)),
        second AS (
            SELECT p.doc_id, ROUND(SUM({contrib}), 6) AS score
            {score_from}
            JOIN qexp q ON p.term = q.term
            GROUP BY 1)
        SELECT doc_id, score, rk FROM (
            SELECT doc_id, score,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
            FROM second)
        WHERE rk <= {_PRF_TOPK}
    """


_COMMUTE_RES = 2


def q_commute_flows(spark, sf_dir):
    """Home→work commute-flow inference — the trip-chaining rollup on top
    of the mobility block: per user, home = modal res-3 cell over night
    hours (hod < 6 ∨ ≥ 20), work = modal cell over office hours
    (9 ≤ hod < 17), flows aggregated over users with distinct home/work.
    ONE point agg into (user, cell, daypart) counts; both argmaxes are
    windows on that aggregated table."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    hod = F.hour(F.col("ts").cast("timestamp"))
    part = F.when((hod < 6) | (hod >= 20), F.lit("home")).when(
        (hod >= 9) & (hod < 17), F.lit("work")
    )
    cnt = (
        ev.select(
            "user_id",
            cell_encode_col(lat, lng, _COMMUTE_RES).alias("cell"),
            part.alias("part"),
        )
        .filter(F.col("part").isNotNull())
        .groupBy("user_id", "part", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id", "part").orderBy(
        F.col("n").desc(), F.col("cell").asc()
    )
    modal = cnt.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    home = modal.filter(F.col("part") == "home").select(
        "user_id", F.col("cell").alias("home_cell")
    )
    work = modal.filter(F.col("part") == "work").select(
        "user_id", F.col("cell").alias("work_cell")
    )
    return (
        home.join(work, "user_id")
        .filter(F.col("home_cell") != F.col("work_cell"))
        .groupBy("home_cell", "work_cell")
        .agg(F.count(F.lit(1)).alias("n_commuters"))
        .filter(F.col("n_commuters") >= 2)
    )


def _commute_flows_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _COMMUTE_RES)
    return f"""
        WITH ev AS (
            SELECT user_id, {cell} AS cell,
                   CASE WHEN EXTRACT(hour FROM ts) < 6
                          OR EXTRACT(hour FROM ts) >= 20 THEN 'home'
                        WHEN EXTRACT(hour FROM ts) >= 9
                         AND EXTRACT(hour FROM ts) < 17 THEN 'work' END AS part
            FROM events),
        cnt AS (
            SELECT user_id, part, cell, COUNT(*) AS n
            FROM ev WHERE part IS NOT NULL GROUP BY 1, 2, 3),
        modal AS (
            SELECT user_id, part, cell FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, part
                           ORDER BY n DESC, cell ASC) AS rk
                FROM cnt)
            WHERE rk = 1),
        home AS (SELECT user_id, cell AS home_cell FROM modal
                 WHERE part = 'home'),
        work AS (SELECT user_id, cell AS work_cell FROM modal
                 WHERE part = 'work')
        SELECT h.home_cell, w.work_cell, COUNT(*) AS n_commuters
        FROM home h JOIN work w USING (user_id)
        WHERE h.home_cell != w.work_cell
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """


_CHAIKIN_USERS = 8


def q_chaikin_smooth(spark, sf_dir):
    """Chaikin corner-cutting smoothing of user trajectories (the
    cartographic smoothing dual of the VW simplifier already shipped):
    each consecutive fix pair (P, N) yields Q = ¾P+¼N and R = ¼P+¾N,
    ordered 2i/2i+1 — ONE user-keyed lead window + a 2-element inline
    explode, pure codegen arithmetic (6-dp outputs)."""
    from pyspark.sql import Window

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _CHAIKIN_USERS)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select("user_id", "ts", "event_id", lat.alias("lat"), lng.alias("lng"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = pts.withColumn("i", F.row_number().over(w).cast("long")).withColumn(
        "nlat", F.lead("lat").over(w)
    ).withColumn("nlng", F.lead("lng").over(w)).filter(F.col("nlat").isNotNull())
    qpt = F.struct(
        (F.col("i") * 2).alias("seq"),
        F.round(0.75 * F.col("lat") + 0.25 * F.col("nlat"), 6).alias("slat"),
        F.round(0.75 * F.col("lng") + 0.25 * F.col("nlng"), 6).alias("slng"),
    )
    rpt = F.struct(
        (F.col("i") * 2 + 1).alias("seq"),
        F.round(0.25 * F.col("lat") + 0.75 * F.col("nlat"), 6).alias("slat"),
        F.round(0.25 * F.col("lng") + 0.75 * F.col("nlng"), 6).alias("slng"),
    )
    return seq.select(
        "user_id", F.explode(F.array(qpt, rpt)).alias("p")
    ).select(
        "user_id",
        F.col("p.seq").alias("seq"),
        F.col("p.slat").alias("slat"),
        F.col("p.slng").alias("slng"),
    )


def _chaikin_smooth_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH pts AS (
            SELECT user_id, ts, event_id, {lat} AS lat, {lng} AS lng
            FROM events WHERE user_id < {_CHAIKIN_USERS}),
        seq AS (
            SELECT user_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS i,
                   lat, lng,
                   LEAD(lat) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS nlat,
                   LEAD(lng) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS nlng
            FROM pts),
        pairs AS (SELECT * FROM seq WHERE nlat IS NOT NULL)
        SELECT user_id, i * 2 AS seq,
               ROUND(0.75 * lat + 0.25 * nlat, 6) AS slat,
               ROUND(0.75 * lng + 0.25 * nlng, 6) AS slng
        FROM pairs
        UNION ALL
        SELECT user_id, i * 2 + 1 AS seq,
               ROUND(0.25 * lat + 0.75 * nlat, 6) AS slat,
               ROUND(0.25 * lng + 0.75 * nlng, 6) AS slng
        FROM pairs
    """


# ---------------------------------------------------------------------------
# perceptual-hash (aHash) image near-dup over decoded rasters
# ---------------------------------------------------------------------------


def q_media_ahash_dedup(spark, sf_dir):
    """Multimodal near-duplicate detection from DECODED PIXELS: every media
    span's raster runs through the real RTv1 encode→decode codec, aHash =
    (pixel > image mean) 64-bit signature (two 32-bit words), and a
    perturbed thumbnail twin per image is the planted near-dup; pairs come
    from the 4×16-bit Hamming-LSH band join (pigeonhole-EXACT at ham ≤ 3 —
    the simhash guarantee structure, applied to images). The oracle
    recomputes the pixels INDEPENDENTLY via the hex-chained md5 arithmetic
    (raster_for_ref_hex) and replicates the banding in SQL — so decode,
    hash, and the LSH cover are all value-checked. Reference analog: the
    media payload rip-out of markdown_extractor.py:11-100, upgraded to a
    dedup stage."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.tiles import (
        ahash_neardup_pairs,
        media_ahash,
    )

    docs = gen_documents_df(spark, 40, seed=67)
    return ahash_neardup_pairs(media_ahash(explode_spans(docs)), max_ham=3)


def _media_ahash_dedup_sql(n_docs: int = 40, seed: int = 67) -> str:
    from raptor_service_spark.datagen import _gen_doc

    refs = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        for s in d["spans"]:
            if s["media_ref"]:
                refs.append(f"('{s['media_ref']}')")
    links = "md5(media_ref)"
    link_cols = []
    for k in range(4):
        link_cols.append(f"{links} AS l{k}")
        links = f"md5({links})"
    pixel = (
        "('0x' || substr(CASE i // 16 WHEN 0 THEN l0 WHEN 1 THEN l1 "
        "WHEN 2 THEN l2 ELSE l3 END, 2 * (i % 16) + 1, 2))::BIGINT // 16 * 17"
    )
    return f"""
        WITH refs(media_ref) AS (VALUES {', '.join(refs)}),
        imgs AS (
            SELECT media_ref || '#' || tt.t AS img, media_ref, tt.t
            FROM refs CROSS JOIN (VALUES (0), (1)) tt(t)),
        links AS (
            SELECT img, t, {', '.join(link_cols)} FROM imgs),
        lists AS (
            SELECT img, t,
                   list_transform(range(0, 64), i -> struct_pack(
                       i := i, p := {pixel})) AS ps
            FROM links),
        px AS (
            SELECT img,
                   u.i AS i,
                   CASE WHEN u.i = 0 AND t = 1 THEN LEAST(u.p + 17, 255)
                        ELSE u.p END AS p
            FROM (SELECT img, t, unnest(ps) AS u FROM lists)),
        stats AS (SELECT img, AVG(CAST(p AS DOUBLE)) AS mean
                  FROM px GROUP BY 1),
        bits AS (
            SELECT px.img,
                   CAST(SUM(CASE WHEN px.i < 32 AND px.p > s.mean
                            THEN (CAST(1 AS BIGINT) << CAST(px.i % 32 AS INT))
                            ELSE 0 END) AS BIGINT) AS w0,
                   CAST(SUM(CASE WHEN px.i >= 32 AND px.p > s.mean
                            THEN (CAST(1 AS BIGINT) << CAST(px.i % 32 AS INT))
                            ELSE 0 END) AS BIGINT) AS w1
            FROM px JOIN stats s ON px.img = s.img GROUP BY 1),
        banded AS (
            SELECT img, w0, w1, bb.b,
                   CASE bb.b WHEN 0 THEN w0 % 65536 WHEN 1 THEN w0 // 65536
                             WHEN 2 THEN w1 % 65536 ELSE w1 // 65536 END AS v
            FROM bits CROSS JOIN (VALUES (0), (1), (2), (3)) bb(b))
        SELECT DISTINCT a.img AS img_a, b.img AS img_b,
               CAST(bit_count(xor(a.w0, b.w0))
                    + bit_count(xor(a.w1, b.w1)) AS BIGINT) AS hamming
        FROM banded a JOIN banded b
          ON a.b = b.b AND a.v = b.v AND a.img < b.img
        WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3
    """


# ---------------------------------------------------------------------------
# rank-biased overlap, Kaplan-Meier survival, difference-in-differences
# ---------------------------------------------------------------------------

_RBO_P, _RBO_DEPTH = 0.9, 20


def q_rbo_rankings(spark, sf_dir):
    """Rank-biased overlap (Webber et al. 2010) between the keyword (BM25)
    and vector (cosine) top-20 rankings — the rank-similarity metric that
    quantifies how much the two retrieval legs agree before fusing them
    (the diagnostic hybrid_retrieval should be driven by). Truncated RBO:
    Σ_{d=1..D} p^{d-1} · |A_d ∩ B_d| / d, computed relationally: both
    rankings → depth join → per-depth overlap via two cumulative windows →
    weighted sum (9-dp pre-round). Everything after the two top-k scans is
    O(depth) rows."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import bm25_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    kw = bm25_topk(docs, list(_BM25_TERMS), _RBO_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("rka"),
    )
    e = _read(spark, sf_dir, "embeddings")
    vec = (
        e.withColumn("d", F.round(cosine_dist_col(F.col("embedding"), QVEC), 6))
        .withColumn("rkb", F.row_number().over(Window.orderBy("d", "vec_id")))
        .filter(F.col("rkb") <= _RBO_DEPTH)
        .select(F.col("vec_id").alias("doc_id"), "rkb")
    )
    both = kw.join(vec, "doc_id")  # docs in BOTH rankings with their ranks
    depths = spark.range(1, _RBO_DEPTH + 1).select(F.col("id").alias("d"))
    overlap = (
        depths.join(
            both,
            (F.col("rka") <= F.col("d")) & (F.col("rkb") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(F.count(F.col("doc_id")).alias("x_d"))
    )
    wterm = F.round(
        F.pow(F.lit(_RBO_P), F.col("d") - 1) * F.col("x_d") / F.col("d"), 9
    )
    return overlap.agg(
        F.count(F.lit(1)).alias("depth"),
        F.max(F.when(F.col("d") == _RBO_DEPTH, F.col("x_d")))
        .cast("long")
        .alias("overlap_at_k"),
        F.round(F.round(F.sum(wterm), 9) * (1.0 - _RBO_P), 6).alias("rbo"),
    )


def _rbo_rankings_sql() -> str:
    from raptor_service_spark.operators.bm25 import bm25_sql

    kw = bm25_sql("documents", list(_BM25_TERMS), _RBO_DEPTH)
    return f"""
        WITH kw AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rka
            FROM ({kw})),
        vec AS (
            SELECT doc_id, rkb FROM (
                SELECT vec_id AS doc_id,
                       ROW_NUMBER() OVER (ORDER BY
                           ROUND(1.0 - list_cosine_similarity(
                               list_transform(embedding, x -> CAST(x AS DOUBLE)),
                               {QVEC_SQL}), 6), vec_id) AS rkb
                FROM embeddings)
            WHERE rkb <= {_RBO_DEPTH}),
        both_r AS (SELECT kw.doc_id, kw.rka, vec.rkb
                   FROM kw JOIN vec USING (doc_id)),
        overlap AS (
            SELECT d.d, COUNT(b.doc_id) AS x_d
            FROM range(1, {_RBO_DEPTH + 1}) d(d)
            LEFT JOIN both_r b ON b.rka <= d.d AND b.rkb <= d.d
            GROUP BY 1)
        SELECT COUNT(*) AS depth,
               CAST(MAX(CASE WHEN d = {_RBO_DEPTH} THEN x_d END) AS BIGINT)
                 AS overlap_at_k,
               ROUND(ROUND(SUM(ROUND(POWER({_RBO_P}, d - 1) * x_d / d, 9)), 9)
                     * (1.0 - {_RBO_P}), 6) AS rbo
        FROM overlap
    """


def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve of per-user inter-event gaps (time until
    the next ping, hours) — survival analysis joins the analytics surface:
    each user's LAST gap to the observation end is right-CENSORED; the
    product-limit estimator S(t) = Π_{t_i ≤ t}(1 − d_i/n_i) runs as one
    ordered window (risk set = n − cum(events+censored before t), survival
    via exp∘cumsum∘ln with 9-dp pre-rounds). Output: the 25 largest event
    times with S(t). Point rows shuffle ONCE into per-gap rows."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    endt = _read(spark, sf_dir, "events").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("endu")
    )
    gaps = (
        ev.select(
            ts_us.alias("t0"),
            F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("t1"),
        )
        .crossJoin(F.broadcast(endt))
        .select(
            F.when(
                F.col("t1").isNotNull(),
                F.round((F.col("t1") - F.col("t0")) / F.lit(3_600_000_000.0), 6),
            )
            .otherwise(
                F.round((F.col("endu") - F.col("t0")) / F.lit(3_600_000_000.0), 6)
            )
            .alias("t"),
            F.col("t1").isNotNull().cast("int").alias("event"),
        )
    )
    per_t = gaps.groupBy("t").agg(
        F.sum("event").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("obs"),
    )
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    km = (
        per_t.withColumn(
            "n_risk",
            (
                F.sum("obs").over(Window.partitionBy())
                - F.coalesce(F.sum("obs").over(wt), F.lit(0))
            ).cast("long"),
        )
        .filter(F.col("d") > 0)
        .withColumn(
            "lnterm",
            # d == n_risk is the terminal time (everyone at risk dies):
            # S hits exactly 0 there — ln(0) guarded, s overridden below
            F.when(
                F.col("d") < F.col("n_risk"),
                F.round(
                    F.log(1.0 - F.col("d") / F.col("n_risk").cast("double")), 9
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "s",
            F.when(F.col("d") == F.col("n_risk"), F.lit(0.0)).otherwise(
                F.round(
                    F.exp(
                        F.round(
                            F.sum("lnterm").over(
                                Window.orderBy("t").rowsBetween(
                                    Window.unboundedPreceding, 0
                                )
                            ),
                            9,
                        )
                    ),
                    6,
                )
            ),
        )
    )
    wtop = Window.orderBy(F.col("t").desc())
    return (
        km.withColumn("rk", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rk") <= 25)
        .select("t", "d", "n_risk", "s", "rk")
    )


def _kaplan_meier_sql() -> str:
    return """
        WITH ev AS (
            SELECT user_id, event_id, epoch_us(ts) AS u FROM events),
        endt AS (SELECT MAX(u) AS endu FROM ev),
        gaps AS (
            SELECT CASE WHEN t1 IS NOT NULL
                        THEN ROUND((t1 - t0) / 3600000000.0, 6)
                        ELSE ROUND((endu - t0) / 3600000000.0, 6) END AS t,
                   CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM (
                SELECT u AS t0,
                       LEAD(u) OVER (PARTITION BY user_id
                                     ORDER BY u, event_id) AS t1
                FROM ev) g CROSS JOIN endt),
        per_t AS (
            SELECT t, CAST(SUM(event) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS obs
            FROM gaps GROUP BY 1),
        tot AS (SELECT COUNT(*) AS n FROM gaps),
        km AS (
            SELECT t, d,
                   CAST(n - COALESCE(SUM(obs) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS n_risk,
                   obs
            FROM per_t CROSS JOIN tot),
        surv AS (
            SELECT t, d, n_risk,
                   CASE WHEN d = n_risk THEN 0.0 ELSE
                   ROUND(EXP(ROUND(SUM(CASE WHEN d < n_risk THEN
                                       ROUND(LN(1.0 - CAST(d AS DOUBLE)
                                                / n_risk), 9) ELSE 0.0 END)
                        OVER (ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW), 9)), 6) END AS s
            FROM km WHERE d > 0)
        SELECT t, d, n_risk, s, rk FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY t DESC) AS rk FROM surv)
        WHERE rk <= 25
    """


def q_did_estimator(spark, sf_dir):
    """Difference-in-differences — the workhorse causal estimator on the
    2×2 (arm × period) design: arm = user parity (stable unit assignment),
    period = first/second half of the observation window, outcome = mean
    event value; DiD = (T₂−T₁) − (C₂−C₁) with 9-dp pre-rounded cell means.
    ONE partial+final agg; the estimate assembles from 4 aggregated
    cells."""
    ev = _read(spark, sf_dir, "events").select("ts", "user_id", "value")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    )
    j = ev.crossJoin(F.broadcast(bounds))
    period = (us >= (F.col("lo") + F.col("hi")) / 2).cast("int")
    arm = (F.col("user_id") % 2).cast("int")
    cells = (
        j.select(arm.alias("arm"), period.alias("period"), "value")
        .groupBy("arm", "period")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 9).alias("mean_val"),
        )
    )
    pv = cells.groupBy().pivot("arm", [0, 1]).agg(
        F.max(F.when(F.col("period") == 0, F.col("mean_val"))).alias("p0"),
        F.max(F.when(F.col("period") == 1, F.col("mean_val"))).alias("p1"),
    )
    did = (F.col("1_p1") - F.col("1_p0")) - (F.col("0_p1") - F.col("0_p0"))
    return pv.select(
        F.round("0_p0", 6).alias("ctl_pre"),
        F.round("0_p1", 6).alias("ctl_post"),
        F.round("1_p0", 6).alias("trt_pre"),
        F.round("1_p1", 6).alias("trt_post"),
        F.round(did, 6).alias("did"),
    )


def _did_estimator_sql() -> str:
    return """
        WITH ev AS (SELECT user_id, value, epoch_us(ts) AS u FROM events),
        bounds AS (SELECT MIN(u) AS lo, MAX(u) AS hi FROM ev),
        cells AS (
            SELECT CAST(user_id % 2 AS INT) AS arm,
                   CAST(u >= (lo + hi) / 2 AS INT) AS period,
                   ROUND(AVG(value), 9) AS mean_val
            FROM ev CROSS JOIN bounds
            GROUP BY 1, 2)
        SELECT ROUND(MAX(CASE WHEN arm = 0 AND period = 0 THEN mean_val END),
                     6) AS ctl_pre,
               ROUND(MAX(CASE WHEN arm = 0 AND period = 1 THEN mean_val END),
                     6) AS ctl_post,
               ROUND(MAX(CASE WHEN arm = 1 AND period = 0 THEN mean_val END),
                     6) AS trt_pre,
               ROUND(MAX(CASE WHEN arm = 1 AND period = 1 THEN mean_val END),
                     6) AS trt_post,
               ROUND((MAX(CASE WHEN arm = 1 AND period = 1 THEN mean_val END)
                      - MAX(CASE WHEN arm = 1 AND period = 0 THEN mean_val END))
                     - (MAX(CASE WHEN arm = 0 AND period = 1 THEN mean_val END)
                        - MAX(CASE WHEN arm = 0 AND period = 0 THEN mean_val
                              END)), 6) AS did
        FROM cells
    """


# ---------------------------------------------------------------------------
# DP noisy release, join-size estimation, cross-track deviation
# ---------------------------------------------------------------------------

_DP_EPS, _DP_RES = 1.0, 3


def q_dp_cell_counts(spark, sf_dir):
    """Differentially-private cell-occupancy release (Laplace mechanism,
    ε=1, sensitivity 1) with SEEDED noise: u = md5-uniform(cell) ∈ (0,1),
    noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) — the deterministic-replay form
    a pipeline uses so a re-run publishes the SAME release (fresh RNG
    would burn privacy budget per run). Pairs with kanon_cells as the
    privacy surface. ONE partial+final agg; noise is codegen arithmetic,
    bit-identical in both engines (argument clamped away from ln(0))."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    cnt = (
        ev.select(cell_encode_col(lat, lng, _DP_RES).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("cell").cast("string")), 1, 12), 16, 10)
        .cast("long")
        / F.lit(_KMV_DENOM)
    )
    centered = u - 0.5
    mag = F.greatest(1.0 - 2.0 * F.abs(centered), F.lit(1e-12))
    noise = (
        F.lit(-1.0 / _DP_EPS) * F.signum(centered) * F.log(mag)
    )
    return cnt.select(
        "cell",
        "n_true",
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
    )


def _dp_cell_counts_sql() -> str:
    from raptor_service_spark.geo.grid import cell_encode_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _DP_RES)
    u = (
        f"(('0x' || substr(md5(CAST(cell AS VARCHAR)), 1, 12))::BIGINT"
        f" / {_KMV_DENOM})"
    )
    return f"""
        WITH cnt AS (
            SELECT {cell} AS cell, COUNT(*) AS n_true FROM events GROUP BY 1)
        SELECT cell, n_true,
               ROUND(n_true + (-1.0 / {_DP_EPS}) * SIGN({u} - 0.5)
                     * LN(GREATEST(1.0 - 2.0 * ABS({u} - 0.5), 1e-12)), 6)
                 AS n_noisy
        FROM cnt
    """


_JSE_K = 64


def q_join_size_estimate(spark, sf_dir):
    """Join-cardinality estimation — the optimizer statistic behind every
    join-reorder decision, computed the way a 100 TB engine must: the
    self-join size |events ⋈ events| on user_id is Σ_u c_u² exactly (one
    agg on aggregated counts), and the bottom-k (KMV) key sample estimates
    it as (Σ_{sampled} c_u²)·D̂/k without ever touching the full key set —
    the sketch the CBO ships between table stats. Output: exact vs
    estimate vs key counts, one row."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("user_id")
    cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        / F.lit(_KMV_DENOM)
    )
    ranked = cnt.withColumn("h", h).withColumn(
        "rk", F.row_number().over(Window.orderBy("h", "user_id"))
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_size"),
        F.max(F.when(F.col("rk") == _JSE_K, F.col("h"))).alias("hk"),
        F.sum(F.when(F.col("rk") <= _JSE_K, F.col("c") * F.col("c")).otherwise(0))
        .cast("long")
        .alias("sample_sum"),
    )
    d_hat = F.when(
        F.col("hk").isNotNull(), F.round(F.lit(float(_JSE_K - 1)) / F.col("hk"), 6)
    ).otherwise(F.col("n_keys").cast("double"))
    est = F.round(
        F.col("sample_sum")
        * d_hat
        / F.least(F.col("n_keys"), F.lit(_JSE_K)).cast("double"),
        6,
    )
    return agg.select(
        "n_keys", "exact_size", est.alias("est_size"),
        F.round(d_hat, 6).alias("d_hat"),
    )


def _join_size_estimate_sql() -> str:
    return f"""
        WITH cnt AS (
            SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
        ranked AS (
            SELECT c, user_id,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                     / {_KMV_DENOM} AS h,
                   ROW_NUMBER() OVER (ORDER BY
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1,
                        12))::BIGINT / {_KMV_DENOM}, user_id) AS rk
            FROM cnt),
        agg AS (
            SELECT COUNT(*) AS n_keys,
                   CAST(SUM(c * c) AS BIGINT) AS exact_size,
                   MAX(CASE WHEN rk = {_JSE_K} THEN h END) AS hk,
                   CAST(SUM(CASE WHEN rk <= {_JSE_K} THEN c * c ELSE 0 END)
                        AS BIGINT) AS sample_sum
            FROM ranked)
        SELECT n_keys, exact_size,
               ROUND(sample_sum
                     * (CASE WHEN hk IS NOT NULL
                             THEN ROUND({float(_JSE_K - 1)} / hk, 6)
                             ELSE CAST(n_keys AS DOUBLE) END)
                     / CAST(LEAST(n_keys, {_JSE_K}) AS DOUBLE), 6) AS est_size,
               ROUND(CASE WHEN hk IS NOT NULL
                          THEN ROUND({float(_JSE_K - 1)} / hk, 6)
                          ELSE CAST(n_keys AS DOUBLE) END, 6) AS d_hat
        FROM agg
    """


_XT_USERS = 40


def q_crosstrack_deviation(spark, sf_dir):
    """Cross-track (route-deviation) screen: per user, the great-circle
    route from first to last fix and the maximum spherical cross-track
    distance of the intermediate fixes — the corridor-compliance check in
    fleet/flight analytics: xt = asin(sin(δ₁₃)·sin(θ₁₃−θ₁₂))·R with δ from
    the haversine triplet and θ the initial bearings. ONE user-keyed
    window (first/last endpoints) + codegen trig; top-20 users by
    deviation."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.distance import EARTH_RADIUS_KM, haversine_col

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _XT_USERS)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select("user_id", "ts", "event_id", lat.alias("lat"), lng.alias("lng"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    withends = (
        pts.withColumn("alat", F.first("lat").over(w))
        .withColumn("alng", F.first("lng").over(w))
        .withColumn("blat", F.last("lat").over(w))
        .withColumn("blng", F.last("lng").over(w))
    )

    def bearing(lat1, lng1, lat2, lng2):
        p1, p2 = F.radians(lat1), F.radians(lat2)
        dl = F.radians(lng2 - lng1)
        return F.atan2(
            F.sin(dl) * F.cos(p2),
            F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl),
        )

    d13 = haversine_col(
        F.col("alat"), F.col("alng"), F.col("lat"), F.col("lng")
    ) / F.lit(EARTH_RADIUS_KM)
    t13 = bearing(F.col("alat"), F.col("alng"), F.col("lat"), F.col("lng"))
    t12 = bearing(F.col("alat"), F.col("alng"), F.col("blat"), F.col("blng"))
    xt = F.abs(
        F.asin(F.sin(d13) * F.sin(t13 - t12)) * F.lit(EARTH_RADIUS_KM)
    )
    per = (
        withends.select("user_id", F.round(xt, 6).alias("xt"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.max("xt").alias("max_xt_km"),
        )
    )
    top = Window.orderBy(F.col("max_xt_km").desc(), "user_id")
    return (
        per.withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= 20)
    )


def _crosstrack_deviation_sql() -> str:
    from raptor_service_spark.geo.distance import EARTH_RADIUS_KM, haversine_sql

    lat, lng = _latlng_sql("event_id")
    hav = haversine_sql("alat", "alng", "lat", "lng")

    def bearing(lat1, lng1, lat2, lng2):
        return (
            f"atan2(sin(radians({lng2} - {lng1})) * cos(radians({lat2})), "
            f"cos(radians({lat1})) * sin(radians({lat2})) "
            f"- sin(radians({lat1})) * cos(radians({lat2})) "
            f"* cos(radians({lng2} - {lng1})))"
        )

    t13 = bearing("alat", "alng", "lat", "lng")
    t12 = bearing("alat", "alng", "blat", "blng")
    xt = (
        f"ABS(asin(sin({hav} / {EARTH_RADIUS_KM}) * sin({t13} - {t12})) "
        f"* {EARTH_RADIUS_KM})"
    )
    return f"""
        WITH pts AS (
            SELECT user_id, ts, event_id, {lat} AS lat, {lng} AS lng
            FROM events WHERE user_id < {_XT_USERS}),
        we AS (
            SELECT user_id, lat, lng,
                   FIRST_VALUE(lat) OVER uw AS alat,
                   FIRST_VALUE(lng) OVER uw AS alng,
                   LAST_VALUE(lat) OVER uw AS blat,
                   LAST_VALUE(lng) OVER uw AS blng
            FROM pts
            WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)),
        per AS (
            SELECT user_id, COUNT(*) AS n_fixes,
                   MAX(ROUND({xt}, 6)) AS max_xt_km
            FROM we GROUP BY 1)
        SELECT user_id, n_fixes, max_xt_km, rk FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY max_xt_km DESC, user_id)
                   AS rk
            FROM per)
        WHERE rk <= 20
    """


# ---------------------------------------------------------------------------
# Shapley attribution, query-likelihood retrieval, nDCG ranking quality
# ---------------------------------------------------------------------------

_SHAP_LOOKBACK_US = 3600 * 1_000_000


def q_shapley_attribution(spark, sf_dir):
    """Channel attribution by simplified Shapley value (Zhao et al. 2018):
    each purchase's journey = the DISTINCT set of non-purchase event types
    the user touched in the preceding hour; conversions with touch-set S
    split credit equally across S's members (φ_i = Σ_{S∋i} v(S)/|S| — the
    exact Shapley value when v is additive over journeys, which this
    construction makes it). The marketing-analytics replacement for
    last-touch. Shape: one as-of-style range join bounded by the lookback
    window, one set agg per conversion, one explode over O(conversions ×
    |S|≤4) rows."""
    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"), us.alias("cu_ts")
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("tu"), us.alias("t_ts"), F.col("event_type").alias("ch")
    )
    j = conv.join(
        touch,
        (F.col("cu") == F.col("tu"))
        & (F.col("t_ts") < F.col("cu_ts"))
        & (F.col("t_ts") >= F.col("cu_ts") - F.lit(_SHAP_LOOKBACK_US)),
    )
    sets = j.groupBy("cid").agg(
        F.array_sort(F.collect_set("ch")).alias("chset")
    )
    per_set = sets.groupBy("chset").agg(F.count(F.lit(1)).alias("v"))
    exploded = per_set.select(
        F.explode("chset").alias("channel"),
        (F.col("v") / F.size("chset")).alias("share"),
        "v",
    )
    return (
        exploded.groupBy("channel")
        .agg(
            F.round(F.round(F.sum("share"), 9), 6).alias("phi"),
            F.sum("v").cast("long").alias("n_journeys"),
        )
    )


def _shapley_attribution_sql() -> str:
    return f"""
        WITH ev AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS u
            FROM events),
        conv AS (
            SELECT event_id AS cid, user_id AS cu, u AS cu_ts
            FROM ev WHERE event_type = 'purchase'),
        touch AS (
            SELECT user_id AS tu, u AS t_ts, event_type AS ch
            FROM ev WHERE event_type != 'purchase'),
        sets AS (
            SELECT c.cid,
                   list_sort(list_distinct(list(t.ch))) AS chset
            FROM conv c JOIN touch t
              ON c.cu = t.tu AND t.t_ts < c.cu_ts
             AND t.t_ts >= c.cu_ts - {_SHAP_LOOKBACK_US}
            GROUP BY 1),
        per_set AS (
            SELECT chset, COUNT(*) AS v FROM sets GROUP BY 1),
        exploded AS (
            SELECT unnest(chset) AS channel,
                   CAST(v AS DOUBLE) / len(chset) AS share, v
            FROM per_set)
        SELECT channel,
               ROUND(ROUND(SUM(share), 9), 6) AS phi,
               CAST(SUM(v) AS BIGINT) AS n_journeys
        FROM exploded GROUP BY 1
    """


_QL_MU = 2000.0


def q_ql_dirichlet(spark, sf_dir):
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai-Lafferty)
    — the language-modeling ranking next to BM25, completing the classic
    IR model family: score(d) = Σ_q ln((tf + μ·p_c(q)) / (dl + μ)) with
    the collection model p_c broadcast. Same one-postings-shuffle shape as
    BM25; top-10."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import doc_postings

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    post = doc_postings(docs).localCheckpoint(eager=False)
    dlen = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    coll = post.groupBy("term").agg(F.sum("tf").alias("cf"))
    tot = post.agg(F.sum("tf").alias("ctot"))
    qt = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    # every query term for every doc (missing -> tf=0 via left join)
    grid = dlen.crossJoin(F.broadcast(qt))
    hit = grid.join(post, ["doc_id", "term"], "left").fillna({"tf": 0})
    scored = (
        hit.join(F.broadcast(coll), "term")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "contrib",
            F.round(
                F.log(
                    (F.col("tf") + _QL_MU * F.col("cf") / F.col("ctot"))
                    / (F.col("dl") + _QL_MU)
                ),
                9,
            ),
        )
    )
    per = scored.groupBy("doc_id").agg(
        F.round(F.round(F.sum("contrib"), 9), 6).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        per.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
    )


def _ql_dirichlet_sql() -> str:
    from raptor_service_spark.operators.bm25 import TOKEN_PATTERN

    terms = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
        WITH post AS (
            SELECT doc_id, t.term, COUNT(*) AS tf
            FROM documents,
                 unnest(regexp_extract_all(lower(text),
                        '{TOKEN_PATTERN}', 0)) AS t(term)
            GROUP BY 1, 2),
        dlen AS (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1),
        coll AS (SELECT term, SUM(tf) AS cf FROM post GROUP BY 1),
        tot AS (SELECT SUM(tf) AS ctot FROM post),
        qt(term) AS (VALUES {terms}),
        grid AS (SELECT d.doc_id, d.dl, q.term FROM dlen d CROSS JOIN qt q),
        hit AS (
            SELECT g.doc_id, g.dl, g.term, COALESCE(p.tf, 0) AS tf
            FROM grid g LEFT JOIN post p
              ON g.doc_id = p.doc_id AND g.term = p.term),
        scored AS (
            SELECT h.doc_id,
                   ROUND(LN((h.tf + {_QL_MU} * c.cf / s.ctot)
                            / (h.dl + {_QL_MU})), 9) AS contrib
            FROM hit h JOIN coll c ON h.term = c.term CROSS JOIN tot s),
        per AS (
            SELECT doc_id, ROUND(ROUND(SUM(contrib), 9), 6) AS score
            FROM scored GROUP BY 1)
        SELECT doc_id, score, rk FROM (
            SELECT doc_id, score,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
            FROM per)
        WHERE rk <= 10
    """


_NDCG_K = 10


def q_ndcg_bm25(spark, sf_dir):
    """nDCG@10 of the BM25 ranking against graded relevance = the doc
    quality score (the repo's deterministic stand-in for judgments) — the
    ranking-quality metric that closes the IR loop (retrieve → rerank →
    EVALUATE): DCG = Σ rel_i/log2(i+1) over the ranking, IDCG from the
    top-k relevance grades corpus-wide, one row out. All O(k) after the
    top-k scan + one corpus-wide relevance rank."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import bm25_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    rel = docs.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("rel")
    )
    ranked = bm25_topk(docs, list(_BM25_TERMS), _NDCG_K).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("pos"),
    )
    dcg = (
        ranked.join(rel, "doc_id")
        .select(
            F.round(
                F.col("rel") / F.log2(F.col("pos") + 1), 9
            ).alias("g")
        )
        .agg(F.round(F.sum("g"), 9).alias("dcg"))
    )
    ideal = (
        rel.withColumn(
            "pos", F.row_number().over(Window.orderBy(F.col("rel").desc(), "doc_id"))
        )
        .filter(F.col("pos") <= _NDCG_K)
        .select(F.round(F.col("rel") / F.log2(F.col("pos") + 1), 9).alias("g"))
        .agg(F.round(F.sum("g"), 9).alias("idcg"))
    )
    return dcg.crossJoin(ideal).select(
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


def _ndcg_bm25_sql() -> str:
    from raptor_service_spark.functions.text import quality_score_sql
    from raptor_service_spark.operators.bm25 import bm25_sql

    kw = bm25_sql("documents", list(_BM25_TERMS), _NDCG_K)
    rel = quality_score_sql("text")
    return f"""
        WITH rel AS (
            SELECT doc_id, ROUND({rel}, 6) AS rel FROM documents),
        ranked AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS pos
            FROM ({kw})),
        dcg AS (
            SELECT ROUND(SUM(ROUND(r.rel / log2(ranked.pos + 1), 9)), 9)
                     AS dcg
            FROM ranked JOIN rel r USING (doc_id)),
        ideal AS (
            SELECT ROUND(SUM(ROUND(rel / log2(pos + 1), 9)), 9) AS idcg
            FROM (
                SELECT rel,
                       ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS pos
                FROM rel)
            WHERE pos <= {_NDCG_K})
        SELECT ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
               ROUND(dcg / idcg, 6) AS ndcg
        FROM dcg CROSS JOIN ideal
    """


# ---------------------------------------------------------------------------
# Mann-Whitney U, BM25 MRR/MAP evaluation, chi-square independence
# ---------------------------------------------------------------------------

_MW_A, _MW_B = "purchase", "click"


def q_mann_whitney(spark, sf_dir):
    """Mann-Whitney U rank-sum test between the 'purchase' and 'click'
    value distributions — the nonparametric two-sample location test next
    to the existing KS drift test (distribution-shape) and the parametric
    A/B z-test. Computed relationally from the per-value count table
    (never a rank-per-row window over raw samples): the average rank of a
    tied value v is c_less(v) + (t_v + 1)/2, R_a = Σ ca·r̄, U = R_a −
    na(na+1)/2, with the exact tie-corrected variance
    na·nb/12·((n+1) − Σ(t³−t)/(n(n−1))). One shuffle on value; all
    rank arithmetic is multiples of 0.5 so the double sums are exact.
    Reference analog: the drift screens next to retrieval quality,
    services/core/build_tree_service.py preflight stats."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").filter(
        F.col("event_type").isin([_MW_A, _MW_B])
    )
    cnt = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == _MW_A, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("event_type") == _MW_B, 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cnt.withColumn(
        "c_less", F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
    ).withColumn(
        "rbar",
        F.col("c_less").cast("double")
        + (F.col("ca") + F.col("cb") + 1).cast("double") / 2.0,
    )
    agg = ranked.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") * F.col("rbar")).alias("ra"),
        F.sum(
            F.pow(F.col("ca") + F.col("cb"), 3) - (F.col("ca") + F.col("cb"))
        ).alias("tie"),
    )
    n = F.col("na") + F.col("nb")
    u = F.col("ra") - F.col("na").cast("double") * (F.col("na") + 1) / 2.0
    mean_u = F.col("na").cast("double") * F.col("nb") / 2.0
    var_u = (
        F.col("na").cast("double")
        * F.col("nb")
        / 12.0
        * ((n + 1).cast("double") - F.col("tie") / (n * (n - 1)).cast("double"))
    )
    z = F.round((u - mean_u) / F.sqrt(var_u), 6)
    return agg.select(
        "na",
        "nb",
        F.round(u, 6).alias("u_stat"),
        z.alias("z"),
        (F.abs(z) > 1.96).cast("int").alias("reject_05"),
    )


def _mann_whitney_sql() -> str:
    return f"""
        WITH ev AS (
            SELECT event_type, value FROM events
            WHERE event_type IN ('{_MW_A}', '{_MW_B}')),
        cnt AS (
            SELECT value,
                   SUM(CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN event_type = '{_MW_B}' THEN 1 ELSE 0 END) AS cb
            FROM ev GROUP BY 1),
        ranked AS (
            SELECT ca, cb,
                   COALESCE(SUM(ca + cb) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS c_less
            FROM cnt),
        agg AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb,
                   SUM(ca * (c_less + (ca + cb + 1) / 2.0)) AS ra,
                   SUM(POW(ca + cb, 3) - (ca + cb)) AS tie
            FROM ranked)
        SELECT na, nb,
               ROUND(ra - na * (na + 1) / 2.0, 6) AS u_stat,
               ROUND((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                     / SQRT(na * CAST(nb AS DOUBLE) / 12.0
                            * ((na + nb + 1)
                               - tie / (CAST(na + nb AS DOUBLE)
                                        * (na + nb - 1)))), 6) AS z,
               CAST(ABS((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                     / SQRT(na * CAST(nb AS DOUBLE) / 12.0
                            * ((na + nb + 1)
                               - tie / (CAST(na + nb AS DOUBLE)
                                        * (na + nb - 1))))) > 1.96
                    AS INT) AS reject_05
        FROM agg
    """


_REL_T = 0.95
_EVAL_K = 10


def q_bm25_eval(spark, sf_dir):
    """MRR and MAP@10 / recall@10 of the BM25 ranking against binary
    relevance (quality_score ≥ 0.95, ~top-15% of the corpus) — completes
    the ranking-evaluation family next to nDCG (graded) and RBO
    (rank-vs-rank): MRR = 1/pos of the first relevant hit, AP@10 =
    Σ_rel precision@i / min(R, 10). O(k) after the top-k scan plus one
    corpus-wide relevance count."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import bm25_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    rel = docs.select(
        "doc_id", (quality_score(F.col("text")) >= _REL_T).cast("int").alias("rel")
    )
    r_tot = rel.agg(F.sum("rel").cast("long").alias("r_total"))
    ranked = bm25_topk(docs, list(_BM25_TERMS), _EVAL_K).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("pos"),
    )
    hits = ranked.join(rel, "doc_id")
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    prec = hits.withColumn("cum_rel", F.sum("rel").over(w)).withColumn(
        "p_at_i",
        F.when(
            F.col("rel") == 1,
            F.round(F.col("cum_rel").cast("double") / F.col("pos"), 9),
        ).otherwise(F.lit(0.0)),
    )
    agg = prec.agg(
        F.coalesce(
            F.round(1.0 / F.min(F.when(F.col("rel") == 1, F.col("pos"))), 6),
            F.lit(0.0),
        ).alias("mrr"),
        F.sum("p_at_i").alias("sum_p"),
        F.sum("rel").cast("long").alias("n_rel_topk"),
    )
    return agg.crossJoin(r_tot).select(
        "mrr",
        F.round(
            F.col("sum_p") / F.least(F.col("r_total"), F.lit(_EVAL_K)).cast("double"),
            6,
        ).alias("ap10"),
        F.round(F.col("n_rel_topk").cast("double") / F.col("r_total"), 6).alias(
            "recall10"
        ),
        "n_rel_topk",
        "r_total",
    )


def _bm25_eval_sql() -> str:
    from raptor_service_spark.functions.text import quality_score_sql
    from raptor_service_spark.operators.bm25 import bm25_sql

    kw = bm25_sql("documents", list(_BM25_TERMS), _EVAL_K)
    qs = quality_score_sql("text")
    return f"""
        WITH rel AS (
            SELECT doc_id,
                   CASE WHEN {qs} >= {_REL_T} THEN 1 ELSE 0 END AS rel
            FROM documents),
        r_tot AS (SELECT CAST(SUM(rel) AS BIGINT) AS r_total FROM rel),
        ranked AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS pos
            FROM ({kw})),
        hits AS (
            SELECT r.pos, l.rel FROM ranked r JOIN rel l USING (doc_id)),
        prec AS (
            SELECT pos, rel,
                   CASE WHEN rel = 1 THEN
                       ROUND(CAST(SUM(rel) OVER (ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / pos, 9)
                   ELSE 0.0 END AS p_at_i
            FROM hits),
        agg AS (
            SELECT COALESCE(ROUND(1.0 / MIN(CASE WHEN rel = 1 THEN pos END),
                                  6), 0.0) AS mrr,
                   SUM(p_at_i) AS sum_p,
                   CAST(SUM(rel) AS BIGINT) AS n_rel_topk
            FROM prec)
        SELECT mrr,
               ROUND(sum_p / LEAST(r_total, {_EVAL_K}), 6) AS ap10,
               ROUND(CAST(n_rel_topk AS DOUBLE) / r_total, 6) AS recall10,
               n_rel_topk, r_total
        FROM agg CROSS JOIN r_tot
    """


def q_chi2_independence(spark, sf_dir):
    """Chi-square test of independence between event_type and day-of-week
    (UTC, epoch-day mod 7) with Cramér's V effect size — the categorical
    counterpart of the numeric two-sample screens (KS, Mann-Whitney):
    χ² = Σ (o − e)²/e over the r×c contingency table with expected
    counts from the margins. One count shuffle; the table itself is
    O(r·c) = O(35) rows, margins broadcast."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        (
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
            % 7
        )
        .cast("int")
        .alias("dow"),
    )
    obs = ev.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    row_t = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    col_t = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.count_distinct("event_type").alias("r"),
        F.count_distinct("dow").alias("c"),
    )
    # full grid (absent cells have o=0 but e>0 and still contribute)
    grid = row_t.crossJoin(col_t).join(obs, ["event_type", "dow"], "left").fillna(
        {"o": 0}
    )
    contrib = grid.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.pow(
                F.col("o").cast("double")
                - F.col("rt").cast("double") * F.col("ct") / F.col("n"),
                2,
            )
            / (F.col("rt").cast("double") * F.col("ct") / F.col("n")),
            9,
        ).alias("x"),
        "n",
        "r",
        "c",
    )
    return contrib.groupBy("n", "r", "c").agg(
        F.round(F.sum("x"), 6).alias("chi2")
    ).select(
        "chi2",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1)).cast(
                    "double"
                )
            ),
            6,
        ).alias("cramers_v"),
        F.col("n").cast("long").alias("n"),
    )


def _chi2_independence_sql() -> str:
    return """
        WITH ev AS (
            SELECT event_type,
                   CAST(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) % 7
                        AS INT) AS dow
            FROM events),
        obs AS (
            SELECT event_type, dow, COUNT(*) AS o FROM ev GROUP BY 1, 2),
        row_t AS (SELECT event_type, SUM(o) AS rt FROM obs GROUP BY 1),
        col_t AS (SELECT dow, SUM(o) AS ct FROM obs GROUP BY 1),
        tot AS (
            SELECT SUM(o) AS n, COUNT(DISTINCT event_type) AS r,
                   COUNT(DISTINCT dow) AS c
            FROM obs),
        grid AS (
            SELECT r.event_type, c.dow, r.rt, c.ct, COALESCE(o.o, 0) AS o
            FROM row_t r CROSS JOIN col_t c
            LEFT JOIN obs o ON o.event_type = r.event_type AND o.dow = c.dow),
        contrib AS (
            SELECT ROUND(POW(o - CAST(rt AS DOUBLE) * ct / t.n, 2)
                         / (CAST(rt AS DOUBLE) * ct / t.n), 9) AS x,
                   t.n, t.r, t.c
            FROM grid CROSS JOIN tot t),
        agg AS (
            SELECT n, r, c, ROUND(SUM(x), 6) AS chi2
            FROM contrib GROUP BY 1, 2, 3)
        SELECT chi2,
               CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
               ROUND(SQRT(chi2 / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v,
               CAST(n AS BIGINT) AS n
        FROM agg
    """


# ---------------------------------------------------------------------------
# CUPED variance reduction, shingle containment join, clustering coefficient
# ---------------------------------------------------------------------------

_CUPED_SPLIT_DAY = 15


def q_cuped_adjustment(spark, sf_dir):
    """CUPED variance-reduced A/B read (Deng et al., WSDM 2013): users are
    hashed into arms (md5 bucket parity — the hash_split convention, so
    assignment is partition/order-independent), X = each user's
    pre-period mean value (first 15 days), Y = post-period mean;
    θ = cov(X,Y)/var(X) pooled, adjusted effect = (Ȳb−Ȳa) − θ(X̄b−X̄a),
    and the variance reduction is corr(X,Y)² in closed form (no second
    pass). Shape: one per-user agg shuffle, then O(1) scalar algebra —
    the sums-then-ratio OLS protocol with 9-dp pre-rounding."""
    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "value")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    dmin = ev.agg(F.min(day).alias("d0"))
    rel = ev.crossJoin(F.broadcast(dmin)).select(
        "user_id", "value", (day - F.col("d0")).alias("d")
    )
    per_user = (
        rel.groupBy("user_id")
        .agg(
            F.round(
                F.avg(F.when(F.col("d") < _CUPED_SPLIT_DAY, F.col("value"))), 9
            ).alias("x"),
            F.round(
                F.avg(F.when(F.col("d") >= _CUPED_SPLIT_DAY, F.col("value"))), 9
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .withColumn(
            "arm",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 2
            ).cast("int"),
        )
    )
    s = lambda c: F.round(F.sum(c), 9)
    g = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        s(F.col("x")).alias("sx"),
        s(F.col("y")).alias("sy"),
        s(F.col("x") * F.col("y")).alias("sxy"),
        s(F.col("x") * F.col("x")).alias("sxx"),
        s(F.col("y") * F.col("y")).alias("syy"),
    )
    arm = per_user.groupBy("arm").agg(
        F.round(F.avg("x"), 9).alias("mx"), F.round(F.avg("y"), 9).alias("my")
    )
    a = arm.filter(F.col("arm") == 0).select(
        F.col("mx").alias("mxa"), F.col("my").alias("mya")
    )
    b = arm.filter(F.col("arm") == 1).select(
        F.col("mx").alias("mxb"), F.col("my").alias("myb")
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    theta = F.round(cov / varx, 9)
    return (
        g.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .select(
            F.col("n").cast("long").alias("n_users"),
            F.round(theta, 6).alias("theta"),
            F.round(F.col("myb") - F.col("mya"), 6).alias("diff_raw"),
            F.round(
                (F.col("myb") - F.col("mya"))
                - theta * (F.col("mxb") - F.col("mxa")),
                6,
            ).alias("diff_adj"),
            F.round(cov * cov / (varx * vary), 6).alias("var_red"),
        )
    )


def _cuped_adjustment_sql() -> str:
    return f"""
        WITH ev AS (
            SELECT user_id, value,
                   CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day
            FROM events),
        dmin AS (SELECT MIN(day) AS d0 FROM ev),
        rel AS (
            SELECT user_id, value, day - d0 AS d FROM ev CROSS JOIN dmin),
        per_user AS (
            SELECT user_id,
                   ROUND(AVG(CASE WHEN d < {_CUPED_SPLIT_DAY} THEN value END),
                         9) AS x,
                   ROUND(AVG(CASE WHEN d >= {_CUPED_SPLIT_DAY} THEN value END),
                         9) AS y,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        ::BIGINT % 2 AS INT) AS arm
            FROM rel GROUP BY user_id
            HAVING x IS NOT NULL AND y IS NOT NULL),
        g AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   ROUND(SUM(x), 9) AS sx, ROUND(SUM(y), 9) AS sy,
                   ROUND(SUM(x * y), 9) AS sxy,
                   ROUND(SUM(x * x), 9) AS sxx,
                   ROUND(SUM(y * y), 9) AS syy
            FROM per_user),
        arm AS (
            SELECT arm, ROUND(AVG(x), 9) AS mx, ROUND(AVG(y), 9) AS my
            FROM per_user GROUP BY 1),
        a AS (SELECT mx AS mxa, my AS mya FROM arm WHERE arm = 0),
        b AS (SELECT mx AS mxb, my AS myb FROM arm WHERE arm = 1)
        SELECT CAST(n AS BIGINT) AS n_users,
               ROUND(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9), 6)
                   AS theta,
               ROUND(myb - mya, 6) AS diff_raw,
               ROUND((myb - mya)
                     - ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
                       * (mxb - mxa), 6) AS diff_adj,
               ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                   AS var_red
        FROM g CROSS JOIN a CROSS JOIN b
    """


def q_containment_pairs(spark, sf_dir):
    """Asymmetric shingle-containment join (quote/subset detection): ordered
    doc pairs with |Sa ∩ Sb|/|Sa| >= 0.6 over word-3-gram sets, |Sa| >= 5 —
    the near-dup signal Jaccard misses when a short doc is embedded in a
    long one. One-sided prefix-filtered candidates (see
    operators/dedup.py:set_containment_pairs for the exactness argument);
    the DuckDB twin is the brute-force all-pairs filter."""
    from raptor_service_spark.operators.dedup import (
        distinct_shingle_rows,
        set_containment_pairs,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    dg = distinct_shingle_rows(docs, "text", "doc_id", 3)
    return set_containment_pairs(dg, threshold=0.6, min_size=5)


def _containment_pairs_sql() -> str:
    from raptor_service_spark.operators.dedup import containment_pairs_sql

    return containment_pairs_sql(
        "documents", "text", "doc_id", 3, threshold=0.6, min_size=5
    )


def q_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient over the cell co-visitation graph
    (res-3 cells, edge when >= 3 shared users): cc(v) = 2·t(v)/(d(v)·
    (d(v)−1)) with t(v) from relational triangle enumeration — the
    network-cohesion measure next to the global triangle count
    (od_triangles) and k-core. Shape: triangles enumerate each a<b<c once
    via two oriented-edge joins; the per-node explode is 3 rows per
    triangle; degree is one agg over the symmetric edge list. Edge count
    is covisit-thresholded, so fanout is graph-sized, never event-sized."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    basket = ev.select(
        "user_id", cell_encode_col(lat, lng, 3).alias("cell")
    ).dropDuplicates(["user_id", "cell"])
    a = basket.select("user_id", F.col("cell").alias("u"))
    b = basket.select("user_id", F.col("cell").alias("v"))
    edges = (
        a.join(b, "user_id")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .fillna({"tri": 0})
        .select(
            F.col("node").alias("cell"),
            F.col("deg").cast("long").alias("deg"),
            F.col("tri").cast("long").alias("tri"),
            F.round(
                2.0
                * F.col("tri").cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
                6,
            ).alias("cc"),
        )
    )


def _clustering_coeff_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH basket AS (SELECT DISTINCT user_id, {cell} AS cell FROM events),
        edges AS (
            SELECT a.cell AS u, b.cell AS v
            FROM basket a JOIN basket b
              ON a.user_id = b.user_id AND a.cell < b.cell
            GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        deg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT u AS node FROM edges
                UNION ALL SELECT v FROM edges)
            GROUP BY 1),
        tri AS (
            SELECT node, COUNT(*) AS tri FROM (
                SELECT unnest([e1.u, e1.v, e2.v]) AS node
                FROM edges e1
                JOIN edges e2 ON e1.v = e2.u
                JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
            GROUP BY 1)
        SELECT d.node AS cell,
               CAST(d.deg AS BIGINT) AS deg,
               CAST(COALESCE(t.tri, 0) AS BIGINT) AS tri,
               ROUND(2.0 * COALESCE(t.tri, 0)
                     / (d.deg * CAST(d.deg - 1 AS DOUBLE)), 6) AS cc
        FROM deg d LEFT JOIN tri t ON d.node = t.node
        WHERE d.deg >= 2
    """


# ---------------------------------------------------------------------------
# HITS hub/authority, Rocchio pseudo-feedback, CDC chunk dedup
# ---------------------------------------------------------------------------


def q_hits_scores(spark, sf_dir):
    """HITS hub/authority over the res-3 OD cell-transition graph (same
    edge set as cell_pagerank, unweighted): authorities = tiles
    trajectories flow INTO from many good hubs, hubs = tiles that feed
    many good authorities — the two-sided centrality PageRank collapses
    into one. 3 max-normalized iterations, 9-dp per-step rounding;
    iteration mechanics in operators/cell_graph.py:hits."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import hits

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 3))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        pts.withColumn("prev_cell", F.lag("cell").over(w))
        .filter(
            F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell"))
        )
        .select(F.col("prev_cell").alias("src"), F.col("cell").alias("dst"))
    )
    return hits(edges, n_iters=3)


def _hits_scores_sql() -> str:
    from raptor_service_spark.operators.cell_graph import hits_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    edges = f"""
        SELECT prev_cell AS src, cell AS dst
        FROM (SELECT cell, LAG(cell) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_cell
              FROM (SELECT user_id, ts, event_id, {cell} AS cell FROM events))
        WHERE prev_cell IS NOT NULL AND prev_cell != cell
    """
    return hits_sql(edges, n_iters=3)


_ROCCHIO_A, _ROCCHIO_B, _ROCCHIO_G = 1.0, 0.75, 0.15


def q_rocchio_feedback(spark, sf_dir):
    """Rocchio pseudo-relevance feedback in EMBEDDING space (the
    vector-side twin of the term-side prf_expansion): stage-1 cosine
    top-50 for QVEC, pseudo-relevant = ranks 1-10, pseudo-negative =
    ranks 41-50; q' = α·q + β·centroid(rel) − γ·centroid(neg) with
    per-dim centroids rounded to 6 dp (the kmeans/IVF literal-vector
    protocol), then one re-scan re-ranks the corpus against the literal
    q'. Scale shape: stage 1 is TakeOrderedAndProject; the centroid
    arithmetic is O(50·dim) on the driver; stage 2 is the same codegen
    scan as knn_top10 — never a dim-wise shuffle."""
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    cand = (
        e.withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), QVEC), 9))
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(50)
    )
    # deterministic ranks: re-sort the 50 collected rows driver-side
    rows = sorted(
        cand.select("vec_id", "dist", "embedding").collect(),
        key=lambda r: (r.dist, r.vec_id),
    )
    rel = np.mean([np.array(r.embedding, dtype=np.float64) for r in rows[:10]], axis=0)
    neg = np.mean([np.array(r.embedding, dtype=np.float64) for r in rows[40:50]], axis=0)
    qprime = _round_half_up(
        _ROCCHIO_A * QVEC
        + _ROCCHIO_B * _round_half_up(rel, 6)
        - _ROCCHIO_G * _round_half_up(neg, 6),
        6,
    )
    return (
        e.withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), qprime), 6))
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", "dist")
    )


def _rocchio_feedback_sql() -> str:
    demb = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    return f"""
        WITH cand AS (
            SELECT vec_id, {demb} AS v,
                   ROUND(1.0 - list_cosine_similarity({demb}, {QVEC_SQL}), 9)
                       AS dist
            FROM embeddings
            ORDER BY dist ASC, vec_id ASC LIMIT 50),
        ranked AS (
            SELECT v, ROW_NUMBER() OVER (ORDER BY dist ASC, vec_id ASC) AS rk
            FROM cand),
        relc AS (
            SELECT i, ROUND(AVG(v[i]), 6) AS c
            FROM ranked CROSS JOIN generate_series(1, 64) g(i)
            WHERE rk <= 10 GROUP BY i),
        negc AS (
            SELECT i, ROUND(AVG(v[i]), 6) AS c
            FROM ranked CROSS JOIN generate_series(1, 64) g(i)
            WHERE rk >= 41 GROUP BY i),
        qp AS (
            SELECT list(ROUND({_ROCCHIO_A} * q.x + {_ROCCHIO_B} * r.c
                              - {_ROCCHIO_G} * n.c, 6) ORDER BY r.i) AS qv
            FROM relc r
            JOIN negc n ON r.i = n.i
            JOIN (SELECT i, ({QVEC_SQL})[i] AS x
                  FROM generate_series(1, 64) g(i)) q
              ON q.i = r.i)
        SELECT e.vec_id, e.label,
               ROUND(1.0 - list_cosine_similarity({demb}, qp.qv), 6) AS dist
        FROM embeddings e CROSS JOIN qp
        ORDER BY dist ASC, vec_id ASC LIMIT 10
    """


_CDC_W = 16  # rolling window (chars) hashed at each position
_CDC_D = 64  # divisor: boundary when bucket == 0 -> ~64-char expected chunks


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup (the storage/backup-system dedup
    family — LBFS/FastCDC lineage — missing from the shingle/minhash
    families): a chunk boundary falls AFTER position i when the md5 of
    the 16-char window ending at i hits bucket 0 of 64, so boundaries
    depend only on local content and survive insertions that shift
    offsets (the failure mode of fixed-size blocks). Chunks are re-hashed
    and counted corpus-wide; output = the top-20 most-duplicated chunks
    (hash, length, n_occurrences, n_docs). Everything runs as codegen
    array expressions (sequence → transform(md5) → filter) with ONE row
    per doc until the final chunk explode — no per-position shuffle; the
    window md5 stream is the winnowing fingerprint cost class."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.length("text")
    # boundary positions: i in [W, len], bucket(md5(window ending at i))==0
    pos = F.when(n >= _CDC_W, F.sequence(F.lit(_CDC_W), n)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    bounds = F.filter(
        pos,
        lambda i: (
            F.conv(
                F.substring(
                    F.md5(F.substring(F.col("text"), (i - _CDC_W + 1), _CDC_W)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CDC_D
        )
        == 0,
    )
    # chunk start offsets: 1 + [0, b1, b2, ...]; ends: [b1, ..., bk, len]
    starts = F.concat(F.array(F.lit(0)), bounds)
    ends = F.concat(bounds, F.array(n))
    chunks = F.zip_with(
        starts,
        ends,
        lambda s, e: F.substring(F.col("text"), s + 1, e - s),
    )
    ex = (
        docs.select("doc_id", F.explode(chunks).alias("chunk"))
        .filter(F.length("chunk") > 0)
        .select("doc_id", F.md5("chunk").alias("h"), F.length("chunk").alias("len"))
    )
    return (
        ex.groupBy("h", "len")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occ").desc(), F.col("h").asc())
        .limit(20)
        .select(
            "h",
            F.col("len").cast("long").alias("len"),
            F.col("n_occ").cast("long").alias("n_occ"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


def _cdc_chunks_sql() -> str:
    w, d = _CDC_W, _CDC_D
    return f"""
        WITH b AS (
            SELECT doc_id, text, length(text) AS n,
                   CASE WHEN length(text) >= {w} THEN
                       list_filter(generate_series({w}, length(text)),
                           i -> ('0x' || substr(md5(substr(text, i - {w} + 1,
                                                           {w})), 1, 8))
                                ::BIGINT % {d} = 0)
                   ELSE [] END AS bounds
            FROM documents),
        ch AS (
            SELECT doc_id,
                   UNNEST(list_transform(generate_series(1, len(bounds) + 1),
                       j -> substr(text,
                            (CASE WHEN j = 1 THEN 0
                                  ELSE bounds[j - 1] END) + 1,
                            (CASE WHEN j = len(bounds) + 1 THEN n
                                  ELSE bounds[j] END)
                            - (CASE WHEN j = 1 THEN 0
                                    ELSE bounds[j - 1] END)))) AS chunk
            FROM b),
        ex AS (
            SELECT doc_id, md5(chunk) AS h, length(chunk) AS len
            FROM ch WHERE length(chunk) > 0)
        SELECT h, CAST(len AS BIGINT) AS len,
               CAST(COUNT(*) AS BIGINT) AS n_occ,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM ex GROUP BY 1, 2
        ORDER BY n_occ DESC, h ASC LIMIT 20
    """


# ---------------------------------------------------------------------------
# round-3 batch: graph structure (assortativity, modularity, link prediction),
# corpus statistics (JSD, Kneser-Ney), geometry (shoelace), sketches (HLL)
# ---------------------------------------------------------------------------


def _od_cell_edges(spark, sf_dir, res: int = 3) -> DataFrame:
    """Directed res-`res` OD cell-transition edges with counts — the shared
    edge construction of cell_pagerank / hits_scores / cell_markov."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, res))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        pts.withColumn("prev_cell", F.lag("cell").over(w))
        .filter(F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell")))
        .groupBy(F.col("prev_cell").alias("src"), F.col("cell").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _od_cell_edges_sql(res: int = 3) -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, res)
    return f"""
        SELECT prev_cell AS src, cell AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT cell, LAG(cell) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_cell
              FROM (SELECT user_id, ts, event_id, {cell} AS cell FROM events))
        WHERE prev_cell IS NOT NULL AND prev_cell != cell
        GROUP BY 1, 2
    """


def _undirected_cell_edges(spark, sf_dir, res: int = 3) -> DataFrame:
    """Undirected collapse of the OD graph: (a<b, w = both-direction count)."""
    e = _od_cell_edges(spark, sf_dir, res)
    return (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "cnt",
        )
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("w"))
    )


def _undirected_cell_edges_sql(res: int = 3) -> str:
    return f"""
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
               CAST(SUM(cnt) AS BIGINT) AS w
        FROM ({_od_cell_edges_sql(res)}) GROUP BY 1, 2
    """


def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity coefficient (Newman 2002) of the undirected
    res-3 OD cell graph: Pearson correlation of the degrees at the two ends
    of every edge (both orientations) — do hubs connect to hubs (r>0,
    social-network shape) or to leaves (r<0, infrastructure shape)?
    Everything is exact integer sums (degrees, cross products) until the
    single final division, so the float is bit-identical across engines.
    Scale shape: one edge agg + two broadcast-size joins of the O(cells)
    degree table; no quadratic anywhere."""
    e = _undirected_cell_edges(spark, sf_dir).select("a", "b")
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ends = (
        e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "dx"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "dy"), "b")
        .select("dx", "dy")
    )
    both = ends.unionByName(ends.select(F.col("dy").alias("dx"), F.col("dx").alias("dy")))
    s = both.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    return s.select(
        (F.col("n") / F.lit(2)).cast("long").alias("m_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("assortativity"),
    )


def _degree_assortativity_sql() -> str:
    return f"""
        WITH e AS (SELECT a, b FROM ({_undirected_cell_edges_sql()})),
        deg AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
        ends AS (
            SELECT da.deg AS dx, db.deg AS dy
            FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v),
        bth AS (SELECT dx, dy FROM ends UNION ALL SELECT dy, dx FROM ends),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dx) AS sx,
                     SUM(dx * dx) AS sxx, SUM(dx * dy) AS sxy FROM bth)
        SELECT CAST(n / 2 AS BIGINT) AS m_edges,
               ROUND(CAST(n * sxy - sx * sx AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS assortativity
        FROM s
    """


def q_cell_modularity(spark, sf_dir):
    """Newman modularity of the res-1 parent-tile partition of the weighted
    res-3 OD graph — do trajectories stay inside coarse regions (Q near 1)
    or cross them freely (Q near 0)? Q = Σ_c [W_in(c)/W − (d_c/2W)²] over
    communities c = the 16 res-1 ancestors; every term is an exact integer
    sum (weights are transition counts) so the float division is
    bit-identical across engines. One edge agg + O(cells) degree agg."""
    from raptor_service_spark.geo.grid import cell_parent_col

    e = _undirected_cell_edges(spark, sf_dir)
    e = e.withColumn("ca", cell_parent_col(F.col("a"), 3, 1)).withColumn(
        "cb", cell_parent_col(F.col("b"), 3, 1)
    )
    tot = e.agg(F.sum("w").alias("w_tot"))
    w_in = (
        e.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.sum("w").alias("w_in"))
    )
    d_c = (
        e.select(F.col("ca").alias("c"), F.col("w"))
        .unionByName(e.select(F.col("cb").alias("c"), F.col("w")))
        .groupBy("c")
        .agg(F.sum("w").alias("d_c"))
    )
    per = (
        d_c.join(w_in, "c", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce("w_in", F.lit(0)).cast("double").alias("wi"),
            F.col("d_c").cast("double").alias("dc"),
            F.col("w_tot").cast("double").alias("wt"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.max(F.col("wt").cast("long")).alias("w_total"),
        F.round(
            F.sum(
                F.col("wi") / F.col("wt")
                - (F.col("dc") / (F.lit(2.0) * F.col("wt")))
                * (F.col("dc") / (F.lit(2.0) * F.col("wt")))
            ),
            6,
        ).alias("q_modularity"),
    )


def _cell_modularity_sql() -> str:
    ca = cell_parent_sql("a", 3, 1)
    cb = cell_parent_sql("b", 3, 1)
    return f"""
        WITH e AS (SELECT a, b, w, {ca} AS ca, {cb} AS cb
                   FROM ({_undirected_cell_edges_sql()})),
        tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_tot FROM e),
        w_in AS (SELECT ca AS c, CAST(SUM(w) AS BIGINT) AS w_in FROM e
                 WHERE ca = cb GROUP BY 1),
        d_c AS (SELECT c, CAST(SUM(w) AS BIGINT) AS d_c
                FROM (SELECT ca AS c, w FROM e UNION ALL SELECT cb, w FROM e)
                GROUP BY c),
        per AS (SELECT CAST(COALESCE(w.w_in, 0) AS DOUBLE) AS wi,
                       CAST(d.d_c AS DOUBLE) AS dc,
                       CAST(t.w_tot AS DOUBLE) AS wt
                FROM d_c d LEFT JOIN w_in w ON d.c = w.c CROSS JOIN tot t)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
               CAST(MAX(wt) AS BIGINT) AS w_total,
               ROUND(SUM(wi / wt - (dc / (2.0 * wt)) * (dc / (2.0 * wt))), 6)
                   AS q_modularity
        FROM per
    """


def q_link_prediction(spark, sf_dir):
    """Link prediction over the undirected res-3 OD graph: for every
    NON-adjacent cell pair with ≥1 common neighbor, the three classic
    scores — common-neighbor count, Jaccard of neighborhoods, Adamic-Adar
    Σ 1/ln(deg(z)) (z ranges over shared neighbors; deg(z) ≥ 2 whenever z
    is shared, so the log is positive). Top-20 by (AA desc, a, b). Scale
    shape: candidates come from ONE 2-hop equi-join through the shared
    neighbor (bounded by Σ deg², the standard triangle-count budget), the
    existing-edge filter is an anti-join, and per-z AA terms are pre-rounded
    to 9 dp before the SUM (cross-engine float discipline)."""
    e = _undirected_cell_edges(spark, sf_dir).select("a", "b")
    nbr = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = nbr.groupBy(F.col("a").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    hop2 = (
        nbr.withColumnRenamed("a", "x").withColumnRenamed("b", "z")
        .join(
            nbr.select(F.col("a").alias("z"), F.col("b").alias("y")),
            "z",
        )
        .filter(F.col("x") < F.col("y"))
        .join(
            e.select(F.col("a").alias("x"), F.col("b").alias("y")),
            ["x", "y"],
            "left_anti",
        )
    )
    scored = (
        hop2.join(deg.withColumnRenamed("v", "z"), "z")
        .withColumn("aa_term", F.round(F.lit(1.0) / F.log(F.col("deg").cast("double")), 9))
        .groupBy(F.col("x").alias("a"), F.col("y").alias("b"))
        .agg(F.count(F.lit(1)).alias("cn"), F.round(F.sum("aa_term"), 6).alias("aa"))
    )
    out = (
        scored.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            "cn",
            F.round(
                F.col("cn") / (F.col("da") + F.col("db") - F.col("cn")), 6
            ).alias("jaccard"),
            "aa",
        )
    )
    return out.orderBy(F.col("aa").desc(), "a", "b").limit(20)


def _link_prediction_sql() -> str:
    return f"""
        WITH e AS (SELECT a, b FROM ({_undirected_cell_edges_sql()})),
        nbr AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS deg
                FROM nbr GROUP BY 1),
        hop2 AS (
            SELECT n1.a AS x, n1.b AS z, n2.b AS y
            FROM nbr n1 JOIN nbr n2 ON n1.b = n2.a
            WHERE n1.a < n2.b
              AND NOT EXISTS (SELECT 1 FROM e
                              WHERE e.a = n1.a AND e.b = n2.b)),
        scored AS (
            SELECT x AS a, y AS b, CAST(COUNT(*) AS BIGINT) AS cn,
                   ROUND(SUM(ROUND(1.0 / LN(CAST(d.deg AS DOUBLE)), 9)), 6)
                       AS aa
            FROM hop2 JOIN deg d ON hop2.z = d.v
            GROUP BY 1, 2)
        SELECT s.a, s.b, s.cn,
               ROUND(CAST(s.cn AS DOUBLE) / (da.deg + db.deg - s.cn), 6)
                   AS jaccard,
               s.aa
        FROM scored s JOIN deg da ON s.a = da.v JOIN deg db ON s.b = db.v
        ORDER BY aa DESC, a, b LIMIT 20
    """


_JSD_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


def q_jsd_sources(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence (nats) between the term
    distributions of five corpus sources — the drift/contrast matrix a
    data-mixing pipeline keeps per shard (symmetric, bounded by ln 2,
    defined even with disjoint support — the failure modes of plain KL).
    Dense (source × term) grid via cross join of the O(vocab) term list
    (vocab-sized, broadcastable), per-term contributions pre-rounded to
    9 dp before the pair SUM. One token scan feeds everything."""
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents").filter(F.col("source").isin(_JSD_SOURCES))
    toks = d.select("source", F.explode(words_col(F.col("text"))).alias("term"))
    cnt = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    vocab = cnt.select("term").distinct()
    srcs = tot.select("source", "n")
    dense = (
        vocab.crossJoin(F.broadcast(srcs))
        .join(cnt, ["source", "term"], "left")
        .select(
            "source",
            "term",
            (F.coalesce("c", F.lit(0)).cast("double") / F.col("n")).alias("p"),
        )
    )
    pairs = (
        dense.withColumnRenamed("source", "src_a").withColumnRenamed("p", "pa")
        .join(
            dense.withColumnRenamed("source", "src_b").withColumnRenamed("p", "pb"),
            "term",
        )
        .filter(F.col("src_a") < F.col("src_b"))
    )
    term_c = F.round(
        F.when(
            F.col("pa") > 0,
            F.lit(0.5) * F.col("pa") * F.log(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb"))),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("pb") > 0,
            F.lit(0.5) * F.col("pb") * F.log(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb"))),
        ).otherwise(F.lit(0.0)),
        9,
    )
    return (
        pairs.withColumn("t", term_c)
        .groupBy("src_a", "src_b")
        .agg(F.round(F.sum("t"), 6).alias("jsd"))
        .orderBy("src_a", "src_b")
    )


def _jsd_sources_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    srcs = ", ".join(f"'{s}'" for s in _JSD_SOURCES)
    return f"""
        WITH toks AS (
            SELECT source, unnest({words_sql("text")}) AS term
            FROM documents WHERE source IN ({srcs})),
        cnt AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
                FROM toks GROUP BY 1, 2),
        tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        vocab AS (SELECT DISTINCT term FROM cnt),
        dense AS (
            SELECT t.source, v.term,
                   CAST(COALESCE(c.c, 0) AS DOUBLE) / t.n AS p
            FROM vocab v CROSS JOIN tot t
            LEFT JOIN cnt c ON c.source = t.source AND c.term = v.term),
        pairs AS (
            SELECT da.source AS src_a, db.source AS src_b,
                   da.p AS pa, db.p AS pb
            FROM dense da JOIN dense db ON da.term = db.term
            WHERE da.source < db.source)
        SELECT src_a, src_b,
               ROUND(SUM(ROUND(
                   CASE WHEN pa > 0
                        THEN 0.5 * pa * LN(2.0 * pa / (pa + pb)) ELSE 0 END
                 + CASE WHEN pb > 0
                        THEN 0.5 * pb * LN(2.0 * pb / (pa + pb)) ELSE 0 END,
               9)), 6) AS jsd
        FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
    """


def q_polygon_metrics(spark, sf_dir):
    """Shoelace geometry over the polygon TABLE (the pip_polygon_table
    fixtures): signed-area → area, perimeter, and the area-weighted
    centroid of every polygon, computed ARRAY-side (aggregate over the
    vertex array with wraparound indexing — one row per polygon end to
    end, no explode, no UDF). x = lng, y = lat, planar degree space (the
    repo's polygon convention). The vertex floats are one shared Python
    literal source for both engines, so results are bit-identical."""
    pt = spark.createDataFrame(
        [(f"q{k}", poly) for k, poly in enumerate(_pipt_polys())],
        "qid string, verts array<array<double>>",
    )
    n = F.size("verts")
    # cross_i = x_i * y_j - x_j * y_i with j = (i + 1) mod n; verts are
    # [lat, lng] pairs -> x = v[1], y = v[0]
    cross_i = (
        "transform(sequence(0, size(verts) - 1), i -> "
        "verts[i][1] * verts[(i + 1) % size(verts)][0] "
        "- verts[(i + 1) % size(verts)][1] * verts[i][0])"
    )
    seg_len = (
        "transform(sequence(0, size(verts) - 1), i -> "
        "sqrt((verts[(i + 1) % size(verts)][1] - verts[i][1]) "
        "   * (verts[(i + 1) % size(verts)][1] - verts[i][1]) "
        "   + (verts[(i + 1) % size(verts)][0] - verts[i][0]) "
        "   * (verts[(i + 1) % size(verts)][0] - verts[i][0])))"
    )
    cx_terms = (
        "transform(sequence(0, size(verts) - 1), i -> "
        "(verts[i][1] + verts[(i + 1) % size(verts)][1]) * "
        "(verts[i][1] * verts[(i + 1) % size(verts)][0] "
        " - verts[(i + 1) % size(verts)][1] * verts[i][0]))"
    )
    cy_terms = (
        "transform(sequence(0, size(verts) - 1), i -> "
        "(verts[i][0] + verts[(i + 1) % size(verts)][0]) * "
        "(verts[i][1] * verts[(i + 1) % size(verts)][0] "
        " - verts[(i + 1) % size(verts)][1] * verts[i][0]))"
    )
    ssum = "aggregate({0}, cast(0.0 as double), (acc, t) -> acc + t)"
    s = F.expr(ssum.format(cross_i))
    return pt.select(
        "qid",
        n.cast("long").alias("n_verts"),
        F.round(F.abs(s) / 2.0, 6).alias("area"),
        F.round(F.expr(ssum.format(seg_len)), 6).alias("perimeter"),
        F.round(F.expr(ssum.format(cx_terms)) / (F.lit(3.0) * s), 6).alias("centroid_lng"),
        F.round(F.expr(ssum.format(cy_terms)) / (F.lit(3.0) * s), 6).alias("centroid_lat"),
    ).orderBy("qid")


def _polygon_metrics_sql() -> str:
    rows = []
    for k, poly in enumerate(_pipt_polys()):
        verts = ", ".join(f"[{a!r}, {b!r}]" for a, b in poly)
        rows.append(f"('q{k}', [{verts}])")
    vals = ",\n               ".join(rows)
    j = "((i % len(verts)) + 1)"  # 1-based wraparound successor of 1-based i
    cross_i = (
        f"list_transform(generate_series(1, len(verts)), i -> "
        f"verts[i][2] * verts[{j}][1] - verts[{j}][2] * verts[i][1])"
    )
    seg_len = (
        f"list_transform(generate_series(1, len(verts)), i -> "
        f"sqrt((verts[{j}][2] - verts[i][2]) * (verts[{j}][2] - verts[i][2]) "
        f"   + (verts[{j}][1] - verts[i][1]) * (verts[{j}][1] - verts[i][1])))"
    )
    cx_terms = (
        f"list_transform(generate_series(1, len(verts)), i -> "
        f"(verts[i][2] + verts[{j}][2]) * "
        f"(verts[i][2] * verts[{j}][1] - verts[{j}][2] * verts[i][1]))"
    )
    cy_terms = (
        f"list_transform(generate_series(1, len(verts)), i -> "
        f"(verts[i][1] + verts[{j}][1]) * "
        f"(verts[i][2] * verts[{j}][1] - verts[{j}][2] * verts[i][1]))"
    )
    red = "list_aggregate({0}, 'sum')"
    return f"""
        WITH pt0(qid, verts) AS (VALUES
               {vals}),
        pt AS (SELECT qid, CAST(verts AS DOUBLE[][]) AS verts FROM pt0),
        m AS (SELECT qid, len(verts) AS n_verts,
                     {red.format(cross_i)} AS s,
                     {red.format(seg_len)} AS per,
                     {red.format(cx_terms)} AS cxs,
                     {red.format(cy_terms)} AS cys
              FROM pt)
        SELECT qid, CAST(n_verts AS BIGINT) AS n_verts,
               ROUND(ABS(s) / 2.0, 6) AS area,
               ROUND(per, 6) AS perimeter,
               ROUND(cxs / (3.0 * s), 6) AS centroid_lng,
               ROUND(cys / (3.0 * s), 6) AS centroid_lat
        FROM m ORDER BY qid
    """


_KN_D = 0.75
_KN_MIN_C = 30


def q_kn_bigram_lm(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities — the n-gram smoothing
    the pre-neural LM era standardized on (and the one BPE-era data work
    still uses for contamination/perplexity screens): P(w2|w1) =
    max(c12−d,0)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/|bigram types|, d=0.75.
    The continuation counts (type counts, not token counts) are what
    distinguish KN from the add-k smoothing in doc_bigram_ppl. Everything
    is joins of AGGREGATED count tables (bigram counts, left/right type
    marginals) — one token scan, vocab-bounded intermediates. Top-20 by
    probability among bigrams seen ≥ 30 times."""
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    toks = d.select("doc_id", words_col(F.col("text")).alias("ws"))
    bi = toks.filter(F.size("ws") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> named_struct('w1', ws[i - 1], 'w2', ws[i]))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_rev"))
    n_types = c12.agg(F.count(F.lit(1)).alias("n_bi_types"))
    out = (
        c12.filter(F.col("c12") >= _KN_MIN_C)
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(n_types))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.greatest(F.col("c12") - F.lit(_KN_D), F.lit(0.0)) / F.col("c1")
                + F.lit(_KN_D)
                * F.col("n1p_fwd")
                / F.col("c1")
                * (F.col("n1p_rev") / F.col("n_bi_types")),
                6,
            ).alias("p_kn"),
        )
    )
    return out.orderBy(F.col("p_kn").desc(), "w1", "w2").limit(20)


def _kn_bigram_lm_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH toks AS (SELECT doc_id, {w} AS ws FROM documents),
        bi AS (
            SELECT b.w1, b.w2 FROM (
                SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                       i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS b
                FROM toks WHERE len(ws) >= 2)),
        c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                FROM bi GROUP BY 1, 2),
        c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                      CAST(COUNT(*) AS BIGINT) AS n1p_fwd
               FROM c12 GROUP BY 1),
        cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_rev
                 FROM c12 GROUP BY 1),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi_types FROM c12)
        SELECT b.w1, b.w2, b.c12,
               ROUND(GREATEST(b.c12 - {_KN_D}, 0.0) / c1.c1
                     + {_KN_D} * c1.n1p_fwd / c1.c1
                       * (CAST(cont.n1p_rev AS DOUBLE) / nt.n_bi_types), 6)
                   AS p_kn
        FROM c12 b JOIN c1 ON b.w1 = c1.w1 JOIN cont ON b.w2 = cont.w2
        CROSS JOIN nt
        WHERE b.c12 >= {_KN_MIN_C}
        ORDER BY p_kn DESC, b.w1, b.w2 LIMIT 20
    """


_HLL_P = 8  # 2^8 = 256 registers
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-count of event ids with 256 registers, next to
    the exact answer — the constant-memory mergeable sketch every
    distributed engine ships (vs the KMV sketch in kmv_distinct). Register
    j = h mod 256, rank = trailing-zero count of h>>8 plus 1 (bit_count on
    the isolated lowest set bit — identical integer ops both engines, md5
    the shared hash); estimator = α·m²/Σ2^-M with the linear-counting
    small-range branch. ONE partial+final agg to 256 rows, then scalar
    math; merging register maxes is exactly how this runs at 1000
    executors."""
    ev = _read(spark, sf_dir, "events").select("event_id")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    # h DIV 256 must stay in INTEGER arithmetic: a double division would
    # lose bits of the 60-bit hash past 2^53 (DuckDB's // is exact)
    hashed = ev.select(h.alias("h")).selectExpr("h % 256 AS j", "h DIV 256 AS w")
    regs = (
        hashed.withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(53)).otherwise(
                F.expr("bit_count((w & -w) - 1) + 1")
            ),
        )
        .groupBy("j")
        .agg(F.max("rho").alias("m"))
    )
    sums = regs.agg(
        F.count(F.lit(1)).alias("occ"),
        F.sum(F.round(F.pow(F.lit(2.0), -F.col("m")), 9)).alias("s_occ"),
    )
    exact = ev.agg(F.count_distinct("event_id").alias("n_exact"))
    est_raw = F.lit(_HLL_ALPHA) * F.lit(256.0 * 256.0) / (
        F.lit(256.0) - F.col("occ") + F.col("s_occ")
    )
    v = F.lit(256) - F.col("occ")
    est = F.when(
        (est_raw <= F.lit(2.5 * 256.0)) & (v > 0),
        F.lit(256.0) * F.log(F.lit(256.0) / v.cast("double")),
    ).otherwise(est_raw)
    return (
        sums.crossJoin(F.broadcast(exact))
        .select(
            "n_exact",
            v.cast("long").alias("zero_regs"),
            F.round(est, 3).alias("hll_est"),
            F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_err"
            ),
        )
    )


def _hll_distinct_sql() -> str:
    return f"""
        WITH h AS (
            SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                       AS hv
            FROM events),
        parts AS (SELECT hv % 256 AS j, hv // 256 AS w FROM h),
        regs AS (
            SELECT j, MAX(CASE WHEN w = 0 THEN 53
                               ELSE bit_count((w & -w) - 1) + 1 END) AS m
            FROM parts GROUP BY j),
        sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS occ,
                        SUM(ROUND(POWER(2.0, -m), 9)) AS s_occ
                 FROM regs),
        exact AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_exact
                  FROM events),
        est AS (
            SELECT n_exact, 256 - occ AS zero_regs,
                   CAST({_HLL_ALPHA!r} AS DOUBLE) * 65536.0
                       / (256.0 - occ + s_occ) AS raw
            FROM sums CROSS JOIN exact)
        SELECT n_exact, CAST(zero_regs AS BIGINT) AS zero_regs,
               ROUND(CASE WHEN raw <= 640.0 AND zero_regs > 0
                          THEN 256.0 * LN(256.0 / zero_regs)
                          ELSE raw END, 3) AS hll_est,
               ROUND(ABS(CASE WHEN raw <= 640.0 AND zero_regs > 0
                              THEN 256.0 * LN(256.0 / zero_regs)
                              ELSE raw END - n_exact) / n_exact, 6) AS rel_err
        FROM est
    """


# ---------------------------------------------------------------------------
# round-3 batch 2: TextRank, personalized PageRank, LPA communities,
# NB language classifier, k-means silhouette, SymSpell lookup, logistic GD
# ---------------------------------------------------------------------------


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph (adjacent-token pairs, both directions,
    weight = count) — unsupervised keyword salience that, unlike TF-IDF,
    rewards terms central to the corpus graph rather than merely frequent.
    Reuses the oracle-green pagerank iteration core (4 damped rounds, 9-dp
    per-round rounding); the graph is vocab-bounded so every iteration is
    O(vocab + vocab-pairs). Top-20 terms."""
    from raptor_service_spark.operators.cell_graph import pagerank
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    toks = d.select(words_col(F.col("text")).alias("ws")).filter(F.size("ws") >= 2)
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> named_struct('w1', ws[i - 1], 'w2', ws[i]))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    edges = (
        bi.unionByName(bi.select(F.col("w2").alias("w1"), F.col("w1").alias("w2")))
        .groupBy(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    pr = pagerank(edges, n_iters=4, damping=0.85)
    return (
        pr.select(F.col("cell").alias("term"), "pr")
        .orderBy(F.col("pr").desc(), "term")
        .limit(20)
    )


def _textrank_keywords_sql() -> str:
    from raptor_service_spark.operators.cell_graph import pagerank_sql
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    edges = f"""
        SELECT w1 AS src, w2 AS dst, CAST(COUNT(*) AS DOUBLE) AS w
        FROM (SELECT b.w1, b.w2 FROM (
                SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                       i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS b
                FROM (SELECT {w} AS ws FROM documents) WHERE len(ws) >= 2)
              UNION ALL
              SELECT b.w2, b.w1 FROM (
                SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                       i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS b
                FROM (SELECT {w} AS ws FROM documents) WHERE len(ws) >= 2))
        GROUP BY 1, 2
    """
    inner = pagerank_sql(edges, n_iters=4, damping=0.85)
    return f"""
        SELECT cell AS term, pr FROM ({inner})
        ORDER BY pr DESC, term LIMIT 20
    """


def q_ppr_scores(spark, sf_dir):
    """Personalized PageRank from the most-visited res-3 cell (random walk
    with restart): reachability-biased centrality — "where do trajectories
    that pass through the hub END UP". Seed = argmax total in-degree (tie:
    smaller cell id), computed from the same edge agg that feeds the walk
    (O(1) driver rows); 5 damped rounds, 9-dp per-round rounding. Top-20
    cells by score."""
    from raptor_service_spark.operators.cell_graph import ppr

    edges = _od_cell_edges(spark, sf_dir).withColumn(
        "w", F.col("cnt").cast("double")
    )
    seed = (
        edges.groupBy("dst")
        .agg(F.sum("cnt").alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("dst").asc())
        .limit(1)
        .collect()[0]["dst"]
    )
    return (
        ppr(edges, seed=seed, n_iters=5, damping=0.85)
        .orderBy(F.col("pr").desc(), "cell")
        .limit(20)
    )


def _ppr_scores_sql() -> str:
    from raptor_service_spark.operators.cell_graph import ppr_sql

    seed = (
        "(SELECT dst FROM e GROUP BY dst "
        "ORDER BY SUM(cnt) DESC, dst ASC LIMIT 1)"
    )
    edges = f"SELECT src, dst, cnt, CAST(cnt AS DOUBLE) AS w FROM ({_od_cell_edges_sql()})"
    inner = ppr_sql(edges, seed=seed, n_iters=5, damping=0.85)
    return f"SELECT cell, pr FROM ({inner}) ORDER BY pr DESC, cell LIMIT 20"


def q_lpa_communities(spark, sf_dir):
    """Label-propagation communities over the undirected res-3 OD graph —
    the near-linear community detector (Raghavan 2007), deterministic
    variant: most-frequent neighbor label, ties to the smallest label, 4
    synchronous rounds (the randomized original can never be
    oracle-checked). Output (cell, label, n_members)."""
    from raptor_service_spark.operators.cell_graph import lpa

    e = _undirected_cell_edges(spark, sf_dir)
    return lpa(e, n_iters=4, src="a", dst="b").orderBy("cell")


def _lpa_communities_sql() -> str:
    from raptor_service_spark.operators.cell_graph import lpa_sql

    edges = f"SELECT a AS src, b AS dst FROM ({_undirected_cell_edges_sql()})"
    return f"SELECT * FROM ({lpa_sql(edges, n_iters=4)}) ORDER BY cell"


_NB_LANGS = ["de", "en", "es", "fr", "zh"]


def q_nb_langid(spark, sf_dir):
    """Multinomial naive-Bayes language classifier trained ON the corpus
    (add-one smoothing over the shared vocabulary) and applied back to it,
    reported as a confusion matrix against the gold lang column — langs
    here share one vocabulary and differ only in term FREQUENCIES, exactly
    the regime where the frequency-profile NB beats the n-gram-presence
    heuristic in lang_id. Scale shape: one token scan → (doc, term) tf and
    (lang, term) counts; the model is a vocab×langs grid (broadcast-size);
    scoring is one equi-join on term + a per-(doc, lang) sum + an argmax
    window; per-term contributions pre-round to 9 dp (float discipline)."""
    from pyspark.sql import Window
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.explode(words_col(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cl = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    nl = cl.groupBy("lang").agg(F.sum("c").alias("n_l"))
    vocab = toks.select("term").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    prior = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("d_l"))
        .crossJoin(F.broadcast(d.agg(F.count(F.lit(1)).alias("d_tot"))))
        .select("lang", F.log(F.col("d_l") / F.col("d_tot")).alias("logprior"))
    )
    model = (
        vocab.crossJoin(F.broadcast(nl))
        .join(cl, ["lang", "term"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "lang",
            "term",
            F.log(
                (F.coalesce("c", F.lit(0)) + F.lit(1.0)) / (F.col("n_l") + F.col("v"))
            ).alias("logp"),
        )
    )
    scores = (
        tf.join(model, "term")
        .withColumn("contrib", F.round(F.col("tf") * F.col("logp"), 9))
        .groupBy("doc_id", "lang")
        .agg(F.sum("contrib").alias("s"))
        .join(prior, "lang")
        .select("doc_id", "lang", F.round(F.col("s") + F.col("logprior"), 6).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang").asc())
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )
    return (
        d.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def _nb_langid_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH toks AS (
            SELECT doc_id, lang, unnest({w}) AS term FROM documents),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks GROUP BY 1, 2),
        cl AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
               FROM toks GROUP BY 1, 2),
        nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM cl GROUP BY 1),
        vocab AS (SELECT DISTINCT term FROM toks),
        vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        prior AS (
            SELECT lang, LN(CAST(COUNT(*) AS DOUBLE)
                            / (SELECT COUNT(*) FROM documents)) AS logprior
            FROM documents GROUP BY 1),
        model AS (
            SELECT nl.lang, vocab.term,
                   LN((COALESCE(cl.c, 0) + 1.0) / (nl.n_l + vs.v)) AS logp
            FROM vocab CROSS JOIN nl CROSS JOIN vs
            LEFT JOIN cl ON cl.lang = nl.lang AND cl.term = vocab.term),
        scores AS (
            SELECT tf.doc_id, m.lang,
                   ROUND(SUM(ROUND(tf.tf * m.logp, 9)) + ANY_VALUE(p.logprior), 6)
                       AS score
            FROM tf JOIN model m ON tf.term = m.term
            JOIN prior p ON p.lang = m.lang
            GROUP BY 1, 2),
        pred AS (
            SELECT doc_id, lang AS pred_lang FROM (
                SELECT doc_id, lang, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
                FROM scores)
            WHERE rn = 1)
        SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def q_silhouette_kmeans(spark, sf_dir):
    """Simplified silhouette of the kmeans_geo model (k=8, 4 Lloyd
    rounds): per point a = distance to its own centroid, b = distance to
    the nearest OTHER centroid, s = (b−a)/max(a,b) — the standard cluster-
    quality audit, centroid-simplified so it is O(n·k) instead of O(n²).
    Points are scored against the FINAL centroids (one extra assignment
    pass). The k centroids are O(k) driver literals (the kmeans_geo
    protocol); scoring is a flat codegen projection + one agg. Per-point s
    pre-rounds to 9 dp; per-cluster mean to 6."""
    from raptor_service_spark.operators.clustering import kmeans_centroids

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(F.col("doc_id").alias("id"), lng.alias("x"), lat.alias("y"))
    cents = kmeans_centroids(pts, k=8, n_iters=4)
    pairs = F.array_sort(
        F.array(
            *[
                F.struct(
                    (
                        (F.col("x") - F.lit(cx)) * (F.col("x") - F.lit(cx))
                        + (F.col("y") - F.lit(cy)) * (F.col("y") - F.lit(cy))
                    ).alias("d2"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cx, cy in cents
            ]
        )
    )
    scored = pts.withColumn("p", pairs).select(
        F.col("p")[0]["cid"].alias("cid"),
        F.round(
            (F.sqrt(F.col("p")[1]["d2"]) - F.sqrt(F.col("p")[0]["d2"]))
            / F.greatest(F.sqrt(F.col("p")[0]["d2"]), F.sqrt(F.col("p")[1]["d2"])),
            9,
        ).alias("s"),
    )
    return (
        scored.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_points"), F.round(F.avg("s"), 6).alias("mean_sil"))
        .orderBy("cid")
    )


def _silhouette_kmeans_sql() -> str:
    from raptor_service_spark.operators.clustering import kmeans_sql

    lat, lng = _latlng_sql("doc_id")
    src = f"(SELECT doc_id AS id, {lng} AS x, {lat} AS y FROM documents)"
    inner = kmeans_sql(src, k=8, n_iters=4)
    # strip the final SELECT: reuse the CTE chain up to c4, then rescore
    body = inner[inner.index("WITH") : inner.rindex("SELECT")].rstrip()
    return f"""
        {body},
        ranked AS (
            SELECT p.id, c.cid,
                   (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy)
                       AS d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.id
                       ORDER BY (p.x - c.cx) * (p.x - c.cx)
                              + (p.y - c.cy) * (p.y - c.cy), c.cid) AS rn
            FROM p CROSS JOIN c4 c),
        sil AS (
            SELECT r1.cid,
                   ROUND((SQRT(r2.d2) - SQRT(r1.d2))
                         / GREATEST(SQRT(r1.d2), SQRT(r2.d2)), 9) AS s
            FROM (SELECT * FROM ranked WHERE rn = 1) r1
            JOIN (SELECT * FROM ranked WHERE rn = 2) r2 USING (id))
        SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points,
               ROUND(AVG(s), 6) AS mean_sil
        FROM sil GROUP BY cid ORDER BY cid
    """


def q_symspell_lookup(spark, sf_dir):
    """SymSpell-style spelling lookup: queries are document titles with
    their 3rd character deleted (deterministic corruption, derived
    identically in both engines from docs 0-49), the dictionary is every
    distinct title with its frequency; candidate pairs come from the
    DELETE-1 NEIGHBORHOOD equi-join (a string and its 1-deletes — edit
    distance ≤1 ⇒ the variant sets intersect, so the join loses nothing),
    verified with true levenshtein and resolved best-match-per-query by
    (distance, frequency DESC, title). The delete-neighborhood trick is
    what makes fuzzy lookup O(n·L) candidates instead of n×m — the lookup-
    side complement of the PassJoin similarity JOIN in fuzzy_title_pairs."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TITLE_SPARK).alias("title")
    )
    dict_t = d.groupBy("title").agg(F.count(F.lit(1)).alias("freq"))
    dels = (
        "array_distinct(concat(array({0}), "
        "transform(sequence(1, length({0})), "
        "i -> concat(substring({0}, 1, i - 1), substring({0}, i + 1, length({0}))))))"
    )
    dvar = dict_t.select(
        "title",
        "freq",
        F.explode(F.expr(dels.format("title"))).alias("v"),
    )
    q = d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat(
            F.substring("title", 1, 2),
            F.expr("substring(title, 4, length(title))"),
        ).alias("q"),
    )
    qvar = q.select(
        "doc_id", "q", F.explode(F.expr(dels.format("q"))).alias("v")
    )
    cand = qvar.join(dvar, "v").select("doc_id", "q", "title", "freq").distinct()
    hit = cand.withColumn("ed", F.levenshtein("q", "title")).filter(F.col("ed") <= 1)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("ed").asc(), F.col("freq").desc(), F.col("title").asc()
    )
    return (
        hit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "q", F.col("title").alias("match"), "ed", "freq")
        .orderBy("doc_id")
    )


def _symspell_lookup_sql() -> str:
    dels = (
        "list_distinct(list_append(list_transform(generate_series(1, length({0})), "
        "i -> substr({0}, 1, i - 1) || substr({0}, i + 1, length({0}))), {0}))"
    )
    return f"""
        WITH d AS (SELECT doc_id, {_TITLE_SQL} AS title FROM documents),
        dict_t AS (SELECT title, CAST(COUNT(*) AS BIGINT) AS freq
                   FROM d GROUP BY 1),
        dvar AS (SELECT title, freq, unnest({dels.format("title")}) AS v
                 FROM dict_t),
        q AS (SELECT doc_id,
                     substr(title, 1, 2) || substr(title, 4, length(title)) AS q
              FROM d WHERE doc_id < 50),
        qvar AS (SELECT doc_id, q, unnest({dels.format("q")}) AS v FROM q),
        cand AS (SELECT DISTINCT doc_id, q, title, freq
                 FROM qvar JOIN dvar USING (v)),
        hit AS (SELECT *, levenshtein(q, title) AS ed FROM cand
                WHERE levenshtein(q, title) <= 1)
        SELECT doc_id, q, title AS match, CAST(ed AS INTEGER) AS ed, freq
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id
                  ORDER BY ed ASC, freq DESC, title ASC) AS rn
              FROM hit)
        WHERE rn = 1 ORDER BY doc_id
    """


_LR_ETA = 0.5
_LR_ROUNDS = 5


def _logreg_feats_spark(d: DataFrame) -> DataFrame:
    from raptor_service_spark.operators.dedup import words_col

    ws = words_col(F.col("text"))
    n_tok = F.size(ws)
    stop = F.size(F.filter(ws, lambda t: (t == "the") | (t == "a")))
    return d.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        F.lit(1.0).alias("x0"),
        F.round(n_tok / F.lit(100.0), 6).alias("x1"),
        F.round(
            (F.length(F.col("text")) - n_tok + 1) / n_tok.cast("double"), 6
        ).alias("x2"),
        F.round(stop / n_tok.cast("double"), 6).alias("x3"),
    )


def q_logreg_train(spark, sf_dir):
    """Logistic regression by full-batch gradient descent, trained
    relationally: y = (lang = 'en'), features are pinned 6-dp text stats
    (token count/100, mean word length, the/a stopword ratio) + intercept;
    5 rounds of w ← w − η/n · Σ x·(σ(w·x) − y) with σ pre-rounded to 9 dp
    and weights re-rounded to 9 dp per round (the kmeans/PageRank
    cross-engine protocol: the model lives as O(1) driver literals, each
    round is ONE codegen agg over the feature table — the MLlib dataflow
    shape). Output: final weights + training accuracy at threshold 0.5."""
    d = _read(spark, sf_dir, "documents")
    feats = _logreg_feats_spark(d).localCheckpoint(eager=True)
    n = feats.count()
    wv = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_LR_ROUNDS):
        z = sum(F.col(f"x{j}") * F.lit(wv[j]) for j in range(4))
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
        g = feats.select(
            *[
                F.sum(F.round((p - F.col("y")) * F.col(f"x{j}"), 9)).alias(f"g{j}")
                for j in range(4)
            ]
        ).collect()[0]
        wv = [
            _round_half_up(wv[j] - _LR_ETA * g[f"g{j}"] / n, 9).item()
            for j in range(4)
        ]
    z = sum(F.col(f"x{j}") * F.lit(wv[j]) for j in range(4))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    acc = feats.select(
        F.round(
            F.avg(
                F.when((p > 0.5) == (F.col("y") > 0.5), F.lit(1.0)).otherwise(
                    F.lit(0.0)
                )
            ),
            6,
        ).alias("accuracy")
    ).collect()[0]["accuracy"]
    return spark.createDataFrame(
        [(wv[0], wv[1], wv[2], wv[3], float(acc))],
        "w0 double, w1 double, w2 double, w3 double, accuracy double",
    )


def _logreg_feats_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0,
               ROUND(len({w}) / 100.0, 6) AS x1,
               ROUND((length(text) - len({w}) + 1)
                     / CAST(len({w}) AS DOUBLE), 6) AS x2,
               ROUND(len(list_filter({w}, t -> t = 'the' OR t = 'a'))
                     / CAST(len({w}) AS DOUBLE), 6) AS x3
        FROM documents
    """


def _logreg_train_sql() -> str:
    dot = "w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"
    sig = f"ROUND(1.0 / (1.0 + EXP(-({dot}))), 9)"
    steps = []
    for t in range(1, _LR_ROUNDS + 1):
        gsel = ", ".join(
            f"SUM(ROUND(({sig} - f.y) * f.x{j}, 9)) AS g{j}" for j in range(4)
        )
        wsel = ", ".join(
            f"ROUND(w.w{j} - {_LR_ETA} * g.g{j} / n.n, 9) AS w{j}" for j in range(4)
        )
        steps.append(
            f"g{t} AS (SELECT {gsel} FROM feats f CROSS JOIN w{t - 1} w),\n"
            f"        w{t} AS (SELECT {wsel} FROM w{t - 1} w "
            f"CROSS JOIN g{t} g CROSS JOIN nn n)"
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH feats AS ({_logreg_feats_sql()}),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feats),
        w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
        {chain},
        acc AS (
            SELECT ROUND(AVG(CASE WHEN ({sig} > 0.5) = (f.y > 0.5)
                                  THEN 1.0 ELSE 0.0 END), 6) AS accuracy
            FROM feats f CROSS JOIN w{_LR_ROUNDS} w)
        SELECT w.w0, w.w1, w.w2, w.w3, a.accuracy
        FROM w{_LR_ROUNDS} w CROSS JOIN acc a
    """


# ---------------------------------------------------------------------------
# round-3 batch 3: Moran correlogram, Monge-Elkan ER similarity, media
# scene-cut detection over decoded pixels
# ---------------------------------------------------------------------------


def q_moran_correlogram(spark, sf_dir):
    """Spatial correlogram — Moran's I at ring-shell lags 1..3 over the
    res-5 document density surface: the RANGE of spatial autocorrelation
    (where I decays to ~E[I]), the autocorrelation analog of the
    semivariogram's range reading. One point shuffle; each lag is an
    O(occupied × shell) join over the cached cell-count table."""
    from raptor_service_spark.operators.spatial_stats import moran_correlogram

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    return moran_correlogram(
        d.withColumn("lat", lat).withColumn("lng", lng), res=5, max_lag=3
    )


def _moran_correlogram_sql() -> str:
    from raptor_service_spark.operators.spatial_stats import moran_correlogram_sql

    lat, lng = _latlng_sql("doc_id")
    return moran_correlogram_sql("documents", lat, lng, res=5, max_lag=3)


def q_monge_elkan_pairs(spark, sf_dir):
    """Monge-Elkan hybrid string similarity for entity resolution: for
    first-word-blocked title pairs, ME(a→b) = mean over a's tokens of the
    best levenshtein similarity against b's tokens (sim = 1 − d/max_len) —
    the token-order-tolerant field comparator record linkage stacks layer
    over Fellegi-Sunter agreement bits. Blocking keeps candidates to
    same-first-word pairs (the SNM posture); each pair expands to ≤3×3
    token comparisons — bounded fanout, codegen levenshtein. Symmetrized
    as max(ME(a→b), ME(b→a)); per-token bests pre-round 9 dp. Top-20
    non-identical pairs by (sim DESC, doc_a, doc_b)."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TITLE_SPARK).alias("title")
    ).filter(F.col("doc_id") < 800)
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("title").alias("ta"),
        F.substring_index("title", " ", 1).alias("blk"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("title").alias("tb"),
        F.substring_index("title", " ", 1).alias("blk"),
    )
    pairs = a.join(b, "blk").filter(
        (F.col("doc_a") < F.col("doc_b")) & (F.col("ta") != F.col("tb"))
    )
    toks = pairs.select(
        "doc_a",
        "doc_b",
        "ta",
        "tb",
        F.posexplode(F.split("ta", " ")).alias("ia", "wa"),
    ).select(
        "doc_a", "doc_b", "tb", "ia", "wa",
        F.posexplode(F.split("tb", " ")).alias("ib", "wb"),
    )
    sim = toks.withColumn(
        "s",
        F.lit(1.0)
        - F.levenshtein("wa", "wb")
        / F.greatest(F.length("wa"), F.length("wb")).cast("double"),
    )
    best_a = (
        sim.groupBy("doc_a", "doc_b", "ia")
        .agg(F.round(F.max("s"), 9).alias("best"))
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.avg("best"), 9).alias("me_ab"))
    )
    best_b = (
        sim.groupBy("doc_a", "doc_b", "ib")
        .agg(F.round(F.max("s"), 9).alias("best"))
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.avg("best"), 9).alias("me_ba"))
    )
    out = best_a.join(best_b, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        F.round(F.greatest("me_ab", "me_ba"), 6).alias("me_sim"),
    )
    return out.orderBy(F.col("me_sim").desc(), "doc_a", "doc_b").limit(20)


def _monge_elkan_pairs_sql() -> str:
    return f"""
        WITH d AS (SELECT doc_id, {_TITLE_SQL} AS title FROM documents
                   WHERE doc_id < 800),
        t AS (SELECT doc_id, title, string_split(title, ' ')[1] AS blk FROM d),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.title AS ta, b.title AS tb
            FROM t a JOIN t b ON a.blk = b.blk
            WHERE a.doc_id < b.doc_id AND a.title != b.title),
        toks AS (
            SELECT doc_a, doc_b, ua.i AS ia, ua.w AS wa, ub.i AS ib, ub.w AS wb
            FROM pairs,
                 LATERAL (SELECT unnest(generate_series(1, len(string_split(ta, ' ')))) AS i,
                                 unnest(string_split(ta, ' ')) AS w) ua,
                 LATERAL (SELECT unnest(generate_series(1, len(string_split(tb, ' ')))) AS i,
                                 unnest(string_split(tb, ' ')) AS w) ub),
        sim AS (
            SELECT doc_a, doc_b, ia, ib,
                   1.0 - levenshtein(wa, wb)
                         / CAST(GREATEST(length(wa), length(wb)) AS DOUBLE) AS s
            FROM toks),
        me_ab AS (
            SELECT doc_a, doc_b, ROUND(AVG(best), 9) AS me_ab
            FROM (SELECT doc_a, doc_b, ia, ROUND(MAX(s), 9) AS best
                  FROM sim GROUP BY 1, 2, 3) GROUP BY 1, 2),
        me_ba AS (
            SELECT doc_a, doc_b, ROUND(AVG(best), 9) AS me_ba
            FROM (SELECT doc_a, doc_b, ib, ROUND(MAX(s), 9) AS best
                  FROM sim GROUP BY 1, 2, 3) GROUP BY 1, 2)
        SELECT a.doc_a, a.doc_b, ROUND(GREATEST(a.me_ab, b.me_ba), 6) AS me_sim
        FROM me_ab a JOIN me_ba b USING (doc_a, doc_b)
        ORDER BY me_sim DESC, doc_a, doc_b LIMIT 20
    """


_SCENE_CUT_THRESH = 60.0
_SCENE_DOCS, _SCENE_SEED = 40, 71


def q_media_scene_cuts(spark, sf_dir):
    """Scene-cut detection over the interleaved media track: consecutive
    media spans of a document are treated as a frame sequence; each frame
    decodes through the REAL RTv1 RLE codec and a cut fires when the mean
    absolute pixel difference exceeds the threshold — the shot-boundary
    primitive of video curation pipelines, running on decoded pixels (the
    mad is exact integer arithmetic / 64). Frame pairing is ONE per-doc lag
    window over span positions; decode is a mapInPandas Arrow kernel.
    Oracle: the pixels are recomputed INDEPENDENTLY via the hex-chained md5
    SQL arithmetic (the media_ahash_dedup technique), so codec, pairing,
    and the cut rule are all value-checked."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans

    docs = gen_documents_df(spark, _SCENE_DOCS, seed=_SCENE_SEED)
    media = explode_spans(docs).filter(F.col("media_ref") != "").select(
        "doc_id", "idx", "media_ref"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("idx")
    pairs = (
        media.withColumn("ref_a", F.lag("media_ref").over(w))
        .filter(F.col("ref_a").isNotNull())
        .select("doc_id", "idx", "ref_a", F.col("media_ref").alias("ref_b"))
    )

    def kern(batches):
        import pandas as pd

        from raptor_service_spark.operators.tiles import (
            decode_raster,
            encode_raster,
            raster_for_ref_hex,
        )

        for pdf in batches:
            mads = []
            for ra, rb in zip(pdf["ref_a"], pdf["ref_b"]):
                pa = decode_raster(encode_raster(raster_for_ref_hex(ra))).astype(
                    "int64"
                )
                pb = decode_raster(encode_raster(raster_for_ref_hex(rb))).astype(
                    "int64"
                )
                mads.append(int(np.abs(pa - pb).sum()))
            out = pdf.copy()
            out["mad"] = [m / 64.0 for m in mads]
            yield out

    scored = pairs.mapInPandas(
        kern,
        schema="doc_id string, idx int, ref_a string, ref_b string, mad double",
    )
    return scored.select(
        "doc_id",
        F.col("idx").cast("long").alias("idx"),
        "ref_a",
        "ref_b",
        "mad",
        (F.col("mad") > _SCENE_CUT_THRESH).alias("is_cut"),
    ).orderBy("doc_id", "idx")


def _media_scene_cuts_sql() -> str:
    from raptor_service_spark.datagen import _gen_doc

    rows = []
    for i in range(_SCENE_DOCS):
        d = _gen_doc(_SCENE_SEED, i)
        for j, s in enumerate(d["spans"]):
            if s["media_ref"]:
                rows.append(f"('{d['doc_id']}', {j}, '{s['media_ref']}')")
    links = "md5(ref)"
    link_cols = []
    for k in range(4):
        link_cols.append(f"{links} AS l{k}")
        links = f"md5({links})"
    pixel = (
        "('0x' || substr(CASE i // 16 WHEN 0 THEN l0 WHEN 1 THEN l1 "
        "WHEN 2 THEN l2 ELSE l3 END, 2 * (i % 16) + 1, 2))::BIGINT // 16 * 17"
    )
    return f"""
        WITH spans(doc_id, idx, ref) AS (VALUES {', '.join(rows)}),
        pairs AS (
            SELECT doc_id, idx, ref_a, ref AS ref_b FROM (
                SELECT doc_id, idx, ref,
                       LAG(ref) OVER (PARTITION BY doc_id ORDER BY idx) AS ref_a
                FROM spans)
            WHERE ref_a IS NOT NULL),
        refs AS (SELECT DISTINCT ref FROM
                    (SELECT ref_a AS ref FROM pairs
                     UNION ALL SELECT ref_b FROM pairs)),
        links AS (SELECT ref, {', '.join(link_cols)} FROM refs),
        px AS (
            SELECT ref, u.i AS i, u.p AS p
            FROM (SELECT ref,
                         unnest(list_transform(range(0, 64), i -> struct_pack(
                             i := i, p := {pixel}))) AS u
                  FROM links)),
        mads AS (
            SELECT pr.doc_id, pr.idx, pr.ref_a, pr.ref_b,
                   SUM(ABS(pa.p - pb.p)) / 64.0 AS mad
            FROM pairs pr
            JOIN px pa ON pa.ref = pr.ref_a
            JOIN px pb ON pb.ref = pr.ref_b AND pa.i = pb.i
            GROUP BY 1, 2, 3, 4)
        SELECT doc_id, CAST(idx AS BIGINT) AS idx, ref_a, ref_b, mad,
               mad > {_SCENE_CUT_THRESH} AS is_cut
        FROM mads ORDER BY doc_id, idx
    """


# ---------------------------------------------------------------------------
# round-3 batch 4: permutation test, MaxScore pruning audit, MinHash
# sketch-accuracy audit
# ---------------------------------------------------------------------------

_PERM_B = 200


def q_permutation_test(spark, sf_dir):
    """Two-sample permutation test (Fisher randomization): is the mean
    n_chars of English docs different from the rest? Null distribution =
    200 deterministic md5-keyed permutations — per replicate b every doc
    gets key md5(doc_id·'#'·b), the n_en smallest keys form the pseudo-'en'
    arm (EXACT group sizes, a true permutation, not Bernoulli relabeling) —
    so the release replays identically everywhere (the dp_cell_counts
    seeded-mechanism discipline). p = (1 + #{|diff_b| ≥ |obs|}) / (B+1).
    Scale shape: the B-fold explode is declared O(B·n) and feeds ONE rank
    window partitioned by replicate + one agg; all means come from exact
    integer sums, so the ≥ comparisons are bit-identical cross-engine."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = d.agg(
        F.sum(F.when(F.col("lang") == "en", F.col("n_chars"))).alias("s_en"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("n_en"),
        F.sum(F.when(F.col("lang") != "en", F.col("n_chars"))).alias("s_ot"),
        F.count(F.when(F.col("lang") != "en", F.lit(1))).alias("n_ot"),
    )
    obs = base.select(
        (F.col("s_en") / F.col("n_en") - F.col("s_ot") / F.col("n_ot")).alias(
            "obs"
        ),
        "n_en",
    )
    reps = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(1), F.lit(_PERM_B))).alias("b"),
    ).withColumn(
        "k", F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("b")))
    )
    w = Window.partitionBy("b").orderBy("k", "doc_id")
    ranked = reps.withColumn("rk", F.row_number().over(w)).crossJoin(
        F.broadcast(obs)
    )
    diffs = ranked.groupBy("b").agg(
        (
            F.sum(F.when(F.col("rk") <= F.col("n_en"), F.col("n_chars")))
            / F.max("n_en")
            - F.sum(F.when(F.col("rk") > F.col("n_en"), F.col("n_chars")))
            / (F.count(F.lit(1)) - F.max("n_en"))
        ).alias("diff"),
        F.max(F.abs(F.col("obs"))).alias("abs_obs"),
    )
    return (
        diffs.agg(
            F.count(F.lit(1)).alias("n_perms"),
            F.sum(
                F.when(F.abs(F.col("diff")) >= F.col("abs_obs"), 1).otherwise(0)
            ).alias("n_extreme"),
            F.round(F.max(F.col("abs_obs")), 6).alias("abs_obs_diff"),
        )
        .select(
            "abs_obs_diff",
            "n_perms",
            F.col("n_extreme").cast("long").alias("n_extreme"),
            F.round(
                (F.lit(1) + F.col("n_extreme")) / (F.lit(_PERM_B) + F.lit(1.0)), 6
            ).alias("p_value"),
        )
    )


def _permutation_test_sql() -> str:
    return f"""
        WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
        base AS (
            SELECT SUM(CASE WHEN lang = 'en' THEN n_chars END) AS s_en,
                   COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
                   SUM(CASE WHEN lang != 'en' THEN n_chars END) AS s_ot,
                   COUNT(CASE WHEN lang != 'en' THEN 1 END) AS n_ot
            FROM d),
        obs AS (SELECT CAST(s_en AS DOUBLE) / n_en
                       - CAST(s_ot AS DOUBLE) / n_ot AS obs, n_en FROM base),
        reps AS (
            SELECT doc_id, n_chars, b.b,
                   md5(CAST(doc_id AS VARCHAR) || '#' || b.b) AS k
            FROM d CROSS JOIN (SELECT unnest(generate_series(1, {_PERM_B})) AS b) b),
        ranked AS (
            SELECT n_chars, b,
                   ROW_NUMBER() OVER (PARTITION BY b ORDER BY k, doc_id) AS rk
            FROM reps),
        diffs AS (
            SELECT r.b,
                   CAST(SUM(CASE WHEN r.rk <= o.n_en THEN r.n_chars END)
                        AS DOUBLE) / MAX(o.n_en)
                   - CAST(SUM(CASE WHEN r.rk > o.n_en THEN r.n_chars END)
                          AS DOUBLE) / (COUNT(*) - MAX(o.n_en)) AS diff,
                   MAX(ABS(o.obs)) AS abs_obs
            FROM ranked r CROSS JOIN obs o GROUP BY r.b)
        SELECT ROUND(MAX(abs_obs), 6) AS abs_obs_diff,
               CAST(COUNT(*) AS BIGINT) AS n_perms,
               CAST(SUM(CASE WHEN ABS(diff) >= abs_obs THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_extreme,
               ROUND((1 + SUM(CASE WHEN ABS(diff) >= abs_obs THEN 1 ELSE 0 END))
                     / ({_PERM_B} + 1.0), 6) AS p_value
        FROM diffs
    """


_MAXSCORE_Q = ["hash", "join", "scan", "window"]
_MS_K1, _MS_B, _MS_TOPK = 1.2, 0.75, 10


def q_maxscore_pruning(spark, sf_dir):
    """MaxScore static-pruning audit — the engine-internals statistic
    behind WAND/MaxScore DAAT retrieval: per query term the BM25 upper
    bound UB_t = max over docs; a candidate doc whose Σ UB over ITS OWN
    matching terms cannot beat θ (the exact 10th-best full score) is
    skippable without scoring. Reported: candidates, θ, skippable count +
    fraction — how much of the postings traversal the bound eliminates.
    All on aggregated (doc, term, tf) rows; per-term scores pre-round 9 dp
    (the BM25 float discipline)."""
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(words_col(F.col("text"))).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(_MAXSCORE_Q))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * F.col("tf")
                * (_MS_K1 + 1.0)
                / (
                    F.col("tf")
                    + _MS_K1
                    * (1.0 - _MS_B + _MS_B * F.col("dl") / F.col("avgdl"))
                ),
                9,
            ),
        )
    )
    full = scored.groupBy("doc_id").agg(F.round(F.sum("score"), 6).alias("s"))
    theta = full.orderBy(F.col("s").desc(), "doc_id").limit(_MS_TOPK).agg(
        F.min("s").alias("theta")
    )
    ub = scored.groupBy("term").agg(F.max("score").alias("ub"))
    per_doc_ub = (
        scored.join(F.broadcast(ub), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum("ub"), 6).alias("ub_sum"))
    )
    return (
        per_doc_ub.crossJoin(F.broadcast(theta))
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max("theta").alias("theta"),
            F.sum(
                F.when(F.col("ub_sum") < F.col("theta"), 1).otherwise(0)
            ).cast("long").alias("n_skippable"),
        )
        .select(
            "n_candidates",
            "theta",
            "n_skippable",
            F.round(F.col("n_skippable") / F.col("n_candidates"), 6).alias(
                "skip_frac"
            ),
        )
    )


def _maxscore_pruning_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    qterms = ", ".join(f"'{t}'" for t in _MAXSCORE_Q)
    return f"""
        WITH toks AS (SELECT doc_id, unnest({w}) AS term FROM documents),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
               FROM toks GROUP BY 1),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl
                  FROM dl),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks WHERE term IN ({qterms}) GROUP BY 1, 2),
        df_t AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                 FROM tf GROUP BY 1),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   ROUND(LN((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                         * tf.tf * ({_MS_K1} + 1.0)
                         / (tf.tf + {_MS_K1} * (1.0 - {_MS_B}
                            + {_MS_B} * dl.dl / s.avgdl)), 9) AS score
            FROM tf JOIN dl USING (doc_id) JOIN df_t d USING (term)
            CROSS JOIN stats s),
        full_s AS (SELECT doc_id, ROUND(SUM(score), 6) AS s
                   FROM scored GROUP BY 1),
        theta AS (SELECT MIN(s) AS theta FROM (
                      SELECT s FROM full_s ORDER BY s DESC, doc_id
                      LIMIT {_MS_TOPK})),
        ub AS (SELECT term, MAX(score) AS ub FROM scored GROUP BY 1),
        per_doc AS (SELECT sc.doc_id, ROUND(SUM(u.ub), 6) AS ub_sum
                    FROM scored sc JOIN ub u USING (term) GROUP BY 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
               MAX(t.theta) AS theta,
               CAST(SUM(CASE WHEN p.ub_sum < t.theta THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_skippable,
               ROUND(SUM(CASE WHEN p.ub_sum < t.theta THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS skip_frac
        FROM per_doc p CROSS JOIN theta t
    """


_MHA_BANDS = 8


def q_minhash_jaccard_audit(spark, sf_dir):
    """Sketch-accuracy audit for MinHash: over every band-candidate pair,
    the signature estimate (fraction of equal minhash components) next to
    the EXACT shingle Jaccard and their absolute error — the measurement
    that justifies (bands, threshold) choices before a 100 TB dedup run.
    Top-20 worst-estimated pairs. Same candidacy predicate and signature
    arithmetic as minhash_pairs; exact Jaccard via the shared distinct
    shingle stream (one gram equi-join, prefix-bounded candidates)."""
    from raptor_service_spark.operators.dedup import shingle_rows

    docs = _docs_with_dups(spark, sf_dir)
    ex = _shared_shingles3(spark, sf_dir)
    if ex is None:
        ex = shingle_rows(docs, "text", "doc_id", 3)
    aggs = []
    for g in range(_MHA_BANDS // 4):
        h = F.md5(F.concat(F.lit(f"{g}|"), F.col("g")))
        for c in range(4):
            aggs.append(
                F.min(F.substring(h, c * 8 + 1, 8)).alias(f"h{g * 4 + c}")
            )
    wide = ex.groupBy("id").agg(*aggs).localCheckpoint(eager=True)
    buckets = wide.select(
        "id",
        F.posexplode(F.array(*[f"h{b}" for b in range(_MHA_BANDS)])).alias(
            "band", "h"
        ),
    )
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    wa = wide.select(
        F.col("id").alias("doc_a"), *[F.col(f"h{b}").alias(f"a{b}") for b in range(_MHA_BANDS)]
    )
    wb = wide.select(
        F.col("id").alias("doc_b"), *[F.col(f"h{b}").alias(f"b{b}") for b in range(_MHA_BANDS)]
    )
    est = cand.join(wa, "doc_a").join(wb, "doc_b").select(
        "doc_a",
        "doc_b",
        F.round(
            sum(
                F.when(F.col(f"a{b}") == F.col(f"b{b}"), 1).otherwise(0)
                for b in range(_MHA_BANDS)
            )
            / F.lit(float(_MHA_BANDS)),
            6,
        ).alias("est_sim"),
    )
    dg = ex.dropDuplicates(["id", "g"])
    sizes = dg.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(dg.select(F.col("id").alias("doc_a"), "g"), "doc_a")
        .join(dg.select(F.col("id").alias("doc_b"), "g"), ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce("inter", F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce("inter", F.lit(0))).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    out = est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_sim",
        "jaccard",
        F.round(F.abs(F.col("est_sim") - F.col("jaccard")), 6).alias("abs_err"),
    )
    return out.orderBy(F.col("abs_err").desc(), "doc_a", "doc_b").limit(20)


def _minhash_jaccard_audit_sql() -> str:
    from raptor_service_spark.operators.dedup import (
        jaccard_sql,
        minhash_sig_sql,
        shingles_sql,
    )

    sh = shingles_sql("text", 3)
    sig = minhash_sig_sql("sh", _MHA_BANDS)
    jac = jaccard_sql("a.sh", "b.sh")
    eq = (
        f"len(list_filter(generate_series(1, {_MHA_BANDS}), "
        f"i -> a.sig[i] = b.sig[i])) / {float(_MHA_BANDS)}"
    )
    return f"""
        WITH d AS (SELECT doc_id AS id, {sh} AS sh FROM {_DOCS_WITH_DUPS_SQL}),
        s AS (SELECT id, sh, {sig} AS sig FROM d)
        SELECT a.id AS doc_a, b.id AS doc_b,
               ROUND({eq}, 6) AS est_sim,
               ROUND({jac}, 6) AS jaccard,
               ROUND(ABS(ROUND({eq}, 6) - ROUND({jac}, 6)), 6) AS abs_err
        FROM s a JOIN s b ON a.id < b.id
        WHERE list_has_any(a.sig, b.sig)
        ORDER BY abs_err DESC, doc_a, doc_b LIMIT 20
    """


# ---------------------------------------------------------------------------
# round-3 batch 5: Markov removal-effect attribution, graph eccentricity,
# l-diversity / t-closeness privacy audit
# ---------------------------------------------------------------------------

_MKV_CHANNELS = ["click", "error", "signup", "view"]
_MKV_ROUNDS = 20


def _mkv_trans_spark(spark, sf_dir) -> DataFrame:
    """(src, dst, p): first-order journey transition probabilities.
    Journeys = per-user touches (non-purchase events strictly before the
    first purchase, ordered by ts/event_id), absorbed into 'conv' if the
    user purchased else 'null'; 'start' precedes the first touch (users
    whose first event is the purchase transition start→conv directly)."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    t = ev.filter(F.col("event_type") != "purchase").join(fp, "user_id", "left")
    touches = t.filter(
        F.col("fp").isNull() | (F.struct("ts", "event_id") < F.col("fp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = touches.select(
        "user_id",
        F.col("event_type").alias("ch"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        F.lead("event_type").over(w).alias("nxt"),
    ).join(fp.select("user_id", F.lit(1).alias("has_fp")), "user_id", "left")
    starts = seq.filter(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("ch").alias("dst")
    )
    mids = seq.filter(F.col("nxt").isNotNull()).select(
        F.col("ch").alias("src"), F.col("nxt").alias("dst")
    )
    ends = seq.filter(F.col("rn") == F.col("n")).select(
        F.col("ch").alias("src"),
        F.when(F.col("has_fp") == 1, F.lit("conv")).otherwise(F.lit("null")).alias("dst"),
    )
    only_purchase = (
        fp.join(
            touches.select("user_id").distinct(), "user_id", "left_anti"
        ).select(F.lit("start").alias("src"), F.lit("conv").alias("dst"))
    )
    trans = starts.unionByName(mids).unionByName(ends).unionByName(only_purchase)
    cnt = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("src").agg(F.sum("c").alias("n"))
    return cnt.join(tot, "src").select(
        "src", "dst", (F.col("c").cast("double") / F.col("n")).alias("p")
    )


_MKV_TRANS_SQL = """
        ev AS (SELECT user_id, ts, event_id, event_type FROM events),
        fp AS (SELECT user_id, MIN(ROW(ts, event_id)) AS fp
               FROM ev WHERE event_type = 'purchase' GROUP BY 1),
        touches AS (
            SELECT e.user_id, e.ts, e.event_id, e.event_type
            FROM ev e LEFT JOIN fp USING (user_id)
            WHERE e.event_type != 'purchase'
              AND (fp.fp IS NULL OR ROW(e.ts, e.event_id) < fp.fp)),
        seq AS (
            SELECT t.user_id, t.event_type AS ch,
                   ROW_NUMBER() OVER (PARTITION BY t.user_id
                                      ORDER BY t.ts, t.event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY t.user_id) AS n,
                   LEAD(t.event_type) OVER (PARTITION BY t.user_id
                                            ORDER BY t.ts, t.event_id) AS nxt,
                   CASE WHEN fp.user_id IS NOT NULL THEN 1 END AS has_fp
            FROM touches t LEFT JOIN fp ON t.user_id = fp.user_id),
        trans_raw AS (
            SELECT 'start' AS src, ch AS dst FROM seq WHERE rn = 1
            UNION ALL
            SELECT ch, nxt FROM seq WHERE nxt IS NOT NULL
            UNION ALL
            SELECT ch, CASE WHEN has_fp = 1 THEN 'conv' ELSE 'null' END
            FROM seq WHERE rn = n
            UNION ALL
            SELECT 'start', 'conv' FROM fp
            WHERE fp.user_id NOT IN (SELECT DISTINCT user_id FROM touches)),
        cnt AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
                FROM trans_raw GROUP BY 1, 2),
        trans AS MATERIALIZED (
            SELECT cnt.src, cnt.dst, CAST(cnt.c AS DOUBLE) / tot.n AS p
            FROM cnt JOIN (SELECT src, SUM(c) AS n FROM cnt GROUP BY 1) tot
              USING (src))
"""


def q_markov_attribution(spark, sf_dir):
    """Markov removal-effect channel attribution (the data-driven
    alternative to Shapley in shapley_attribution): first-order journey
    chain over touch channels with absorbing conv/null; per channel r the
    chain is re-solved with r knocked out (transitions into r fail to
    null) and the attribution is the normalized conversion-probability
    drop. Conversion probabilities come from 20 unrolled value-iteration
    rounds (v ← b + T·v, 9-dp per round — the PageRank discipline). The
    transition matrix is O(channels²) and collected to the driver (the
    kmeans O(k)-literals protocol); journeys are built in ONE user-window
    pass."""
    rows = _mkv_trans_spark(spark, sf_dir).collect()
    p = {(r.src, r.dst): r.p for r in rows}
    states = ["start"] + _MKV_CHANNELS

    def solve(excluded: str | None) -> float:
        v = {s: 0.0 for s in states}
        for _ in range(_MKV_ROUNDS):
            nv = {}
            for s in states:
                if s == excluded:
                    continue
                acc = p.get((s, "conv"), 0.0)
                for c in _MKV_CHANNELS:
                    if c != excluded:
                        acc += p.get((s, c), 0.0) * v[c]
                nv[s] = float(_round_half_up(acc, 9))
            for s in states:
                v[s] = nv.get(s, 0.0)
        return v["start"]

    v_full = solve(None)
    out = []
    effects = {}
    for ch in _MKV_CHANNELS:
        effects[ch] = float(_round_half_up((v_full - solve(ch)) / v_full, 9))
    tot_eff = float(np.sum([effects[c] for c in _MKV_CHANNELS]))
    for ch in _MKV_CHANNELS:
        out.append(
            (
                ch,
                float(_round_half_up(effects[ch], 6)),
                float(_round_half_up(effects[ch] / tot_eff, 6)),
                float(_round_half_up(v_full, 6)),
            )
        )
    return spark.createDataFrame(
        out, "channel string, removal_effect double, attribution double, p_conv double"
    ).orderBy("channel")


def _markov_attribution_sql() -> str:
    states = ["start"] + _MKV_CHANNELS

    def chain(tag: str, excluded: str | None) -> tuple[str, str]:
        st = [s for s in states if s != excluded]
        chs = [c for c in _MKV_CHANNELS if c != excluded]
        sts = ", ".join(f"('{s}')" for s in st)
        steps = [
            f"v{tag}0(s, v) AS MATERIALIZED (SELECT s, 0.0 FROM (VALUES {sts}) st(s))"
        ]
        for t in range(1, _MKV_ROUNDS + 1):
            chl = ", ".join(f"'{c}'" for c in chs)
            steps.append(
                f"""v{tag}{t} AS MATERIALIZED (
            SELECT st.s,
                   ROUND(COALESCE(bc.p, 0.0) + COALESCE(tv.acc, 0.0), 9) AS v
            FROM (SELECT s FROM v{tag}0) st
            LEFT JOIN (SELECT src, p FROM trans WHERE dst = 'conv') bc
              ON bc.src = st.s
            LEFT JOIN (
                SELECT tr.src, SUM(tr.p * pv.v) AS acc
                FROM trans tr JOIN v{tag}{t - 1} pv ON tr.dst = pv.s
                WHERE tr.dst IN ({chl})
                GROUP BY tr.src) tv
              ON tv.src = st.s
        )"""
            )
        final = f"(SELECT v FROM v{tag}{_MKV_ROUNDS} WHERE s = 'start')"
        return ",\n        ".join(steps), final

    chains, finals = [], {}
    c_sql, f_sql = chain("f", None)
    chains.append(c_sql)
    finals["__full__"] = f_sql
    for ch in _MKV_CHANNELS:
        c_sql, f_sql = chain(ch, ch)
        chains.append(c_sql)
        finals[ch] = f_sql
    eff = ", ".join(
        f"ROUND(({finals['__full__']} - {finals[ch]}) / {finals['__full__']}, 9)"
        f" AS e_{ch}"
        for ch in _MKV_CHANNELS
    )
    rows = ", ".join(
        f"('{ch}', e_{ch})" for ch in _MKV_CHANNELS
    )
    tot = " + ".join(f"e_{ch}" for ch in _MKV_CHANNELS)
    chain_sql = ",\n        ".join(chains)
    return f"""
        WITH {_MKV_TRANS_SQL.strip()},
        {chain_sql},
        eff AS (SELECT {eff}),
        unp AS (SELECT u.channel, u.e, ({tot}) AS tot,
                       {finals['__full__']} AS vf
                FROM eff, LATERAL (VALUES {rows}) u(channel, e))
        SELECT channel, ROUND(e, 6) AS removal_effect,
               ROUND(e / tot, 6) AS attribution,
               ROUND(vf, 6) AS p_conv
        FROM unp ORDER BY channel
    """


def q_graph_eccentricity(spark, sf_dir):
    """Eccentricity sample / diameter lower bound of the occupied res-4
    cell lattice: BFS hop labeling from the 4 busiest cells (the standard
    multi-source diameter probe — exact diameter is all-pairs). Per seed:
    reached-set size and eccentricity (max hop within the 8-round cap).
    Seeds are O(1) driver rows recomputed identically as scalar subqueries
    in the oracle; each BFS round is one frontier equi-join + anti-join
    (operators/cell_graph.py:bfs_hops)."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import _adjacency, bfs_hops

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ = d.select(cell_encode_col(lat, lng, 4).alias("cell"))
    seeds = [
        r.cell
        for r in occ.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "cell")
        .limit(4)
        .collect()
    ]
    # Build the occupied lattice + adjacency ONCE (they are seed-independent)
    # and run the 4 BFS loops on concurrent driver threads — each round is a
    # small latency-bound job, so overlapping the seeds' rounds turns the
    # probe's wall cost from sum-of-seeds into ~max-of-seeds.
    occ_d = occ.distinct().localCheckpoint(eager=True)
    edges = _adjacency(occ_d, 4).localCheckpoint(eager=True)

    def _one_seed(s):
        h = bfs_hops(occ_d, s, res=4, max_hops=8, edges=edges)
        return h.agg(
            F.lit(s).alias("seed_cell"),
            F.count(F.lit(1)).alias("n_reached"),
            F.max("hops").alias("ecc"),
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(seeds)) as ex:
        outs = list(ex.map(_one_seed, sorted(seeds)))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("seed_cell")


def _graph_eccentricity_sql() -> str:
    from raptor_service_spark.operators.cell_graph import bfs_hops_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, 4)
    base = f"SELECT {cell} AS cell FROM documents"
    blocks = []
    for k in range(4):
        seed = (
            f"(SELECT cell FROM (SELECT cell, COUNT(*) AS c FROM ({base}) "
            f"GROUP BY 1 ORDER BY c DESC, cell LIMIT 1 OFFSET {k}))"
        )
        inner = bfs_hops_sql(base, seed, res=4, max_hops=8)
        blocks.append(
            f"""SELECT {seed} AS seed_cell,
                   CAST(COUNT(*) AS BIGINT) AS n_reached,
                   CAST(MAX(hops) AS BIGINT) AS ecc
            FROM ({inner})"""
        )
    union = "\n        UNION ALL\n        ".join(blocks)
    return f"SELECT * FROM ({union}) ORDER BY seed_cell"


_PRIV_MIN_K = 5


def q_ldiv_tcloseness(spark, sf_dir):
    """l-diversity + t-closeness audit of the res-4 cell quasi-identifier
    (the companions of kanon_cells' k-anonymity): per cell with k ≥ 5 docs,
    l = distinct langs (low l ⇒ attribute disclosure) and the t-closeness
    distance = total variation between the cell's lang distribution and
    the global one (categorical EMD). Top-20 riskiest cells by (l ASC,
    tvd DESC, cell). Two aggs over the (cell, lang) table + a broadcast
    join of the O(langs) global distribution; per-lang terms pre-round
    9 dp."""
    from raptor_service_spark.geo.grid import cell_encode_col

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("cell", cell_encode_col(lat, lng, 4))
    cl = pts.groupBy("cell", "lang").agg(F.count(F.lit(1)).alias("c"))
    ck = cl.groupBy("cell").agg(
        F.sum("c").alias("k"), F.count(F.lit(1)).alias("l_div")
    ).filter(F.col("k") >= _PRIV_MIN_K)
    gl = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("gc"))
        .crossJoin(F.broadcast(d.agg(F.count(F.lit(1)).alias("n"))))
        .select("lang", (F.col("gc").cast("double") / F.col("n")).alias("gp"))
    )
    # dense (cell, lang) grid so absent langs contribute |0 - gp|
    dense = (
        ck.select("cell", "k", "l_div")
        .crossJoin(F.broadcast(gl))
        .join(cl, ["cell", "lang"], "left")
        .withColumn(
            "term",
            F.round(
                F.abs(
                    F.coalesce("c", F.lit(0)).cast("double") / F.col("k")
                    - F.col("gp")
                ),
                9,
            ),
        )
    )
    out = dense.groupBy("cell", "k", "l_div").agg(
        F.round(F.lit(0.5) * F.sum("term"), 6).alias("tvd")
    )
    return out.orderBy(
        F.col("l_div").asc(), F.col("tvd").desc(), F.col("cell").asc()
    ).limit(20)


def _ldiv_tcloseness_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, 4)
    return f"""
        WITH pts AS (SELECT {cell} AS cell, lang FROM documents),
        cl AS (SELECT cell, lang, CAST(COUNT(*) AS BIGINT) AS c
               FROM pts GROUP BY 1, 2),
        ck AS (SELECT cell, CAST(SUM(c) AS BIGINT) AS k,
                      CAST(COUNT(*) AS BIGINT) AS l_div
               FROM cl GROUP BY 1 HAVING SUM(c) >= {_PRIV_MIN_K}),
        gl AS (SELECT lang, CAST(COUNT(*) AS DOUBLE)
                            / (SELECT COUNT(*) FROM documents) AS gp
               FROM documents GROUP BY 1),
        dense AS (
            SELECT ck.cell, ck.k, ck.l_div,
                   ROUND(ABS(CAST(COALESCE(cl.c, 0) AS DOUBLE) / ck.k
                             - gl.gp), 9) AS term
            FROM ck CROSS JOIN gl
            LEFT JOIN cl ON cl.cell = ck.cell AND cl.lang = gl.lang)
        SELECT cell, k, l_div, ROUND(0.5 * SUM(term), 6) AS tvd
        FROM dense GROUP BY 1, 2, 3
        ORDER BY l_div ASC, tvd DESC, cell ASC LIMIT 20
    """


# ---------------------------------------------------------------------------
# round-3 batch 6: directional semivariogram (anisotropy), cell lead-lag
# cross-correlation
# ---------------------------------------------------------------------------

_VG_TAN22 = 0.4142135623730951  # tan(22.5°) — shared literal, no trig calls


def q_semivariogram_dir(spark, sf_dir):
    """DIRECTIONAL semivariogram — the anisotropy probe kriging QA runs
    after the omnidirectional one: pair (v_i−v_j)²/2 binned by separation
    distance AND by 4 bearing sectors (E-W, NE-SW, N-S, NW-SE, 45° wide).
    Sector classification is pure sign/ratio arithmetic against the
    tan(22.5°) literal — NO atan2, so there is no libm cross-engine term
    anywhere (boundaries land in sectors 0/2 by the ≤ rule). Pairs come
    from the SHARED persisted ε-ring pair stream (`_vg_pairs` — one ring
    join feeds this and the omnidirectional bins); output is
    O(sectors×bins)."""
    pr = _vg_pairs(spark, sf_dir)
    dx = F.col("dx")
    dy = F.col("dy")
    adx, ady = F.abs(dx), F.abs(dy)
    sector = (
        F.when(ady <= adx * F.lit(_VG_TAN22), F.lit(0))
        .when(adx <= ady * F.lit(_VG_TAN22), F.lit(2))
        .when(dx * dy > 0, F.lit(1))
        .otherwise(F.lit(3))
    )
    dv = F.col("va") - F.col("vb")
    pairs = pr.select(
        sector.alias("sector"),
        F.floor(F.col("dist") / F.lit(_VG_BINW)).cast("long").alias("bin"),
        F.col("dist"),
        F.round(dv * dv, 9).alias("sq"),
    ).filter(F.col("bin") < F.lit(int(_VG_HMAX / _VG_BINW)))
    return (
        pairs.groupBy("sector", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.round(F.sum("dist"), 9) / F.count(F.lit(1)), 6).alias("avg_h"),
            F.round(
                F.round(F.sum("sq"), 9) / (F.lit(2.0) * F.count(F.lit(1))), 6
            ).alias("gamma"),
        )
        .orderBy("sector", "bin")
    )


def _semivariogram_dir_sql() -> str:
    # mirror _vg_points + brute-force pair join (oracle may be quadratic)
    lat, lng = _latlng_sql("event_id")
    pts = (
        f"SELECT event_id, value, {lat} AS lat, {lng} AS lng FROM events "
        f"WHERE event_id % {_VG_SAMPLE_MOD} = 0"
    )
    return f"""
        WITH p AS ({pts}),
        pr AS (
            SELECT a.value AS va, b.value AS vb,
                   b.lng - a.lng AS dx, b.lat - a.lat AS dy,
                   ROUND(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                              + (a.lng - b.lng) * (a.lng - b.lng)), 6) AS dist
            FROM p a JOIN p b ON a.event_id < b.event_id),
        cls AS (
            SELECT CASE
                       WHEN ABS(dy) <= ABS(dx) * {_VG_TAN22!r} THEN 0
                       WHEN ABS(dx) <= ABS(dy) * {_VG_TAN22!r} THEN 2
                       WHEN dx * dy > 0 THEN 1
                       ELSE 3 END AS sector,
                   CAST(FLOOR(dist / {_VG_BINW!r}) AS BIGINT) AS bin,
                   dist, ROUND((va - vb) * (va - vb), 9) AS sq
            FROM pr WHERE dist <= {_VG_HMAX!r})
        SELECT sector, bin, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(ROUND(SUM(dist), 9) / COUNT(*), 6) AS avg_h,
               ROUND(ROUND(SUM(sq), 9) / (2.0 * COUNT(*)), 6) AS gamma
        FROM cls WHERE bin < {int(_VG_HMAX / _VG_BINW)}
        GROUP BY 1, 2 ORDER BY 1, 2
    """


_XC_MAX_LAG = 3


def q_cell_xcorr(spark, sf_dir):
    """Lead-lag cross-correlation between the two busiest res-3 cells'
    hourly event-count series (lags −3..+3): does activity in the hub
    PRECEDE activity in the runner-up (propagation) or track it? Series
    are dense over the global hour span (missing hours = 0 — the honest
    grid; join-only overlap would bias r); Pearson r per lag from exact
    integer sums. Scale shape: one (cell, hour) agg; the dense grid and
    the 7-lag explode run on the two O(hours) aggregated series."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        cell_encode_col(lat, lng, 3).alias("cell"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000)
        ).alias("hr"),
    )
    top2 = [
        r.cell
        for r in pts.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "cell")
        .limit(2)
        .collect()
    ]
    a_cell, b_cell = sorted(top2)
    span = pts.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = span.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
    )
    cnts = (
        pts.filter(F.col("cell").isin([a_cell, b_cell]))
        .groupBy("cell", "hr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    xa = grid.join(
        cnts.filter(F.col("cell") == a_cell).select("hr", F.col("c").alias("xa")),
        "hr",
        "left",
    ).select("hr", F.coalesce("xa", F.lit(0)).alias("xa"))
    xb = grid.join(
        cnts.filter(F.col("cell") == b_cell).select("hr", F.col("c").alias("xb")),
        "hr",
        "left",
    ).select(F.col("hr").alias("hrb"), F.coalesce("xb", F.lit(0)).alias("xb"))
    lags = xa.crossJoin(
        spark.range(-_XC_MAX_LAG, _XC_MAX_LAG + 1).select(
            F.col("id").alias("lag")
        )
    )
    j = lags.join(xb, lags.hr + lags.lag == xb.hrb).select("lag", "xa", "xb")
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("syy"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "lag", F.col("n").alias("n_hours"), F.round(r, 6).alias("xcorr")
    ).orderBy("lag")


def _cell_xcorr_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH pts AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr
            FROM events),
        top2 AS (SELECT cell FROM pts GROUP BY cell
                 ORDER BY COUNT(*) DESC, cell LIMIT 2),
        ab AS (SELECT MIN(cell) AS a_cell, MAX(cell) AS b_cell FROM top2),
        span AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM pts),
        grid AS (SELECT unnest(generate_series(h0, h1)) AS hr FROM span),
        cnts AS (SELECT cell, hr, CAST(COUNT(*) AS BIGINT) AS c
                 FROM pts WHERE cell IN (SELECT cell FROM top2)
                 GROUP BY 1, 2),
        xa AS (SELECT g.hr, COALESCE(c.c, 0) AS xa
               FROM grid g LEFT JOIN cnts c
                 ON c.hr = g.hr AND c.cell = (SELECT a_cell FROM ab)),
        xb AS (SELECT g.hr AS hrb, COALESCE(c.c, 0) AS xb
               FROM grid g LEFT JOIN cnts c
                 ON c.hr = g.hr AND c.cell = (SELECT b_cell FROM ab)),
        j AS (SELECT l.lag, xa.xa, xb.xb
              FROM xa CROSS JOIN (SELECT unnest(generate_series(
                       -{_XC_MAX_LAG}, {_XC_MAX_LAG})) AS lag) l
              JOIN xb ON xa.hr + l.lag = xb.hrb),
        s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(xa) AS sx, SUM(xb) AS sy,
                     SUM(xa * xa) AS sxx, SUM(xb * xb) AS syy,
                     SUM(xa * xb) AS sxy
              FROM j GROUP BY 1)
        SELECT lag, n AS n_hours,
               ROUND((n * sxy - sx * sy)
                     / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS xcorr
        FROM s ORDER BY lag
    """


# ---------------------------------------------------------------------------
# round-3 batch 7: sequence alignment (NW global + SW local), JL random-
# projection distance-preservation audit
# ---------------------------------------------------------------------------

_ALIGN_L = 12
_ALIGN_DOCS = 30


def q_align_titles(spark, sf_dir):
    """Needleman-Wunsch (global) + Smith-Waterman (local) alignment scores
    between document title prefixes — the DP family member edit-distance
    joins can't express (SW finds the best-matching SUBSTRING pair;
    match=2 / mismatch=−1 / gap=−1). The L×L DP unrolls anti-diagonal by
    anti-diagonal into flat INTEGER codegen Projects (operators/align.py —
    the dtw_levels technique), so both engines agree exactly with no float
    protocol. Operands pad to L=12 with side-distinct sentinels ('~' vs
    '^') so pad positions never match. All-pairs over 30 titles (bounded
    cohort, the dtw_pairs posture); top-20 by (sw DESC, nw DESC, a, b)."""
    from raptor_service_spark.operators.align import align_levels, sw_max_expr

    d = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _ALIGN_DOCS)
        .select(
            "doc_id",
            F.rpad(F.substring(F.expr(_TITLE_SPARK), 1, _ALIGN_L), _ALIGN_L, "~").alias("sa"),
            F.rpad(F.substring(F.expr(_TITLE_SPARK), 1, _ALIGN_L), _ALIGN_L, "^").alias("sb"),
        )
    )
    a = d.select(F.col("doc_id").alias("doc_a"), "sa")
    b = d.select(F.col("doc_id").alias("doc_b"), "sb")
    out = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    a_ch = lambda i: f"substring(sa, {i + 1}, 1)"
    b_ch = lambda j: f"substring(sb, {j + 1}, 1)"
    for level in align_levels(_ALIGN_L, a_ch, b_ch):
        out = out.withColumns({name: F.expr(e) for name, e in level})
    return (
        out.select(
            "doc_a",
            "doc_b",
            F.col(f"nw_{_ALIGN_L - 1}_{_ALIGN_L - 1}").cast("long").alias("nw"),
            F.expr(sw_max_expr(_ALIGN_L)).cast("long").alias("sw"),
        )
        .orderBy(F.col("sw").desc(), F.col("nw").desc(), "doc_a", "doc_b")
        .limit(20)
    )


def _align_titles_sql() -> str:
    from raptor_service_spark.operators.align import align_levels, sw_max_expr

    a_ch = lambda i: f"substring(sa, {i + 1}, 1)"
    b_ch = lambda j: f"substring(sb, {j + 1}, 1)"
    levels = align_levels(_ALIGN_L, a_ch, b_ch)
    ctes, prev = [], "pairs"
    for k, level in enumerate(levels):
        cols = ", ".join(f"{e} AS {name}" for name, e in level)
        ctes.append(f"l{k} AS (SELECT *, {cols} FROM {prev})")
        prev = f"l{k}"
    chain = ",\n        ".join(ctes)
    return f"""
        WITH d AS (
            SELECT doc_id,
                   rpad(substring({_TITLE_SQL}, 1, {_ALIGN_L}), {_ALIGN_L}, '~') AS sa,
                   rpad(substring({_TITLE_SQL}, 1, {_ALIGN_L}), {_ALIGN_L}, '^') AS sb
            FROM documents WHERE doc_id < {_ALIGN_DOCS}),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sa, b.sb
            FROM d a JOIN d b ON a.doc_id < b.doc_id),
        {chain}
        SELECT doc_a, doc_b,
               CAST(nw_{_ALIGN_L - 1}_{_ALIGN_L - 1} AS BIGINT) AS nw,
               CAST({sw_max_expr(_ALIGN_L)} AS BIGINT) AS sw
        FROM {prev}
        ORDER BY sw DESC, nw DESC, doc_a, doc_b LIMIT 20
    """


_JL_K = 16
_JL_DIM = 64
_JL_VECS = 20


def _jl_signs(k: int) -> list[int]:
    """Column k of the deterministic ±1 projection matrix: sign =
    md5('d|k') hex-prefix parity — one Python source feeds both engines'
    literals."""
    import hashlib

    return [
        1 if int(hashlib.md5(f"{d}|{k}".encode()).hexdigest()[:4], 16) % 2 == 0 else -1
        for d in range(_JL_DIM)
    ]


def q_jl_projection_audit(spark, sf_dir):
    """Johnson-Lindenstrauss random-projection audit: embeddings project
    64→16 dims through a deterministic ±1/√16 sign matrix (sign =
    md5(d·'|'·k) parity — the same seeded-mechanism discipline as
    dp_cell_counts), and the audit reports, per sampled pair, the squared-
    distance ratio ‖p(x)−p(y)‖²/‖x−y‖² — the measured distortion that
    justifies projection-first ANN prefilters. One posexplode + (dim×k)
    agg builds projections; distances are array-side codegen. Top-20 most
    distorted pairs of the 190-pair sample."""
    e = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _JL_VECS)
        .select("vec_id", "embedding")
    )
    # The ±1 sign matrix is a CONSTANT — built once in Python (md5 parity)
    # and inlined as array literals, so each projection is an ORDERED
    # array-side fold in both engines (a groupBy SUM reassociates floats:
    # observed 1-ulp knife edge on the 9-dp rounded projection).
    full = e.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("fv")
    )
    proj_cols = []
    for k in range(_JL_K):
        signs = "array(" + ", ".join(
            f"cast({s} as double)" for s in _jl_signs(k)
        ) + ")"
        proj_cols.append(
            f"round(aggregate(zip_with(fv, {signs}, "
            f"(x, s) -> round(x * s, 9)), cast(0.0 as double), "
            f"(acc, t) -> acc + t) / 4.0, 9)"
        )
    t = full.withColumn("pv", F.expr("array(" + ", ".join(proj_cols) + ")"))
    a = t.select(F.col("vec_id").alias("vec_a"), F.col("fv").alias("fa"), F.col("pv").alias("pa"))
    b = t.select(F.col("vec_id").alias("vec_b"), F.col("fv").alias("fb"), F.col("pv").alias("pb"))
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    # display via TRUNCATION (floor of the scaled double): the fold gives
    # bit-identical doubles in both engines, and floor of the same double
    # is deterministic — ROUND is not on exact 9-dp knife edges (F.round
    # is BigDecimal shortest-decimal HALF_UP, DuckDB rounds the binary
    # value; the 9-dp projection grid makes exact .5 boundaries COMMON)
    d2 = (
        "floor(aggregate(zip_with({0}, {1}, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, t) -> acc + t) * 1e9) / 1e9"
    )
    out = pairs.select(
        "vec_a",
        "vec_b",
        F.expr(d2.format("fa", "fb")).alias("d64"),
        F.expr(d2.format("pa", "pb")).alias("d16"),
    ).select(
        "vec_a",
        "vec_b",
        "d64",
        "d16",
        (F.floor(F.col("d16") / F.col("d64") * 1e6) / 1e6).alias("ratio"),
    )
    return out.orderBy(
        F.abs(F.col("ratio") - 1.0).desc(), "vec_a", "vec_b"
    ).limit(20)


def _jl_projection_audit_sql() -> str:
    # list_reduce = guaranteed left-to-right fold, mirroring Spark's
    # aggregate() element order (unordered sums reassociate floats —
    # observed 1-ulp divergence on the 9-dp rounded projection)
    d2 = (
        "FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(generate_series(1, len({0})), "
        "i -> ({0}[i] - {1}[i]) * ({0}[i] - {1}[i]))), (acc, t) -> acc + t)"
        " * 1e9) / 1e9"
    )
    proj_cols = []
    for k in range(_JL_K):
        signs = "[" + ", ".join(
            f"CAST({s} AS DOUBLE)" for s in _jl_signs(k)
        ) + "]"
        proj_cols.append(
            f"ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, len(fv)), "
            f"i -> ROUND(fv[i] * ({signs})[i], 9))), "
            f"(acc, t) -> acc + t) / 4.0, 9)"
        )
    pv = "[" + ", ".join(proj_cols) + "]"
    return f"""
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fv
            FROM embeddings WHERE vec_id < {_JL_VECS}),
        t AS (SELECT vec_id, fv, {pv} AS pv FROM e),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   a.fv AS fa, b.fv AS fb, a.pv AS pa, b.pv AS pb
            FROM t a JOIN t b ON a.vec_id < b.vec_id),
        m AS (
            SELECT vec_a, vec_b,
                   ROUND({d2.format("fa", "fb")}, 9) AS d64,
                   ROUND({d2.format("pa", "pb")}, 9) AS d16
            FROM pairs)
        SELECT vec_a, vec_b, d64, d16,
               FLOOR(d16 / d64 * 1e6) / 1e6 AS ratio
        FROM m ORDER BY ABS(FLOOR(d16 / d64 * 1e6) / 1e6 - 1.0) DESC,
                 vec_a, vec_b
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# round-3 batch 8: spherical centroid (circular statistics), mobility
# entropy rate (predictability)
# ---------------------------------------------------------------------------


def q_spherical_centroid(spark, sf_dir):
    """Spherical mean + resultant length per res-2 tile — the CORRECT
    centroid on a sphere (arithmetic lat/lng means break across the
    antimeridian; the 3D unit-vector mean doesn't): R̄ near 1 = tight
    cluster, near 0 = dispersed (circular-statistics concentration).
    One point agg to (cells × 3 sums); per-point vector terms pre-round
    9 dp, outputs 6 dp (the crosstrack trig discipline). Ordered by
    cell."""
    from raptor_service_spark.geo.grid import cell_encode_col

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    rl, rg = F.radians(lat), F.radians(lng)
    pts = d.select(
        cell_encode_col(lat, lng, 2).alias("cell"),
        F.round(F.cos(rl) * F.cos(rg), 9).alias("ux"),
        F.round(F.cos(rl) * F.sin(rg), 9).alias("uy"),
        F.round(F.sin(rl), 9).alias("uz"),
    )
    s = pts.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("ux").alias("mx"),
        F.avg("uy").alias("my"),
        F.avg("uz").alias("mz"),
    )
    rbar = F.sqrt(
        F.col("mx") * F.col("mx") + F.col("my") * F.col("my") + F.col("mz") * F.col("mz")
    )
    return s.select(
        "cell",
        "n_docs",
        F.round(
            F.degrees(F.atan2(F.col("mz"), F.sqrt(F.col("mx") * F.col("mx") + F.col("my") * F.col("my")))),
            6,
        ).alias("clat"),
        F.round(F.degrees(F.atan2(F.col("my"), F.col("mx"))), 6).alias("clng"),
        F.round(rbar, 6).alias("rbar"),
    ).orderBy("cell")


def _spherical_centroid_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    return f"""
        WITH pts AS (
            SELECT {cell_encode_sql(lat, lng, 2)} AS cell,
                   ROUND(COS(RADIANS({lat})) * COS(RADIANS({lng})), 9) AS ux,
                   ROUND(COS(RADIANS({lat})) * SIN(RADIANS({lng})), 9) AS uy,
                   ROUND(SIN(RADIANS({lat})), 9) AS uz
            FROM documents),
        s AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     AVG(ux) AS mx, AVG(uy) AS my, AVG(uz) AS mz
              FROM pts GROUP BY 1)
        SELECT cell, n_docs,
               ROUND(DEGREES(ATAN2(mz, SQRT(mx * mx + my * my))), 6) AS clat,
               ROUND(DEGREES(ATAN2(my, mx)), 6) AS clng,
               ROUND(SQRT(mx * mx + my * my + mz * mz), 6) AS rbar
        FROM s ORDER BY cell
    """


_ENT_MIN_MOVES = 20


def q_mobility_entropy_rate(spark, sf_dir):
    """Per-user mobility predictability: the plug-in entropy RATE of the
    first-order cell-transition chain, −Σ_ij (c_ij/total)·ln(c_ij/total_i)
    (Song et al.'s predictability-bound ingredient) — low rate = routine
    mover, high = erratic. Users with ≥ 20 transitions; the 20 most
    predictable. Everything runs on the aggregated per-user transition
    counts (exact integer divisions; 9-dp term pre-rounds)."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 4))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        pts.withColumn("prev", F.lag("cell").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy("user_id", F.col("prev").alias("src"), F.col("cell").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row_tot = tr.groupBy("user_id", "src").agg(F.sum("c").alias("tot_i"))
    usr_tot = tr.groupBy("user_id").agg(F.sum("c").alias("tot"))
    terms = (
        tr.join(row_tot, ["user_id", "src"])
        .join(usr_tot, "user_id")
        .withColumn(
            "t",
            F.round(
                -(F.col("c") / F.col("tot"))
                * F.log(F.col("c") / F.col("tot_i")),
                9,
            ),
        )
    )
    out = (
        terms.groupBy("user_id")
        .agg(
            F.max("tot").alias("n_moves"),
            F.round(F.sum("t"), 6).alias("entropy_rate"),
        )
        .filter(F.col("n_moves") >= _ENT_MIN_MOVES)
    )
    return out.orderBy(F.col("entropy_rate").asc(), "user_id").limit(20)


def _mobility_entropy_rate_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 4)
    return f"""
        WITH pts AS (
            SELECT user_id, ts, event_id, {cell} AS cell FROM events),
        tr AS (
            SELECT user_id, prev AS src, cell AS dst,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT user_id, cell,
                         LAG(cell) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
                  FROM pts)
            WHERE prev IS NOT NULL GROUP BY 1, 2, 3),
        row_tot AS (SELECT user_id, src, CAST(SUM(c) AS BIGINT) AS tot_i
                    FROM tr GROUP BY 1, 2),
        usr_tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS tot
                    FROM tr GROUP BY 1),
        terms AS (
            SELECT tr.user_id, u.tot,
                   ROUND(-(CAST(tr.c AS DOUBLE) / u.tot)
                         * LN(CAST(tr.c AS DOUBLE) / r.tot_i), 9) AS t
            FROM tr JOIN row_tot r USING (user_id, src)
            JOIN usr_tot u USING (user_id))
        SELECT user_id, CAST(MAX(tot) AS BIGINT) AS n_moves,
               ROUND(SUM(t), 6) AS entropy_rate
        FROM terms GROUP BY user_id
        HAVING MAX(tot) >= {_ENT_MIN_MOVES}
        ORDER BY entropy_rate ASC, user_id LIMIT 20
    """


# ---------------------------------------------------------------------------
# round-3 batch 9: term burstiness (Church-Gale), colocation participation
# index (Shekhar)
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 50


def q_term_burstiness(spark, sf_dir):
    """Term burstiness (Church & Gale): mean occurrences per CONTAINING
    document (cf/df) against the Poisson expectation λ/(1−e^−λ) — terms
    whose ratio is far above 1 clump into few documents (content words);
    ratio ≈ 1 means Poisson scatter (function words). The
    corpus-linguistics screen a curation pipeline uses to find template
    artifacts. Two aggs over the token stream; the Poisson term is scalar
    math on aggregated counts. Top-20 by ratio among df ≥ 50 terms."""
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(words_col(F.col("text"))).alias("term"))
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"), F.count_distinct("doc_id").alias("df")
    )
    n = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs")))
    lam = F.col("cf") / F.col("n_docs")
    poisson_mean = lam / (F.lit(1.0) - F.exp(-lam))
    out = (
        stats.filter(F.col("df") >= _BURST_MIN_DF)
        .crossJoin(n)
        .select(
            "term",
            "cf",
            "df",
            F.round(F.col("cf") / F.col("df"), 6).alias("burstiness"),
            F.round((F.col("cf") / F.col("df")) / poisson_mean, 6).alias(
                "poisson_ratio"
            ),
        )
    )
    return out.orderBy(F.col("poisson_ratio").desc(), "term").limit(20)


def _term_burstiness_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH toks AS (SELECT doc_id, unnest({w}) AS term FROM documents),
        stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf,
                         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                  FROM toks GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        SELECT term, cf, df,
               ROUND(CAST(cf AS DOUBLE) / df, 6) AS burstiness,
               ROUND((CAST(cf AS DOUBLE) / df)
                     / ((CAST(cf AS DOUBLE) / n_docs)
                        / (1.0 - EXP(-(CAST(cf AS DOUBLE) / n_docs)))), 6)
                   AS poisson_ratio
        FROM stats CROSS JOIN n
        WHERE df >= {_BURST_MIN_DF}
        ORDER BY poisson_ratio DESC, term LIMIT 20
    """


_COLOC_EPS = 10.0


def q_participation_index(spark, sf_dir):
    """Colocation participation index (Shekhar & Huang): for every lang
    pair, the fraction of each side's docs having an ε-neighbor of the
    other lang; PI = min of the two fractions — the standard colocation-
    pattern-mining interest measure (vs the ratio-based colocation
    quotient already covered). Neighbor pairs come from the one-shuffle
    ε cell/ring join; everything after runs on (docs × langs)-bounded
    distinct pairs. Exact count ratios — no float hazard."""
    from raptor_service_spark.operators.pip_join import within_distance_join

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng)
    pr = within_distance_join(pts, pts, eps=_COLOC_EPS).filter(
        F.col("l.doc_id") != F.col("r.doc_id")
    )
    nbr = pr.select(
        F.col("l.doc_id").alias("a"),
        F.col("l.lang").alias("la"),
        F.col("r.lang").alias("lb"),
    ).distinct()
    tot = d.groupBy(F.col("lang").alias("la")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    part = nbr.groupBy("la", "lb").agg(F.count_distinct("a").alias("n_part"))
    pr_tbl = part.join(tot, "la").select(
        "la", "lb", "n_part", "n_a",
        F.round(F.col("n_part") / F.col("n_a"), 6).alias("pr_ab"),
    )
    rev = pr_tbl.select(
        F.col("lb").alias("la"), F.col("la").alias("lb"),
        F.col("pr_ab").alias("pr_ba"),
    )
    out = (
        pr_tbl.join(rev, ["la", "lb"])
        .filter(F.col("la") < F.col("lb"))
        .select(
            F.col("la").alias("lang_a"),
            F.col("lb").alias("lang_b"),
            "pr_ab",
            "pr_ba",
            F.least("pr_ab", "pr_ba").alias("pi"),
        )
    )
    return out.orderBy("lang_a", "lang_b")


def _participation_index_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    return f"""
        WITH p AS (SELECT doc_id, lang, {lat} AS lat, {lng} AS lng
                   FROM documents),
        nbr AS (
            SELECT DISTINCT a.doc_id AS a, a.lang AS la, b.lang AS lb
            FROM p a JOIN p b
              ON a.doc_id != b.doc_id
             AND ROUND(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                            + (a.lng - b.lng) * (a.lng - b.lng)), 6)
                 <= {_COLOC_EPS!r}),
        tot AS (SELECT lang AS la, CAST(COUNT(*) AS BIGINT) AS n_a
                FROM documents GROUP BY 1),
        part AS (SELECT la, lb, CAST(COUNT(DISTINCT a) AS BIGINT) AS n_part
                 FROM nbr GROUP BY 1, 2),
        pr_tbl AS (
            SELECT part.la, part.lb, part.n_part, tot.n_a,
                   ROUND(CAST(part.n_part AS DOUBLE) / tot.n_a, 6) AS pr_ab
            FROM part JOIN tot USING (la))
        SELECT p1.la AS lang_a, p1.lb AS lang_b, p1.pr_ab,
               p2.pr_ab AS pr_ba, LEAST(p1.pr_ab, p2.pr_ab) AS pi
        FROM pr_tbl p1 JOIN pr_tbl p2 ON p1.la = p2.lb AND p1.lb = p2.la
        WHERE p1.la < p1.lb
        ORDER BY lang_a, lang_b
    """


# ---------------------------------------------------------------------------
# round-3 batch 10: greedy set cover (coverage-max selection), segregation
# indices, ε-percolation curve
# ---------------------------------------------------------------------------

_SC_ROUNDS, _SC_POOL = 5, 100


def q_greedy_set_cover(spark, sf_dir):
    """Greedy maximum-coverage selection (the 1−1/e-approximate classic):
    pick 5 documents that together cover the most distinct vocabulary —
    the coverage-maximizing subset selection used for summary/eval-set
    picking in curation. Each round is ONE anti-join + agg over the
    aggregated (doc, term) table, argmax collected to the driver (O(1)
    rows, the kmeans-literals protocol), ties to the smaller doc_id.
    Output (round, doc_id, gain, covered_total)."""
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < _SC_POOL)
    terms = (
        d.select("doc_id", F.explode(words_col(F.col("text"))).alias("term"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = None
    rows, total = [], 0
    for rnd in range(1, _SC_ROUNDS + 1):
        cand = terms if covered is None else terms.join(covered, "term", "left_anti")
        top = (
            cand.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pick, gain = top[0]["doc_id"], top[0]["gain"]
        total += gain
        rows.append((rnd, int(pick), int(gain), int(total)))
        sel_terms = terms.filter(F.col("doc_id") == pick).select("term")
        covered = (
            sel_terms
            if covered is None
            else covered.unionByName(sel_terms).distinct()
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rows, "round int, doc_id long, gain long, covered_total long"
    ).orderBy("round")


def _greedy_set_cover_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    steps = [
        "c0(term) AS MATERIALIZED (SELECT term FROM terms WHERE 1 = 0)"
    ]
    picks = []
    for r in range(1, _SC_ROUNDS + 1):
        steps.append(
            f"""p{r} AS MATERIALIZED (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
            FROM terms t WHERE NOT EXISTS (
                SELECT 1 FROM c{r - 1} c WHERE c.term = t.term)
            GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1
        ),
        c{r} AS MATERIALIZED (
            SELECT term FROM c{r - 1}
            UNION
            SELECT term FROM terms WHERE doc_id = (SELECT doc_id FROM p{r})
        )"""
        )
        picks.append(
            f"SELECT {r} AS round, doc_id, gain FROM p{r}"
        )
    chain = ",\n        ".join(steps)
    un = "\n            UNION ALL\n            ".join(picks)
    return f"""
        WITH terms AS MATERIALIZED (
            SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id, unnest({w}) AS term
                FROM documents WHERE doc_id < {_SC_POOL})),
        {chain},
        sel AS ({un})
        SELECT CAST(round AS INTEGER) AS round, doc_id, gain,
               CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT)
                   AS covered_total
        FROM sel ORDER BY round
    """


def q_segregation_indices(spark, sf_dir):
    """Duncan & Duncan segregation profile per language over res-3 tiles:
    dissimilarity D = ½Σ|l_i/L − o_i/O| (share of the group that would
    have to move for an even spread), isolation P* = Σ(l_i/L)(l_i/t_i),
    exposure = Σ(l_i/L)(o_i/t_i) — the spatial-demography classics, here
    as corpus-mixing diagnostics. One (cell, lang) agg; all ratios exact
    integer divisions, 9-dp term pre-rounds."""
    from raptor_service_spark.geo.grid import cell_encode_col

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("cell", cell_encode_col(lat, lng, 3))
    cl = pts.groupBy("cell", "lang").agg(F.count(F.lit(1)).alias("c"))
    ct = cl.groupBy("cell").agg(F.sum("c").alias("t"))
    langs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("l_tot"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        ct.crossJoin(F.broadcast(langs))
        .join(cl, ["cell", "lang"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "l_tot",
            F.coalesce("c", F.lit(0)).alias("l_i"),
            (F.col("t") - F.coalesce("c", F.lit(0))).alias("o_i"),
            "t",
            (F.col("n") - F.col("l_tot")).alias("o_tot"),
        )
    )
    out = grid.groupBy("lang", "l_tot").agg(
        F.round(
            F.lit(0.5)
            * F.sum(
                F.round(
                    F.abs(
                        F.col("l_i") / F.col("l_tot")
                        - F.col("o_i") / F.col("o_tot")
                    ),
                    9,
                )
            ),
            6,
        ).alias("dissimilarity"),
        F.round(
            F.sum(
                F.round(
                    (F.col("l_i") / F.col("l_tot")) * (F.col("l_i") / F.col("t")), 9
                )
            ),
            6,
        ).alias("isolation"),
        F.round(
            F.sum(
                F.round(
                    (F.col("l_i") / F.col("l_tot")) * (F.col("o_i") / F.col("t")), 9
                )
            ),
            6,
        ).alias("exposure"),
    )
    return out.select(
        "lang", F.col("l_tot").alias("n_docs"), "dissimilarity", "isolation", "exposure"
    ).orderBy("lang")


def _segregation_indices_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH pts AS (SELECT {cell} AS cell, lang FROM documents),
        cl AS (SELECT cell, lang, CAST(COUNT(*) AS BIGINT) AS c
               FROM pts GROUP BY 1, 2),
        ct AS (SELECT cell, CAST(SUM(c) AS BIGINT) AS t FROM cl GROUP BY 1),
        langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS l_tot
                  FROM documents GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        grid AS (
            SELECT langs.lang, langs.l_tot,
                   COALESCE(cl.c, 0) AS l_i,
                   ct.t - COALESCE(cl.c, 0) AS o_i,
                   ct.t, tot.n - langs.l_tot AS o_tot
            FROM ct CROSS JOIN langs CROSS JOIN tot
            LEFT JOIN cl ON cl.cell = ct.cell AND cl.lang = langs.lang)
        SELECT lang, l_tot AS n_docs,
               ROUND(0.5 * SUM(ROUND(ABS(CAST(l_i AS DOUBLE) / l_tot
                                         - CAST(o_i AS DOUBLE) / o_tot), 9)),
                     6) AS dissimilarity,
               ROUND(SUM(ROUND((CAST(l_i AS DOUBLE) / l_tot)
                               * (CAST(l_i AS DOUBLE) / t), 9)), 6)
                   AS isolation,
               ROUND(SUM(ROUND((CAST(l_i AS DOUBLE) / l_tot)
                               * (CAST(o_i AS DOUBLE) / t), 9)), 6)
                   AS exposure
        FROM grid GROUP BY 1, 2 ORDER BY lang
    """


_PERC_EPS = [6.0, 10.0, 14.0]
_PERC_POOL = 3000


def q_percolation_curve(spark, sf_dir):
    """ε-percolation curve of the document point set: at each radius, the
    number of connected components of the ε-graph and the giant-component
    fraction — WHERE the corpus's spatial graph snaps together (the
    threshold picker for geo_clusters/geo_dbscan radii). Per ε: one
    cell/ring ε-join (each pair once) + the large/small-star components
    loop; everything else is O(nodes). Bounded doc pool (the dtw cohort
    posture)."""
    from raptor_service_spark.operators.dedup import dedup_components
    from raptor_service_spark.operators.pip_join import within_distance_join

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < _PERC_POOL).select(
        "doc_id"
    )
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.withColumn("lat", lat).withColumn("lng", lng).localCheckpoint(eager=True)
    n_nodes = pts.count()
    # ONE ε-join at the largest radius; smaller radii are dist-filters of
    # it (within_distance_join keeps the rounded dist and its ring cover
    # at eps_max is a superset of every smaller ε's) — 3 joins → 1.
    all_pairs = (
        within_distance_join(pts, pts, eps=max(_PERC_EPS))
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            "dist",
        )
        .localCheckpoint(eager=True)
    )
    # The three ε component loops are independent driver-stepped iterations
    # (each star round is a small job + eager checkpoint — latency-bound,
    # not throughput-bound at this pool size), so run them on concurrent
    # driver threads: the Spark scheduler interleaves their jobs and the
    # wall cost becomes ~max instead of sum. On a real cluster the same
    # overlap hides per-round scheduling latency across executors.
    def _one_eps(eps):
        pairs = all_pairs.filter(F.col("dist") <= eps).select("doc_a", "doc_b")
        comp = dedup_components(pairs)
        full = pts.select(F.col("doc_id").alias("id")).join(
            comp, "id", "left"
        ).select(F.coalesce("comp", "id").alias("comp"))
        sizes = full.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
        return sizes.agg(
            F.lit(eps).alias("eps"),
            F.lit(n_nodes).cast("long").alias("n_nodes"),
            F.count(F.lit(1)).alias("n_components"),
            F.round(F.max("sz") / F.lit(float(n_nodes)), 6).alias("giant_frac"),
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_PERC_EPS)) as ex:
        outs = list(ex.map(_one_eps, _PERC_EPS))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("eps")


def _percolation_curve_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    blocks = []
    for eps in _PERC_EPS:
        blocks.append(
            f"""
        SELECT CAST({eps!r} AS DOUBLE) AS eps,
               (SELECT COUNT(*) FROM p) AS n_nodes,
               CAST(COUNT(*) AS BIGINT) AS n_components,
               ROUND(MAX(sz) / CAST((SELECT COUNT(*) FROM p) AS DOUBLE), 6)
                   AS giant_frac
        FROM (
            WITH RECURSIVE pr AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM p a JOIN p b ON a.doc_id < b.doc_id
                WHERE ROUND(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                                 + (a.lng - b.lng) * (a.lng - b.lng)), 6)
                      <= {eps!r}),
            edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
                      UNION SELECT doc_b, doc_a FROM pr),
            reach(id, r) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, reach.r FROM edges e
                JOIN reach ON e.dst = reach.id),
            comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
            lab AS (SELECT p.doc_id, COALESCE(c.comp, p.doc_id) AS comp
                    FROM p LEFT JOIN comp c ON p.doc_id = c.id)
            SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz
            FROM lab GROUP BY comp)"""
        )
    union = "\n        UNION ALL\n        ".join(blocks)
    return f"""
        WITH p AS (SELECT doc_id, {lat} AS lat, {lng} AS lng
                   FROM documents WHERE doc_id < {_PERC_POOL})
        SELECT * FROM ({union}) ORDER BY eps
    """


# ---------------------------------------------------------------------------
# round-3 batch 11: STL-lite seasonal decomposition, binary-segmentation
# change point, deterministic RANSAC line fit
# ---------------------------------------------------------------------------


def q_stl_lite(spark, sf_dir):
    """Seasonal-trend decomposition (moving-average STL-lite) of the
    global hourly event series: trend = centered 25-hour MA (only where
    the full window exists), seasonal profile = per hour-of-day mean of
    the detrended series, remainder = x − trend − seasonal. Output: the
    24-row seasonal profile + mean |remainder| per hod — the load-shape
    summary capacity planning reads. Dense hour grid (missing hours = 0);
    ONE agg + two windows + one agg, all on the O(hours) series."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("ts")
    hr = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3_600_000_000)
    ).cast("long")
    cnt = ev.select(hr.alias("hr")).groupBy("hr").agg(F.count(F.lit(1)).alias("n"))
    span = cnt.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = span.select(F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"))
    x = grid.join(cnt, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0)).cast("double").alias("x")
    )
    w = Window.orderBy("hr").rowsBetween(-12, 12)
    t = x.withColumn("n_win", F.count(F.lit(1)).over(w)).withColumn(
        "trend", F.round(F.avg("x").over(w), 9)
    )
    det = t.filter(F.col("n_win") == 25).select(
        F.pmod(F.col("hr"), F.lit(24)).alias("hod"),
        "hr",
        "x",
        (F.col("x") - F.col("trend")).alias("d"),
    )
    seas = det.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n_obs"), F.round(F.avg("d"), 9).alias("s")
    )
    rem = det.join(seas.select("hod", "s"), "hod").select(
        "hod", F.abs(F.col("d") - F.col("s")).alias("ar")
    )
    out = (
        seas.join(
            rem.groupBy("hod").agg(F.round(F.avg("ar"), 6).alias("mean_abs_rem")),
            "hod",
        )
        .select("hod", "n_obs", F.round("s", 6).alias("seasonal"), "mean_abs_rem")
    )
    return out.orderBy("hod")


def _stl_lite_sql() -> str:
    return """
        WITH cnt AS (
            SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1),
        span AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM cnt),
        grid AS (SELECT unnest(generate_series(h0, h1)) AS hr FROM span),
        x AS (SELECT g.hr, CAST(COALESCE(c.n, 0) AS DOUBLE) AS x
              FROM grid g LEFT JOIN cnt c USING (hr)),
        t AS (SELECT hr, x,
                     COUNT(*) OVER wnd AS n_win,
                     ROUND(AVG(x) OVER wnd, 9) AS trend
              FROM x WINDOW wnd AS (ORDER BY hr
                                    ROWS BETWEEN 12 PRECEDING
                                             AND 12 FOLLOWING)),
        det AS (SELECT hr % 24 AS hod, hr, x, x - trend AS d
                FROM t WHERE n_win = 25),
        seas AS (SELECT hod, CAST(COUNT(*) AS BIGINT) AS n_obs,
                        ROUND(AVG(d), 9) AS s
                 FROM det GROUP BY 1),
        rem AS (SELECT det.hod, ABS(det.d - seas.s) AS ar
                FROM det JOIN seas USING (hod))
        SELECT seas.hod, seas.n_obs, ROUND(seas.s, 6) AS seasonal,
               r.mean_abs_rem
        FROM seas JOIN (SELECT hod, ROUND(AVG(ar), 6) AS mean_abs_rem
                        FROM rem GROUP BY 1) r USING (hod)
        ORDER BY hod
    """


_CP_MARGIN = 24


def q_changepoint_detect(spark, sf_dir):
    """Binary-segmentation change point on the global hourly event series:
    the split minimizing two-segment SSE (equivalently maximizing the
    between-segment variance drop) with a 24-hour edge margin — the
    offline twin of the CUSUM screen. Prefix sums via ONE cumulative
    window make every candidate split O(1); all sums exact integers until
    the final divisions. Output one row: split hour, segment means, SSE
    drop."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("ts")
    hr = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3_600_000_000)
    ).cast("long")
    cnt = ev.select(hr.alias("hr")).groupBy("hr").agg(F.count(F.lit(1)).alias("n"))
    span = cnt.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = span.select(F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"))
    x = grid.join(cnt, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
    pre = x.select(
        "hr",
        F.row_number().over(Window.orderBy("hr")).alias("t"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    tot = pre.agg(
        F.max("t").alias("tn"), F.max("s1").alias("ts1"), F.max("s2").alias("ts2")
    )
    cand = pre.crossJoin(F.broadcast(tot)).filter(
        (F.col("t") >= _CP_MARGIN) & (F.col("t") <= F.col("tn") - _CP_MARGIN)
    )
    sse = (
        F.col("ts2")
        - F.col("s1") * F.col("s1") / F.col("t")
        - (F.col("ts1") - F.col("s1"))
        * (F.col("ts1") - F.col("s1"))
        / (F.col("tn") - F.col("t"))
    )
    sse_full = F.col("ts2") - F.col("ts1") * F.col("ts1") / F.col("tn")
    scored = cand.select(
        "hr",
        "t",
        "tn",
        F.round(sse, 9).alias("sse_split"),
        F.round(sse_full, 9).alias("sse_full"),
        F.round(F.col("s1") / F.col("t"), 6).alias("mean_before"),
        F.round(
            (F.col("ts1") - F.col("s1")) / (F.col("tn") - F.col("t")), 6
        ).alias("mean_after"),
    )
    return (
        scored.orderBy(F.col("sse_split").asc(), F.col("hr").asc())
        .limit(1)
        .select(
            F.col("hr").alias("split_hr"),
            F.col("tn").cast("long").alias("n_hours"),
            "mean_before",
            "mean_after",
            "sse_full",
            "sse_split",
            F.round(F.col("sse_full") - F.col("sse_split"), 6).alias("sse_drop"),
        )
    )


def _changepoint_detect_sql() -> str:
    return f"""
        WITH cnt AS (
            SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1),
        span AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM cnt),
        grid AS (SELECT unnest(generate_series(h0, h1)) AS hr FROM span),
        x AS (SELECT g.hr, COALESCE(c.n, 0) AS n
              FROM grid g LEFT JOIN cnt c USING (hr)),
        pre AS (SELECT hr,
                       ROW_NUMBER() OVER (ORDER BY hr) AS t,
                       SUM(n) OVER (ORDER BY hr) AS s1,
                       SUM(n * n) OVER (ORDER BY hr) AS s2
                FROM x),
        tot AS (SELECT MAX(t) AS tn, MAX(s1) AS ts1, MAX(s2) AS ts2 FROM pre),
        scored AS (
            SELECT hr, t, tn,
                   ROUND(ts2 - CAST(s1 * s1 AS DOUBLE) / t
                         - CAST((ts1 - s1) * (ts1 - s1) AS DOUBLE)
                           / (tn - t), 9) AS sse_split,
                   ROUND(ts2 - CAST(ts1 * ts1 AS DOUBLE) / tn, 9) AS sse_full,
                   ROUND(CAST(s1 AS DOUBLE) / t, 6) AS mean_before,
                   ROUND(CAST(ts1 - s1 AS DOUBLE) / (tn - t), 6) AS mean_after
            FROM pre CROSS JOIN tot
            WHERE t >= {_CP_MARGIN} AND t <= tn - {_CP_MARGIN})
        SELECT hr AS split_hr, CAST(tn AS BIGINT) AS n_hours,
               mean_before, mean_after, sse_full, sse_split,
               ROUND(sse_full - sse_split, 6) AS sse_drop
        FROM scored ORDER BY sse_split ASC, hr ASC LIMIT 1
    """


_RANSAC_K = 20
_RANSAC_TOL = 40.0


def q_ransac_fit(spark, sf_dir):
    """Deterministic RANSAC line fit of n_chars vs token count per doc:
    20 candidate lines through md5-rank-paired sample points (seeded
    mechanism — replays identically, the dp_cell_counts discipline),
    inliers = |y − (a + b·x)| ≤ 40, winner by (inliers DESC, candidate
    ASC). The robust-estimation classic next to theil_sen_cells. Scale
    shape: candidates are O(1) driver rows; scoring is ONE k×n
    explode-agg over broadcast candidate lines."""
    from raptor_service_spark.operators.dedup import words_col

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("double").alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )
    ranked = d.withColumn("k", F.md5(F.col("doc_id").cast("string"))).orderBy("k")
    pts = ranked.limit(2 * _RANSAC_K).collect()
    cands = []
    for k in range(_RANSAC_K):
        p1, p2 = pts[2 * k], pts[2 * k + 1]
        if p2.x == p1.x:
            continue
        b = float(_round_half_up((p2.y - p1.y) / (p2.x - p1.x), 9))
        a = float(_round_half_up(p1.y - b * p1.x, 9))
        cands.append((k, a, b))
    cdf = spark.createDataFrame(cands, "cand int, a double, b double")
    scored = d.crossJoin(F.broadcast(cdf)).withColumn(
        "inlier",
        F.when(
            F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
            <= _RANSAC_TOL,
            1,
        ).otherwise(0),
    )
    per = scored.groupBy("cand", "a", "b").agg(
        F.sum("inlier").alias("n_inliers"), F.count(F.lit(1)).alias("n")
    )
    return (
        per.orderBy(F.col("n_inliers").desc(), F.col("cand").asc())
        .limit(1)
        .select(
            "cand",
            F.col("b").alias("slope"),
            F.col("a").alias("intercept"),
            F.col("n_inliers").cast("long").alias("n_inliers"),
            F.round(F.col("n_inliers") / F.col("n"), 6).alias("inlier_frac"),
        )
    )


def _ransac_fit_sql() -> str:
    from raptor_service_spark.operators.dedup import words_sql

    w = words_sql("text")
    return f"""
        WITH d AS (
            SELECT doc_id, CAST(len({w}) AS DOUBLE) AS x,
                   CAST(n_chars AS DOUBLE) AS y
            FROM documents),
        ranked AS (
            SELECT d.*, ROW_NUMBER() OVER (
                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
            FROM d),
        smp AS (SELECT * FROM ranked WHERE rk <= {2 * _RANSAC_K}),
        cands AS (
            SELECT CAST((p1.rk - 1) / 2 AS INTEGER) AS cand,
                   ROUND(p1.y - ROUND((p2.y - p1.y) / (p2.x - p1.x), 9)
                         * p1.x, 9) AS a,
                   ROUND((p2.y - p1.y) / (p2.x - p1.x), 9) AS b
            FROM smp p1 JOIN smp p2
              ON p2.rk = p1.rk + 1 AND p1.rk % 2 = 1
            WHERE p2.x != p1.x),
        scored AS (
            SELECT c.cand, c.a, c.b,
                   CAST(SUM(CASE WHEN ABS(d.y - (c.a + c.b * d.x))
                                      <= {_RANSAC_TOL!r} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_inliers,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM d CROSS JOIN cands c GROUP BY 1, 2, 3)
        SELECT cand, b AS slope, a AS intercept, n_inliers,
               ROUND(CAST(n_inliers AS DOUBLE) / n, 6) AS inlier_frac
        FROM scored ORDER BY n_inliers DESC, cand ASC LIMIT 1
    """


# ---------------------------------------------------------------------------
# round-3 batch 12: next-cell prediction eval (temporal split), interleaved
# span-position layout profile
# ---------------------------------------------------------------------------


def q_next_cell_eval(spark, sf_dir):
    """Next-cell prediction accuracy with a TEMPORAL train/test split —
    the eval protocol (never random splits on time series) applied to the
    first-order mobility model: train the per-cell argmax next-cell table
    on even days, score it on odd-day transitions; baseline = predicting
    the globally most common destination. Everything runs on aggregated
    transition counts; argmax ties break toward the smaller cell id.
    Output one row: transition counts, model accuracy, baseline accuracy,
    lift."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("cell", cell_encode_col(lat, lng, 4)).withColumn(
        "day", F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        pts.withColumn("prev", F.lag("cell").over(w))
        .withColumn("prev_day", F.lag("day").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.col("prev").alias("src"),
            F.col("cell").alias("dst"),
            # a transition belongs to the day of its ORIGIN fix
            F.col("prev_day").alias("day"),
        )
    )
    train = tr.filter(F.col("day") % 2 == 0).groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c")
    )
    wa = Window.partitionBy("src").orderBy(F.col("c").desc(), F.col("dst").asc())
    model = (
        train.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("src", F.col("dst").alias("pred"))
    )
    base = (
        train.groupBy("dst")
        .agg(F.sum("c").alias("c"))
        .orderBy(F.col("c").desc(), F.col("dst").asc())
        .limit(1)
        .select(F.col("dst").alias("base_pred"))
    )
    test = tr.filter(F.col("day") % 2 == 1)
    scored = test.join(model, "src", "left").crossJoin(F.broadcast(base))
    return scored.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(F.when(F.col("pred") == F.col("dst"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.sum(F.when(F.col("base_pred") == F.col("dst"), 1).otherwise(0))
        .cast("long")
        .alias("n_base"),
    ).select(
        "n_test",
        "n_correct",
        F.round(F.col("n_correct") / F.col("n_test"), 6).alias("accuracy"),
        F.round(F.col("n_base") / F.col("n_test"), 6).alias("baseline_acc"),
        # lift from EXACT counts (dividing the rounded rates re-rounds)
        F.round(F.col("n_correct") / F.col("n_base"), 6).alias("lift"),
    )


def _next_cell_eval_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 4)
    return """
        WITH pts AS (
            SELECT user_id, ts, event_id, {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day
            FROM events),
        tr AS (
            SELECT prev AS src, cell AS dst, prev_day AS day
            FROM (SELECT cell, day,
                         LAG(cell) OVER wnd AS prev,
                         LAG(day) OVER wnd AS prev_day
                  FROM pts WINDOW wnd AS (PARTITION BY user_id
                                          ORDER BY ts, event_id))
            WHERE prev IS NOT NULL),
        train AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
                  FROM tr WHERE day % 2 = 0 GROUP BY 1, 2),
        model AS (
            SELECT src, dst AS pred FROM (
                SELECT src, dst, ROW_NUMBER() OVER (
                    PARTITION BY src ORDER BY c DESC, dst ASC) AS rn
                FROM train) WHERE rn = 1),
        base AS (SELECT dst AS base_pred FROM train
                 GROUP BY dst ORDER BY SUM(c) DESC, dst ASC LIMIT 1),
        test AS (SELECT * FROM tr WHERE day % 2 = 1),
        scored AS (SELECT t.dst, m.pred, b.base_pred
                   FROM test t LEFT JOIN model m USING (src)
                   CROSS JOIN base b)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN pred = dst THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_correct,
               ROUND(CAST(SUM(CASE WHEN pred = dst THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS accuracy,
               ROUND(CAST(SUM(CASE WHEN base_pred = dst THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS baseline_acc,
               ROUND(CAST(SUM(CASE WHEN pred = dst THEN 1 ELSE 0 END)
                          AS DOUBLE)
                     / SUM(CASE WHEN base_pred = dst THEN 1 ELSE 0 END), 6)
                   AS lift
        FROM scored
    """.replace("{cell}", cell)


_SPP_DOCS, _SPP_SEED = 200, 63


def q_span_position_profile(spark, sf_dir):
    """Layout profile of the interleaved corpus: P(media | position
    decile) — WHERE media spans sit inside documents (leading figures vs
    trailing galleries), the structural statistic an interleaved
    text+image training mix is balanced against. Position = idx/n_spans
    decile; one explode + one agg. Oracle replays the deterministic
    generator as golden VALUES (the span_transitions technique)."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans

    docs = gen_documents_df(spark, _SPP_DOCS, seed=_SPP_SEED)
    sp = explode_spans(docs)
    n = sp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dec = sp.join(n, "doc_id").select(
        F.least(
            F.lit(9), F.floor(F.col("idx") * 10 / F.col("n")).cast("int")
        ).alias("decile"),
        F.when(F.col("media_ref") != "", 1).otherwise(0).alias("is_media"),
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("is_media").cast("long").alias("n_media"),
            F.round(F.avg(F.col("is_media").cast("double")), 6).alias(
                "media_frac"
            ),
        )
        .orderBy("decile")
    )


def _span_position_profile_sql() -> str:
    from raptor_service_spark.datagen import _gen_doc

    rows = []
    for i in range(_SPP_DOCS):
        d = _gen_doc(_SPP_SEED, i)
        nn = len(d["spans"])
        for j, s in enumerate(d["spans"]):
            rows.append(f"({j}, {nn}, {1 if s['media_ref'] else 0})")
    return f"""
        WITH spans(idx, n, is_media) AS (VALUES {', '.join(rows)})
        SELECT CAST(LEAST(9, FLOOR(idx * 10 / n)) AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(is_media) AS BIGINT) AS n_media,
               ROUND(AVG(CAST(is_media AS DOUBLE)), 6) AS media_frac
        FROM spans GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# round-3 batch 13: multi-probe LSH recall audit
# ---------------------------------------------------------------------------

_MP_PLANES = 8


def _lsh_plane(p: int) -> list[int]:
    """±1 hyperplane p of the cosine-LSH code: md5('lsh{p}|{d}') parity —
    one Python source feeds both engines (and the Python query-code
    computation)."""
    import hashlib

    return [
        1
        if int(hashlib.md5(f"lsh{p}|{d}".encode()).hexdigest()[:4], 16) % 2 == 0
        else -1
        for d in range(64)
    ]


def _lsh_code_py(v) -> int:
    code = 0
    for p in range(_MP_PLANES):
        s = _lsh_plane(p)
        if float(np.dot(np.asarray(v, dtype=np.float64), np.asarray(s, dtype=np.float64))) > 0:
            code |= 1 << p
    return code


def q_multiprobe_lsh_recall(spark, sf_dir):
    """Multi-probe LSH audit (Lv et al. 2007): recall@10 of cosine
    hyperplane-LSH candidates against the exact top-10, single-bucket vs
    multi-probe (all Hamming-1 buckets) — the measurement that justifies
    probing over building more tables. 8 deterministic ±1 hyperplanes;
    sign folds are ordered array aggregates (identical doubles both
    engines; |dot| is O(1) so the >0 sign cannot knife-edge). One scan
    computes every code; candidates/recall run on flag columns — no
    pair join anywhere. Two queries × two modes."""
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    fold = (
        "aggregate(zip_with(transform(embedding, x -> cast(x as double)), "
        "{0}, (x, s) -> x * s), cast(0.0 as double), (acc, t) -> acc + t)"
    )
    code_expr = None
    for p in range(_MP_PLANES):
        signs = "array(" + ", ".join(
            f"cast({s} as double)" for s in _lsh_plane(p)
        ) + ")"
        bit = F.when(F.expr(fold.format(signs)) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        code_expr = bit if code_expr is None else code_expr + bit
    coded = e.withColumn("code", code_expr.cast("long")).localCheckpoint(
        eager=True
    )
    outs = []
    for qid, q in (("qa", QVEC), ("qb", QVEC2)):
        qc = _lsh_code_py(q)
        top = (
            coded.withColumn("dist", F.round(cosine_dist_col(F.col("embedding"), q), 6))
            .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
            .limit(10)
            .select("vec_id", "code")
        )
        for mode, pred in (
            ("single", F.col("code") == qc),
            ("multiprobe", F.expr(f"bit_count(code ^ {qc})") <= 1),
        ):
            n_cand = coded.filter(pred).count()
            hits = top.filter(pred).count()
            outs.append((qid, mode, int(n_cand), int(hits), round(hits / 10.0, 6)))
    return spark.createDataFrame(
        outs, "qid string, mode string, n_cand long, hits long, recall double"
    ).orderBy("qid", "mode")


def _multiprobe_lsh_recall_sql() -> str:
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(generate_series(1, 64), "
        "i -> fv[i] * ({0})[i])), (acc, t) -> acc + t)"
    )
    bits = []
    for p in range(_MP_PLANES):
        signs = "[" + ", ".join(
            f"CAST({s} AS DOUBLE)" for s in _lsh_plane(p)
        ) + "]"
        bits.append(
            f"(CASE WHEN {fold.format(signs)} > 0 THEN {1 << p} ELSE 0 END)"
        )
    code = " + ".join(bits)
    blocks = []
    for qid, q in (("qa", QVEC), ("qb", QVEC2)):
        qsql = "[" + ", ".join(f"{x:.6f}" for x in q) + "]"
        qc = _lsh_code_py(q)
        top = f"""(SELECT vec_id, code FROM (
                SELECT vec_id, code,
                       ROUND(1.0 - list_cosine_similarity(
                           list_transform(embedding, x -> CAST(x AS DOUBLE)),
                           {qsql}), 6) AS dist
                FROM coded)
            ORDER BY dist ASC, vec_id ASC LIMIT 10)"""
        for mode, pred in (
            ("single", f"code = {qc}"),
            ("multiprobe", f"bit_count(xor(code, {qc}::BIGINT)) <= 1"),
        ):
            blocks.append(
                f"""SELECT '{qid}' AS qid, '{mode}' AS mode,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM coded
                    WHERE {pred}) AS n_cand,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM {top} t
                    WHERE {pred.replace('code', 't.code')}) AS hits,
                   (SELECT ROUND(COUNT(*) / 10.0, 6) FROM {top} t
                    WHERE {pred.replace('code', 't.code')}) AS recall"""
            )
    union = "\n        UNION ALL\n        ".join(blocks)
    return f"""
        WITH e AS (
            SELECT vec_id, embedding,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fv
            FROM embeddings),
        coded AS MATERIALIZED (
            SELECT vec_id, embedding, {code} AS code FROM e)
        SELECT * FROM ({union}) ORDER BY qid, mode
    """


# ---------------------------------------------------------------------------
# Rayleigh circular-uniformity test over movement directions (session 10)
# ---------------------------------------------------------------------------

_RAYL_RES, _RAYL_MIN_N, _RAYL_TOPK = 2, 30, 20


def q_rayleigh_bearing(spark, sf_dir):
    """Rayleigh test for directional bias of movement per res-2 tile — the
    circular-statistics screen behind flow-field maps (is motion in this
    tile uniformly scattered, or does it share a preferred heading?). Each
    consecutive same-user event pair is a displacement; its UNIT vector
    (dx/‖d‖, dy/‖d‖) is the direction sample — the resultant length
    R̄ = ‖Σ uᵢ‖/n and Rayleigh z = n·R̄² need no trig at all (no libm
    divergence; SQRT is IEEE-exact in both engines). One lag window + one
    cell agg; per-term 9-dp pre-rounds per repo convention; display via
    floor-truncation. Top-20 most-directional tiles with n ≥ 30.

    Reference analog: the retrieval-direction diagnostics of
    services/retrieval_service.py recast as circular statistics; completes
    the bearing family (bearing_rose = histogram, spherical_centroid =
    mean direction, rayleigh = significance)."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        pts.withColumn("dlat", F.col("lat") - F.lag("lat").over(w))
        .withColumn("dlng", F.col("lng") - F.lag("lng").over(w))
        .withColumn("lat0", F.lag("lat").over(w))
        .withColumn("lng0", F.lag("lng").over(w))
        .filter(
            F.col("dlat").isNotNull() & ((F.col("dlat") != 0) | (F.col("dlng") != 0))
        )
    )
    from raptor_service_spark.geo.grid import cell_encode_col

    ln = F.sqrt(F.col("dlat") * F.col("dlat") + F.col("dlng") * F.col("dlng"))
    u = seg.select(
        cell_encode_col(F.col("lat0"), F.col("lng0"), _RAYL_RES).alias("cell"),
        F.round(F.col("dlng") / ln, 9).alias("ux"),
        F.round(F.col("dlat") / ln, 9).alias("uy"),
    )
    agg = u.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.sum("ux").alias("sx"),
        F.sum("uy").alias("sy"),
    )
    r2 = F.col("sx") * F.col("sx") + F.col("sy") * F.col("sy")
    out = (
        agg.filter(F.col("n_moves") >= _RAYL_MIN_N)
        .select(
            "cell",
            "n_moves",
            (F.floor(F.sqrt(r2) / F.col("n_moves") * 1e6) / 1e6).alias("rbar"),
            # z from the raw sum of squares (NOT sqrt-then-resquare — that
            # round-trips through a different double)
            (F.floor(r2 / F.col("n_moves") * 1e6) / 1e6).alias("z"),
        )
    )
    top = Window.orderBy(F.col("z").desc(), "cell")
    return (
        out.withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _RAYL_TOPK)
        .select("cell", "n_moves", "rbar", "z", "rk")
    )


def _rayleigh_bearing_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql("lat0", "lng0", _RAYL_RES)
    return f"""
        WITH p AS (SELECT user_id, ts, event_id, {lat} AS lat, {lng} AS lng
                   FROM events),
        s AS (SELECT user_id,
                     lat - LAG(lat) OVER w AS dlat,
                     lng - LAG(lng) OVER w AS dlng,
                     LAG(lat) OVER w AS lat0,
                     LAG(lng) OVER w AS lng0
              FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        u AS (SELECT {cell} AS cell,
                     ROUND(dlng / SQRT(dlat * dlat + dlng * dlng), 9) AS ux,
                     ROUND(dlat / SQRT(dlat * dlat + dlng * dlng), 9) AS uy
              FROM s
              WHERE dlat IS NOT NULL AND (dlat != 0 OR dlng != 0)),
        a AS (SELECT cell, COUNT(*) AS n_moves,
                     SUM(ux) AS sx, SUM(uy) AS sy
              FROM u GROUP BY 1),
        sc AS (SELECT cell, n_moves,
                      FLOOR(SQRT(sx * sx + sy * sy) / n_moves * 1e6) / 1e6
                          AS rbar,
                      FLOOR((sx * sx + sy * sy) / n_moves * 1e6) / 1e6 AS z
               FROM a WHERE n_moves >= {_RAYL_MIN_N})
        SELECT cell, n_moves, rbar, z, rk FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY z DESC, cell) AS BIGINT)
                          AS rk
            FROM sc)
        WHERE rk <= {_RAYL_TOPK}
    """


# ---------------------------------------------------------------------------
# deterministic bootstrap confidence interval (session 10)
# ---------------------------------------------------------------------------

_BOOT_B, _BOOT_POOL = 200, 2000


def q_bootstrap_ci(spark, sf_dir):
    """Nonparametric bootstrap CI for the mean document length — the
    uncertainty quote every corpus-stat release should carry. B=200
    deterministic resamples-with-replacement: draw (b, j) picks the doc
    ranked 1 + (md5('boot|b|j') mod n) — indexable replay, the
    dp_cell_counts seeded-mechanism discipline (no RNG, identical on every
    engine/run). Every replicate mean is an exact integer sum over n draws
    divided by the same n, so cross-engine ordering of means is
    bit-identical; CI = percentile method at ranks 5 / 196 of the 200
    sorted means. Scale shape: the B·n draw explode is declared O(B·n) and
    feeds ONE equi-join on rank + one agg (the permutation_test posture);
    display via floor-truncation of exact ratios."""
    from pyspark.sql import Window

    d = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BOOT_POOL)
        .select("doc_id", "n_chars")
    )
    cnt = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
    )
    ranked = d.withColumn(
        "rk", F.row_number().over(Window.orderBy("doc_id"))
    )
    draws = (
        ranked.select(F.col("rk").alias("j"))
        .select("j", F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"))
        .crossJoin(F.broadcast(cnt))
        .select(
            "b",
            "n",
            (
                F.lit(1)
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("boot|"), F.col("b"), F.lit("|"), F.col("j")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("idx"),
        )
    )
    means = (
        draws.join(ranked, draws.idx == ranked.rk)
        .groupBy("b")
        .agg((F.sum("n_chars") / F.max("n")).alias("mean_b"))
    )
    mw = Window.orderBy("mean_b", "b")
    sel = means.withColumn("q", F.row_number().over(mw))
    lo_rk, hi_rk = 5, 196
    trunc6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        cnt.crossJoin(
            sel.filter(F.col("q") == lo_rk).select(
                trunc6(F.col("mean_b")).alias("ci_lo")
            )
        )
        .crossJoin(
            sel.filter(F.col("q") == hi_rk).select(
                trunc6(F.col("mean_b")).alias("ci_hi")
            )
        )
        .select(
            F.col("n").alias("n_docs"),
            F.lit(_BOOT_B).cast("long").alias("n_reps"),
            trunc6(F.col("s") / F.col("n")).alias("obs_mean"),
            "ci_lo",
            "ci_hi",
        )
    )


def _bootstrap_ci_sql() -> str:
    return f"""
        WITH d AS (SELECT doc_id, n_chars FROM documents
                   WHERE doc_id < {_BOOT_POOL}),
        cnt AS (SELECT COUNT(*) AS n, SUM(n_chars) AS s FROM d),
        ranked AS (SELECT n_chars,
                          ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
                   FROM d),
        draws AS (
            SELECT b, n,
                   1 + ('0x' || substr(md5('boot|' || CAST(b AS VARCHAR)
                                       || '|' || CAST(j AS VARCHAR)), 1, 8)
                       )::BIGINT % n AS idx
            FROM (SELECT rk AS j FROM ranked),
                 (SELECT UNNEST(generate_series(1, {_BOOT_B})) AS b),
                 cnt),
        means AS (
            SELECT b, SUM(r.n_chars) / CAST(MAX(dr.n) AS DOUBLE) AS mean_b
            FROM draws dr JOIN ranked r ON dr.idx = r.rk
            GROUP BY b),
        sel AS (SELECT mean_b,
                       ROW_NUMBER() OVER (ORDER BY mean_b, b) AS q
                FROM means)
        SELECT CAST(cnt.n AS BIGINT) AS n_docs,
               CAST({_BOOT_B} AS BIGINT) AS n_reps,
               FLOOR(cnt.s / CAST(cnt.n AS DOUBLE) * 1e6) / 1e6 AS obs_mean,
               (SELECT FLOOR(mean_b * 1e6) / 1e6 FROM sel WHERE q = 5)
                   AS ci_lo,
               (SELECT FLOOR(mean_b * 1e6) / 1e6 FROM sel WHERE q = 196)
                   AS ci_hi
        FROM cnt
    """


# ---------------------------------------------------------------------------
# 11-point interpolated precision-recall curve (session 10)
# ---------------------------------------------------------------------------

_PR_POOL, _PR_K = 500, 500


def q_pr_curve_11pt(spark, sf_dir):
    """TREC-style 11-point interpolated precision-recall curve of the BM25
    ranking against binary relevance (quality_score ≥ 0.95) on a bounded
    500-doc pool — the full-curve companion to the scalar eval family
    (bm25_eval MRR/MAP, ndcg_bm25, rbo_rankings): p_interp(r) =
    max{precision@i : recall@i ≥ r} at r = 0.0, 0.1, ..., 1.0. Ranking the
    whole pool (k = pool) lets recall reach its true maximum. Precision and
    recall are exact integer ratios at every cutoff, so the ≥-level
    comparisons are bit-identical cross-engine; the 11×k level join is a
    broadcast-tiny theta join. Missing levels (recall never reached) report
    the standard 0.0."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import bm25_topk

    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PR_POOL)
        .select("doc_id", "text")
    )
    rel = docs.select(
        "doc_id", (quality_score(F.col("text")) >= _REL_T).cast("int").alias("rel")
    )
    r_tot = rel.agg(F.sum("rel").cast("long").alias("r_total"))
    ranked = bm25_topk(docs, list(_BM25_TERMS), _PR_K).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("pos"),
    )
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    pr = (
        ranked.join(rel, "doc_id")
        .withColumn("cum_rel", F.sum("rel").over(w))
        .crossJoin(F.broadcast(r_tot))
        .select(
            (F.col("cum_rel").cast("double") / F.col("pos")).alias("p_i"),
            (F.col("cum_rel").cast("double") / F.col("r_total")).alias("rec_i"),
        )
    )
    levels = spark.range(0, 11).select(
        (F.col("id") / F.lit(10.0)).alias("recall_level")
    )
    curve = (
        levels.join(
            F.broadcast(pr), F.col("rec_i") >= F.col("recall_level"), "left"
        )
        .groupBy("recall_level")
        .agg(
            (F.floor(F.coalesce(F.max("p_i"), F.lit(0.0)) * 1e6) / 1e6).alias(
                "p_interp"
            )
        )
    )
    return curve.orderBy("recall_level")


def _pr_curve_11pt_sql() -> str:
    from raptor_service_spark.functions.text import quality_score_sql
    from raptor_service_spark.operators.bm25 import bm25_sql

    pool = f"(SELECT doc_id, text FROM documents WHERE doc_id < {_PR_POOL})"
    kw = bm25_sql(pool, list(_BM25_TERMS), _PR_K)
    qs = quality_score_sql("text")
    return f"""
        WITH pool AS (SELECT doc_id, text FROM documents
                      WHERE doc_id < {_PR_POOL}),
        rel AS (SELECT doc_id,
                       CASE WHEN {qs} >= {_REL_T} THEN 1 ELSE 0 END AS rel
                FROM pool),
        rtot AS (SELECT CAST(SUM(rel) AS BIGINT) AS r_total FROM rel),
        ranked AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS pos
            FROM ({kw})),
        pr AS (
            SELECT SUM(rel) OVER (ORDER BY pos ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW)
                       / CAST(pos AS DOUBLE) AS p_i,
                   SUM(rel) OVER (ORDER BY pos ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW)
                       / CAST((SELECT r_total FROM rtot) AS DOUBLE) AS rec_i
            FROM ranked JOIN rel USING (doc_id)),
        levels AS (SELECT UNNEST(generate_series(0, 10)) / 10.0
                       AS recall_level)
        SELECT recall_level,
               FLOOR(COALESCE(MAX(p_i), 0.0) * 1e6) / 1e6 AS p_interp
        FROM levels LEFT JOIN pr ON pr.rec_i >= levels.recall_level
        GROUP BY recall_level
        ORDER BY recall_level
    """


# ---------------------------------------------------------------------------
# Kalman track smoothing as an ordered array fold (session 10)
# ---------------------------------------------------------------------------

_KAL_POOL, _KAL_MIN_FIX = 300, 5
_KAL_Q, _KAL_R = 0.01, 0.25


def _kalman_step_expr(ea, arr):
    """The per-fix Kalman update, emitted from ONE Python source for both
    engines (the shared-literal discipline): random-walk predict
    p1 = p + Q, gain k = p1/(p1+R), state += k·innovation, p = (1−k)·p1,
    plus the |innovation| L1 accumulator. ``ea(name, i)`` renders 1-based
    element access; ``arr(parts)`` renders an array literal. No let
    bindings exist in either engine's lambda, so k/p1 are substituted
    textually — byte-identical arithmetic on both sides."""
    a1, a2, a3, a4 = (ea("acc", i) for i in range(1, 5))
    z1, z2 = ea("z", 1), ea("z", 2)
    p1 = f"round({a3} + {_KAL_Q!r}, 9)"
    k = f"round({p1} / ({p1} + {_KAL_R!r}), 9)"
    return arr(
        [
            f"round({a1} + {k} * ({z1} - {a1}), 9)",
            f"round({a2} + {k} * ({z2} - {a2}), 9)",
            f"round((1.0 - {k}) * {p1}, 9)",
            f"round({a4} + round(abs({z1} - {a1}) + abs({z2} - {a2}), 9), 9)",
        ]
    )


def q_kalman_tracks(spark, sf_dir):
    """Per-user 2-D random-walk Kalman smoother over the ordered fix
    sequence — the GPS-denoising step a mobility pipeline runs before
    stay-point / trajectory analysis. State (x_lat, x_lng, p) folds over
    the user's (ts, event_id)-sorted track with per-step 9-dp rounding as
    ONE ordered array fold (aggregate ↔ list_reduce — a groupBy SUM would
    reassociate floats and the filter is order-dependent anyway); also
    accumulates the L1 innovation total (the track's noise mass). One
    collect_list shuffle per user, O(track) fold, no UDF. Users with ≥ 5
    fixes in the bounded pool; display via floor-truncation."""
    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _KAL_POOL)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("event_id").alias("e"),
        lat.alias("a"),
        lng.alias("g"),
    )
    tracks = (
        pts.groupBy("user_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(t, e, a, g))), "
                "s -> array(s.a, s.g))"
            ).alias("pts")
        )
        .filter(F.size("pts") >= _KAL_MIN_FIX)
    )
    step = _kalman_step_expr(
        lambda n, i: f"element_at({n}, {i})",
        lambda parts: "array(" + ", ".join(parts) + ")",
    )
    fold = (
        "aggregate(slice(pts, 2, size(pts) - 1), "
        "array(element_at(element_at(pts, 1), 1), "
        "element_at(element_at(pts, 1), 2), "
        "cast(1.0 as double), cast(0.0 as double)), "
        f"(acc, z) -> {step})"
    )
    out = tracks.select(
        "user_id",
        F.size("pts").cast("long").alias("n_fixes"),
        F.expr(fold).alias("st"),
    )
    t6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return out.select(
        "user_id",
        "n_fixes",
        t6(F.expr("element_at(st, 1)")).alias("x_lat"),
        t6(F.expr("element_at(st, 2)")).alias("x_lng"),
        t6(F.expr("element_at(st, 3)")).alias("p_var"),
        t6(F.expr("element_at(st, 4)")).alias("innov_l1"),
    ).orderBy("user_id")


def _kalman_tracks_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    step = _kalman_step_expr(
        lambda n, i: f"{n}[{i}]",
        lambda parts: "[" + ", ".join(parts) + "]",
    )
    fold = (
        "list_reduce(list_prepend("
        "[pts[1][1], pts[1][2], CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)], "
        f"pts[2:]), (acc, z) -> {step})"
    )
    return f"""
        WITH p AS (
            SELECT user_id, epoch_us(ts) AS t, event_id AS e,
                   {lat} AS a, {lng} AS g
            FROM events WHERE user_id < {_KAL_POOL}),
        tr AS (
            SELECT user_id,
                   list_transform(
                       list_sort(list({{'t': t, 'e': e, 'a': a, 'g': g}})),
                       s -> [s.a, s.g]) AS pts
            FROM p GROUP BY user_id),
        ok AS (SELECT user_id, pts FROM tr WHERE len(pts) >= {_KAL_MIN_FIX}),
        st AS (SELECT user_id, CAST(len(pts) AS BIGINT) AS n_fixes,
                      {fold} AS s
               FROM ok)
        SELECT user_id, n_fixes,
               FLOOR(s[1] * 1e6) / 1e6 AS x_lat,
               FLOOR(s[2] * 1e6) / 1e6 AS x_lng,
               FLOOR(s[3] * 1e6) / 1e6 AS p_var,
               FLOOR(s[4] * 1e6) / 1e6 AS innov_l1
        FROM st ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# Holt linear-trend exponential smoothing (session 10)
# ---------------------------------------------------------------------------

_HOLT_ALPHA, _HOLT_BETA, _HOLT_RES = 0.5, 0.25, 3


def _holt_step_expr(ea, arr):
    """Holt's double-exponential update from ONE Python source for both
    engines: l' = αx + (1−α)(l+b), b' = β(l'−l) + (1−β)b, SSE += (x−l−b)²
    (one-step-ahead forecast error BEFORE the update — the honest
    in-sample error). l' is substituted textually (no let bindings)."""
    l, b, sse = ea("acc", 1), ea("acc", 2), ea("acc", 3)
    x = ea("z", 1)
    lp = (
        f"round({_HOLT_ALPHA!r} * {x} + "
        f"(1.0 - {_HOLT_ALPHA!r}) * ({l} + {b}), 9)"
    )
    return arr(
        [
            lp,
            f"round({_HOLT_BETA!r} * ({lp} - {l}) + "
            f"(1.0 - {_HOLT_BETA!r}) * {b}, 9)",
            f"round({sse} + round(({x} - {l} - {b}) * ({x} - {l} - {b}), 9), 9)",
        ]
    )


def q_holt_trend_cells(spark, sf_dir):
    """Holt linear-trend smoothing of the two busiest res-3 cells' hourly
    count series — the forecasting baseline next to the diagnostic family
    (stl_lite = decomposition, ewma_anomaly = level-only monitor, holt adds
    the trend term and a 1..3-hour-ahead forecast). Series are DENSE over
    the global hour span (missing hours = 0, the cell_xcorr convention);
    the recursion folds as ONE ordered array fold per cell with per-step
    9-dp rounding (aggregate ↔ list_reduce); init l₀ = x₁, b₀ = 0. Scale
    shape: one (cell, hour) agg + an O(hours) fold per cell; busiest cells
    recomputed as scalar subqueries in the oracle."""
    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        cell_encode_col(lat, lng, _HOLT_RES).alias("cell"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000)
        ).alias("hr"),
    )
    top2 = sorted(
        r.cell
        for r in pts.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "cell")
        .limit(2)
        .collect()
    )
    span = pts.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = span.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
    ).crossJoin(
        spark.createDataFrame([(c,) for c in top2], "cell long")
    )
    cnts = (
        pts.filter(F.col("cell").isin(top2))
        .groupBy("cell", "hr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    series = (
        grid.join(cnts, ["cell", "hr"], "left")
        .select("cell", "hr", F.coalesce("c", F.lit(0)).alias("x"))
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(hr, x))), "
                "s -> array(cast(s.x as double)))"
            ).alias("xs")
        )
    )
    step = _holt_step_expr(
        lambda n, i: f"element_at({n}, {i})",
        lambda parts: "array(" + ", ".join(parts) + ")",
    )
    fold = (
        "aggregate(slice(xs, 2, size(xs) - 1), "
        "array(element_at(element_at(xs, 1), 1), "
        "cast(0.0 as double), cast(0.0 as double)), "
        f"(acc, z) -> {step})"
    )
    out = series.select(
        "cell", F.size("xs").cast("long").alias("n_hours"), F.expr(fold).alias("st")
    )
    t6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    lvl = F.expr("element_at(st, 1)")
    trd = F.expr("element_at(st, 2)")
    return out.select(
        "cell",
        "n_hours",
        t6(lvl).alias("level"),
        t6(trd).alias("trend"),
        t6(lvl + trd).alias("fc_1h"),
        t6(lvl + 2 * trd).alias("fc_2h"),
        t6(lvl + 3 * trd).alias("fc_3h"),
        t6(F.expr("element_at(st, 3)")).alias("sse"),
    ).orderBy("cell")


def _holt_trend_cells_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _HOLT_RES)
    step = _holt_step_expr(
        lambda n, i: f"{n}[{i}]",
        lambda parts: "[" + ", ".join(parts) + "]",
    )
    fold = (
        "list_reduce(list_prepend("
        "[xs[1][1], CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)], "
        f"xs[2:]), (acc, z) -> {step})"
    )
    top2 = (
        "(SELECT cell FROM (SELECT cell, COUNT(*) AS c FROM p "
        "GROUP BY 1 ORDER BY c DESC, cell LIMIT 2))"
    )
    return f"""
        WITH p AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hr
            FROM events),
        span AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM p),
        grid AS (
            SELECT t.cell, UNNEST(generate_series(span.h0, span.h1)) AS hr
            FROM span, {top2} AS t(cell)),
        cnts AS (
            SELECT cell, hr, COUNT(*) AS c FROM p
            WHERE cell IN {top2} GROUP BY 1, 2),
        xs AS (
            SELECT g.cell, g.hr, COALESCE(c.c, 0) AS x
            FROM grid g LEFT JOIN cnts c ON g.cell = c.cell AND g.hr = c.hr),
        ser AS (
            SELECT cell,
                   list_transform(list_sort(list({{'hr': hr, 'x': x}})),
                                  s -> [CAST(s.x AS DOUBLE)]) AS xs
            FROM xs GROUP BY cell),
        st AS (SELECT cell, CAST(len(xs) AS BIGINT) AS n_hours,
                      {fold} AS s
               FROM ser)
        SELECT cell, n_hours,
               FLOOR(s[1] * 1e6) / 1e6 AS level,
               FLOOR(s[2] * 1e6) / 1e6 AS trend,
               FLOOR((s[1] + s[2]) * 1e6) / 1e6 AS fc_1h,
               FLOOR((s[1] + 2 * s[2]) * 1e6) / 1e6 AS fc_2h,
               FLOOR((s[1] + 3 * s[2]) * 1e6) / 1e6 AS fc_3h,
               FLOOR(s[3] * 1e6) / 1e6 AS sse
        FROM st ORDER BY cell
    """


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside embedding clusters (session 10)
# ---------------------------------------------------------------------------

_SEM_POOL, _SEM_K, _SEM_T = 300, 4, 0.55

# argmin over the k=4 seed distances with min-id tie-break — ONE Python
# source rendered into both engines (the shared-CASE discipline)
_SEM_CID_CASE = (
    "CASE WHEN rd0 <= rd1 AND rd0 <= rd2 AND rd0 <= rd3 THEN 0 "
    "WHEN rd1 <= rd2 AND rd1 <= rd3 THEN 1 "
    "WHEN rd2 <= rd3 THEN 2 ELSE 3 END"
)


def q_semdedup_clusters(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): partition embeddings into semantic
    clusters, then dedup WITHIN each cluster by pairwise cosine ≥ τ —
    the published recipe that makes embedding dedup tractable because the
    quadratic only runs inside cluster buckets, never corpus-wide. The
    cluster stage here is deterministic nearest-seed assignment (seeds =
    first k vectors; one broadcast O(k·dim) + one scan — the same
    assignment dataflow as k-means' E-step, whose iterated form
    ivf_knn_ann/kmeans_geo already carry), distances as ordered zip_with
    folds with a shared argmin CASE. Dedup keeps the min vec_id of every
    near-dup pair (drop b where some a<b has cos(a,b) ≥ τ — the greedy
    keep-first scan). Corpus = embeddings + planted exact duplicates
    (the cosine_neardup fixture). Per cluster: members, dropped, kept."""
    pool = _emb_with_dups(spark, sf_dir).filter(
        (F.col("vec_id") % 1000000) < _SEM_POOL
    )
    e = pool.select(
        "vec_id",
        "embedding",
        F.expr("transform(embedding, x -> cast(x as double))").alias("fv"),
    )
    assigned = e
    for j in range(_SEM_K):
        seed = e.filter(F.col("vec_id") == j).select(F.col("fv").alias(f"s{j}"))
        assigned = assigned.crossJoin(F.broadcast(seed))
        assigned = assigned.withColumn(
            f"rd{j}",
            F.round(
                F.expr(
                    f"aggregate(zip_with(fv, s{j}, (x, y) -> (x - y) * (x - y)), "
                    "cast(0.0 as double), (acc, t) -> acc + t)"
                ),
                9,
            ),
        )
    assigned = assigned.select(
        "vec_id", "embedding", F.expr(_SEM_CID_CASE).cast("long").alias("cid")
    ).localCheckpoint(eager=True)
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "cid"
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("cid").alias("cid_b"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            "va", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            "vb", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    dropped = (
        a.join(b, (F.col("cid") == F.col("cid_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .filter(F.col("cosine") >= _SEM_T)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    stats = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    drops = (
        assigned.join(dropped, "vec_id")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return (
        stats.join(drops, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0)))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("cid")
    )


def _semdedup_clusters_sql() -> str:
    d2 = (
        "ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(generate_series(1, len(fv)), "
        "i -> (fv[i] - {s}[i]) * (fv[i] - {s}[i]))), "
        "(acc, t) -> acc + t), 9)"
    )
    seeds = "".join(
        f", (SELECT fv AS s{j} FROM e WHERE vec_id = {j}) seed{j}"
        for j in range(_SEM_K)
    )
    rds = ", ".join(d2.format(s=f"s{j}") + f" AS rd{j}" for j in range(_SEM_K))
    da = "list_transform(a.embedding, x -> CAST(x AS DOUBLE))"
    db = "list_transform(b.embedding, x -> CAST(x AS DOUBLE))"
    cos = f"list_cosine_similarity({da}, {db})"
    return f"""
        WITH e AS (
            SELECT vec_id, embedding,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS fv
            FROM {_EMB_WITH_DUPS_SQL}
            WHERE vec_id % 1000000 < {_SEM_POOL}),
        rd AS (SELECT vec_id, embedding, {rds} FROM e{seeds}),
        assigned AS MATERIALIZED (
            SELECT vec_id, embedding,
                   CAST({_SEM_CID_CASE} AS BIGINT) AS cid
            FROM rd),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE ROUND({cos}, 6) >= {_SEM_T}),
        stats AS (SELECT cid, COUNT(*) AS n_members FROM assigned GROUP BY 1),
        drops AS (
            SELECT cid, COUNT(*) AS n_dropped
            FROM assigned JOIN dropped USING (vec_id) GROUP BY 1)
        SELECT stats.cid, stats.n_members,
               CAST(COALESCE(drops.n_dropped, 0) AS BIGINT) AS n_dropped,
               CAST(stats.n_members - COALESCE(drops.n_dropped, 0) AS BIGINT)
                   AS n_kept
        FROM stats LEFT JOIN drops ON stats.cid = drops.cid
        ORDER BY stats.cid
    """


# ---------------------------------------------------------------------------
# pLSA topic model as relational EM (session 10)
# ---------------------------------------------------------------------------

_PLSA_POOL, _PLSA_V, _PLSA_K, _PLSA_R, _PLSA_TOP = 120, 30, 3, 3, 5


def _plsa_init(kind: str, idx: str, k: str) -> str:
    """Deterministic symmetry-breaking init weight, ONE Python source for
    both engines: v = 1.0 + 0.1·((idx·a + k·b) mod m) with distinct
    (a, b, m) per parameter family (uniform init is an EM fixed point)."""
    a, b, m = (7, 13, 5) if kind == "theta" else (11, 17, 7)
    # CAST literals to DOUBLE: DuckDB would otherwise run this in DECIMAL
    # arithmetic (Spark literals are doubles) and the init grids diverge
    return (
        f"CAST(1.0 AS DOUBLE) + CAST(0.1 AS DOUBLE) * "
        f"(({idx} * {a} + {k} * {b}) % {m})"
    )


def q_plsa_topics(spark, sf_dir):
    """pLSA topic model (Hofmann 1999) trained by 3 relational EM rounds
    over the aggregated (doc, term, tf) table — the topic-mixture
    decomposition a curation pipeline uses for corpus composition audits
    and diversity-aware sampling, expressed entirely as joins + aggs on
    O(docs·vocab) rows (the dataflow LDA-at-scale systems run; no UDF, no
    driver state beyond the loop counter). E-step: p(k|d,w) ∝ θ_dk·φ_kw
    normalized per (d,w); M-step re-estimates both parameter tables with
    9-dp rounding after every normalization (the logreg_train/kmeans_geo
    unrolled-rounds protocol — the oracle replays the identical rounds as
    MATERIALIZED CTE chains). Deterministic modular-arithmetic init breaks
    the uniform-init symmetry identically in both engines. Output: top-5
    terms per topic. Scale shape: parameter tables are O(docs·K) and
    O(K·vocab); each round is two equi-joins + three aggs on the bounded
    cnt×K stream; vocab/doc pools bound everything (the dtw cohort
    posture)."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import doc_postings

    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PLSA_POOL)
        .select("doc_id", "text")
    )
    post = doc_postings(docs).localCheckpoint(eager=True)
    vocab = (
        post.groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .withColumn(
            "rw",
            F.row_number().over(Window.orderBy(F.col("cf").desc(), "term")),
        )
        .filter(F.col("rw") <= _PLSA_V)
        .select("term", "rw")
        .localCheckpoint(eager=True)
    )
    cnt = (
        post.join(vocab, "term")
        .select(F.col("doc_id").alias("d"), F.col("term").alias("w"), "rw", "tf")
        .localCheckpoint(eager=True)
    )
    ks = spark.range(_PLSA_K).select(F.col("id").cast("long").alias("k"))
    # deterministic init, normalized per row-group, 9-dp
    th_raw = (
        cnt.select("d")
        .distinct()
        .crossJoin(F.broadcast(ks))
        .withColumn("v", F.expr(_plsa_init("theta", "d", "k")))
    )
    th_norm = th_raw.groupBy("d").agg(F.sum("v").alias("z"))
    theta = (
        th_raw.join(th_norm, "d")
        .select("d", "k", F.round(F.col("v") / F.col("z"), 9).alias("th"))
        .localCheckpoint(eager=True)
    )
    ph_raw = vocab.crossJoin(F.broadcast(ks)).withColumn(
        "v", F.expr(_plsa_init("phi", "rw", "k"))
    )
    ph_norm = ph_raw.groupBy("k").agg(F.sum("v").alias("z"))
    phi = (
        ph_raw.join(ph_norm, "k")
        .select("k", F.col("term").alias("w"), F.round(F.col("v") / F.col("z"), 9).alias("ph"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_PLSA_R):
        j = (
            cnt.join(theta, "d")
            .join(phi, ["k", "w"])
            .withColumn("pr", F.round(F.col("th") * F.col("ph"), 9))
        )
        z = j.groupBy("d", "w").agg(F.round(F.sum("pr"), 9).alias("z"))
        wgt = (
            j.join(z, ["d", "w"])
            .withColumn("p", F.round(F.col("pr") / F.col("z"), 9))
            .withColumn("wt", F.round(F.col("tf") * F.col("p"), 9))
            .select("d", "w", "k", "wt")
            .localCheckpoint(eager=True)
        )
        s_kw = wgt.groupBy("k", "w").agg(F.round(F.sum("wt"), 9).alias("s"))
        tot_k = s_kw.groupBy("k").agg(F.round(F.sum("s"), 9).alias("tot"))
        phi = (
            s_kw.join(tot_k, "k")
            .select("k", "w", F.round(F.col("s") / F.col("tot"), 9).alias("ph"))
            .localCheckpoint(eager=True)
        )
        s_dk = wgt.groupBy("d", "k").agg(F.round(F.sum("wt"), 9).alias("s"))
        tot_d = s_dk.groupBy("d").agg(F.round(F.sum("s"), 9).alias("tot"))
        theta = (
            s_dk.join(tot_d, "d")
            .select("d", "k", F.round(F.col("s") / F.col("tot"), 9).alias("th"))
            .localCheckpoint(eager=True)
        )
    top = Window.partitionBy("k").orderBy(F.col("ph").desc(), "w")
    return (
        phi.withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _PLSA_TOP)
        .select(
            "k",
            F.col("w").alias("term"),
            (F.floor(F.col("ph") * 1e6) / 1e6).alias("phi"),
            "rk",
        )
        .orderBy("k", "rk")
    )


def _plsa_topics_sql() -> str:
    from raptor_service_spark.operators.bm25 import TOKEN_PATTERN

    rounds = []
    prev_th, prev_ph = "theta0", "phi0"
    for r in range(1, _PLSA_R + 1):
        rounds.append(
            f"""
        j{r} AS (
            SELECT cnt.d, cnt.w, t.k, cnt.tf,
                   ROUND(t.th * p.ph, 9) AS pr
            FROM cnt JOIN {prev_th} t ON cnt.d = t.d
                     JOIN {prev_ph} p ON p.k = t.k AND p.w = cnt.w),
        z{r} AS (SELECT d, w, ROUND(SUM(pr), 9) AS z FROM j{r} GROUP BY 1, 2),
        wgt{r} AS MATERIALIZED (
            SELECT j.d, j.w, j.k,
                   ROUND(j.tf * ROUND(j.pr / z.z, 9), 9) AS wt
            FROM j{r} j JOIN z{r} z ON j.d = z.d AND j.w = z.w),
        skw{r} AS (SELECT k, w, ROUND(SUM(wt), 9) AS s
                   FROM wgt{r} GROUP BY 1, 2),
        totk{r} AS (SELECT k, ROUND(SUM(s), 9) AS tot FROM skw{r} GROUP BY 1),
        phi{r} AS MATERIALIZED (
            SELECT s.k, s.w, ROUND(s.s / t.tot, 9) AS ph
            FROM skw{r} s JOIN totk{r} t ON s.k = t.k),
        sdk{r} AS (SELECT d, k, ROUND(SUM(wt), 9) AS s
                   FROM wgt{r} GROUP BY 1, 2),
        totd{r} AS (SELECT d, ROUND(SUM(s), 9) AS tot FROM sdk{r} GROUP BY 1),
        theta{r} AS MATERIALIZED (
            SELECT s.d, s.k, ROUND(s.s / t.tot, 9) AS th
            FROM sdk{r} s JOIN totd{r} t ON s.d = t.d)"""
        )
        prev_th, prev_ph = f"theta{r}", f"phi{r}"
    chain = ",".join(rounds)
    th_init = _plsa_init("theta", "d", "k")
    ph_init = _plsa_init("phi", "rw", "k")
    return f"""
        WITH pool AS (SELECT doc_id, text FROM documents
                      WHERE doc_id < {_PLSA_POOL}),
        post AS MATERIALIZED (
            SELECT doc_id, t.term, COUNT(*) AS tf
            FROM pool,
                 unnest(regexp_extract_all(lower(text),
                        '{TOKEN_PATTERN}', 0)) AS t(term)
            GROUP BY 1, 2),
        vocab AS MATERIALIZED (
            SELECT term, rw FROM (
                SELECT term,
                       ROW_NUMBER() OVER (ORDER BY SUM(tf) DESC, term) AS rw
                FROM post GROUP BY term)
            WHERE rw <= {_PLSA_V}),
        cnt AS MATERIALIZED (
            SELECT p.doc_id AS d, p.term AS w, v.rw, p.tf
            FROM post p JOIN vocab v ON p.term = v.term),
        ks AS (SELECT CAST(UNNEST(generate_series(0, {_PLSA_K - 1})) AS BIGINT)
                   AS k),
        thraw AS (
            SELECT d, k, {th_init} AS v
            FROM (SELECT DISTINCT d FROM cnt), ks),
        theta0 AS MATERIALIZED (
            SELECT t.d, t.k, ROUND(t.v / z.z, 9) AS th
            FROM thraw t JOIN (SELECT d, SUM(v) AS z FROM thraw GROUP BY 1) z
              ON t.d = z.d),
        phraw AS (
            SELECT v.term AS w, k, {ph_init} AS v
            FROM vocab v, ks),
        phi0 AS MATERIALIZED (
            SELECT p.k, p.w, ROUND(p.v / z.z, 9) AS ph
            FROM phraw p JOIN (SELECT k, SUM(v) AS z FROM phraw GROUP BY 1) z
              ON p.k = z.k),{chain}
        SELECT k, w AS term, FLOOR(ph * 1e6) / 1e6 AS phi, rk
        FROM (SELECT k, w, ph,
                     CAST(ROW_NUMBER() OVER (PARTITION BY k
                          ORDER BY ph DESC, w) AS BIGINT) AS rk
              FROM phi{_PLSA_R})
        WHERE rk <= {_PLSA_TOP}
        ORDER BY k, rk
    """


# ---------------------------------------------------------------------------
# Epanechnikov KDE hotspot surface (session 10)
# ---------------------------------------------------------------------------

_KDE_RES, _KDE_K, _KDE_TOPK = 4, 2, 20


def q_kde_hotspots(spark, sf_dir):
    """Kernel density estimate over the tile grid — the smoothed hotspot
    surface (heat map) next to the raw-count family (hot_cells = argmax
    counts, cell_kring_smooth = uniform ring mean, getis_hotspots =
    significance): density(c) = Σ_{|Δ|∞ ≤ 2} n(c+Δ)·K(r) with the
    Epanechnikov kernel K(r) = 1 − (r/3)² at Chebyshev ring distance r.
    Scaled ×9 the weights are the INTEGERS {9, 8, 5}, so the whole surface
    is exact integer arithmetic — no float protocol at all. One count agg
    + a 25-offset JVM-side explode + one ring join (the kring_smooth
    dataflow); top-20 densest cells."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.neighborhood import (
        _offsets,
        kring_neighbor_col,
    )

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    cnt = d.groupBy(cell_encode_col(lat, lng, _KDE_RES).alias("cell")).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    terms = [
        F.struct(
            kring_neighbor_col("cell", _KDE_RES, dx, dy).alias("nbr"),
            F.lit(9 - max(abs(dx), abs(dy)) ** 2).cast("long").alias("w"),
        )
        for dx, dy in _offsets(_KDE_K)
    ]
    pairs = cnt.select(
        "cell",
        "n_points",
        F.explode(F.filter(F.array(*terms), lambda s: s["nbr"].isNotNull())).alias(
            "t"
        ),
    ).select("cell", "n_points", F.col("t.nbr").alias("nbr"), F.col("t.w").alias("w"))
    ring = pairs.join(
        cnt.select(F.col("cell").alias("nbr"), F.col("n_points").alias("np2")),
        "nbr",
        "left",
    )
    kde = ring.groupBy("cell").agg(
        F.max("n_points").alias("n_points"),
        F.sum(F.coalesce("np2", F.lit(0)) * F.col("w")).alias("kde_x9"),
    )
    top = Window.orderBy(F.col("kde_x9").desc(), "cell")
    return (
        kde.withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _KDE_TOPK)
        .select("cell", "n_points", F.col("kde_x9").cast("long").alias("kde_x9"), "rk")
    )


def _kde_hotspots_sql() -> str:
    from raptor_service_spark.operators.neighborhood import (
        _offsets,
        kring_neighbor_sql,
    )

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _KDE_RES)
    offs = ", ".join(
        f"({dx}, {dy}, {9 - max(abs(dx), abs(dy)) ** 2})"
        for dx, dy in _offsets(_KDE_K)
    )
    nbr = kring_neighbor_sql("c.cell", _KDE_RES, "o.dx", "o.dy")
    return f"""
        WITH c AS (SELECT {cell} AS cell, COUNT(*) AS n_points
                   FROM documents GROUP BY 1),
        p AS (SELECT c.cell, c.n_points, {nbr} AS nbr, o.w
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy, w)
              WHERE {nbr} IS NOT NULL),
        k AS (SELECT p.cell, MAX(p.n_points) AS n_points,
                     CAST(SUM(COALESCE(c2.n_points, 0) * p.w) AS BIGINT)
                         AS kde_x9
              FROM p LEFT JOIN c c2 ON p.nbr = c2.cell
              GROUP BY 1)
        SELECT cell, n_points, kde_x9, rk FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY kde_x9 DESC, cell)
                           AS BIGINT) AS rk
            FROM k)
        WHERE rk <= {_KDE_TOPK}
    """


# ---------------------------------------------------------------------------
# hard-negative mining for contrastive training (session 10)
# ---------------------------------------------------------------------------

_HN_Q, _HN_POOL, _HN_K, _HN_RES = 30, 400, 4, 2


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining — the training-data op behind contrastive
    retrieval fine-tuning (DPR/SimCSE style): for each query document,
    the top-k most-similar candidates that are NOT its positives. The
    positive proxy here is spatial co-location (same res-2 tile — the
    tile tree's own notion of relatedness), so a hard negative is a
    high-cosine vector from a DIFFERENT tile: maximally confusing,
    maximally informative gradient. One bounded q×pool broadcast scoring
    join (at corpus scale the candidate side comes from the ANN index —
    grid_knn_ann's ring planner — instead of a full pool scan; this
    bounded pool is the declared parity twin), exact fold cosine,
    per-query top-4 window."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lat, lng = _latlng_cols(F.col("vec_id"))
    cells = emb.select(
        "vec_id", "embedding", cell_encode_col(lat, lng, _HN_RES).alias("cell")
    )
    q = cells.filter(F.col("vec_id") < _HN_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("vq"),
        F.col("cell").alias("qcell"),
    )
    c = cells.filter(F.col("vec_id") < _HN_POOL).select(
        F.col("vec_id").alias("neg_id"),
        F.col("embedding").alias("vc"),
        F.col("cell").alias("ccell"),
    )
    dot = F.aggregate(
        F.zip_with("vq", "vc", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nq = F.sqrt(
        F.aggregate(
            "vq", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nc = F.sqrt(
        F.aggregate(
            "vc", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    pairs = (
        q.join(
            F.broadcast(c),
            (F.col("qid") != F.col("neg_id")) & (F.col("qcell") != F.col("ccell")),
        )
        .withColumn("cosine", F.round(dot / (nq * nc), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "neg_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _HN_K)
        .select("qid", "neg_id", "cosine", "rk")
        .orderBy("qid", "rk")
    )


def _hard_negatives_sql() -> str:
    lat, lng = _latlng_sql("vec_id")
    cell = cell_encode_sql(lat, lng, _HN_RES)
    da = "list_transform(q.vq, x -> CAST(x AS DOUBLE))"
    db = "list_transform(c.vc, x -> CAST(x AS DOUBLE))"
    cos = f"list_cosine_similarity({da}, {db})"
    return f"""
        WITH cells AS (
            SELECT vec_id, embedding, {cell} AS cell FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS vq, cell AS qcell
              FROM cells WHERE vec_id < {_HN_Q}),
        c AS (SELECT vec_id AS neg_id, embedding AS vc, cell AS ccell
              FROM cells WHERE vec_id < {_HN_POOL}),
        pairs AS (
            SELECT q.qid, c.neg_id, ROUND({cos}, 6) AS cosine
            FROM q JOIN c
              ON q.qid != c.neg_id AND q.qcell != c.ccell)
        SELECT qid, neg_id, cosine, rk FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, neg_id) AS BIGINT) AS rk
            FROM pairs)
        WHERE rk <= {_HN_K}
        ORDER BY qid, rk
    """


# ---------------------------------------------------------------------------
# sampled-source betweenness centrality (Brandes, H-bounded) (session 10)
# ---------------------------------------------------------------------------

_BTW_SEEDS, _BTW_H, _BTW_RES, _BTW_TOPK = 2, 4, 4, 15


def q_betweenness_cells(spark, sf_dir):
    """Sampled-source betweenness centrality of the occupied res-4 cell
    lattice — WHICH tiles carry the through-traffic (the corridor/bridge
    detector next to pagerank's popularity and kcore's density). Exact
    Brandes (2001) from the 2 busiest cells, horizon-bounded at H=4 hops
    (the standard sampling + bounded-depth estimator — exact betweenness
    is all-sources): forward level-synchronous BFS accumulates σ
    (shortest-path COUNTS — exact integers), backward pass accumulates
    the dependency δ(v) = Σ_w σv/σw·(1+δw) hop by hop with 9-dp rounds.
    Spark: one frontier equi-join + anti-join per forward hop, one
    3-table join per backward hop, seeds on concurrent threads over ONE
    shared adjacency (the graph_eccentricity posture). Oracle: the
    identical hops unrolled as CTE chains per seed."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import _adjacency, brandes_bounded

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ = d.select(cell_encode_col(lat, lng, _BTW_RES).alias("cell"))
    seeds = sorted(
        r.cell
        for r in occ.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "cell")
        .limit(_BTW_SEEDS)
        .collect()
    )
    occ_d = occ.distinct().localCheckpoint(eager=True)
    edges = _adjacency(occ_d, _BTW_RES).localCheckpoint(eager=True)

    def _one_seed(s):
        return brandes_bounded(occ_d, s, _BTW_RES, max_hops=_BTW_H, edges=edges)

    with ThreadPoolExecutor(max_workers=len(seeds)) as ex:
        parts = list(ex.map(_one_seed, seeds))
    alld = parts[0]
    for p in parts[1:]:
        alld = alld.unionByName(p)
    btw = alld.groupBy("cell").agg(F.round(F.sum("delta"), 9).alias("btw"))
    top = Window.orderBy(F.col("btw").desc(), "cell")
    return (
        btw.filter(F.col("btw") > 0)
        .withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _BTW_TOPK)
        .select("cell", (F.floor(F.col("btw") * 1e6) / 1e6).alias("btw"), "rk")
    )


def _betweenness_cells_sql() -> str:
    from raptor_service_spark.operators.cell_graph import _RING

    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _BTW_RES)
    nbr = kring_neighbor_sql("o.cell", _BTW_RES, "v.dx", "v.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    ctes = []
    unions = []
    for si in range(_BTW_SEEDS):
        seed = (
            f"(SELECT cell FROM (SELECT cell, COUNT(*) AS c FROM base "
            f"GROUP BY 1 ORDER BY c DESC, cell LIMIT 1 OFFSET {si}))"
        )
        ctes.append(
            f"f{si}_0 AS (SELECT cell, CAST(1 AS BIGINT) AS sigma "
            f"FROM occ WHERE cell = {seed})"
        )
        ctes.append(f"v{si}_0 AS (SELECT cell FROM f{si}_0)")
        for h in range(1, _BTW_H + 1):
            ctes.append(
                f"""f{si}_{h} AS (
                SELECT e.dst AS cell, CAST(SUM(f.sigma) AS BIGINT) AS sigma
                FROM f{si}_{h - 1} f JOIN e ON e.src = f.cell
                WHERE e.dst NOT IN (SELECT cell FROM v{si}_{h - 1})
                GROUP BY 1)"""
            )
            ctes.append(
                f"v{si}_{h} AS (SELECT cell FROM v{si}_{h - 1} "
                f"UNION ALL SELECT cell FROM f{si}_{h})"
            )
        ctes.append(
            f"d{si}_{_BTW_H} AS (SELECT cell, sigma, "
            f"CAST(0.0 AS DOUBLE) AS delta FROM f{si}_{_BTW_H})"
        )
        unions.append(f"SELECT cell, delta FROM d{si}_{_BTW_H}")
        for h in range(_BTW_H - 1, 0, -1):
            ctes.append(
                f"""d{si}_{h} AS (
                SELECT u.cell, u.sigma,
                       ROUND(COALESCE(c.dsum, CAST(0.0 AS DOUBLE)), 9)
                           AS delta
                FROM f{si}_{h} u LEFT JOIN (
                    SELECT e.src AS ucell,
                           ROUND(SUM(ROUND(CAST(u2.sigma AS DOUBLE)
                                 / CAST(w.sigma AS DOUBLE)
                                 * (CAST(1.0 AS DOUBLE) + w.delta), 9)), 9)
                               AS dsum
                    FROM f{si}_{h} u2
                    JOIN e ON e.src = u2.cell
                    JOIN d{si}_{h + 1} w ON w.cell = e.dst
                    GROUP BY 1) c ON c.ucell = u.cell)"""
            )
            unions.append(f"SELECT cell, delta FROM d{si}_{h}")
    chain = ",\n        ".join(ctes)
    union = "\n            UNION ALL ".join(unions)
    return f"""
        WITH base AS (SELECT {cell} AS cell FROM documents),
        occ AS MATERIALIZED (SELECT DISTINCT cell FROM base),
        e AS MATERIALIZED (
            SELECT o.cell AS src, {nbr} AS dst
            FROM occ o CROSS JOIN (VALUES {offs}) v(dx, dy)
            WHERE {nbr} IS NOT NULL
              AND {nbr} IN (SELECT cell FROM occ)),
        {chain},
        alld AS ({union}),
        btw AS (SELECT cell, ROUND(SUM(delta), 9) AS btw
                FROM alld GROUP BY 1)
        SELECT cell, FLOOR(btw * 1e6) / 1e6 AS btw, rk FROM (
            SELECT cell, btw,
                   CAST(ROW_NUMBER() OVER (ORDER BY btw DESC, cell)
                        AS BIGINT) AS rk
            FROM btw WHERE btw > 0)
        WHERE rk <= {_BTW_TOPK}
    """


# ---------------------------------------------------------------------------
# temporal 2-path motifs over the timed transition graph (session 10)
# ---------------------------------------------------------------------------

_TM_POOL, _TM_RES, _TM_WIN, _TM_TOPK = 200, 3, 900, 20


def q_temporal_motifs(spark, sf_dir):
    """Temporal 2-path motif counting (Paranjape et al. 2017) over the
    timed cell-transition graph: edges are user moves a→b stamped at the
    arrival second; a motif is a→b (t₁) followed by b→c (t₂) BY ANY USER
    with 0 < t₂−t₁ ≤ 15 min — the flow-relay structure plain OD counts
    cannot see (od_triangles counts the untimed closure; this counts the
    time-respecting wedge, split into pass-through c≠a vs bounce-back
    c=a). Spark: the edge-table self-join on the middle cell is bucketed
    by 15-min epoch (each left edge probes buckets {h, h+1} via a 2-value
    explode, then the exact window refines — the knox/asof ring-join
    posture, never a full time-cross product). All-integer output."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _TM_POOL)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    sec = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000)
    ).cast("long")
    pts = ev.select(
        "user_id",
        sec.alias("t"),
        F.col("event_id").alias("e"),
        cell_encode_col(lat, lng, _TM_RES).alias("cell"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "e")
    mv = (
        pts.withColumn("src", F.lag("cell").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("cell")))
        .select("src", F.col("cell").alias("dst"), "t")
        .localCheckpoint(eager=True)
    )
    left = mv.select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("t").alias("t1"),
        F.explode(
            F.array(
                F.floor(F.col("t") / _TM_WIN).cast("long"),
                (F.floor(F.col("t") / _TM_WIN) + 1).cast("long"),
            )
        ).alias("hb"),
    )
    right = mv.select(
        F.col("src").alias("b2"),
        F.col("dst").alias("c"),
        F.col("t").alias("t2"),
        F.floor(F.col("t") / _TM_WIN).cast("long").alias("hb2"),
    )
    wedges = left.join(
        right, (F.col("b") == F.col("b2")) & (F.col("hb") == F.col("hb2"))
    ).filter((F.col("t2") > F.col("t1")) & (F.col("t2") <= F.col("t1") + _TM_WIN))
    counted = wedges.groupBy("a", "b", "c").agg(F.count(F.lit(1)).alias("n_motifs"))
    top = Window.orderBy(F.col("n_motifs").desc(), "a", "b", "c")
    return (
        counted.withColumn(
            "kind",
            F.when(F.col("c") == F.col("a"), F.lit("bounce")).otherwise(
                F.lit("relay")
            ),
        )
        .withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _TM_TOPK)
        .select("a", "b", "c", "kind", "n_motifs", "rk")
    )


def _temporal_motifs_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, _TM_RES)
    return f"""
        WITH p AS (
            SELECT user_id,
                   CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT) AS t,
                   event_id AS e, {cell} AS cell
            FROM events WHERE user_id < {_TM_POOL}),
        mv AS (
            SELECT src, cell AS dst, t FROM (
                SELECT cell, t,
                       LAG(cell) OVER (PARTITION BY user_id
                                       ORDER BY t, e) AS src
                FROM p)
            WHERE src IS NOT NULL AND src != cell),
        wedges AS (
            SELECT m1.src AS a, m1.dst AS b, m2.dst AS c
            FROM mv m1 JOIN mv m2
              ON m2.src = m1.dst
             AND m2.t > m1.t AND m2.t <= m1.t + {_TM_WIN}),
        counted AS (
            SELECT a, b, c, COUNT(*) AS n_motifs
            FROM wedges GROUP BY 1, 2, 3)
        SELECT a, b, c, kind, n_motifs, rk FROM (
            SELECT a, b, c,
                   CASE WHEN c = a THEN 'bounce' ELSE 'relay' END AS kind,
                   n_motifs,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_motifs DESC, a, b, c)
                        AS BIGINT) AS rk
            FROM counted)
        WHERE rk <= {_TM_TOPK}
    """


# ---------------------------------------------------------------------------
# query clarity score (query-performance prediction) (session 10)
# ---------------------------------------------------------------------------

_CLARITY_QUERIES = [
    ("q_vector", ["vector", "merge", "stream"]),
    ("q_filter", ["filter", "group"]),
    ("q_scan", ["scan", "join"]),
]
_CLARITY_K = 10


def q_clarity_score(spark, sf_dir):
    """Query clarity score (Cronen-Townsend et al. 2002) — the classic
    query-performance predictor: KL divergence between the language model
    of the top-k retrieved documents and the corpus LM. A focused query's
    results share a vocabulary (high clarity); an ambiguous one's results
    look like the corpus (≈ 0). P(w|Q) = Σ_{d∈top10} P(w|d)/k with uniform
    result weights (deterministic), P(w|d) = tf/dl and P(w|C) = cf/total —
    ALL exact integer ratios, so only the ln term touches libm (the
    bm25/perplexity-proven discipline); per-term 9-dp pre-rounds. One
    postings table feeds the ranking, the result LMs, and the corpus LM
    for all three probe queries."""
    from raptor_service_spark.operators.bm25 import bm25_topk, doc_postings

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    post = doc_postings(docs).localCheckpoint(eager=True)
    dlen = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    corpus = post.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = post.agg(F.sum("tf").alias("tot"))
    outs = []
    for qid, terms in _CLARITY_QUERIES:
        top = bm25_topk(docs, list(terms), _CLARITY_K).select("doc_id")
        lm = (
            top.join(post, "doc_id")
            .join(dlen, "doc_id")
            .groupBy("term")
            .agg(
                F.round(
                    F.sum(
                        F.round(
                            F.col("tf")
                            / F.col("dl")
                            / F.lit(float(_CLARITY_K)),
                            9,
                        )
                    ),
                    9,
                ).alias("pwq")
            )
        )
        contrib = (
            lm.join(corpus, "term")
            .crossJoin(F.broadcast(total))
            .select(
                F.round(
                    F.col("pwq")
                    * F.log(
                        F.col("pwq") / (F.col("cf") / F.col("tot"))
                    ),
                    9,
                ).alias("c")
            )
        )
        outs.append(
            contrib.agg(
                F.lit(qid).alias("qid"),
                F.count(F.lit(1)).alias("n_terms"),
                F.round(F.sum("c"), 6).alias("clarity"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("qid")


def _clarity_score_sql() -> str:
    from raptor_service_spark.operators.bm25 import TOKEN_PATTERN, bm25_sql

    blocks = []
    for qid, terms in _CLARITY_QUERIES:
        kw = bm25_sql("documents", list(terms), _CLARITY_K)
        blocks.append(
            f"""
        SELECT '{qid}' AS qid,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               ROUND(SUM(c), 6) AS clarity
        FROM (
            SELECT ROUND(lm.pwq * LN(lm.pwq / (ccorpus.cf
                       / (SELECT tot FROM ctotal))), 9) AS c
            FROM (
                SELECT p.term,
                       ROUND(SUM(ROUND(p.tf / CAST(d.dl AS DOUBLE)
                                 / {float(_CLARITY_K)!r}, 9)), 9) AS pwq
                FROM (SELECT doc_id FROM ({kw})) t
                JOIN cpost p USING (doc_id)
                JOIN cdlen d USING (doc_id)
                GROUP BY p.term) lm
            JOIN ccorpus USING (term))"""
        )
    union = "\n        UNION ALL".join(blocks)
    # outer CTE names are c-prefixed: bm25_sql nests its own WITH (post,
    # dlen, ...) inside each block, and shadowed names trip a DuckDB
    # planner assertion ("recursive CTE scan without recursive CTE node")
    return f"""
        WITH cpost AS MATERIALIZED (
            SELECT doc_id, t.term, COUNT(*) AS tf
            FROM documents,
                 unnest(regexp_extract_all(lower(text),
                        '{TOKEN_PATTERN}', 0)) AS t(term)
            GROUP BY 1, 2),
        cdlen AS MATERIALIZED (SELECT doc_id, SUM(tf) AS dl FROM cpost
                               GROUP BY 1),
        ccorpus AS MATERIALIZED (SELECT term, SUM(tf) AS cf FROM cpost
                                 GROUP BY 1),
        ctotal AS (SELECT CAST(SUM(tf) AS DOUBLE) AS tot FROM cpost)
        SELECT * FROM ({union}) ORDER BY qid
    """


# ---------------------------------------------------------------------------
# ROUGE-1/2 overlap scoring of blocked candidate pairs (session 10)
# ---------------------------------------------------------------------------

_ROUGE_POOL, _ROUGE_WIN, _ROUGE_TOPK = 150, 2, 20


def q_rouge_pairs(spark, sf_dir):
    """ROUGE-1/ROUGE-2 F1 between blocked candidate document pairs — the
    summary/paraphrase overlap metric (Lin 2004) a curation pipeline uses
    to grade near-duplicate aggressiveness and summary faithfulness.
    Candidates come from sorted-neighborhood blocking (normalized text
    key, each record vs its 2 successors — the snm_pairs O(n·w) posture)
    over the duplicated corpus; per pair, F1 = 2·overlap/(len_a+len_b)
    with overlap = Σ_g min(tf_a(g), tf_b(g)) — ALL exact integer ratios,
    zero float protocol beyond the final exact division. One token agg +
    one bigram agg feed every pair via two (pair ⋈ grams) joins; planted
    twins surface at F1 = 1.0."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import tokenize

    d = _docs_with_dups(spark, sf_dir).filter(
        (F.col("doc_id") % 1000000) < _ROUGE_POOL
    )
    key = F.lower(F.substring(F.trim("text"), 1, 24))
    w = Window.orderBy("key", "doc_id")
    ranked = d.select("doc_id", key.alias("key")).withColumn(
        "rn", F.row_number().over(w)
    ).localCheckpoint(eager=True)
    a = ranked.select(F.col("doc_id").alias("id_a"), F.col("rn").alias("ra"))
    b = ranked.select(F.col("doc_id").alias("id_b"), F.col("rn").alias("rb"))
    pairs = a.join(
        b,
        (F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + _ROUGE_WIN),
    ).select("id_a", "id_b")
    toks = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("g"))
    uni = toks.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    ulen = uni.groupBy("doc_id").agg(F.sum("c").alias("len"))
    big = (
        d.select("doc_id", tokenize(F.col("text")).alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), "
                    "i -> concat(ws[i - 1], ' ', ws[i]))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    blen = big.groupBy("doc_id").agg(F.sum("c").alias("len"))

    def overlap(grams):
        ga = grams.select(
            F.col("doc_id").alias("id_a"), "g", F.col("c").alias("ca")
        )
        gb = grams.select(
            F.col("doc_id").alias("id_b"), "g", F.col("c").alias("cb")
        )
        return (
            pairs.join(ga, "id_a")
            .join(gb, ["id_b", "g"])
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.least("ca", "cb")).alias("ov"))
        )
    o1 = overlap(uni).withColumnRenamed("ov", "ov1")
    o2 = overlap(big).withColumnRenamed("ov", "ov2")
    la1 = ulen.select(F.col("doc_id").alias("id_a"), F.col("len").alias("la1"))
    lb1 = ulen.select(F.col("doc_id").alias("id_b"), F.col("len").alias("lb1"))
    la2 = blen.select(F.col("doc_id").alias("id_a"), F.col("len").alias("la2"))
    lb2 = blen.select(F.col("doc_id").alias("id_b"), F.col("len").alias("lb2"))
    scored = (
        pairs.join(o1, ["id_a", "id_b"], "left")
        .join(o2, ["id_a", "id_b"], "left")
        .join(la1, "id_a")
        .join(lb1, "id_b")
        .join(la2, "id_a", "left")
        .join(lb2, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            F.round(
                (F.lit(2) * F.coalesce("ov1", F.lit(0)))
                / (F.col("la1") + F.col("lb1")),
                6,
            ).alias("rouge1_f"),
            F.when(
                (F.coalesce("la2", F.lit(0)) + F.coalesce("lb2", F.lit(0))) > 0,
                F.round(
                    (F.lit(2) * F.coalesce("ov2", F.lit(0)))
                    / (F.coalesce("la2", F.lit(0)) + F.coalesce("lb2", F.lit(0))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("rouge2_f"),
        )
    )
    top = Window.orderBy(
        F.col("rouge2_f").desc(), F.col("rouge1_f").desc(), "id_a", "id_b"
    )
    return (
        scored.withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _ROUGE_TOPK)
        .select("id_a", "id_b", "rouge1_f", "rouge2_f", "rk")
    )


def _rouge_pairs_sql() -> str:
    from raptor_service_spark.operators.bm25 import TOKEN_PATTERN

    return f"""
        WITH d AS MATERIALIZED (
            SELECT doc_id, text FROM {_DOCS_WITH_DUPS_SQL}
            WHERE doc_id % 1000000 < {_ROUGE_POOL}),
        ranked AS MATERIALIZED (
            SELECT doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY lower(substring(trim(text), 1, 24)), doc_id)
                       AS rn
            FROM d),
        pairs AS MATERIALIZED (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ranked a JOIN ranked b
              ON b.rn > a.rn AND b.rn <= a.rn + {_ROUGE_WIN}),
        uni AS MATERIALIZED (
            SELECT doc_id, t.g, COUNT(*) AS c
            FROM d, unnest(regexp_extract_all(lower(text),
                           '{TOKEN_PATTERN}', 0)) AS t(g)
            GROUP BY 1, 2),
        ulen AS (SELECT doc_id, SUM(c) AS len FROM uni GROUP BY 1),
        big AS MATERIALIZED (
            SELECT doc_id, g, COUNT(*) AS c FROM (
                SELECT doc_id,
                       ws[i - 1] || ' ' || ws[i] AS g
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text),
                                 '{TOKEN_PATTERN}', 0) AS ws
                      FROM d),
                     unnest(generate_series(2, len(ws))) AS s(i)
                WHERE len(ws) >= 2)
            GROUP BY 1, 2),
        blen AS (SELECT doc_id, SUM(c) AS len FROM big GROUP BY 1),
        o1 AS (
            SELECT p.id_a, p.id_b, SUM(LEAST(ga.c, gb.c)) AS ov
            FROM pairs p
            JOIN uni ga ON ga.doc_id = p.id_a
            JOIN uni gb ON gb.doc_id = p.id_b AND gb.g = ga.g
            GROUP BY 1, 2),
        o2 AS (
            SELECT p.id_a, p.id_b, SUM(LEAST(ga.c, gb.c)) AS ov
            FROM pairs p
            JOIN big ga ON ga.doc_id = p.id_a
            JOIN big gb ON gb.doc_id = p.id_b AND gb.g = ga.g
            GROUP BY 1, 2),
        scored AS (
            SELECT p.id_a, p.id_b,
                   ROUND(CAST(2 * COALESCE(o1.ov, 0) AS DOUBLE)
                         / (la1.len + lb1.len), 6) AS rouge1_f,
                   CASE WHEN COALESCE(la2.len, 0) + COALESCE(lb2.len, 0) > 0
                        THEN ROUND(CAST(2 * COALESCE(o2.ov, 0) AS DOUBLE)
                             / (COALESCE(la2.len, 0) + COALESCE(lb2.len, 0)),
                             6)
                        ELSE CAST(0.0 AS DOUBLE) END AS rouge2_f
            FROM pairs p
            LEFT JOIN o1 ON o1.id_a = p.id_a AND o1.id_b = p.id_b
            LEFT JOIN o2 ON o2.id_a = p.id_a AND o2.id_b = p.id_b
            JOIN ulen la1 ON la1.doc_id = p.id_a
            JOIN ulen lb1 ON lb1.doc_id = p.id_b
            LEFT JOIN blen la2 ON la2.doc_id = p.id_a
            LEFT JOIN blen lb2 ON lb2.doc_id = p.id_b)
        SELECT id_a, id_b, rouge1_f, rouge2_f, rk FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                       ORDER BY rouge2_f DESC, rouge1_f DESC, id_a, id_b)
                       AS BIGINT) AS rk
            FROM scored)
        WHERE rk <= {_ROUGE_TOPK}
    """


# ---------------------------------------------------------------------------
# k-truss edge peeling (session 10)
# ---------------------------------------------------------------------------


def q_cell_ktruss(spark, sf_dir):
    """4-truss of the occupied res-5 document-cell lattice: iterative EDGE
    peeling by triangle support (every kept edge must sit in ≥ 2
    triangles among survivors) — strictly stronger cohesion than
    cell_kcore's degree rule; the community-skeleton extractor. Fixpoint
    within 4 rounds; the oracle unrolls the identical peel (monotone ⇒
    early convergence agrees; all-integer). Per round: one degree-bounded
    triangle enumeration + one count filter
    (operators/cell_graph.py:ktruss)."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import ktruss

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ = d.select(cell_encode_col(lat, lng, _ISO_RES).alias("cell"))
    return ktruss(occ, res=_ISO_RES, k=4, max_rounds=4)


def _cell_ktruss_sql() -> str:
    from raptor_service_spark.operators.cell_graph import ktruss_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _ISO_RES)
    return ktruss_sql(
        f"SELECT {cell} AS cell FROM documents", res=_ISO_RES, k=4, max_rounds=4
    )


# ---------------------------------------------------------------------------
# Good-Turing smoothing + Chao1 richness + Wilson CTR + SPRT (session 10)
# ---------------------------------------------------------------------------

_GT_MAX_R, _GT_POOL = 10, 200


def _trigram_counts(spark, sf_dir):
    """(gram, r) trigram frequency table over the bounded doc pool — the
    n-gram unit where the template corpus actually HAS a rare-count tail
    (its unigram vocabulary is 31 terms, all frequent), shared by
    good_turing and chao1_richness."""
    from raptor_service_spark.operators.bm25 import tokenize

    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _GT_POOL)
        .select("doc_id", "text")
    )
    return (
        docs.select(tokenize(F.col("text")).alias("ws"))
        .filter(F.size("ws") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 2), "
                    "i -> concat_ws(' ', ws[i - 1], ws[i], ws[i + 1]))"
                )
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("r"))
    )


def _trigram_counts_sql() -> str:
    from raptor_service_spark.operators.bm25 import TOKEN_PATTERN

    return f"""(
        SELECT g, COUNT(*) AS r FROM (
            SELECT array_to_string(w[i:i + 2], ' ') AS g
            FROM (SELECT regexp_extract_all(lower(text),
                         '{TOKEN_PATTERN}', 0) AS w
                  FROM documents WHERE doc_id < {_GT_POOL}),
                 unnest(generate_series(1, len(w) - 2)) AS s(i)
            WHERE len(w) >= 3)
        GROUP BY 1)"""


def q_good_turing(spark, sf_dir):
    """Good-Turing frequency re-estimation over the pool's TRIGRAM counts
    — the classical smoothing n-gram LM pipelines apply before trusting
    raw frequencies: r* = (r+1)·N_{r+1}/N_r from the count-of-counts
    table (N_r = how many grams occur exactly r times). Everything runs
    on two nested aggs of the gram table (O(grams) then O(max r) rows);
    exact integer ratios, r ≤ 10."""
    cf = _trigram_counts(spark, sf_dir)
    nr = cf.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    a = nr.select(F.col("r"), F.col("n_r"))
    b = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        a.join(b, "r", "left")
        .filter(F.col("r") <= _GT_MAX_R)
        .select(
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1) * F.coalesce("n_r1", F.lit(0)) / F.col("n_r"), 6
            ).alias("r_star"),
        )
        .orderBy("r")
    )


def _good_turing_sql() -> str:
    return f"""
        WITH post AS {_trigram_counts_sql()},
        nr AS (SELECT r, COUNT(*) AS n_r FROM post GROUP BY 1)
        SELECT a.r, a.n_r,
               ROUND(CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE)
                     / a.n_r, 6) AS r_star
        FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
        WHERE a.r <= {_GT_MAX_R}
        ORDER BY a.r
    """


def q_chao1_richness(spark, sf_dir):
    """Chao1 species-richness estimate of the pool's TRIGRAM inventory +
    Good's coverage — "how many distinct grams have we NOT seen yet", the
    sample-completeness audit next to heaps_law's growth curve: chao1 =
    D + n₁²/(2n₂) (singletons/doubletons), coverage = 1 − n₁/N. One gram
    agg + one count-of-counts agg; exact integer arithmetic into two
    final ratios."""
    cf = _trigram_counts(spark, sf_dir)
    return cf.agg(
        F.count(F.lit(1)).alias("d_obs"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("r") == 2, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum("r").alias("n_tokens"),
    ).select(
        "d_obs",
        "n1",
        "n2",
        F.round(
            F.col("d_obs")
            + F.col("n1") * F.col("n1") / (F.lit(2.0) * F.col("n2")),
            6,
        ).alias("chao1"),
        F.round(F.lit(1.0) - F.col("n1") / F.col("n_tokens"), 6).alias(
            "coverage"
        ),
    )


def _chao1_richness_sql() -> str:
    return f"""
        WITH post AS {_trigram_counts_sql()},
        s AS (SELECT COUNT(*) AS d_obs,
                     CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n1,
                     CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n2,
                     SUM(r) AS n_tokens
              FROM post)
        SELECT d_obs, n1, n2,
               ROUND(d_obs + n1 * n1 / (CAST(2.0 AS DOUBLE) * n2), 6)
                   AS chao1,
               ROUND(CAST(1.0 AS DOUBLE) - CAST(n1 AS DOUBLE) / n_tokens, 6)
                   AS coverage
        FROM s
    """


_WILSON_Z2 = 3.84  # z² at 95% (z = 1.96), an exact decimal literal


def q_wilson_ctr(spark, sf_dir):
    """Wilson-score lower-bound ranking of per-cell conversion rate
    (purchases out of click+purchase trials) — the small-sample-honest way
    to rank cells (a raw ratio lets a 1/1 cell beat a 90/100 cell): by the
    95% lower bound LB = (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²))/(1+z²/n).
    z² = 3.84 as an exact decimal literal, SQRT the only libm call (IEEE-
    exact); one (cell, type) agg feeds everything. Cells with ≥ 20
    clicks, top-20 by lower bound."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type")
    lat, lng = _latlng_cols(F.col("event_id"))
    counts = (
        ev.filter(F.col("event_type").isin(["click", "purchase"]))
        .select(
            cell_encode_col(lat, lng, 3).alias("cell"),
            "event_type",
        )
        .groupBy("cell")
        .agg(
            # trials = all click+purchase events, successes = purchases
            # (k <= n by construction — the Wilson formula's domain)
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
        .filter(F.col("n") >= 20)
    )
    z2 = F.lit(_WILSON_Z2)
    p = F.col("k") / F.col("n")
    n = F.col("n")
    lb = (
        p
        + z2 / (2 * n)
        - F.sqrt(z2) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    ) / (1 + z2 / n)
    scored = counts.select(
        "cell",
        "n",
        "k",
        F.round(p, 6).alias("ctr"),
        (F.floor(lb * 1e6) / 1e6).alias("wilson_lb"),
    )
    top = Window.orderBy(F.col("wilson_lb").desc(), "cell")
    return (
        scored.withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= 20)
        .select("cell", "n", "k", "ctr", "wilson_lb", "rk")
    )


def _wilson_ctr_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    z2 = f"CAST({_WILSON_Z2!r} AS DOUBLE)"
    p = "(CAST(k AS DOUBLE) / n)"
    lb = (
        f"(({p} + {z2} / (2 * n) - SQRT({z2}) * SQRT({p} * (1 - {p}) / n "
        f"+ {z2} / (4 * n * n))) / (1 + {z2} / n))"
    )
    return f"""
        WITH counts AS (
            SELECT {cell} AS cell,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS k
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY 1),
        ok AS (SELECT * FROM counts WHERE n >= 20),
        scored AS (
            SELECT cell, n, k, ROUND({p}, 6) AS ctr,
                   FLOOR({lb} * 1e6) / 1e6 AS wilson_lb
            FROM ok)
        SELECT cell, n, k, ctr, wilson_lb, rk FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY wilson_lb DESC, cell)
                           AS BIGINT) AS rk
            FROM scored)
        WHERE rk <= 20
    """


# ---------------------------------------------------------------------------
# SPRT sequential test monitor (session 10)
# ---------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1, _SPRT_AB = 0.3, 0.5, 0.05
_SPRT_CELLS, _SPRT_CAP = 3, 2000


def _sprt_consts() -> tuple[float, float, float, float]:
    """LLR increments and decision thresholds, precomputed ONCE in Python
    (exact double literals shared by both engines — the fold then touches
    no libm at runtime): win = ln(p1/p0), loss = ln((1−p1)/(1−p0)),
    A = ln((1−β)/α) accept-H1, B = ln(β/(1−α)) accept-H0."""
    import math

    w = math.log(_SPRT_P1 / _SPRT_P0)
    l = math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))
    a = math.log((1 - _SPRT_AB) / _SPRT_AB)
    b = math.log(_SPRT_AB / (1 - _SPRT_AB))
    return w, l, a, b


def _sprt_step_expr(ea, arr) -> str:
    """Wald SPRT fold step from ONE Python source: acc = [llr, decided,
    decided_at, i]; after a decision the walk freezes (only i advances).
    llr' substituted textually (no let bindings)."""
    w, l, a, b = _sprt_consts()
    llr, dec, dat, i = (ea("acc", k) for k in range(1, 5))
    z = ea("z", 1)
    ip = f"({i} + 1.0)"
    llrp = (
        f"round({llr} + (CASE WHEN {z} = 1.0 THEN CAST({w!r} AS DOUBLE) "
        f"ELSE CAST({l!r} AS DOUBLE) END), 9)"
    )
    decp = (
        f"(CASE WHEN {llrp} >= CAST({a!r} AS DOUBLE) THEN 1.0 "
        f"WHEN {llrp} <= CAST({b!r} AS DOUBLE) THEN -1.0 ELSE 0.0 END)"
    )
    return (
        f"CASE WHEN {dec} != 0.0 THEN {arr([llr, dec, dat, ip])} "
        f"ELSE {arr([llrp, decp, f'(CASE WHEN {decp} != 0.0 THEN {ip} ELSE 0.0 END)', ip])} END"
    )


def q_sprt_monitor(spark, sf_dir):
    """Wald's sequential probability ratio test per busy cell — the
    always-valid A/B monitor (decide H1: purchase share ≥ p1 = 0.5 vs H0:
    p0 = 0.3 the moment the evidence suffices, instead of waiting for a
    fixed n): the LLR random walk over the cell's (ts, event_id)-ordered
    click/purchase outcomes, frozen at the first threshold crossing.
    LLR increments and the A/B thresholds are Python-precomputed literals
    (NO runtime libm), so the fold is pure +/CASE arithmetic — ONE
    ordered array fold per cell (the kalman/holt discipline). 3 busiest
    cells (scalar-subquery recomputed in the oracle), first 2000
    outcomes each."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import cell_encode_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.filter(F.col("event_type").isin(["click", "purchase"])).select(
        cell_encode_col(lat, lng, 3).alias("cell"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("event_id").alias("e"),
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("x"),
    )
    top = [
        r.cell
        for r in pts.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "cell")
        .limit(_SPRT_CELLS)
        .collect()
    ]
    w = Window.partitionBy("cell").orderBy("t", "e")
    capped = (
        pts.filter(F.col("cell").isin(top))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SPRT_CAP)
    )
    series = capped.groupBy("cell").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(t, e, x))), "
            "s -> array(s.x))"
        ).alias("xs")
    )
    step = _sprt_step_expr(
        lambda n, i: f"element_at({n}, {i})",
        lambda parts: "array(" + ", ".join(parts) + ")",
    )
    fold = (
        "aggregate(xs, "
        "array(cast(0.0 as double), cast(0.0 as double), "
        "cast(0.0 as double), cast(0.0 as double)), "
        f"(acc, z) -> {step})"
    )
    out = series.select(
        "cell", F.size("xs").cast("long").alias("n_obs"), F.expr(fold).alias("st")
    )
    return out.select(
        "cell",
        "n_obs",
        (F.floor(F.expr("element_at(st, 1)") * 1e6) / 1e6).alias("final_llr"),
        F.when(F.expr("element_at(st, 2)") == 1.0, F.lit("accept_h1"))
        .when(F.expr("element_at(st, 2)") == -1.0, F.lit("accept_h0"))
        .otherwise(F.lit("undecided"))
        .alias("decision"),
        F.expr("element_at(st, 3)").cast("long").alias("decided_at"),
    ).orderBy("cell")


def _sprt_monitor_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    step = _sprt_step_expr(
        lambda n, i: f"{n}[{i}]",
        lambda parts: "[" + ", ".join(parts) + "]",
    )
    fold = (
        "list_reduce(list_prepend("
        "[CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), "
        "CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)], xs), "
        f"(acc, z) -> {step})"
    )
    top = (
        f"(SELECT cell FROM (SELECT cell, COUNT(*) AS c FROM p "
        f"GROUP BY 1 ORDER BY c DESC, cell LIMIT {_SPRT_CELLS}))"
    )
    return f"""
        WITH p AS (
            SELECT {cell} AS cell, epoch_us(ts) AS t, event_id AS e,
                   CASE WHEN event_type = 'purchase'
                        THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END AS x
            FROM events
            WHERE event_type IN ('click', 'purchase')),
        capped AS (
            SELECT cell, t, e, x FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                          ORDER BY t, e) AS rn
                FROM p WHERE cell IN {top})
            WHERE rn <= {_SPRT_CAP}),
        ser AS (
            SELECT cell,
                   list_transform(list_sort(list({{'t': t, 'e': e, 'x': x}})),
                                  s -> [s.x]) AS xs
            FROM capped GROUP BY cell),
        st AS (SELECT cell, CAST(len(xs) AS BIGINT) AS n_obs,
                      {fold} AS s
               FROM ser)
        SELECT cell, n_obs,
               FLOOR(s[1] * 1e6) / 1e6 AS final_llr,
               CASE WHEN s[2] = 1.0 THEN 'accept_h1'
                    WHEN s[2] = -1.0 THEN 'accept_h0'
                    ELSE 'undecided' END AS decision,
               CAST(s[3] AS BIGINT) AS decided_at
        FROM st ORDER BY cell
    """


# ---------------------------------------------------------------------------
# PPR sweep cut (local clustering) + rich-club coefficient (session 10)
# ---------------------------------------------------------------------------

_SWEEP_MAXK, _SWEEP_TOP = 50, 5


def q_ppr_sweep_cut(spark, sf_dir):
    """Local graph clustering by PPR sweep cut (Andersen-Chung-Lang 2006):
    rank cells by personalized-PageRank-over-degree from the hub seed,
    then find the prefix with minimum conductance φ(S) =
    cut(S)/min(vol(S), vol(V∖S)) — the hub's natural community boundary.
    The sweep is fully relational: every directed edge contributes +cnt
    at rank min(ru,rv) and −cnt at rank max(ru,rv), so cut(k) is ONE
    prefix-sum window over the delta table (no per-prefix rescan);
    volumes are a second cumsum. All-integer cut/vol → exact conductance
    ratios. Prefixes 2..50; top-5 lowest φ."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.cell_graph import ppr

    edges = (
        _od_cell_edges(spark, sf_dir)
        .withColumn("w", F.col("cnt").cast("double"))
        .localCheckpoint(eager=True)
    )
    seed = (
        edges.groupBy("dst")
        .agg(F.sum("cnt").alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("dst").asc())
        .limit(1)
        .collect()[0]["dst"]
    )
    scores = ppr(edges, seed=seed, n_iters=5, damping=0.85)
    deg = (
        edges.select(F.col("src").alias("cell"), "cnt")
        .unionByName(edges.select(F.col("dst").alias("cell"), "cnt"))
        .groupBy("cell")
        .agg(F.sum("cnt").alias("deg"))
    )
    ranked = (
        scores.join(deg, "cell")
        .withColumn("score", F.col("pr") / F.col("deg"))
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("score").desc(), "cell")),
        )
        .localCheckpoint(eager=True)
    )
    ru = ranked.select(F.col("cell").alias("src"), F.col("rn").alias("ru"))
    rv = ranked.select(F.col("cell").alias("dst"), F.col("rn").alias("rv"))
    espan = edges.join(ru, "src").join(rv, "dst")
    deltas = (
        espan.select(
            F.least("ru", "rv").alias("k"), F.col("cnt").alias("d")
        )
        .unionByName(
            espan.select(
                F.greatest("ru", "rv").alias("k"), (-F.col("cnt")).alias("d")
            )
        )
        .groupBy("k")
        .agg(F.sum("d").alias("d"))
    )
    wk = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(deltas, ranked.rn == deltas.k, "left")
        .select("rn", "deg", F.coalesce("d", F.lit(0)).alias("d"))
        .withColumn("cut", F.sum("d").over(wk).cast("long"))
        .withColumn("vol", F.sum("deg").over(wk).cast("long"))
        .withColumn("tot", F.sum("deg").over(Window.partitionBy()).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    scored = sweep.filter(
        (F.col("rn") >= 2)
        & (F.col("rn") <= _SWEEP_MAXK)
        & (F.col("rn") <= F.col("n") - 2)
    ).select(
        F.col("rn").alias("k"),
        "cut",
        F.col("vol").alias("vol_s"),
        F.round(
            F.col("cut") / F.least("vol", F.col("tot") - F.col("vol")), 6
        ).alias("conductance"),
    )
    top = Window.orderBy("conductance", "k")
    return (
        scored.withColumn("rk", F.row_number().over(top).cast("long"))
        .filter(F.col("rk") <= _SWEEP_TOP)
        .select("k", "cut", "vol_s", "conductance", "rk")
    )


def _ppr_sweep_cut_sql() -> str:
    from raptor_service_spark.operators.cell_graph import ppr_sql

    seed = (
        "(SELECT dst FROM e GROUP BY dst "
        "ORDER BY SUM(cnt) DESC, dst ASC LIMIT 1)"
    )
    edges = (
        f"SELECT src, dst, cnt, CAST(cnt AS DOUBLE) AS w "
        f"FROM ({_od_cell_edges_sql()})"
    )
    inner = ppr_sql(edges, seed=seed, n_iters=5, damping=0.85)
    return f"""
        WITH scores AS ({inner}),
        e2 AS MATERIALIZED ({_od_cell_edges_sql()}),
        deg AS (SELECT cell, SUM(cnt) AS deg FROM (
                    SELECT src AS cell, cnt FROM e2
                    UNION ALL SELECT dst, cnt FROM e2)
                GROUP BY 1),
        ranked AS MATERIALIZED (
            SELECT s.cell, d.deg,
                   ROW_NUMBER() OVER (ORDER BY s.pr / d.deg DESC, s.cell)
                       AS rn
            FROM scores s JOIN deg d ON s.cell = d.cell),
        espan AS (
            SELECT LEAST(ru.rn, rv.rn) AS lo, GREATEST(ru.rn, rv.rn) AS hi,
                   e2.cnt
            FROM e2 JOIN ranked ru ON e2.src = ru.cell
                    JOIN ranked rv ON e2.dst = rv.cell),
        deltas AS (
            SELECT k, SUM(d) AS d FROM (
                SELECT lo AS k, cnt AS d FROM espan
                UNION ALL SELECT hi, -cnt FROM espan)
            GROUP BY 1),
        sweep AS (
            SELECT r.rn,
                   CAST(SUM(COALESCE(dl.d, 0)) OVER (ORDER BY r.rn)
                        AS BIGINT) AS cut,
                   CAST(SUM(r.deg) OVER (ORDER BY r.rn) AS BIGINT) AS vol,
                   CAST(SUM(r.deg) OVER () AS BIGINT) AS tot,
                   COUNT(*) OVER () AS n
            FROM ranked r LEFT JOIN deltas dl ON dl.k = r.rn)
        SELECT k, cut, vol_s, conductance, rk FROM (
            SELECT rn AS k, cut, vol AS vol_s,
                   ROUND(CAST(cut AS DOUBLE)
                         / LEAST(vol, tot - vol), 6) AS conductance,
                   CAST(ROW_NUMBER() OVER (ORDER BY
                        ROUND(CAST(cut AS DOUBLE) / LEAST(vol, tot - vol), 6),
                        rn) AS BIGINT) AS rk
            FROM sweep
            WHERE rn >= 2 AND rn <= {_SWEEP_MAXK} AND rn <= n - 2)
        WHERE rk <= {_SWEEP_TOP}
    """


_RC_KS = [3, 5, 8]


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient of the res-4 occupied lattice: φ(k) =
    E_{>k} / (N_{>k}·(N_{>k}−1)) over DIRECTED edges among nodes of
    degree > k — do the hubs preferentially interconnect? (Colizza 2006;
    the hub-wiring audit next to degree_assortativity's global mixing.)
    One degree agg + one edge semi-join per k (3 literal thresholds);
    all-integer counts into exact ratios."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.cell_graph import _adjacency

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ = d.select(cell_encode_col(lat, lng, 4).alias("cell")).distinct()
    occ = occ.localCheckpoint(eager=True)
    edges = _adjacency(occ, 4).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    outs = []
    for k in _RC_KS:
        rich = deg.filter(F.col("deg") > k).select("src")
        n = rich.count()
        e = (
            edges.join(rich, "src")
            .join(rich.select(F.col("src").alias("dst")), "dst")
            .count()
        )
        # floor-truncation, not Python round (half-to-even) — mirrors the
        # oracle's FLOOR(x*1e6)/1e6 on the identical double
        import math

        phi = math.floor(e / (n * (n - 1)) * 1e6) / 1e6 if n >= 2 else 0.0
        outs.append((k, n, e, phi))
    return spark.createDataFrame(
        outs, "k long, n_rich long, e_rich long, phi double"
    ).orderBy("k")


def _rich_club_sql() -> str:
    from raptor_service_spark.operators.cell_graph import _RING

    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, 4)
    nbr = kring_neighbor_sql("o.cell", 4, "v.dx", "v.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    blocks = []
    for k in _RC_KS:
        blocks.append(
            f"""
        SELECT CAST({k} AS BIGINT) AS k,
               (SELECT COUNT(*) FROM deg WHERE deg > {k}) AS n_rich,
               CAST(COUNT(*) AS BIGINT) AS e_rich,
               CASE WHEN (SELECT COUNT(*) FROM deg WHERE deg > {k}) >= 2
                    THEN FLOOR(CAST(COUNT(*) AS DOUBLE)
                         / ((SELECT COUNT(*) FROM deg WHERE deg > {k})
                            * ((SELECT COUNT(*) FROM deg WHERE deg > {k})
                               - 1)) * 1e6) / 1e6
                    ELSE CAST(0.0 AS DOUBLE) END AS phi
        FROM e
        WHERE src IN (SELECT src FROM deg WHERE deg > {k})
          AND dst IN (SELECT src FROM deg WHERE deg > {k})"""
        )
    union = "\n        UNION ALL".join(blocks)
    return f"""
        WITH occ AS (SELECT DISTINCT {cell} AS cell FROM documents),
        e AS MATERIALIZED (
            SELECT o.cell AS src, {nbr} AS dst
            FROM occ o CROSS JOIN (VALUES {offs}) v(dx, dy)
            WHERE {nbr} IS NOT NULL
              AND {nbr} IN (SELECT cell FROM occ)),
        deg AS MATERIALIZED (
            SELECT src, COUNT(*) AS deg FROM e GROUP BY 1)
        SELECT * FROM ({union}) ORDER BY k
    """


# ---------------------------------------------------------------------------
# randomized response (local DP) + bivariate Moran (session 10)
# ---------------------------------------------------------------------------

_RR_Q = 0.3


def q_randomized_response(spark, sf_dir):
    """Warner's randomized response — the LOCAL-DP collection primitive
    next to dp_cell_counts' central-DP release: each user reports whether
    they ever purchased, but flips the answer with probability q = 0.3
    (coin = md5 of the user id — the seeded-mechanism replay discipline);
    the collector debiases p̂ = (p_obs − q)/(1 − 2q). The query audits the
    whole mechanism: true proportion (computable here), observed noisy
    proportion, debiased estimate, and |error| — all exact integer counts
    into exact-ratio arithmetic (q an exact decimal literal)."""
    ev = _read(spark, sf_dir, "events").select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "truth"
        )
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("rr|"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    reported = users.select(
        "truth",
        F.when(coin < F.lit(int(_RR_Q * 100)), 1 - F.col("truth"))
        .otherwise(F.col("truth"))
        .alias("resp"),
    )
    agg = reported.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("truth").cast("long").alias("n_true"),
        F.sum("resp").cast("long").alias("n_resp"),
    )
    p_true = F.col("n_true") / F.col("n_users")
    p_obs = F.col("n_resp") / F.col("n_users")
    est = (p_obs - F.lit(_RR_Q)) / F.lit(1.0 - 2 * _RR_Q)
    return agg.select(
        "n_users",
        F.round(p_true, 6).alias("true_p"),
        F.round(p_obs, 6).alias("obs_p"),
        F.round(est, 6).alias("est_p"),
        F.round(F.abs(est - p_true), 6).alias("abs_err"),
    )


def _randomized_response_sql() -> str:
    q = _RR_Q
    return f"""
        WITH users AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS truth
            FROM events GROUP BY 1),
        rep AS (
            SELECT truth,
                   CASE WHEN ('0x' || substr(md5('rr|'
                              || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                             % 100 < {int(q * 100)}
                        THEN 1 - truth ELSE truth END AS resp
            FROM users),
        a AS (SELECT COUNT(*) AS n_users,
                     CAST(SUM(truth) AS BIGINT) AS n_true,
                     CAST(SUM(resp) AS BIGINT) AS n_resp
              FROM rep)
        SELECT n_users,
               ROUND(CAST(n_true AS DOUBLE) / n_users, 6) AS true_p,
               ROUND(CAST(n_resp AS DOUBLE) / n_users, 6) AS obs_p,
               ROUND((CAST(n_resp AS DOUBLE) / n_users - CAST({q!r} AS DOUBLE))
                     / CAST({1.0 - 2 * q!r} AS DOUBLE), 6) AS est_p,
               ROUND(ABS((CAST(n_resp AS DOUBLE) / n_users
                          - CAST({q!r} AS DOUBLE))
                         / CAST({1.0 - 2 * q!r} AS DOUBLE)
                         - CAST(n_true AS DOUBLE) / n_users), 6) AS abs_err
        FROM a
    """


def q_bivariate_moran(spark, sf_dir):
    """Bivariate (cross) Moran's I between the DOCUMENT density surface
    and the EVENT density surface at res 5 — do events concentrate where
    documents do, spatially smoothed by the queen 1-ring? (Wartenberg's
    I_xy: z-cross-products over neighbor pairs, normalized by both
    variances.) The cross-table twin of morans_i: one count agg per
    table, a full-outer cell join (missing side = 0 — the honest grid),
    ONE ring join over the union of occupied cells; round-6 display per
    the morans_i float discipline."""
    from raptor_service_spark.geo.grid import cell_encode_col
    from raptor_service_spark.operators.neighborhood import kring_neighbor_col
    from raptor_service_spark.operators.cell_graph import _RING

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat_d, lng_d = _latlng_cols(F.col("doc_id"))
    ev = _read(spark, sf_dir, "events").select("event_id")
    lat_e, lng_e = _latlng_cols(F.col("event_id"))
    dc = d.groupBy(cell_encode_col(lat_d, lng_d, 5).alias("cell")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    ec = ev.groupBy(cell_encode_col(lat_e, lng_e, 5).alias("cell")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    c = (
        dc.join(ec, "cell", "full_outer")
        .select(
            "cell",
            F.coalesce("x", F.lit(0.0)).alias("x"),
            F.coalesce("y", F.lit(0.0)).alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    stats = c.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("y").alias("sy"),
    )
    nbrs = F.array(
        *[kring_neighbor_col("cell", 5, dx, dy) for dx, dy in _RING]
    )
    p = c.select(
        "cell", "x", F.explode(F.filter(nbrs, lambda v: v.isNotNull())).alias("nbr")
    )
    j = p.join(
        c.select(F.col("cell").alias("nbr"), F.col("y").alias("nbr_y")), "nbr"
    ).crossJoin(F.broadcast(stats))
    vx = F.max(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_cells"))
    vy = F.max(F.col("syy") - F.col("sy") * F.col("sy") / F.col("n_cells"))
    return j.agg(
        F.max("n_cells").alias("n_cells"),
        F.count(F.lit(1)).alias("s0"),
        F.round(
            (F.max("n_cells") / F.count(F.lit(1)))
            * F.sum((F.col("x") - F.col("mx")) * (F.col("nbr_y") - F.col("my")))
            / F.sqrt(vx * vy),
            6,
        ).alias("moran_xy"),
    )


def _bivariate_moran_sql() -> str:
    from raptor_service_spark.operators.cell_graph import _RING

    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat_d, lng_d = _latlng_sql("doc_id")
    lat_e, lng_e = _latlng_sql("event_id")
    cell_d = cell_encode_sql(lat_d, lng_d, 5)
    cell_e = cell_encode_sql(lat_e, lng_e, 5)
    nbr = kring_neighbor_sql("c.cell", 5, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH dc AS (SELECT {cell_d} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                    FROM documents GROUP BY 1),
        ec AS (SELECT {cell_e} AS cell, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
        c AS MATERIALIZED (
            SELECT COALESCE(dc.cell, ec.cell) AS cell,
                   COALESCE(dc.x, 0.0) AS x, COALESCE(ec.y, 0.0) AS y
            FROM dc FULL OUTER JOIN ec ON dc.cell = ec.cell),
        s AS (SELECT COUNT(*) AS n_cells, AVG(x) AS mx, AVG(y) AS my,
                     SUM(x * x) AS sxx, SUM(x) AS sx,
                     SUM(y * y) AS syy, SUM(y) AS sy
              FROM c),
        p AS (SELECT c.cell, c.x, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        j AS (SELECT p.x, c2.y AS nbr_y FROM p JOIN c c2 ON p.nbr = c2.cell)
        SELECT s.n_cells AS n_cells, COUNT(*) AS s0,
               ROUND((s.n_cells / CAST(COUNT(*) AS DOUBLE))
                     * SUM((j.x - s.mx) * (j.nbr_y - s.my))
                     / SQRT((s.sxx - s.sx * s.sx / s.n_cells)
                            * (s.syy - s.sy * s.sy / s.n_cells)), 6)
                   AS moran_xy
        FROM j CROSS JOIN s
        GROUP BY s.n_cells, s.mx, s.my, s.sxx, s.sx, s.syy, s.sy
    """


# ---------------------------------------------------------------------------
# ordinary kriging at query targets (session 11)
# ---------------------------------------------------------------------------

_KRIG_TARGETS = {"t1": (12.0, 30.0), "t2": (-25.0, -100.0), "t3": (48.0, 110.0)}


def _krig_det3(a) -> str:
    return (
        f"({a[0][0]} * ({a[1][1]} * {a[2][2]} - {a[1][2]} * {a[2][1]})"
        f" - {a[0][1]} * ({a[1][0]} * {a[2][2]} - {a[1][2]} * {a[2][0]})"
        f" + {a[0][2]} * ({a[1][0]} * {a[2][1]} - {a[1][1]} * {a[2][0]}))"
    )


def _krig_det4(m) -> str:
    s = ""
    for j in range(4):
        minor = [[m[r][c] for c in range(4) if c != j] for r in range(1, 4)]
        sign = ("" if j == 0 else " + ") if j % 2 == 0 else " - "
        s += f"{sign}{m[0][j]} * {_krig_det3(minor)}"
    return f"({s})"


def _krig_exprs() -> tuple[dict[str, str], dict[str, str]]:
    """Ordinary-kriging solve (k=3 neighbors, linear variogram γ(h)=h) as
    ONE set of generated Cramer-expansion strings over named columns,
    evaluated VERBATIM by both engines — floats bit-identical by
    construction (the dtw_levels technique). Inputs: g1..g3 (target→
    neighbor distances, 6 dp), g12/g13/g23 (pairwise neighbor distances,
    6 dp). Returns (determinant layer, weight layer)."""
    A = [
        ["0.0", "g12", "g13", "1.0"],
        ["g12", "0.0", "g23", "1.0"],
        ["g13", "g23", "0.0", "1.0"],
        ["1.0", "1.0", "1.0", "0.0"],
    ]
    b = ["g1", "g2", "g3", "1.0"]
    dets = {"det": _krig_det4(A)}
    wts = {}
    for i, name in enumerate(["w1", "w2", "w3", "mu"]):
        Ai = [[b[r] if c == i else A[r][c] for c in range(4)] for r in range(4)]
        dets[f"d_{name}"] = _krig_det4(Ai)
        wts[name] = f"(d_{name} / det)"
    return dets, wts


def q_kriging_ordinary(spark, sf_dir):
    """Ordinary kriging of the event `value` field at 3 query targets —
    the BLUE spatial interpolator (vs the heuristic IDW twin): per target,
    the 3 exact nearest sample sites (ring-doubling kNN, one site per
    position — duplicate sites would make the variogram matrix singular),
    then the 4×4 ordinary-kriging system [γ_ij 1; 1 0][w;μ]=[γ_i0;1] under
    a linear variogram γ(h)=h, solved by a GENERATED Cramer expansion that
    both engines evaluate verbatim (dtw_levels technique — bit-identical
    floats, no per-step rounding needed). Scale shape: site dedup is one
    window; the kNN is the occupancy-planned ring join (never target ×
    sites); the solve itself is O(targets) codegen arithmetic. Outputs the
    estimate AND the kriging variance (the honesty term IDW cannot give).
    Reference analog: retrieval_service score interpolation over cluster
    summaries (services/retrieval_service.py) recast as geostatistics."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.geo_knn import geo_knn_join

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    w = Window.partitionBy("lat", "lng").orderBy("event_id")
    sites = (
        pts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    knn = geo_knn_join(
        sites,
        _KRIG_TARGETS,
        k=3,
        res=6,
        payload_cols=("event_id", "value", "lat", "lng"),
    )
    nb = knn.groupBy("qid").agg(
        F.array_sort(
            F.collect_list(F.struct("dist", "event_id", "lng", "lat", "value"))
        ).alias("nb")
    )
    cols = {}
    for i in (1, 2, 3):
        el = F.element_at(F.col("nb"), i)
        cols[f"x{i}"] = el["lng"]
        cols[f"y{i}"] = el["lat"]
        cols[f"z{i}"] = el["value"]
        cols[f"g{i}"] = el["dist"]
    nb = nb.withColumns(cols)
    pw = {}
    for i, j in ((1, 2), (1, 3), (2, 3)):
        dx = F.col(f"x{i}") - F.col(f"x{j}")
        dy = F.col(f"y{i}") - F.col(f"y{j}")
        pw[f"g{i}{j}"] = F.round(F.sqrt(dx * dx + dy * dy), 6)
    nb = nb.withColumns(pw)
    dets, wts = _krig_exprs()
    nb = nb.withColumns({k: F.expr(v) for k, v in dets.items()})
    nb = nb.withColumns({k: F.expr(v) for k, v in wts.items()})
    return nb.select(
        "qid",
        F.round(F.expr("w1 * z1 + w2 * z2 + w3 * z3"), 6).alias("krig_est"),
        F.round(F.expr("w1 * g1 + w2 * g2 + w3 * g3 + mu"), 6).alias("krig_var"),
    ).orderBy("qid")


def _kriging_ordinary_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    centers = ", ".join(
        f"('{q}', {la!r}, {ln!r})" for q, (la, ln) in _KRIG_TARGETS.items()
    )
    nb_cols = []
    for i in (1, 2, 3):
        for src, dst in (("lng", "x"), ("lat", "y"), ("value", "z"), ("dist", "g")):
            nb_cols.append(f"MAX(CASE WHEN rn2 = {i} THEN {src} END) AS {dst}{i}")
    pw = ", ".join(
        f"ROUND(SQRT((x{i} - x{j}) * (x{i} - x{j})"
        f" + (y{i} - y{j}) * (y{i} - y{j})), 6) AS g{i}{j}"
        for i, j in ((1, 2), (1, 3), (2, 3))
    )
    dets, wts = _krig_exprs()
    det_sel = ", ".join(f"{v} AS {k}" for k, v in dets.items())
    wt_sel = ", ".join(f"{v} AS {k}" for k, v in wts.items())
    return f"""
        WITH p0 AS (SELECT event_id, value, {lat} AS lat, {lng} AS lng
                    FROM events),
        p AS (SELECT event_id, value, lat, lng FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY lat, lng
                                               ORDER BY event_id) AS rn
                  FROM p0) WHERE rn = 1),
        c(qid, clat, clng) AS (VALUES {centers}),
        d AS (SELECT qid, event_id, value, lat, lng,
                     ROUND(SQRT((lat - clat) * (lat - clat)
                              + (lng - clng) * (lng - clng)), 6) AS dist
              FROM p CROSS JOIN c),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                           ORDER BY dist, event_id) AS rn2
              FROM d),
        nb AS (SELECT qid, {', '.join(nb_cols)}
               FROM r WHERE rn2 <= 3 GROUP BY qid),
        gm AS (SELECT *, {pw} FROM nb),
        dets AS (SELECT *, {det_sel} FROM gm),
        wts AS (SELECT *, {wt_sel} FROM dets)
        SELECT qid,
               ROUND(w1 * z1 + w2 * z2 + w3 * z3, 6) AS krig_est,
               ROUND(w1 * g1 + w2 * g2 + w3 * g3 + mu, 6) AS krig_var
        FROM wts ORDER BY qid
    """


# ---------------------------------------------------------------------------
# empty-space F-function (session 11)
# ---------------------------------------------------------------------------

_FF_BANDS = [0.25, 0.5, 1.0, 2.0, 4.0]
_FF_NLAT, _FF_NLNG = 18, 20


def q_f_function(spark, sf_dir):
    """Empty-space function F(d) — the ECDF of nearest-EVENT distance from
    a deterministic 18×20 reference grid (the point-pattern complement of
    the G-function: G samples the pattern, F samples the empty space; F
    below the CSR curve ⇔ clustered). NN distances come from the exact
    query→data ring-doubling join (`nn_join` — `nn_distances` generalized
    to separate query/data tables); the band evaluation is one broadcast
    ladder over the 360-row NN table. Scale shape: each round shuffles
    only unresolved grid points × cover cells against the cell-keyed
    event table — never grid × events."""
    from raptor_service_spark.operators.geo_knn import nn_join

    g = spark.range(0, _FF_NLAT * _FF_NLNG).select(
        F.col("id").alias("pid"),
        (F.lit(-171.0) + (F.col("id") % _FF_NLNG).cast("double") * F.lit(18.0)).alias(
            "px"
        ),
        (
            F.lit(-81.0) + F.floor(F.col("id") / _FF_NLNG).cast("double") * F.lit(9.0)
        ).alias("py"),
    )
    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    data = ev.select(F.col("event_id").alias("did"), lng.alias("dx"), lat.alias("dy"))
    nn = nn_join(g, data, res=4, max_ring=64)
    bands = spark.createDataFrame([(b,) for b in _FF_BANDS], "band double")
    return (
        nn.crossJoin(F.broadcast(bands))
        .groupBy("band")
        .agg(
            F.sum((F.col("d1") <= F.col("band")).cast("long")).alias("n_le"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "band",
            "n_le",
            "n",
            F.round(F.col("n_le") / F.col("n").cast("double"), 6).alias("f"),
        )
        .orderBy("band")
    )


def _f_function_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    bands = ", ".join(f"({b!r})" for b in _FF_BANDS)
    return f"""
        WITH g AS (SELECT i * {_FF_NLNG} + j AS pid,
                          CAST(-171.0 + j * 18.0 AS DOUBLE) AS px,
                          CAST(-81.0 + i * 9.0 AS DOUBLE) AS py
                   FROM (SELECT unnest(range({_FF_NLAT})) AS i)
                   CROSS JOIN (SELECT unnest(range({_FF_NLNG})) AS j)),
        p AS (SELECT {lng} AS dx, {lat} AS dy FROM events),
        d AS (SELECT g.pid,
                     MIN(SQRT((g.px - p.dx) * (g.px - p.dx)
                            + (g.py - p.dy) * (g.py - p.dy))) AS d1
              FROM g CROSS JOIN p GROUP BY 1)
        SELECT band, CAST(SUM(CAST(d1 <= band AS INT)) AS BIGINT) AS n_le,
               COUNT(*) AS n,
               ROUND(SUM(CAST(d1 <= band AS INT)) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS f
        FROM d CROSS JOIN (SELECT CAST(band AS DOUBLE) AS band
                           FROM (VALUES {bands}) t(band)) b
        GROUP BY band
        ORDER BY band
    """


# ---------------------------------------------------------------------------
# RAKE keyword extraction (session 11)
# ---------------------------------------------------------------------------

_RAKE_STOP = ("the", "a", "an", "of", "to", "in", "and", "is", "it", "that")
_RAKE_TOPK = 20


def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010) over the corpus: candidate
    phrases are maximal stopword-free token runs (gaps-and-islands: position
    minus row-number within the non-stop stream), word score = deg/freq
    where deg sums the lengths of phrases a word appears in, phrase score =
    Σ word scores. Scores are EXACT integer nano-units ((deg·10⁹) div freq,
    summed as BIGINT) so cross-engine parity needs no float protocol at
    all. Scale shape: one explode + two hash aggs + one bounded join
    (distinct words), one top-k; never doc × doc. The unsupervised keyword
    leg a tile-level `cell_top_terms` faceting UI would call."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("p", "w"),
    ).filter(F.col("w") != "")
    ns = toks.filter(~F.col("w").isin(*_RAKE_STOP))
    wgrp = Window.partitionBy("doc_id").orderBy("p")
    ns = ns.withColumn("grp", F.col("p") - F.row_number().over(wgrp))
    occ = ns.withColumn(
        "len", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "grp"))
    )
    wstats = occ.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("len").alias("deg")
    )
    wscore = wstats.select(
        "w", F.expr("(deg * 1000000000L) div freq").alias("nanos")
    )
    inst = (
        occ.join(wscore, "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.max("len").alias("n_words"),
            F.sum("nanos").alias("nanos"),
        )
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.count(F.lit(1)).alias("n_occ"),
            F.round(F.max("nanos") / F.lit(1000000000.0), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(_RAKE_TOPK)
    )


def _rake_keywords_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in _RAKE_STOP)
    return f"""
        WITH t AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS arr
                   FROM documents),
        toks AS (SELECT doc_id, u.p, u.w
                 FROM (SELECT doc_id,
                              UNNEST(list_transform(range(1, len(arr) + 1),
                                  i -> struct_pack(p := i - 1, w := arr[i])))
                                  AS u
                       FROM t)
                 WHERE u.w != ''),
        ns AS (SELECT doc_id, p, w,
                      p - ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY p) AS grp
               FROM toks WHERE w NOT IN ({stop})),
        occ AS (SELECT doc_id, grp, p, w,
                       COUNT(*) OVER (PARTITION BY doc_id, grp) AS len
                FROM ns),
        ws AS (SELECT w, (SUM(len) * 1000000000) // COUNT(*) AS nanos
               FROM occ GROUP BY 1),
        inst AS (SELECT occ.doc_id, occ.grp,
                        string_agg(occ.w, ' ' ORDER BY occ.p) AS phrase,
                        MAX(occ.len) AS n_words,
                        SUM(ws.nanos) AS nanos
                 FROM occ JOIN ws ON occ.w = ws.w
                 GROUP BY 1, 2)
        SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
               COUNT(*) AS n_occ,
               ROUND(MAX(nanos) / 1000000000.0, 6) AS score
        FROM inst GROUP BY 1
        ORDER BY score DESC, phrase LIMIT {_RAKE_TOPK}
    """


# ---------------------------------------------------------------------------
# split-conformal prediction intervals (session 11)
# ---------------------------------------------------------------------------

_CONF_ALPHAS = (50, 80, 90, 95)  # coverage targets, percent


def q_conformal_intervals(spark, sf_dir):
    """Split-conformal prediction intervals around the per-cell mean-value
    predictor — the distribution-free uncertainty wrapper every field
    estimator (kriging/IDW layers) should ship with. Deterministic md5
    split (60/20/20 train/calibration/test); predictor = per-res-3-cell
    train mean with global-mean fallback; conformal radius at coverage α =
    the ⌈α(n+1)⌉-th smallest calibration |residual| (exact order
    statistic); reported with the EMPIRICAL test coverage it achieves.
    Floats are exact by construction: values become integer cents, means
    are single exact-integer divisions, residual ranks are integers. Scale
    shape: two hash aggs (cell means), one window rank on the calibration
    slice, broadcast α ladder — one scan of events."""
    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    lat, lng = _latlng_cols(F.col("event_id"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("conf|"), F.col("event_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    base = ev.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vi"),
        cell_encode_col(lat, lng, 3).alias("cell"),
        u.alias("u"),
    )
    train = base.filter(F.col("u") < 0.6)
    calib = base.filter((F.col("u") >= 0.6) & (F.col("u") < 0.8))
    test = base.filter(F.col("u") >= 0.8)
    cmean = train.groupBy("cell").agg(
        (F.sum("vi") / F.count(F.lit(1))).alias("cpred")
    )
    gmean = train.agg((F.sum("vi") / F.count(F.lit(1))).alias("gpred"))

    def _resid(df):
        return (
            df.join(F.broadcast(cmean), "cell", "left")
            .crossJoin(F.broadcast(gmean))
            .select(
                "event_id",
                F.abs(
                    F.col("vi") - F.coalesce(F.col("cpred"), F.col("gpred"))
                ).alias("resid"),
            )
        )

    from pyspark.sql import Window

    rc = _resid(calib).withColumn(
        "rn", F.row_number().over(Window.orderBy("resid", "event_id"))
    )
    nc = rc.agg(F.count(F.lit(1)).alias("n_calib"))
    alphas = spark.createDataFrame(
        [(a,) for a in _CONF_ALPHAS], "alpha_pct int"
    )
    ks = (
        alphas.crossJoin(F.broadcast(nc))
        .select(
            "alpha_pct",
            "n_calib",
            F.least(
                F.ceil(
                    F.col("alpha_pct") * (F.col("n_calib") + 1) / F.lit(100.0)
                ),
                F.col("n_calib"),
            ).alias("k"),
        )
    )
    qs = ks.join(F.broadcast(rc), F.col("k") == F.col("rn")).select(
        "alpha_pct", "n_calib", F.col("resid").alias("q")
    )
    rt = _resid(test)
    return (
        rt.crossJoin(F.broadcast(qs))
        .groupBy("alpha_pct", "n_calib", "q")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum((F.col("resid") <= F.col("q")).cast("long")).alias("n_cov"),
        )
        .select(
            "alpha_pct",
            "n_calib",
            "n_test",
            F.round(F.col("q") / F.lit(100.0), 6).alias("q_resid"),
            F.round(F.col("n_cov") / F.col("n_test").cast("double"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("alpha_pct")
    )


def _conformal_intervals_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    alphas = ", ".join(f"({a})" for a in _CONF_ALPHAS)
    return f"""
        WITH base AS (
            SELECT event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS vi,
                   {cell} AS cell,
                   ('0x' || substr(md5('conf|' || CAST(event_id AS VARCHAR)),
                                   1, 8))::BIGINT / 4294967296.0 AS u
            FROM events),
        train AS (SELECT * FROM base WHERE u < 0.6),
        calib AS (SELECT * FROM base WHERE u >= 0.6 AND u < 0.8),
        test AS (SELECT * FROM base WHERE u >= 0.8),
        cmean AS (SELECT cell, SUM(vi) / COUNT(*) AS cpred
                  FROM train GROUP BY 1),
        gmean AS (SELECT SUM(vi) / COUNT(*) AS gpred FROM train),
        rc AS (SELECT c.event_id,
                      ABS(c.vi - COALESCE(m.cpred, g.gpred)) AS resid
               FROM calib c LEFT JOIN cmean m ON c.cell = m.cell
               CROSS JOIN gmean g),
        rr AS (SELECT resid,
                      ROW_NUMBER() OVER (ORDER BY resid, event_id) AS rn
               FROM rc),
        nc AS (SELECT COUNT(*) AS n_calib FROM rc),
        ks AS (SELECT a.alpha_pct, nc.n_calib,
                      LEAST(CAST(CEIL(a.alpha_pct * (nc.n_calib + 1)
                                      / 100.0) AS BIGINT),
                            nc.n_calib) AS k
               FROM (SELECT alpha_pct FROM (VALUES {alphas}) t(alpha_pct)) a
               CROSS JOIN nc),
        qs AS (SELECT ks.alpha_pct, ks.n_calib, rr.resid AS q
               FROM ks JOIN rr ON ks.k = rr.rn),
        rt AS (SELECT ABS(t.vi - COALESCE(m.cpred, g.gpred)) AS resid
               FROM test t LEFT JOIN cmean m ON t.cell = m.cell
               CROSS JOIN gmean g)
        SELECT qs.alpha_pct, qs.n_calib, COUNT(*) AS n_test,
               ROUND(qs.q / 100.0, 6) AS q_resid,
               ROUND(SUM(CAST(rt.resid <= qs.q AS INT))
                     / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
        FROM rt CROSS JOIN qs
        GROUP BY qs.alpha_pct, qs.n_calib, qs.q
        ORDER BY alpha_pct
    """


# ---------------------------------------------------------------------------
# isotonic regression via the minimax formula (session 11)
# ---------------------------------------------------------------------------


def q_isotonic_hourly(spark, sf_dir):
    """Isotonic (monotone nondecreasing) regression of hourly event volume
    against hour-of-day — the shape-constrained calibration fit (the same
    PAVA solution score-calibration pipelines use). For the bounded series
    the pool-adjacent-violators solution has the closed minimax form
    fit_i = max_{s≤i} min_{t≥i} mean(y[s..t]), which is PURE relational
    algebra: prefix sums → all O(n²) window means → two grouped extrema.
    Every mean is one exact-integer division, so cross-engine floats are
    identical with no rounding protocol. n=24 rows after the first agg —
    everything past the scan is driver-trivial but stays declarative."""
    ev = _read(spark, sf_dir, "events").select(
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("h")
    )
    hours = ev.groupBy("h").agg(F.count(F.lit(1)).alias("y"))
    a = hours.select(F.col("h").alias("s"), F.col("y").alias("ys"))
    b = hours.select(F.col("h").alias("t"), F.col("y").alias("yt"))
    spans = a.join(b, F.col("s") <= F.col("t"))
    mids = hours.select(F.col("h").alias("m"), F.col("y").alias("ym"))
    win = (
        spans.join(
            mids, (F.col("m") >= F.col("s")) & (F.col("m") <= F.col("t"))
        )
        .groupBy("s", "t")
        .agg(
            (F.sum("ym") / F.count(F.lit(1))).alias("mean")
        )
    )
    inner = (
        hours.select(F.col("h").alias("i"), "y")
        .join(win, (F.col("s") <= F.col("i")) & (F.col("t") >= F.col("i")))
        .groupBy("i", "y", "s")
        .agg(F.min("mean").alias("mn"))
    )
    return (
        inner.groupBy("i", "y")
        .agg(F.round(F.max("mn"), 6).alias("fit"))
        .select(F.col("i").alias("hour"), F.col("y").alias("n_events"), "fit")
        .orderBy("hour")
    )


def _isotonic_hourly_sql() -> str:
    return """
        WITH hours AS (SELECT EXTRACT(hour FROM ts) AS h, COUNT(*) AS y
                       FROM events GROUP BY 1),
        win AS (SELECT a.h AS s, b.h AS t,
                       SUM(m.y) / COUNT(*) AS mean
                FROM hours a JOIN hours b ON a.h <= b.h
                JOIN hours m ON m.h >= a.h AND m.h <= b.h
                GROUP BY 1, 2),
        inner_ AS (SELECT i.h AS i, i.y, w.s, MIN(w.mean) AS mn
                   FROM hours i JOIN win w ON w.s <= i.h AND w.t >= i.h
                   GROUP BY 1, 2, 3)
        SELECT i AS hour, y AS n_events, ROUND(MAX(mn), 6) AS fit
        FROM inner_ GROUP BY 1, 2
        ORDER BY hour
    """


# ---------------------------------------------------------------------------
# media dHash near-dup (session 11)
# ---------------------------------------------------------------------------


def q_media_dhash_pairs(spark, sf_dir):
    """Multimodal near-dup, second opinion: dHash (horizontal-gradient
    bits from DECODED pixels — robust to the brightness shifts that flip
    aHash bits wholesale) over the same RTv1 codec rasters and planted
    thumbnail twins as `media_ahash_dedup`, then the identical 4-band
    Hamming-LSH join (pigeonhole-exact at ham ≤ 3). An image-dedup stack
    runs BOTH hashes; pairs where they agree are the high-precision dup
    set. The oracle recomputes pixels via the hex-chained md5 arithmetic
    and the gradient bits as a shifted self-join of the pixel table."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.tiles import (
        ahash_neardup_pairs,
        media_dhash,
    )

    docs = gen_documents_df(spark, 40, seed=67)
    return ahash_neardup_pairs(media_dhash(explode_spans(docs)), max_ham=3)


def _media_dhash_pairs_sql(n_docs: int = 40, seed: int = 67) -> str:
    from raptor_service_spark.datagen import _gen_doc

    refs = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        for s in d["spans"]:
            if s["media_ref"]:
                refs.append(f"('{s['media_ref']}')")
    links = "md5(media_ref)"
    link_cols = []
    for k in range(4):
        link_cols.append(f"{links} AS l{k}")
        links = f"md5({links})"
    pixel = (
        "('0x' || substr(CASE i // 16 WHEN 0 THEN l0 WHEN 1 THEN l1 "
        "WHEN 2 THEN l2 ELSE l3 END, 2 * (i % 16) + 1, 2))::BIGINT // 16 * 17"
    )
    return f"""
        WITH refs(media_ref) AS (VALUES {', '.join(refs)}),
        imgs AS (
            SELECT media_ref || '#' || tt.t AS img, media_ref, tt.t
            FROM refs CROSS JOIN (VALUES (0), (1)) tt(t)),
        links AS (
            SELECT img, t, {', '.join(link_cols)} FROM imgs),
        lists AS (
            SELECT img, t,
                   list_transform(range(0, 64), i -> struct_pack(
                       i := i, p := {pixel})) AS ps
            FROM links),
        px AS (
            SELECT img,
                   u.i AS i,
                   CASE WHEN u.i = 0 AND t = 1 THEN LEAST(u.p + 17, 255)
                        ELSE u.p END AS p
            FROM (SELECT img, t, unnest(ps) AS u FROM lists)),
        grad AS (
            SELECT a.img,
                   (a.i // 8) * 7 + (a.i % 8) AS gi,
                   CAST(b.p > a.p AS INT) AS bit
            FROM px a JOIN px b ON a.img = b.img AND b.i = a.i + 1
            WHERE a.i % 8 != 7),
        bits AS (
            SELECT img,
                   CAST(SUM(CASE WHEN gi < 32 AND bit = 1
                            THEN (CAST(1 AS BIGINT) << CAST(gi % 32 AS INT))
                            ELSE 0 END) AS BIGINT) AS w0,
                   CAST(SUM(CASE WHEN gi >= 32 AND bit = 1
                            THEN (CAST(1 AS BIGINT) << CAST(gi % 32 AS INT))
                            ELSE 0 END) AS BIGINT) AS w1
            FROM grad GROUP BY 1),
        banded AS (
            SELECT img, w0, w1, bb.b,
                   CASE bb.b WHEN 0 THEN w0 % 65536 WHEN 1 THEN w0 // 65536
                             WHEN 2 THEN w1 % 65536 ELSE w1 // 65536 END AS v
            FROM bits CROSS JOIN (VALUES (0), (1), (2), (3)) bb(b))
        SELECT DISTINCT a.img AS img_a, b.img AS img_b,
               CAST(bit_count(xor(a.w0, b.w0))
                    + bit_count(xor(a.w1, b.w1)) AS BIGINT) AS hamming
        FROM banded a JOIN banded b
          ON a.b = b.b AND a.v = b.v AND a.img < b.img
        WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3
    """


# ---------------------------------------------------------------------------
# TextTiling topic-boundary detection (session 11)
# ---------------------------------------------------------------------------

_TT_W = 5  # pseudo-sentence block size (tokens)


def q_texttiling_boundaries(spark, sf_dir):
    """TextTiling topic segmentation (Hearst 1997): token stream → fixed
    pseudo-sentence blocks of {W} tokens → cosine similarity between each
    adjacent block pair (exact integer dot/norms; one sqrt) → a gap is a
    topic BOUNDARY when its similarity drops below the doc's mean − σ/2
    (Hearst's threshold). The chunker upgrade over `split_text_recursive`:
    semantic boundaries instead of fixed sizes. One explode + two hash
    aggs + one self-join on (doc, block+1) + a per-doc window — never
    doc × doc. Sims pre-rounded 9 dp; threshold comparison at 6 dp."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("p", "w"),
    ).filter(F.col("w") != "")
    tf = (
        toks.withColumn("blk", F.floor(F.col("p") / _TT_W))
        .groupBy("doc_id", "blk", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sq = tf.groupBy("doc_id", "blk").agg(F.sum(F.col("c") * F.col("c")).alias("sq"))
    l, r = tf.alias("l"), tf.alias("r")
    dots = (
        l.join(
            r,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.blk") + 1 == F.col("r.blk"))
            & (F.col("l.w") == F.col("r.w")),
        )
        .groupBy(F.col("l.doc_id").alias("doc_id"), F.col("l.blk").alias("gap"))
        .agg(F.sum(F.col("l.c") * F.col("r.c")).alias("dot"))
    )
    sims = (
        dots.join(
            sq.select(
                F.col("doc_id"), F.col("blk").alias("gap"), F.col("sq").alias("sql_")
            ),
            ["doc_id", "gap"],
        )
        .join(
            sq.select(
                F.col("doc_id"),
                (F.col("blk") - 1).alias("gap"),
                F.col("sq").alias("sqr_"),
            ),
            ["doc_id", "gap"],
        )
        .select(
            "doc_id",
            "gap",
            F.round(
                F.col("dot") / F.sqrt((F.col("sql_") * F.col("sqr_")).cast("double")),
                9,
            ).alias("sim"),
        )
    )
    wd = Window.partitionBy("doc_id")
    stats = sims.withColumns(
        {
            "mu": F.sum("sim").over(wd) / F.count(F.lit(1)).over(wd),
            "m2": F.sum(F.col("sim") * F.col("sim")).over(wd)
            / F.count(F.lit(1)).over(wd),
        }
    ).withColumn(
        "thresh",
        F.col("mu")
        - F.sqrt(F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(0.0)))
        / F.lit(2.0),
    )
    return (
        stats.select(
            "doc_id",
            "gap",
            F.round("sim", 6).alias("sim"),
            F.round("thresh", 6).alias("thresh"),
            (F.round("sim", 6) < F.round("thresh", 6)).alias("is_boundary"),
        )
        .filter(F.col("doc_id") < 200)
        .orderBy("doc_id", "gap")
    )


def _texttiling_boundaries_sql() -> str:
    return f"""
        WITH t AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS arr
                   FROM documents),
        toks AS (SELECT doc_id, u.p, u.w
                 FROM (SELECT doc_id,
                              UNNEST(list_transform(range(1, len(arr) + 1),
                                  i -> struct_pack(p := i - 1, w := arr[i])))
                                  AS u
                       FROM t)
                 WHERE u.w != ''),
        tf AS (SELECT doc_id, p // {_TT_W} AS blk, w, COUNT(*) AS c
               FROM toks GROUP BY 1, 2, 3),
        sq AS (SELECT doc_id, blk, SUM(c * c) AS sq
               FROM tf GROUP BY 1, 2),
        dots AS (SELECT l.doc_id, l.blk AS gap, SUM(l.c * r.c) AS dot
                 FROM tf l JOIN tf r
                   ON l.doc_id = r.doc_id AND l.blk + 1 = r.blk AND l.w = r.w
                 GROUP BY 1, 2),
        sims AS (SELECT d.doc_id, d.gap,
                        ROUND(d.dot / SQRT(CAST(a.sq * b.sq AS DOUBLE)), 9)
                            AS sim
                 FROM dots d
                 JOIN sq a ON a.doc_id = d.doc_id AND a.blk = d.gap
                 JOIN sq b ON b.doc_id = d.doc_id AND b.blk = d.gap + 1),
        stats AS (SELECT doc_id, gap, sim,
                         SUM(sim) OVER (PARTITION BY doc_id)
                             / COUNT(*) OVER (PARTITION BY doc_id) AS mu,
                         SUM(sim * sim) OVER (PARTITION BY doc_id)
                             / COUNT(*) OVER (PARTITION BY doc_id) AS m2
                  FROM sims),
        th AS (SELECT doc_id, gap, sim,
                      mu - SQRT(GREATEST(m2 - mu * mu, 0.0)) / 2.0 AS thresh
               FROM stats)
        SELECT doc_id, gap, ROUND(sim, 6) AS sim, ROUND(thresh, 6) AS thresh,
               ROUND(sim, 6) < ROUND(thresh, 6) AS is_boundary
        FROM th WHERE doc_id < 200
        ORDER BY doc_id, gap
    """


# ---------------------------------------------------------------------------
# trajectory sinuosity (session 11)
# ---------------------------------------------------------------------------


def q_traj_sinuosity(spark, sf_dir):
    """Per-user trajectory sinuosity: total haversine path length over the
    great-circle displacement between first and last fix — the
    route-efficiency index (1 = straight commute, ≫1 = wandering). One
    window shuffle (lag legs + endpoint first/last in the same window
    pass) + one agg; the same scale shape as `user_travel`, which this
    extends with the displacement denominator."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.distance import haversine_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng).filter(
        F.col("user_id") < 50
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    leg = haversine_col(
        F.lag("lat").over(w), F.lag("lng").over(w), F.col("lat"), F.col("lng")
    )
    net = haversine_col(
        F.first("lat").over(wall),
        F.first("lng").over(wall),
        F.last("lat").over(wall),
        F.last("lng").over(wall),
    )
    agg = (
        pts.withColumn("leg_km", leg)
        .withColumn("net_km", net)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("leg_km").alias("path"),
            F.max("net_km").alias("net"),
        )
    )
    return agg.select(
        "user_id",
        "n_events",
        F.round("path", 6).alias("path_km"),
        F.round("net", 6).alias("net_km"),
        F.when(
            F.col("net") > 0, F.round(F.col("path") / F.col("net"), 6)
        ).alias("sinuosity"),
    ).orderBy("user_id")


def _traj_sinuosity_sql() -> str:
    from raptor_service_spark.geo.distance import haversine_sql

    lat, lng = _latlng_sql("event_id")
    leg = haversine_sql("plat", "plng", "lat", "lng")
    net = haversine_sql("flat", "flng", "llat", "llng")
    return f"""
        WITH p AS (SELECT user_id, ts, event_id,
                          {lat} AS lat, {lng} AS lng
                   FROM events WHERE user_id < 50),
        w AS (SELECT user_id, lat, lng,
                     LAG(lat) OVER win AS plat,
                     LAG(lng) OVER win AS plng,
                     FIRST_VALUE(lat) OVER win AS flat,
                     FIRST_VALUE(lng) OVER win AS flng,
                     LAST_VALUE(lat) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS llat,
                     LAST_VALUE(lng) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS llng
              FROM p
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        agg AS (SELECT user_id, COUNT(*) AS n_events,
                       SUM({leg}) AS path,
                       MAX({net}) AS net
                FROM w GROUP BY 1)
        SELECT user_id, n_events,
               ROUND(path, 6) AS path_km,
               ROUND(net, 6) AS net_km,
               CASE WHEN net > 0 THEN ROUND(path / net, 6) END AS sinuosity
        FROM agg ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# Lee's L bivariate spatial association (session 11)
# ---------------------------------------------------------------------------


def q_lee_l(spark, sf_dir):
    """Lee's L (Lee 2001) between the document and event density surfaces
    at res 5 — the smoothing-aware complement to `bivariate_moran`:
    L = n·Σᵢ x̃ᵢ*ỹᵢ* / (√Σx*² · √Σy*²) where x̃ᵢ* is the row-standardized
    3×3-neighborhood (incl. self) mean of the deviations. Captures
    point-wise association AND spatial clustering in one statistic (Moran
    cross-products only see the latter). Float discipline: neighborhood
    sums stay INTEGER (x̃* = (Σxⱼ − kᵢ·x̄)/kᵢ — one float op on exact
    ints), per-cell products pre-rounded 9 dp before the global sum.
    One ring join over occupied cells — the morans_i scale shape."""
    from raptor_service_spark.operators.cell_graph import _RING
    from raptor_service_spark.operators.neighborhood import kring_neighbor_col

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat_d, lng_d = _latlng_cols(F.col("doc_id"))
    ev = _read(spark, sf_dir, "events").select("event_id")
    lat_e, lng_e = _latlng_cols(F.col("event_id"))
    dc = d.groupBy(cell_encode_col(lat_d, lng_d, 5).alias("cell")).agg(
        F.count(F.lit(1)).alias("x")
    )
    ec = ev.groupBy(cell_encode_col(lat_e, lng_e, 5).alias("cell")).agg(
        F.count(F.lit(1)).alias("y")
    )
    c = (
        dc.join(ec, "cell", "full_outer")
        .select(
            "cell",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    stats = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nbrs = F.array(
        kring_neighbor_col("cell", 5, 0, 0),
        *[kring_neighbor_col("cell", 5, dx, dy) for dx, dy in _RING],
    )
    p = c.select(
        "cell", F.explode(F.filter(nbrs, lambda v: v.isNotNull())).alias("nbr")
    )
    sm = (
        p.join(
            c.select(
                F.col("cell").alias("nbr"),
                F.col("x").alias("nx"),
                F.col("y").alias("ny"),
            ),
            "nbr",
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("nx").alias("sxi"),
            F.sum("ny").alias("syi"),
        )
    )
    j = sm.crossJoin(F.broadcast(stats))
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    xs = (F.col("sxi") - F.col("k") * mx) / F.col("k")
    ys = (F.col("syi") - F.col("k") * my) / F.col("k")
    term = F.round(xs * ys, 9)
    vx = F.max(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    vy = F.max(F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
    return j.agg(
        F.max("n").alias("n_cells"),
        F.round(
            F.max("n") * F.sum(term) / F.sqrt(vx * vy),
            6,
        ).alias("lee_l"),
    )


def _lee_l_sql() -> str:
    from raptor_service_spark.operators.cell_graph import _RING
    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat_d, lng_d = _latlng_sql("doc_id")
    lat_e, lng_e = _latlng_sql("event_id")
    cell_d = cell_encode_sql(lat_d, lng_d, 5)
    cell_e = cell_encode_sql(lat_e, lng_e, 5)
    nbr = kring_neighbor_sql("c.cell", 5, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in [(0, 0), *_RING])
    return f"""
        WITH dc AS (SELECT {cell_d} AS cell, COUNT(*) AS x
                    FROM documents GROUP BY 1),
        ec AS (SELECT {cell_e} AS cell, COUNT(*) AS y
               FROM events GROUP BY 1),
        c AS MATERIALIZED (
            SELECT COALESCE(dc.cell, ec.cell) AS cell,
                   CAST(COALESCE(dc.x, 0) AS BIGINT) AS x,
                   CAST(COALESCE(ec.y, 0) AS BIGINT) AS y
            FROM dc FULL OUTER JOIN ec ON dc.cell = ec.cell),
        s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * x) AS sxx, SUM(y * y) AS syy
              FROM c),
        p AS (SELECT c.cell, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        sm AS (SELECT p.cell, COUNT(*) AS k,
                      SUM(c2.x) AS sxi, SUM(c2.y) AS syi
               FROM p JOIN c c2 ON p.nbr = c2.cell
               GROUP BY 1),
        terms AS (SELECT
                      ROUND(((sm.sxi - sm.k * (s.sx / CAST(s.n AS DOUBLE)))
                             / sm.k)
                          * ((sm.syi - sm.k * (s.sy / CAST(s.n AS DOUBLE)))
                             / sm.k), 9) AS t,
                      s.n, s.sx, s.sy, s.sxx, s.syy
                  FROM sm CROSS JOIN s)
        SELECT MAX(n) AS n_cells,
               ROUND(MAX(n) * SUM(t)
                     / SQRT((MAX(sxx) - MAX(sx) * MAX(sx)
                             / CAST(MAX(n) AS DOUBLE))
                          * (MAX(syy) - MAX(sy) * MAX(sy)
                             / CAST(MAX(n) AS DOUBLE))), 6) AS lee_l
        FROM terms
    """


# ---------------------------------------------------------------------------
# reliability diagram + expected calibration error (session 11)
# ---------------------------------------------------------------------------

_CAL_STOP = ("the", "a", "an", "of", "to", "in", "and", "is", "it", "that")


def q_calibration_bins(spark, sf_dir):
    """Reliability diagram + ECE for a fixed linguistic English-ness
    scorer: p̂ = min(stopword token hits, 8)/8 (a DYADIC rational — every
    p̂, every per-bin sum of p̂, is exactly representable, so confidence
    means are order-independent with NO float protocol), ground truth =
    (lang = 'en'). 10 equal-width bins: per-bin count, mean confidence,
    empirical accuracy, |gap|, and the corpus ECE Σ (n_b/n)·gap — the
    audit every learned quality/langid filter in the curation pipeline
    should publish before its threshold is trusted. One scan, two aggs."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
    )
    hits = toks.groupBy("doc_id", "lang").agg(
        F.sum(F.col("w").isin(*_CAL_STOP).cast("long")).alias("sh")
    )
    scored = hits.select(
        (F.least(F.col("sh"), F.lit(8)) / F.lit(8.0)).alias("p"),
        (F.col("lang") == "en").cast("long").alias("pos"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int").alias("bin"),
        "p",
        "pos",
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("p") / F.count(F.lit(1))).alias("conf"),
        (F.sum("pos") / F.count(F.lit(1))).alias("acc"),
    )
    tot = binned.agg(F.count(F.lit(1)).alias("n"))
    ece = (
        bins.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("n_docs") / F.col("n")) * F.abs(F.col("acc") - F.col("conf")),
                9,
            ).alias("t")
        )
        .agg(F.round(F.sum("t"), 6).alias("ece"))
    )
    return (
        bins.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            "n_docs",
            F.round("conf", 6).alias("conf"),
            F.round("acc", 6).alias("acc"),
            F.round(F.abs(F.col("acc") - F.col("conf")), 6).alias("gap"),
            "ece",
        )
        .orderBy("bin")
    )


def _calibration_bins_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in _CAL_STOP)
    return f"""
        WITH toks AS (
            SELECT doc_id, lang, UNNEST(
                regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents),
        hits AS (
            SELECT doc_id, lang,
                   SUM(CAST(w IN ({stop}) AS BIGINT)) AS sh
            FROM toks GROUP BY 1, 2),
        scored AS (
            SELECT LEAST(sh, 8) / 8.0 AS p,
                   CAST(lang = 'en' AS BIGINT) AS pos
            FROM hits),
        binned AS (
            SELECT CAST(LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS INT)
                       AS bin, p, pos
            FROM scored),
        bins AS (
            SELECT bin, COUNT(*) AS n_docs,
                   SUM(p) / COUNT(*) AS conf,
                   SUM(pos) / CAST(COUNT(*) AS DOUBLE) AS acc
            FROM binned GROUP BY 1),
        tot AS (SELECT COUNT(*) AS n FROM binned),
        ece AS (
            SELECT ROUND(SUM(ROUND((n_docs / CAST(n AS DOUBLE))
                                   * ABS(acc - conf), 9)), 6) AS ece
            FROM bins CROSS JOIN tot)
        SELECT bin, n_docs, ROUND(conf, 6) AS conf, ROUND(acc, 6) AS acc,
               ROUND(ABS(acc - conf), 6) AS gap, ece.ece AS ece
        FROM bins CROSS JOIN ece
        ORDER BY bin
    """


# ---------------------------------------------------------------------------
# Borůvka MST over the occupied-cell graph (session 11)
# ---------------------------------------------------------------------------

_MST_RES, _MST_ROUNDS, _MST_JUMPS = 4, 10, 10


def q_mst_cells(spark, sf_dir):
    """Minimum spanning tree of the occupied res-4 document-cell adjacency
    graph (8-adjacency, integer |density difference| weights, (w, a, b)
    total order ⇒ unique MST) by fixed-schedule distributed Borůvka:
    per round one grouped-min over the edge table picks each component's
    cheapest outgoing edge, then hook + 10 pointer-jumping shortcuts merge
    labels EXACTLY (2^10 ≥ node bound 512 — no convergence loop to
    truncate). The single-linkage/HDBSCAN backbone over tiles; Θ(log n)
    rounds of pure joins/aggs, zero floats. See `operators/mst.py`."""
    from raptor_service_spark.operators.mst import boruvka_mst, cell_edges

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(lat.alias("lat"), lng.alias("lng"))
    return boruvka_mst(
        cell_edges(pts, _MST_RES), rounds=_MST_ROUNDS, jumps=_MST_JUMPS
    )


def _mst_cells_sql() -> str:
    from raptor_service_spark.operators.mst import boruvka_mst_sql

    lat, lng = _latlng_sql("doc_id")
    return boruvka_mst_sql(
        f"SELECT {lat} AS lat, {lng} AS lng FROM documents",
        _MST_RES,
        rounds=_MST_ROUNDS,
        jumps=_MST_JUMPS,
    )


# ---------------------------------------------------------------------------
# MAD robust outliers per cell (session 11)
# ---------------------------------------------------------------------------


def q_mad_outliers(spark, sf_dir):
    """Robust per-cell outlier screen: median and MAD (median absolute
    deviation) of event values per res-3 cell — both EXACT order
    statistics on integer cents (lower-median convention: the
    ⌈n/2⌉-th smallest, so no averaging float) — then flag events with
    |v − med| > 3·MAD. The robust QC filter that survives the heavy
    tails that wreck mean/σ rules (`speed_anomalies`' z-scores). Scale
    shape: two windowed ranks partitioned BY CELL (parallel, no global
    sort) + one broadcast join back; top-20 most extreme flagged events."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    lat, lng = _latlng_cols(F.col("event_id"))
    base = ev.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vi"),
        cell_encode_col(lat, lng, 3).alias("cell"),
    )
    wc = Window.partitionBy("cell")
    med = (
        base.withColumn(
            "rn", F.row_number().over(wc.orderBy("vi", "event_id"))
        )
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.ceil(F.col("n") / 2))
        .select("cell", F.col("vi").alias("med"), F.col("n").alias("n_cell"))
    )
    dev = base.join(F.broadcast(med), "cell").withColumn(
        "ad", F.abs(F.col("vi") - F.col("med"))
    )
    mad = (
        dev.withColumn("rn", F.row_number().over(wc.orderBy("ad", "event_id")))
        .filter(F.col("rn") == F.ceil(F.col("n_cell") / 2))
        .select("cell", F.col("ad").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "cell")
        .filter(F.col("ad") > 3 * F.col("mad"))
        .select(
            "event_id",
            "cell",
            F.round(F.col("vi") / 100.0, 6).alias("value"),
            F.round(F.col("med") / 100.0, 6).alias("cell_median"),
            F.round(F.col("mad") / 100.0, 6).alias("cell_mad"),
            (F.col("ad") - 3 * F.col("mad")).alias("excess_cents"),
        )
        .orderBy(F.col("excess_cents").desc(), "event_id")
        .limit(20)
    )


def _mad_outliers_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH base AS (
            SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS vi,
                   {cell} AS cell
            FROM events),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                                            ORDER BY vi, event_id) AS rn,
                      COUNT(*) OVER (PARTITION BY cell) AS n
               FROM base),
        med AS (SELECT cell, vi AS med, n AS n_cell
                FROM rk WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)),
        dev AS (SELECT b.event_id, b.cell, b.vi, m.med, m.n_cell,
                       ABS(b.vi - m.med) AS ad
                FROM base b JOIN med m ON b.cell = m.cell),
        rk2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                                             ORDER BY ad, event_id) AS rn
                FROM dev),
        mad AS (SELECT cell, ad AS mad
                FROM rk2 WHERE rn = CAST(CEIL(n_cell / 2.0) AS BIGINT))
        SELECT d.event_id, d.cell,
               ROUND(d.vi / 100.0, 6) AS value,
               ROUND(d.med / 100.0, 6) AS cell_median,
               ROUND(x.mad / 100.0, 6) AS cell_mad,
               CAST(d.ad - 3 * x.mad AS BIGINT) AS excess_cents
        FROM dev d JOIN mad x ON d.cell = x.cell
        WHERE d.ad > 3 * x.mad
        ORDER BY excess_cents DESC, d.event_id
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# Theil inequality decomposition (session 11)
# ---------------------------------------------------------------------------


def q_theil_decomposition(spark, sf_dir):
    """Theil-T inequality of event activity across res-4 cells, EXACTLY
    decomposed into between-region and within-region parts over res-2
    parent regions (T = T_b + Σ s_r T_r) — the additive-decomposability
    property that makes Theil (not Gini) the inequality index for
    hierarchical tile rollups. All shares are exact integer ratios; ln
    appears only on those exact ratios (the `doc_perplexity` discipline);
    terms pre-rounded 9 dp. One count agg + two grouped sums."""
    from raptor_service_spark.geo.grid import cell_parent_col

    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    cells = (
        ev.select(cell_encode_col(lat, lng, 4).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("x"))
        .withColumn("region", cell_parent_col(F.col("cell"), 4, 2))
    )
    # NOTE: Spark resolves case-insensitively — the total must NOT be
    # named "X" or it collides with the per-cell "x".
    tot = cells.agg(
        F.sum("x").alias("xt"), F.count(F.lit(1)).alias("n")
    )
    reg = cells.groupBy("region").agg(
        F.sum("x").alias("xr"), F.count(F.lit(1)).alias("nr")
    )
    # within: per cell, term = (x/X)·ln( (x/X) / (xr·? ...) ) using the
    # per-region Theil: T_r = Σ_{i∈r} (x_i/X_r)·ln( n_r·x_i / X_r )
    j = cells.join(F.broadcast(reg), "region").crossJoin(F.broadcast(tot))
    tw_term = F.round(
        (F.col("x") / F.col("xr"))
        * F.log(F.col("nr") * F.col("x") / F.col("xr")),
        9,
    )
    within = (
        j.groupBy("region", "xr", "nr")
        .agg(F.sum(tw_term).alias("t_r"))
        .crossJoin(F.broadcast(tot))
    )
    tb_term = F.round(
        (F.col("xr") / F.col("xt"))
        * F.log(
            (F.col("xr") / F.col("xt")) / (F.col("nr") / F.col("n"))
        ),
        9,
    )
    tw_scaled = F.round((F.col("xr") / F.col("xt")) * F.col("t_r"), 9)
    out = within.agg(
        F.max("n").alias("n_cells"),
        F.count(F.lit(1)).alias("n_regions"),
        F.round(F.sum(tb_term), 6).alias("t_between"),
        F.round(F.sum(tw_scaled), 6).alias("t_within"),
        F.round(F.sum(tb_term) + F.sum(tw_scaled), 6).alias("t_total"),
    )
    return out


def _theil_decomposition_sql() -> str:
    from raptor_service_spark.geo.grid import cell_parent_sql

    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 4)
    region = cell_parent_sql("cell", 4, 2)
    return f"""
        WITH cells AS (
            SELECT cell, COUNT(*) AS x, {region} AS region
            FROM (SELECT {cell} AS cell FROM events) GROUP BY 1),
        tot AS (SELECT SUM(x) AS X, COUNT(*) AS n FROM cells),
        reg AS (SELECT region, SUM(x) AS xr, COUNT(*) AS nr
                FROM cells GROUP BY 1),
        within AS (
            SELECT c.region, r.xr, r.nr,
                   SUM(ROUND((c.x / CAST(r.xr AS DOUBLE))
                             * LN(r.nr * c.x / CAST(r.xr AS DOUBLE)), 9))
                       AS t_r
            FROM cells c JOIN reg r ON c.region = r.region
            GROUP BY 1, 2, 3)
        SELECT MAX(t.n) AS n_cells, COUNT(*) AS n_regions,
               ROUND(SUM(ROUND((w.xr / CAST(t.X AS DOUBLE))
                               * LN((w.xr / CAST(t.X AS DOUBLE))
                                    / (w.nr / CAST(t.n AS DOUBLE))), 9)), 6)
                   AS t_between,
               ROUND(SUM(ROUND((w.xr / CAST(t.X AS DOUBLE)) * w.t_r, 9)), 6)
                   AS t_within,
               ROUND(SUM(ROUND((w.xr / CAST(t.X AS DOUBLE))
                               * LN((w.xr / CAST(t.X AS DOUBLE))
                                    / (w.nr / CAST(t.n AS DOUBLE))), 9))
                     + SUM(ROUND((w.xr / CAST(t.X AS DOUBLE)) * w.t_r, 9)), 6)
                   AS t_total
        FROM within w CROSS JOIN tot t
    """


# ---------------------------------------------------------------------------
# jump-length distribution fit (session 11)
# ---------------------------------------------------------------------------


def q_jump_length_fit(spark, sf_dir):
    """Jump-length (displacement) distribution of consecutive user fixes
    with a log-log power-law slope — the mobility-science scaling law
    (González et al. 2008: P(Δr) ~ Δr^−β). Legs from the one-window lag
    chain, log₂-binned (exact: FLOOR(LOG2) on integer meters), per-bin
    counts, then the OLS slope of ln(count) on ln(2)·bin over non-empty
    bins — every float computed from aggregated exact integers. One
    window + two tiny aggs; the per-bin histogram is the reusable part."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.distance import haversine_col

    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # each user's FIRST fix has no jump: filter the null lag explicitly —
    # haversine_col's LEAST(1.0, NULL) would otherwise turn it into the
    # antipodal max (both engines' LEAST skip NULLs).
    lagged = (
        pts.withColumn("plat", F.lag("lat").over(w))
        .withColumn("plng", F.lag("lng").over(w))
        .filter(F.col("plat").isNotNull())
    )
    leg_m = (
        haversine_col(F.col("plat"), F.col("plng"), F.col("lat"), F.col("lng"))
        * 1000.0
    )
    # bin = floor(log2(round(leg_m))) computed EXACTLY as the bit length
    # of the integer meters (length(bin(m)) - 1) — libm log2 could round
    # differently across engines at exact powers of two.
    bins = (
        lagged.withColumn("leg_m", leg_m)
        .filter(F.col("leg_m") >= 1.0)
        .select(
            (
                F.length(F.bin(F.round("leg_m").cast("long"))) - 1
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    fit = bins.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("bin")).alias("sx"),
        F.sum(F.col("bin") * F.col("bin")).alias("sxx"),
        F.sum(F.round(F.log("cnt"), 9)).alias("sy"),
        F.sum(F.col("bin") * F.round(F.log("cnt"), 9)).alias("sxy"),
    ).select(
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / F.log(F.lit(2.0)),
            6,
        ).alias("slope_per_doubling")
    )
    return (
        bins.crossJoin(F.broadcast(fit))
        .select("bin", "cnt", "slope_per_doubling")
        .orderBy("bin")
    )


def _jump_length_fit_sql() -> str:
    from raptor_service_spark.geo.distance import haversine_sql

    lat, lng = _latlng_sql("event_id")
    leg = haversine_sql("plat", "plng", "lat", "lng")
    return f"""
        WITH p AS (SELECT user_id, ts, event_id,
                          {lat} AS lat, {lng} AS lng
                   FROM events),
        legs AS (SELECT ({leg}) * 1000.0 AS leg_m
                 FROM (SELECT user_id, lat, lng,
                              LAG(lat) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS plat,
                              LAG(lng) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS plng
                       FROM p)
                 WHERE plat IS NOT NULL),
        bins AS (SELECT CAST(length(bin(CAST(ROUND(leg_m) AS BIGINT))) - 1
                             AS BIGINT) AS bin,
                        COUNT(*) AS cnt
                 FROM legs WHERE leg_m >= 1.0 GROUP BY 1),
        fit AS (SELECT ROUND((COUNT(*) * SUM(bin * ROUND(LN(cnt), 9))
                              - SUM(bin) * SUM(ROUND(LN(cnt), 9)))
                             / (COUNT(*) * SUM(bin * bin)
                                - SUM(bin) * SUM(bin))
                             / LN(2.0), 6) AS slope_per_doubling
                FROM bins)
        SELECT bin, cnt, fit.slope_per_doubling
        FROM bins CROSS JOIN fit
        ORDER BY bin
    """


# ---------------------------------------------------------------------------
# density-similarity raster segmentation (session 11)
# ---------------------------------------------------------------------------

_SEG_RES, _SEG_MAXW = 4, 0  # merge only equal-density neighbors


def q_cell_segmentation(spark, sf_dir):
    """Raster segmentation of the document-density surface: merge
    8-adjacent res-4 cells whose counts differ by ≤ {maxw} (the classic
    connected-component labeling / region-growing step of every raster
    pipeline), components via the SAME fixed-schedule Borůvka merge as
    `mst_cells` (a graph's MST forest spans exactly its components).
    Isolated occupied cells stay singleton segments. Top-20 segments by
    size; all-integer."""
    from raptor_service_spark.operators.mst import cell_edges, graph_components

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(lat.alias("lat"), lng.alias("lng"))
    nodes = (
        pts.select(
            cell_encode_col(F.col("lat"), F.col("lng"), _SEG_RES).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    edges = cell_edges(pts, _SEG_RES).filter(F.col("w") <= _SEG_MAXW)
    comps = graph_components(edges, rounds=_MST_ROUNDS, nodes=nodes)
    return (
        comps.join(nodes, "cell")
        .groupBy(F.col("comp").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("cnt").alias("n_docs"),
        )
        .orderBy(F.col("n_cells").desc(), "segment")
        .limit(20)
    )


def _cell_segmentation_sql() -> str:
    from raptor_service_spark.operators.mst import boruvka_mst_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _SEG_RES)
    comps = boruvka_mst_sql(
        f"SELECT {lat} AS lat, {lng} AS lng FROM documents",
        _SEG_RES,
        rounds=_MST_ROUNDS,
        jumps=_MST_JUMPS,
        max_w=_SEG_MAXW,
        final="components",
    )
    return f"""
        SELECT x.comp AS segment, COUNT(*) AS n_cells,
               CAST(SUM(y.cnt) AS BIGINT) AS n_docs
        FROM ({comps}) x
        JOIN (SELECT {cell} AS cell, COUNT(*) AS cnt
              FROM documents GROUP BY 1) y ON x.cell = y.cell
        GROUP BY 1
        ORDER BY n_cells DESC, segment
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# distribution-based score fusion (session 11)
# ---------------------------------------------------------------------------


def q_dbsf_fusion(spark, sf_dir):
    """Distribution-based score fusion (DBSF): z-normalize each retrieval
    leg's scores over its own top-50 pool (BM25 keyword leg; cosine
    vector leg), fused = Σ z with 0 for a missing leg — the calibrated
    alternative to `hybrid_retrieval`'s rank-only RRF (score shape
    matters when one leg is confident). z pre-rounded 9 dp, fused 6 dp;
    the μ/σ come from 20-row aggregates. Same two-leg scan shape as RRF."""
    from pyspark.sql import Window

    from raptor_service_spark.operators.bm25 import bm25_topk

    kw = bm25_topk(
        _read(spark, sf_dir, "documents").select("doc_id", "text"),
        list(_BM25_TERMS),
        50,
    ).select("doc_id", F.col("score").alias("s"))
    kw_st = kw.agg(
        (F.sum("s") / F.count(F.lit(1))).alias("mu"),
        (F.sum(F.col("s") * F.col("s")) / F.count(F.lit(1))).alias("m2"),
    )
    kwz = kw.crossJoin(F.broadcast(kw_st)).select(
        "doc_id",
        F.round(
            (F.col("s") - F.col("mu"))
            / F.sqrt(
                F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(1e-12))
            ),
            9,
        ).alias("zk"),
    )
    e = _read(spark, sf_dir, "embeddings")
    vec = (
        e.withColumn(
            "sim", F.round(F.lit(1.0) - cosine_dist_col(F.col("embedding"), QVEC), 6)
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(50)
        .select(F.col("vec_id").alias("doc_id"), "sim")
    )
    vec_st = vec.agg(
        (F.sum("sim") / F.count(F.lit(1))).alias("mu"),
        (F.sum(F.col("sim") * F.col("sim")) / F.count(F.lit(1))).alias("m2"),
    )
    vecz = vec.crossJoin(F.broadcast(vec_st)).select(
        "doc_id",
        F.round(
            (F.col("sim") - F.col("mu"))
            / F.sqrt(
                F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(1e-12))
            ),
            9,
        ).alias("zv"),
    )
    return (
        kwz.join(vecz, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("zk"), F.lit(0.0))
                + F.coalesce(F.col("zv"), F.lit(0.0)),
                6,
            ).alias("dbsf"),
        )
        .orderBy(F.col("dbsf").desc(), "doc_id")
        .limit(10)
    )


def _dbsf_fusion_sql() -> str:
    return f"""
        WITH kw AS (SELECT doc_id, score AS s FROM ({_bm25_sql_entry(50)})),
        kst AS (SELECT SUM(s) / COUNT(*) AS mu,
                       SUM(s * s) / COUNT(*) AS m2 FROM kw),
        kwz AS (SELECT doc_id,
                       ROUND((s - mu) / SQRT(GREATEST(m2 - mu * mu, 1e-12)), 9)
                           AS zk
                FROM kw CROSS JOIN kst),
        vec AS (SELECT vec_id AS doc_id, sim
                FROM (SELECT vec_id,
                             ROUND(list_cosine_similarity(
                                 list_transform(embedding,
                                                x -> CAST(x AS DOUBLE)),
                                 {QVEC_SQL}), 6) AS sim
                      FROM embeddings
                      ORDER BY sim DESC, vec_id ASC LIMIT 50)),
        vst AS (SELECT SUM(sim) / COUNT(*) AS mu,
                       SUM(sim * sim) / COUNT(*) AS m2 FROM vec),
        vecz AS (SELECT doc_id,
                        ROUND((sim - mu)
                              / SQRT(GREATEST(m2 - mu * mu, 1e-12)), 9) AS zv
                 FROM vec CROSS JOIN vst)
        SELECT COALESCE(kwz.doc_id, vecz.doc_id) AS doc_id,
               ROUND(COALESCE(zk, 0.0) + COALESCE(zv, 0.0), 6) AS dbsf
        FROM kwz FULL OUTER JOIN vecz ON kwz.doc_id = vecz.doc_id
        ORDER BY dbsf DESC, doc_id ASC LIMIT 10
    """


# ---------------------------------------------------------------------------
# best-passage extraction (session 11)
# ---------------------------------------------------------------------------

_BP_W = 10  # passage window, tokens


def q_best_passage(spark, sf_dir):
    """Best-passage (snippet) extraction for the BM25 top-5 docs: the
    10-token window with the most query-term hits, tie-broken to the
    earliest start (argmax is a struct-max — no second pass). Candidate
    starts are query-term positions only (the optimal window starts at a
    hit), so the candidate join is O(hits²) per doc, hits ≤ tokens.
    Returns the reconstructed passage text — the search-result snippet
    leg the retrieval stack serves. All-integer + string ops."""
    from raptor_service_spark.operators.bm25 import bm25_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    top = bm25_topk(docs, list(_BM25_TERMS), 5).select("doc_id")
    toks = docs.join(F.broadcast(top), "doc_id").select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("p", "w"),
    )
    qt = toks.filter(F.col("w").isin(*_BM25_TERMS))
    a, b = qt.alias("a"), qt.alias("b")
    hits = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.p") >= F.col("a.p"))
            & (F.col("b.p") < F.col("a.p") + _BP_W),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.p").alias("start"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    best = hits.groupBy("doc_id").agg(
        F.max(F.struct(F.col("n_hits"), (-F.col("start")).alias("ns"))).alias("b")
    ).select(
        "doc_id",
        F.col("b.n_hits").alias("n_hits"),
        (-F.col("b.ns")).alias("start"),
    )
    passage = (
        toks.join(F.broadcast(best), "doc_id")
        .filter(
            (F.col("p") >= F.col("start")) & (F.col("p") < F.col("start") + _BP_W)
        )
        .groupBy("doc_id", "start", "n_hits")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("passage")
        )
    )
    return passage.select("doc_id", "start", "n_hits", "passage").orderBy(
        "doc_id"
    )


def _best_passage_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
        WITH top AS (SELECT doc_id FROM ({_bm25_sql_entry(5)})),
        t AS (SELECT d.doc_id,
                     regexp_split_to_array(trim(d.text), '\\s+') AS arr
              FROM documents d JOIN top ON d.doc_id = top.doc_id),
        toks AS (SELECT doc_id, u.p, u.w
                 FROM (SELECT doc_id,
                              UNNEST(list_transform(range(1, len(arr) + 1),
                                  i -> struct_pack(p := i - 1, w := arr[i])))
                                  AS u
                       FROM t)),
        qt AS (SELECT doc_id, p FROM toks WHERE w IN ({terms})),
        hits AS (SELECT a.doc_id, a.p AS start, COUNT(*) AS n_hits
                 FROM qt a JOIN qt b
                   ON a.doc_id = b.doc_id AND b.p >= a.p
                      AND b.p < a.p + {_BP_W}
                 GROUP BY 1, 2),
        best AS (SELECT doc_id,
                        MAX(struct_pack(n_hits := n_hits, ns := -start)) AS b
                 FROM hits GROUP BY 1),
        sel AS (SELECT doc_id, b.n_hits AS n_hits, -b.ns AS start FROM best)
        SELECT s.doc_id AS doc_id, CAST(s.start AS BIGINT) AS start,
               CAST(s.n_hits AS BIGINT) AS n_hits,
               string_agg(k.w, ' ' ORDER BY k.p) AS passage
        FROM sel s JOIN toks k
          ON k.doc_id = s.doc_id AND k.p >= s.start
             AND k.p < s.start + {_BP_W}
        GROUP BY 1, 2, 3
        ORDER BY s.doc_id
    """


# ---------------------------------------------------------------------------
# IDW leave-one-out cross-validation (session 11)
# ---------------------------------------------------------------------------

_LOOCV_EPS = 8.0


def q_idw_loocv(spark, sf_dir):
    """Leave-one-out cross-validation of the IDW field estimator: every
    site (bounded probe set, event_id < 2000) is predicted from its
    OTHER neighbors within ε via the one-shuffle cell/ring ε-join, and
    the pooled MAE/RMSE is the honesty metric `idw_interpolation` should
    publish next to its map (the model-validation leg of the kriging /
    IDW family). Errors in integer cents where possible; per-site preds
    6 dp, squared errors 9 dp before the final mean."""
    from raptor_service_spark.operators.pip_join import within_distance_join

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    probes = pts.filter(F.col("event_id") < 2000)
    pairs = within_distance_join(probes, pts, eps=_LOOCV_EPS).filter(
        F.col("l.event_id") != F.col("r.event_id")
    )
    wgt = F.lit(1.0) / (F.col("dist") + F.lit(0.001))
    pred = (
        pairs.groupBy(
            F.col("l.event_id").alias("event_id"), F.col("l.value").alias("truth")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.round(
                F.sum(F.col("r.value") * wgt) / F.sum(wgt), 6
            ).alias("pred"),
        )
    )
    err = F.col("pred") - F.col("truth")
    return pred.agg(
        F.count(F.lit(1)).alias("n_sites"),
        F.round(F.sum(F.round(F.abs(err), 9)) / F.count(F.lit(1)), 6).alias("mae"),
        F.round(
            F.sqrt(F.sum(F.round(err * err, 9)) / F.count(F.lit(1))), 6
        ).alias("rmse"),
    )


def _idw_loocv_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH p AS (SELECT event_id, value, {lat} AS lat, {lng} AS lng
                   FROM events),
        pr AS (SELECT * FROM p WHERE event_id < 2000),
        pairs AS (
            SELECT pr.event_id, pr.value AS truth, x.value AS nv,
                   ROUND(SQRT((pr.lat - x.lat) * (pr.lat - x.lat)
                            + (pr.lng - x.lng) * (pr.lng - x.lng)), 6) AS dist
            FROM pr JOIN p x
              ON pr.event_id != x.event_id
             AND ROUND(SQRT((pr.lat - x.lat) * (pr.lat - x.lat)
                          + (pr.lng - x.lng) * (pr.lng - x.lng)), 6)
                 <= {_LOOCV_EPS!r}),
        pred AS (SELECT event_id, truth, COUNT(*) AS n_nbrs,
                        ROUND(SUM(nv * (1.0 / (dist + 0.001)))
                              / SUM(1.0 / (dist + 0.001)), 6) AS pred
                 FROM pairs GROUP BY 1, 2)
        SELECT COUNT(*) AS n_sites,
               ROUND(SUM(ROUND(ABS(pred - truth), 9)) / COUNT(*), 6) AS mae,
               ROUND(SQRT(SUM(ROUND((pred - truth) * (pred - truth), 9))
                          / COUNT(*)), 6) AS rmse
        FROM pred
    """


# ---------------------------------------------------------------------------
# marching-squares contour extraction (raster→vector) (session 11)
# ---------------------------------------------------------------------------

_MS_RES, _MS_TAU = 4, 2
_MS_CORNERS = [(0, 0, 8), (1, 0, 4), (1, 1, 2), (0, 1, 1)]  # (dx, dy, bit)


def q_contour_cases(spark, sf_dir):
    """Marching squares over the res-4 document-density raster at
    iso-level τ={tau}: every 2×2 block touching an occupied cell gets its
    4-bit inside/outside case (off-grid corners = outside), and the
    boundary blocks (cases 1–14) are the VECTOR contour of the raster —
    exactly the raster→vector tile-materialization step a tile server
    runs to draw density outlines. Cases 5/10 are the saddle blocks (2
    segments each). One count agg + a 4-way broadcast corner join on the
    O(occupied) anchor set; all-integer."""
    from raptor_service_spark.operators.neighborhood import kring_neighbor_col

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    occ = (
        d.groupBy(cell_encode_col(lat, lng, _MS_RES).alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    anchors = (
        occ.select(
            F.explode(
                F.filter(
                    F.array(
                        *[
                            kring_neighbor_col("cell", _MS_RES, -dx, -dy)
                            for dx, dy, _ in _MS_CORNERS
                        ]
                    ),
                    lambda v: v.isNotNull(),
                )
            ).alias("anchor")
        )
        .distinct()
    )
    blocks = anchors
    case = F.lit(0)
    for k, (dx, dy, bit) in enumerate(_MS_CORNERS):
        corner = occ.select(
            F.col("cell").alias(f"c{k}"), F.col("cnt").alias(f"n{k}")
        )
        blocks = blocks.withColumn(
            f"c{k}", kring_neighbor_col("anchor", _MS_RES, dx, dy)
        ).join(F.broadcast(corner), f"c{k}", "left")
        case = case + F.when(
            F.coalesce(F.col(f"n{k}"), F.lit(0)) >= _MS_TAU, F.lit(bit)
        ).otherwise(F.lit(0))
    cased = blocks.select(case.alias("ms_case")).filter(
        ~F.col("ms_case").isin(0, 15)
    )
    return (
        cased.groupBy("ms_case")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
        .select(
            "ms_case",
            "n_blocks",
            (
                F.col("n_blocks")
                * F.when(F.col("ms_case").isin(5, 10), 2).otherwise(1)
            ).alias("n_segments"),
        )
        .orderBy("ms_case")
    )


def _contour_cases_sql() -> str:
    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    lat, lng = _latlng_sql("doc_id")
    cell = cell_encode_sql(lat, lng, _MS_RES)
    anchor_list = ", ".join(
        kring_neighbor_sql("o.cell", _MS_RES, str(-dx), str(-dy))
        for dx, dy, _ in _MS_CORNERS
    )
    corner_joins = []
    case_terms = []
    for k, (dx, dy, bit) in enumerate(_MS_CORNERS):
        nbr = kring_neighbor_sql("a.anchor", _MS_RES, str(dx), str(dy))
        corner_joins.append(f"LEFT JOIN occ o{k} ON o{k}.cell = {nbr}")
        case_terms.append(
            f"CASE WHEN COALESCE(o{k}.cnt, 0) >= {_MS_TAU} THEN {bit} ELSE 0 END"
        )
    case = " + ".join(case_terms)
    return f"""
        WITH occ AS MATERIALIZED (
            SELECT cell, COUNT(*) AS cnt
            FROM (SELECT {cell} AS cell FROM documents) GROUP BY 1),
        anchors AS (
            SELECT DISTINCT anchor FROM (
                SELECT UNNEST([{anchor_list}]) AS anchor
                FROM occ o)
            WHERE anchor IS NOT NULL),
        cased AS (
            SELECT {case} AS ms_case
            FROM anchors a
            {' '.join(corner_joins)})
        SELECT ms_case, COUNT(*) AS n_blocks,
               CAST(COUNT(*) * (CASE WHEN ms_case IN (5, 10) THEN 2 ELSE 1 END)
                    AS BIGINT) AS n_segments
        FROM cased WHERE ms_case NOT IN (0, 15)
        GROUP BY 1 ORDER BY ms_case
    """


# ---------------------------------------------------------------------------
# region vectorization: per-segment bounding boxes (session 11)
# ---------------------------------------------------------------------------


def q_region_bboxes(spark, sf_dir):
    """Vectorize the raster segments of `cell_segmentation` into bounding
    boxes: per equal-density region, cell count and integer (x, y) bbox
    corners plus the exact fill ratio n_cells/bbox-area — the
    region→geometry handoff a vector tile layer consumes. Top-10 regions
    by size; all arithmetic integer except the final exact-ratio round."""
    from raptor_service_spark.operators.mst import cell_edges, graph_components

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(lat.alias("lat"), lng.alias("lng"))
    nodes = (
        pts.select(
            cell_encode_col(F.col("lat"), F.col("lng"), _SEG_RES).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    edges = cell_edges(pts, _SEG_RES).filter(F.col("w") <= _SEG_MAXW)
    comps = graph_components(edges, rounds=_MST_ROUNDS, nodes=nodes)
    n = 1 << _SEG_RES
    base = _SEG_RES * (2**54)
    rem = F.col("cell") - F.lit(base)
    y = F.floor(rem / n).cast("long")
    x = (rem - y * n).cast("long")
    g = comps.select(F.col("comp").alias("segment"), x.alias("x"), y.alias("y"))
    agg = g.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    )
    area = (F.col("x1") - F.col("x0") + 1) * (F.col("y1") - F.col("y0") + 1)
    return (
        agg.select(
            "segment",
            "n_cells",
            "x0",
            "x1",
            "y0",
            "y1",
            F.round(F.col("n_cells") / area.cast("double"), 6).alias("fill"),
        )
        .orderBy(F.col("n_cells").desc(), "segment")
        .limit(10)
    )


def _region_bboxes_sql() -> str:
    from raptor_service_spark.operators.mst import boruvka_mst_sql

    lat, lng = _latlng_sql("doc_id")
    comps = boruvka_mst_sql(
        f"SELECT {lat} AS lat, {lng} AS lng FROM documents",
        _SEG_RES,
        rounds=_MST_ROUNDS,
        jumps=_MST_JUMPS,
        max_w=_SEG_MAXW,
        final="components",
    )
    n = 1 << _SEG_RES
    base = _SEG_RES * (2**54)
    return f"""
        WITH g AS (
            SELECT comp AS segment,
                   CAST(FLOOR((cell - {base}) / {n}) AS BIGINT) AS y,
                   CAST((cell - {base}) - CAST(FLOOR((cell - {base}) / {n})
                        AS BIGINT) * {n} AS BIGINT) AS x
            FROM ({comps})),
        agg AS (
            SELECT segment, COUNT(*) AS n_cells,
                   MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
            FROM g GROUP BY 1)
        SELECT segment, n_cells, x0, x1, y0, y1,
               ROUND(n_cells / CAST((x1 - x0 + 1) * (y1 - y0 + 1) AS DOUBLE), 6)
                   AS fill
        FROM agg
        ORDER BY n_cells DESC, segment
        LIMIT 10
    """


# ---------------------------------------------------------------------------
# ER blocking-quality evaluation (session 11)
# ---------------------------------------------------------------------------

_BQ_PFX = 24


def q_blocking_quality(spark, sf_dir):
    """Entity-resolution blocking evaluation on the planted-duplicate
    corpus: candidates = same-24-char-prefix blocks (the key the SNM and
    ROUGE stages use), ground truth = the planted (doc, doc+10⁶) twins.
    Reports the two standard blocking metrics — REDUCTION RATIO
    1 − |candidates|/C(n,2) (how much of the quadratic the key kills) and
    PAIRS COMPLETENESS |cand ∩ truth|/|truth| (what recall survived) —
    the audit that justifies every dedup blocking key before it ships.
    Exact integer ratios; candidate pairs stay inside blocks."""
    d = _docs_with_dups(spark, sf_dir)
    keyed = d.select(
        "doc_id", F.substring(F.trim(F.col("text")), 1, _BQ_PFX).alias("k")
    )
    blocks = keyed.groupBy("k").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum((F.col("doc_id") < 1000000).cast("long")).alias("lo"),
        F.sum((F.col("doc_id") >= 1000000).cast("long")).alias("hi"),
    )
    # candidate pairs per block = C(m,2); true pairs caught per block:
    # a planted twin shares its block iff both halves land in it, and
    # twins have IDENTICAL text, so per block that's min over the halves
    # of matching ids — exact: count of ids i with both i and i+1e6 in
    # the block. Identical text ⇒ same key ⇒ both in the same block, so
    # caught = number of lo ids whose twin exists = lo (every planted
    # twin shares the key). Kept verifiable: caught computed by a real
    # self-join rather than assumed.
    pairs = keyed.alias("a").join(
        keyed.alias("b"),
        (F.col("a.k") == F.col("b.k"))
        & (F.col("a.doc_id") + 1000000 == F.col("b.doc_id")),
    )
    caught = pairs.agg(F.count(F.lit(1)).alias("caught"))
    tot = keyed.agg(F.count(F.lit(1)).alias("n"))
    truth = keyed.filter(F.col("doc_id") < 1000000).agg(
        F.count(F.lit(1)).alias("n_truth")
    )
    cand = blocks.agg(
        F.sum(F.col("m") * (F.col("m") - 1) / 2).cast("long").alias("n_cand")
    )
    return (
        cand.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(truth))
        .crossJoin(F.broadcast(caught))
        .select(
            "n_cand",
            "n_truth",
            "caught",
            F.round(
                F.lit(1.0)
                - F.col("n_cand")
                / (F.col("n") * (F.col("n") - 1) / F.lit(2.0)),
                6,
            ).alias("reduction_ratio"),
            F.round(F.col("caught") / F.col("n_truth").cast("double"), 6).alias(
                "pairs_completeness"
            ),
        )
    )


def _blocking_quality_sql() -> str:
    return f"""
        WITH d AS (SELECT doc_id, text FROM {_DOCS_WITH_DUPS_SQL} t),
        keyed AS (SELECT doc_id, substr(trim(text), 1, {_BQ_PFX}) AS k FROM d),
        blocks AS (SELECT k, COUNT(*) AS m FROM keyed GROUP BY 1),
        cand AS (SELECT CAST(SUM(m * (m - 1) / 2) AS BIGINT) AS n_cand
                 FROM blocks),
        tot AS (SELECT COUNT(*) AS n FROM keyed),
        truth AS (SELECT COUNT(*) AS n_truth FROM keyed
                  WHERE doc_id < 1000000),
        caught AS (SELECT COUNT(*) AS caught
                   FROM keyed a JOIN keyed b
                     ON a.k = b.k AND a.doc_id + 1000000 = b.doc_id)
        SELECT cand.n_cand, truth.n_truth, caught.caught,
               ROUND(1.0 - cand.n_cand / (tot.n * (tot.n - 1) / 2.0), 6)
                   AS reduction_ratio,
               ROUND(caught.caught / CAST(truth.n_truth AS DOUBLE), 6)
                   AS pairs_completeness
        FROM cand CROSS JOIN tot CROSS JOIN truth CROSS JOIN caught
    """


# ---------------------------------------------------------------------------
# decision stump: best Gini split (session 11)
# ---------------------------------------------------------------------------


def q_decision_stump(spark, sf_dir):
    """Train a one-node decision tree: the n_chars threshold minimizing
    weighted Gini impurity for the (lang = 'en') label — the split-finding
    primitive inside every distributed tree learner (and the shape Spark
    MLlib's histogram-based splitter distributes). Relational: sort the
    distinct feature values once, prefix sums give left/right class
    counts at EVERY candidate split in one window pass — no per-split
    rescan. Exact integer counts; impurities are exact ratios pre-rounded
    9 dp; argmin tie-breaks to the smallest threshold."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").cast("long").alias("y")
    )
    per_v = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).alias("m"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    pre = per_v.select(
        "n_chars",
        F.sum("m").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    )
    tot = per_v.agg(F.sum("m").alias("n"), F.sum("pos").alias("p"))
    s = pre.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("n"))
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    nr = (F.col("n") - F.col("nl")).cast("double")
    pr = (F.col("p") - F.col("pl")).cast("double")
    gl = 1.0 - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl)
    gr = 1.0 - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr)
    gini = F.round((nl * gl + nr * gr) / F.col("n").cast("double"), 9)
    scored = s.select(
        F.col("n_chars").alias("threshold"),
        F.col("nl").alias("n_left"),
        F.col("pl").alias("pos_left"),
        gini.alias("gini"),
    )
    best = scored.agg(
        F.min(F.struct("gini", "threshold", "n_left", "pos_left")).alias("b")
    )
    return best.select(
        F.col("b.threshold").alias("threshold"),
        F.col("b.n_left").alias("n_left"),
        F.col("b.pos_left").alias("pos_left"),
        F.round(F.col("b.gini"), 6).alias("gini"),
    )


def _decision_stump_sql() -> str:
    return """
        WITH d AS (SELECT n_chars, CAST(lang = 'en' AS BIGINT) AS y
                   FROM documents),
        per_v AS (SELECT n_chars, COUNT(*) AS m, SUM(y) AS pos
                  FROM d GROUP BY 1),
        pre AS (SELECT n_chars,
                       SUM(m) OVER (ORDER BY n_chars) AS nl,
                       SUM(pos) OVER (ORDER BY n_chars) AS pl
                FROM per_v),
        tot AS (SELECT SUM(m) AS n, SUM(pos) AS p FROM per_v),
        s AS (SELECT pre.n_chars, pre.nl, pre.pl, tot.n, tot.p
              FROM pre CROSS JOIN tot WHERE pre.nl < tot.n),
        scored AS (SELECT n_chars AS threshold, nl AS n_left,
                          pl AS pos_left,
                          ROUND((CAST(nl AS DOUBLE)
                                   * (1.0
                                      - (CAST(pl AS DOUBLE) / nl)
                                        * (CAST(pl AS DOUBLE) / nl)
                                      - (CAST(nl - pl AS DOUBLE) / nl)
                                        * (CAST(nl - pl AS DOUBLE) / nl))
                               + CAST(n - nl AS DOUBLE)
                                   * (1.0
                                      - (CAST(p - pl AS DOUBLE) / (n - nl))
                                        * (CAST(p - pl AS DOUBLE) / (n - nl))
                                      - (CAST(n - nl - (p - pl) AS DOUBLE)
                                         / (n - nl))
                                        * (CAST(n - nl - (p - pl) AS DOUBLE)
                                           / (n - nl))))
                                / CAST(n AS DOUBLE), 9) AS gini
                   FROM s),
        best AS (SELECT MIN(struct_pack(gini := gini, threshold := threshold,
                                        n_left := n_left,
                                        pos_left := pos_left)) AS b
                 FROM scored)
        SELECT CAST(b.threshold AS BIGINT) AS threshold,
               CAST(b.n_left AS BIGINT) AS n_left,
               CAST(b.pos_left AS BIGINT) AS pos_left,
               ROUND(b.gini, 6) AS gini
        FROM best
    """


# ---------------------------------------------------------------------------
# entropy-regularized optimal transport (Sinkhorn) (session 11)
# ---------------------------------------------------------------------------

_OT_RES, _OT_K, _OT_EPS, _OT_ROUNDS = 2, 8, 20.0, 3


def q_ot_transport_plan(spark, sf_dir):
    """Entropy-regularized optimal transport between the DOCUMENT and
    EVENT density distributions over their top-8 res-2 cells: Sinkhorn
    iterations (3 rounds, unrolled identically in both engines) on
    K = exp(−cost/ε) with degree-space center distances — the
    distribution-alignment operator behind domain-shift measurement and
    OT-based dataset reweighting (how much mass must move WHERE, not just
    how much the histograms differ à la `jsd_sources`). The plan is
    bounded 8×8 by construction; marginals are exact integer ratios;
    u/v pre-rounded 9 dp per round (the kmeans/plsa unroll discipline).
    Output: the 64-entry transport plan with costs and masses."""
    from raptor_service_spark.geo.grid import cell_center_sql

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat_d, lng_d = _latlng_cols(F.col("doc_id"))
    ev = _read(spark, sf_dir, "events").select("event_id")
    lat_e, lng_e = _latlng_cols(F.col("event_id"))

    def top8(pts_cell):
        top = (
            pts_cell.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "cell")
            .limit(_OT_K)
        )
        tot = top.agg(F.sum("cnt").alias("tot"))
        clat, clng = cell_center_sql("cell", _OT_RES)
        return (
            top.crossJoin(F.broadcast(tot))
            .select(
                "cell",
                (F.col("cnt") / F.col("tot")).alias("w"),
                F.expr(clat).alias("clat"),
                F.expr(clng).alias("clng"),
            )
            .localCheckpoint(eager=True)
        )

    a = top8(d.select(cell_encode_col(lat_d, lng_d, _OT_RES).alias("cell")))
    b = top8(ev.select(cell_encode_col(lat_e, lng_e, _OT_RES).alias("cell")))
    aa = a.select(
        F.col("cell").alias("ca"),
        F.col("w").alias("wa"),
        F.col("clat").alias("ya"),
        F.col("clng").alias("xa"),
    )
    bb = b.select(
        F.col("cell").alias("cb"),
        F.col("w").alias("wb"),
        F.col("clat").alias("yb"),
        F.col("clng").alias("xb"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    K = (
        aa.crossJoin(F.broadcast(bb))
        .select(
            "ca",
            "cb",
            "wa",
            "wb",
            F.round(F.sqrt(dx * dx + dy * dy), 6).alias("cost"),
        )
        .withColumn("k", F.exp(-F.col("cost") / F.lit(_OT_EPS)))
        .localCheckpoint(eager=True)
    )
    u = aa.select("ca", F.lit(1.0).alias("u"))
    v = None
    for _ in range(_OT_ROUNDS):
        v = (
            K.join(F.broadcast(u), "ca")
            .groupBy("cb", "wb")
            .agg(F.sum(F.round(F.col("k") * F.col("u"), 9)).alias("s"))
            .select("cb", F.round(F.col("wb") / F.col("s"), 9).alias("v"))
        )
        u = (
            K.join(F.broadcast(v), "cb")
            .groupBy("ca", "wa")
            .agg(F.sum(F.round(F.col("k") * F.col("v"), 9)).alias("s"))
            .select("ca", F.round(F.col("wa") / F.col("s"), 9).alias("u"))
        )
    return (
        K.join(F.broadcast(u), "ca")
        .join(F.broadcast(v), "cb")
        .select(
            F.col("ca").alias("cell_a"),
            F.col("cb").alias("cell_b"),
            "cost",
            F.round(F.col("u") * F.col("k") * F.col("v"), 6).alias("mass"),
        )
        .orderBy("cell_a", "cell_b")
    )


def _ot_transport_plan_sql() -> str:
    from raptor_service_spark.geo.grid import cell_center_sql

    lat_d, lng_d = _latlng_sql("doc_id")
    lat_e, lng_e = _latlng_sql("event_id")
    cell_d = cell_encode_sql(lat_d, lng_d, _OT_RES)
    cell_e = cell_encode_sql(lat_e, lng_e, _OT_RES)
    clat, clng = cell_center_sql("cell", _OT_RES)
    rounds = []
    pu, pv = "u0", None
    for r in range(1, _OT_ROUNDS + 1):
        rounds.append(
            f"""v{r} AS (
               SELECT K.cb, ROUND(MAX(K.wb) / SUM(ROUND(K.k * {pu}.u, 9)), 9)
                          AS v
               FROM K JOIN {pu} ON K.ca = {pu}.ca GROUP BY K.cb)"""
        )
        rounds.append(
            f"""u{r} AS (
               SELECT K.ca, ROUND(MAX(K.wa) / SUM(ROUND(K.k * v{r}.v, 9)), 9)
                          AS u
               FROM K JOIN v{r} ON K.cb = v{r}.cb GROUP BY K.ca)"""
        )
        pu, pv = f"u{r}", f"v{r}"
    chain = ",\n        ".join(rounds)
    return f"""
        WITH da AS (SELECT {cell_d} AS cell FROM documents),
        db AS (SELECT {cell_e} AS cell FROM events),
        ta AS (SELECT cell, COUNT(*) AS cnt FROM da GROUP BY 1
               ORDER BY cnt DESC, cell LIMIT {_OT_K}),
        tb AS (SELECT cell, COUNT(*) AS cnt FROM db GROUP BY 1
               ORDER BY cnt DESC, cell LIMIT {_OT_K}),
        a AS (SELECT cell AS ca, cnt / CAST(tot AS DOUBLE) AS wa,
                     {clat} AS ya, {clng} AS xa
              FROM ta CROSS JOIN (SELECT SUM(cnt) AS tot FROM ta)),
        b AS (SELECT cell AS cb, cnt / CAST(tot AS DOUBLE) AS wb,
                     {clat} AS yb, {clng} AS xb
              FROM tb CROSS JOIN (SELECT SUM(cnt) AS tot FROM tb)),
        K AS MATERIALIZED (
            SELECT ca, cb, wa, wb,
                   ROUND(SQRT((xa - xb) * (xa - xb)
                            + (ya - yb) * (ya - yb)), 6) AS cost,
                   EXP(-ROUND(SQRT((xa - xb) * (xa - xb)
                                 + (ya - yb) * (ya - yb)), 6)
                       / {_OT_EPS!r}) AS k
            FROM a CROSS JOIN b),
        u0 AS (SELECT ca, 1.0 AS u FROM a),
        {chain}
        SELECT K.ca AS cell_a, K.cb AS cell_b, K.cost,
               ROUND({pu}.u * K.k * {pv}.v, 6) AS mass
        FROM K JOIN {pu} ON K.ca = {pu}.ca JOIN {pv} ON K.cb = {pv}.cb
        ORDER BY cell_a, cell_b
    """


# ---------------------------------------------------------------------------
# interleaved media run-lengths (session 11)
# ---------------------------------------------------------------------------


def q_media_run_lengths(spark, sf_dir):
    """Run-length structure of the INTERLEAVED corpus: consecutive spans
    of the same class (media vs text) form runs (gaps-and-islands on the
    span index), histogrammed by class and length — the layout statistic
    that tells a packing/rendering stage whether media arrives as
    galleries (long media runs) or inline singletons. Deterministic
    generator corpus; the oracle replays the generator as golden VALUES
    (the span_position_profile technique). All-integer."""
    from pyspark.sql import Window

    from raptor_service_spark.datagen import gen_documents_df

    docs = gen_documents_df(spark, 200, seed=31)
    spans = docs.select(
        "doc_id", F.posexplode(F.col("spans")).alias("j", "s")
    ).select(
        "doc_id", "j", (F.col("s.media_ref") != "").cast("int").alias("m")
    )
    w = Window.partitionBy("doc_id", "m").orderBy("j")
    runs = (
        spans.withColumn("grp", F.col("j") - F.row_number().over(w))
        .groupBy("doc_id", "m", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("m", "run_len")
        .agg(F.count(F.lit(1)).alias("n_runs"))
        .select(
            F.col("m").alias("is_media"),
            F.col("run_len"),
            "n_runs",
        )
        .orderBy("is_media", "run_len")
    )


def _media_run_lengths_sql(n_docs: int = 200, seed: int = 31) -> str:
    from raptor_service_spark.datagen import _gen_doc, doc_id_for

    rows = []
    for i in range(n_docs):
        d = _gen_doc(seed, i)
        did = doc_id_for(seed, i)
        for j, s in enumerate(d["spans"]):
            rows.append(f"('{did}', {j}, {1 if s['media_ref'] else 0})")
    return f"""
        WITH spans(doc_id, j, m) AS (VALUES {', '.join(rows)}),
        runs AS (
            SELECT doc_id, m,
                   j - ROW_NUMBER() OVER (PARTITION BY doc_id, m
                                          ORDER BY j) AS grp
            FROM spans),
        rl AS (SELECT doc_id, m, grp, COUNT(*) AS run_len
               FROM runs GROUP BY 1, 2, 3)
        SELECT CAST(m AS INT) AS is_media, run_len, COUNT(*) AS n_runs
        FROM rl GROUP BY 1, 2
        ORDER BY is_media, run_len
    """


# ---------------------------------------------------------------------------
# LRU tile-cache hit-rate simulation (session 11)
# ---------------------------------------------------------------------------

_LRU_CAP, _LRU_USERS = 4, 12


def _lru_step(dialect: str) -> str:
    """One LRU transition as a single expression, generated for both
    engines from this one source (the kalman/holt fold technique). The
    accumulator is [hits, mru .. lru] (BIGINT list); elements arrive as
    1-element lists so DuckDB's list_reduce sees uniform list types."""
    if dialect == "spark":
        acc, el = "acc", "element_at(el, 1)"
        cache = "slice(acc, 2, 100000)"
        contains = f"array_contains({cache}, {el})"
        hits = "element_at(acc, 1)"
        hit_new = (
            f"concat(array({hits} + 1L, {el}), "
            f"filter({cache}, x -> x != {el}))"
        )
        miss_new = (
            f"concat(array({hits}, {el}), slice({cache}, 1, {_LRU_CAP - 1}))"
        )
    else:
        el = "el[1]"
        cache = "list_slice(acc, 2, 100000)"
        contains = f"list_contains({cache}, {el})"
        hits = "acc[1]"
        hit_new = (
            f"list_concat([{hits} + 1, {el}], "
            f"list_filter({cache}, x -> x != {el}))"
        )
        miss_new = (
            f"list_concat([{hits}, {el}], list_slice({cache}, 1, {_LRU_CAP - 1}))"
        )
    return f"CASE WHEN {contains} THEN {hit_new} ELSE {miss_new} END"


def q_lru_hit_rate(spark, sf_dir):
    """LRU tile-cache simulation: replay each user's event-cell request
    stream (ts order) through an exact capacity-{cap} LRU and report the
    per-user hit rate — the cache-sizing measurement behind a tile
    server's memory budget (compulsory misses vs working-set reuse).
    The whole simulation is ONE ordered array fold per user (aggregate ↔
    list_reduce, step generated from one source — `_lru_step`); state
    is the [hits, mru..lru] integer list, so there is no float anywhere
    until the final exact hit ratio. One collect_list shuffle."""
    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    reqs = (
        ev.filter(F.col("user_id") < _LRU_USERS)
        .select(
            "user_id",
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
                F.col("event_id").alias("e"),
                cell_encode_col(lat, lng, 3).alias("c"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda s: s["c"]
            ).alias("cells")
        )
    )
    folded = reqs.withColumn(
        "res",
        F.expr(
            "aggregate(transform(cells, c -> array(c)), "
            f"array(CAST(0 AS BIGINT)), (acc, el) -> {_lru_step('spark')})"
        ),
    )
    return folded.select(
        "user_id",
        F.size("cells").alias("n_requests"),
        F.element_at("res", 1).alias("n_hits"),
        F.round(
            F.element_at("res", 1) / F.size("cells").cast("double"), 6
        ).alias("hit_rate"),
    ).orderBy("user_id")


def _lru_hit_rate_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    cell = cell_encode_sql(lat, lng, 3)
    return f"""
        WITH reqs AS (
            SELECT user_id,
                   LIST({cell} ORDER BY ts, event_id) AS cells
            FROM events WHERE user_id < {_LRU_USERS}
            GROUP BY 1),
        folded AS (
            SELECT user_id, cells,
                   list_reduce(
                       list_prepend([CAST(0 AS BIGINT)],
                                    list_transform(cells, c -> [c])),
                       (acc, el) -> {_lru_step('duck')}) AS res
            FROM reqs)
        SELECT user_id, CAST(len(cells) AS INT) AS n_requests,
               res[1] AS n_hits,
               ROUND(res[1] / CAST(len(cells) AS DOUBLE), 6) AS hit_rate
        FROM folded ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# positional retrieval: exact phrase search + minimal cover window (session 12)
# ---------------------------------------------------------------------------

_PHRASE = ("sort", "merge")


def q_phrase_search(spark, sf_dir):
    """Exact phrase search ("sort merge") via positional postings — the
    inverted-index leg BM25 can't serve (bag-of-words loses adjacency).
    Relational shape: tokenize once, keep ONLY the two query terms'
    postings (selective — the filter reaches the scan), then ONE
    (doc_id, position+1) equi-join pins adjacency; per-doc counts and a
    global top-20. At 100 TB the postings table is the precomputed index
    and the join is partition-pruned by term; nothing here is per-row
    Python. Top-20 docs by occurrence count (tie: doc_id)."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("p", "w"),
    ).filter(F.col("w").isin(*_PHRASE))
    a = (
        toks.filter(F.col("w") == _PHRASE[0])
        .select("doc_id", F.col("p").alias("p0"))
        .alias("pa")
    )
    b = (
        toks.filter(F.col("w") == _PHRASE[1])
        .select("doc_id", F.col("p").alias("p1"))
        .alias("pb")
    )
    hits = a.join(
        b,
        (F.col("pa.doc_id") == F.col("pb.doc_id"))
        & (F.col("p1") == F.col("p0") + 1),
    ).select(F.col("pa.doc_id").alias("doc_id"), "p0")
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "doc_id")
        .limit(20)
    )


def _phrase_search_sql() -> str:
    return f"""
        WITH t AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS arr
                   FROM documents),
        toks AS (SELECT doc_id, u.p, u.w
                 FROM (SELECT doc_id,
                              UNNEST(list_transform(range(1, len(arr) + 1),
                                  i -> struct_pack(p := i - 1, w := arr[i])))
                                  AS u
                       FROM t)
                 WHERE u.w IN ('{_PHRASE[0]}', '{_PHRASE[1]}')),
        hits AS (SELECT a.doc_id
                 FROM toks a JOIN toks b
                   ON a.doc_id = b.doc_id AND b.p = a.p + 1
                 WHERE a.w = '{_PHRASE[0]}' AND b.w = '{_PHRASE[1]}')
        SELECT doc_id, COUNT(*) AS n_occurrences
        FROM hits GROUP BY 1
        ORDER BY n_occurrences DESC, doc_id LIMIT 20
    """


def q_min_cover_window(spark, sf_dir):
    """Minimal cover window (proximity ranking): per document, the
    SHORTEST token window containing ALL query terms — the proximity
    signal ranking stacks blend with BM25 (closer co-occurrence = more
    topical). Candidate starts are term-hit positions only (the optimal
    window starts at a hit); for each start, each term's cover end is its
    min position >= start (one grouped agg over the O(hits²)-bounded
    hit-pair join — same bound as `best_passage`); a window is valid when
    all terms are covered. Per-doc min width tie-breaks to the earliest
    start. Top-20 docs by (width ASC, doc_id)."""
    terms = list(_BM25_TERMS)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    qt = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("p", "w"),
    ).filter(F.col("w").isin(*terms))
    a, b = qt.alias("a"), qt.alias("b")
    per_term = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("b.p") >= F.col("a.p")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.p").alias("start"),
            F.col("b.w").alias("w"),
        )
        .agg(F.min("b.p").alias("e"))
    )
    windows = (
        per_term.groupBy("doc_id", "start")
        .agg(F.count(F.lit(1)).alias("nt"), F.max("e").alias("fin"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id", "start", (F.col("fin") - F.col("start") + 1).alias("width"))
    )
    best = windows.groupBy("doc_id").agg(
        F.min(F.struct("width", "start")).alias("b")
    )
    return (
        best.select(
            "doc_id", F.col("b.width").alias("width"), F.col("b.start").alias("start")
        )
        .orderBy("width", "doc_id")
        .limit(20)
    )


def _min_cover_window_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
        WITH t AS (SELECT doc_id,
                          regexp_split_to_array(trim(text), '\\s+') AS arr
                   FROM documents),
        qt AS (SELECT doc_id, u.p, u.w
               FROM (SELECT doc_id,
                            UNNEST(list_transform(range(1, len(arr) + 1),
                                i -> struct_pack(p := i - 1, w := arr[i])))
                                AS u
                     FROM t)
               WHERE u.w IN ({terms})),
        per_term AS (SELECT a.doc_id, a.p AS start, b.w, MIN(b.p) AS e
                     FROM qt a JOIN qt b
                       ON a.doc_id = b.doc_id AND b.p >= a.p
                     GROUP BY 1, 2, 3),
        windows AS (SELECT doc_id, start,
                           MAX(e) - start + 1 AS width
                    FROM per_term GROUP BY doc_id, start
                    HAVING COUNT(*) = {len(_BM25_TERMS)}),
        best AS (SELECT doc_id,
                        MIN(struct_pack(width := width, start := start)) AS b
                 FROM windows GROUP BY 1)
        SELECT doc_id, CAST(b.width AS INT) AS width,
               CAST(b.start AS INT) AS start
        FROM best ORDER BY width, doc_id LIMIT 20
    """


# ---------------------------------------------------------------------------
# LCSS trajectory similarity (session 12)
# ---------------------------------------------------------------------------

_LCSS_EPS = 8.0  # degrees; squared threshold on resampled points


def q_lcss_pairs(spark, sf_dir):
    """LCSS trajectory similarity for the `dtw_pairs` 30-user cohort —
    the noise-robust member of the trajectory-metric family (DTW pays for
    every point, Hausdorff for the worst point; LCSS simply skips
    outliers). Same resample + broadcast pair-join + anti-diagonal codegen
    unroll as DTW, but the DP cells are INTEGERS, so cross-engine parity
    is exact with no float protocol at all. See `operators/dtw.py`."""
    from raptor_service_spark.operators.dtw import lcss_pairs, resample_traj

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .filter(F.col("user_id") < _DTW_COHORT)
    )
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.withColumn("lat", lat).withColumn("lng", lng)
    return lcss_pairs(resample_traj(pts, _DTW_L), _DTW_L, _LCSS_EPS)


def _lcss_pairs_sql() -> str:
    from raptor_service_spark.operators.dtw import lcss_pairs_sql

    lat, lng = _latlng_sql("event_id")
    return lcss_pairs_sql(
        f"(SELECT * FROM events WHERE user_id < {_DTW_COHORT}) ev",
        _DTW_L,
        _LCSS_EPS,
        lat_expr=lat,
        lng_expr=lng,
    )


# ---------------------------------------------------------------------------
# readability scores (session 12)
# ---------------------------------------------------------------------------

_FRE_SENT_TOKENS = 12  # pseudo-sentence length (the texttiling block trick)


def q_readability_scores(spark, sf_dir):
    """Flesch reading-ease per document over PSEUDO-sentences (fixed
    12-token blocks — the corpus has no sentence punctuation, the same
    convention `texttiling_boundaries` uses) with the vowel-group syllable
    heuristic: syllables = regexp count of [aeiou]+ runs (whitespace
    breaks every run, so the doc-level count equals the per-word sum).
    FRE = 206.835 − 1.015·words/sentences − 84.6·syllables/words — every
    input an exact integer, the score one shared closed-form expression
    (6 dp). Bottom-20 hardest docs (tie: doc_id) — the quality-filter leg
    next to `doc_quality_top20`."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("words"),
        F.regexp_count(F.col("text"), F.lit(r"[aeiou]+")).cast("long").alias("syllables"),
    ).withColumn(
        "sentences",
        F.ceil(F.col("words") / F.lit(_FRE_SENT_TOKENS)).cast("long"),
    )
    fre = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words") / F.col("sentences").cast("double"))
        - F.lit(84.6) * (F.col("syllables") / F.col("words").cast("double")),
        6,
    )
    return (
        base.select("doc_id", "words", "sentences", "syllables", fre.alias("fre"))
        .orderBy("fre", "doc_id")
        .limit(20)
    )


def _readability_scores_sql() -> str:
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS words,
                   len(regexp_extract_all(text, '[aeiou]+')) AS syllables
            FROM documents),
        s AS (SELECT doc_id, words, syllables,
                     CAST(CEIL(words / CAST({_FRE_SENT_TOKENS} AS DOUBLE))
                          AS BIGINT) AS sentences
              FROM base)
        SELECT doc_id, CAST(words AS INT) AS words, sentences,
               CAST(syllables AS BIGINT) AS syllables,
               ROUND(206.835
                     - 1.015 * (words / CAST(sentences AS DOUBLE))
                     - 84.6 * (syllables / CAST(words AS DOUBLE)), 6) AS fre
        FROM s ORDER BY fre, doc_id LIMIT 20
    """


# ---------------------------------------------------------------------------
# box-counting fractal dimension (session 12)
# ---------------------------------------------------------------------------

_BOX_RES = (1, 2, 3, 4, 5, 6)


def q_box_counting_dim(spark, sf_dir):
    """Box-counting (Minkowski) fractal dimension of the document point
    set: occupied-cell counts N(r) on the res 1..6 grid ladder, dimension
    = OLS slope of ln N(r) against r·ln 2 (uniform scatter → ~2; points
    on a curve → ~1; heavy clustering → lower) — the spatial-complexity
    scalar planners use to pick tiling depth. Scale shape: ONE encode at
    the finest res, parents by integer arithmetic, one distinct-agg per
    res over an exploded 6-entry ladder — never a rescan per res. OLS
    follows the `heaps_law` float protocol (ln terms + sums 9 dp, closed
    form last); x-sums over r = 1..6 are exact literals."""
    import math

    from raptor_service_spark.geo.grid import cell_encode_col, cell_parent_col

    d = _read(spark, sf_dir, "documents").select("doc_id")
    lat, lng = _latlng_cols(F.col("doc_id"))
    top = max(_BOX_RES)
    enc = d.select(cell_encode_col(lat, lng, top).alias(f"c{top}"))
    ladder = enc.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("res"),
                        (
                            F.col(f"c{top}")
                            if r == top
                            else cell_parent_col(F.col(f"c{top}"), top, r)
                        ).alias("cell"),
                    )
                    for r in _BOX_RES
                ]
            )
        ).alias("s")
    ).select("s.res", "s.cell")
    counts = ladder.groupBy("res").agg(F.countDistinct("cell").alias("n_cells"))
    n = len(_BOX_RES)
    sr = sum(_BOX_RES)
    srr = sum(r * r for r in _BOX_RES)
    xy = counts.select(
        "res", "n_cells", F.log(F.col("n_cells").cast("double")).alias("y")
    )
    sums = xy.agg(
        F.round(F.sum("y"), 9).alias("sy"),
        F.round(F.sum(F.col("res") * F.col("y")), 9).alias("sry"),
    )
    slope = (F.lit(float(n)) * F.col("sry") - F.lit(float(sr)) * F.col("sy")) / F.lit(
        float(n * srr - sr * sr)
    )
    dim = sums.select(
        F.round(slope / F.lit(math.log(2.0)), 6).alias("fractal_dim")
    )
    return (
        counts.crossJoin(F.broadcast(dim))
        .select("res", "n_cells", "fractal_dim")
        .orderBy("res")
    )


def _box_counting_dim_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    top = max(_BOX_RES)
    c_top = cell_encode_sql(lat, lng, top)
    arms = " UNION ALL ".join(
        f"SELECT {r} AS res, "
        + (c_top if r == top else cell_parent_sql(c_top, top, r))
        + " AS cell FROM documents"
        for r in _BOX_RES
    )
    n = len(_BOX_RES)
    sr = sum(_BOX_RES)
    srr = sum(r * r for r in _BOX_RES)
    return f"""
        WITH ladder AS ({arms}),
        counts AS (SELECT res, COUNT(DISTINCT cell) AS n_cells
                   FROM ladder GROUP BY 1),
        xy AS (SELECT res, n_cells, LN(CAST(n_cells AS DOUBLE)) AS y
               FROM counts),
        sums AS (SELECT ROUND(SUM(y), 9) AS sy,
                        ROUND(SUM(res * y), 9) AS sry
                 FROM xy),
        dim AS (SELECT ROUND((({n}.0 * sry - {sr}.0 * sy)
                              / {float(n * srr - sr * sr)!r}) / LN(2.0), 6)
                           AS fractal_dim
                FROM sums)
        SELECT res, n_cells, fractal_dim
        FROM counts CROSS JOIN dim
        ORDER BY res
    """


# ---------------------------------------------------------------------------
# Spearman rank correlation (session 12)
# ---------------------------------------------------------------------------

_SPEARMAN_N = 100000  # bound keeps doubled-rank square-sums within 2^53


def q_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between event value and latitude —
    the monotone-association screen Pearson (`value_correlations`) misses
    when the relationship is nonlinear. Tie-safe: average ranks enter as
    EXACT doubled integers (2·avg_rank = 2·RANK() + tie_count − 1), every
    aggregate is an exact BIGINT (bounded cohort keeps Σ(2r)² < 2^53),
    and only the final closed form runs in float — identical expression
    both engines, no summation-order exposure at all. One row: rho 6 dp."""
    from pyspark.sql import Window

    ev = (
        _read(spark, sf_dir, "events")
        .select("event_id", "value")
        .filter(F.col("event_id") < _SPEARMAN_N)
    )
    lat, _lng = _latlng_cols(F.col("event_id"))
    base = ev.select(F.col("value").alias("v"), lat.alias("g"))

    def dbl_rank(c):
        return (
            F.lit(2) * F.rank().over(Window.orderBy(c))
            + F.count(F.lit(1)).over(Window.partitionBy(c))
            - F.lit(1)
        ).cast("long")

    ranked = base.select(dbl_rank(F.col("v")).alias("x"), dbl_rank(F.col("g")).alias("y"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return s.select("n", F.round(num / den, 6).alias("rho"))


def _spearman_corr_sql() -> str:
    lat, _lng = _latlng_sql("event_id")
    return f"""
        WITH base AS (SELECT value AS v, {lat} AS g
                      FROM events WHERE event_id < {_SPEARMAN_N}),
        ranked AS (SELECT
            CAST(2 * RANK() OVER (ORDER BY v)
                 + COUNT(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS x,
            CAST(2 * RANK() OVER (ORDER BY g)
                 + COUNT(*) OVER (PARTITION BY g) - 1 AS BIGINT) AS y
            FROM base),
        s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * x) AS sxx, SUM(y * y) AS syy,
                     SUM(x * y) AS sxy
              FROM ranked)
        SELECT n,
               ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                   AS rho
        FROM s
    """


# ---------------------------------------------------------------------------
# reverse-NN influence set (session 12)
# ---------------------------------------------------------------------------

_RNN_Q = (-80.0, -140.0)  # (lat, lng); non-empty influence set at every SF
_RNN_COHORT = 4000


def q_rnn_influence(spark, sf_dir):
    """Reverse-nearest-neighbor influence set of a candidate facility Q:
    the documents that would adopt Q as their NEW nearest neighbor, i.e.
    dist(d, Q) < dist(d, d's current nearest other document) — the
    bichromatic RNN query behind facility placement and cache-node
    election. Spark path: per-doc exact NN distance from the ring-doubling
    self-join (`nn_distances` — each round shuffles unresolved points ×
    cover cells, never doc × doc) + one codegen distance to Q. The oracle
    brute-forces the bounded cohort. Both engines compare UNROUNDED
    distances computed by the same single expression (IEEE sqrt is
    correctly rounded — identical bits), so the strict < is parity-safe;
    display values round 6 dp. Ordered by distance to Q."""
    from raptor_service_spark.operators.geo_knn import nn_distances

    d = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _RNN_COHORT)
    )
    lat, lng = _latlng_cols(F.col("doc_id"))
    pts = d.select(F.col("doc_id").alias("pid"), lng.alias("px"), lat.alias("py"))
    nn = nn_distances(pts, res=4, max_ring=64)
    qd = pts.select(
        "pid",
        "px",
        "py",
        F.sqrt(
            (F.col("px") - F.lit(_RNN_Q[1])) * (F.col("px") - F.lit(_RNN_Q[1]))
            + (F.col("py") - F.lit(_RNN_Q[0])) * (F.col("py") - F.lit(_RNN_Q[0]))
        ).alias("dq"),
    )
    out = qd.join(nn, "pid").filter(F.col("dq") < F.col("d1"))
    return out.select(
        F.col("pid").alias("doc_id"),
        F.round("dq", 6).alias("dist_q"),
        F.round("d1", 6).alias("dist_nn"),
        F.col("nn_id"),
    ).orderBy("dist_q", "doc_id")


def _rnn_influence_sql() -> str:
    lat, lng = _latlng_sql("doc_id")
    return f"""
        WITH pts AS (SELECT doc_id AS pid, {lng} AS px, {lat} AS py
                     FROM documents WHERE doc_id < {_RNN_COHORT}),
        nn AS (SELECT a.pid,
                      MIN(struct_pack(
                          d := SQRT((a.px - b.px) * (a.px - b.px)
                                  + (a.py - b.py) * (a.py - b.py)),
                          did := b.pid)) AS b
               FROM pts a JOIN pts b ON a.pid <> b.pid
               GROUP BY 1),
        qd AS (SELECT pid, px, py,
                      SQRT((px - {_RNN_Q[1]!r}) * (px - {_RNN_Q[1]!r})
                         + (py - {_RNN_Q[0]!r}) * (py - {_RNN_Q[0]!r})) AS dq
               FROM pts)
        SELECT qd.pid AS doc_id, ROUND(qd.dq, 6) AS dist_q,
               ROUND(nn.b.d, 6) AS dist_nn, nn.b.did AS nn_id
        FROM qd JOIN nn ON qd.pid = nn.pid
        WHERE qd.dq < nn.b.d
        ORDER BY dist_q, doc_id
    """


# ---------------------------------------------------------------------------
# gradient-boosted stumps (session 12)
# ---------------------------------------------------------------------------


def q_boosted_stumps(spark, sf_dir):
    """Two rounds of L2 gradient boosting with decision-stump base
    learners on (n_chars → lang = 'en') — the distributed-GBDT kernel one
    level up from `decision_stump`. Everything runs on the AGGREGATED
    per-feature-value table (v, m, pos): round 1 maximizes the variance
    gain pl²/nl + pr²/nr from exact-integer prefix sums; round-2 residual
    sums per value are closed forms of (m, pos, leaf prediction), so the
    residual fit never touches row-level floats. Leaf values and gains are
    pre-rounded 9 dp (the kmeans/plsa unroll discipline); prefix sums run
    in value order in BOTH engines, so float accumulation order is
    identical. Output: one row per round (threshold, left/right value)."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").cast("long").alias("y")
    )
    per_v = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).alias("m"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_v.agg(F.sum("m").alias("n"), F.sum("pos").alias("p"))
    pre = (
        per_v.select(
            "n_chars",
            F.sum("m").over(w).alias("nl"),
            F.sum("pos").over(w).alias("pl"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
    )
    nl = F.col("nl").cast("double")
    nr = (F.col("n") - F.col("nl")).cast("double")
    pl = F.col("pl").cast("double")
    pr = (F.col("p") - F.col("pl")).cast("double")
    gain1 = F.round(pl * pl / nl + pr * pr / nr, 9)
    b1 = pre.agg(
        F.max(F.struct(gain1.alias("g"), (-F.col("n_chars")).alias("nv"))).alias("b")
    ).select((-F.col("b.nv")).alias("t1"))
    r1 = (
        pre.crossJoin(F.broadcast(b1))
        .filter(F.col("n_chars") == F.col("t1"))
        .select(
            "t1",
            F.round(pl / nl, 9).alias("lv1"),
            F.round(pr / nr, 9).alias("rv1"),
        )
    )
    # round 2: residual aggregates per value from (m, pos, leaf prediction)
    res = per_v.crossJoin(F.broadcast(r1)).select(
        "n_chars",
        "m",
        (
            F.col("pos").cast("double")
            - F.col("m").cast("double")
            * F.when(F.col("n_chars") <= F.col("t1"), F.col("lv1")).otherwise(
                F.col("rv1")
            )
        ).alias("s"),
        "t1",
        "lv1",
        "rv1",
    )
    tot2 = res.groupBy("t1", "lv1", "rv1").agg(
        F.sum("m").alias("n"), F.round(F.sum("s"), 9).alias("stot")
    )
    pre2 = (
        res.select(
            "n_chars",
            F.sum("m").over(w).alias("nl"),
            F.round(F.sum("s").over(w), 9).alias("sl"),
        )
        .crossJoin(F.broadcast(tot2))
        .filter(F.col("nl") < F.col("n"))
    )
    sl = F.col("sl")
    sr = F.col("stot") - F.col("sl")
    nl2 = F.col("nl").cast("double")
    nr2 = (F.col("n") - F.col("nl")).cast("double")
    gain2 = F.round(sl * sl / nl2 + sr * sr / nr2, 9)
    b2 = pre2.agg(
        F.max(
            F.struct(
                gain2.alias("g"),
                (-F.col("n_chars")).alias("nv"),
                F.round(sl / nl2, 9).alias("lv"),
                F.round(sr / nr2, 9).alias("rv"),
            )
        ).alias("b"),
        F.first("t1").alias("t1"),
        F.first("lv1").alias("lv1"),
        F.first("rv1").alias("rv1"),
    )
    out = b2.select(
        F.lit(1).alias("round"),
        F.col("t1").alias("threshold"),
        F.col("lv1").alias("left_value"),
        F.col("rv1").alias("right_value"),
    ).unionByName(
        b2.select(
            F.lit(2).alias("round"),
            (-F.col("b.nv")).alias("threshold"),
            F.col("b.lv").alias("left_value"),
            F.col("b.rv").alias("right_value"),
        )
    )
    return out.orderBy("round")


def _boosted_stumps_sql() -> str:
    return """
        WITH d AS (SELECT n_chars, CAST(lang = 'en' AS BIGINT) AS y
                   FROM documents),
        per_v AS (SELECT n_chars, COUNT(*) AS m, SUM(y) AS pos
                  FROM d GROUP BY 1),
        tot AS (SELECT SUM(m) AS n, SUM(pos) AS p FROM per_v),
        pre AS (SELECT n_chars,
                       SUM(m) OVER (ORDER BY n_chars) AS nl,
                       SUM(pos) OVER (ORDER BY n_chars) AS pl,
                       tot.n, tot.p
                FROM per_v CROSS JOIN tot),
        s1 AS (SELECT n_chars, nl, pl, n, p,
                      ROUND(CAST(pl AS DOUBLE) * pl / nl
                            + CAST(p - pl AS DOUBLE) * (p - pl) / (n - nl), 9)
                          AS gain
               FROM pre WHERE nl < n),
        b1 AS (SELECT MAX(struct_pack(g := gain, nv := -n_chars)) AS b
               FROM s1),
        r1 AS (SELECT s1.n_chars AS t1,
                      ROUND(CAST(s1.pl AS DOUBLE) / s1.nl, 9) AS lv1,
                      ROUND(CAST(s1.p - s1.pl AS DOUBLE) / (s1.n - s1.nl), 9)
                          AS rv1
               FROM s1 CROSS JOIN b1 WHERE s1.n_chars = -b1.b.nv),
        res AS (SELECT per_v.n_chars, per_v.m,
                       CAST(per_v.pos AS DOUBLE)
                       - CAST(per_v.m AS DOUBLE)
                         * (CASE WHEN per_v.n_chars <= r1.t1
                                 THEN r1.lv1 ELSE r1.rv1 END) AS s,
                       r1.t1, r1.lv1, r1.rv1
                FROM per_v CROSS JOIN r1),
        tot2 AS (SELECT t1, lv1, rv1, SUM(m) AS n,
                        ROUND(SUM(s), 9) AS stot
                 FROM res GROUP BY 1, 2, 3),
        pre2 AS (SELECT res.n_chars,
                        SUM(res.m) OVER (ORDER BY res.n_chars) AS nl,
                        ROUND(SUM(res.s) OVER (ORDER BY res.n_chars), 9) AS sl,
                        tot2.n, tot2.stot, tot2.t1, tot2.lv1, tot2.rv1
                 FROM res CROSS JOIN tot2),
        s2 AS (SELECT *,
                      ROUND(sl * sl / nl
                            + (stot - sl) * (stot - sl) / (n - nl), 9) AS gain
               FROM pre2 WHERE nl < n),
        b2 AS (SELECT MAX(struct_pack(
                          g := gain, nv := -n_chars,
                          lv := ROUND(sl / nl, 9),
                          rv := ROUND((stot - sl) / (n - nl), 9))) AS b,
                      FIRST(t1) AS t1, FIRST(lv1) AS lv1, FIRST(rv1) AS rv1
               FROM s2)
        SELECT 1 AS round, CAST(t1 AS BIGINT) AS threshold,
               lv1 AS left_value, rv1 AS right_value FROM b2
        UNION ALL
        SELECT 2 AS round, CAST(-b.nv AS BIGINT) AS threshold,
               b.lv AS left_value, b.rv AS right_value FROM b2
        ORDER BY round
    """


# ---------------------------------------------------------------------------
# 1-D Gaussian-mixture EM on log(value) (session 12)
# ---------------------------------------------------------------------------

_GMM_K = 3
_GMM_ROUNDS = 3
_GMM_VFLOOR = 0.01  # variance floor: keeps densities finite, stops collapse


def q_gmm_em_values(spark, sf_dir):
    """1-D Gaussian-mixture EM (K=3, 3 rounds) on ln(event value) — the
    soft-clustering analog of `kmeans_geo` and the direct stand-in for the
    reference's GMM cluster step (utils/cluster.py:45-53): lognormal value
    mixtures are the classic event-magnitude decomposition. Same iterative
    discipline as kmeans/plsa: parameters are O(K) driver state, each EM
    round is ONE full-scan codegen agg (densities over literal params, no
    join, no shuffle of the points), params re-rounded 6 dp per round so
    the unrolled DuckDB CTE chain converges on identical doubles.

    Float parity: per-row responsibilities are the identical expression in
    both engines (exp/sqrt over the same 6-dp literals); sums are left
    UNROUNDED and only the ratios (mu = Sxr·x/Sr etc.) are rounded — ratio
    relative error from summation order is ~sqrt(n)·eps ≈ 1e-14, far below
    the 5e-7 boundary of the 6-dp rounding (the od_ipf knife-edge lesson:
    never 9-dp-round a large-magnitude intermediate sum). Rows whose total
    density underflows to exact 0.0 (deterministic in IEEE, identical both
    engines) are excluded from the M-step."""
    xdf = (
        _read(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select(F.log(F.col("value")).alias("x"))
        .localCheckpoint(eager=True)  # reused K_ROUNDS+1 times
    )
    st = xdf.agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.avg("x").alias("ax"),
        F.avg(F.col("x") * F.col("x")).alias("axx"),
    )
    init = st.select(
        F.round(
            F.greatest(
                F.col("axx") - F.col("ax") * F.col("ax"), F.lit(_GMM_VFLOOR)
            ),
            6,
        ).alias("vini"),
        *[
            F.round(
                F.col("mn")
                + F.lit((k + 0.5) / _GMM_K) * (F.col("mx") - F.col("mn")),
                6,
            ).alias(f"mu{k}")
            for k in range(_GMM_K)
        ],
    ).collect()[0]
    params = [(1.0 / 3.0, init[f"mu{k}"], init["vini"]) for k in range(_GMM_K)]

    for _ in range(_GMM_ROUNDS):
        dens = [
            F.lit(w)
            * F.exp(
                -(F.col("x") - F.lit(mu))
                * (F.col("x") - F.lit(mu))
                / (F.lit(2.0) * F.lit(v))
            )
            / F.sqrt(F.lit(v))
            for (w, mu, v) in params
        ]
        es = dens[0] + dens[1] + dens[2]
        rows = xdf.select(
            "x", es.alias("es"), *[dens[k].alias(f"e{k}") for k in range(_GMM_K)]
        ).filter(F.col("es") > 0)
        aggs = [F.count(F.lit(1)).alias("cnt")]
        for k in range(_GMM_K):
            r = F.col(f"e{k}") / F.col("es")
            aggs += [
                F.sum(r).alias(f"s{k}"),
                F.sum(r * F.col("x")).alias(f"sx{k}"),
                F.sum(r * F.col("x") * F.col("x")).alias(f"sxx{k}"),
            ]
        a = rows.agg(*aggs)
        b = a.select(
            "*",
            *[
                F.round(F.col(f"sx{k}") / F.col(f"s{k}"), 6).alias(f"nmu{k}")
                for k in range(_GMM_K)
            ],
        )
        c = b.select(
            *[
                F.round(
                    F.col(f"s{k}") / F.col("cnt").cast("double"), 6
                ).alias(f"nw{k}")
                for k in range(_GMM_K)
            ],
            *[F.col(f"nmu{k}") for k in range(_GMM_K)],
            *[
                F.round(
                    F.greatest(
                        F.col(f"sxx{k}") / F.col(f"s{k}")
                        - F.col(f"nmu{k}") * F.col(f"nmu{k}"),
                        F.lit(_GMM_VFLOOR),
                    ),
                    6,
                ).alias(f"nv{k}")
                for k in range(_GMM_K)
            ],
        ).collect()[0]
        params = [
            (c[f"nw{k}"], c[f"nmu{k}"], c[f"nv{k}"]) for k in range(_GMM_K)
        ]

    return (
        spark.createDataFrame(
            [(k, params[k][0], params[k][1], params[k][2]) for k in range(_GMM_K)],
            "comp int, weight double, mu double, sigma2 double",
        )
        .orderBy("comp")
    )


def _gmm_em_values_sql() -> str:
    k_range = range(_GMM_K)
    fr = [repr((k + 0.5) / _GMM_K) for k in k_range]
    p0 = ", ".join(
        f"(1.0/3.0) AS w{k}, ROUND(mn + {fr[k]} * (mx - mn), 6) AS mu{k}, "
        f"vini AS v{k}"
        for k in k_range
    )
    steps = []
    prev = "p0"
    for t in range(1, _GMM_ROUNDS + 1):
        dens = ", ".join(
            f"p.w{k} * EXP(-(x.x - p.mu{k}) * (x.x - p.mu{k}) "
            f"/ (2.0 * p.v{k})) / SQRT(p.v{k}) AS e{k}"
            for k in k_range
        )
        sums = ", ".join(
            f"SUM(e{k} / es) AS s{k}, SUM(e{k} / es * x) AS sx{k}, "
            f"SUM(e{k} / es * x * x) AS sxx{k}"
            for k in k_range
        )
        mus = ", ".join(f"ROUND(sx{k} / s{k}, 6) AS nmu{k}" for k in k_range)
        news = ", ".join(
            f"ROUND(s{k} / CAST(cnt AS DOUBLE), 6) AS w{k}, nmu{k} AS mu{k}, "
            f"ROUND(GREATEST(sxx{k} / s{k} - nmu{k} * nmu{k}, {_GMM_VFLOOR}), 6)"
            f" AS v{k}"
            for k in k_range
        )
        steps.append(
            f"""d{t} AS (SELECT x.x, {dens} FROM x CROSS JOIN {prev} p),
        f{t} AS (SELECT x, e0, e1, e2, e0 + e1 + e2 AS es FROM d{t}
                 WHERE e0 + e1 + e2 > 0),
        s{t} AS (SELECT COUNT(*) AS cnt, {sums} FROM f{t}),
        m{t} AS (SELECT *, {mus} FROM s{t}),
        p{t} AS (SELECT {news} FROM m{t})"""
        )
        prev = f"p{t}"
    chain = ",\n        ".join(steps)
    arms = " UNION ALL ".join(
        f"SELECT {k} AS comp, w{k} AS weight, mu{k} AS mu, v{k} AS sigma2 "
        f"FROM {prev}"
        for k in k_range
    )
    return f"""
        WITH x AS (SELECT LN(value) AS x FROM events WHERE value > 0),
        st AS (SELECT MIN(x) AS mn, MAX(x) AS mx,
                      ROUND(GREATEST(AVG(x * x) - AVG(x) * AVG(x),
                                     {_GMM_VFLOOR}), 6) AS vini
               FROM x),
        p0 AS (SELECT {p0} FROM st),
        {chain}
        SELECT comp, weight, mu, sigma2 FROM ({arms}) ORDER BY comp
    """


# ---------------------------------------------------------------------------
# group meeting point — Weiszfeld geometric median (session 12)
# ---------------------------------------------------------------------------

_MEET_ROUNDS = 3
_MEET_EPS = 1e-6  # smoothed distance sqrt(d2 + eps): bounds 1/d, kills the
# Weiszfeld singularity when the estimate lands on a data point


def q_meeting_point(spark, sf_dir):
    """Geometric median ("meeting point") per event_type via 3 smoothed
    Weiszfeld rounds — the L1-optimal facility location the plain centroid
    (`spherical_centroid`) over-smooths: the median is outlier-robust, the
    workhorse behind dispatch-point and depot placement. Init = centroid;
    each round reweights points by 1/sqrt(d²+ε) toward the current
    estimate and takes the weighted mean, re-rounded 6 dp (the kmeans/ipf
    unroll discipline). Output adds the mean distance to the final point.

    Scale shape: per-group estimates are O(groups) rows; each round is one
    broadcast join of the checkpointed point table against that tiny
    estimate table + a partial+final agg — never a point×point dataflow,
    and rounds are fixed (3), not convergence-polled. Float parity: per-row
    weights are identical doubles in both engines (sqrt and division are
    correctly rounded IEEE ops over identical inputs); only the final
    ratios get the 6-dp rounding, keeping knife-edges ~1e-13 away."""
    ev = _read(spark, sf_dir, "events").select("event_id", "event_type")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        "event_type", lat.alias("y"), lng.alias("x")
    ).localCheckpoint(eager=True)
    m = pts.groupBy("event_type").agg(
        F.round(F.avg("y"), 6).alias("my"), F.round(F.avg("x"), 6).alias("mx")
    )
    for _ in range(_MEET_ROUNDS):
        j = pts.join(F.broadcast(m), "event_type")
        w = F.lit(1.0) / F.sqrt(
            (F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))
            + (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))
            + F.lit(_MEET_EPS)
        )
        m = (
            j.select(
                "event_type",
                w.alias("w"),
                (w * F.col("y")).alias("wy"),
                (w * F.col("x")).alias("wx"),
            )
            .groupBy("event_type")
            .agg(
                F.round(F.sum("wy") / F.sum("w"), 6).alias("my"),
                F.round(F.sum("wx") / F.sum("w"), 6).alias("mx"),
            )
        )
    j = pts.join(F.broadcast(m), "event_type")
    d = F.sqrt(
        (F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))
        + (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))
    )
    return (
        j.groupBy("event_type", "my", "mx")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.avg(d), 6).alias("avg_dist"),
        )
        .select(
            "event_type",
            "n_points",
            F.col("my").alias("m_lat"),
            F.col("mx").alias("m_lng"),
            "avg_dist",
        )
        .orderBy("event_type")
    )


def _meeting_point_sql() -> str:
    lat, lng = _latlng_sql("event_id")
    steps = []
    prev = "m0"
    for t in range(1, _MEET_ROUNDS + 1):
        wexpr = (
            f"(1.0 / SQRT((p.y - m.my) * (p.y - m.my) "
            f"+ (p.x - m.mx) * (p.x - m.mx) + {_MEET_EPS!r}))"
        )
        steps.append(
            f"""m{t} AS (
            SELECT p.event_type,
                   ROUND(SUM({wexpr} * p.y) / SUM({wexpr}), 6) AS my,
                   ROUND(SUM({wexpr} * p.x) / SUM({wexpr}), 6) AS mx
            FROM p JOIN {prev} m ON p.event_type = m.event_type
            GROUP BY 1)"""
        )
        prev = f"m{t}"
    chain = ",\n        ".join(steps)
    return f"""
        WITH p AS (SELECT event_type, {lat} AS y, {lng} AS x FROM events),
        m0 AS (SELECT event_type, ROUND(AVG(y), 6) AS my,
                      ROUND(AVG(x), 6) AS mx
               FROM p GROUP BY 1),
        {chain}
        SELECT p.event_type, COUNT(*) AS n_points, m.my AS m_lat,
               m.mx AS m_lng,
               ROUND(AVG(SQRT((p.y - m.my) * (p.y - m.my)
                              + (p.x - m.mx) * (p.x - m.mx))), 6) AS avg_dist
        FROM p JOIN {prev} m ON p.event_type = m.event_type
        GROUP BY 1, m.my, m.mx
        ORDER BY 1
    """


# ---------------------------------------------------------------------------
# OD segment rasterization — exact integer Bresenham/DDA (session 12)
# ---------------------------------------------------------------------------

_BRES_RES = 6


def q_od_segment_raster(spark, sf_dir):
    """Exact vector→raster burn of OD segments onto the res-6 grid: every
    consecutive event pair per user is a segment between two cell coords,
    rasterized by integer DDA — steps = max(|dx|,|dy|) samples, the minor
    coordinate rounded by the EXACT integer formula
    x0 + floor((2·i·dx + steps) / (2·steps)) — so the crossed-cell set is
    pure int64 arithmetic, bit-identical in any engine (the media_run_
    lengths / contour_cases raster family, but for line geometry; this is
    the exact sibling of `traj_cells`' 9-point sampled approximation).
    Top-30 hottest raster cells with segment and user counts.

    Scale shape: window lag + a ≤64× bounded explode (res-6 grid is 64
    wide, so steps ≤ 63 by construction) + ONE partial+final agg; a 100 TB
    event table never pairs rows beyond the per-user lag. FLOOR-division
    safety: numerators are exact small integers in double, and non-integer
    quotients sit ≥ 1/(2·steps) ≥ 1/126 from an integer — no boundary
    risk."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import RES_MULTIPLIER

    n = 2**_BRES_RES
    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    gx = (
        F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))),
        )
    ).cast("long")
    gy = (
        F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n))),
        )
    ).cast("long")
    pts = ev.select("user_id", "ts", "event_id", gx.alias("gx"), gy.alias("gy"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        pts.select(
            "user_id",
            F.lag("gx").over(w).alias("x0"),
            F.lag("gy").over(w).alias("y0"),
            F.col("gx").alias("x1"),
            F.col("gy").alias("y1"),
        )
        .filter(F.col("x0").isNotNull())
        .select(
            "user_id",
            "x0",
            "y0",
            (F.col("x1") - F.col("x0")).alias("dx"),
            (F.col("y1") - F.col("y0")).alias("dy"),
            F.greatest(
                F.abs(F.col("x1") - F.col("x0")), F.abs(F.col("y1") - F.col("y0"))
            ).alias("steps"),
        )
    )
    e = seg.withColumn("i", F.explode(F.sequence(F.lit(0), F.col("steps"))))

    def _interp(p0: str, d: str):
        return F.when(F.col("steps") == 0, F.col(p0)).otherwise(
            F.col(p0)
            + F.floor(
                (
                    F.lit(2) * F.col("i") * F.col(d) + F.col("steps")
                ).cast("double")
                / (F.lit(2) * F.col("steps"))
            ).cast("long")
        )

    cell = (
        F.lit(_BRES_RES * RES_MULTIPLIER)
        + _interp("y0", "dy") * F.lit(n)
        + _interp("x0", "dx")
    ).cast("long")
    return (
        e.select("user_id", cell.alias("cell"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_segments"), F.asc("cell"))
        .limit(30)
    )


def _od_segment_raster_sql() -> str:
    from raptor_service_spark.geo.grid import RES_MULTIPLIER

    n = 2**_BRES_RES
    lat, lng = _latlng_sql("event_id")
    gx = (
        f"GREATEST(0, LEAST({n - 1}, "
        f"CAST(FLOOR(({lng} + 180.0) / 360.0 * {n}) AS BIGINT)))"
    )
    gy = (
        f"GREATEST(0, LEAST({n - 1}, "
        f"CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}) AS BIGINT)))"
    )
    interp_x = (
        "CASE WHEN steps = 0 THEN x0 ELSE x0 + CAST(FLOOR("
        "CAST(2 * i * dx + steps AS DOUBLE) / (2 * steps)) AS BIGINT) END"
    )
    interp_y = (
        "CASE WHEN steps = 0 THEN y0 ELSE y0 + CAST(FLOOR("
        "CAST(2 * i * dy + steps AS DOUBLE) / (2 * steps)) AS BIGINT) END"
    )
    return f"""
        WITH p AS (SELECT user_id, ts, event_id, {gx} AS gx, {gy} AS gy
                   FROM events),
        seg AS (SELECT user_id,
                       LAG(gx) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS x0,
                       LAG(gy) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS y0,
                       gx AS x1, gy AS y1
                FROM p),
        s2 AS (SELECT user_id, x0, y0, x1 - x0 AS dx, y1 - y0 AS dy,
                      GREATEST(ABS(x1 - x0), ABS(y1 - y0)) AS steps
               FROM seg WHERE x0 IS NOT NULL),
        e AS (SELECT user_id, x0, y0, dx, dy, steps,
                     UNNEST(generate_series(0, steps)) AS i
              FROM s2),
        c AS (SELECT user_id,
                     CAST({_BRES_RES * RES_MULTIPLIER} AS BIGINT)
                     + ({interp_y}) * {n} + ({interp_x}) AS cell
              FROM e)
        SELECT cell, COUNT(*) AS n_segments,
               COUNT(DISTINCT user_id) AS n_users
        FROM c GROUP BY 1
        ORDER BY n_segments DESC, cell ASC
        LIMIT 30
    """


# ---------------------------------------------------------------------------
# viewshed over the event-density raster (session 12)
# ---------------------------------------------------------------------------

_VIEW_RES = 6
_VIEW_R = 20  # Chebyshev radius: 41×41 target window, all inside the grid
_VIEW_OX, _VIEW_OY = 32, 32  # observer at the res-6 grid center
_VIEW_H = 1  # observer mast height above its cell's elevation


def q_viewshed_cells(spark, sf_dir):
    """Raster viewshed (line-of-sight) over the event-count elevation
    model: each res-6 cell's 'elevation' is its event count (the density
    raster as synthetic terrain — signal-obstruction-by-buildings), and a
    target cell at offset (dx,dy) from the center observer is visible iff
    no intermediate cell on the integer-DDA ray subtends a larger
    elevation angle. The angle test is the EXACT cross-multiplied integer
    comparison (ej−eo−H)·steps ≥ (et−eo−H)·j — zero float anywhere, so
    parity is bit-trivial. Output: per Chebyshev ring 1..20, cells tested
    and cells visible.

    Scale shape: ONE partial+final agg builds the raster; the ray walk is
    a fixed 41×41×≤19 exploded lattice (O(1) in table size) equi-joined
    against the raster (broadcast at any SF — a res-6 raster is ≤4096
    rows). The DDA minor-axis formula is shared with od_segment_raster."""
    ev = _read(spark, sf_dir, "events").select("event_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    n = 2**_VIEW_RES
    gx = (
        F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))),
        )
    ).cast("long")
    gy = (
        F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n))),
        )
    ).cast("long")
    raster = (
        ev.select(gx.alias("gx"), gy.alias("gy"))
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("elev"))
    )
    eo_df = raster.agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("gx") == _VIEW_OX) & (F.col("gy") == _VIEW_OY),
                    F.col("elev"),
                )
            ),
            F.lit(0),
        ).alias("eo")
    )
    rng = F.explode(F.sequence(F.lit(-_VIEW_R), F.lit(_VIEW_R)))
    targets = (
        spark.range(1)
        .select(rng.alias("dx"))
        .select("dx", rng.alias("dy"))
        .filter(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            "dx",
            "dy",
            F.greatest(F.abs("dx"), F.abs("dy")).alias("steps"),
            (F.lit(_VIEW_OX) + F.col("dx")).alias("tx"),
            (F.lit(_VIEW_OY) + F.col("dy")).alias("ty"),
        )
    )
    t2 = (
        targets.join(
            F.broadcast(raster),
            (F.col("tx") == F.col("gx")) & (F.col("ty") == F.col("gy")),
            "left",
        )
        .select("dx", "dy", "steps", F.coalesce("elev", F.lit(0)).alias("et"))
        .crossJoin(F.broadcast(eo_df))
    )
    far = t2.filter(F.col("steps") >= 2).withColumn(
        "j", F.explode(F.sequence(F.lit(1), F.col("steps") - 1))
    )

    def _ray(d: str):
        return F.floor(
            (F.lit(2) * F.col("j") * F.col(d) + F.col("steps")).cast("double")
            / (F.lit(2) * F.col("steps"))
        ).cast("long")

    jc = far.select(
        "dx",
        "dy",
        "steps",
        "et",
        "eo",
        "j",
        (F.lit(_VIEW_OX) + _ray("dx")).alias("xj"),
        (F.lit(_VIEW_OY) + _ray("dy")).alias("yj"),
    )
    jb = jc.join(
        F.broadcast(raster),
        (F.col("xj") == F.col("gx")) & (F.col("yj") == F.col("gy")),
        "left",
    ).select(
        "dx",
        "dy",
        (
            (F.coalesce("elev", F.lit(0)) - F.col("eo") - F.lit(_VIEW_H))
            * F.col("steps")
            >= (F.col("et") - F.col("eo") - F.lit(_VIEW_H)) * F.col("j")
        )
        .cast("long")
        .alias("b"),
    )
    nb = jb.groupBy("dx", "dy").agg(F.sum("b").alias("nb"))
    vis = t2.join(nb, ["dx", "dy"], "left").select(
        F.col("steps").alias("ring"),
        (F.coalesce("nb", F.lit(0)) == 0).cast("long").alias("visible"),
    )
    return (
        vis.groupBy("ring")
        .agg(F.count(F.lit(1)).alias("n_cells"), F.sum("visible").alias("n_visible"))
        .orderBy("ring")
    )


def _viewshed_cells_sql() -> str:
    n = 2**_VIEW_RES
    lat, lng = _latlng_sql("event_id")
    gx = (
        f"GREATEST(0, LEAST({n - 1}, "
        f"CAST(FLOOR(({lng} + 180.0) / 360.0 * {n}) AS BIGINT)))"
    )
    gy = (
        f"GREATEST(0, LEAST({n - 1}, "
        f"CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}) AS BIGINT)))"
    )
    return f"""
        WITH r AS (SELECT gx, gy, COUNT(*) AS elev FROM
                       (SELECT {gx} AS gx, {gy} AS gy FROM events)
                   GROUP BY 1, 2),
        eo AS (SELECT CAST(COALESCE(SUM(CASE WHEN gx = {_VIEW_OX}
                                              AND gy = {_VIEW_OY}
                                         THEN elev END), 0) AS BIGINT) AS eo
               FROM r),
        t AS (SELECT dx, dy, GREATEST(ABS(dx), ABS(dy)) AS steps,
                     {_VIEW_OX} + dx AS tx, {_VIEW_OY} + dy AS ty
              FROM (SELECT UNNEST(generate_series(-{_VIEW_R}, {_VIEW_R})) AS dx) a
              CROSS JOIN
                   (SELECT UNNEST(generate_series(-{_VIEW_R}, {_VIEW_R})) AS dy) b
              WHERE NOT (dx = 0 AND dy = 0)),
        t2 AS (SELECT t.dx, t.dy, t.steps, COALESCE(r.elev, 0) AS et, eo.eo
               FROM t LEFT JOIN r ON t.tx = r.gx AND t.ty = r.gy
               CROSS JOIN eo),
        far AS (SELECT dx, dy, steps, et, eo,
                       UNNEST(generate_series(1, steps - 1)) AS j
                FROM t2 WHERE steps >= 2),
        jc AS (SELECT dx, dy, steps, et, eo, j,
                      {_VIEW_OX} + CAST(FLOOR(CAST(2 * j * dx + steps AS DOUBLE)
                                              / (2 * steps)) AS BIGINT) AS xj,
                      {_VIEW_OY} + CAST(FLOOR(CAST(2 * j * dy + steps AS DOUBLE)
                                              / (2 * steps)) AS BIGINT) AS yj
               FROM far),
        jb AS (SELECT jc.dx, jc.dy,
                      CASE WHEN (COALESCE(r.elev, 0) - jc.eo - {_VIEW_H})
                                * jc.steps
                                >= (jc.et - jc.eo - {_VIEW_H}) * jc.j
                           THEN 1 ELSE 0 END AS b
               FROM jc LEFT JOIN r ON jc.xj = r.gx AND jc.yj = r.gy),
        nb AS (SELECT dx, dy, CAST(SUM(b) AS BIGINT) AS nb
               FROM jb GROUP BY 1, 2)
        SELECT t2.steps AS ring, COUNT(*) AS n_cells,
               CAST(SUM(CASE WHEN COALESCE(nb.nb, 0) = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_visible
        FROM t2 LEFT JOIN nb ON t2.dx = nb.dx AND t2.dy = nb.dy
        GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# two-step floating catchment area accessibility (session 12)
# ---------------------------------------------------------------------------

_SFCA_RES = 5
_SFCA_RING = 2  # Chebyshev catchment radius: 5×5 cells


def q_sfca_accessibility(spark, sf_dir):
    """Two-step floating catchment area (2SFCA) — the spatial-access
    workhorse of health-geography: facilities (documents doc_id < 2000,
    capacity 1 + doc_id % 5) first get a supply-to-demand ratio
    R_j = capacity / Σ(event demand within their Chebyshev-2 res-5
    catchment); each demand cell then sums the R_j of every facility
    whose catchment covers it. Top-20 best-served demand cells.

    Scale shape: demand and supply are each ONE partial+final agg; the
    catchment is the standard 25-offset k-ring EXPLODE + equi-join (the
    cell_kring_smooth plan — never a distance cross join); sites with
    zero catchment demand drop (ratio undefined). Float protocol: R_j is
    a 9-dp-rounded ratio of exact integers; accessibility sums tens of
    those pre-rounded terms and rounds 6 dp."""
    from raptor_service_spark.operators.neighborhood import kring_neighbor_col

    offs = [
        (dx, dy)
        for dy in range(-_SFCA_RING, _SFCA_RING + 1)
        for dx in range(-_SFCA_RING, _SFCA_RING + 1)
    ]
    d = (
        _read(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 2000)
    )
    dlat, dlng = _latlng_cols(F.col("doc_id"))
    sup = (
        d.select(
            cell_encode_col(dlat, dlng, _SFCA_RES).alias("scell"),
            (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(5))).alias("cap"),
        )
        .groupBy("scell")
        .agg(F.sum("cap").alias("cap"))
    )
    ev = _read(spark, sf_dir, "events").select("event_id")
    elat, elng = _latlng_cols(F.col("event_id"))
    dem = (
        ev.select(cell_encode_col(elat, elng, _SFCA_RES).alias("dcell"))
        .groupBy("dcell")
        .agg(F.count(F.lit(1)).alias("n_dem"))
    )
    ring = F.array(
        *[kring_neighbor_col("scell", _SFCA_RES, dx, dy) for dx, dy in offs]
    )
    sring = sup.select("scell", "cap", F.explode(ring).alias("nbr")).filter(
        F.col("nbr").isNotNull()
    )
    rj = (
        sring.join(dem, sring.nbr == dem.dcell)
        .groupBy("scell", "cap")
        .agg(F.sum("n_dem").alias("dsum"))
        .select(
            "scell",
            F.round(
                F.col("cap").cast("double") / F.col("dsum").cast("double"), 9
            ).alias("rj"),
        )
    )
    rring = rj.select("scell", "rj", F.explode(ring).alias("nbr")).filter(
        F.col("nbr").isNotNull()
    )
    return (
        rring.join(dem, rring.nbr == dem.dcell)
        .groupBy("dcell", "n_dem")
        .agg(F.round(F.sum("rj"), 6).alias("access"))
        .select(F.col("dcell").alias("cell"), F.col("n_dem").alias("demand"), "access")
        .orderBy(F.desc("access"), F.asc("cell"))
        .limit(20)
    )


def _sfca_accessibility_sql() -> str:
    from raptor_service_spark.operators.neighborhood import kring_neighbor_sql

    dlat, dlng = _latlng_sql("doc_id")
    elat, elng = _latlng_sql("event_id")
    scell = cell_encode_sql(dlat, dlng, _SFCA_RES)
    dcell = cell_encode_sql(elat, elng, _SFCA_RES)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dy in range(-_SFCA_RING, _SFCA_RING + 1)
        for dx in range(-_SFCA_RING, _SFCA_RING + 1)
    )
    nbr = kring_neighbor_sql("s.scell", _SFCA_RES, "o.dx", "o.dy")
    nbr2 = kring_neighbor_sql("r.scell", _SFCA_RES, "o.dx", "o.dy")
    return f"""
        WITH sup AS (SELECT scell, CAST(SUM(cap) AS BIGINT) AS cap FROM
                         (SELECT {scell} AS scell, 1 + (doc_id % 5) AS cap
                          FROM documents WHERE doc_id < 2000)
                     GROUP BY 1),
        dem AS (SELECT {dcell} AS dcell, COUNT(*) AS n_dem
                FROM events GROUP BY 1),
        sring AS (SELECT s.scell, s.cap, {nbr} AS nbr
                  FROM sup s CROSS JOIN (VALUES {offs}) o(dx, dy)
                  WHERE {nbr} IS NOT NULL),
        rj AS (SELECT sr.scell,
                      ROUND(CAST(MAX(sr.cap) AS DOUBLE)
                            / CAST(SUM(d.n_dem) AS DOUBLE), 9) AS rj
               FROM sring sr JOIN dem d ON sr.nbr = d.dcell
               GROUP BY 1),
        rring AS (SELECT r.scell, r.rj, {nbr2} AS nbr
                  FROM rj r CROSS JOIN (VALUES {offs}) o(dx, dy)
                  WHERE {nbr2} IS NOT NULL)
        SELECT d.dcell AS cell, MAX(d.n_dem) AS demand,
               ROUND(SUM(rr.rj), 6) AS access
        FROM rring rr JOIN dem d ON rr.nbr = d.dcell
        GROUP BY 1
        ORDER BY access DESC, cell ASC
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# space-time prism rasterization (session 12)
# ---------------------------------------------------------------------------

_PRISM_RES = 4
_PRISM_VMAX = 25.0  # planar speed budget, degrees/hour
_PRISM_BMAX = 400.0  # cap: beyond this the ellipse covers the whole grid


def q_spacetime_prism(spark, sf_dir):
    """Hägerstrand space-time prism rasterization: for each consecutive
    event pair per user, the reachable set under speed budget vmax is the
    ellipse {c : d(p0,c) + d(c,p1) ≤ vmax·Δt}; its res-4 cell-center
    raster is the potential-path area. Infeasible segments (straight-line
    distance already exceeds the budget — the teleport_flags population)
    drop out. Output: top-30 cells by prism coverage count.

    Scale shape: window lag → segments, then a broadcast nested-loop join
    against the FIXED 256-row res-4 cell-center inventory with the bbox
    pre-filter |c−mid| ≤ B/2 (a provable superset of the ellipse: median
    ≤ half focal-distance sum) before the two sqrt's — at 100 TB the bbox
    becomes a cell-index range scan. Float parity: Δt→budget→distances
    are one shared expression; the ≤ comparisons see bit-identical
    doubles in both engines."""
    from pyspark.sql import Window

    from raptor_service_spark.geo.grid import RES_MULTIPLIER

    n = 2**_PRISM_RES
    ev = _read(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lat, lng = _latlng_cols(F.col("event_id"))
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        lat.alias("y1"),
        lng.alias("x1"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = pts.select(
        "user_id",
        F.lag("y1").over(w).alias("y0"),
        F.lag("x1").over(w).alias("x0"),
        (F.col("us") - F.lag("us").over(w)).alias("dt_us"),
        "y1",
        "x1",
    ).filter(F.col("y0").isNotNull())
    b = F.least(
        F.lit(_PRISM_VMAX) * (F.col("dt_us").cast("double") / F.lit(3.6e9)),
        F.lit(_PRISM_BMAX),
    )
    d01 = F.sqrt(
        (F.col("y1") - F.col("y0")) * (F.col("y1") - F.col("y0"))
        + (F.col("x1") - F.col("x0")) * (F.col("x1") - F.col("x0"))
    )
    feas = seg.withColumn("b", b).filter(d01 <= F.col("b"))
    rngc = F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    cells = (
        spark.range(1)
        .select(rngc.alias("gx"))
        .select("gx", rngc.alias("gy"))
        .select(
            (F.lit(-90.0) + (F.col("gy") + F.lit(0.5)) * F.lit(180.0) / F.lit(n)).alias(
                "clat"
            ),
            (
                F.lit(-180.0) + (F.col("gx") + F.lit(0.5)) * F.lit(360.0) / F.lit(n)
            ).alias("clng"),
            (
                F.lit(_PRISM_RES * RES_MULTIPLIER)
                + F.col("gy") * F.lit(n)
                + F.col("gx")
            ).cast("long").alias("cell"),
        )
    )
    cand = feas.crossJoin(F.broadcast(cells)).filter(
        (
            F.abs(F.col("clat") - (F.col("y0") + F.col("y1")) / F.lit(2.0))
            <= F.col("b") / F.lit(2.0)
        )
        & (
            F.abs(F.col("clng") - (F.col("x0") + F.col("x1")) / F.lit(2.0))
            <= F.col("b") / F.lit(2.0)
        )
    )
    d0 = F.sqrt(
        (F.col("clat") - F.col("y0")) * (F.col("clat") - F.col("y0"))
        + (F.col("clng") - F.col("x0")) * (F.col("clng") - F.col("x0"))
    )
    d1 = F.sqrt(
        (F.col("clat") - F.col("y1")) * (F.col("clat") - F.col("y1"))
        + (F.col("clng") - F.col("x1")) * (F.col("clng") - F.col("x1"))
    )
    return (
        cand.filter(d0 + d1 <= F.col("b"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_prisms"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_prisms"), F.asc("cell"))
        .limit(30)
    )


def _spacetime_prism_sql() -> str:
    from raptor_service_spark.geo.grid import RES_MULTIPLIER

    n = 2**_PRISM_RES
    lat, lng = _latlng_sql("event_id")
    return f"""
        WITH p AS (SELECT user_id, ts, event_id, {lat} AS y1, {lng} AS x1,
                          epoch_us(ts) AS us
                   FROM events),
        seg AS (SELECT user_id,
                       LAG(y1) OVER w AS y0, LAG(x1) OVER w AS x0,
                       us - LAG(us) OVER w AS dt_us, y1, x1
                FROM p
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        feas AS (SELECT *,
                        LEAST({_PRISM_VMAX!r} * (CAST(dt_us AS DOUBLE) / 3.6e9),
                              {_PRISM_BMAX!r}) AS b
                 FROM seg
                 WHERE y0 IS NOT NULL
                   AND SQRT((y1 - y0) * (y1 - y0) + (x1 - x0) * (x1 - x0))
                       <= LEAST({_PRISM_VMAX!r} * (CAST(dt_us AS DOUBLE) / 3.6e9),
                                {_PRISM_BMAX!r})),
        cells AS (SELECT -90.0 + (gy + 0.5) * 180.0 / {n} AS clat,
                         -180.0 + (gx + 0.5) * 360.0 / {n} AS clng,
                         CAST({_PRISM_RES * RES_MULTIPLIER}
                              + gy * {n} + gx AS BIGINT) AS cell
                  FROM (SELECT UNNEST(generate_series(0, {n - 1})) AS gx) a
                  CROSS JOIN
                       (SELECT UNNEST(generate_series(0, {n - 1})) AS gy) b),
        cand AS (SELECT f.user_id, f.b, c.cell,
                        SQRT((c.clat - f.y0) * (c.clat - f.y0)
                             + (c.clng - f.x0) * (c.clng - f.x0))
                        + SQRT((c.clat - f.y1) * (c.clat - f.y1)
                               + (c.clng - f.x1) * (c.clng - f.x1)) AS dsum
                 FROM feas f CROSS JOIN cells c
                 WHERE ABS(c.clat - (f.y0 + f.y1) / 2.0) <= f.b / 2.0
                   AND ABS(c.clng - (f.x0 + f.x1) / 2.0) <= f.b / 2.0)
        SELECT cell, COUNT(*) AS n_prisms,
               COUNT(DISTINCT user_id) AS n_users
        FROM cand WHERE dsum <= b
        GROUP BY 1
        ORDER BY n_prisms DESC, cell ASC
        LIMIT 30
    """


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # flagship + geo
        "grid_collapsed_retrieval": grid_collapsed_retrieval,
        "grid_traversal_retrieval": grid_traversal_retrieval,
        "doc_cells": q_doc_cells,
        "tile_histogram": q_tile_histogram,
        "pip_docs": q_pip_docs,
        "radius_join_docs": q_radius_join_docs,
        "radius_km_docs": q_radius_km_docs,
        "bbox_overlap_docs": q_bbox_overlap_docs,
        "tri_overlap_docs": q_tri_overlap_docs,
        "events_tile_hourly": q_events_tile_hourly,
        "doc_scrub": q_doc_scrub,
        "compact_cover": q_compact_cover,
        "cover_uncompact_roundtrip": q_cover_uncompact_roundtrip,
        "doc_pairs_within": q_doc_pairs_within,
        "pip_zonal_stats": q_pip_zonal_stats,
        "bm25_topk": q_bm25_topk,
        "hybrid_retrieval": q_hybrid_retrieval,
        "user_travel": q_user_travel,
        "geo_clusters": q_geo_clusters,
        "geo_dbscan": q_geo_dbscan,
        "geofence_transitions": q_geofence_transitions,
        "user_od_flows": q_user_od_flows,
        "user_stay_points": q_user_stay_points,
        "traj_cells": q_traj_cells,
        "hot_cells": q_hot_cells,
        "media_caption_attach": q_media_caption_attach,
        "tile_topk_docs": q_tile_topk_docs,
        "cell_coverage_gap": q_cell_coverage_gap,
        "trending_cells": q_trending_cells,
        "idw_interpolation": q_idw_interpolation,
        "cell_boundaries": q_cell_boundaries,
        "cell_heat_decay": q_cell_heat_decay,
        "cell_top_terms": q_cell_top_terms,
        "nearest_doc_assignment": q_nearest_doc_assignment,
        "user_home_cells": q_user_home_cells,
        "events_value_histogram": q_events_value_histogram,
        "cell_value_median": q_cell_value_median,
        "media_density_per_cell": q_media_density_per_cell,
        "user_gyration": q_user_gyration,
        "user_cell_entropy": q_user_cell_entropy,
        "geo_knn_docs": q_geo_knn_docs,
        "cell_kring_smooth": q_cell_kring_smooth,
        "tile_pyramid": q_tile_pyramid,
        "morans_i": q_morans_i,
        "getis_hotspots": q_getis_hotspots,
        "similar_users": q_similar_users,
        "doc_boilerplate": q_doc_boilerplate,
        "zorder_layout": q_zorder_layout,
        "hilbert_layout": q_hilbert_layout,
        "hex_density": q_hex_density,
        "geohash_coverage": q_geohash_coverage,
        "kmeans_geo": q_kmeans_geo,
        "snap_points": q_snap_points,
        "cell_sssp": q_cell_sssp,
        "density_gradient": q_density_gradient,
        "clark_evans": q_clark_evans,
        "gravity_fit": q_gravity_fit,
        "dtw_pairs": q_dtw_pairs,
        "hausdorff_pairs": q_hausdorff_pairs,
        "event_funnel": q_event_funnel,
        "theil_sen_cells": q_theil_sen,
        "zrange_scan": q_zrange_scan,
        "kanon_cells": q_kanon_cells,
        "funnel_stages": q_funnel_stages,
        "seq_packing": q_seq_packing,
        "hilbert_range_scan": q_hilbert_range_scan,
        "cohort_retention": q_cohort_retention,
        "adoption_curve": q_adoption_curve,
        "pip_donut": q_pip_donut,
        "pmi_bigrams": q_pmi_bigrams,
        "weighted_sample": q_weighted_sample,
        "cusum_cells": q_cusum_cells,
        "user_streaks": q_user_streaks,
        "benford_values": q_benford_values,
        "value_correlations": q_value_correlations,
        "bearing_rose": q_bearing_rose,
        "cell_isochrone": q_cell_isochrone,
        "cell_pagerank": q_cell_pagerank,
        "user_colocation": q_user_colocation,
        "traj_crossings": q_traj_crossings,
        "doc_stratified_sample": q_doc_stratified_sample,
        "user_activity_mask": q_user_activity_mask,
        "user_hourly_fill": q_user_hourly_fill,
        "cell_trend_slope": q_cell_trend_slope,
        "doc_dup_substrings": q_doc_dup_substrings,
        "doc_skyline": q_doc_skyline,
        "doc_quality_percentile": q_doc_quality_percentile,
        "cell_covisit": q_cell_covisit,
        # relational battery
        "lineitem_agg": q_lineitem_agg,
        "orders_status_stats": q_orders_status_stats,
        "sum_qty_per_segment": q_sum_qty_per_segment,
        "distinct_event_types": q_distinct_event_types,
        "semi_join_orders": q_semi_join_orders,
        "anti_join_customers": q_anti_join_customers,
        "topk_lineitems": q_topk_lineitems,
        "latest_order_per_customer": q_latest_order_per_customer,
        "orders_page": q_orders_page,
        "events_ordered_scan": q_events_ordered_scan,
        "order_count_per_customer": q_order_count_per_customer,
        "supplier_siblings": q_supplier_siblings,
        "top2_orders_per_customer": q_top2_orders_per_customer,
        "events_hourly_stats": q_events_hourly_stats,
        "asof_prior_click": q_asof_prior_click,
        "click_purchase_join": q_click_purchase_join,
        "events_rollup": q_events_rollup,
        "events_pivot": q_events_pivot,
        "events_sliding": q_events_sliding,
        "user_running_stats": q_user_running_stats,
        "train_decontam": q_train_decontam,
        "knn_quantized": q_knn_quantized,
        "pq_knn": q_pq_knn,
        "json_props": q_json_props,
        "path_to_root": q_path_to_root,
        "user_sessions": q_user_sessions,
        "first_seen_dedup": q_first_seen_dedup,
        "revenue_by_nation": q_revenue_by_nation,
        "filtered_revenue": q_filtered_revenue,
        "shipping_priority": q_shipping_priority,
        "price_bucket_range_join": q_price_bucket_range_join,
        "scalar_funcs": q_scalar_funcs,
        "doc_winnow_fp": q_doc_winnow_fp,
        "doc_token_stats": q_doc_token_stats,
        "events_quantiles": q_events_quantiles,
        "query_normalize": q_query_normalize,
        "event_type_setops": q_event_type_setops,
        # text analysis + dedup + similarity
        "doc_tokens_by_lang": q_doc_tokens_by_lang,
        "doc_hash_split": q_doc_hash_split,
        "top_terms_per_lang": q_top_terms_per_lang,
        "doc_quality_top20": q_doc_quality_top20,
        "doc_langid_counts": q_doc_langid_counts,
        "doc_fingerprint_dedup": q_doc_fingerprint_dedup,
        "minhash_pairs": q_minhash_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "neardup_components": q_neardup_components,
        "doc_repetition": q_doc_repetition,
        "cosine_neardup": q_cosine_neardup,
        "knn_top10": q_knn_top10,
        "knn_filtered": q_knn_filtered,
        "knn_multi": q_knn_multi,
        "colbert_maxsim": q_colbert_maxsim,
        "spans_explode": q_spans_explode,
        "span_dedup": q_span_dedup,
        "curation_pipeline": q_curation_pipeline,
        "local_moran": q_local_moran,
        "mmr_retrieval": q_mmr_retrieval,
        "od_triangles": q_od_triangles,
        "snm_pairs": q_snm_pairs,
        "fuzzy_title_pairs": q_fuzzy_title_pairs,
        "doc_tfidf_terms": q_doc_tfidf_terms,
        "join_counts": q_join_counts,
        "cell_kcore": q_cell_kcore,
        "speed_anomalies": q_speed_anomalies,
        "spacetime_scan": q_spacetime_scan,
        "quadtree_bins": q_quadtree_bins,
        "gearys_c": q_gearys_c,
        "zipf_slope": q_zipf_slope,
        "source_delta": q_source_delta,
        "colocation_quotient": q_colocation_quotient,
        "heaps_law": q_heaps_law,
        "cluster_hulls": q_cluster_hulls,
        "g_function": q_g_function,
        "doc_bigram_ppl": q_doc_bigram_ppl,
        "bpe_merges": q_bpe_merges,
        "teleport_flags": q_teleport_flags,
        "huff_demand": q_huff_demand,
        "quadrat_csr": q_quadrat_csr,
        "cross_k": q_cross_k,
        "deviational_ellipse": q_deviational_ellipse,
        "knox_test": q_knox_test,
        "span_transitions": q_span_transitions,
        "doc_char_entropy": q_doc_char_entropy,
        "cell_markov": q_cell_markov,
        "user_burstiness": q_user_burstiness,
        "cell_gini": q_cell_gini,
        "hourly_acf": q_hourly_acf,
        "mixture_resample": q_mixture_resample,
        "dsir_weights": q_dsir_weights,
        "viterbi_match": q_viterbi_match,
        "rendezvous_shards": q_rendezvous_shards,
        "pip_polygon_table": q_pip_polygon_table,
        "pca_top_component": q_pca_top_component,
        "cotravel_pairs": q_cotravel_pairs,
        "contact_reach": q_contact_reach,
        "semivariogram": q_semivariogram,
        "variogram_fit": q_variogram_fit,
        "od_ipf_balance": q_od_ipf_balance,
        "kmv_distinct": q_kmv_distinct,
        "bloom_semi_join": q_bloom_semi_join,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "histogram_quantiles": q_histogram_quantiles,
        "matryoshka_recall": q_matryoshka_recall,
        "bpe_encode": q_bpe_encode,
        "kmv_set_ops": q_kmv_set_ops,
        "binary_quant_recall": q_binary_quant_recall,
        "psi_drift": q_psi_drift,
        "ks_two_sample": q_ks_two_sample,
        "fellegi_sunter": q_fellegi_sunter,
        "cell_seasonal": q_cell_seasonal,
        "radiation_model": q_radiation_model,
        "ab_proportions": q_ab_proportions,
        "fdr_hotspots": q_fdr_hotspots,
        "ewma_anomaly": q_ewma_anomaly,
        "prf_expansion": q_prf_expansion,
        "commute_flows": q_commute_flows,
        "chaikin_smooth": q_chaikin_smooth,
        "media_ahash_dedup": q_media_ahash_dedup,
        "rbo_rankings": q_rbo_rankings,
        "kaplan_meier": q_kaplan_meier,
        "did_estimator": q_did_estimator,
        "dp_cell_counts": q_dp_cell_counts,
        "join_size_estimate": q_join_size_estimate,
        "crosstrack_deviation": q_crosstrack_deviation,
        "shapley_attribution": q_shapley_attribution,
        "ql_dirichlet": q_ql_dirichlet,
        "ndcg_bm25": q_ndcg_bm25,
        "mann_whitney": q_mann_whitney,
        "bm25_eval": q_bm25_eval,
        "chi2_independence": q_chi2_independence,
        "cuped_adjustment": q_cuped_adjustment,
        "containment_pairs": q_containment_pairs,
        "clustering_coeff": q_clustering_coeff,
        "hits_scores": q_hits_scores,
        "rocchio_feedback": q_rocchio_feedback,
        "cdc_chunks": q_cdc_chunks,
        "degree_assortativity": q_degree_assortativity,
        "cell_modularity": q_cell_modularity,
        "link_prediction": q_link_prediction,
        "jsd_sources": q_jsd_sources,
        "polygon_metrics": q_polygon_metrics,
        "kn_bigram_lm": q_kn_bigram_lm,
        "hll_distinct": q_hll_distinct,
        "textrank_keywords": q_textrank_keywords,
        "ppr_scores": q_ppr_scores,
        "lpa_communities": q_lpa_communities,
        "nb_langid": q_nb_langid,
        "silhouette_kmeans": q_silhouette_kmeans,
        "symspell_lookup": q_symspell_lookup,
        "logreg_train": q_logreg_train,
        "moran_correlogram": q_moran_correlogram,
        "monge_elkan_pairs": q_monge_elkan_pairs,
        "media_scene_cuts": q_media_scene_cuts,
        "permutation_test": q_permutation_test,
        "maxscore_pruning": q_maxscore_pruning,
        "minhash_jaccard_audit": q_minhash_jaccard_audit,
        "markov_attribution": q_markov_attribution,
        "graph_eccentricity": q_graph_eccentricity,
        "ldiv_tcloseness": q_ldiv_tcloseness,
        "semivariogram_dir": q_semivariogram_dir,
        "cell_xcorr": q_cell_xcorr,
        "align_titles": q_align_titles,
        "jl_projection_audit": q_jl_projection_audit,
        "spherical_centroid": q_spherical_centroid,
        "mobility_entropy_rate": q_mobility_entropy_rate,
        "term_burstiness": q_term_burstiness,
        "participation_index": q_participation_index,
        "greedy_set_cover": q_greedy_set_cover,
        "segregation_indices": q_segregation_indices,
        "percolation_curve": q_percolation_curve,
        "stl_lite": q_stl_lite,
        "changepoint_detect": q_changepoint_detect,
        "ransac_fit": q_ransac_fit,
        "next_cell_eval": q_next_cell_eval,
        "span_position_profile": q_span_position_profile,
        "multiprobe_lsh_recall": q_multiprobe_lsh_recall,
        "rayleigh_bearing": q_rayleigh_bearing,
        "bootstrap_ci": q_bootstrap_ci,
        "pr_curve_11pt": q_pr_curve_11pt,
        "kalman_tracks": q_kalman_tracks,
        "holt_trend_cells": q_holt_trend_cells,
        "semdedup_clusters": q_semdedup_clusters,
        "plsa_topics": q_plsa_topics,
        "kde_hotspots": q_kde_hotspots,
        "hard_negatives": q_hard_negatives,
        "betweenness_cells": q_betweenness_cells,
        "temporal_motifs": q_temporal_motifs,
        "clarity_score": q_clarity_score,
        "rouge_pairs": q_rouge_pairs,
        "cell_ktruss": q_cell_ktruss,
        "good_turing": q_good_turing,
        "chao1_richness": q_chao1_richness,
        "wilson_ctr": q_wilson_ctr,
        "sprt_monitor": q_sprt_monitor,
        "ppr_sweep_cut": q_ppr_sweep_cut,
        "rich_club": q_rich_club,
        "randomized_response": q_randomized_response,
        "bivariate_moran": q_bivariate_moran,
        "kriging_ordinary": q_kriging_ordinary,
        "f_function": q_f_function,
        "rake_keywords": q_rake_keywords,
        "conformal_intervals": q_conformal_intervals,
        "isotonic_hourly": q_isotonic_hourly,
        "media_dhash_pairs": q_media_dhash_pairs,
        "texttiling_boundaries": q_texttiling_boundaries,
        "traj_sinuosity": q_traj_sinuosity,
        "lee_l": q_lee_l,
        "calibration_bins": q_calibration_bins,
        "mst_cells": q_mst_cells,
        "mad_outliers": q_mad_outliers,
        "theil_decomposition": q_theil_decomposition,
        "jump_length_fit": q_jump_length_fit,
        "cell_segmentation": q_cell_segmentation,
        "dbsf_fusion": q_dbsf_fusion,
        "best_passage": q_best_passage,
        "idw_loocv": q_idw_loocv,
        "contour_cases": q_contour_cases,
        "region_bboxes": q_region_bboxes,
        "blocking_quality": q_blocking_quality,
        "decision_stump": q_decision_stump,
        "ot_transport_plan": q_ot_transport_plan,
        "media_run_lengths": q_media_run_lengths,
        "lru_hit_rate": q_lru_hit_rate,
        "phrase_search": q_phrase_search,
        "min_cover_window": q_min_cover_window,
        "lcss_pairs": q_lcss_pairs,
        "readability_scores": q_readability_scores,
        "box_counting_dim": q_box_counting_dim,
        "spearman_corr": q_spearman_corr,
        "rnn_influence": q_rnn_influence,
        "boosted_stumps": q_boosted_stumps,
        "gmm_em_values": q_gmm_em_values,
        "meeting_point": q_meeting_point,
        "od_segment_raster": q_od_segment_raster,
        "viewshed_cells": q_viewshed_cells,
        "sfca_accessibility": q_sfca_accessibility,
        "spacetime_prism": q_spacetime_prism,
        "interarrival_fit": q_interarrival_fit,
        "doc_perplexity": q_doc_perplexity,
        "trajectory_simplify": q_trajectory_simplify,
        "quadkey_tiles": q_quadkey_tiles,
        "ripley_k": q_ripley_k,
        "emerging_hotspots": q_emerging_hotspots,
        # engine-native (rows-only driver check; pytest covers semantics)
        "simhash_pairs": q_simhash_pairs,
        "cosine_neardup_lsh": q_cosine_neardup_lsh,
        "grid_knn_ann": q_grid_knn_ann,
        "ivf_knn_ann": q_ivf_knn_ann,
        "ivf_knn_exact": q_ivf_knn_exact,
        "reranked_retrieval": q_reranked_retrieval,
        "tree_build_docs": q_tree_build_docs,
        "tree_build_synthetic": q_tree_build_synthetic,
        "tree_build_overlap": q_tree_build_overlap,
        "collapsed_retrieval_synthetic": q_collapsed_retrieval_synthetic,
        "traversal_retrieval_synthetic": q_traversal_retrieval_synthetic,
        "span_roundtrip_check": q_span_roundtrip_check,
        "media_features": q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    from raptor_service_spark.functions.text import hash_split_sql, token_count_sql

    lat, lng = _latlng_sql("doc_id")
    cell9 = cell_encode_sql(lat, lng, 9)
    tri_sql = _convex_pip_sql("tri", TRI)
    rect_sql = _convex_pip_sql("rect", RECT)
    return {
        "grid_collapsed_retrieval": _grid_collapsed_retrieval_sql(),
        "grid_traversal_retrieval": _grid_traversal_retrieval_sql(),
        "tree_build_docs": _tree_build_docs_sql(),
        "reranked_retrieval": _reranked_retrieval_sql(),
        "doc_cells": (
            f"SELECT doc_id, {cell9} AS cell9, "
            f"{cell_parent_sql(cell9, 9, 4)} AS cell4 FROM documents"
        ),
        "tile_histogram": (
            f"SELECT {cell_encode_sql(lat, lng, 4)} AS cell, COUNT(*) AS n_points "
            f"FROM documents GROUP BY 1"
        ),
        "pip_docs": f"{tri_sql} UNION ALL {rect_sql}",
        "radius_join_docs": _radius_join_docs_sql(),
        "radius_km_docs": _radius_km_docs_sql(),
        "bbox_overlap_docs": _bbox_overlap_docs_sql(),
        "tri_overlap_docs": _tri_overlap_docs_sql(),
        "events_tile_hourly": _events_tile_hourly_sql(),
        "doc_scrub": _doc_scrub_sql(),
        "compact_cover": _compact_cover_sql(),
        "cover_uncompact_roundtrip": _cover_uncompact_roundtrip_sql(),
        "doc_pairs_within": _doc_pairs_within_sql(),
        "pip_zonal_stats": _pip_zonal_stats_sql(),
        "bm25_topk": _bm25_sql_entry(10),
        "hybrid_retrieval": _hybrid_retrieval_sql(),
        "user_travel": _user_travel_sql(),
        "geo_clusters": _geo_clusters_sql(),
        "geo_dbscan": _geo_dbscan_sql(),
        "geofence_transitions": _geofence_transitions_sql(),
        "user_od_flows": _user_od_flows_sql(),
        "user_stay_points": _user_stay_points_sql(),
        "traj_cells": _traj_cells_sql(),
        "hot_cells": _hot_cells_sql(),
        "media_caption_attach": _media_caption_attach_sql(),
        "tile_topk_docs": _tile_topk_docs_sql(),
        "cell_coverage_gap": _cell_coverage_gap_sql(),
        "trending_cells": _trending_cells_sql(),
        "idw_interpolation": _idw_interpolation_sql(),
        "cell_boundaries": _cell_boundaries_sql(),
        "cell_heat_decay": _cell_heat_decay_sql(),
        "cell_top_terms": _cell_top_terms_sql(),
        "nearest_doc_assignment": _nearest_doc_assignment_sql(),
        "user_home_cells": _user_home_cells_sql(),
        "events_value_histogram": _events_value_histogram_sql(),
        "cell_value_median": _cell_value_median_sql(),
        "media_density_per_cell": _media_density_per_cell_sql(),
        "user_gyration": _user_gyration_sql(),
        "user_cell_entropy": _user_cell_entropy_sql(),
        "geo_knn_docs": _geo_knn_docs_sql(),
        "cell_kring_smooth": _cell_kring_smooth_sql(),
        "tile_pyramid": _tile_pyramid_sql(),
        "morans_i": _morans_i_sql(),
        "getis_hotspots": _getis_hotspots_sql(),
        "span_dedup": _span_dedup_sql(),
        "curation_pipeline": _curation_pipeline_sql(),
        "local_moran": _local_moran_sql(),
        "mmr_retrieval": _mmr_retrieval_sql(),
        "od_triangles": _od_triangles_sql(),
        "snm_pairs": _snm_pairs_sql(),
        "fuzzy_title_pairs": _fuzzy_title_pairs_sql(),
        "doc_tfidf_terms": _doc_tfidf_terms_sql(),
        "join_counts": _join_counts_sql(),
        "cell_kcore": _cell_kcore_sql(),
        "speed_anomalies": _speed_anomalies_sql(),
        "spacetime_scan": _spacetime_scan_sql(),
        "quadtree_bins": _quadtree_bins_sql(),
        "gearys_c": _gearys_c_sql(),
        "zipf_slope": _zipf_slope_sql(),
        "source_delta": _source_delta_sql(),
        "colocation_quotient": _colocation_quotient_sql(),
        "heaps_law": _heaps_law_sql(),
        "cluster_hulls": _cluster_hulls_sql(),
        "g_function": _g_function_sql(),
        "doc_bigram_ppl": _doc_bigram_ppl_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "teleport_flags": _teleport_flags_sql(),
        "huff_demand": _huff_demand_sql(),
        "quadrat_csr": _quadrat_csr_sql(),
        "cross_k": _cross_k_sql(),
        "deviational_ellipse": _deviational_ellipse_sql(),
        "knox_test": _knox_test_sql(),
        "span_transitions": _span_transitions_sql(),
        "doc_char_entropy": _doc_char_entropy_sql(),
        "cell_markov": _cell_markov_sql(),
        "user_burstiness": _user_burstiness_sql(),
        "cell_gini": _cell_gini_sql(),
        "hourly_acf": _hourly_acf_sql(),
        "mixture_resample": _mixture_resample_sql(),
        "dsir_weights": _dsir_weights_sql(),
        "viterbi_match": _viterbi_match_sql(),
        "rendezvous_shards": _rendezvous_shards_sql(),
        "pip_polygon_table": _pip_polygon_table_sql(),
        "pca_top_component": _pca_top_component_sql(),
        "cotravel_pairs": _cotravel_pairs_sql(),
        "contact_reach": _contact_reach_sql(),
        "semivariogram": _semivariogram_sql(),
        "variogram_fit": _variogram_fit_sql(),
        "od_ipf_balance": _od_ipf_balance_sql(),
        "kmv_distinct": _kmv_distinct_sql(),
        "bloom_semi_join": _bloom_semi_join_sql(),
        "cms_heavy_hitters": _cms_heavy_hitters_sql(),
        "histogram_quantiles": _histogram_quantiles_sql(),
        "matryoshka_recall": _matryoshka_recall_sql(),
        "bpe_encode": _bpe_encode_sql(),
        "kmv_set_ops": _kmv_set_ops_sql(),
        "binary_quant_recall": _binary_quant_recall_sql(),
        "psi_drift": _psi_drift_sql(),
        "ks_two_sample": _ks_two_sample_sql(),
        "fellegi_sunter": _fellegi_sunter_sql(),
        "cell_seasonal": _cell_seasonal_sql(),
        "radiation_model": _radiation_model_sql(),
        "ab_proportions": _ab_proportions_sql(),
        "fdr_hotspots": _fdr_hotspots_sql(),
        "ewma_anomaly": _ewma_anomaly_sql(),
        "prf_expansion": _prf_expansion_sql(),
        "commute_flows": _commute_flows_sql(),
        "chaikin_smooth": _chaikin_smooth_sql(),
        "media_ahash_dedup": _media_ahash_dedup_sql(),
        "rbo_rankings": _rbo_rankings_sql(),
        "kaplan_meier": _kaplan_meier_sql(),
        "did_estimator": _did_estimator_sql(),
        "dp_cell_counts": _dp_cell_counts_sql(),
        "join_size_estimate": _join_size_estimate_sql(),
        "crosstrack_deviation": _crosstrack_deviation_sql(),
        "shapley_attribution": _shapley_attribution_sql(),
        "ql_dirichlet": _ql_dirichlet_sql(),
        "ndcg_bm25": _ndcg_bm25_sql(),
        "mann_whitney": _mann_whitney_sql(),
        "bm25_eval": _bm25_eval_sql(),
        "chi2_independence": _chi2_independence_sql(),
        "cuped_adjustment": _cuped_adjustment_sql(),
        "containment_pairs": _containment_pairs_sql(),
        "clustering_coeff": _clustering_coeff_sql(),
        "hits_scores": _hits_scores_sql(),
        "rocchio_feedback": _rocchio_feedback_sql(),
        "cdc_chunks": _cdc_chunks_sql(),
        "degree_assortativity": _degree_assortativity_sql(),
        "cell_modularity": _cell_modularity_sql(),
        "link_prediction": _link_prediction_sql(),
        "jsd_sources": _jsd_sources_sql(),
        "polygon_metrics": _polygon_metrics_sql(),
        "kn_bigram_lm": _kn_bigram_lm_sql(),
        "hll_distinct": _hll_distinct_sql(),
        "textrank_keywords": _textrank_keywords_sql(),
        "ppr_scores": _ppr_scores_sql(),
        "lpa_communities": _lpa_communities_sql(),
        "nb_langid": _nb_langid_sql(),
        "silhouette_kmeans": _silhouette_kmeans_sql(),
        "symspell_lookup": _symspell_lookup_sql(),
        "logreg_train": _logreg_train_sql(),
        "moran_correlogram": _moran_correlogram_sql(),
        "monge_elkan_pairs": _monge_elkan_pairs_sql(),
        "media_scene_cuts": _media_scene_cuts_sql(),
        "permutation_test": _permutation_test_sql(),
        "maxscore_pruning": _maxscore_pruning_sql(),
        "minhash_jaccard_audit": _minhash_jaccard_audit_sql(),
        "markov_attribution": _markov_attribution_sql(),
        "graph_eccentricity": _graph_eccentricity_sql(),
        "ldiv_tcloseness": _ldiv_tcloseness_sql(),
        "semivariogram_dir": _semivariogram_dir_sql(),
        "cell_xcorr": _cell_xcorr_sql(),
        "align_titles": _align_titles_sql(),
        "jl_projection_audit": _jl_projection_audit_sql(),
        "spherical_centroid": _spherical_centroid_sql(),
        "mobility_entropy_rate": _mobility_entropy_rate_sql(),
        "term_burstiness": _term_burstiness_sql(),
        "participation_index": _participation_index_sql(),
        "greedy_set_cover": _greedy_set_cover_sql(),
        "segregation_indices": _segregation_indices_sql(),
        "percolation_curve": _percolation_curve_sql(),
        "stl_lite": _stl_lite_sql(),
        "changepoint_detect": _changepoint_detect_sql(),
        "ransac_fit": _ransac_fit_sql(),
        "next_cell_eval": _next_cell_eval_sql(),
        "span_position_profile": _span_position_profile_sql(),
        "multiprobe_lsh_recall": _multiprobe_lsh_recall_sql(),
        "rayleigh_bearing": _rayleigh_bearing_sql(),
        "bootstrap_ci": _bootstrap_ci_sql(),
        "pr_curve_11pt": _pr_curve_11pt_sql(),
        "kalman_tracks": _kalman_tracks_sql(),
        "holt_trend_cells": _holt_trend_cells_sql(),
        "semdedup_clusters": _semdedup_clusters_sql(),
        "plsa_topics": _plsa_topics_sql(),
        "kde_hotspots": _kde_hotspots_sql(),
        "hard_negatives": _hard_negatives_sql(),
        "betweenness_cells": _betweenness_cells_sql(),
        "temporal_motifs": _temporal_motifs_sql(),
        "clarity_score": _clarity_score_sql(),
        "rouge_pairs": _rouge_pairs_sql(),
        "cell_ktruss": _cell_ktruss_sql(),
        "good_turing": _good_turing_sql(),
        "chao1_richness": _chao1_richness_sql(),
        "wilson_ctr": _wilson_ctr_sql(),
        "sprt_monitor": _sprt_monitor_sql(),
        "ppr_sweep_cut": _ppr_sweep_cut_sql(),
        "rich_club": _rich_club_sql(),
        "randomized_response": _randomized_response_sql(),
        "bivariate_moran": _bivariate_moran_sql(),
        "kriging_ordinary": _kriging_ordinary_sql(),
        "f_function": _f_function_sql(),
        "rake_keywords": _rake_keywords_sql(),
        "conformal_intervals": _conformal_intervals_sql(),
        "isotonic_hourly": _isotonic_hourly_sql(),
        "media_dhash_pairs": _media_dhash_pairs_sql(),
        "texttiling_boundaries": _texttiling_boundaries_sql(),
        "traj_sinuosity": _traj_sinuosity_sql(),
        "lee_l": _lee_l_sql(),
        "calibration_bins": _calibration_bins_sql(),
        "mst_cells": _mst_cells_sql(),
        "mad_outliers": _mad_outliers_sql(),
        "theil_decomposition": _theil_decomposition_sql(),
        "jump_length_fit": _jump_length_fit_sql(),
        "cell_segmentation": _cell_segmentation_sql(),
        "dbsf_fusion": _dbsf_fusion_sql(),
        "best_passage": _best_passage_sql(),
        "idw_loocv": _idw_loocv_sql(),
        "contour_cases": _contour_cases_sql(),
        "region_bboxes": _region_bboxes_sql(),
        "blocking_quality": _blocking_quality_sql(),
        "decision_stump": _decision_stump_sql(),
        "ot_transport_plan": _ot_transport_plan_sql(),
        "media_run_lengths": _media_run_lengths_sql(),
        "lru_hit_rate": _lru_hit_rate_sql(),
        "phrase_search": _phrase_search_sql(),
        "min_cover_window": _min_cover_window_sql(),
        "lcss_pairs": _lcss_pairs_sql(),
        "readability_scores": _readability_scores_sql(),
        "box_counting_dim": _box_counting_dim_sql(),
        "spearman_corr": _spearman_corr_sql(),
        "gmm_em_values": _gmm_em_values_sql(),
        "meeting_point": _meeting_point_sql(),
        "od_segment_raster": _od_segment_raster_sql(),
        "viewshed_cells": _viewshed_cells_sql(),
        "sfca_accessibility": _sfca_accessibility_sql(),
        "spacetime_prism": _spacetime_prism_sql(),
        "rnn_influence": _rnn_influence_sql(),
        "boosted_stumps": _boosted_stumps_sql(),
        "interarrival_fit": _interarrival_fit_sql(),
        "doc_perplexity": _doc_perplexity_sql(),
        "trajectory_simplify": _trajectory_simplify_sql(),
        "quadkey_tiles": _quadkey_tiles_sql(),
        "ripley_k": _ripley_k_sql(),
        "emerging_hotspots": _emerging_hotspots_sql(),
        "similar_users": _similar_users_sql(),
        "doc_boilerplate": _doc_boilerplate_sql(),
        "zorder_layout": _zorder_layout_sql(),
        "hilbert_layout": _hilbert_layout_sql(),
        "hex_density": _hex_density_sql(),
        "geohash_coverage": _geohash_coverage_sql(),
        "kmeans_geo": _kmeans_geo_sql(),
        "snap_points": _snap_points_sql(),
        "cell_sssp": _cell_sssp_sql(),
        "density_gradient": _density_gradient_sql(),
        "clark_evans": _clark_evans_sql(),
        "gravity_fit": _gravity_fit_sql(),
        "dtw_pairs": _dtw_pairs_sql(),
        "hausdorff_pairs": _hausdorff_pairs_sql(),
        "event_funnel": _event_funnel_sql(),
        "theil_sen_cells": _theil_sen_sql(),
        "zrange_scan": _zrange_scan_sql(),
        "kanon_cells": _kanon_cells_sql(),
        "funnel_stages": _funnel_stages_sql(),
        "seq_packing": _seq_packing_sql(),
        "hilbert_range_scan": _hilbert_range_scan_sql(),
        "cohort_retention": _cohort_retention_sql(),
        "adoption_curve": _adoption_curve_sql(),
        "pip_donut": _pip_donut_sql(),
        "pmi_bigrams": _pmi_bigrams_sql(),
        "weighted_sample": _weighted_sample_sql(),
        "cusum_cells": _cusum_cells_sql(),
        "user_streaks": _user_streaks_sql(),
        "benford_values": _benford_values_sql(),
        "value_correlations": _value_correlations_sql(),
        "bearing_rose": _bearing_rose_sql(),
        "cell_isochrone": _cell_isochrone_sql(),
        "cell_pagerank": _cell_pagerank_sql(),
        "user_colocation": _user_colocation_sql(),
        "traj_crossings": _traj_crossings_sql(),
        "doc_stratified_sample": _doc_stratified_sample_sql(),
        "user_activity_mask": _user_activity_mask_sql(),
        "user_hourly_fill": _user_hourly_fill_sql(),
        "cell_trend_slope": _cell_trend_slope_sql(),
        "doc_dup_substrings": _doc_dup_substrings_sql(),
        "doc_skyline": _doc_skyline_sql(),
        "doc_quality_percentile": _doc_quality_percentile_sql(),
        "cell_covisit": _cell_covisit_sql(),
        "ivf_knn_ann": _ivf_knn_ann_sql(),
        "tree_build_synthetic": _tree_build_synthetic_sql(),
        "tree_build_overlap": _tree_build_overlap_sql(),
        "collapsed_retrieval_synthetic": _collapsed_retrieval_synthetic_sql(),
        "traversal_retrieval_synthetic": _traversal_retrieval_synthetic_sql(),
        "ivf_knn_exact": f"""
            SELECT vec_id AS id,
                   ROUND(1.0 - list_cosine_similarity(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       {QVEC_IVF_SQL}), 6) AS dist
            FROM embeddings ORDER BY dist ASC, id ASC LIMIT 10
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc, COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        """,
        "orders_status_stats": """
            SELECT o_orderstatus, COUNT(*) AS n_orders,
                   strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_dt,
                   strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_dt
            FROM orders GROUP BY 1
        """,
        "sum_qty_per_segment": """
            SELECT c_mktsegment, ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n_items
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY 1
        """,
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "semi_join_orders": """
            SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            GROUP BY 1
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "topk_lineitems": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10
        """,
        "latest_order_per_customer": """
            SELECT o_custkey, o_orderkey AS latest_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_dt
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
            WHERE rn = 1
        """,
        "orders_page": """
            SELECT o_orderkey, o_custkey, rn FROM (
                SELECT o_orderkey, o_custkey,
                       ROW_NUMBER() OVER (ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
                FROM orders)
            WHERE rn > 20 AND rn <= 30
        """,
        "events_ordered_scan": """
            SELECT event_id, user_id, event_type FROM events
            ORDER BY user_id ASC, ts ASC, event_id ASC LIMIT 100
        """,
        "order_count_per_customer": """
            SELECT c_custkey, COALESCE(n.cnt, 0) AS n_orders FROM customer
            LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) n
            ON c_custkey = n.o_custkey
        """,
        "supplier_siblings": """
            SELECT a.s_suppkey AS sup_a, b.s_suppkey AS sup_b, a.s_nationkey AS nationkey
            FROM supplier a JOIN supplier b
            ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
        """,
        "top2_orders_per_customer": """
            SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rn FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders WHERE o_custkey < 100)
            WHERE rn <= 2
        """,
        "asof_prior_click": _ASOF_PRIOR_CLICK_SQL,
        "click_purchase_join": _CLICK_PURCHASE_SQL,
        "events_rollup": _EVENTS_ROLLUP_SQL,
        "events_pivot": _EVENTS_PIVOT_SQL,
        "events_sliding": _EVENTS_SLIDING_SQL,
        "user_running_stats": _USER_RUNNING_SQL,
        "train_decontam": f"""
            WITH s AS (SELECT doc_id, text, {hash_split_sql("doc_id")} AS split
                       FROM documents),
            tr AS (SELECT doc_id AS id, unnest({shingles_sql("text", 5)}) AS g
                   FROM s WHERE split = 'train'),
            te AS (SELECT doc_id AS bench_id, unnest({shingles_sql("text", 5)}) AS g
                   FROM s WHERE split = 'test')
            SELECT tr.id AS doc_id, COUNT(DISTINCT tr.g) AS n_shared_grams,
                   COUNT(DISTINCT te.bench_id) AS n_bench_docs
            FROM tr JOIN te ON tr.g = te.g GROUP BY 1
        """,
        "knn_quantized": f"""
            WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127.0 /
                           list_max(list_transform(embedding,
                               y -> abs(CAST(y AS DOUBLE)))))) AS q
                FROM embeddings)
            SELECT vec_id,
                   ROUND(1.0 - list_inner_product(q, {_QVEC_Q_SQL}) /
                         (sqrt(list_inner_product(q, q)) * {_QVEC_Q_NORM!r}), 6) AS qdist
            FROM qz ORDER BY qdist ASC, vec_id ASC LIMIT 10
        """,
        "pq_knn": _pq_knn_sql(),
        "events_hourly_stats": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
                   event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "json_props": """
            SELECT event_type,
                   ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k
            FROM events GROUP BY 1
        """,
        "user_sessions": """
            SELECT user_id, sess_id,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_dt,
                   strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_dt,
                   COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
            FROM (
                SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS sess_id
                FROM (
                    SELECT *, CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                               > 1800000000
                              THEN 1 ELSE 0 END AS new_sess
                    FROM events WHERE user_id < 100)
            ) GROUP BY user_id, sess_id
        """,
        "path_to_root": """
            WITH RECURSIVE p AS (
                SELECT DISTINCT o_orderkey AS start_key, o_orderkey AS node,
                       CAST(0 AS BIGINT) AS depth
                FROM orders WHERE o_orderkey < 1000
                UNION ALL
                SELECT start_key, CAST(FLOOR(node / 10.0) AS BIGINT), depth + 1
                FROM p WHERE node > 0 AND depth < 10
            )
            SELECT start_key, node, depth FROM p
        """,
        "first_seen_dedup": """
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) AS rn
                  FROM events WHERE user_id < 200)
            WHERE rn = 1
        """,
        "revenue_by_nation": """
            SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM region JOIN nation ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE r_name = 'ASIA'
            GROUP BY 1
        """,
        "filtered_revenue": """
            SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'AUTOMOBILE'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "price_bucket_range_join": """
            SELECT bucket, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
            FROM orders JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 250000.0),
                                     ('high', 250000.0, 1e12)) b(bucket, lo, hi)
            ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY 1
        """,
        "scalar_funcs": """
            SELECT doc_id, md5(text) AS checksum,
                   substr(regexp_replace(text, '(?i)^summary:\\s*', ''), 1, 20) AS cleaned_head,
                   printf('%d::leaf::%06d', doc_id, doc_id % 1000) AS leaf_id,
                   substr(text, 1, 40) AS truncated,
                   length(text) AS n_chars
            FROM documents WHERE doc_id < 200
        """,
        "doc_winnow_fp": _doc_winnow_fp_sql(),
        "doc_token_stats": _doc_token_stats_sql(),
        "events_quantiles": """
            SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS p50,
                   ROUND(quantile_cont(value, 0.9), 6) AS p90,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1
        """,
        "query_normalize": (
            lambda nq: f"""
            SELECT doc_id,
                   CAST({token_count_sql("text")} AS BIGINT) AS n_tokens,
                   CAST(length({nq}) AS BIGINT) AS norm_len,
                   COALESCE(substring({nq}, 1, 24), '<rejected>') AS norm_head
            FROM documents WHERE doc_id < 300
        """
        )(normalize_query_sql("text", soft_cap=50, hard_cap=90, target_tokens=30)),
        "event_type_setops": """
            SELECT event_type, 'both' AS src FROM
                (SELECT event_type FROM events WHERE event_id % 2 = 0
                 INTERSECT SELECT event_type FROM events WHERE event_id % 2 = 1)
            UNION ALL
            SELECT event_type, 'only_even' FROM
                (SELECT event_type FROM events WHERE event_id % 2 = 0
                 EXCEPT SELECT event_type FROM events WHERE event_id % 2 = 1)
            UNION ALL
            SELECT event_type, 'only_odd' FROM
                (SELECT event_type FROM events WHERE event_id % 2 = 1
                 EXCEPT SELECT event_type FROM events WHERE event_id % 2 = 0)
        """,
        "doc_tokens_by_lang": (
            f"SELECT lang, CAST(SUM({token_count_sql('text')}) AS BIGINT) AS total_tokens, "
            f"COUNT(*) AS n_docs FROM documents GROUP BY 1"
        ),
        "doc_hash_split": (
            f"SELECT {hash_split_sql('doc_id')} AS split, COUNT(*) AS n_docs, "
            f"CAST(SUM({token_count_sql('text')}) AS BIGINT) AS n_tokens "
            f"FROM documents GROUP BY 1"
        ),
        "top_terms_per_lang": """
            SELECT lang, term, n, rk FROM (
                SELECT lang, term, n,
                       ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY n DESC, term ASC) AS rk
                FROM (
                    SELECT lang, term, COUNT(*) AS n FROM (
                        SELECT lang, unnest(regexp_split_to_array(
                            lower(trim(text)), '\\s+')) AS term
                        FROM documents)
                    WHERE term <> '' GROUP BY 1, 2)
            ) WHERE rk <= 5
        """,
        "doc_quality_top20": (
            f"SELECT doc_id, {quality_score_sql('text')} AS quality FROM documents "
            f"ORDER BY quality DESC, doc_id ASC LIMIT 20"
        ),
        "doc_langid_counts": (
            f"SELECT {lang_id_sql('text')} AS pred_lang, COUNT(*) AS n_docs "
            f"FROM documents GROUP BY 1"
        ),
        "doc_fingerprint_dedup": exact_dedup_sql(_DOCS_WITH_DUPS_SQL + " t"),
        "minhash_pairs": minhash_lsh_pairs_sql(
            _DOCS_WITH_DUPS_SQL + " t", threshold=0.7, bands=8
        ),
        "simhash_pairs": simhash_pairs_sql(_DOCS_WITH_DUPS_SQL + " t", max_hamming=3),
        "ngram_jaccard": ngram_jaccard_pairs_sql(_DOCS_WITH_DUPS_SQL + " t", threshold=0.6),
        "neardup_components": canonical_docs_sql(
            _DOCS_WITH_DUPS_SQL,
            minhash_lsh_pairs_sql(_DOCS_WITH_DUPS_SQL + " t", threshold=0.7, bands=8),
        ),
        "doc_repetition": repetition_scores_sql(_DOCS_WITH_DUPS_SQL + " t"),
        "cosine_neardup": cosine_neardup_exact_sql(_EMB_WITH_DUPS_SQL, threshold=0.5),
        "cosine_neardup_lsh": cosine_neardup_bucketed_sql(_EMB_WITH_DUPS_SQL, threshold=0.5),
        "grid_knn_ann": grid_knn_sql("embeddings", QVEC3, 10, res=4, dim=64),
        "media_features": _media_features_sql(),
        "span_roundtrip_check": _span_roundtrip_sql(),
        "knn_top10": f"""
            SELECT vec_id, label,
                   ROUND(1.0 - list_cosine_similarity(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)), {QVEC_SQL}), 6) AS dist
            FROM embeddings ORDER BY dist ASC, vec_id ASC LIMIT 10
        """,
        "knn_filtered": f"""
            SELECT vec_id,
                   ROUND(1.0 - list_cosine_similarity(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)), {QVEC_SQL}), 6) AS dist
            FROM embeddings
            WHERE vec_id IN (SELECT doc_id FROM documents
                             WHERE lang = 'en' AND n_chars >= 300)
            ORDER BY dist ASC, vec_id ASC LIMIT 10
        """,
        "colbert_maxsim": _colbert_maxsim_sql(),
        "knn_multi": f"""
            WITH q(qid, qv) AS (VALUES ('qa', {QVEC_SQL}), ('qb', {QVEC2_SQL})),
            scored AS (
                SELECT q.qid, e.vec_id AS id,
                       1.0 - list_cosine_similarity(
                           list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv) AS d
                FROM embeddings e CROSS JOIN q
            )
            SELECT qid, id, ROUND(d, 6) AS dist FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY ROUND(d, 9), id) AS rn FROM scored)
            WHERE rn <= 5
        """,
        "spans_explode": """
            WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
                       FROM documents)
            SELECT doc_id, i AS idx,
                   array_to_string(list_slice(words, i * 10 + 1, i * 10 + 10), ' ') AS span_text,
                   LEAST(10, len(words) - i * 10) AS token_cnt,
                   CAST(doc_id AS VARCHAR) || '::c' || CAST(i AS VARCHAR) AS chunk_id
            FROM w, UNNEST(generate_series(0, CAST(FLOOR((len(words) - 1) / 10) AS BIGINT))) t(i)
        """,
    }


def _convex_inside_expr(
    poly: list[tuple[float, float]], lat: str, lng: str
) -> str:
    """Convex-polygon strict-inside test as same-sign cross products — one
    arithmetic boolean string valid in BOTH Spark SQL (F.expr) and DuckDB."""
    conds_pos, conds_neg = [], []
    m = len(poly)
    for i in range(m):
        (ay, ax), (by, bx) = poly[i], poly[(i + 1) % m]
        cross = f"(({bx} - {ax}) * (({lat}) - {ay}) - ({by} - {ay}) * (({lng}) - {ax}))"
        conds_pos.append(f"{cross} > 0")
        conds_neg.append(f"{cross} < 0")
    return f"(({' AND '.join(conds_pos)}) OR ({' AND '.join(conds_neg)}))"


def _convex_pip_sql(qid: str, poly: list[tuple[float, float]]) -> str:
    """Convex-polygon PIP as same-sign cross products (exact, SQL-only)."""
    lat, lng = _latlng_sql("doc_id")
    inside = _convex_inside_expr(poly, lat, lng)
    return f"SELECT '{qid}' AS qid, doc_id FROM documents WHERE {inside}"
