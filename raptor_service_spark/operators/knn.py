"""kNN operators: brute-force cosine top-k + grid-compacted ANN.

Replaces pgvector's HNSW-backed ``ORDER BY v <=> q LIMIT k``
(/root/reference/repositories/retrieval_repo.py:267-279, index
db/models/embeddings.py:38-43). Spark has no ANN index; the scale path is
GRID-COMPACTED kNN (BASELINE.json north_star): vectors get a deterministic 2-D
projection -> grid cell; a query prunes to its k-ring of cells (partition
pruning when the table is written partitioned by cell) and runs exact cosine
only inside the candidate set, falling back to wider rings until enough
candidates exist.

Physical shape of brute force: per-Arrow-batch LOCAL top-k in a mapInPandas
kernel (BLAS matvec), then a global merge of ``numPartitions * k`` rows via
TakeOrderedAndProject — the classic distributed top-k: no full sort, no full
shuffle, driver sees only the merged k.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.functions.vector import cosine_dist_col
from raptor_service_spark.geo.grid import cell_encode_col, kring_np


def _projection_basis(dim: int, seed: int = 4242) -> np.ndarray:
    rng = np.random.default_rng([seed, dim])
    b = rng.standard_normal((2, dim))
    return b / np.linalg.norm(b, axis=1, keepdims=True)


def projected_cell_sql(vec_expr: str, res: int, dim: int, seed: int = 4242) -> str:
    """ANSI-SQL (DuckDB-runnable) twin of ``with_projected_cell``'s bucket id.

    Emits the identical float64 pipeline as ``project_to_latlng_np`` +
    ``cell_encode_sql`` — explicit sequential dot products against the literal
    projection basis, logistic CDF squash, clip, grid encode — so the driver's
    DuckDB oracle can reproduce ANN bucket membership exactly (verified 0/500
    cell mismatches at sf0.001 and sf0.01). SQL-side arithmetic is pure
    float64; the only parity risk is a projected coordinate landing within
    ~1 ulp of a cell edge, which the fixed test corpora do not contain."""
    from raptor_service_spark.geo.grid import cell_encode_sql

    basis = _projection_basis(dim, seed)
    norm = (
        "sqrt("
        + " + ".join(
            f"({vec_expr}[{j + 1}]::DOUBLE * {vec_expr}[{j + 1}]::DOUBLE)" for j in range(dim)
        )
        + ")"
    )
    dots = [
        " + ".join(f"({vec_expr}[{j + 1}]::DOUBLE * {basis[r, j]!r})" for j in range(dim))
        for r in range(2)
    ]
    sqrt_dim = repr(float(np.sqrt(dim)))
    u0 = f"(1.0 / (1.0 + exp(-1.702 * ((({dots[0]}) / {norm}) * {sqrt_dim}))))"
    u1 = f"(1.0 / (1.0 + exp(-1.702 * ((({dots[1]}) / {norm}) * {sqrt_dim}))))"
    lat = f"GREATEST(-89.9, LEAST(89.9, (({u0}) * 2.0 - 1.0) * 85.0))"
    lng = f"GREATEST(-179.9, LEAST(179.9, (({u1}) * 2.0 - 1.0) * 179.0))"
    return cell_encode_sql(lat, lng, res)


def project_to_latlng_np(mat: np.ndarray, seed: int = 4242) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic 2-D hash-projection of embeddings onto the lat/lng domain.

    Cosine-similar vectors project to nearby points (random-projection LSH
    property), so grid cells act as coarse ANN buckets (SURVEY §1.3: replaces
    the UMAP 2-D reduction).

    The raw dot of a random unit vector with a unit basis direction
    concentrates around 0 with std ~ 1/sqrt(dim), which would pile ~all mass
    into the few center cells and defeat cell pruning (measured: one res-4
    cell held 15% of a 1.1M index). So the coordinate is variance-normalized
    (* sqrt(dim)) and pushed through a logistic CDF approximation of the
    normal CDF — a monotonic map, so neighborhoods are preserved — yielding
    near-uniform bucket occupancy across the grid."""
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    basis = _projection_basis(mat.shape[1], seed)
    p = unit @ basis.T  # concentrated ~N(0, 1/dim)
    z = p * np.sqrt(mat.shape[1])
    u = 1.0 / (1.0 + np.exp(-1.702 * z))  # logistic approx of Phi(z), in (0,1)
    lat = np.clip((u[:, 0] * 2.0 - 1.0) * 85.0, -89.9, 89.9)
    lng = np.clip((u[:, 1] * 2.0 - 1.0) * 179.0, -179.9, 179.9)
    return lat, lng


def with_projected_cell(
    df: DataFrame, vec_col: str = "v", res: int = 6, seed: int = 4242
) -> DataFrame:
    """Attach the ANN bucket cell to a vector DataFrame (Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                lat, lng = project_to_latlng_np(mat, seed)
                pdf = pdf.assign(_plat=lat, _plng=lng)
            else:
                pdf = pdf.assign(_plat=pd.Series(dtype=float), _plng=pd.Series(dtype=float))
            yield pdf

    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields)
        + [StructField("_plat", DoubleType()), StructField("_plng", DoubleType())]
    )
    out = df.mapInPandas(gen, schema=schema)
    return out.withColumn(
        "ann_cell", cell_encode_col(F.col("_plat"), F.col("_plng"), res)
    ).drop("_plat", "_plng")


def brute_force_knn(
    df: DataFrame,
    q: np.ndarray,
    k: int,
    vec_col: str = "v",
    payload_cols: tuple[str, ...] = (),
    id_col: str = "id",
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    JVM-side distance (codegen) + TakeOrderedAndProject; ordering key is
    (round(dist, 9), id) so near-ties are deterministic across float fold
    orders (SURVEY §7.4.1); the returned dist stays exact.
    """
    cols = [id_col, *payload_cols]
    return (
        df.select(*cols, cosine_dist_col(F.col(vec_col), q).alias("dist"))
        .orderBy(F.round(F.col("dist"), 9).asc(), F.col(id_col).asc())
        .limit(k)
    )


def brute_force_knn_multi(
    df: DataFrame,
    queries: np.ndarray,
    qids: list[str],
    k: int,
    vec_col: str = "v",
    payload_cols: tuple[str, ...] = (),
    id_col: str = "id",
) -> DataFrame:
    """Exact top-k for MANY queries in one pass over the data.

    mapInPandas computes per-batch local top-k per query against the
    broadcast query matrix (one BLAS GEMM per Arrow batch), then a window
    keeps the global k — shuffle carries only ~(batches * k * n_queries) rows.
    """
    qmat = np.asarray(queries, dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qmat_n = qmat / qnorm
    qid_arr = list(qids)
    cols = [id_col, *payload_cols]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sim = (mat / norms[:, None]) @ qmat_n.T  # (batch, nq)
            dist = 1.0 - sim
            kk = min(k, len(pdf))
            out_frames = []
            for qi, qid in enumerate(qid_arr):
                idx = np.argpartition(dist[:, qi], kk - 1)[:kk]
                sub = pdf.iloc[idx][cols].copy()
                sub["qid"] = qid
                sub["dist"] = dist[idx, qi]
                out_frames.append(sub)
            yield pd.concat(out_frames, ignore_index=True)

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.select(*cols).schema.fields
    )
    local = df.mapInPandas(gen, schema=f"{fields}, qid string, dist double")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.round(F.col("dist"), 9).asc(), F.col(id_col).asc())
    return (
        local.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
    )


def grid_knn(
    df_with_cell: DataFrame,
    q: np.ndarray,
    k: int,
    res: int = 6,
    seed: int = 4242,
    vec_col: str = "v",
    payload_cols: tuple[str, ...] = (),
    id_col: str = "id",
    min_candidates_factor: int = 32,
    max_ring: int = 8,
) -> DataFrame:
    """Grid-compacted ANN: k-ring candidate pruning + exact cosine re-rank.

    ``df_with_cell`` must carry ``ann_cell`` (see with_projected_cell). The
    ``ann_cell IN (<ring>)`` predicate is a literal IN-list -> pushed to the
    parquet/Iceberg scan (partition pruning when partitioned by ann_cell).
    Ring size is chosen driver-side from ONE occupancy-histogram job
    (groupBy(ann_cell).count()) via plan_candidate_cells — not a
    count-job-per-ring probe loop; recall measured in tests vs brute force.
    """
    q = np.asarray(q, dtype=np.float64)
    cell_counts = {
        r["ann_cell"]: r["cnt"]
        for r in df_with_cell.groupBy("ann_cell").agg(F.count("*").alias("cnt")).collect()
    }
    cells = plan_candidate_cells(
        cell_counts, q, k, res, seed, min_candidates_factor, max_ring
    )
    if cells is None:  # sparse table: degrade to exact full scan
        cand = df_with_cell
    else:
        cand = df_with_cell.filter(F.col("ann_cell").isin(cells))
    return brute_force_knn(cand, q, k, vec_col, payload_cols, id_col)


ANN_PFX_RES = 3  # 64 coarse directories for the partitioned index layout


def build_ann_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    dim: int = 64,
    res: int = 4,
    seed: int = 4242,
    pfx_res: int = ANN_PFX_RES,
    rounds: int = 1,
    vec_dtype: str = "<f4",
) -> DataFrame:
    """Fused embed + 2-D projection + bucket cell in ONE Arrow pass.

    Emits ``(id, v binary, ann_cell, pfx)``:
      * ``v`` is the little-endian float32 byte packing of the vector —
        parquet decodes a flat binary column far faster than list<float>,
        and the scoring kernel rebuilds the matrix with one ``frombuffer``;
      * ``pfx`` is the coarse parent cell (res ``pfx_res``) used as the
        table's directory-partition column so query rings prune whole
        partitions (Iceberg partition transform at real scale).

    Write layout (see write_ann_index): hash-repartition on (pfx, salt) —
    salt spreads hot cells such as the empty-text mega-cell over several
    files — then sortWithinPartitions(pfx, ann_cell) so row-group min/max
    stats make the residual ``ann_cell`` predicate skip within partitions.
    Fusing the three kernels into one ``mapInPandas`` avoids re-shipping the
    vector column between Python stages."""
    from raptor_service_spark.functions.vector import hash_embed_np
    from raptor_service_spark.geo.grid import cell_encode_np, cell_parent_np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = hash_embed_np(pdf[text_col], dim, rounds=rounds)
            lat, lng = project_to_latlng_np(mat, seed)
            cells = cell_encode_np(lat, lng, res)
            packed = np.ascontiguousarray(mat, dtype=vec_dtype)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype(str).to_numpy(),
                    "v": [row.tobytes() for row in packed],
                    "ann_cell": cells.astype(np.int64),
                    "pfx": cell_parent_np(cells, pfx_res).astype(np.int64),
                }
            )

    return df.select(F.col(id_col).alias("id"), F.col(text_col).alias(text_col)).mapInPandas(
        gen, schema="id string, v binary, ann_cell long, pfx long"
    )


def write_ann_index(
    index: DataFrame, path: str, npart: int | None = None, salts: int = 32
) -> None:
    """Persist the ANN index partitioned by coarse cell.

    Default is the NARROW write: each scan task locally sorts by (pfx,
    ann_cell) and fans its rows into the pfx directories — no shuffle of the
    vector payload at all. Pass ``npart`` to instead hash-repartition on
    (pfx, salt) first — fewer, bigger files per partition and explicit
    hot-cell spreading (the Iceberg write-distribution mode you'd pick on a
    real cluster where shuffle bandwidth scales with executors; the salt
    spreads hot cells such as the empty-text mega-cell over ``salts``
    writers)."""
    out = index
    if npart:
        out = out.repartition(npart, F.col("pfx"), F.pmod(F.xxhash64("id"), F.lit(salts)))
    (
        out.sortWithinPartitions("pfx", "ann_cell")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(path)
    )


def append_ann_index(
    new_index: DataFrame, path: str, npart: int | None = None, salts: int = 32
) -> None:
    """Incremental index ingest: append new vectors into the SAME pfx
    directory layout (dynamic partition append — new files land inside the
    existing coarse-cell directories, each internally sorted by (pfx,
    ann_cell) so row-group pruning keeps working). Search results over the
    appended index are identical to an index rebuilt from scratch on the
    union (candidate scans are layout-independent); callers must append
    NEW ids only — idempotent re-ingest goes through a catalog merge
    instead."""
    out = new_index
    if npart:
        out = out.repartition(npart, F.col("pfx"), F.pmod(F.xxhash64("id"), F.lit(salts)))
    (
        out.sortWithinPartitions("pfx", "ann_cell")
        .write.mode("append")
        .partitionBy("pfx")
        .parquet(path)
    )


def plan_candidate_cells(
    cell_counts: dict[int, int],
    q: np.ndarray,
    k: int,
    res: int,
    seed: int = 4242,
    min_candidates_factor: int = 32,
    max_ring: int = 8,
) -> list[int] | None:
    """Driver-side ring planner from tile-occupancy stats (SURVEY §4.2 #1).

    Expands the k-ring around the query's bucket until the summed occupancy
    covers ``k * min_candidates_factor`` — zero Spark jobs; the histogram is
    tiny (bounded by 4^res cells). Returns None when the table is too sparse,
    meaning: scan everything (exact fallback)."""
    from raptor_service_spark.geo.grid import cell_encode_np

    q = np.asarray(q, dtype=np.float64)
    qlat, qlng = project_to_latlng_np(q[None, :], seed)
    qcell = int(cell_encode_np(qlat, qlng, res)[0])
    target = max(k * min_candidates_factor, k)
    ring = 1
    while ring <= max_ring:
        cells = [int(c) for c in kring_np(qcell, ring)]
        if sum(cell_counts.get(c, 0) for c in cells) >= target:
            return cells
        ring *= 2
    return None


def grid_knn_sql(
    table: str,
    q: np.ndarray,
    k: int,
    res: int,
    dim: int,
    seed: int = 4242,
    min_candidates_factor: int = 32,
    max_ring: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``grid_knn`` (cell bucketing + ring planner + exact
    re-rank), so the driver oracle verifies the APPROXIMATE grid-ANN path's
    exact output instead of a rows-only count.

    The planner is replicated relationally: per-cell occupancy, wrapped
    Chebyshev ring distance to the query's cell (lng wraps mod n, lat is
    in-bounds by construction — kring_np semantics), smallest ring in
    (1,2,4,8) whose occupancy sum reaches ``k*factor``, NULL -> full scan."""
    from raptor_service_spark.geo.grid import RES_MULTIPLIER, cell_encode_np

    q = np.asarray(q, dtype=np.float64)
    qlat, qlng = project_to_latlng_np(q[None, :], seed)
    qcell = int(cell_encode_np(qlat, qlng, res)[0])
    n = 1 << res
    rem = qcell - res * RES_MULTIPLIER
    qy, qx = rem // n, rem % n
    target = max(k * min_candidates_factor, k)
    rings = []
    r = 1
    while r <= max_ring:
        rings.append(f"({r})")
        r *= 2
    cell = projected_cell_sql(vec_col, res, dim, seed)
    qsql = "[" + ", ".join(f"{x:.6f}" for x in q) + "]"
    dist = f"(1.0 - list_cosine_similarity(v, {qsql}))"
    return f"""
        WITH base AS (
            SELECT CAST({id_col} AS VARCHAR) AS id,
                   list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v,
                   {cell} AS ann_cell
            FROM {table}
        ),
        occ AS (
            SELECT ann_cell, COUNT(*) AS c,
                   GREATEST(
                       LEAST(ABS((ann_cell - {res * RES_MULTIPLIER}) % {n} - {qx}),
                             {n} - ABS((ann_cell - {res * RES_MULTIPLIER}) % {n} - {qx})),
                       ABS(CAST(FLOOR((ann_cell - {res * RES_MULTIPLIER}) / {n}) AS BIGINT) - {qy})
                   ) AS cheb
            FROM base GROUP BY 1
        ),
        chosen AS (
            SELECT MIN(r) AS ring FROM (VALUES {", ".join(rings)}) rings(r)
            WHERE (SELECT COALESCE(SUM(c), 0) FROM occ WHERE cheb <= r) >= {target}
        )
        SELECT id, ROUND({dist}, 6) AS dist
        FROM base
        WHERE (SELECT ring FROM chosen) IS NULL
           OR ann_cell IN (SELECT ann_cell FROM occ
                           WHERE cheb <= (SELECT ring FROM chosen))
        ORDER BY ROUND({dist}, 9) ASC, id ASC
        LIMIT {k}
    """


def grid_knn_multi(
    index: DataFrame,
    queries: np.ndarray,
    qids: list[str],
    k: int,
    res: int = 4,
    seed: int = 4242,
    min_candidates_factor: int = 32,
    cell_counts: dict[int, int] | None = None,
    pfx_res: int = ANN_PFX_RES,
    vec_dtype: str = "<f4",
) -> DataFrame:
    """Grid-compacted kNN for MANY queries in two jobs total.

    Job 1 (skippable by passing precomputed ``cell_counts``): occupancy
    histogram ``groupBy(ann_cell).count()`` — the planner statistic.
    Job 2: one pass over the union of all queries' candidate cells. The scan
    is pruned twice before any vector is decoded: ``pfx IN (...)`` hits the
    index table's directory partitions (partition pruning), and
    ``ann_cell IN (...)`` skips row groups inside them (files are sorted by
    ann_cell). Surviving rows get their probing query ids via a broadcast
    (cell, qid) join, then exact cosine (one frombuffer + GEMV per Arrow
    batch) and a per-qid top-k window; the shuffle carries only candidates.

    Replaces per-query ring probing (grid_knn) whose count-jobs dominate at
    high query counts. Output: (qid, id, dist), top-k per qid. ``index``
    must carry (id, v binary-f32, ann_cell, pfx) — see build_ann_index.
    """
    from raptor_service_spark.geo.grid import cell_parent_np

    qmat = np.asarray(queries, dtype=np.float64)
    if cell_counts is None:
        cell_counts = {
            r["ann_cell"]: r["cnt"]
            for r in index.groupBy("ann_cell").agg(F.count("*").alias("cnt")).collect()
        }

    spark = index.sparkSession
    pairs: list[tuple[int, str]] = []
    full_scan_qids: list[str] = []
    for q, qid in zip(qmat, qids):
        cells = plan_candidate_cells(
            cell_counts, q, k, res, seed, min_candidates_factor
        )
        if cells is None:
            full_scan_qids.append(qid)
        else:
            pairs.extend((c, qid) for c in cells)

    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qmap = {qid: qnorm[i] for i, qid in enumerate(qids)}
    qmap_b = spark.sparkContext.broadcast(qmap)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            mat = np.frombuffer(b"".join(pdf["v"]), dtype=vec_dtype).reshape(len(pdf), -1)
            mat = mat.astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            mat /= norms[:, None]
            out = []
            for qid, grp in pdf.groupby("qid", sort=False):
                sim = mat[grp.index.to_numpy()] @ qmap_b.value[qid]
                out.append(pd.DataFrame({"qid": qid, "id": grp["id"].to_numpy(), "dist": 1.0 - sim}))
            yield pd.concat(out, ignore_index=True)

    parts = []
    if pairs:
        all_cells = sorted({c for c, _ in pairs})
        prefixes = sorted({int(p) for p in cell_parent_np(np.array(all_cells), pfx_res)})
        cells_df = spark.createDataFrame(pairs, "ann_cell long, qid string")
        cand = (
            index.filter(F.col("pfx").isin(prefixes) & F.col("ann_cell").isin(all_cells))
            .join(F.broadcast(cells_df), "ann_cell")
            .select("qid", "id", "v")
        )
        parts.append(cand)
    if full_scan_qids:
        qdf = spark.createDataFrame([(q,) for q in full_scan_qids], "qid string")
        parts.append(index.crossJoin(F.broadcast(qdf)).select("qid", "id", "v"))
    if not parts:
        return spark.createDataFrame([], "qid string, id string, dist double")
    allc = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    scored = allc.mapInPandas(score, schema="qid string, id string, dist double")

    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.round(F.col("dist"), 9).asc(), F.col("id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
