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


def project_to_latlng_np(mat: np.ndarray, seed: int = 4242) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic 2-D hash-projection of embeddings onto the lat/lng domain.

    Cosine-similar vectors project to nearby points (random-projection LSH
    property), so grid cells act as coarse ANN buckets (SURVEY §1.3: replaces
    the UMAP 2-D reduction)."""
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    basis = _projection_basis(mat.shape[1], seed)
    p = unit @ basis.T  # in [-1, 1]
    lat = np.clip(p[:, 0] * 85.0, -89.9, 89.9)
    lng = np.clip(p[:, 1] * 179.0, -179.9, 179.9)
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
    min_candidates_factor: int = 8,
    max_ring: int = 8,
) -> DataFrame:
    """Grid-compacted ANN: k-ring candidate pruning + exact cosine re-rank.

    ``df_with_cell`` must carry ``ann_cell`` (see with_projected_cell). The
    ``ann_cell IN (<ring>)`` predicate is a literal IN-list -> pushed to the
    parquet/Iceberg scan (partition pruning when partitioned by ann_cell).
    Ring grows until enough candidates; recall measured in tests vs brute force.
    """
    q = np.asarray(q, dtype=np.float64)
    qlat, qlng = project_to_latlng_np(q[None, :], seed)
    from raptor_service_spark.geo.grid import cell_encode_np

    qcell = int(cell_encode_np(qlat, qlng, res)[0])

    ring = 1
    target = max(k * min_candidates_factor, k)
    while True:
        cells = [int(c) for c in kring_np(qcell, ring)]
        cand = df_with_cell.filter(F.col("ann_cell").isin(cells))
        n = cand.limit(target).count()
        if n >= target or ring >= max_ring:
            break
        ring *= 2
    if n < target:  # ring exhausted on a sparse table: degrade to exact full scan
        cand = df_with_cell
    return brute_force_knn(cand, q, k, vec_col, payload_cols, id_col)
