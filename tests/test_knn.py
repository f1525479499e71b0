"""kNN operators vs numpy oracles (SURVEY §2.3 J8)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.datagen import gen_query_vectors
from raptor_service_spark.operators.knn import (
    brute_force_knn,
    brute_force_knn_multi,
    grid_knn,
    project_to_latlng_np,
    with_projected_cell,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").cast("string").alias("id"), F.col("embedding").alias("v"), "label")
        .persist()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def emb_pd(emb):
    return emb.toPandas()


def _oracle_topk(pdf, q, k):
    mat = np.array(pdf.v.tolist(), dtype=np.float64)
    d = 1.0 - (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    out = pdf.assign(dist=d, dkey=np.round(d, 9))
    return out.sort_values(["dkey", "id"], key=None).head(k)


def test_brute_force_matches_oracle(emb, emb_pd):
    dim = len(emb_pd.v.iloc[0])
    for q in gen_query_vectors(seed=21, n=3, dim=dim):
        got = brute_force_knn(emb, q, 10, payload_cols=("label",)).toPandas()
        exp = _oracle_topk(emb_pd, q, 10)
        assert got.id.tolist() == exp.id.tolist()
        np.testing.assert_allclose(got.dist.values, exp.dist.values, rtol=1e-9)


def test_brute_force_multi_matches_single(emb, emb_pd):
    dim = len(emb_pd.v.iloc[0])
    qs = gen_query_vectors(seed=22, n=4, dim=dim)
    qids = [f"q{i}" for i in range(len(qs))]
    got = brute_force_knn_multi(emb, qs, qids, 7).toPandas()
    for i, q in enumerate(qs):
        sub = got[got.qid == f"q{i}"].sort_values("dist")
        exp = _oracle_topk(emb_pd, q, 7)
        assert sub.id.tolist() == exp.id.tolist()


def test_projection_deterministic(emb_pd):
    mat = np.array(emb_pd.v.tolist(), dtype=np.float64)
    a = project_to_latlng_np(mat)
    b = project_to_latlng_np(mat)
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()
    assert (np.abs(a[0]) < 90).all() and (np.abs(a[1]) < 180).all()


def test_grid_knn_recall_and_exactness(emb, emb_pd):
    dim = len(emb_pd.v.iloc[0])
    cellified = with_projected_cell(emb, res=4).persist()
    cellified.count()
    recalls = []
    for q in gen_query_vectors(seed=23, n=5, dim=dim):
        got = grid_knn(cellified, q, 10, res=4, payload_cols=("label",)).toPandas()
        assert len(got) == 10
        assert (np.diff(np.round(got.dist.values, 9)) >= 0).all()
        exp = _oracle_topk(emb_pd, q, 10)
        recalls.append(len(set(got.id) & set(exp.id)) / 10)
    # ANN recall: projection buckets are coarse; expect decent recall on average
    assert np.mean(recalls) >= 0.5, f"mean recall too low: {recalls}"


def test_grid_knn_falls_back_when_sparse(emb, spark):
    # tiny table: ring expansion cannot reach target -> full-scan fallback == exact
    small = emb.limit(12).persist()
    pdf = small.toPandas()
    dim = len(pdf.v.iloc[0])
    cellified = with_projected_cell(small, res=6)
    q = gen_query_vectors(seed=24, n=1, dim=dim)[0]
    got = grid_knn(cellified, q, 5, res=6).toPandas()
    exp = _oracle_topk(pdf, q, 5)
    assert got.id.tolist() == exp.id.tolist()
