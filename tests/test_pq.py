"""PQ-ADC kNN (operators/pq.py): Spark codegen encode/score vs numpy, plus
recall against exact brute force."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from raptor_service_spark.operators.pq import (
    adc_score_expr,
    adc_tables,
    pq_code_expr,
    pq_dist_array_exprs,
    train_pq_codebooks,
)


def _vectors(n=300, dim=64, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return np.round(x, 6)


def _spark_codes_scores(spark, x, books, q):
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for s, ds in enumerate(pq_dist_array_exprs(books, "embedding", "spark")):
        e = e.withColumn(f"ds{s}", F.expr(ds))
    for s in range(books.shape[0]):
        e = e.withColumn(f"pc{s}", F.expr(pq_code_expr(f"ds{s}", "spark")))
    score = F.expr(
        adc_score_expr(adc_tables(books, q), [f"pc{s}" for s in range(books.shape[0])], "spark")
    )
    out = e.select(
        "vec_id", F.array(*[f"pc{s}" for s in range(books.shape[0])]).alias("codes"),
        F.round(score, 6).alias("pqdist"),
    ).collect()
    return {r["vec_id"]: (list(r["codes"]), r["pqdist"]) for r in out}


def _numpy_codes_scores(x, books, q):
    m, k, dsub = books.shape
    tables = adc_tables(books, q)
    out = {}
    for i, v in enumerate(x):
        codes, score = [], 0.0
        for s in range(m):
            sub = v[s * dsub : (s + 1) * dsub]
            d = ((sub[None, :] - books[s]) ** 2).sum(axis=1)
            c = int(d.argmin())  # first min, same tie rule as array_position
            codes.append(c + 1)  # 1-based like array_position
            score += tables[s][c]
        out[i] = (codes, round(score, 6))
    return out


def test_pq_codes_and_scores_match_numpy(spark):
    x = _vectors()
    books = train_pq_codebooks()
    q = _vectors(n=1, seed=9)[0]
    got = _spark_codes_scores(spark, x, books, q)
    want = _numpy_codes_scores(x, books, q)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0], f"codes differ for {i}"
        assert abs(got[i][1] - want[i][1]) < 1e-6, f"score differs for {i}"


def test_pq_recall_against_exact(spark):
    # clustered corpus (the regime PQ exists for): 20 centers, tight noise,
    # query near one center — true neighbors share the query's cluster. On
    # i.i.d. random unit vectors every quantizer collapses (distances
    # concentrate), so recall there is meaningless.
    rng = np.random.default_rng(21)
    centers = rng.normal(size=(20, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    idx = rng.integers(0, 20, size=500)
    x = centers[idx] + rng.normal(scale=0.03, size=(500, 64))
    x = np.round(x / np.linalg.norm(x, axis=1, keepdims=True), 6)
    q = centers[7] + rng.normal(scale=0.03, size=64)
    q = np.round(q / np.linalg.norm(q), 6)

    books = train_pq_codebooks()
    scores = _numpy_codes_scores(x, books, q)
    ranked = sorted(scores, key=lambda i: (scores[i][1], i))
    pq_top, pq_top20 = ranked[:10], ranked[:20]
    exact = ((x - q[None, :]) ** 2).sum(axis=1)
    exact_top = list(map(int, np.lexsort((np.arange(len(x)), exact))[:10]))
    # every PQ pick comes from the query's cluster (no wrong-region hits)
    assert all(idx[i] == 7 for i in pq_top), [int(idx[i]) for i in pq_top]
    # the re-rank contract: exact top-10 fully inside the PQ top-20 — fetch
    # 2k candidates by ADC, re-score exactly, lose nothing
    assert set(exact_top) <= set(pq_top20), (exact_top, pq_top20)
    assert len(set(pq_top) & set(exact_top)) >= 3


def test_pq_code_expr_nondefault_k(spark):
    """pq_code_expr without an explicit k must follow the distance-array
    size (ADVICE r4): with a 24-subcode codebook, codes above 16 can win
    and no NULL-index struct sneaks into the argmin."""
    books = train_pq_codebooks(k=24)
    assert books.shape == (8, 24, 8)
    x = _vectors(n=50, seed=11)
    q = _vectors(n=1, seed=3)[0]
    got = _spark_codes_scores(spark, x, books, q)
    want = _numpy_codes_scores(x, books, q)
    for i in got:
        assert got[i][0] == want[i][0], f"codes differ for {i}"
    assert any(c > 16 for codes, _ in want.values() for c in codes)


def test_pq_training_deterministic():
    a = train_pq_codebooks()
    b = train_pq_codebooks()
    assert np.array_equal(a, b)
    assert a.shape == (8, 16, 8)


def test_ivf_pq_composition(spark):
    from raptor_service_spark.operators.ivf import (
        assign_ivf_lists,
        train_ivf_centroids,
    )
    from raptor_service_spark.operators.pq import ivf_pq_knn

    rng = np.random.default_rng(41)
    centers = rng.normal(size=(8, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    idx = rng.integers(0, 8, size=400)
    x = centers[idx] + rng.normal(scale=0.03, size=(400, 64))
    x = np.round(x / np.linalg.norm(x, axis=1, keepdims=True), 6)
    q = np.round(
        (centers[3] + rng.normal(scale=0.03, size=64))
        / np.linalg.norm(centers[3]), 6
    )

    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    cents = train_ivf_centroids(df, n_lists=8, seed=7)
    assigned = assign_ivf_lists(df, cents).localCheckpoint()
    books = train_pq_codebooks()

    # probe-all == plain PQ ranking over the full table (pruning is lossless
    # at nprobe=n_lists)
    full = ivf_pq_knn(assigned, cents, books, q, k=10, nprobe=8).collect()
    scores = _numpy_codes_scores(x, books, q)
    want = sorted(scores, key=lambda i: (scores[i][1], i))[:10]
    assert [r["id"] for r in full] == want
    for r in full:
        assert abs(float(r["pqdist"]) - scores[r["id"]][1]) < 1e-6

    # narrow probe must still return the query's cluster
    narrow = ivf_pq_knn(assigned, cents, books, q, k=10, nprobe=2).collect()
    assert len(narrow) == 10
    assert all(idx[r["id"]] == 3 for r in narrow)


def test_pq_codes_materialization_equivalent(spark):
    """Index-time codes + from-codes ADC == inline encode+score."""
    from pyspark.sql import functions as F

    from raptor_service_spark.operators.pq import (
        adc_score_from_codes_expr,
        pq_encode_cols,
    )

    x = _vectors(n=200, seed=61)
    books = train_pq_codebooks()
    q = _vectors(n=1, seed=62)[0]
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # "index time": materialize codes, drop the vectors
    coded = e.select(
        "vec_id", pq_encode_cols(books, "embedding").alias("codes")
    ).localCheckpoint()
    assert dict(coded.dtypes)["codes"] == "array<int>"

    # "query time": score from codes only
    tables = adc_tables(books, q)
    got = {
        r["vec_id"]: r["pqdist"]
        for r in coded.select(
            "vec_id",
            F.round(F.expr(adc_score_from_codes_expr(tables, "codes")), 6).alias(
                "pqdist"
            ),
        ).collect()
    }
    want = {i: s for i, (_, s) in _numpy_codes_scores(x, books, q).items()}
    assert got.keys() == want.keys()
    for i in got:
        assert abs(float(got[i]) - want[i]) < 1e-6
