"""Dedup suite vs DuckDB oracles (md5-based primitives are bit-identical)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.operators.dedup import (
    cosine_neardup_bucketed,
    cosine_neardup_exact,
    cosine_neardup_exact_sql,
    exact_dedup,
    exact_dedup_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def corpus_pd():
    rng = np.random.default_rng(77)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(60):
        n = int(rng.integers(6, 30))
        rows.append((i, " ".join(rng.choice(words, n).tolist())))
    # exact duplicates
    rows += [(1000 + i, rows[i][1]) for i in range(8)]
    # near duplicates (one word changed)
    for i in range(8, 14):
        t = rows[i][1].split()
        t[0] = "omega"
        rows.append((2000 + i, " ".join(t)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark, corpus_pd):
    df = spark.createDataFrame(corpus_pd).persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def duck(corpus_pd):
    con = duckdb.connect()
    con.register("docs", corpus_pd)
    return con


def _norm(pdf):
    return sorted(map(tuple, pdf.itertuples(index=False)))


def test_exact_dedup_matches_oracle(corpus, duck):
    got = exact_dedup(corpus).toPandas()
    exp = duck.execute(exact_dedup_sql("docs")).df()
    assert _norm(got) == _norm(exp)
    assert (got.dup_cnt >= 1).all()
    assert got.dup_cnt.sum() == corpus.count()


def test_minhash_lsh_matches_oracle(corpus, duck):
    got = minhash_lsh_pairs(corpus, threshold=0.5).toPandas()
    exp = duck.execute(minhash_lsh_pairs_sql("docs", threshold=0.5)).df()
    assert _norm(got) == _norm(exp)
    # exact dups must be found with jaccard 1.0
    exact_pairs = {(i, 1000 + i) for i in range(8)}
    found = set(zip(got.doc_a, got.doc_b))
    assert exact_pairs <= found
    assert (got[got.doc_b >= 1000].jaccard == 1.0).any()


def test_ngram_jaccard_matches_oracle(corpus, duck):
    got = ngram_jaccard_pairs(corpus, threshold=0.4).toPandas()
    exp = duck.execute(ngram_jaccard_pairs_sql("docs", threshold=0.4)).df()
    assert _norm(got) == _norm(exp)


def test_simhash_finds_exact_and_near_dups(corpus):
    got = simhash_pairs(corpus, max_hamming=3).toPandas()
    found = set(zip(got.doc_a, got.doc_b))
    assert {(i, 1000 + i) for i in range(8)} <= found  # hamming 0
    assert (got.hamming <= 3).all()
    # one-word-changed docs should be close in simhash space
    near = [(i, 2000 + i) for i in range(8, 14)]
    hits = sum(1 for p in near if p in found)
    assert hits >= 3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    df.count()
    return df


def test_cosine_neardup_exact_matches_oracle(emb, sf_dir):
    got = cosine_neardup_exact(emb, threshold=0.5).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    exp = con.execute(cosine_neardup_exact_sql("embeddings", threshold=0.5)).df()
    assert _norm(got) == _norm(exp)


def test_cosine_neardup_bucketed_subset_of_exact(emb):
    exact = cosine_neardup_exact(emb, threshold=0.5).toPandas()
    bucketed = cosine_neardup_bucketed(emb, threshold=0.5, res=3).toPandas()
    exact_set = set(zip(exact.id_a, exact.id_b))
    bucket_set = set(zip(bucketed.id_a, bucketed.id_b))
    assert bucket_set <= exact_set  # no false positives
