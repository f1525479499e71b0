"""BM25 scores vs an independent numpy computation; fusion determinism."""
from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from raptor_service_spark.operators.bm25 import B, K1, bm25_topk


def _bm25_ref(docs: dict[int, str], terms: list[str]) -> dict[int, float]:
    toks = {i: [w.lower() for w in t.split()] for i, t in docs.items()}
    dl = {i: len(ws) for i, ws in toks.items()}
    n = len(docs)
    avg = sum(dl.values()) / n
    out = {}
    for i, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            df = sum(1 for w2 in toks.values() if t in w2)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl[i] / avg))
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_reference_formula(spark):
    docs = {
        0: "spark shuffle join join join hash",
        1: "hash table scan",
        2: "join the the the the the the the the the table",
        3: "nothing relevant here",
        4: "join hash join",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["join", "hash"], k=10).collect()
    }
    want = _bm25_ref(docs, ["join", "hash"])
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    # tf saturation + length normalization: doc 4 (short, 2x join + hash)
    # must outrank doc 2 (long, 1x join)
    ranked = sorted(got, key=lambda i: (-got[i], i))
    assert ranked.index(4) < ranked.index(2)


def test_bm25_deterministic_tie_order(spark):
    docs = [(i, "alpha beta") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = bm25_topk(df, ["alpha"], k=3).collect()
    assert [r["doc_id"] for r in top] == [0, 1, 2]  # equal scores -> id order
