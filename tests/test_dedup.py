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


@pytest.fixture(scope="module")
def skewed_corpus_pd():
    """Heavy size skew + a stop-shingle in every doc: the adversarial shape
    for prefix filtering (sizes from 4 to ~200 words, so the equal-size
    textbook prefix bound would be insufficient)."""
    rng = np.random.default_rng(123)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(50):
        n = int(rng.choice([4, 6, 10, 30, 80, 200]))
        body = rng.choice(vocab, n).tolist()
        # stop-trigram "the quick fox" prepended everywhere
        rows.append((i, "the quick fox " + " ".join(body)))
    # scaled near-dups: doc plus a long suffix (big size ratio)
    for i in range(6):
        rows.append((3000 + i, rows[i][1] + " " + rows[i + 20][1]))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_ngram_prefix_filter_exact_under_size_skew(spark, skewed_corpus_pd):
    con = duckdb.connect()
    con.register("docs", skewed_corpus_pd)
    df = spark.createDataFrame(skewed_corpus_pd)
    for t in (0.3, 0.5, 0.7):
        got = ngram_jaccard_pairs(df, threshold=t).toPandas()
        exp = con.execute(ngram_jaccard_pairs_sql("docs", threshold=t)).df()
        assert _norm(got) == _norm(exp), f"threshold {t}"


def test_simhash_matches_naive_reference(spark, corpus_pd):
    """Pin the vectorized kernel to the per-word fold definition."""
    import hashlib

    from raptor_service_spark.operators.dedup import simhash_udf

    def naive(t):
        acc = np.zeros(64, dtype=np.int64)
        for w in str(t).lower().split():
            h = np.uint64(int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big"))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        sig = np.uint64(0)
        for b in range(64):
            if acc[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        return np.int64(sig.astype(np.int64))

    sample = corpus_pd.head(30).copy()
    sample.loc[len(sample)] = {"doc_id": 9998, "text": ""}
    sample.loc[len(sample)] = {"doc_id": 9999, "text": "  "}
    df = spark.createDataFrame(sample)
    got = (
        df.select("doc_id", simhash_udf()(F.col("text")).alias("sig"))
        .toPandas()
        .set_index("doc_id")["sig"]
    )
    for _, row in sample.iterrows():
        assert got[row.doc_id] == naive(row.text), row.doc_id


def test_winnowing_guarantee_and_oracle(spark):
    """Winnowing property: docs sharing a substring of length >= k + w - 1
    share at least one fingerprint; plus DuckDB twin parity on the corpus."""
    from raptor_service_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_fingerprints_sql,
    )

    shared = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "unrelated prefix text here " + shared),
        (3, "completely different content with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, k=8, w=6).toPandas()
    s1 = set(fp[fp.id == 1].fp)
    s2 = set(fp[fp.id == 2].fp)
    s3 = set(fp[fp.id == 3].fp)
    assert s1 & s2  # shared substring -> shared fingerprint
    assert not (s1 & s3)

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = con.execute(winnow_fingerprints_sql("docs", k=8, w=6)).df()
    assert _norm(fp) == _norm(exp)


def test_dedup_components_chain_and_singletons(spark):
    """A-B, B-C must land in ONE component (transitivity across pairs that
    never co-occur in a bucket); D-E separate; F untouched singleton."""
    from raptor_service_spark.operators.dedup import canonical_docs, dedup_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4)], "doc_a long, doc_b long"
    )
    comp = {r.id: r.comp for r in dedup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    out = {r.doc_id: (r.canonical, r.is_dup) for r in canonical_docs(docs, pairs).collect()}
    assert out[1] == (1, False) and out[2] == (1, True) and out[3] == (1, True)
    assert out[4] == (4, False) and out[5] == (4, True)
    assert out[6] == (6, False)  # singleton: canonical self, not a dup


def test_dedup_components_long_chain_converges(spark):
    """Path graph 0-1-2-...-9: diameter 9 forces multiple propagation rounds."""
    from raptor_service_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    comp = {r.id: r.comp for r in dedup_components(pairs).collect()}
    assert set(comp) == set(range(10)) and set(comp.values()) == {0}


def test_dedup_components_adversarial_chain_logarithmic(spark):
    """1000-link path graph (diameter 1000): the alternating large/small-star
    algorithm must converge within O(log n) rounds — max_iters=15 would be
    hopeless for plain min-label propagation (needs ~1000 rounds) but is
    ample for the star algorithm (Kiveris et al. SoCC'14). Also pins the
    worst-case REVERSED chain (labels flow against the edge direction)."""
    from raptor_service_spark.operators.dedup import dedup_components

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    ).coalesce(4)
    comp = {r.id: r.comp for r in dedup_components(pairs, max_iters=15).collect()}
    assert len(comp) == n + 1 and set(comp.values()) == {0}

    rev = spark.createDataFrame(
        [(n - i, n - i - 1) for i in range(n)], "doc_a long, doc_b long"
    ).coalesce(4)
    comp2 = {r.id: r.comp for r in dedup_components(rev, max_iters=15).collect()}
    assert len(comp2) == n + 1 and set(comp2.values()) == {0}


def test_repetition_scores_known_values(spark):
    from raptor_service_spark.operators.dedup import repetition_scores

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # grams: 7 total, 3 distinct
            (2, "one two three four"),  # all distinct
            (3, "xy"),  # shorter than k: single whole-text gram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_scores(docs).collect()}
    assert out[1].n_grams == 7 and out[1].n_distinct == 3
    assert abs(out[1].rep_ratio - round(1 - 3 / 7, 6)) < 1e-9
    assert out[2].rep_ratio == 0.0 and out[2].n_grams == 2
    assert out[3].n_grams == 1 and out[3].rep_ratio == 0.0


def test_asof_join_semantics(spark):
    """Inclusive <=, per-key isolation, NULL when no prior, max-tiebreak on
    equal timestamps; plan has exactly one non-broadcast exchange (the key
    window shuffle)."""
    from raptor_service_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 50), (3, 20, 100)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [
            (10, 40, 7, 1.0),   # before both left ts=50/100 for user 10
            (10, 100, 8, 2.0),  # EQUAL ts as left event 1 -> inclusive match
            (10, 100, 9, 3.0),  # same ts, larger id -> tiebreak winner
            (10, 150, 11, 4.0), # after: never matched
            (30, 10, 12, 5.0),  # other user: isolated
        ],
        "user_id long, ts long, event_id long, value double",
    )
    out = {
        r.event_id: (r.prior_event_id, r.prior_value)
        for r in asof_join(
            left, right, "user_id", "ts", ["event_id", "value"], tiebreak="event_id"
        ).collect()
    }
    assert out[1] == (9, 3.0)      # equal-ts inclusive + max event_id tiebreak
    assert out[2] == (7, 1.0)      # only the ts=40 click precedes ts=50
    assert out[3] == (None, None)  # user 20 has no right rows at all

    plan = (
        asof_join(left, right, "user_id", "ts", ["event_id", "value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1


# ---------------------------------------------------------------------------
# span-level dedup + reassembly
# ---------------------------------------------------------------------------


def test_span_dedup_drops_twin_docs_entirely(spark):
    from raptor_service_spark.operators.dedup import span_dedup_reassemble

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten alpha beta"),
            (2, "totally different words here that never repeat anywhere else"),
        ],
        "doc_id long, text string",
    )
    dup = docs.unionByName(
        docs.selectExpr("doc_id + 100 AS doc_id", "text")
    )
    out = {r["doc_id"]: r for r in span_dedup_reassemble(dup).collect()}
    assert out[1]["n_kept"] == out[1]["n_spans"] == 2
    assert out[1]["kept_text"] == (
        "one two three four five six seven eight nine ten alpha beta"
    )
    assert out[101]["n_kept"] == 0 and out[101]["kept_text"] == ""
    assert out[102]["n_kept"] == 0
    assert out[2]["n_kept"] == out[2]["n_spans"] == 1


def test_span_dedup_within_doc_repeats(spark):
    from raptor_service_spark.operators.dedup import span_dedup_reassemble

    span = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(7, f"{span} {span} {span}")], "doc_id long, text string"
    )
    out = span_dedup_reassemble(docs).collect()[0]
    assert out["n_spans"] == 3
    assert out["n_kept"] == 1
    assert out["kept_text"] == span


def test_span_dedup_keeps_first_occurrence_order(spark):
    from raptor_service_spark.operators.dedup import span_dedup_reassemble

    shared = "k l m n o p q r s t"
    docs = spark.createDataFrame(
        [
            (5, f"{shared} unique five words tail one two three four x"),
            (3, f"{shared} another completely distinct continuation words y z w v"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup_reassemble(docs).collect()}
    # doc 3 is the earlier doc_id -> it keeps the shared span, doc 5 loses it
    assert out[3]["n_kept"] == out[3]["n_spans"]
    assert out[5]["n_kept"] == out[5]["n_spans"] - 1
    assert not out[5]["kept_text"].startswith(shared)


# ---------------------------------------------------------------------------
# blocked sorted-neighborhood (SNM)
# ---------------------------------------------------------------------------


def test_snm_finds_adjacent_near_dups(spark):
    from raptor_service_spark.operators.dedup import snm_pairs

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry date elderberry fig grape"),
            (2, "apple banana cherry date elderberry fig grape"),   # exact dup
            (3, "apple banana cherry date elderberry fig zebra"),   # near dup
            (4, "zzz completely unrelated words nothing shared at"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in snm_pairs(docs, window=3, threshold=0.6).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.6 <= got[(1, 3)] < 1.0
    assert not any(4 in p for p in got)


def test_snm_candidates_bounded_by_window(spark):
    from raptor_service_spark.operators.dedup import snm_pairs

    # 5 identical docs: window=1 compares only adjacent pairs in key order,
    # so exactly 4 pairs surface (not C(5,2)=10)
    docs = spark.createDataFrame(
        [(i, "same same same same same") for i in range(5)],
        "doc_id long, text string",
    )
    out = snm_pairs(docs, window=1, threshold=0.9).collect()
    assert len(out) == 4


def test_snm_block_prefix_miss_is_documented_semantics(spark):
    from raptor_service_spark.operators.dedup import snm_pairs

    # identical tails but different FIRST words -> different blocks -> the
    # designed miss (multi-pass / hash families cover it)
    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaa shared tail words one two three four"),
            (2, "zzzzzzzzzz shared tail words one two three four"),
        ],
        "doc_id long, text string",
    )
    assert snm_pairs(docs, window=3, threshold=0.5).count() == 0


def test_passjoin_matches_bruteforce(spark):
    import itertools
    import random

    from raptor_service_spark.operators.dedup import passjoin_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, len(b) + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[len(b)]

    random.seed(17)
    vocab = ["key", "agg", "row", "scan", "slow", "fast", "tab", "a", "the"]
    strs = [" ".join(random.choice(vocab) for _ in range(3)) for _ in range(120)]
    for i in range(30):  # mutated near-dups at 1-2 edits
        s = list(strs[i])
        for _ in range(random.randint(1, 2)):
            s[random.randrange(len(s))] = random.choice("abcdxy")
        strs.append("".join(s))
    rows = [(i, s) for i, s in enumerate(strs)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = sorted(tuple(r) for r in passjoin_pairs(df, "id", "k", 2).collect())
    exp = sorted(
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 2
    )
    assert got == exp and len(exp) > 0


def test_passjoin_short_strings_excluded(spark):
    from raptor_service_spark.operators.dedup import passjoin_pairs

    df = spark.createDataFrame([(1, "ab"), (2, "ab"), (3, "abc"), (4, "abd")],
                               "id long, k string")
    got = sorted(tuple(r) for r in passjoin_pairs(df, "id", "k", 2).collect())
    # strings shorter than d+1 are filtered; abc/abd at distance 1 survive
    assert got == [(3, 4, 1)]
