"""Jaro-Winkler kernel: pinned bit-exact to DuckDB's built-in
jaro_winkler_similarity (vendored rapidfuzz) — the independent oracle the
jw_title_pairs query relies on. The pinned conventions (UTF-8 bytes,
integer-halved transpositions, boost only when jaro > 0.7) are each
exercised by a dedicated case below plus a random fuzz sweep."""

import random

import duckdb
import numpy as np

from raptor_service_spark.operators.stringsim import jw_batch


def _duck(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)", [(i, a, b) for i, (a, b) in enumerate(pairs)]
    )
    return np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT jaro_winkler_similarity(a,b) FROM t ORDER BY i"
            ).fetchall()
        ]
    )


def _mine(pairs):
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    return jw_batch(a, b)


def test_jw_pinned_conventions():
    pairs = [
        ("martha", "marhta"),  # textbook: 1 transposition, prefix boost 3
        ("dwayne", "duane"),
        ("same", "same"),
        ("a", "b"),
        ("ab", "ba"),  # window 0 -> no matches at all
        ("abcdef", "abzzzz"),  # jaro <= 0.7 -> NO winkler boost
        ("crate", "trace"),
        ("jones", "johnson"),
        ("日本語", "日本誤"),  # multibyte: matching runs over UTF-8 BYTES
        ("éé", "ée"),
        ("hash join", "part window agg"),  # integer-halved transpositions
    ]
    assert np.array_equal(_mine(pairs), _duck(pairs))


def test_jw_fuzz_matches_duckdb_bit_exact():
    rng = random.Random(42)
    words = "key agg row scan slow fast table value part hash batch window".split()
    pairs = []
    for _ in range(600):
        pairs.append(
            (
                " ".join(rng.choices(words, k=rng.randint(1, 3))),
                " ".join(rng.choices(words, k=rng.randint(1, 3))),
            )
        )
    for _ in range(600):
        pairs.append(
            (
                "".join(rng.choices("abcdeé日", k=rng.randint(1, 12))),
                "".join(rng.choices("abcdeé日", k=rng.randint(1, 12))),
            )
        )
    mine, duck = _mine(pairs), _duck(pairs)
    assert np.array_equal(mine, duck)  # bit-exact, not approx


def test_jw_bounds_and_symmetry():
    rng = random.Random(7)
    pairs = [
        (
            "".join(rng.choices("abcd", k=rng.randint(1, 8))),
            "".join(rng.choices("abcd", k=rng.randint(1, 8))),
        )
        for _ in range(300)
    ]
    fwd = _mine(pairs)
    rev = _mine([(b, a) for a, b in pairs])
    assert np.array_equal(fwd, rev)
    assert (fwd >= 0).all() and (fwd <= 1).all()
    assert _mine([("xyz", "xyz")])[0] == 1.0


def test_dl_pinned_conventions():
    from raptor_service_spark.operators.stringsim import dl_batch

    pairs = [
        ("ca", "abc"),  # TRUE DL = 2 (OSA would say 3) — the pin that matters
        ("ab", "ba"),
        ("martha", "marhta"),
        ("kitten", "sitting"),
        ("日本", "本日"),  # byte-level: 4, not the codepoint answer
        ("same", "same"),
        ("", "abc"),
        ("abc", ""),
    ]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = dl_batch(a, b)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)", [(i, p[0], p[1]) for i, p in enumerate(pairs)]
    )
    want = np.array(
        [r[0] for r in con.execute(
            "SELECT damerau_levenshtein(a,b) FROM t ORDER BY i").fetchall()]
    )
    assert np.array_equal(got, want)
    assert got[0] == 2 and got[1] == 1


def test_dl_fuzz_matches_duckdb():
    from raptor_service_spark.operators.stringsim import dl_batch

    rng = random.Random(11)
    words = "key agg row scan slow fast table value part hash".split()
    pairs = []
    for _ in range(500):
        pairs.append(
            (
                " ".join(rng.choices(words, k=rng.randint(1, 3))),
                " ".join(rng.choices(words, k=rng.randint(1, 3))),
            )
        )
    for _ in range(500):
        pairs.append(
            (
                "".join(rng.choices("abcdé日", k=rng.randint(0, 10))),
                "".join(rng.choices("abcdé日", k=rng.randint(0, 10))),
            )
        )
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = dl_batch(a, b)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)", [(i, p[0], p[1]) for i, p in enumerate(pairs)]
    )
    want = np.array(
        [r[0] for r in con.execute(
            "SELECT damerau_levenshtein(a,b) FROM t ORDER BY i").fetchall()]
    )
    assert np.array_equal(got, want)
