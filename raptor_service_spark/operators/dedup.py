"""Deduplication suite for training-data pipelines (graft brief, first-class).

Exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — all as DataFrame programs whose hot paths are
JVM-side expressions (md5 / array ops in whole-stage codegen).

Oracle-parity trick: every hash primitive is built from ``md5`` over
explicitly-constructed strings, and MinHash takes the LEXICOGRAPHIC MIN of the
band-prefixed md5 hex — md5 exists identically in Spark and DuckDB, so the
engine and the SQL oracle produce bit-identical signatures, candidates, and
scores (rounded to 6 dp only to absorb float fold-order in cosine/jaccard
division).

Scale shape:
  * exact dedup: one hash-aggregate (partial+final, AQE-coalesced).
  * MinHash LSH: signatures computed per row (no shuffle), candidate
    generation via posexplode(bands) + self-equi-join on (band, minhash) —
    shuffle carries (doc, band) pairs, never the O(n^2) cross product; exact
    Jaccard verified only for bucket-collision candidates.
  * embedding near-dup: exact variant for parity; the scale path buckets by
    the kNN projection cell (operators/knn.with_projected_cell) first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from raptor_service_spark.functions.text import fingerprint, fingerprint_sql

# ---------------------------------------------------------------------------
# shared shingle / signature expressions (Spark Column + DuckDB SQL fragment)
# ---------------------------------------------------------------------------


def words_col(text):
    return F.split(F.lower(F.trim(text)), r"\s+")


def words_sql(expr: str) -> str:
    return f"regexp_split_to_array(lower(trim({expr})), '\\s+')"


def shingles_sql(expr: str, k: int = 3) -> str:
    w = words_sql(expr)
    grams = (
        f"list_transform(generate_series(1, len({w}) - {k} + 1), "
        f"i -> array_to_string(list_slice({w}, i, i + {k} - 1), ' '))"
    )
    return (
        f"CASE WHEN len({w}) >= {k} THEN list_distinct({grams}) "
        f"ELSE [array_to_string({w}, ' ')] END"
    )


_CHUNKS_PER_MD5 = 4  # 32 hex chars -> four 8-hex band hashes per md5 call


def minhash_sig_sql(shingles_expr: str, bands: int = 16) -> str:
    assert bands % _CHUNKS_PER_MD5 == 0
    mins = []
    for g in range(bands // _CHUNKS_PER_MD5):
        hashed = f"list_transform({shingles_expr}, s -> md5('{g}|' || s))"
        for c in range(_CHUNKS_PER_MD5):
            b = g * _CHUNKS_PER_MD5 + c
            mins.append(
                f"'{b:02d}|' || "
                f"list_min(list_transform({hashed}, h -> substring(h, {c * 8 + 1}, 8)))"
            )
    return "[" + ", ".join(mins) + "]"


def shingle_rows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, g) shingle stream, fully relational (WITH duplicate grams).

    split -> posexplode -> lead() window -> concat_ws, plus the whole-text
    fallback for docs shorter than k words — once deduplicated, the codegen
    twin of the oracle's distinct-array semantics (``shingles_sql``). An
    interpreted slice/concat array HOF measured ~5x slower per use here and
    was re-evaluated for every consumer. The window shuffle is on ``id``;
    the signature groupBy(id) downstream reuses that partitioning.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select(F.col(id_col).alias("id"), words.alias("ws"))
    ex = base.select("id", F.size("ws").alias("n"), F.posexplode("ws").alias("pos", "w"))
    win = Window.partitionBy("id").orderBy("pos")
    cur = ex
    parts = [F.col("w")]
    for j in range(1, k):
        cur = cur.withColumn(f"w{j}", F.lead("w", j).over(win))
        parts.append(F.col(f"w{j}"))
    grams = cur.filter(F.col("pos") <= F.col("n") - k).select(
        "id", F.concat_ws(" ", *parts).alias("g")
    )
    short = base.filter(F.size("ws") < k).select(
        "id", F.concat_ws(" ", "ws").alias("g")
    )
    return grams.unionByName(short)


def distinct_shingle_rows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    return shingle_rows(docs, text_col, id_col, k).dropDuplicates(["id", "g"])


def _array_jaccard(cand: DataFrame, dg: DataFrame, threshold: float) -> DataFrame:
    """Exact jaccard for candidate pairs from DISTINCT shingle rows ``dg``:
    per-doc gram arrays via one collect_list, so the verification join
    carries ONE row per doc side (auto-broadcast when the doc table is
    small; a per-GRAM join would carry |sh|x the rows), then codegen
    array_intersect / array_union set ops. A doc's gram array is bounded by
    its own length — never corpus-sized."""
    sh = dg.groupBy("id").agg(F.collect_list("g").alias("sh"))
    return (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )


def jaccard_col(a, b):
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def jaccard_sql(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    return f"(CAST({inter} AS DOUBLE) / (len({a}) + len({b}) - {inter}))"


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document fingerprinting, the MOSS
# scheme: char k-gram hashes -> min per sliding window -> distinct set)
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 6,
) -> DataFrame:
    """(id, fp) DISTINCT winnowing fingerprints per document.

    Definition (shared verbatim by the SQL twin): normalize text (lower,
    trim, collapse whitespace), hash every char k-gram (first 8 md5 hex
    chars as an int), then keep the DISTINCT minima of every FULL window of
    ``w`` consecutive gram hashes; a doc with fewer than ``w`` grams
    contributes the single min over all of them. Guarantees of winnowing:
    any shared substring of length >= k + w - 1 yields a shared
    fingerprint, and at least one gram in every window is selected — the
    standard local document-fingerprinting scheme. Fully relational:
    explode positions, one window-min per doc, one distinct.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = docs.select(F.col(id_col).alias("id"), norm.alias("t"))
    pos = base.select(
        "id",
        "t",
        (F.length("t") - F.lit(k) + F.lit(1)).alias("n_grams"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.lit(0), F.length("t") - F.lit(k)))
        ).alias("pos"),
    )
    hashed = pos.select(
        "id",
        "n_grams",
        "pos",
        F.conv(F.substring(F.md5(F.expr(f"substring(t, pos + 1, {k})")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    sel = hashed.withColumn("fp", F.min("h").over(win)).filter(
        (F.col("pos") <= F.col("n_grams") - w) | (F.col("n_grams") <= w)
    )
    # short docs: one window over all grams => keep only the global min
    short = (
        sel.filter(F.col("n_grams") <= w)
        .groupBy("id")
        .agg(F.min("h").alias("fp"))
    )
    longd = sel.filter(F.col("n_grams") > w).select("id", "fp")
    return longd.unionByName(short.select("id", "fp")).dropDuplicates(["id", "fp"])


def winnow_fingerprints_sql(
    table: str, text_expr: str = "text", id_col: str = "doc_id", k: int = 8, w: int = 6
) -> str:
    return f"""
        WITH base AS (
            SELECT {id_col} AS id,
                   regexp_replace(lower(trim({text_expr})), '\\s+', ' ', 'g') AS t
            FROM {table}
        ),
        pos AS (
            SELECT id, t, length(t) - {k} + 1 AS n_grams, u.p AS pos
            FROM base, UNNEST(generate_series(0, GREATEST(0, length(t) - {k}))) u(p)
        ),
        hashed AS (
            SELECT id, n_grams, pos,
                   CAST(CAST('0x' || substr(md5(substring(t, pos + 1, {k})), 1, 8)
                        AS UBIGINT) AS BIGINT) AS h
            FROM pos
        ),
        sel AS (
            SELECT id, n_grams, pos,
                   MIN(h) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp,
                   h
            FROM hashed
        )
        SELECT DISTINCT id, fp FROM sel WHERE pos <= n_grams - {w} AND n_grams > {w}
        UNION
        SELECT id, MIN(h) AS fp FROM sel WHERE n_grams <= {w} GROUP BY id
    """


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per normalized-text fingerprint,
    keeping the smallest id (deterministic winner) + duplicate count."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_cnt"))
    )


def exact_dedup_sql(table: str, text_expr: str = "text", id_col: str = "doc_id") -> str:
    return (
        f"SELECT {fingerprint_sql(text_expr)} AS fp, MIN({id_col}) AS keeper_id, "
        f"COUNT(*) AS dup_cnt FROM {table} GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    ``shingles``: optionally a prebuilt (id, g) stream (shingle_rows
    output, duplicates included) — lets a pipeline running several
    shingle consumers derive/persist the stream ONCE (the 100 TB
    materialize-the-shingle-table pattern; the bench does this).

    Candidates = docs sharing >= 1 MinHash band bucket (equi-join on
    (band, minhash), NOT a cross join); exact shingle Jaccard verifies.
    With 1-row bands the miss probability for j >= 0.8 is (1-j)^bands
    (~7e-12 at bands=16) — the SQL oracle replicates the same candidacy
    predicate so results match exactly.
    """
    assert bands % _CHUNKS_PER_MD5 == 0
    # The relational gram stream feeds MIN aggregates directly (duplicate
    # grams cannot change a MIN); exact-jaccard verification runs on
    # per-doc gram arrays (_array_jaccard). No persist needed: every
    # consumer of the shingle projection is codegen-cheap.
    ex = shingles if shingles is not None else shingle_rows(docs, text_col, id_col, k)
    aggs = []
    for g in range(bands // _CHUNKS_PER_MD5):
        h = F.md5(F.concat(F.lit(f"{g}|"), F.col("g")))
        for c in range(_CHUNKS_PER_MD5):
            aggs.append(
                F.min(F.substring(h, c * 8 + 1, 8)).alias(f"h{g * _CHUNKS_PER_MD5 + c}")
            )
    wide = ex.groupBy("id").agg(*aggs)
    buckets = wide.select(
        "id", F.posexplode(F.array(*[f"h{b}" for b in range(bands)])).alias("band", "h")
    )
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dg = ex.dropDuplicates(["id", "g"])
    return _array_jaccard(cand, dg, threshold)


def minhash_lsh_pairs_sql(
    table: str,
    text_expr: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.8,
) -> str:
    """DuckDB oracle: brute-force pairs with the SAME candidacy predicate
    (band-prefixed hashes make list_has_any equivalent to same-band match)."""
    sh = shingles_sql(text_expr, k)
    sig = minhash_sig_sql("sh", bands)
    jac = jaccard_sql("a.sh", "b.sh")
    return f"""
        WITH d AS (SELECT {id_col} AS id, {sh} AS sh FROM {table}),
        s AS (SELECT id, sh, {sig} AS sig FROM d)
        SELECT a.id AS doc_a, b.id AS doc_b, ROUND({jac}, 6) AS jaccard
        FROM s a JOIN s b ON a.id < b.id
        WHERE list_has_any(a.sig, b.sig) AND ROUND({jac}, 6) >= {threshold}
    """


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join with prefix-filtered candidates.

    ``shingles``: optional prebuilt (id, g) stream shared across consumers
    (deduplicated here).

    Prefix filtering (Bayardo et al., "Scaling Up All Pairs Similarity
    Search"): order shingles globally by ascending document frequency (rare
    first, tie-break on the shingle string) and index only each doc's first
    ``|sh| - ceil(t'^2 * |sh|) + 1`` shingles; any pair with jaccard >= t'
    must share an indexed-prefix shingle, so the join stays EXACT while a
    stop-shingle shared by f docs no longer creates an f^2 hot key — common
    shingles sort last and fall outside every prefix. The exponent is t'^2,
    not t' (the equal-size textbook form), because a valid partner can be as
    small as t'*|x|, which lowers the guaranteed pair overlap to
    ceil(t'^2*|x|): for J(x,y) >= t', overlap o >= t'*max(|x|,|y|) >=
    t'^2*max, so prefixes of length |.| - ceil(t'^2*max) + 1 must intersect
    (smallest-common-token argument) and each per-set prefix is at least
    that long. t' carries a 1e-6 margin below ``threshold`` because the
    final filter compares jaccard ROUNDED to 6 dp (a true jaccard just
    under t can round up to t).
    """
    dg = (
        shingles.dropDuplicates(["id", "g"])
        if shingles is not None
        else distinct_shingle_rows(docs, text_col, id_col, k)
    )
    return set_jaccard_pairs(dg, threshold)


def set_jaccard_pairs(dg: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard similarity join over arbitrary (id, g) element rows.

    ``dg`` must hold DISTINCT (id, g) pairs — one row per element of each
    id's set. This is the generic core behind ngram_jaccard_pairs and the
    trajectory-similarity join (ids = users, elements = visited cells);
    candidacy and exactness arguments are in ngram_jaccard_pairs' docstring.
    """
    t_margin = threshold - 1e-6
    # One materialization of the deduplicated element stream: the frequency
    # agg, size/rank windows, prefix self-join, and verification arrays
    # would otherwise each recompute the upstream pipeline.
    # localCheckpoint (not persist) ties the cached blocks' lifetime to the
    # returned plan — the ContextCleaner frees them when the result is
    # dropped, so nothing leaks for the session lifetime.
    dg = dg.localCheckpoint(eager=False)
    sized = dg.withColumn("s", F.count("*").over(Window.partitionBy("id")))
    freq = dg.groupBy("g").agg(F.count("*").alias("df"))
    ranked = sized.join(freq, "g").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "g")),
    )
    plen = F.col("s") - F.ceil(F.lit(t_margin * t_margin) * F.col("s")) + F.lit(1)
    prefix = ranked.filter(F.col("rn") <= plen).select("id", "g", "rn", "s")
    # Pair-dependent prefix test at join time (the ppjoin tightening): for
    # J >= t', the required overlap is alpha = ceil(t'/(1+t')*(sa+sb)), and
    # the globally-smallest shared gram must sit within BOTH docs' prefixes
    # of length s - alpha + 1. Joining on the static prefix (a superset;
    # alpha >= ceil(t'^2*s) given the size filter) and filtering on the
    # positional + size conditions keeps exactness while cutting candidate
    # pairs by an order of magnitude on similar-vocabulary corpora.
    sa, sb = F.col("a.s"), F.col("b.s")
    alpha = F.ceil(F.lit(t_margin / (1.0 + t_margin)) * (sa + sb))
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id"))
            & (sb >= F.lit(t_margin) * sa)
            & (sa >= F.lit(t_margin) * sb)
            & (F.col("a.rn") <= sa - alpha + 1)
            & (F.col("b.rn") <= sb - alpha + 1),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _array_jaccard(cand, dg, threshold)


def set_containment_pairs(
    dg: DataFrame, threshold: float = 0.6, min_size: int = 5
) -> DataFrame:
    """Exact ASYMMETRIC containment join over DISTINCT (id, g) element rows:
    ordered pairs (a, b), a != b, with C(a→b) = |Sa ∩ Sb| / |Sa| >= t and
    |Sa| >= min_size — the quote/subset-detection primitive Jaccard misses
    (a short doc fully embedded in a long one has low Jaccard but
    containment 1.0).

    Candidate generation is the one-sided prefix filter: order grams by
    ascending global document frequency (rare first, tie on gram) and index
    only each CONTAINED side's first |Sa| - ceil(t'·|Sa|) + 1 grams; if
    C >= t' then the overlap o >= ceil(t'·|Sa|) cannot avoid that prefix
    (pigeonhole), so joining a-prefix grams against the FULL stream of b is
    exact. The b side carries every gram, but the a-prefix side excludes
    the corpus-common grams (they sort last), so a stop-gram shared by f
    docs contributes prefix_count(g)·f candidate rows, never f². The size
    filter |Sb| >= ceil(t'·|Sa|) prunes partners too small to hold the
    required overlap. Verification mirrors _array_jaccard: one gram array
    per doc, codegen array_intersect. t' carries the 1e-6 rounding margin
    (6-dp final compare), the set_jaccard_pairs convention."""
    t_margin = threshold - 1e-6
    dg = dg.localCheckpoint(eager=False)
    sized = dg.withColumn("s", F.count("*").over(Window.partitionBy("id")))
    freq = dg.groupBy("g").agg(F.count("*").alias("df"))
    ranked = sized.join(freq, "g").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "g")),
    )
    plen = F.col("s") - F.ceil(F.lit(t_margin) * F.col("s")) + F.lit(1)
    prefix = ranked.filter(
        (F.col("rn") <= plen) & (F.col("s") >= min_size)
    ).select("id", "g", "s")
    full = sized.select("id", "g", "s")
    cand = (
        prefix.alias("a")
        .join(
            full.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.col("b.s") >= F.ceil(F.lit(t_margin) * F.col("a.s"))),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = dg.groupBy("id").agg(F.collect_list("g").alias("sh"))
    return (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"
        )
        .withColumn(
            "containment",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size("sh_a"),
                6,
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "containment"
        )
    )


def containment_pairs_sql(
    table: str,
    text_expr: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
    min_size: int = 5,
) -> str:
    """Brute-force DuckDB twin of set_containment_pairs (ordered pairs)."""
    sh = shingles_sql(text_expr, k)
    inter = "len(list_intersect(a.sh, b.sh))"
    return f"""
        WITH d AS (SELECT {id_col} AS id, {sh} AS sh FROM {table})
        SELECT a.id AS doc_a, b.id AS doc_b,
               ROUND(CAST({inter} AS DOUBLE) / len(a.sh), 6) AS containment
        FROM d a JOIN d b ON a.id != b.id
        WHERE len(a.sh) >= {min_size}
          AND ROUND(CAST({inter} AS DOUBLE) / len(a.sh), 6) >= {threshold}
    """


def ngram_jaccard_pairs_sql(
    table: str, text_expr: str = "text", id_col: str = "doc_id",
    k: int = 3, threshold: float = 0.5,
) -> str:
    sh = shingles_sql(text_expr, k)
    jac = jaccard_sql("a.sh", "b.sh")
    return f"""
        WITH d AS (SELECT {id_col} AS id, {sh} AS sh FROM {table})
        SELECT a.id AS doc_a, b.id AS doc_b, ROUND({jac}, 6) AS jaccard
        FROM d a JOIN d b ON a.id < b.id
        WHERE ROUND({jac}, 6) >= {threshold}
    """


# ---------------------------------------------------------------------------
# SimHash (64-bit) — hamming-band LSH, with a brute-force DuckDB oracle
# (the LSH candidacy is exact by pigeonhole, so outputs match the oracle's
# all-pairs hamming filter row-for-row).
# ---------------------------------------------------------------------------


def simhash_pairs_sql(
    table: str,
    text_expr: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> str:
    """Brute-force DuckDB twin of simhash_pairs.

    Word hash parity: the engine takes the first 8 BYTES of md5 big-endian
    (int.from_bytes(digest[:8], 'big')); DuckDB parses the same value with
    CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT). The signature is built
    from 64 per-bit sign sums (+1 when bit b of the word hash is set, else
    -1; bit b of the signature set iff the sum is positive) — identical to
    the engine's fold. Docs with zero words keep signature 0 via the left
    join. Exact, O(n^2) — oracle/parity use only."""
    # bit weights as decimal literals: DuckDB's << overflows at bit 63
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({1 << b} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
        for b in range(64)
    )
    words = (
        f"list_filter(regexp_split_to_array(lower(CAST({text_expr} AS VARCHAR)),"
        f" '\\s+'), w -> w <> '')"
    )
    return f"""
        WITH d AS (SELECT {id_col} AS id, {words} AS ws FROM {table}),
        wx AS (
            SELECT id, CAST('0x' || substr(md5(t.w), 1, 16) AS UBIGINT) AS h
            FROM d, UNNEST(ws) t(w)
        ),
        sigs AS (SELECT id, {bit_terms} AS sig FROM wx GROUP BY id),
        full_sigs AS (
            SELECT d.id, COALESCE(s.sig, CAST(0 AS UBIGINT)) AS sig
            FROM d LEFT JOIN sigs s ON d.id = s.id
        )
        SELECT a.id AS doc_a, b.id AS doc_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        FROM full_sigs a JOIN full_sigs b ON a.id < b.id
        WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


def simhash_udf():
    import hashlib

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        # Vectorized per Arrow batch: hash each DISTINCT word once, unpack
        # its 64 bits into a +/-1 row, then scatter-add rows into per-doc
        # accumulators. Matches the naive per-word fold exactly (duplicate
        # words in a doc count once per occurrence, None -> "none" token).
        n = len(texts)
        word_lists = texts.astype(str).str.lower().str.split()
        lens = word_lists.str.len().fillna(0).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        flat = np.empty(total, dtype=object)
        pos = 0
        for wl in word_lists:
            if wl:
                flat[pos : pos + len(wl)] = wl
                pos += len(wl)
        doc_of_word = np.repeat(np.arange(n, dtype=np.int64), lens)
        uniq, inv = np.unique(flat.astype("U"), return_inverse=True)
        digests = np.frombuffer(
            b"".join(hashlib.md5(w.encode()).digest()[:8] for w in uniq),
            dtype=">u8",
        )
        # (n_uniq, 64) signed bit matrix, bit b at column b (LSB-first)
        bits = (
            digests[:, None] >> np.arange(64, dtype=np.uint64)[None, :]
        ) & np.uint64(1)
        signed = np.where(bits == 1, np.int64(1), np.int64(-1))
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, doc_of_word, signed[inv])
        sig = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(sig.astype(np.int64))

    return _simhash


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    LSH for hamming distance: split 64 bits into (max_hamming+1) chunks —
    pigeonhole guarantees any pair within max_hamming shares one chunk
    exactly; candidates = chunk-equality join, verified by popcount.
    """
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    sh = docs.select(F.col(id_col).alias("id"), simhash_udf()(F.col(text_col)).alias("sig"))
    chunks = sh.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("sig", c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("key"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "sig", F.col("ck.c").alias("c"), F.col("ck.key").alias("key"))
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_neardup_exact(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine pair join (parity variant; O(n^2) — use the bucketed
    variant at scale). JVM-side fold cosine, rounded for oracle parity.

    The norms are hoisted to the per-ROW inputs (localCheckpoint so
    CollapseProject cannot push them back under the join): the norm
    expression is identical, just evaluated n times instead of n² — the
    interpreted-HOF pair work drops to the dot product alone (measured
    127 -> 55 s at sf0.1)."""
    nrm = F.sqrt(
        F.aggregate("v_", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    pre = emb.select(
        F.col(id_col).alias("id_"), F.col(vec_col).alias("v_")
    ).withColumn("n_", nrm).localCheckpoint(eager=True)
    a = pre.select(F.col("id_").alias("id_a"), F.col("v_").alias("va"), F.col("n_").alias("na"))
    b = pre.select(F.col("id_").alias("id_b"), F.col("v_").alias("vb"), F.col("n_").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_neardup_exact_sql(
    table: str, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.95
) -> str:
    da = f"list_transform(a.{vec_col}, x -> CAST(x AS DOUBLE))"
    db = f"list_transform(b.{vec_col}, x -> CAST(x AS DOUBLE))"
    cos = f"list_cosine_similarity({da}, {db})"  # upcast: DuckDB computes FLOAT[] cosine in float32
    return f"""
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, ROUND({cos}, 6) AS cosine
        FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
        WHERE ROUND({cos}, 6) >= {threshold}
    """


def cosine_neardup_bucketed_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    res: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB twin of ``cosine_neardup_bucketed``: identical candidacy
    (same projection-cell bucket, via projected_cell_sql) and identical
    scoring, so the driver oracle checks the APPROXIMATE scale path exactly
    rather than rows-only."""
    from raptor_service_spark.operators.knn import projected_cell_sql

    cell = projected_cell_sql(vec_col, res, dim)
    da = f"list_transform(a.{vec_col}, x -> CAST(x AS DOUBLE))"
    db = f"list_transform(b.{vec_col}, x -> CAST(x AS DOUBLE))"
    cos = f"list_cosine_similarity({da}, {db})"
    return f"""
        WITH cellified AS (
            SELECT {id_col}, {vec_col}, {cell} AS ann_cell FROM {table}
        )
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, ROUND({cos}, 6) AS cosine
        FROM cellified a JOIN cellified b
          ON a.ann_cell = b.ann_cell AND a.{id_col} < b.{id_col}
        WHERE ROUND({cos}, 6) >= {threshold}
    """


def cosine_neardup_bucketed(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    res: int = 4,
) -> DataFrame:
    """Scale path: bucket by the deterministic projection cell first; only
    same-bucket pairs are scored (approximate: cross-bucket pairs missed —
    recall measured in tests)."""
    from raptor_service_spark.operators.knn import with_projected_cell

    cellified = with_projected_cell(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), res=res
    )
    a = cellified.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "ann_cell")
    b = cellified.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "ann_cell")
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return (
        a.join(b, ["ann_cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# near-dup clustering: connected components + canonical selection
# ---------------------------------------------------------------------------


def dedup_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair list -> (id, component).

    The step a 100 TB dedup pipeline runs AFTER MinHash/SimHash pair
    generation: pairs are transitive evidence ("A~B, B~C => keep one of
    A,B,C"), so cluster them and pick a canonical member (min id). The
    reference deletes duplicates one-at-a-time through Postgres FKs
    (/root/reference/repositories/dataset_repo_pg.py:129-148); at corpus
    scale the set-level equivalent is component labeling.

    Algorithm (round 3, upgraded from min-label propagation): alternating
    LARGE-STAR / SMALL-STAR (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — converges in O(log n) rounds on ANY
    graph shape, including the adversarial long chains where plain label
    propagation needs O(diameter) rounds (pytest-pinned on a 1000-link
    chain in tests/test_dedup.py).

      large-star(u): every neighbor v > u re-points to m = min(Γ(u) ∪ {u})
      small-star(u): (oriented u >= v) every neighbor and u re-point to m

    Each half-round is ONE shuffled groupBy over the edge list plus a
    bounded-size join back — no driver-side graph, no collect of nodes.
    At the fixed point every component is a star centered at its min id.

    ``localCheckpoint`` truncates the per-round lineage so the plan does
    not grow superlinearly (the classic iterative-DataFrame trap).
    """
    a, b = F.col(id_a), F.col(id_b)
    u, v, m = F.col("u"), F.col("v"), F.col("m")
    edges = (
        pairs.select(a.alias("u"), b.alias("v"))
        .filter(a != b)
        .distinct()
        # Materialize ONCE: without this every star round re-executes the
        # upstream pair generation (e.g. the whole MinHash pipeline).
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(u.alias("id"))
        .unionByName(edges.select(v.alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(e: DataFrame) -> DataFrame:
        nb = e.unionByName(e.select(v.alias("u"), u.alias("v")))
        mins = nb.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            nb.join(mins, "u")
            .filter(v > u)
            .select(v.alias("u"), m.alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        o = e.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        ).distinct()
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        return (
            o.join(mins, "u")
            .select(v.alias("u"), m.alias("v"))
            .unionByName(mins.select(u, m.alias("v")))
            .filter(u != v)
            .distinct()
        )

    cur = edges
    cur_n = None  # edge count, carried across rounds (1 count job per round)
    for _ in range(max_iters):
        nxt = small_star(large_star(cur)).localCheckpoint(eager=True)
        # Exact fixed-point test, cheap form: cur and nxt are both DISTINCT
        # edge sets, so |cur| == |nxt| and nxt∖cur == ∅ imply equality —
        # one count (previous round's is cached) plus ONE subtract, and the
        # subtract only runs in rounds where the counts already agree
        # (usually just the final one). The former two-directional subtract
        # pair cost ~40% of the star loop's wall time on job overhead alone
        # (st_dbscan profile, round 4).
        if cur_n is None:
            cur_n = cur.count()
        nxt_n = nxt.count()
        converged = (
            nxt_n == cur_n and nxt.subtract(cur).limit(1).count() == 0
        )
        cur, cur_n = nxt, nxt_n
        if converged:
            break
    # at the fixed point cur is a star forest (member -> min-id root)
    return nodes.join(
        cur.select(u.alias("id"), v.alias("comp")), "id", "left"
    ).select("id", F.coalesce("comp", F.col("id")).alias("comp"))


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Canonical-member selection: every doc mapped to its cluster's min id
    (itself when it has no near-dups) plus an ``is_dup`` drop flag — the
    keep/drop verdict a training-data pipeline materializes."""
    comp = dedup_components(pairs, id_a, id_b)
    d = docs.select(id_col)
    return (
        d.join(comp, d[id_col] == comp.id, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("canonical"),
            (F.coalesce("comp", F.col(id_col)) != F.col(id_col)).alias("is_dup"),
        )
    )


def canonical_docs_sql(docs_table: str, pairs_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of canonical_docs: transitive closure via recursive CTE,
    component = MIN reachable id."""
    return f"""
        WITH RECURSIVE pr AS ({pairs_sql}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pr
            UNION SELECT doc_b, doc_a FROM pr
        ),
        reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        ),
        comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
        SELECT d.{id_col},
               COALESCE(c.comp, d.{id_col}) AS canonical,
               COALESCE(c.comp, d.{id_col}) != d.{id_col} AS is_dup
        FROM {docs_table} d LEFT JOIN comp c ON d.{id_col} = c.id
    """


# ---------------------------------------------------------------------------
# repetition ratio (duplicate n-gram fraction — the Gopher-style quality rule)
# ---------------------------------------------------------------------------


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-doc duplicate k-gram fraction: 1 - distinct/total word k-grams.

    The classic repetition quality filter for training corpora (boilerplate
    and looping generations score high). Reuses the relational shingle
    stream; count + count_distinct compile to two-phase hash aggregates on
    the same (id) shuffle key."""
    g = shingles if shingles is not None else shingle_rows(docs, text_col, id_col, k)
    return (
        g.groupBy("id")
        .agg(
            F.count("g").alias("n_grams"),
            F.countDistinct("g").alias("n_distinct"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_distinct",
            F.round(
                F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams"), 6
            ).alias("rep_ratio"),
        )
    )


def repetition_scores_sql(
    table: str, text_expr: str = "text", id_col: str = "doc_id", k: int = 3
) -> str:
    w = words_sql(text_expr)
    grams = (
        f"CASE WHEN len({w}) >= {k} THEN "
        f"list_transform(generate_series(1, len({w}) - {k} + 1), "
        f"i -> array_to_string(list_slice({w}, i, i + {k} - 1), ' ')) "
        f"ELSE [array_to_string({w}, ' ')] END"
    )
    return f"""
        WITH g AS (SELECT {id_col}, {grams} AS grams FROM {table})
        SELECT {id_col},
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
               ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
                   AS rep_ratio
        FROM g
    """


# ---------------------------------------------------------------------------
# sub-document (span-level) exact dedup with document reassembly
# ---------------------------------------------------------------------------


def span_dedup_reassemble(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet-style sub-document pass): split
    each document into fixed ``span_words``-word spans (the engine's chunk
    scheme, chunk_service.py:27 analog), md5 each span, keep only the FIRST
    occurrence of each hash corpus-wide (ordered by (doc_id, idx) — stable
    under re-runs), and reassemble every document from its surviving spans.

    Output: (doc_id, n_spans, n_kept, kept_text) — kept_text is '' when the
    whole document was already seen earlier.

    Scale shape at 100 TB: the span stream is generated JVM-side
    (sequence/slice, no Python); first-occurrence selection is ONE window
    shuffle partitioned by the span hash (each hash group holds only that
    span's duplicates — the skew bound is the duplication factor, the
    quantity being removed); reassembly is ONE groupBy(doc_id) with an
    ordered in-group sort of O(spans-per-doc) structs. No pairwise joins.
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(w)
    spans = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / span_words).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(w, i * span_words + 1, span_words)),
    )
    ex = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(spans).alias("idx", "span_text")
    ).withColumn("h", F.md5("span_text"))
    win = Window.partitionBy("h").orderBy("doc_id", "idx")
    flagged = ex.withColumn(
        "keep", (F.row_number().over(win) == 1).cast("int")
    )
    kept_struct = F.when(
        F.col("keep") == 1, F.struct(F.col("idx"), F.col("span_text"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["span_text"]
            ),
        ).alias("kept_text"),
    )


def span_dedup_sql(docs_sql: str, span_words: int = 10) -> str:
    """DuckDB twin of span_dedup_reassemble (same split scheme, same
    first-occurrence rule, ordered string_agg reassembly)."""
    return f"""
        WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
                   FROM {docs_sql}),
        sp AS (SELECT doc_id, i AS idx,
                      array_to_string(list_slice(words, i * {span_words} + 1,
                                                 i * {span_words} + {span_words}), ' ')
                        AS span_text
               FROM w, UNNEST(generate_series(0,
                    CAST(FLOOR((len(words) - 1) / {span_words}) AS BIGINT))) t(i)),
        r AS (SELECT doc_id, idx, span_text,
                     ROW_NUMBER() OVER (PARTITION BY md5(span_text)
                                        ORDER BY doc_id, idx) AS rn
              FROM sp)
        SELECT doc_id, COUNT(*) AS n_spans,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               COALESCE(string_agg(CASE WHEN rn = 1 THEN span_text END, ' '
                                   ORDER BY idx), '') AS kept_text
        FROM r GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# blocked sorted-neighborhood (SNM) dedup — the record-linkage classic
# ---------------------------------------------------------------------------


def snm_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    threshold: float = 0.6,
    block_chars: int = 8,
) -> DataFrame:
    """Blocked sorted-neighborhood near-dup join (Hernández-Stolfo SNM):
    sort records by a normalized key, compare each record only against its
    ``window`` successors in that order, verify candidates with exact
    word-set Jaccard >= threshold.

    The block = the key's first ``block_chars`` chars, so the sort + window
    run PER BLOCK (one shuffle, no single-reducer global window). Like all
    blocked SNM, a near-dup pair whose keys differ within the block prefix
    is missed — the standard multi-pass answer is a second key; here the
    MinHash/SimHash/ngram families cover that, and SNM contributes the
    cheap O(n·w) candidate pass sharing none of their hashing cost.

    Scale shape at 100 TB: ONE shuffle partitioned by block (skew bound =
    block size, itself bounded by key-prefix cardinality over the data);
    candidate count is exactly n·window rows; Jaccard verify is array
    intersect/union on the two word sets in codegen. Output: (doc_a, doc_b,
    jaccard) with doc_a < doc_b numerically when ids collide in key order,
    6-dp rounded.
    """
    key = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = docs.select(
        F.col(id_col).alias("id"),
        key.alias("k"),
        F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "ws"
        ),
    ).withColumn("blk", F.substring("k", 1, block_chars))
    w = Window.partitionBy("blk").orderBy("k", "id")
    lagged = base.select(
        "id",
        "ws",
        *[
            F.lag(F.struct("id", "ws"), off).over(w).alias(f"p{off}")
            for off in range(1, window + 1)
        ],
    )
    pairs = lagged.select(
        "id",
        "ws",
        F.explode(
            F.filter(
                F.array(*[F.col(f"p{off}") for off in range(1, window + 1)]),
                lambda s: s.isNotNull(),
            )
        ).alias("p"),
    )
    inter = F.size(F.array_intersect(F.col("ws"), F.col("p.ws")))
    union = F.size("ws") + F.size("p.ws") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        pairs.select(
            F.least(F.col("p.id"), F.col("id")).alias("doc_a"),
            F.greatest(F.col("p.id"), F.col("id")).alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def snm_pairs_sql(
    docs_sql: str,
    window: int = 3,
    threshold: float = 0.6,
    block_chars: int = 8,
) -> str:
    """DuckDB twin of snm_pairs (same key, same block, same lags)."""
    lags = ",\n                     ".join(
        f"LAG(struct_pack(id := id, ws := ws), {off}) OVER "
        f"(PARTITION BY blk ORDER BY k, id) AS p{off}"
        for off in range(1, window + 1)
    )
    branches = " UNION ALL ".join(
        f"SELECT id, ws, p{off} AS p FROM lagged WHERE p{off} IS NOT NULL"
        for off in range(1, window + 1)
    )
    jac = (
        "ROUND(CAST(len(list_intersect(ws, p.ws)) AS DOUBLE) / "
        "(len(ws) + len(p.ws) - len(list_intersect(ws, p.ws))), 6)"
    )
    return f"""
        WITH base AS (
            SELECT doc_id AS id,
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS k,
                   list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS ws
            FROM {docs_sql}),
        blocked AS (SELECT *, substr(k, 1, {block_chars}) AS blk FROM base),
        lagged AS (SELECT id, ws,
                     {lags}
                   FROM blocked),
        cand AS ({branches})
        SELECT DISTINCT LEAST(p.id, id) AS doc_a, GREATEST(p.id, id) AS doc_b,
               {jac} AS jaccard
        FROM cand
        WHERE {jac} >= CAST({threshold!r} AS DOUBLE)
    """


# ---------------------------------------------------------------------------
# PassJoin: exact string-similarity join under edit distance
# ---------------------------------------------------------------------------


def passjoin_pairs(
    docs: DataFrame,
    id_col: str = "id",
    key_col: str = "k",
    max_dist: int = 2,
) -> DataFrame:
    """Exact edit-distance similarity self-join via the PassJoin partition
    scheme (Li, Deng, Feng, "PassJoin: a partition-based method for
    similarity joins", PVLDB 5(3), 2011).

    Pigeonhole: split every string into ``p = max_dist + 1`` contiguous
    segments. If ``ed(a, b) <= max_dist``, at least one of a's segments is
    untouched by the optimal edit script, so it occurs VERBATIM in b at a
    position shifted by at most ``max_dist``. Candidates therefore need only
    an EQUI-join on (segment index, |a|, position-in-b, fragment) — never a
    cross join — and each surviving pair is verified with the exact
    ``levenshtein`` (JVM codegen). Mirrors the reference's dedup intent
    (services/ worker dedup by checksum, repositories/chunk_repo.py upsert
    keys) for the fuzzy-key case.

    Scale shape: probe side emits p*(2d+1) rows per string, index side
    (2d+1)^2*p rows — bounded constants (15 / 75 at d=2), so the shuffle
    carries O(n) rows keyed by rare fragments; no quadratic blowup unless
    the data is one giant near-duplicate class (in which case the OUTPUT is
    quadratic). All expressions (sequence/transform/substr/levenshtein) are
    whole-stage-codegen JVM; no Python.
    """
    d, p = max_dist, max_dist + 1
    base = (
        docs.select(F.col(id_col).alias("id"), F.col(key_col).alias("k"))
        .filter(F.length("k") >= p)
        .withColumn("L", F.length("k"))
    )

    def seg_start(la, i):
        return F.floor(la * i / p).cast("int")

    def seg_len(la, i):
        return (F.floor(la * (i + 1) / p) - F.floor(la * i / p)).cast("int")

    # probe: for each of a's p segments, enumerate the 2d+1 admissible
    # positions the fragment may occupy in a match
    probe = base.select(
        F.col("id").alias("id_a"),
        F.col("k").alias("k_a"),
        F.col("L").alias("la"),
        F.expr(
            f"inline(flatten(transform(sequence(0, {p - 1}), i -> "
            f"transform(sequence({-d}, {d}), s -> "
            f"struct(i as seg, s as sh)))))"
        ),
    )
    probe = (
        probe.withColumn("q0", seg_start(F.col("la"), F.col("seg")) + F.col("sh"))
        .filter(F.col("q0") >= 0)
        .select(
            "id_a",
            "k_a",
            F.concat_ws(
                "|",
                F.col("seg"),
                F.col("la"),
                F.col("q0"),
                F.col("k_a").substr(
                    seg_start(F.col("la"), F.col("seg")) + 1,
                    seg_len(F.col("la"), F.col("seg")),
                ),
            ).alias("key"),
        )
    )

    # index: for each candidate probe length la within +-d of b's own
    # length, materialize every admissible fragment of b
    idx = (
        base.select(
            F.col("id").alias("id_b"),
            F.col("k").alias("k_b"),
            F.col("L").alias("lb"),
            F.expr(
                f"inline(flatten(flatten(transform(sequence(L - {d}, L + {d}), la -> "
                f"transform(sequence(0, {p - 1}), i -> "
                f"transform(sequence({-d}, {d}), s -> "
                f"struct(la as la, i as seg, s as sh)))))))"
            ),
        )
        .withColumn("q0", seg_start(F.col("la"), F.col("seg")) + F.col("sh"))
        .withColumn("slen", seg_len(F.col("la"), F.col("seg")))
        .filter(
            (F.col("la") >= p)
            & (F.col("q0") >= 0)
            & (F.col("q0") + F.col("slen") <= F.col("lb"))
        )
    )
    idx = idx.select(
        "id_b",
        "k_b",
        F.concat_ws(
            "|",
            F.col("seg"),
            F.col("la"),
            F.col("q0"),
            F.col("k_b").substr(F.col("q0") + 1, F.col("slen")),
        ).alias("key"),
    )

    cand = (
        probe.join(idx, "key")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("k_a"))
            .otherwise(F.col("k_b"))
            .alias("ka"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("k_b"))
            .otherwise(F.col("k_a"))
            .alias("kb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("dist", F.levenshtein("ka", "kb"))
        .filter(F.col("dist") <= d)
        .select("doc_a", "doc_b", "dist")
    )


def passjoin_pairs_sql(docs_sql: str, max_dist: int = 2) -> str:
    """DuckDB oracle twin of passjoin_pairs: intentionally brute-force
    (length-banded id<id self-join + exact levenshtein) — quadratic is fine
    at oracle scale and proves the partition scheme loses no pair."""
    return f"""
        WITH t AS ({docs_sql})
        SELECT a.id AS doc_a, b.id AS doc_b,
               CAST(levenshtein(a.k, b.k) AS INT) AS dist
        FROM t a JOIN t b
          ON a.id < b.id
         AND abs(length(a.k) - length(b.k)) <= {max_dist}
        WHERE length(a.k) >= {max_dist + 1} AND length(b.k) >= {max_dist + 1}
          AND levenshtein(a.k, b.k) <= {max_dist}
    """
