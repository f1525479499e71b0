"""Geohash encode as shared Spark/DuckDB arithmetic + string ops.

Geohash (public domain, Niemeyer 2008) is THE interoperable string geo-key:
prefix truncation = spatial containment, so a `LIKE 'u4pr%'` predicate is a
bbox scan and a geohash-sorted layout prunes like any space-filling curve.

The binary-subdivision definition is equivalent to: quantize lng and lat to
``5·chars/2`` bits each (lng gets the extra bit when chars is odd — here we
stick to even ``chars`` so both get ``5·chars/2``), bit-interleave with the
FIRST (most significant) bit taken from longitude, then emit 5-bit groups
through the base32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``. The
interleave reuses `_morton-style` pure +,*,floor,% arithmetic (no bitwise
ops — identical semantics in Spark SQL and DuckDB); character extraction is
``SUBSTRING(alphabet, 1 + FLOOR(code / 32^k) % 32, 1)``, 1-based in both
engines. One expression string, parity by construction.

Scale shape: a pure codegen Project — zero shuffles; downstream prefix aggs
are ordinary partial+final hash aggregates.
"""

from __future__ import annotations

_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(lat: str, lng: str, chars: int = 6) -> str:
    """Expression-string recipe for the ``chars``-character geohash of
    (lat, lng) degree expressions: returns ``(concat, xl, yl, code)`` where
    ``concat`` reads columns named ``gh_code`` (and the quantizers read the
    caller's materialized ``xq``/``yq``) — callers materialize the three
    intermediates as columns/CTEs (each is referenced many times; textual
    inlining would explode the expression tree). ``chars`` must be even
    (each axis then gets exactly 5·chars/2 bits)."""
    if chars % 2 != 0 or not (2 <= chars <= 12):
        raise ValueError("chars must be even, in [2, 12]")
    bits = 5 * chars // 2
    n = 1 << bits
    # quantize; clamp the +90/+180 upper edge into the last cell
    xl = f"LEAST(CAST(FLOOR((({lng}) + 180.0) / 360.0 * {n}) AS BIGINT), {n - 1})"
    yl = f"LEAST(CAST(FLOOR((({lat}) + 90.0) / 180.0 * {n}) AS BIGINT), {n - 1})"
    # interleave: lng bit b -> position 2b+1, lat bit b -> position 2b
    # (positions count from the LSB; the top position is the code's MSB,
    # which geohash takes from longitude).
    terms = [
        f"((CAST(FLOOR(xq / {2 ** b}) AS BIGINT) % 2) * {2 * 4 ** b} "
        f"+ (CAST(FLOOR(yq / {2 ** b}) AS BIGINT) % 2) * {4 ** b})"
        for b in range(bits)
    ]
    code = "(" + " + ".join(terms) + ")"
    ch = [
        f"SUBSTRING('{_ALPHABET}', "
        f"CAST(1 + (CAST(FLOOR(gh_code / {32 ** (chars - 1 - i)}) AS BIGINT) % 32) AS INT), 1)"
        for i in range(chars)
    ]
    concat = "CONCAT(" + ", ".join(ch) + ")"
    return concat, xl, yl, code


def geohash_withcolumn(df, lat_col: str, lng_col: str, out: str, chars: int = 6):
    """Append string column ``out`` = geohash of (lat_col, lng_col).
    Intermediates (xq, yq, gh_code) are materialized columns so Catalyst
    sees flat Projects."""
    from pyspark.sql import functions as F

    concat, xl, yl, code = geohash_sql(lat_col, lng_col, chars)
    return (
        df.withColumn("xq", F.expr(xl))
        .withColumn("yq", F.expr(yl))
        .withColumn("gh_code", F.expr(code))
        .withColumn(out, F.expr(concat))
        .drop("xq", "yq", "gh_code")
    )


def geohash_cte_sql(src_sql: str, lat: str, lng: str, out: str, chars: int = 6) -> str:
    """DuckDB CTE chain ending in ``gh`` = src columns + the geohash
    column ``out``. ``lat``/``lng`` are expressions over ``src_sql``."""
    concat, xl, yl, code = geohash_sql(lat, lng, chars)
    return (
        f"ghq AS (SELECT *, {xl} AS xq, {yl} AS yq FROM {src_sql}),\n"
        f"ghc AS (SELECT *, {code} AS gh_code FROM ghq),\n"
        f"gh AS (SELECT * EXCLUDE (xq, yq, gh_code), {concat} AS {out} FROM ghc)"
    )
