"""Hilbert-curve encode as generated arithmetic (shared Spark/DuckDB strings).

The z-order audit (`q_zorder_layout`) shows WHY curve-sorted layouts prune
2-D scans; the Hilbert curve is the locality-superior sibling (no Morton
"seam" jumps — every consecutive pair of codes is an adjacent cell). This
module unrolls the classic xy2d walk (Wikipedia "Hilbert curve", the
rx/ry rotate-reflect loop) into ``order`` levels of pure +,*,floor,%
CASE arithmetic — one string per level, valid verbatim in Spark SQL
(``F.expr``) AND DuckDB, so the engine and the oracle share one definition.

Per level i (s = 2^i, n = 2^order):

    rx     = floor(x / s) % 2
    ry     = floor(y / s) % 2
    quad   = ry + rx * (3 - 2 * ry)          -- == (3*rx) XOR ry for bits
    d     += s * s * quad
    if ry == 0:  (reflect when rx == 1, then swap)
        x, y = (rx == 1 ? n-1-y : y), (rx == 1 ? n-1-x : x)

Scale shape: the whole chain is a single codegen Project (order × ~6 ops per
row) — zero shuffles; the downstream layout audit is one partial+final agg.
At write time `sortWithinPartitions(hilbert_d)` is the Iceberg/Delta
OPTIMIZE-by-curve recipe, same as the z-order path.
"""

from __future__ import annotations


def _level(n: int, s: int, x: str, y: str) -> tuple[str, str, str]:
    """(quad_contribution, x_out, y_out) expression strings for one level."""
    rx = f"(CAST(FLOOR(({x}) / {s}) AS BIGINT) % 2)"
    ry = f"(CAST(FLOOR(({y}) / {s}) AS BIGINT) % 2)"
    quad = f"({ry} + {rx} * (3 - 2 * {ry}))"
    contrib = f"({s * s} * {quad})"
    x_out = (
        f"(CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - ({y}) ELSE ({y}) END) "
        f"ELSE ({x}) END)"
    )
    y_out = (
        f"(CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - ({x}) ELSE ({x}) END) "
        f"ELSE ({y}) END)"
    )
    return contrib, x_out, y_out


def hilbert_withcolumns(df, order: int, x_col: str = "x", y_col: str = "y"):
    """Append column ``hd`` = Hilbert distance of (x_col, y_col) at
    2^order × 2^order resolution. Pure codegen — the per-level CASE chain is
    materialized as intermediate columns so Catalyst sees flat projections
    (one Project, no exponential expression blowup from textual nesting)."""
    from pyspark.sql import functions as F

    n = 1 << order
    out = df.withColumn("_hx0", F.col(x_col).cast("long")).withColumn(
        "_hy0", F.col(y_col).cast("long")
    )
    parts = []
    for lvl, i in enumerate(range(order - 1, -1, -1)):
        s = 1 << i
        contrib, x_out, y_out = _level(n, s, f"_hx{lvl}", f"_hy{lvl}")
        parts.append(f"_hc{lvl}")
        out = (
            out.withColumn(f"_hc{lvl}", F.expr(contrib))
            .withColumn(f"_hx{lvl + 1}", F.expr(x_out))
            .withColumn(f"_hy{lvl + 1}", F.expr(y_out))
        )
    out = out.withColumn("hd", F.expr(" + ".join(parts)))
    drop = [c for c in out.columns if c.startswith(("_hx", "_hy", "_hc"))]
    return out.drop(*drop)


def hilbert_sql_chain(order: int, src_sql: str, x_col: str = "x", y_col: str = "y") -> str:
    """DuckDB CTE chain computing ``hd`` over ``src_sql`` (which must yield
    integer columns x_col, y_col plus any passthrough columns referenced by
    the caller via ``l{order}``). Returns the WITH body ending in a CTE named
    ``h`` that carries src columns + hd."""
    n = 1 << order
    ctes = [f"l0 AS (SELECT *, CAST({x_col} AS BIGINT) AS hx0, "
            f"CAST({y_col} AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 FROM {src_sql})"]
    for lvl, i in enumerate(range(order - 1, -1, -1)):
        s = 1 << i
        contrib, x_out, y_out = _level(n, s, f"hx{lvl}", f"hy{lvl}")
        ctes.append(
            f"l{lvl + 1} AS (SELECT *, {x_out} AS hx{lvl + 1}, "
            f"{y_out} AS hy{lvl + 1}, hd{lvl} + {contrib} AS hd{lvl + 1} FROM l{lvl})"
        )
    ctes.append(
        f"h AS (SELECT * EXCLUDE ({', '.join(f'hx{j}, hy{j}, hd{j}' for j in range(order + 1))}), "
        f"hd{order} AS hd FROM l{order})"
    )
    return ",\n".join(ctes)
