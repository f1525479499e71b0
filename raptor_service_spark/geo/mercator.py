"""Web-Mercator slippy-map tiling: XYZ tile encode + Bing-style quadkeys.

The engine's native grid (geo/grid.py) is an equirectangular lat/lng lattice;
map-serving stacks address tiles in Web-Mercator XYZ (z/x/y) or quadkey form
(the raster↔vector tile materialization surface of the north_star — the cells
a tile server would actually fetch). This module encodes points into that
scheme as ONE generated arithmetic string that runs verbatim as a Spark
``F.expr`` AND as the DuckDB oracle — parity by construction, the same
technique as the polygon SAT join.

Formulas (OSM slippy-map):

    xtile = floor((lng + 180) / 360 * 2^z)
    ytile = floor((1 - ln(tan(rad(lat)) + sec(rad(lat))) / pi) / 2 * 2^z)

both clamped to [0, 2^z - 1]; quadkey digit i (from z-1 down to 0) is
``2 * bit_i(y) + bit_i(x)``, concatenated most-significant first (Bing tile
system). The ytile fraction is rounded to 6 dp BEFORE the floor on both
engines, so a libm last-ulp disagreement between the JVM and DuckDB's C
runtime cannot flip a tile assignment (inputs on the datagen 0.05° lattice
sit far from 6-dp tile edges; latitudes are within the Mercator ±85.05113°
domain by construction).

Scale shape: pure codegen arithmetic — encode adds zero shuffles; the
per-quadkey rollup is one partial+final hash agg. At 10^12 rows the quadkey
string itself is the only width cost, so the rollup groups on the BIGINT
(x, y) pair and renders the quadkey string after aggregation (cheap: one
string build per OUTPUT group, not per input row).
"""

from __future__ import annotations


def xtile_sql(lng: str, z: int) -> str:
    """Slippy-map x tile index (BIGINT) — valid in Spark SQL and DuckDB."""
    n = 1 << z
    raw = f"FLOOR(ROUND((({lng}) + 180.0) / 360.0 * {n}, 6))"
    return f"CAST(LEAST({n - 1}, GREATEST(0, {raw})) AS BIGINT)"


def ytile_sql(lat: str, z: int) -> str:
    """Slippy-map y tile index (BIGINT) — valid in Spark SQL and DuckDB."""
    n = 1 << z
    frac = (
        f"(1.0 - LN(TAN(RADIANS({lat})) + 1.0 / COS(RADIANS({lat}))) / PI()) / 2.0"
    )
    raw = f"FLOOR(ROUND(({frac}) * {n}, 6))"
    return f"CAST(LEAST({n - 1}, GREATEST(0, {raw})) AS BIGINT)"


def quadkey_sql(x: str, y: str, z: int) -> str:
    """Quadkey string of an (x, y) tile at zoom z — Bing digit interleave.

    ``x``/``y`` must be BIGINT tile-index expressions (column references are
    fine). Digit order is most-significant (coarsest) first.
    """
    digits = []
    for i in range(z - 1, -1, -1):
        p = 1 << i
        bx = f"(CAST(FLOOR(({x}) / {p}) AS BIGINT) % 2)"
        by = f"(CAST(FLOOR(({y}) / {p}) AS BIGINT) % 2)"
        digits.append(f"CAST({by} * 2 + {bx} AS STRING)")
    return "CONCAT(" + ", ".join(digits) + ")"


def quadkey_parent_sql(qk: str, levels: int = 1) -> str:
    """Parent quadkey = prefix truncation (the H3 cell_parent analog)."""
    return f"SUBSTRING({qk}, 1, GREATEST(0, LENGTH({qk}) - {levels}))"
