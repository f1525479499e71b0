"""K-ring neighborhood aggregation (spatial smoothing) over grid cells.

For every occupied cell, aggregate the point counts of its Chebyshev k-ring
(the cell itself plus its <= (2k+1)^2 - 1 neighbors, longitude wrapping,
latitude clamping at the poles) — the grid analog of the reference's
sibling-cluster context expansion (services/core/build_tree_service.py
summarizes each cluster together with its neighbors' members via GMM
multi-membership, utils/cluster.py:45-53).

Everything stays in whole-stage codegen: the k-ring is a literal (dx, dy)
array exploded JVM-side — no Python, no UDF. Scale shape at 100 TB:

  * one map-side-combinable ``groupBy(cell).count()`` over the points — the
    only shuffle that sees point rows;
  * the ring expansion multiplies the OCCUPIED-CELL table (not the points)
    by (2k+1)^2, then one self-equi-join on cell id and one final agg —
    all three stages operate on O(occupied cells) rows.

The identical +/%/floor arithmetic runs in the DuckDB oracle
(kring_neighbor_sql below), so the operator is value-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import RES_MULTIPLIER, cell_encode_col


def _offsets(k: int) -> list[tuple[int, int]]:
    return [(dx, dy) for dy in range(-k, k + 1) for dx in range(-k, k + 1)]


def kring_neighbor_col(
    cell: F.Column | str,
    res: int,
    dx: int | F.Column,
    dy: int | F.Column,
) -> F.Column:
    """Neighbor cell id at offset (dx, dy); NULL when clamped off the poles.

    Pure +/%/floor on the packed id (no bitwise ops) so the same formula is
    expressible in the oracle SQL.  ``dx``/``dy`` may be Columns: for large
    rings, explode a CONSTANTS-ONLY (dx, dy) array first and compute this
    expression once on the exploded rows — building the ring as an array of
    per-offset neighbor expressions duplicates the decode arithmetic
    (2k+1)² times and at k >= 3 the generated Generate method crosses the
    JVM 64 KB limit (Janino fallback, BENCH_r03; see ring_offsets_explode).
    """
    if isinstance(cell, str):
        cell = F.col(cell)
    dxc = dx if isinstance(dx, F.Column) else F.lit(dx)
    dyc = dy if isinstance(dy, F.Column) else F.lit(dy)
    n = 2**res
    rem = cell - F.lit(res * RES_MULTIPLIER)
    y = F.floor(rem / F.lit(n)).cast("long")
    x = (rem - y * F.lit(n)).cast("long")
    xx = ((x + dxc) % F.lit(n) + F.lit(n)) % F.lit(n)  # lng wrap
    yy = y + dyc
    nbr = (F.lit(res * RES_MULTIPLIER) + yy * F.lit(n) + xx).cast("long")
    return F.when((yy >= 0) & (yy < n), nbr)  # lat clamp -> NULL


def ring_offsets_explode(offsets: list[tuple[int, int]]) -> F.Column:
    """Codegen-size-safe ring fan-out: ``F.explode`` of a CONSTANTS-ONLY
    (dx, dy) struct array.  Pair with ``kring_neighbor_col(cell, res,
    col("o.dx"), col("o.dy"))`` AFTER the explode so the cell decode
    arithmetic is generated exactly once, independent of ring size — the
    per-element-expression form blew the 64 KB JVM method limit at k >= 3
    (pair_correlation k=4, cross_variogram k=3; BENCH_r03 Janino tail).
    Row counts and values are identical to the per-element form."""
    return F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in offsets
            ]
        )
    )


def kring_smooth(
    points: DataFrame,
    res: int,
    k: int = 1,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Per occupied cell: own count + summed k-ring count + occupied-ring size.

    Output: (cell, n_points, ring_points, n_ring_cells) — ring figures
    include the center cell itself.
    """
    cnt = points.groupBy(
        cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell")
    ).agg(F.count(F.lit(1)).alias("n_points"))

    nbrs = F.array_distinct(
        F.array(*[kring_neighbor_col("cell", res, dx, dy) for dx, dy in _offsets(k)])
    )
    pairs = cnt.select(
        "cell",
        "n_points",
        F.explode(F.filter(nbrs, lambda c: c.isNotNull())).alias("nbr"),
    )
    ring = pairs.join(
        cnt.select(F.col("cell").alias("nbr"), F.col("n_points").alias("nbr_points")),
        "nbr",
        "left",
    )
    return ring.groupBy("cell").agg(
        F.max("n_points").alias("n_points"),
        F.sum(F.coalesce("nbr_points", F.lit(0))).alias("ring_points"),
        F.count("nbr_points").alias("n_ring_cells"),
    )


def boundary_cells(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Raster morphology (edge extraction): classify every occupied cell as
    boundary or interior of the occupied region. Interior = all 8 Chebyshev
    neighbors exist (not clamped off the poles) and are occupied; anything
    less is boundary — the region outline a tile renderer draws.

    Same scale shape as kring_smooth: one point shuffle into the occupancy
    count, then the 8× ring explode and the self-join operate on the
    O(occupied cells) table only. Assumes res >= 2 so the 8 ring offsets
    are distinct cells (at res 1 longitude wrap aliases them).

    Output: (cell, n_points, n_occ_nbrs, is_boundary).
    """
    occ = points.groupBy(
        cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell")
    ).agg(F.count(F.lit(1)).alias("n_points"))

    ring = [(dx, dy) for dx, dy in _offsets(1) if (dx, dy) != (0, 0)]
    nbrs = F.filter(
        F.array(*[kring_neighbor_col("cell", res, dx, dy) for dx, dy in ring]),
        lambda c: c.isNotNull(),
    )
    pairs = occ.select("cell", "n_points", F.explode(nbrs).alias("nbr"))
    hits = pairs.join(
        occ.select(F.col("cell").alias("nbr"), F.lit(1).alias("occ_nbr")),
        "nbr",
        "left",
    )
    return hits.groupBy("cell").agg(
        F.max("n_points").alias("n_points"),
        F.count("occ_nbr").alias("n_occ_nbrs"),
        (F.count("occ_nbr") < 8).alias("is_boundary"),
    )


def kring_neighbor_sql(cell_expr: str, res: int, dx_expr: str, dy_expr: str) -> str:
    """DuckDB fragment mirroring kring_neighbor_col (NULL when off-pole)."""
    n = 2**res
    base = res * RES_MULTIPLIER
    rem = f"({cell_expr} - {base})"
    y = f"CAST(FLOOR({rem} / {n}) AS BIGINT)"
    x = f"({rem} - {y} * {n})"
    xx = f"((({x} + {dx_expr}) % {n} + {n}) % {n})"
    yy = f"({y} + {dy_expr})"
    return (
        f"CASE WHEN {yy} >= 0 AND {yy} < {n} "
        f"THEN CAST({base} + {yy} * {n} + {xx} AS BIGINT) END"
    )


# Sobel weights for offset (dx, dy): wx = dx·(2−|dy|), wy = dy·(2−|dx|) —
# the classic 3×3 edge kernel with x pointing east (lng+) and y north (lat+).
_SOBEL = [
    (dx, dy, dx * (2 - abs(dy)), dy * (2 - abs(dx)))
    for dx, dy in _offsets(1)
    if (dx, dy) != (0, 0)
]


def focal_gradient(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Map-algebra focal kernel: Sobel gradient of the occupancy raster —
    where does point density change fastest (the "edge detector" of a
    density surface). Unoccupied / pole-clamped neighbors contribute 0.

    All-integer end to end (gx, gy, grad2 = gx² + gy² are BIGINT), so the
    oracle comparison is EXACT. Same scale shape as kring_smooth: one
    map-side-combinable point shuffle into the occupancy count; the 8×
    weighted ring explode, self-join, and final agg all operate on the
    O(occupied cells) table.

    Output: (cell, n_points, gx, gy, grad2).
    """
    cnt = points.groupBy(
        cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell")
    ).agg(F.count(F.lit(1)).alias("n_points"))

    entries = F.array(
        *[
            F.struct(
                kring_neighbor_col("cell", res, dx, dy).alias("nbr"),
                F.lit(wx).cast("long").alias("wx"),
                F.lit(wy).cast("long").alias("wy"),
            )
            for dx, dy, wx, wy in _SOBEL
        ]
    )
    pairs = cnt.select(
        "cell",
        "n_points",
        F.explode(F.filter(entries, lambda e: e["nbr"].isNotNull())).alias("e"),
    )
    joined = pairs.join(
        cnt.select(F.col("cell").alias("nbr_cell"), F.col("n_points").alias("nn")),
        pairs["e.nbr"] == F.col("nbr_cell"),
        "left",
    )
    g = joined.groupBy("cell").agg(
        F.max("n_points").alias("n_points"),
        F.sum(F.col("e.wx") * F.coalesce("nn", F.lit(0))).alias("gx"),
        F.sum(F.col("e.wy") * F.coalesce("nn", F.lit(0))).alias("gy"),
    )
    return g.select(
        "cell",
        "n_points",
        "gx",
        "gy",
        (F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy")).alias("grad2"),
    )


def focal_gradient_sql(points_sql: str, cell_expr: str, res: int) -> str:
    """DuckDB twin of focal_gradient. ``points_sql`` yields point rows;
    ``cell_expr`` computes the res-cell id over them."""
    nbr = kring_neighbor_sql("c.cell", res, "v.dx", "v.dy")
    offs = ", ".join(f"({dx}, {dy}, {wx}, {wy})" for dx, dy, wx, wy in _SOBEL)
    return f"""
        WITH c AS (SELECT {cell_expr} AS cell, COUNT(*) AS n
                   FROM {points_sql} GROUP BY 1),
        p AS (SELECT c.cell, c.n, v.wx, v.wy, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) v(dx, dy, wx, wy)
              WHERE {nbr} IS NOT NULL),
        j AS (SELECT p.cell, p.n, p.wx, p.wy, COALESCE(c2.n, 0) AS nn
              FROM p LEFT JOIN c c2 ON c2.cell = p.nbr),
        g AS (SELECT cell, MAX(n) AS n_points,
                     CAST(SUM(wx * nn) AS BIGINT) AS gx,
                     CAST(SUM(wy * nn) AS BIGINT) AS gy
              FROM j GROUP BY 1)
        SELECT cell, n_points, gx, gy, gx * gx + gy * gy AS grad2 FROM g
    """
