"""Spatial autocorrelation statistics over grid cells: Moran's I, Getis-Ord Gi*.

The reference organizes documents into cluster levels and ranks clusters by
cohesion (services/core/build_tree_service.py:85-161 groups, then summarizes
the densest clusters first); the classic tile-grid analogs of "is density
spatially clustered, and where" are global Moran's I and the per-cell
Getis-Ord Gi* hot-spot z-score. Both are computed here over the occupied-cell
density surface with queen (Chebyshev 1-ring) contiguity weights, the same
neighbor algebra as operators/neighborhood.py.

Scale shape at 100 TB (identical for both statistics):

  * ONE shuffle sees point rows: ``groupBy(cell).count()`` with map-side
    partial aggregation;
  * global moments (n, mean, variance) are a single scalar aggregate of the
    occupied-cell table, broadcast back (one row — never a driver loop);
  * the 8x ring explode and the neighbor equi-join run on the O(occupied
    cells) table only; hot spatial regions produce at most 8 join rows per
    occupied cell, so there is no skew amplification beyond the constant;
  * everything is +/%/floor arithmetic in whole-stage codegen — no Python.

Weights: binary queen contiguity over OCCUPIED cells only (empty cells carry
no mass and are excluded from n, as in sparse-raster practice); longitude
wraps, latitude clamps at the poles (NULL neighbor, dropped).

The identical formulas run in the DuckDB oracle (morans_i_sql /
getis_gi_sql), so both statistics are value-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import cell_encode_col, cell_encode_sql
from raptor_service_spark.operators.neighborhood import (
    _offsets,
    kring_neighbor_col,
    kring_neighbor_sql,
)

_RING = [(dx, dy) for dx, dy in _offsets(1) if (dx, dy) != (0, 0)]


def _cell_counts(points: DataFrame, res: int, lat_col: str, lng_col: str) -> DataFrame:
    return points.groupBy(
        cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))


def _ring_joined(cnt: DataFrame, res: int) -> DataFrame:
    """(cell, x, nbr_x) for every occupied (cell, occupied-neighbor) pair."""
    nbrs = F.filter(
        F.array(*[kring_neighbor_col("cell", res, dx, dy) for dx, dy in _RING]),
        lambda c: c.isNotNull(),
    )
    pairs = cnt.select("cell", "x", F.explode(nbrs).alias("nbr"))
    return pairs.join(
        cnt.select(F.col("cell").alias("nbr"), F.col("x").alias("nbr_x")), "nbr"
    )


def morans_i(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Global Moran's I of per-cell point counts, queen 1-ring weights.

    I = (n / S0) * sum_ij w_ij (x_i - m)(x_j - m) / sum_i (x_i - m)^2

    Output: one row (n_cells, s0, morans_i, expected_i); the statistic is
    rounded to 6 dp (cross-engine float-sum order tolerance), E[I] exact.
    """
    cnt = _cell_counts(points, res, lat_col, lng_col)
    stats = cnt.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.avg("x").alias("m"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
    )
    joined = _ring_joined(cnt, res).crossJoin(F.broadcast(stats))
    return joined.agg(
        F.max("n_cells").alias("n_cells"),
        F.count(F.lit(1)).alias("s0"),
        F.round(
            (F.max("n_cells") / F.count(F.lit(1)))
            * F.sum((F.col("x") - F.col("m")) * (F.col("nbr_x") - F.col("m")))
            / F.max(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_cells")),
            6,
        ).alias("morans_i"),
        F.round(F.lit(-1.0) / (F.max("n_cells") - F.lit(1.0)), 6).alias("expected_i"),
    )


def morans_i_sql(points_sql: str, lat: str, lng: str, res: int) -> str:
    """DuckDB twin of morans_i; points_sql must yield one row per point."""
    cell = cell_encode_sql(lat, lng, res)
    nbr = kring_neighbor_sql("c.cell", res, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                   FROM {points_sql} GROUP BY 1),
        s AS (SELECT COUNT(*) AS n_cells, AVG(x) AS m,
                     SUM(x * x) AS sxx, SUM(x) AS sx FROM c),
        p AS (SELECT c.cell, c.x, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        j AS (SELECT p.x, c2.x AS nbr_x FROM p JOIN c c2 ON p.nbr = c2.cell)
        SELECT s.n_cells AS n_cells, COUNT(*) AS s0,
               ROUND((s.n_cells / CAST(COUNT(*) AS DOUBLE))
                     * SUM((j.x - s.m) * (j.nbr_x - s.m))
                     / MAX(s.sxx - s.sx * s.sx / s.n_cells), 6) AS morans_i,
               ROUND(-1.0 / (s.n_cells - 1.0), 6) AS expected_i
        FROM j CROSS JOIN s
        GROUP BY s.n_cells, s.m
    """


def getis_gi_star(
    points: DataFrame,
    res: int,
    top_k: int = 20,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Per-cell Getis-Ord Gi* hot-spot z-score; top_k hottest cells.

    Gi* includes the focal cell in its own neighborhood:

        z_i = (sum_j-in-ring* x_j  -  m * k_i)
              / (s * sqrt((n * k_i - k_i^2) / (n - 1)))

    with k_i = |ring* over occupied cells| (self + occupied neighbors),
    m / s the population mean / std of x over occupied cells. Output:
    (cell, n_points, ring_sum, k_ring, gi_z) ordered by rounded z desc then
    cell — deterministic across engines.
    """
    cnt = _cell_counts(points, res, lat_col, lng_col)
    stats = cnt.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.avg("x").alias("m"),
        (F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1))).alias("ex2"),
    ).select(
        "n_cells", "m", F.sqrt(F.col("ex2") - F.col("m") * F.col("m")).alias("s")
    )
    ring = (
        _ring_joined(cnt, res)
        .groupBy("cell")
        .agg(
            F.max("x").alias("x"),
            (F.sum("nbr_x") + F.max("x")).alias("ring_sum"),
            (F.count(F.lit(1)) + F.lit(1)).cast("double").alias("k"),
        )
    )
    z = ring.crossJoin(F.broadcast(stats)).select(
        "cell",
        F.col("x").cast("long").alias("n_points"),
        F.col("ring_sum").cast("long").alias("ring_sum"),
        F.col("k").cast("long").alias("k_ring"),
        F.round(
            (F.col("ring_sum") - F.col("m") * F.col("k"))
            / (
                F.col("s")
                * F.sqrt(
                    (F.col("n_cells") * F.col("k") - F.col("k") * F.col("k"))
                    / (F.col("n_cells") - F.lit(1.0))
                )
            ),
            6,
        ).alias("gi_z"),
    )
    return z.orderBy(F.desc("gi_z"), "cell").limit(top_k)


def getis_gi_sql(points_sql: str, lat: str, lng: str, res: int, top_k: int = 20) -> str:
    """DuckDB twin of getis_gi_star."""
    cell = cell_encode_sql(lat, lng, res)
    nbr = kring_neighbor_sql("c.cell", res, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                   FROM {points_sql} GROUP BY 1),
        s AS (SELECT COUNT(*) AS n_cells, AVG(x) AS m,
                     SQRT(SUM(x * x) / COUNT(*) - AVG(x) * AVG(x)) AS s FROM c),
        p AS (SELECT c.cell, c.x, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        r AS (SELECT p.cell, MAX(p.x) AS x,
                     SUM(c2.x) + MAX(p.x) AS ring_sum,
                     CAST(COUNT(*) + 1 AS DOUBLE) AS k
              FROM p JOIN c c2 ON p.nbr = c2.cell
              GROUP BY p.cell)
        SELECT r.cell AS cell, CAST(r.x AS BIGINT) AS n_points,
               CAST(r.ring_sum AS BIGINT) AS ring_sum,
               CAST(r.k AS BIGINT) AS k_ring,
               ROUND((r.ring_sum - s.m * r.k)
                     / (s.s * SQRT((s.n_cells * r.k - r.k * r.k)
                                   / (s.n_cells - 1.0))), 6) AS gi_z
        FROM r CROSS JOIN s
        ORDER BY gi_z DESC, cell
        LIMIT {top_k}
    """
