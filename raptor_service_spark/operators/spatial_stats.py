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
    if top_k is None:  # full z-field (e.g. for FDR correction downstream)
        return z
    return z.orderBy(F.desc("gi_z"), "cell").limit(top_k)


def getis_gi_sql(
    points_sql: str, lat: str, lng: str, res: int, top_k: int | None = 20
) -> str:
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
        {f"ORDER BY gi_z DESC, cell LIMIT {top_k}" if top_k is not None else ""}
    """


# ---------------------------------------------------------------------------
# Ripley's K — multi-band point-pattern clustering statistic
# ---------------------------------------------------------------------------


def ripley_k(
    points: DataFrame,
    bands: list[float],
    id_col: str = "id",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Naive (no edge correction) Ripley's K over degree-space points.

    K(d) = A * 2 * |{(i,j): i<j, dist<=d}| / (n * (n-1)), L(d) = sqrt(K/pi);
    A is the bounding-box area of the observed points (exact min/max
    arithmetic, identical in both engines). A clustered pattern shows
    K(d) above pi*d^2; CSR sits on it — the multi-scale companion of the
    single-ring Moran's I above.

    Scale shape at 100 TB: pair candidates come from ONE grid ε-join at the
    LARGEST band (within_distance_join: 3x3 neighbor-ring explode on the
    build side, cell equi-join, codegen sqrt refine — every qualifying pair
    produced exactly once, no dedup pass); all bands are conditional SUM
    aggs over that single pair stream (one pass, map-side combinable).
    Global n / bbox is a scalar agg crossJoined back (1 row). No all-pairs
    join anywhere — the ε-join output is |pairs(d_max)|, the quantity the
    statistic itself needs.
    """
    from raptor_service_spark.operators.pip_join import within_distance_join

    bands = sorted(bands)
    base = points.select(
        F.col(id_col).alias("pid"), F.col(lat_col).alias("lat"), F.col(lng_col).alias("lng")
    )
    left = base.select(F.col("pid").alias("id_a"), "lat", "lng")
    right = base.select(F.col("pid").alias("id_b"), "lat", "lng")
    pairs = within_distance_join(left, right, eps=bands[-1]).filter(
        F.col("id_a") < F.col("id_b")
    )
    counts = pairs.agg(
        *[
            F.coalesce(
                F.sum((F.col("dist") <= F.lit(d)).cast("long")), F.lit(0).cast("long")
            ).alias(f"c{i}")
            for i, d in enumerate(bands)
        ]
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        ((F.max("lat") - F.min("lat")) * (F.max("lng") - F.min("lng"))).alias("area"),
    )
    rows = counts.crossJoin(F.broadcast(stats)).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(d)).alias("d"), F.col(f"c{i}").alias("n_pairs")
                    )
                    for i, d in enumerate(bands)
                ]
            )
        ).alias("b"),
        "n",
        "area",
    )
    k = F.col("area") * F.lit(2.0) * F.col("b.n_pairs") / (F.col("n") * (F.col("n") - 1))
    import math as _math

    return rows.select(
        F.col("b.d").alias("d"),
        F.col("b.n_pairs").alias("n_pairs"),
        F.round(k, 6).alias("k_hat"),
        F.round(F.sqrt(k / F.lit(_math.pi)), 6).alias("l_hat"),
    ).orderBy("d")


def ripley_k_sql(points_sql: str, id_expr: str, lat: str, lng: str, bands: list[float]) -> str:
    """DuckDB twin of ripley_k. The oracle may use the all-pairs form — the
    gate runs at small SF; parity is on values, not on the plan."""
    bands = sorted(bands)
    dmax = f"CAST({bands[-1]!r} AS DOUBLE)"
    vals = ", ".join(f"(CAST({d!r} AS DOUBLE))" for d in bands)
    return f"""
        WITH p AS (SELECT {id_expr} AS pid, {lat} AS lat, {lng} AS lng
                   FROM {points_sql}),
        pr AS (SELECT ROUND(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                               + (a.lng - b.lng) * (a.lng - b.lng)), 6) AS dist
               FROM p a JOIN p b ON a.pid < b.pid),
        s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                     (MAX(lat) - MIN(lat)) * (MAX(lng) - MIN(lng)) AS area
              FROM p),
        c AS (SELECT bd.d, CAST(COUNT(pr.dist) AS BIGINT) AS n_pairs
              FROM (VALUES {vals}) bd(d)
              LEFT JOIN pr ON pr.dist <= bd.d AND pr.dist <= {dmax}
              GROUP BY bd.d)
        SELECT c.d AS d, c.n_pairs AS n_pairs,
               ROUND(s.area * 2.0 * c.n_pairs / (s.n * (s.n - 1)), 6) AS k_hat,
               ROUND(SQRT(s.area * 2.0 * c.n_pairs / (s.n * (s.n - 1)) / PI()), 6) AS l_hat
        FROM c CROSS JOIN s
        ORDER BY d
    """


# ---------------------------------------------------------------------------
# Mann-Kendall trend per cell — the "emerging hot spot" time dimension
# ---------------------------------------------------------------------------


def mann_kendall_cells(
    events: DataFrame,
    res: int,
    min_days: int = 8,
    lat_col: str = "lat",
    lng_col: str = "lng",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-cell Mann-Kendall trend test over the daily event-count series —
    the statistic behind "emerging hot spot" analysis in space-time cubes.

    Per occupied cell, the daily series x_1..x_n (occupied days only) gives
        S    = sum over day pairs (t1 < t2) of sign(x_2 - x_1)
        Var  = (n(n-1)(2n+5) - sum_ties t(t-1)(2t+5)) / 18
        z    = (S-1)/sqrt(Var) if S>0; (S+1)/sqrt(Var) if S<0; else 0
    and the cell is classified increasing / decreasing / flat at |z|>=1.96.

    Scale shape at 100 TB: event rows are seen by exactly ONE shuffle, the
    (cell, day) count agg (map-side combinable). Everything after runs on
    the aggregated cube: the day-pair self-join is per-cell over a series
    bounded by the TIME RANGE (days), not by data volume — at 30 days that
    is <= 435 pair rows per cell regardless of corpus size; the tie table is
    a second agg of the same cube. All sign/variance algebra is exact
    integer arithmetic in codegen; only z divides into doubles (rounded
    6 dp both engines).
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / F.lit(86400))
    cube = (
        events.groupBy(
            cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell"),
            day.alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a, b = cube.alias("a"), cube.alias("b")
    s = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.day") < F.col("b.day")))
        .groupBy(F.col("a.cell").alias("cell"))
        .agg(F.sum(F.signum(F.col("b.x") - F.col("a.x")).cast("long")).alias("s"))
    )
    per_cell = cube.groupBy("cell").agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        cube.groupBy("cell", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("cell")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias("tie_sum")
        )
    )
    n = F.col("n_days").cast("double")
    var = (n * (n - 1) * (2 * n + 5) - F.col("tie_sum").cast("double")) / F.lit(18.0)
    z = (
        F.when((F.col("s") > 0) & (var > 0), (F.col("s") - 1) / F.sqrt(var))
        .when((F.col("s") < 0) & (var > 0), (F.col("s") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    out = (
        per_cell.join(s, "cell")
        .join(ties, "cell")
        .filter(F.col("n_days") >= min_days)
        .select(
            "cell",
            "n_days",
            "s",
            F.round(z, 6).alias("mk_z"),
            F.when(F.round(z, 6) >= 1.96, F.lit("increasing"))
            .when(F.round(z, 6) <= -1.96, F.lit("decreasing"))
            .otherwise(F.lit("flat"))
            .alias("trend"),
        )
    )
    return out.orderBy("cell")


def mann_kendall_sql(
    events_sql: str, lat: str, lng: str, res: int, min_days: int = 8, ts_expr: str = "ts"
) -> str:
    """DuckDB twin of mann_kendall_cells (identical algebra, epoch-day bins)."""
    cell = cell_encode_sql(lat, lng, res)
    return f"""
        WITH cube AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch({ts_expr}) / 86400) AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM {events_sql} GROUP BY 1, 2),
        s AS (SELECT a.cell, CAST(SUM(SIGN(b.x - a.x)) AS BIGINT) AS s
              FROM cube a JOIN cube b ON a.cell = b.cell AND a.day < b.day
              GROUP BY a.cell),
        pc AS (SELECT cell, COUNT(*) AS n_days FROM cube GROUP BY 1),
        ties AS (SELECT cell, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
                 FROM (SELECT cell, x, COUNT(*) AS t FROM cube GROUP BY 1, 2)
                 GROUP BY 1),
        j AS (SELECT pc.cell, pc.n_days, s.s,
                     (CAST(pc.n_days AS DOUBLE) * (pc.n_days - 1) * (2 * pc.n_days + 5)
                      - ties.tie_sum) / 18.0 AS var
              FROM pc JOIN s ON pc.cell = s.cell
              JOIN ties ON pc.cell = ties.cell
              WHERE pc.n_days >= {min_days})
        SELECT cell, n_days, s,
               ROUND(CASE WHEN s > 0 AND var > 0 THEN (s - 1) / SQRT(var)
                          WHEN s < 0 AND var > 0 THEN (s + 1) / SQRT(var)
                          ELSE 0.0 END, 6) AS mk_z,
               CASE WHEN ROUND(CASE WHEN s > 0 AND var > 0 THEN (s - 1) / SQRT(var)
                                    WHEN s < 0 AND var > 0 THEN (s + 1) / SQRT(var)
                                    ELSE 0.0 END, 6) >= 1.96 THEN 'increasing'
                    WHEN ROUND(CASE WHEN s > 0 AND var > 0 THEN (s - 1) / SQRT(var)
                                    WHEN s < 0 AND var > 0 THEN (s + 1) / SQRT(var)
                                    ELSE 0.0 END, 6) <= -1.96 THEN 'decreasing'
                    ELSE 'flat' END AS trend
        FROM j
        ORDER BY cell
    """


# ---------------------------------------------------------------------------
# Local Moran's I (LISA) — per-cell cluster/outlier classification
# ---------------------------------------------------------------------------


def local_morans_i(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Anselin's Local Moran I_i per occupied cell, queen 1-ring weights:

        I_i = (x_i - m) * sum_j w_ij (x_j - m) / (sum_k (x_k - m)^2 / n)

    with the HH / LL / HL / LH quadrant label (sign of the focal deviation
    vs the sign of the neighbor-lag sum) — the per-cell decomposition of the
    global Moran's I above: hot clusters (HH), cold clusters (LL), and the
    spatial OUTLIERS (HL/LH) the global statistic cannot show.

    Scale shape: identical to morans_i — one point shuffle into the cell
    counts, scalar moments broadcast back, the 8x ring join on the
    O(occupied cells) table; all algebra codegen. Output ordered by cell.
    """
    cnt = _cell_counts(points, res, lat_col, lng_col)
    stats = cnt.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.avg("x").alias("m"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
    ).select(
        "n_cells",
        "m",
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_cells")) / F.col("n_cells")).alias(
            "m2"
        ),
    )
    lag = (
        _ring_joined(cnt, res)
        .groupBy("cell")
        .agg(F.max("x").alias("x"), F.sum("nbr_x").alias("lag_sum"), F.count(F.lit(1)).alias("k"))
    )
    out = lag.crossJoin(F.broadcast(stats)).select(
        "cell",
        F.col("x").cast("long").alias("n_points"),
        F.col("k").cast("long").alias("k_ring"),
        F.round(
            (F.col("x") - F.col("m"))
            * (F.col("lag_sum") - F.col("k") * F.col("m"))
            / F.col("m2"),
            6,
        ).alias("local_i"),
        F.when(
            (F.col("x") >= F.col("m")) & (F.col("lag_sum") >= F.col("k") * F.col("m")),
            F.lit("HH"),
        )
        .when(
            (F.col("x") < F.col("m")) & (F.col("lag_sum") < F.col("k") * F.col("m")),
            F.lit("LL"),
        )
        .when(F.col("x") >= F.col("m"), F.lit("HL"))
        .otherwise(F.lit("LH"))
        .alias("quadrant"),
    )
    return out.orderBy("cell")


def local_morans_sql(points_sql: str, lat: str, lng: str, res: int) -> str:
    """DuckDB twin of local_morans_i."""
    cell = cell_encode_sql(lat, lng, res)
    nbr = kring_neighbor_sql("c.cell", res, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                   FROM {points_sql} GROUP BY 1),
        s AS (SELECT COUNT(*) AS n_cells, AVG(x) AS m,
                     (SUM(x * x) - SUM(x) * SUM(x) / COUNT(*)) / COUNT(*) AS m2
              FROM c),
        p AS (SELECT c.cell, c.x, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        lg AS (SELECT p.cell, MAX(p.x) AS x, SUM(c2.x) AS lag_sum,
                      COUNT(*) AS k
               FROM p JOIN c c2 ON p.nbr = c2.cell
               GROUP BY p.cell)
        SELECT lg.cell AS cell, CAST(lg.x AS BIGINT) AS n_points,
               CAST(lg.k AS BIGINT) AS k_ring,
               ROUND((lg.x - s.m) * (lg.lag_sum - lg.k * s.m) / s.m2, 6)
                 AS local_i,
               CASE WHEN lg.x >= s.m AND lg.lag_sum >= lg.k * s.m THEN 'HH'
                    WHEN lg.x < s.m AND lg.lag_sum < lg.k * s.m THEN 'LL'
                    WHEN lg.x >= s.m THEN 'HL'
                    ELSE 'LH' END AS quadrant
        FROM lg CROSS JOIN s
        ORDER BY cell
    """


def theil_sen_cells(
    events: DataFrame,
    res: int,
    min_days: int = 8,
    lat_col: str = "lat",
    lng_col: str = "lng",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-cell Theil-Sen trend: the MEDIAN of all pairwise daily-count
    slopes (x_b − x_a)/(day_b − day_a) — the robust companion of the OLS
    `cell_trend_slope` (breakdown point 29% vs 0%) and the magnitude
    estimator usually reported next to Mann-Kendall's direction test.

    Same scale shape as mann_kendall_cells: event rows see exactly ONE
    shuffle (the (cell, day) cube agg); the day-pair self-join runs on the
    aggregated cube and is bounded by the calendar, not the corpus. Slopes
    are exact integer-over-integer divisions (bit-identical both engines);
    the median is Spark's exact `percentile(0.5)` vs DuckDB `MEDIAN`
    (both interpolate the even-count midpoint), rounded to 6 dp.

    Output: (cell, n_days, ts_slope) for cells with >= min_days days.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / F.lit(86400))
    cube = events.groupBy(
        cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell"),
        day.alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    a, b = cube.alias("a"), cube.alias("b")
    slopes = a.join(
        b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.day") < F.col("b.day"))
    ).select(
        F.col("a.cell").alias("cell"),
        (
            (F.col("b.x") - F.col("a.x")).cast("double")
            / (F.col("b.day") - F.col("a.day")).cast("double")
        ).alias("slope"),
    )
    per_cell = cube.groupBy("cell").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        slopes.groupBy("cell")
        .agg(F.round(F.expr("percentile(slope, 0.5)"), 6).alias("ts_slope"))
        .join(per_cell, "cell")
        .filter(F.col("n_days") >= min_days)
        .select("cell", "n_days", "ts_slope")
    )


def theil_sen_sql(
    events_sql: str, lat_expr: str, lng_expr: str, res: int, min_days: int = 8
) -> str:
    """DuckDB twin of theil_sen_cells."""
    cell = cell_encode_sql(lat_expr, lng_expr, res)
    return f"""
        WITH cube AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
                   COUNT(*) AS x
            FROM {events_sql} GROUP BY 1, 2),
        sl AS (SELECT a.cell,
                      CAST(b.x - a.x AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
               FROM cube a JOIN cube b
                 ON a.cell = b.cell AND a.day < b.day),
        m AS (SELECT cell, ROUND(MEDIAN(slope), 6) AS ts_slope FROM sl GROUP BY 1),
        d AS (SELECT cell, COUNT(*) AS n_days FROM cube GROUP BY 1)
        SELECT m.cell, d.n_days, m.ts_slope
        FROM m JOIN d ON m.cell = d.cell
        WHERE d.n_days >= {min_days}
    """


def cusum_cells(
    events: DataFrame,
    res: int,
    min_days: int = 8,
    lat_col: str = "lat",
    lng_col: str = "lng",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-cell CUSUM change-point: the day where the cumulative daily
    count deviates most from a constant-rate line — Mann-Kendall says IF a
    cell trends, Theil-Sen says HOW FAST, CUSUM says WHEN it changed.

    dev_k = S_k − k·S_n/n over the day-ordered series (S = cumsum of daily
    counts); the change point is the day of max |dev| (ties → earliest).
    The deviation is ONE shared arithmetic expression over integers, so
    both engines compute bit-identical doubles; output rounds to 6 dp.

    Same scale shape as the other cube statistics: event rows shuffle once
    into the (cell, day) cube; the cumsum window, totals join, and argmax
    all run on the O(cells × days) cube.
    """
    from pyspark.sql import Window

    day = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / F.lit(86400))
    cube = events.groupBy(
        cell_encode_col(F.col(lat_col), F.col(lng_col), res).alias("cell"),
        day.alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    wc = (
        Window.partitionBy("cell")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("cell").orderBy("day")
    seq = cube.select(
        "cell",
        "day",
        F.sum("x").over(wc).alias("s_k"),
        F.row_number().over(wr).alias("k"),
    )
    tot = cube.groupBy("cell").agg(
        F.sum("x").alias("s_n"), F.count(F.lit(1)).alias("n_days")
    )
    dev = seq.join(tot, "cell").withColumn(
        "adev",
        F.expr("ABS(CAST(s_k AS DOUBLE) - CAST(k AS DOUBLE) * s_n / n_days)"),
    )
    wbest = Window.partitionBy("cell").orderBy(F.col("adev").desc(), F.col("day").asc())
    return (
        dev.withColumn("rk", F.row_number().over(wbest))
        .filter((F.col("rk") == 1) & (F.col("n_days") >= min_days))
        .select("cell", "n_days", F.col("day").alias("cp_day"), F.round("adev", 6).alias("max_dev"))
    )


def cusum_sql(
    events_sql: str, lat_expr: str, lng_expr: str, res: int, min_days: int = 8
) -> str:
    """DuckDB twin of cusum_cells."""
    cell = cell_encode_sql(lat_expr, lng_expr, res)
    return f"""
        WITH cube AS (
            SELECT {cell} AS cell,
                   CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
                   COUNT(*) AS x
            FROM {events_sql} GROUP BY 1, 2),
        seq AS (SELECT cell, day,
                       SUM(x) OVER (PARTITION BY cell ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS s_k,
                       ROW_NUMBER() OVER (PARTITION BY cell ORDER BY day) AS k
                FROM cube),
        tot AS (SELECT cell, SUM(x) AS s_n, COUNT(*) AS n_days
                FROM cube GROUP BY 1),
        dev AS (SELECT seq.cell, seq.day, tot.n_days,
                       ABS(CAST(s_k AS DOUBLE) - CAST(k AS DOUBLE) * s_n / n_days)
                           AS adev
                FROM seq JOIN tot ON seq.cell = tot.cell),
        best AS (SELECT cell, day, n_days, adev,
                        ROW_NUMBER() OVER (PARTITION BY cell
                                           ORDER BY adev DESC, day ASC) AS rk
                 FROM dev)
        SELECT cell, n_days, day AS cp_day, ROUND(adev, 6) AS max_dev
        FROM best WHERE rk = 1 AND n_days >= {min_days}
    """


# ---------------------------------------------------------------------------
# Join-count statistics — binary spatial autocorrelation (Cliff & Ord)
# ---------------------------------------------------------------------------


def join_counts(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Black/White join-count statistics over the occupied-cell lattice.

    Cells are binarized black iff their point count exceeds the global mean
    count; each queen-adjacent occupied pair is one "join", counted once
    (cell < nbr). Observed BB / BW / WW are compared with their nonfree-
    sampling expectations E[BB] = J·nB(nB−1)/(n(n−1)), E[WW] analog,
    E[BW] = 2J·nB·nW/(n(n−1)) — the classic Cliff–Ord screen for binary
    spatial autocorrelation (clustered: BB ≫ E[BB]).

    Scale shape: ONE point shuffle (the occupancy agg); the ring join runs
    on the O(occupied cells) table; all counts are exact integers, the
    expectations exact rationals rounded at 6 dp — bit-parity with the SQL
    twin. Output: one row.
    """
    cnt = _cell_counts(points, res, lat_col, lng_col)
    stats = F.broadcast(
        cnt.agg(F.avg("x").alias("m"))
    )
    b = cnt.crossJoin(stats).select(
        "cell", (F.col("x") > F.col("m")).cast("long").cast("double").alias("x")
    )
    nb = F.broadcast(
        b.agg(
            F.sum("x").cast("long").alias("n_black"),
            F.count(F.lit(1)).alias("n_cells"),
        )
    )
    pairs = _ring_joined(b, res).filter(F.col("cell") < F.col("nbr"))
    obs = pairs.agg(
        F.count(F.lit(1)).alias("n_joins"),
        F.sum(F.col("x") * F.col("nbr_x")).cast("long").alias("bb"),
        F.sum((F.lit(1.0) - F.col("x")) * (F.lit(1.0) - F.col("nbr_x")))
        .cast("long")
        .alias("ww"),
    ).withColumn("bw", F.col("n_joins") - F.col("bb") - F.col("ww"))
    j, n, k = F.col("n_joins"), F.col("n_cells"), F.col("n_black")
    nw = n - k
    denom = (n * (n - F.lit(1))).cast("double")
    return obs.crossJoin(nb).select(
        "n_cells",
        "n_black",
        "n_joins",
        "bb",
        "bw",
        "ww",
        F.round((j * k * (k - F.lit(1))).cast("double") / denom, 6).alias("e_bb"),
        F.round((F.lit(2) * j * k * nw).cast("double") / denom, 6).alias("e_bw"),
        F.round((j * nw * (nw - F.lit(1))).cast("double") / denom, 6).alias("e_ww"),
    )


def join_counts_sql(points_sql: str, lat: str, lng: str, res: int) -> str:
    """DuckDB twin of join_counts (same binarization, same pair rule)."""
    cell = cell_encode_sql(lat, lng, res)
    nbr = kring_neighbor_sql("b.cell", res, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                   FROM {points_sql} GROUP BY 1),
        s AS (SELECT AVG(x) AS m, COUNT(*) AS n_cells FROM c),
        b AS (SELECT c.cell,
                     CAST(CAST(c.x > s.m AS INT) AS DOUBLE) AS x
              FROM c CROSS JOIN s),
        nb AS (SELECT CAST(SUM(x) AS BIGINT) AS n_black,
                      COUNT(*) AS n_cells FROM b),
        p AS (SELECT b.cell, b.x, {nbr} AS nbr
              FROM b CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        pr AS (SELECT p.cell, p.x, p.nbr, b2.x AS nbr_x
               FROM p JOIN b b2 ON p.nbr = b2.cell
               WHERE p.cell < p.nbr),
        obs AS (SELECT COUNT(*) AS n_joins,
                       CAST(SUM(x * nbr_x) AS BIGINT) AS bb,
                       CAST(SUM((1.0 - x) * (1.0 - nbr_x)) AS BIGINT) AS ww
                FROM pr)
        SELECT nb.n_cells, nb.n_black, obs.n_joins, obs.bb,
               obs.n_joins - obs.bb - obs.ww AS bw, obs.ww,
               ROUND(CAST(obs.n_joins * nb.n_black * (nb.n_black - 1) AS DOUBLE)
                     / (nb.n_cells * (nb.n_cells - 1)), 6) AS e_bb,
               ROUND(CAST(2 * obs.n_joins * nb.n_black
                          * (nb.n_cells - nb.n_black) AS DOUBLE)
                     / (nb.n_cells * (nb.n_cells - 1)), 6) AS e_bw,
               ROUND(CAST(obs.n_joins * (nb.n_cells - nb.n_black)
                          * (nb.n_cells - nb.n_black - 1) AS DOUBLE)
                     / (nb.n_cells * (nb.n_cells - 1)), 6) AS e_ww
        FROM obs CROSS JOIN nb
    """


# ---------------------------------------------------------------------------
# Geary's C — global spatial autocorrelation (difference-based)
# ---------------------------------------------------------------------------


def gearys_c(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Geary's contiguity ratio C over the occupied-cell lattice:

        C = (n−1) · Σ_adjacent (x_i − x_j)² / (2W · Σ_i (x_i − x̄)²)

    with binary queen weights over OCCUPIED cells and W the number of
    directed adjacent pairs. The difference-based complement of Moran's I
    (C < 1 ⇔ clustered, 1 ⇔ random, > 1 ⇔ dispersed) — more sensitive to
    local differences than I's cross-product. Same shape as morans_i: ONE
    point shuffle, ring join over O(occupied cells); numerator/denominator
    sums pre-rounded at 9 dp so both engines divide identical doubles.
    Output: one row (n_cells, w_pairs, geary_c)."""
    cnt = _cell_counts(points, res, lat_col, lng_col)
    stats = F.broadcast(
        cnt.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("x").alias("m"),
        )
    )
    ssd = (
        cnt.crossJoin(stats)
        .agg(
            F.round(F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))), 9)
            .alias("ssd"),
            F.max("n").alias("n"),
        )
    )
    pairs = _ring_joined(cnt, res)
    num = pairs.agg(
        F.count(F.lit(1)).alias("w"),
        F.round(
            F.sum(
                (F.col("x") - F.col("nbr_x")) * (F.col("x") - F.col("nbr_x"))
            ),
            9,
        ).alias("sq"),
    )
    return num.crossJoin(F.broadcast(ssd)).select(
        F.col("n").alias("n_cells"),
        F.col("w").alias("w_pairs"),
        F.round(
            ((F.col("n") - F.lit(1)) * F.col("sq"))
            / (F.lit(2.0) * F.col("w") * F.col("ssd")),
            6,
        ).alias("geary_c"),
    )


def gearys_c_sql(points_sql: str, lat: str, lng: str, res: int) -> str:
    """DuckDB twin of gearys_c (same weights, same 9-dp pre-rounding)."""
    cell = cell_encode_sql(lat, lng, res)
    nbr = kring_neighbor_sql("c.cell", res, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                   FROM {points_sql} GROUP BY 1),
        s AS (SELECT COUNT(*) AS n, AVG(x) AS m FROM c),
        ssd AS (SELECT ROUND(SUM((c.x - s.m) * (c.x - s.m)), 9) AS ssd,
                       MAX(s.n) AS n
                FROM c CROSS JOIN s),
        p AS (SELECT c.cell, c.x, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        pr AS (SELECT p.x, c2.x AS nbr_x
               FROM p JOIN c c2 ON p.nbr = c2.cell),
        num AS (SELECT COUNT(*) AS w,
                       ROUND(SUM((x - nbr_x) * (x - nbr_x)), 9) AS sq
                FROM pr)
        SELECT CAST(ssd.n AS BIGINT) AS n_cells,
               CAST(num.w AS BIGINT) AS w_pairs,
               ROUND((ssd.n - 1) * num.sq / (2.0 * num.w * ssd.ssd), 6)
                   AS geary_c
        FROM num CROSS JOIN ssd
    """


# ---------------------------------------------------------------------------
# bivariate cross-K — spatial interaction between two point types
# ---------------------------------------------------------------------------


def cross_k(
    points_a: DataFrame,
    points_b: DataFrame,
    bands: list[float],
    id_col: str = "id",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Naive bivariate (cross-type) Ripley's K:

        K_AB(d) = A · |{(i∈A, j∈B): dist(i,j) ≤ d}| / (n_A · n_B)

    over the union bounding box — K_AB above π·d² means type A attracts
    type B at range d (independent placement sits on it). Same scale shape
    as ripley_k: ONE grid ε-join at the largest band produces every
    qualifying cross pair exactly once; all bands are conditional sums
    over that single stream; scalar marginals broadcast."""
    from raptor_service_spark.operators.pip_join import within_distance_join

    bands = sorted(bands)
    a = points_a.select(
        F.col(id_col).alias("id_a"),
        F.col(lat_col).alias("lat"),
        F.col(lng_col).alias("lng"),
    )
    b = points_b.select(
        F.col(id_col).alias("id_b"),
        F.col(lat_col).alias("lat"),
        F.col(lng_col).alias("lng"),
    )
    pairs = within_distance_join(a, b, eps=bands[-1])
    counts = pairs.agg(
        *[
            F.coalesce(
                F.sum((F.col("dist") <= F.lit(d)).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"c{i}")
            for i, d in enumerate(bands)
        ]
    )
    both = a.select("lat", "lng").unionByName(b.select("lat", "lng"))
    stats = both.agg(
        ((F.max("lat") - F.min("lat")) * (F.max("lng") - F.min("lng"))).alias(
            "area"
        )
    ).crossJoin(F.broadcast(a.agg(F.count(F.lit(1)).cast("double").alias("na")))) \
     .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).cast("double").alias("nb"))))
    rows = counts.crossJoin(F.broadcast(stats)).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(d)).alias("d"), F.col(f"c{i}").alias("n_pairs")
                    )
                    for i, d in enumerate(bands)
                ]
            )
        ).alias("b"),
        "area",
        "na",
        "nb",
    )
    k = F.col("area") * F.col("b.n_pairs") / (F.col("na") * F.col("nb"))
    return rows.select(
        F.col("b.d").alias("d"),
        F.col("b.n_pairs").alias("n_pairs"),
        F.round(k, 6).alias("k_ab"),
    ).orderBy("d")


def cross_k_sql(
    points_a_sql: str,
    points_b_sql: str,
    id_a: str,
    id_b: str,
    lat: str,
    lng: str,
    bands: list[float],
) -> str:
    """DuckDB twin of cross_k (all-pairs form — fine at oracle scale)."""
    bands = sorted(bands)
    dmax = f"CAST({bands[-1]!r} AS DOUBLE)"
    vals = ", ".join(f"(CAST({d!r} AS DOUBLE))" for d in bands)
    return f"""
        WITH pa AS (SELECT {id_a} AS pid, {lat} AS lat, {lng} AS lng
                    FROM {points_a_sql}),
        pb AS (SELECT {id_b} AS pid, {lat} AS lat, {lng} AS lng
               FROM {points_b_sql}),
        pr AS (SELECT ROUND(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                               + (a.lng - b.lng) * (a.lng - b.lng)), 6) AS dist
               FROM pa a CROSS JOIN pb b),
        s AS (SELECT (MAX(lat) - MIN(lat)) * (MAX(lng) - MIN(lng)) AS area
              FROM (SELECT lat, lng FROM pa UNION ALL SELECT lat, lng FROM pb)),
        m AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM pa) AS na,
                     (SELECT CAST(COUNT(*) AS DOUBLE) FROM pb) AS nb),
        c AS (SELECT bd.d, CAST(COUNT(CASE WHEN pr.dist <= bd.d
                                      THEN 1 END) AS BIGINT) AS n_pairs
              FROM (VALUES {vals}) bd(d)
              LEFT JOIN pr ON pr.dist <= {dmax}
              GROUP BY bd.d)
        SELECT c.d AS d, c.n_pairs AS n_pairs,
               ROUND(s.area * c.n_pairs / (m.na * m.nb), 6) AS k_ab
        FROM c CROSS JOIN s CROSS JOIN m
        ORDER BY d
    """


def _shell(lag: int) -> list[tuple[int, int]]:
    """Chebyshev ring SHELL at distance exactly ``lag`` (the correlogram's
    distance band; lag 1 == the queen ring)."""
    return [
        (dx, dy)
        for dx, dy in _offsets(lag)
        if max(abs(dx), abs(dy)) == lag
    ]


def moran_correlogram(
    points: DataFrame,
    res: int,
    max_lag: int = 3,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Spatial correlogram: global Moran's I at Chebyshev ring-shell lags
    1..max_lag — HOW FAR autocorrelation reaches, not just whether it
    exists (the range-finding companion to the single-ring morans_i; its
    sill/range reading mirrors the semivariogram's). One point shuffle
    builds the cell-count table once; each lag is an O(occupied × shell)
    explode-join over it. Output (lag, n_cells, s0, morans_i)."""
    cnt = _cell_counts(points, res, lat_col, lng_col).localCheckpoint(eager=True)
    stats = cnt.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.avg("x").alias("m"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
    )
    outs = []
    for lag in range(1, max_lag + 1):
        nbrs = F.filter(
            F.array(
                *[kring_neighbor_col("cell", res, dx, dy) for dx, dy in _shell(lag)]
            ),
            lambda c: c.isNotNull(),
        )
        pairs = cnt.select("cell", "x", F.explode(nbrs).alias("nbr"))
        joined = pairs.join(
            cnt.select(F.col("cell").alias("nbr"), F.col("x").alias("nbr_x")), "nbr"
        ).crossJoin(F.broadcast(stats))
        outs.append(
            joined.agg(
                F.lit(lag).alias("lag"),
                F.max("n_cells").cast("long").alias("n_cells"),
                F.count(F.lit(1)).alias("s0"),
                F.round(
                    (F.max("n_cells") / F.count(F.lit(1)))
                    * F.sum((F.col("x") - F.col("m")) * (F.col("nbr_x") - F.col("m")))
                    / F.max(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_cells")),
                    6,
                ).alias("morans_i"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("lag")


def moran_correlogram_sql(
    points_sql: str, lat: str, lng: str, res: int, max_lag: int = 3
) -> str:
    """DuckDB twin of moran_correlogram (per-lag blocks UNION ALL'd)."""
    cell = cell_encode_sql(lat, lng, res)
    nbr = kring_neighbor_sql("c.cell", res, "o.dx", "o.dy")
    blocks = []
    for lag in range(1, max_lag + 1):
        offs = ", ".join(f"({dx}, {dy})" for dx, dy in _shell(lag))
        blocks.append(
            f"""
        SELECT {lag} AS lag, CAST(s.n_cells AS BIGINT) AS n_cells,
               CAST(COUNT(*) AS BIGINT) AS s0,
               ROUND((s.n_cells / CAST(COUNT(*) AS DOUBLE))
                     * SUM((j.x - s.m) * (j.nbr_x - s.m))
                     / MAX(s.sxx - s.sx * s.sx / s.n_cells), 6) AS morans_i
        FROM (SELECT p.x, c2.x AS nbr_x
              FROM (SELECT c.cell, c.x, {nbr} AS nbr
                    FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
                    WHERE {nbr} IS NOT NULL) p
              JOIN c c2 ON p.nbr = c2.cell) j
        CROSS JOIN s
        GROUP BY s.n_cells, s.m"""
        )
    union = "\n        UNION ALL\n".join(blocks)
    return f"""
        WITH c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                   FROM {points_sql} GROUP BY 1),
        s AS (SELECT COUNT(*) AS n_cells, AVG(x) AS m,
                     SUM(x * x) AS sxx, SUM(x) AS sx FROM c)
        SELECT * FROM ({union}) ORDER BY lag
    """


# ---------------------------------------------------------------------------
# Local Geary c (LISA) — per-cell dissimilarity with the neighbor ring
# ---------------------------------------------------------------------------


def local_geary(
    points: DataFrame,
    res: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Anselin's Local Geary c_i per occupied cell, queen 1-ring weights
    (Anselin 1995, the Geary sibling of local_morans_i):

        c_i = (1/k_i) * sum_j w_ij (x_i - x_j)^2 / m2,  m2 = sum(x-m)^2 / n

    Low c = the cell VALUE resembles its ring (cluster membership — of
    either hot or cold clusters), high c = a value discontinuity (edge /
    outlier) — the distance-based view local Moran's cross-product can
    blur (Moran can score an HL outlier near zero when deviations cancel;
    Geary squares them). Numerator sums are exact squares of integral
    counts; m2 is the one shared float tail. Label: 'similar' when the
    6-dp c_i < 1, else 'dissimilar' (compared on the rounded value —
    no knife edge).

    Scale shape: identical to local_morans_i — one point shuffle into
    cell counts, broadcast scalar moments, the 8x ring join on O(occupied
    cells); all algebra codegen.
    """
    cnt = _cell_counts(points, res, lat_col, lng_col)
    stats = cnt.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
    ).select(
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_cells"))
            / F.col("n_cells")
        ).alias("m2")
    )
    ring = (
        _ring_joined(cnt, res)
        .groupBy("cell")
        .agg(
            F.max("x").alias("x"),
            F.sum(
                (F.col("x") - F.col("nbr_x")) * (F.col("x") - F.col("nbr_x"))
            ).alias("c_num"),
            F.count(F.lit(1)).alias("k"),
        )
    )
    out = ring.crossJoin(F.broadcast(stats)).select(
        "cell",
        F.col("x").cast("long").alias("n_points"),
        F.col("k").cast("long").alias("k_ring"),
        F.round(
            F.col("c_num") / (F.col("k") * F.col("m2")), 6
        ).alias("local_c"),
    )
    return out.select(
        "cell",
        "n_points",
        "k_ring",
        "local_c",
        F.when(F.col("local_c") < 1.0, F.lit("similar"))
        .otherwise(F.lit("dissimilar"))
        .alias("label"),
    ).orderBy("cell")


def local_geary_sql(points_sql: str, lat: str, lng: str, res: int) -> str:
    """DuckDB twin of local_geary."""
    cell = cell_encode_sql(lat, lng, res)
    nbr = kring_neighbor_sql("c.cell", res, "o.dx", "o.dy")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _RING)
    return f"""
        WITH c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS DOUBLE) AS x
                   FROM {points_sql} GROUP BY 1),
        s AS (SELECT (SUM(x * x) - SUM(x) * SUM(x) / COUNT(*)) / COUNT(*)
                   AS m2
              FROM c),
        p AS (SELECT c.cell, c.x, {nbr} AS nbr
              FROM c CROSS JOIN (VALUES {offs}) o(dx, dy)
              WHERE {nbr} IS NOT NULL),
        rg AS (SELECT p.cell, MAX(p.x) AS x,
                      SUM((p.x - c2.x) * (p.x - c2.x)) AS c_num,
                      COUNT(*) AS k
               FROM p JOIN c c2 ON p.nbr = c2.cell
               GROUP BY p.cell),
        lc AS (SELECT rg.cell, CAST(rg.x AS BIGINT) AS n_points,
                      CAST(rg.k AS BIGINT) AS k_ring,
                      ROUND(rg.c_num / (rg.k * s.m2), 6) AS local_c
               FROM rg CROSS JOIN s)
        SELECT cell, n_points, k_ring, local_c,
               CASE WHEN local_c < 1.0 THEN 'similar'
                    ELSE 'dissimilar' END AS label
        FROM lc ORDER BY cell
    """
