"""Hierarchical lat/lng grid index ("H3/S2-style", pure arithmetic).

Replaces the reference's UMAP+GMM cluster hierarchy
(/root/reference/utils/cluster.py:6-53, services/clustering/clusterer.py:27-112)
with a deterministic quadtree grid: resolution ``r`` splits the world into
``2^r x 2^r`` cells; the parent of a cell at ``r`` is the enclosing cell at
``r-1``. Coarsening resolution == ascending one RAPTOR tree level.

Cell id layout (single BIGINT, pure +/*/floor arithmetic — NO bitwise ops —
so the exact same formula runs JVM-side in Spark SQL whole-stage codegen and
in the DuckDB oracle):

    cell_id = res * 2**54 + y * 2**res + x

    x = clamp(floor((lng + 180) / 360 * 2**res), 0, 2**res - 1)
    y = clamp(floor((lat +  90) / 180 * 2**res), 0, 2**res - 1)

res <= 26 keeps ``y * 2**res + x < 2**52`` and the whole id < 2**59 (int64-safe).
At res 15 a cell is ~1.2 km of longitude at the equator — finer than needed for
the span corpus; the tile tree typically runs res 8 -> 2.

Three synchronized implementations are provided for every primitive:
  * ``*_np``  — vectorized numpy (used inside pandas/Arrow UDFs),
  * ``*_col`` — Spark Column expression (JVM-side, codegen, no Python),
  * ``*_sql`` — ANSI SQL string fragment (DuckDB oracle parity).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_RES = 26
RES_MULTIPLIER = 2**54  # res field lives above the 52 bits of (y, x)


# ---------------------------------------------------------------------------
# encode / decode — numpy
# ---------------------------------------------------------------------------


def _xy_np(lat: np.ndarray, lng: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    n = np.int64(1) << res
    x = np.floor((np.asarray(lng, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def cell_encode_np(lat, lng, res: int) -> np.ndarray:
    """Vectorized lat/lng -> cell id at ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    x, y = _xy_np(np.atleast_1d(lat), np.atleast_1d(lng), res)
    return np.int64(res) * RES_MULTIPLIER + y * (np.int64(1) << res) + x


def cell_res_np(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) // RES_MULTIPLIER).astype(np.int64)


def cell_xy_np(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (res, x, y) arrays."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res = cell // RES_MULTIPLIER
    rem = cell - res * RES_MULTIPLIER
    n = np.int64(1) << res
    y = rem // n
    x = rem - y * n
    return res, x, y


def cell_parent_np(cell, parent_res: int) -> np.ndarray:
    """Ancestor cell at ``parent_res`` (must be <= each cell's own res)."""
    res, x, y = cell_xy_np(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    shift = (res - parent_res).astype(np.int64)
    xp = x >> shift
    yp = y >> shift
    return np.int64(parent_res) * RES_MULTIPLIER + yp * (np.int64(1) << parent_res) + xp


def children_np(cell) -> np.ndarray:
    """The 4 children of each cell at res+1. Returns shape (n, 4)."""
    res, x, y = cell_xy_np(cell)
    cr = res + 1
    n = np.int64(1) << cr
    base = cr * RES_MULTIPLIER
    out = np.empty((len(x), 4), dtype=np.int64)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            out[:, k] = base + (2 * y + dy) * n + (2 * x + dx)
            k += 1
    return out


def cell_bounds_np(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lat_min, lat_max, lng_min, lng_max) per cell."""
    res, x, y = cell_xy_np(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lng_min = x / n * 360.0 - 180.0
    lng_max = (x + 1) / n * 360.0 - 180.0
    lat_min = y / n * 180.0 - 90.0
    lat_max = (y + 1) / n * 180.0 - 90.0
    return lat_min, lat_max, lng_min, lng_max


def cell_center_np(cell) -> tuple[np.ndarray, np.ndarray]:
    lat_min, lat_max, lng_min, lng_max = cell_bounds_np(cell)
    return (lat_min + lat_max) / 2.0, (lng_min + lng_max) / 2.0


def kring_np(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of ``cell`` at the same res.

    Longitude wraps; latitude clamps at the poles. Replaces the reference's
    GMM multi-membership overlap (utils/cluster.py:45-53) as the candidate
    expansion primitive for grid-compacted kNN.
    """
    res, x, y = cell_xy_np([cell])
    res, x, y = int(res[0]), int(x[0]), int(y[0])
    n = 1 << res
    dxs, dys = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x + dxs.ravel()) % n  # lng wrap
    ys = y + dys.ravel()
    ok = (ys >= 0) & (ys < n)  # lat clamp
    xs, ys = xs[ok], ys[ok]
    ids = np.int64(res) * RES_MULTIPLIER + ys.astype(np.int64) * n + xs.astype(np.int64)
    return np.unique(ids)


# ---------------------------------------------------------------------------
# encode / parent — Spark Column expressions (JVM-side, codegen-friendly)
# ---------------------------------------------------------------------------


def cell_encode_col(lat: Column, lng: Column, res: int) -> Column:
    """Spark Column: same formula as cell_encode_np, stays in codegen."""
    n = 2**res
    x = F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    y = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
    x = F.greatest(F.lit(0), F.least(F.lit(n - 1), x)).cast("long")
    y = F.greatest(F.lit(0), F.least(F.lit(n - 1), y)).cast("long")
    return (F.lit(res) * F.lit(RES_MULTIPLIER) + y * F.lit(n) + x).cast("long")


def cell_parent_col(cell: Column | str, res: int, parent_res: int) -> Column:
    """Spark Column: ancestor at parent_res for cells known to be at ``res``."""
    if isinstance(cell, str):
        cell = F.col(cell)
    n = 2**res
    pn = 2**parent_res
    shift = 2 ** (res - parent_res)
    rem = cell - F.lit(res * RES_MULTIPLIER)
    y = F.floor(rem / F.lit(n)).cast("long")
    x = (rem - y * F.lit(n)).cast("long")
    xp = F.floor(x / F.lit(shift)).cast("long")
    yp = F.floor(y / F.lit(shift)).cast("long")
    return (F.lit(parent_res * RES_MULTIPLIER) + yp * F.lit(pn) + xp).cast("long")


# ---------------------------------------------------------------------------
# encode / parent — SQL fragments for the DuckDB oracle
# ---------------------------------------------------------------------------


def cell_encode_sql(lat_expr: str, lng_expr: str, res: int) -> str:
    """ANSI-SQL fragment computing the identical cell id (DuckDB-runnable)."""
    n = 2**res
    x = f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR(({lng_expr} + 180.0) / 360.0 * {n}) AS BIGINT)))"
    y = f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {n}) AS BIGINT)))"
    return f"(CAST({res} AS BIGINT) * {RES_MULTIPLIER} + {y} * {n} + {x})"


def cell_center_sql(cell_expr: str, res: int) -> tuple[str, str]:
    """(center_lat, center_lng) expression strings for a res-cell id —
    valid verbatim in Spark SQL and DuckDB (shared-arithmetic parity)."""
    n = 2**res
    rem = f"({cell_expr} - {res * RES_MULTIPLIER})"
    y = f"CAST(FLOOR({rem} / {n}) AS BIGINT)"
    x = f"({rem} - {y} * {n})"
    clat = f"(-90.0 + ({y} + 0.5) * 180.0 / {n})"
    clng = f"(-180.0 + ({x} + 0.5) * 360.0 / {n})"
    return clat, clng


def cell_parent_sql(cell_expr: str, res: int, parent_res: int) -> str:
    n = 2**res
    pn = 2**parent_res
    shift = 2 ** (res - parent_res)
    rem = f"({cell_expr} - {res * RES_MULTIPLIER})"
    y = f"CAST(FLOOR({rem} / {n}) AS BIGINT)"
    x = f"({rem} - {y} * {n})"
    return (
        f"(CAST({parent_res * RES_MULTIPLIER} AS BIGINT)"
        f" + CAST(FLOOR({y} / {shift}) AS BIGINT) * {pn}"
        f" + CAST(FLOOR({x} / {shift}) AS BIGINT))"
    )


# ---------------------------------------------------------------------------
# point-in-polygon + polyfill (pure numpy; used in pandas UDFs and driver)
# ---------------------------------------------------------------------------


def points_in_polygon_np(lat: np.ndarray, lng: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting. ``poly``: (M, 2) array of (lat, lng).

    Loop over the M polygon edges (small), vectorized over the N points.
    Replaces the Shapely dependency (not installed here); semantics match the
    classic PNPOLY algorithm.
    """
    x = np.asarray(lng, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    px = np.asarray(poly, dtype=np.float64)[:, 1]
    py = np.asarray(poly, dtype=np.float64)[:, 0]
    m = len(px)
    inside = np.zeros(x.shape, dtype=bool)
    j = m - 1
    for i in range(m):
        crosses = (py[i] > y) != (py[j] > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (px[j] - px[i]) * (y - py[i]) / (py[j] - py[i]) + px[i]
        inside ^= crosses & (x < xint)
        j = i
    return inside


def _segments_intersect(a1, a2, b1, b2) -> np.ndarray:
    """Vectorized proper/improper segment intersection via orientation signs.

    a1,a2: (..., 2) rect-edge endpoints; b1,b2: (..., 2) poly-edge endpoints.
    """

    def cross(o, p, q):
        return (p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1]) - (
            p[..., 1] - o[..., 1]
        ) * (q[..., 0] - o[..., 0])

    d1 = cross(b1, b2, a1)
    d2 = cross(b1, b2, a2)
    d3 = cross(a1, a2, b1)
    d4 = cross(a1, a2, b2)
    return ((d1 * d2) < 0) & ((d3 * d4) < 0)


def polyfill(poly: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Cover a polygon with grid cells at ``res``.

    Returns ``(cells, is_boundary)``:
      * every cell that intersects the polygon is present (superset-complete,
        so the PIP join's exact test loses nothing),
      * ``is_boundary=False`` cells lie fully inside the polygon — points in
        them can skip the exact PIP test at scale.

    ``poly``: (M, 2) array of (lat, lng) vertices, implicitly closed.
    """
    poly = np.asarray(poly, dtype=np.float64)
    lat_min, lat_max = poly[:, 0].min(), poly[:, 0].max()
    lng_min, lng_max = poly[:, 1].min(), poly[:, 1].max()
    n = 1 << res
    x0, y0 = _xy_np(np.array([lat_min]), np.array([lng_min]), res)
    x1, y1 = _xy_np(np.array([lat_max]), np.array([lng_max]), res)
    xs = np.arange(int(x0[0]), int(x1[0]) + 1, dtype=np.int64)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    cells = np.int64(res) * RES_MULTIPLIER + gy * np.int64(n) + gx

    # cell rectangles
    lat_lo, lat_hi, lng_lo, lng_hi = cell_bounds_np(cells)
    corners_in = np.zeros((len(cells), 4), dtype=bool)
    for k, (clat, clng) in enumerate(
        [(lat_lo, lng_lo), (lat_lo, lng_hi), (lat_hi, lng_lo), (lat_hi, lng_hi)]
    ):
        corners_in[:, k] = points_in_polygon_np(clat, clng, poly)

    # any poly vertex inside the rect?
    vert_in = np.zeros(len(cells), dtype=bool)
    for vlat, vlng in poly:
        vert_in |= (vlat >= lat_lo) & (vlat <= lat_hi) & (vlng >= lng_lo) & (vlng <= lng_hi)

    # any rect edge crossing any poly edge?
    pe1 = poly
    pe2 = np.roll(poly, -1, axis=0)
    edge_x = np.zeros(len(cells), dtype=bool)
    rect_edges = [
        (lat_lo, lng_lo, lat_lo, lng_hi),
        (lat_hi, lng_lo, lat_hi, lng_hi),
        (lat_lo, lng_lo, lat_hi, lng_lo),
        (lat_lo, lng_hi, lat_hi, lng_hi),
    ]
    for e1lat, e1lng, e2lat, e2lng in rect_edges:
        a1 = np.stack([e1lng, e1lat], axis=-1)[:, None, :]  # (cells, 1, 2) as (x, y)
        a2 = np.stack([e2lng, e2lat], axis=-1)[:, None, :]
        b1 = np.stack([pe1[:, 1], pe1[:, 0]], axis=-1)[None, :, :]  # (1, M, 2)
        b2 = np.stack([pe2[:, 1], pe2[:, 0]], axis=-1)[None, :, :]
        edge_x |= _segments_intersect(a1, a2, b1, b2).any(axis=1)

    intersects = corners_in.any(axis=1) | vert_in | edge_x
    fully_inside = corners_in.all(axis=1) & ~vert_in & ~edge_x
    cells = cells[intersects]
    is_boundary = ~fully_inside[intersects]
    return cells, is_boundary
