"""Z-order (Morton) range decomposition — the SFC scan-pruning planner.

`q_zorder_layout` shows WHY a z-sorted layout clusters 2-D data; this
module supplies the other half every curve-indexed store needs (HBase/
Phoenix row-key planners, GeoMesa/Iceberg z-ordered scans): given a bbox,
the MINIMAL set of contiguous z ranges that covers exactly its cells. A
2-D bbox predicate then becomes `z BETWEEN lo AND hi` unions — range
predicates that parquet row-group min/max stats (on a z-sorted table) can
prune, turning a full scan into O(perimeter) range reads.

Quadtree recursion: a quad fully inside the box emits its whole contiguous
z block (the defining property of Morton: a 2^k-quad is one z interval);
a quad fully outside is dropped; anything else splits into 4. Adjacent
output ranges are merged. Driver-side pure Python, O(perimeter) ranges —
the same planner role as the kNN occupancy-histogram ring planner.

The bit order matches `_morton_sql` in `__spark_entry__.py` (x at even
bit positions, y at odd) so the ranges join directly against the engine's
z column; the oracle uses the SAME literal range list (VALUES) and the
same interleave arithmetic — parity by construction.
"""

from __future__ import annotations


def morton_py(x: int, y: int, bits: int = 8) -> int:
    """Python replica of _morton_sql's interleave (x even, y odd bits)."""
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def zrange_decompose(
    x0: int, x1: int, y0: int, y1: int, order: int = 8
) -> list[tuple[int, int]]:
    """Minimal merged list of (z_lo, z_hi) covering exactly the cells of
    the inclusive cell-coordinate box [x0..x1] × [y0..y1] at 2^order grid."""
    if not (0 <= x0 <= x1 < (1 << order) and 0 <= y0 <= y1 < (1 << order)):
        raise ValueError("box out of grid bounds")
    out: list[tuple[int, int]] = []

    def rec(qx: int, qy: int, k: int) -> None:
        sx, sy = qx << k, qy << k
        ex, ey = sx + (1 << k) - 1, sy + (1 << k) - 1
        if ex < x0 or sx > x1 or ey < y0 or sy > y1:
            return
        if sx >= x0 and ex <= x1 and sy >= y0 and ey <= y1:
            base = morton_py(qx, qy, order - k) * 4**k
            out.append((base, base + 4**k - 1))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                rec(qx * 2 + dx, qy * 2 + dy, k - 1)

    rec(0, 0, order)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def hilbert_py(x: int, y: int, order: int) -> int:
    """Python replica of geo/hilbert.py's xy2d chain (same rotate-reflect
    arithmetic; parity asserted in tests against the Spark/DuckDB forms)."""
    n = 1 << order
    d = 0
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * (ry + rx * (3 - 2 * ry))
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - y, n - 1 - x
            else:
                x, y = y, x
    return d


def hilbert_range_decompose(
    x0: int, x1: int, y0: int, y1: int, order: int = 8
) -> list[tuple[int, int]]:
    """Hilbert twin of zrange_decompose: minimal merged (hd_lo, hd_hi)
    ranges covering exactly the box. Works because a 2^k-quad is one
    contiguous Hilbert interval (the curve's subtree/prefix property) —
    its base is any member cell's code floored to the 4^k block. Hilbert's
    superior locality yields FEWER, TIGHTER ranges than Morton for the
    same box (no seam jumps), which is the practical argument for
    Hilbert-sorted layouts; the bench query reports both counts."""
    if not (0 <= x0 <= x1 < (1 << order) and 0 <= y0 <= y1 < (1 << order)):
        raise ValueError("box out of grid bounds")
    out: list[tuple[int, int]] = []

    def rec(qx: int, qy: int, k: int) -> None:
        sx, sy = qx << k, qy << k
        ex, ey = sx + (1 << k) - 1, sy + (1 << k) - 1
        if ex < x0 or sx > x1 or ey < y0 or sy > y1:
            return
        if sx >= x0 and ex <= x1 and sy >= y0 and ey <= y1:
            block = 4**k
            base = hilbert_py(sx, sy, order) // block * block
            out.append((base, base + block - 1))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                rec(qx * 2 + dx, qy * 2 + dy, k - 1)

    rec(0, 0, order)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged
