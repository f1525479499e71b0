"""Property-based invariants of the hierarchical grid index (hypothesis).

Pure-numpy tests of geo/grid.py algebra — no SparkSession needed, so these
run in milliseconds and fuzz far wider ranges than the example-based tests:

  * encode is total and in-range for any finite lat/lng (clamping included);
  * parent/child algebra: parent(encode(r), p) == encode(p); every child's
    parent is the cell itself; parenthood is transitive through any
    intermediate resolution;
  * geometric consistency: a cell's center re-encodes to the same cell, and
    bounds contain the center;
  * k-ring: contains the cell itself, size bounded by (2k+1)^2, symmetric
    (b in ring(a) <=> a in ring(b) — wrap/clamp included), and every member
    re-encodes to the same resolution.
"""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raptor_service_spark.geo.grid import (
    MAX_RES,
    RES_MULTIPLIER,
    cell_bounds_np,
    cell_center_np,
    cell_encode_np,
    cell_parent_np,
    cell_res_np,
    cell_xy_np,
    children_np,
    kring_np,
)

lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lng_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
res_s = st.integers(min_value=0, max_value=12)


@settings(max_examples=300, deadline=None)
@given(lat=lat_s, lng=lng_s, res=res_s)
def test_encode_in_range(lat, lng, res):
    c = int(cell_encode_np([lat], [lng], res)[0])
    r, x, y = cell_xy_np([c])
    n = 1 << res
    assert int(r[0]) == res == int(cell_res_np([c])[0])
    assert 0 <= int(x[0]) < n and 0 <= int(y[0]) < n
    assert res * RES_MULTIPLIER <= c < (res + 1) * RES_MULTIPLIER


@settings(max_examples=300, deadline=None)
@given(lat=lat_s, lng=lng_s, res=res_s, up=st.integers(min_value=0, max_value=6))
def test_parent_commutes_with_encode(lat, lng, res, up):
    """Coarsening after encoding == encoding coarse directly — the property
    that makes the tile-tree ladder (tree build, tile pyramid, compaction)
    a pure arithmetic rollup."""
    p = max(0, res - up)
    fine = cell_encode_np([lat], [lng], res)
    assert int(cell_parent_np(fine, p)[0]) == int(cell_encode_np([lat], [lng], p)[0])


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lng=lng_s, res=st.integers(min_value=0, max_value=11))
def test_children_parent_roundtrip(lat, lng, res):
    c = cell_encode_np([lat], [lng], res)
    kids = children_np(c)[0]
    assert len(set(kids.tolist())) == 4
    for kid in kids:
        assert int(cell_parent_np([int(kid)], res)[0]) == int(c[0])


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lng=lng_s, res=res_s, mid=st.integers(min_value=0, max_value=12))
def test_parent_transitive(lat, lng, res, mid):
    lo = min(res, mid)
    c = cell_encode_np([lat], [lng], res)
    via = cell_parent_np(cell_parent_np(c, mid) if mid <= res else c, lo)
    assert int(via[0]) == int(cell_parent_np(c, lo)[0])


@settings(max_examples=300, deadline=None)
@given(lat=lat_s, lng=lng_s, res=res_s)
def test_center_reencodes_and_bounds_contain(lat, lng, res):
    c = cell_encode_np([lat], [lng], res)
    cla, cln = cell_center_np(c)
    assert int(cell_encode_np(cla, cln, res)[0]) == int(c[0])
    lat_min, lat_max, lng_min, lng_max = cell_bounds_np(c)
    assert lat_min[0] <= cla[0] <= lat_max[0]
    assert lng_min[0] <= cln[0] <= lng_max[0]


@settings(max_examples=150, deadline=None)
@given(
    lat=lat_s,
    lng=lng_s,
    res=st.integers(min_value=2, max_value=10),
    k=st.integers(min_value=0, max_value=3),
)
def test_kring_membership_and_symmetry(lat, lng, res, k):
    c = int(cell_encode_np([lat], [lng], res)[0])
    ring = kring_np(c, k)
    assert c in ring
    assert 0 < len(ring) <= (2 * k + 1) ** 2
    assert (cell_res_np(ring) == res).all()
    for other in ring:
        assert c in kring_np(int(other), k)  # symmetric under wrap + clamp
