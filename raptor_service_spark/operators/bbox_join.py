"""Rectangle (bounding-box) spatial join via grid-cell cover.

The filter step of every GIS spatial join: given tables of axis-aligned
boxes (lat_lo, lat_hi, lng_lo, lng_hi), find all overlapping pairs. This is
the distributed primitive under polygon-polygon joins — real engines run
bbox-overlap first and refine exact geometry only on survivors (our PIP
join's filter-refine, generalized to box x box).

Plan shape (100 TB posture):
  * each box explodes to its cover cells at ``res`` — a JVM-side
    sequence/transform (codegen, no UDF); cover size is bounded by box
    extent, so the explode factor is data-proportional, not quadratic;
  * one equi-join on cell — the only shuffle, partition-prunable on a
    cell-partitioned table;
  * duplicate suppression WITHOUT a distinct shuffle: a pair overlapping in
    many cells is emitted only where the join cell equals the canonical
    cell — the cover cell of the intersection box's (lat_lo, lng_lo)
    corner, computable per-row from both boxes (the "reference point"
    technique used by the partition-based spatial-merge literature);
  * the exact overlap predicate is four codegen comparisons.

Longitude is treated as planar in [-180, 180] (no antimeridian wrap) —
callers with wrapping boxes split them first, as GIS engines do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import RES_MULTIPLIER


def _xcol(lng: F.Column, res: int) -> F.Column:
    n = 2**res
    x = F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), x)).cast("long")


def _ycol(lat: F.Column, res: int) -> F.Column:
    n = 2**res
    y = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), y)).cast("long")


def cover_cells_col(
    lat_lo: F.Column, lat_hi: F.Column, lng_lo: F.Column, lng_hi: F.Column, res: int
) -> F.Column:
    """array<long> of every res-cell intersecting the box — pure codegen
    (sequence x sequence, flattened), no Python."""
    n = 2**res
    x0, x1 = _xcol(lng_lo, res), _xcol(lng_hi, res)
    y0, y1 = _ycol(lat_lo, res), _ycol(lat_hi, res)
    return F.flatten(
        F.transform(
            F.sequence(y0, y1),
            lambda y: F.transform(
                F.sequence(x0, x1),
                lambda x: F.lit(res * RES_MULTIPLIER) + y * F.lit(n) + x,
            ),
        )
    )


def bbox_self_join(
    boxes: DataFrame,
    res: int,
    id_col: str = "id",
) -> DataFrame:
    """All overlapping distinct pairs (id_a < id_b) within one box table.

    Output: (id_a, id_b). Boxes touching only at an edge count as
    overlapping (closed intervals), matching the SQL predicate
    ``a.lat_lo <= b.lat_hi AND b.lat_lo <= a.lat_hi AND ...``.
    """
    cov = boxes.select(
        F.col(id_col),
        "lat_lo",
        "lat_hi",
        "lng_lo",
        "lng_hi",
        F.explode(
            cover_cells_col(
                F.col("lat_lo"), F.col("lat_hi"), F.col("lng_lo"), F.col("lng_hi"), res
            )
        ).alias("cell"),
    )
    a = cov.alias("a")
    b = cov.alias("b")
    overlap = (
        (F.col(f"a.lat_lo") <= F.col("b.lat_hi"))
        & (F.col("b.lat_lo") <= F.col("a.lat_hi"))
        & (F.col("a.lng_lo") <= F.col("b.lng_hi"))
        & (F.col("b.lng_lo") <= F.col("a.lng_hi"))
    )
    # canonical cell of the intersection box's lower-left corner: emit the
    # pair only there — dedup without a second shuffle
    ilat = F.greatest(F.col("a.lat_lo"), F.col("b.lat_lo"))
    ilng = F.greatest(F.col("a.lng_lo"), F.col("b.lng_lo"))
    n = 2**res
    canon = (
        F.lit(res * RES_MULTIPLIER) + _ycol(ilat, res) * F.lit(n) + _xcol(ilng, res)
    )
    return (
        a.join(b, F.col("a.cell") == F.col("b.cell"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(overlap)
        .filter(F.col("a.cell") == canon)
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
    )
