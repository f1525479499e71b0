"""Point-in-polygon join (SURVEY §2.3 J10 — graft-new per north_rule).

Plan shape (the scale path):
  1. Driver polyfills each query polygon into grid cells at ``res``
     (geo/grid.polyfill), labeling cells interior vs boundary. Polygon count is
     small; the cell list is a tiny DataFrame.
  2. Points get their cell via the JVM-side encode expression (codegen; the
     cell is also the natural partition column for an Iceberg layout, so this
     join partition-prunes on real tables).
  3. points ⋈ broadcast(cells) equi-join on cell — no shuffle of the big side.
  4. Points in INTERIOR cells are accepted with no exact test (proved inside
     by polyfill); only BOUNDARY-cell points run the exact vectorized PIP
     pandas UDF (Arrow batches, numpy ray casting). This is the classic
     filter-refine spatial join: exact yet cheap.

The reference has no spatial join; its nearest analog is the chunk
(doc_id, idx) containment predicate (/root/reference/db/models/documents.py:43-44).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from raptor_service_spark.geo.grid import cell_encode_col, points_in_polygon_np, polyfill


def polygon_cells_df(spark, polygons: dict[str, np.ndarray], res: int) -> DataFrame:
    """qid -> polygon vertices ((M,2) lat/lng) => (qid, cell, is_boundary) rows."""
    rows = []
    for qid, poly in polygons.items():
        cells, is_b = polyfill(np.asarray(poly, dtype=float), res)
        rows.extend((qid, int(c), bool(b)) for c, b in zip(cells, is_b))
    return spark.createDataFrame(rows, "qid string, cell long, is_boundary boolean")


def point_in_polygon_join(
    points: DataFrame,
    polygons: dict[str, np.ndarray],
    res: int = 7,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Inner join: every (polygon qid, point) pair with the point inside.

    Output: all ``points`` columns + ``qid``. Exact (filter-refine), not
    approximate: polyfill is superset-complete and boundary cells get the
    exact test.
    """
    spark = points.sparkSession
    cells_df = polygon_cells_df(spark, polygons, res)
    polys_b = spark.sparkContext.broadcast(
        {qid: np.asarray(p, dtype=np.float64) for qid, p in polygons.items()}
    )

    @F.pandas_udf(BooleanType())
    def pip_exact(qid: pd.Series, lat: pd.Series, lng: pd.Series) -> pd.Series:
        out = np.zeros(len(qid), dtype=bool)
        latv = lat.to_numpy(dtype=np.float64)
        lngv = lng.to_numpy(dtype=np.float64)
        for q in qid.unique():
            mask = (qid == q).to_numpy()
            out[mask] = points_in_polygon_np(latv[mask], lngv[mask], polys_b.value[q])
        return pd.Series(out)

    pts = points.withColumn("_cell", cell_encode_col(F.col(lat_col), F.col(lng_col), res))
    joined = pts.join(F.broadcast(cells_df), pts["_cell"] == cells_df["cell"], "inner")
    accepted = joined.filter(
        (~F.col("is_boundary"))
        | pip_exact(F.col("qid"), F.col(lat_col), F.col(lng_col))
    )
    return accepted.drop("_cell", "cell", "is_boundary")


def point_in_polygon_join_bruteforce(
    points: DataFrame,
    polygons: dict[str, np.ndarray],
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Reference implementation for tests: exact PIP against EVERY polygon
    (cross join, no pruning). Same output contract as point_in_polygon_join."""
    spark = points.sparkSession
    polys_b = spark.sparkContext.broadcast(
        {qid: np.asarray(p, dtype=np.float64) for qid, p in polygons.items()}
    )
    qids = spark.createDataFrame([(q,) for q in polygons], "qid string")

    @F.pandas_udf(BooleanType())
    def pip_exact(qid: pd.Series, lat: pd.Series, lng: pd.Series) -> pd.Series:
        out = np.zeros(len(qid), dtype=bool)
        latv = lat.to_numpy(dtype=np.float64)
        lngv = lng.to_numpy(dtype=np.float64)
        for q in qid.unique():
            mask = (qid == q).to_numpy()
            out[mask] = points_in_polygon_np(latv[mask], lngv[mask], polys_b.value[q])
        return pd.Series(out)

    return points.crossJoin(F.broadcast(qids)).filter(
        pip_exact(F.col("qid"), F.col(lat_col), F.col(lng_col))
    )
