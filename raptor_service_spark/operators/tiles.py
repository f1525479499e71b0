"""Raster <-> vector tile materialization of media_ref payloads (north_star).

Replaces the reference's node persistence (/root/reference/services/core/
build_tree_service.py:318-400) for MEDIA spans: per grid cell, media-bearing
spans are rasterized into a fixed-size count grid (the "raster tile") and can
be vectorized back into point features (the "vector tile").

Media decode is STUBBED (no image/audio libs in this container — the brief
says stub decode behind a deterministic fake) but the Spark plumbing is real
and tested: schemas, per-cell applyInPandas grouping, Arrow batch shapes,
binary payload encode/decode round-trip.

Raster payload format (deterministic, versionless-simple):
  uint16 little-endian grid of ``grid x grid`` cell-local point counts,
  row-major from the cell's (lat_min, lng_min) corner.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.geo.grid import cell_bounds_np, cell_encode_col

TILE_SCHEMA = "cell long, res int, grid int, n_points long, payload binary"
FEATURE_SCHEMA = "cell long, px int, py int, cnt int, lat double, lng double"


def decode_media_stub(media_refs: pd.Series) -> pd.Series:
    """Deterministic fake 'decode': 16 pseudo-bytes from md5(media_ref).

    A real deployment swaps this for PIL/ffmpeg decoding inside the same
    mapInPandas; everything around it (schema, batching) is unchanged.
    """
    return media_refs.map(lambda r: hashlib.md5(str(r).encode()).digest())


def media_features(spans: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extract media spans: deterministic fake embedding per media_ref.

    Real plumbing: mapInPandas, typed output schema, only media-kind spans.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = decode_media_stub(pdf["media_ref"])
            feats = [
                [float(b) / 255.0 for b in bytes(x)[:dim]] for x in raw
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    media = spans.filter(F.col("media_ref") != "")
    return media.select("doc_id", "media_ref", "kind").mapInPandas(
        gen, schema=f"doc_id string, media_ref string, kind string, feature array<double>"
    )


def decode_image_stub(media_refs: pd.Series, w: int = 16, h: int = 16) -> list:
    """Deterministic fake image decode: an (h, w) uint8 raster whose bytes
    derive from chained md5 of the ref. Swap for PIL decoding in the same
    mapInPandas; schema/batch shape unchanged."""
    out = []
    for r in media_refs:
        need = w * h
        buf = b""
        seed = str(r).encode()
        while len(buf) < need:
            seed = hashlib.md5(seed).digest()
            buf += seed
        out.append(np.frombuffer(buf[:need], dtype=np.uint8).reshape(h, w))
    return out


def resize_media(
    spans: DataFrame, out_w: int = 4, out_h: int = 4, src_w: int = 16, src_h: int = 16
) -> DataFrame:
    """Resize media payloads (brief: multimodal resize as a Pandas UDF over
    mapInPandas). Decode is the deterministic stub; the resize itself is a
    REAL vectorized average-pool (block mean) per Arrow batch, emitting the
    resized raster as a binary payload plus typed dimensions metadata.
    """
    fy, fx = src_h // out_h, src_w // out_w

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            imgs = decode_image_stub(pdf["media_ref"], src_w, src_h)
            stack = np.stack(imgs).astype(np.float64)  # (n, h, w)
            pooled = (
                stack.reshape(len(imgs), out_h, fy, out_w, fx)
                .mean(axis=(2, 4))
                .round()
                .astype(np.uint8)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": np.full(len(pdf), out_w, dtype=np.int32),
                    "height": np.full(len(pdf), out_h, dtype=np.int32),
                    "payload": [p.tobytes() for p in pooled],
                }
            )

    media = spans.filter(F.col("media_ref") != "")
    return media.select("doc_id", "media_ref").mapInPandas(
        gen,
        schema="doc_id string, media_ref string, width int, height int, payload binary",
    )


def sample_frames(spans: DataFrame, n_frames: int = 4, fps: float = 24.0) -> DataFrame:
    """Frame-sample video media spans (brief: frame-sample as a Pandas UDF):
    one row per sampled frame with (frame_idx, t_offset_sec, payload). The
    per-frame payload is the deterministic decode stub keyed on
    (media_ref, frame_idx) — real ffmpeg frame extraction drops into the
    same kernel. Only 'video'-kind spans are sampled.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            refs = pdf["media_ref"].to_numpy()
            doc = pdf["doc_id"].to_numpy()
            frame_idx = np.tile(np.arange(n_frames), n)
            keys = pd.Series(
                [f"{r}#f{i}" for r in refs for i in range(n_frames)]
            )
            payloads = decode_media_stub(keys)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(doc, n_frames),
                    "media_ref": np.repeat(refs, n_frames),
                    "frame_idx": frame_idx.astype(np.int32),
                    "t_offset_sec": (frame_idx / fps).astype(np.float64),
                    "payload": list(payloads),
                }
            )

    media = spans.filter((F.col("media_ref") != "") & (F.col("kind") == "video"))
    return media.select("doc_id", "media_ref").mapInPandas(
        gen,
        schema=(
            "doc_id string, media_ref string, frame_idx int, "
            "t_offset_sec double, payload binary"
        ),
    )


def rasterize_points_to_tiles(
    points: DataFrame,
    res: int = 5,
    grid: int = 8,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Group points by grid cell and rasterize each cell into a count grid.

    One shuffle (groupBy cell), then a vectorized histogram2d per group in
    applyInPandas. Payload is a compact binary uint16 grid — the raster tile.
    """

    def rasterize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(key[0])
        lat_lo, lat_hi, lng_lo, lng_hi = (
            float(x[0]) for x in cell_bounds_np([cell])
        )
        h, _, _ = np.histogram2d(
            pdf[lat_col].to_numpy(),
            pdf[lng_col].to_numpy(),
            bins=grid,
            range=[[lat_lo, lat_hi], [lng_lo, lng_hi]],
        )
        payload = h.astype("<u2").tobytes()
        return pd.DataFrame(
            [
                {
                    "cell": cell,
                    "res": res,
                    "grid": grid,
                    "n_points": int(len(pdf)),
                    "payload": payload,
                }
            ]
        )

    with_cell = points.withColumn(
        "cell", cell_encode_col(F.col(lat_col), F.col(lng_col), res)
    )
    return with_cell.groupBy("cell").applyInPandas(rasterize, schema=TILE_SCHEMA)


def vectorize_tiles(tiles: DataFrame) -> DataFrame:
    """Raster -> vector: decode payloads back into nonzero-pixel point features
    (pixel center lat/lng + count). Inverse of rasterize up to pixel quantization."""

    cols = ["cell", "px", "py", "cnt", "lat", "lng"]

    def vectorize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            lat_lo, lat_hi, lng_lo, lng_hi = cell_bounds_np(cells)
            outs = []
            # per-TILE loop only; all per-pixel work is numpy
            for i in range(len(pdf)):
                g = int(pdf["grid"].iat[i])
                h = np.frombuffer(bytes(pdf["payload"].iat[i]), dtype="<u2").reshape(g, g)
                ys, xs = np.nonzero(h)
                if not len(ys):
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "cell": np.full(len(ys), cells[i], dtype=np.int64),
                            "px": xs.astype(np.int32),
                            "py": ys.astype(np.int32),
                            "cnt": h[ys, xs].astype(np.int32),
                            "lat": lat_lo[i] + (ys + 0.5) * (lat_hi[i] - lat_lo[i]) / g,
                            "lng": lng_lo[i] + (xs + 0.5) * (lng_hi[i] - lng_lo[i]) / g,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return tiles.mapInPandas(vectorize, schema=FEATURE_SCHEMA)


def tile_pyramid(
    points: DataFrame,
    resolutions: tuple[int, ...] = (6, 4, 2),
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Per-cell point counts at EVERY resolution in ONE pass.

    Encodes the finest cell once, derives each coarser cell with the packed
    parent arithmetic, explodes the ladder array, and runs a single
    partial+final hash aggregation — one point-row shuffle for ALL levels
    (the shuffle payload shrinks to occupied cells map-side), instead of
    len(resolutions) separate scans+aggs. This is the rollup that feeds every
    zoom level of a tile server from the same scan.

    Reference parity: materializes the per-level tile occupancy the tree
    build walks (services/core/build_tree_service.py:85-161 per-level
    cluster sizes), as a queryable table. Output: (res, cell, n_points).
    """
    from raptor_service_spark.geo.grid import (
        RES_MULTIPLIER,
        cell_encode_col,
        cell_parent_col,
    )

    finest = max(resolutions)
    cell = cell_encode_col(F.col(lat_col), F.col(lng_col), finest)
    ladder = F.array(
        *[
            cell if r == finest else cell_parent_col(cell, finest, r)
            for r in sorted(resolutions, reverse=True)
        ]
    )
    return (
        points.select(F.explode(ladder).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .withColumn("res", F.floor(F.col("cell") / F.lit(RES_MULTIPLIER)).cast("long"))
        .select("res", "cell", "n_points")
    )
