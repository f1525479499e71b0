"""Raster <-> vector tile materialization of media_ref payloads (north_star).

Replaces the reference's node persistence (/root/reference/services/core/
build_tree_service.py:318-400) for MEDIA spans: per grid cell, media-bearing
spans are rasterized into a fixed-size count grid (the "raster tile") and can
be vectorized back into point features (the "vector tile").

Media payloads are a REAL codec (round 3; no image/audio libs in this
container, so the "camera" is a deterministic synthetic raster, but the
byte format, the encoder, and the parser are genuine):

  media payload = b"RTv1" | uint16le w | uint16le h | RLE payload
  RLE payload   = sequence of (uint16le run_len, uint8 value) pairs,
                  row-major pixels, total run == w*h

``encode_raster`` writes it, ``decode_media`` parses + validates it
(corrupt magic / truncated header / run-sum mismatch raise ValueError —
pytest-pinned). The synthetic source raster for a media_ref is the
16-level-quantized md5 chain of the ref (deterministic on every executor).
A real deployment swaps ``raster_for_ref`` for PIL/ffmpeg decoding inside
the same mapInPandas; schema, batching, and everything downstream
(feature extraction, average-pool resize, frame sampling) are unchanged
and operate on the DECODED pixels.

Count-grid tile payload format (rasterize_points_to_tiles, unrelated to
the media codec, versionless-simple):
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


MEDIA_MAGIC = b"RTv1"
_HDR = len(MEDIA_MAGIC) + 4  # magic + uint16 w + uint16 h


def encode_raster(img: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 raster as ``RTv1|w|h|RLE`` bytes (row-major
    runs of (uint16le run_len, uint8 value); runs longer than 65535 split)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    flat = img.reshape(-1)
    # run boundaries, vectorized
    change = np.nonzero(np.diff(flat))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(flat)]))
    parts = [MEDIA_MAGIC, np.array([w, h], dtype="<u2").tobytes()]
    runs, vals = [], []
    for s, e in zip(starts, ends):
        n = int(e - s)
        while n > 0:
            take = min(n, 65535)
            runs.append(take)
            vals.append(int(flat[s]))
            n -= take
    rle = np.empty(len(runs) * 3, dtype=np.uint8)
    rl = np.asarray(runs, dtype="<u2")
    rle[0::3] = rl.view(np.uint8)[0::2]  # lo byte
    rle[1::3] = rl.view(np.uint8)[1::2]  # hi byte
    rle[2::3] = np.asarray(vals, dtype=np.uint8)
    parts.append(rle.tobytes())
    return b"".join(parts)


def decode_raster(payload: bytes) -> np.ndarray:
    """Parse ``RTv1|w|h|RLE`` into a (h, w) uint8 raster. Raises ValueError
    on corrupt input: bad magic, truncated header, ragged RLE stream, or a
    run total that does not cover w*h pixels."""
    buf = bytes(payload)
    if len(buf) < _HDR:
        raise ValueError(f"media payload truncated: {len(buf)} < header {_HDR}")
    if buf[: len(MEDIA_MAGIC)] != MEDIA_MAGIC:
        raise ValueError(f"bad media magic {buf[:len(MEDIA_MAGIC)]!r}")
    w, h = np.frombuffer(buf, dtype="<u2", count=2, offset=len(MEDIA_MAGIC))
    body = buf[_HDR:]
    if len(body) % 3:
        raise ValueError(f"ragged RLE stream: {len(body)} bytes")
    rle = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
    runs = rle[:, 0].astype(np.uint32) + (rle[:, 1].astype(np.uint32) << 8)
    vals = rle[:, 2]
    total = int(runs.sum())
    if total != int(w) * int(h):
        raise ValueError(f"RLE covers {total} pixels, expected {int(w) * int(h)}")
    return np.repeat(vals, runs).reshape(int(h), int(w))


def raster_for_ref(ref: str, w: int = 16, h: int = 16) -> np.ndarray:
    """The deterministic synthetic source raster for a media_ref: chained
    md5 of the ref, quantized to 16 gray levels (b // 16 * 17 — gives the
    RLE real runs). Plays the role of the upstream camera/decoder; every
    executor derives the same pixels from the ref alone."""
    need = w * h
    buf = b""
    seed = str(ref).encode()
    while len(buf) < need:
        seed = hashlib.md5(seed).digest()
        buf += seed
    raw = np.frombuffer(buf[:need], dtype=np.uint8)
    return (raw // 16 * 17).astype(np.uint8).reshape(h, w)


def encode_media_payloads(media_refs: pd.Series, w: int = 16, h: int = 16) -> list:
    """The 'ingest' side: encoded raster bytes per ref (datagen analog)."""
    return [encode_raster(raster_for_ref(r, w, h)) for r in media_refs]


def decode_media_payloads(payloads) -> list:
    """The 'decode' side used by every media operator: parse + validate."""
    return [decode_raster(p) for p in payloads]


def media_features(spans: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extract media spans from DECODED pixels: encode the
    deterministic raster per ref (ingest side), parse it back through the
    real RLE codec, and emit the first ``dim`` pixels / 255 as the feature.

    Real plumbing: mapInPandas, typed output schema, only media-kind spans.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = encode_media_payloads(pdf["media_ref"])
            imgs = decode_media_payloads(payloads)
            feats = [
                [float(b) / 255.0 for b in img.reshape(-1)[:dim]] for img in imgs
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
        gen, schema="doc_id string, media_ref string, kind string, feature array<double>"
    )


def raster_for_ref_hex(ref: str, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic raster whose byte stream chains md5 over HEX STRINGS
    (L1 = md5(ref), L_{k+1} = md5(hex(L_k))) instead of raw digests — the
    variant an ANSI-SQL oracle can recompute (DuckDB's md5 is
    VARCHAR-only). Same 16-level quantization as raster_for_ref."""
    need = w * h
    buf = b""
    link = str(ref)
    while len(buf) < need:
        link = hashlib.md5(link.encode()).hexdigest()
        buf += bytes.fromhex(link)
    raw = np.frombuffer(buf[:need], dtype=np.uint8)
    return (raw // 16 * 17).astype(np.uint8).reshape(h, w)


def media_ahash(spans: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
    """Perceptual average-hash per media span (+ a perturbed thumbnail twin
    per image — the planted near-duplicate): rasters go through the REAL
    encode→decode RLE codec, then aHash = (pixel > image mean) bits packed
    into two 32-bit words (sign-safe BIGINTs). Strict > so the tie rule is
    shared with the SQL twin. Output: (img, w0, w1) — 8 B of state per
    image regardless of resolution, the 64×-compression that makes
    image-dedup pair generation a bit-twiddling join at 10^12 scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"img": [], "w0": [], "w1": []}
            for ref in pdf["media_ref"]:
                base = decode_raster(encode_raster(raster_for_ref_hex(ref, w, h)))
                for t in (0, 1):
                    img = base.reshape(-1).astype(np.int64).copy()
                    if t:  # thumbnail twin: one quant-step bump on pixel 0
                        img[0] = min(img[0] + 17, 255)
                    mean = img.sum() / img.size
                    bits = (img > mean).astype(np.int64)
                    w0 = int((bits[:32] << np.arange(32)).sum())
                    w1 = int((bits[32:64] << np.arange(32)).sum())
                    rows["img"].append(f"{ref}#{t}")
                    rows["w0"].append(w0)
                    rows["w1"].append(w1)
            yield pd.DataFrame(rows)

    media = spans.filter(F.col("media_ref") != "")
    return media.select("media_ref").mapInPandas(
        gen, schema="img string, w0 long, w1 long"
    )


def ahash_neardup_pairs(hashes: DataFrame, max_ham: int = 3) -> DataFrame:
    """Hamming-LSH near-dup join over aHash words: 4 bands of 16 bits —
    pigeonhole-EXACT for max_ham <= 3 (3 flipped bits cannot touch all 4
    bands, so every qualifying pair shares a band value; same guarantee
    structure as simhash_pairs). One band equi-join, bit_count(xor)
    refine, distinct-pair dedup on the (small) candidate output."""
    assert max_ham < 4, "4x16-bit banding is exact only for max_ham <= 3"
    banded = hashes.select(
        "img",
        "w0",
        "w1",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("b"), (F.col("w0") % 65536).alias("v")),
                F.struct(
                    F.lit(1).alias("b"), F.floor(F.col("w0") / 65536).alias("v")
                ),
                F.struct(F.lit(2).alias("b"), (F.col("w1") % 65536).alias("v")),
                F.struct(
                    F.lit(3).alias("b"), F.floor(F.col("w1") / 65536).alias("v")
                ),
            )
        ).alias("band"),
    ).select("img", "w0", "w1", F.col("band.b").alias("b"), F.col("band.v").alias("v"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = (
        F.bit_count(F.expr("a.w0 ^ b.w0")) + F.bit_count(F.expr("a.w1 ^ b.w1"))
    ).cast("long")
    return (
        a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.v") == F.col("b.v"))
               & (F.col("a.img") < F.col("b.img")))
        .select(
            F.col("a.img").alias("img_a"),
            F.col("b.img").alias("img_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_ham)
        .distinct()
    )


def media_dhash(spans: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
    """Perceptual difference-hash per media span (+ the same perturbed
    thumbnail twin as `media_ahash`): dHash = horizontal-gradient bits
    (pixel[r][c+1] > pixel[r][c], 8×7 = 56 bits) packed into two words.
    Gradient hashes are robust to global brightness/contrast shifts that
    flip aHash bits wholesale — the standard second opinion in image-dedup
    stacks (pair it with aHash; agreement = high-precision dup). Bit order
    gi = r·(w−1)+c matches the SQL twin's (i//w)·(w−1) + i%w mapping."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nbits = h * (w - 1)
        for pdf in batches:
            rows = {"img": [], "w0": [], "w1": []}
            for ref in pdf["media_ref"]:
                base = decode_raster(encode_raster(raster_for_ref_hex(ref, w, h)))
                for t in (0, 1):
                    flat = base.reshape(-1).astype(np.int64).copy()
                    if t:  # thumbnail twin: one quant-step bump on pixel 0
                        flat[0] = min(flat[0] + 17, 255)
                    img = flat.reshape(h, w)
                    bits = (img[:, 1:] > img[:, :-1]).astype(np.int64).reshape(-1)
                    w0 = int((bits[:32] << np.arange(32)).sum())
                    w1 = int((bits[32:] << np.arange(nbits - 32)).sum())
                    rows["img"].append(f"{ref}#{t}")
                    rows["w0"].append(w0)
                    rows["w1"].append(w1)
            yield pd.DataFrame(rows)

    media = spans.filter(F.col("media_ref") != "")
    return media.select("media_ref").mapInPandas(
        gen, schema="img string, w0 long, w1 long"
    )


def resize_media(
    spans: DataFrame, out_w: int = 4, out_h: int = 4, src_w: int = 16, src_h: int = 16
) -> DataFrame:
    """Resize media payloads (brief: multimodal resize as a Pandas UDF over
    mapInPandas). The per-ref raster goes through the REAL RLE codec
    (encode at ingest, parse back), then a vectorized average-pool (block
    mean) per Arrow batch; the resized raster is re-ENCODED with the same
    codec, so the output payload is itself decode-able.
    """
    fy, fx = src_h // out_h, src_w // out_w

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            imgs = decode_media_payloads(
                encode_media_payloads(pdf["media_ref"], src_w, src_h)
            )
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
                    "payload": [encode_raster(p) for p in pooled],
                }
            )

    media = spans.filter(F.col("media_ref") != "")
    return media.select("doc_id", "media_ref").mapInPandas(
        gen,
        schema="doc_id string, media_ref string, width int, height int, payload binary",
    )


def sample_frames(spans: DataFrame, n_frames: int = 4, fps: float = 24.0) -> DataFrame:
    """Frame-sample video media spans (brief: frame-sample as a Pandas UDF):
    one row per sampled frame with (frame_idx, t_offset_sec, payload). Each
    frame is a full RLE-encoded raster keyed on (media_ref, frame_idx) —
    real ffmpeg frame extraction drops into the same kernel, and every
    emitted payload parses back through decode_raster. Only 'video'-kind
    spans are sampled.
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
            payloads = encode_media_payloads(keys)
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


def phash_dct_table(scale: int = 16384) -> list:
    """Fixed-point 8-point DCT-II coefficient table: (u, x, t) with
    t = round(scale * s(u) * cos((2x+1)uπ/16)), s(0)=sqrt(1/8),
    s(u>0)=1/2 — generated ONCE here and embedded as literals by BOTH
    the numpy kernel and the SQL oracle, so the integer DCT is identical
    by construction (no engine libm anywhere)."""
    import math

    out = []
    for u in range(8):
        s = math.sqrt(1.0 / 8.0) if u == 0 else 0.5
        for x in range(8):
            v = scale * s * math.cos((2 * x + 1) * u * math.pi / 16.0)
            t = int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
            out.append((u, x, t))
    return out


def media_phash(spans: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
    """Perceptual DCT hash (pHash) per media span (+ the same perturbed
    thumbnail twin as aHash/dHash): pixels → EXACT fixed-point integer
    8×8 DCT-II (T·P·Tᵀ with the shared 14-bit coefficient table — every
    product < 2^53, so int64 matmul is exact) → top-left 4×4 block minus
    DC = 15 AC coefficients → bits = coeff > exact integer median (8th
    of 15). The frequency-domain member of the image-dedup trio
    (aHash = brightness, dHash = gradient, pHash = structure); robust to
    the high-frequency noise that flips both. Output: (img, hv) — a
    15-bit hash, one BIGINT per image."""
    tbl = np.zeros((8, 8), dtype=np.int64)
    for u, x, t in phash_dct_table():
        tbl[u, x] = t

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"img": [], "hv": []}
            for ref in pdf["media_ref"]:
                base = decode_raster(encode_raster(raster_for_ref_hex(ref, w, h)))
                for t in (0, 1):
                    img = base.astype(np.int64).copy()
                    if t:
                        img[0, 0] = min(img[0, 0] + 17, 255)
                    c = tbl @ img @ tbl.T
                    ac = c[:4, :4].reshape(-1)[1:]  # drop DC
                    med = np.sort(ac)[7]
                    bits = (ac > med).astype(np.int64)
                    hv = int((bits << np.arange(15)).sum())
                    rows["img"].append(f"{ref}#{t}")
                    rows["hv"].append(hv)
            yield pd.DataFrame(rows)

    media = spans.filter(F.col("media_ref") != "")
    return media.select("media_ref").mapInPandas(gen, schema="img string, hv long")


def phash_neardup_pairs(hashes: DataFrame, max_ham: int = 2) -> DataFrame:
    """Hamming-LSH join over 15-bit pHashes: 3 bands of 5 bits —
    pigeonhole-exact for max_ham <= 2. Same guarantee structure as the
    aHash/dHash 4×16 banding."""
    assert max_ham < 3, "3x5-bit banding is exact only for max_ham <= 2"
    banded = hashes.select(
        "img",
        "hv",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("b"), (F.col("hv") % 32).alias("v")),
                F.struct(
                    F.lit(1).alias("b"),
                    (F.floor(F.col("hv") / 32) % 32).alias("v"),
                ),
                F.struct(
                    F.lit(2).alias("b"), F.floor(F.col("hv") / 1024).alias("v")
                ),
            )
        ).alias("band"),
    ).select("img", "hv", F.col("band.b").alias("b"), F.col("band.v").alias("v"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.expr("a.hv ^ b.hv")).cast("long")
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.img") < F.col("b.img")),
        )
        .select(
            F.col("a.img").alias("img_a"),
            F.col("b.img").alias("img_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_ham)
        .distinct()
    )
