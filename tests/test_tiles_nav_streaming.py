"""Tiles (raster<->vector round trip), navigation ops, streaming parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.datagen import gen_documents_df
from raptor_service_spark.functions.vector import embed_spans
from raptor_service_spark.geo.grid import cell_encode_np
from raptor_service_spark.operators.chunking import explode_spans
from raptor_service_spark.operators.navigation import (
    node_children,
    node_meta,
    node_parent,
    node_siblings,
    node_texts,
    path_to_root,
)
from raptor_service_spark.operators.tiles import (
    media_features,
    rasterize_points_to_tiles,
    vectorize_tiles,
)
from raptor_service_spark.operators.tree import TreeParams, build_tile_tree
from raptor_service_spark.streaming.events import (
    run_stream_to_memory,
    stream_events_from_dir,
    windowed_event_stats,
)

# ------------------------------------------------------------------- tiles


def test_rasterize_counts_conserved(spark):
    docs = gen_documents_df(spark, 200, seed=41).select("doc_id", "lat", "lng")
    tiles = rasterize_points_to_tiles(docs, res=4, grid=8).toPandas()
    assert tiles.n_points.sum() == 200
    # every point's cell appears
    pts = docs.toPandas()
    expect_cells = set(cell_encode_np(pts.lat.values, pts.lng.values, 4).tolist())
    assert set(tiles.cell) == expect_cells
    # payload is a dense uint16 grid
    assert all(len(bytes(p)) == 8 * 8 * 2 for p in tiles.payload)


def test_raster_vector_roundtrip(spark):
    docs = gen_documents_df(spark, 150, seed=42).select("doc_id", "lat", "lng")
    tiles = rasterize_points_to_tiles(docs, res=4, grid=8)
    feats = vectorize_tiles(tiles).toPandas()
    tiles_pd = tiles.toPandas()
    # count conservation per cell
    got = feats.groupby("cell")["cnt"].sum().to_dict()
    exp = tiles_pd.set_index("cell")["n_points"].to_dict()
    assert got == exp
    # vectorized feature centers land back in the same cell
    back = cell_encode_np(feats.lat.values, feats.lng.values, 4)
    assert (back == feats.cell.values).all()


def test_media_features_deterministic_stub(spark):
    docs = gen_documents_df(spark, 30, seed=43)
    spans = explode_spans(docs)
    feats = media_features(spans, dim=8).toPandas()
    assert len(feats) == spans.filter("media_ref != ''").count()
    assert feats.feature.map(len).eq(8).all()
    # determinism: same media_ref -> same feature
    f2 = media_features(explode_spans(docs), dim=8).toPandas()
    a = feats.sort_values("media_ref").reset_index(drop=True)
    b = f2.sort_values("media_ref").reset_index(drop=True)
    assert (a.media_ref == b.media_ref).all()
    assert all(list(x) == list(y) for x, y in zip(a.feature, b.feature))


# --------------------------------------------------------------- navigation


@pytest.fixture(scope="module")
def tree(spark):
    docs = gen_documents_df(spark, 30, seed=44)
    spans = embed_spans(explode_spans(docs), dim=16).persist()
    t = build_tile_tree(spans, TreeParams(res_ladder=(6, 3, 0), dim=16))
    t.nodes = t.nodes.persist()
    t.edges = t.edges.persist()
    t.nodes.count()
    return t


def test_navigation_ops(tree):
    edges_pd = tree.edges.toPandas()
    nodes_pd = tree.nodes.select("node_id", "level", "kind").toPandas()
    some_parent = edges_pd.parent_id.iloc[0]
    kids = node_children(tree.nodes, tree.edges, some_parent).toPandas()
    assert set(kids.node_id) == set(edges_pd[edges_pd.parent_id == some_parent].child_id)

    child = kids.node_id.iloc[0]
    par = node_parent(tree.nodes, tree.edges, child).toPandas()
    assert par.node_id.tolist() == [some_parent]

    sibs = node_siblings(tree.nodes, tree.edges, child).toPandas()
    assert set(sibs.node_id) == set(kids.node_id) - {child}

    meta = node_meta(tree.nodes, tree.edges, some_parent).toPandas()
    assert meta.children_count.iloc[0] == len(kids)

    texts = node_texts(tree.nodes, [child, some_parent]).toPandas()
    assert set(texts.node_id) == {child, some_parent}


def test_path_to_root(tree):
    nodes_pd = tree.nodes.select("node_id", "kind", "level").toPandas()
    leaf = nodes_pd[nodes_pd.kind == "leaf"].node_id.iloc[0]
    path = path_to_root(tree.nodes, tree.edges, leaf).toPandas()
    assert path.depth.tolist() == list(range(len(path)))
    assert path.node_id.iloc[0] == leaf
    assert path.kind.iloc[-1] == "root"
    # levels strictly increase along the path
    assert (np.diff(path.level.values) > 0).all()


# ---------------------------------------------------------------- streaming


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    import shutil

    src = str(tmp_path / "events_src")
    shutil.copytree(f"{sf_dir}/events.parquet", src) if False else None
    # events.parquet is a single file; stage it into a directory source
    import os

    os.makedirs(src, exist_ok=True)
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = (
        windowed_event_stats(batch)
        .orderBy("window_start", "event_type")
        .toPandas()
    )

    stream = stream_events_from_dir(spark, src)
    assert stream.isStreaming
    q = run_stream_to_memory(windowed_event_stats(stream), "evt_stats")
    q.awaitTermination(120)
    got = (
        spark.table("evt_stats").orderBy("window_start", "event_type").toPandas()
    )
    assert got.equals(expected)


def test_resize_media_plumbing(spark):
    """Resize: real average-pool over the real RLE codec; typed dims,
    decode-able output payloads, deterministic, partition-invariant."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.tiles import (
        decode_raster,
        raster_for_ref,
        resize_media,
    )

    spans = explode_spans(gen_documents_df(spark, 30, seed=44))
    out = resize_media(spans, out_w=4, out_h=4).toPandas()
    assert len(out) == spans.filter("media_ref != ''").count()
    assert (out.width == 4).all() and (out.height == 4).all()
    # every output payload parses back through the codec to a 4x4 raster
    # equal to the block mean of the source raster
    for _, row in out.iterrows():
        got = decode_raster(bytes(row.payload))
        src = raster_for_ref(row.media_ref).astype(np.float64)
        exp = src.reshape(4, 4, 4, 4).mean(axis=(1, 3)).round().astype(np.uint8)
        assert (got == exp).all()
    out2 = resize_media(spans.repartition(13), out_w=4, out_h=4).toPandas()
    a = out.sort_values("media_ref").payload.map(bytes).tolist()
    b = out2.sort_values("media_ref").payload.map(bytes).tolist()
    assert a == b


def test_media_codec_roundtrip_and_corruption():
    """The RTv1|w|h|RLE codec: encode∘decode identity on adversarial
    rasters (constant, alternating, >65535-run, non-square, 1x1); corrupt
    inputs (bad magic, truncated header, ragged stream, short run total)
    raise ValueError."""
    import pytest as _pytest

    from raptor_service_spark.operators.tiles import (
        decode_raster,
        encode_raster,
        raster_for_ref,
    )

    rasters = [
        np.zeros((16, 16), dtype=np.uint8),
        np.full((7, 3), 255, dtype=np.uint8),
        (np.indices((5, 9)).sum(axis=0) % 2 * 255).astype(np.uint8),  # checker
        np.ones((1, 1), dtype=np.uint8) * 42,
        np.zeros((300, 300), dtype=np.uint8),  # 90000-pixel run: must split
        raster_for_ref("media://x/1"),
    ]
    for img in rasters:
        assert (decode_raster(encode_raster(img)) == img).all()
    # compression is real on smooth (run-heavy) rasters: a 16-band
    # gradient packs 256 pixels into 16 runs = 48 RLE bytes + header
    smooth = np.repeat(np.arange(16, dtype=np.uint8) * 17, 16).reshape(16, 16)
    assert len(encode_raster(smooth)) == 8 + 16 * 3

    good = encode_raster(raster_for_ref("media://x/3"))
    with _pytest.raises(ValueError, match="magic"):
        decode_raster(b"XXXX" + good[4:])
    with _pytest.raises(ValueError, match="truncated"):
        decode_raster(good[:5])
    with _pytest.raises(ValueError, match="ragged"):
        decode_raster(good + b"\x01")
    with _pytest.raises(ValueError, match="pixels"):
        decode_raster(good[:-3])  # drop the last full run -> short total


def test_sample_frames_plumbing(spark):
    from raptor_service_spark.operators.tiles import sample_frames

    rows = [
        ("d1", "video", "media://d1/0"),
        ("d1", "video", "media://d1/3"),
        ("d2", "video", "media://d2/1"),
        ("d2", "image", "media://d2/2"),  # non-video: not frame-sampled
        ("d3", "text", ""),
    ]
    spans = spark.createDataFrame(rows, "doc_id string, kind string, media_ref string")
    n_videos = 3
    out = sample_frames(spans, n_frames=3, fps=24.0).toPandas()
    assert len(out) == 3 * n_videos
    assert set(out.frame_idx) <= {0, 1, 2}
    per = out.groupby("media_ref").frame_idx.nunique()
    assert (per == 3).all()
    # frame payloads differ across frames of one ref, same across runs
    one = out[out.media_ref == out.media_ref.iloc[0]].sort_values("frame_idx")
    assert len({bytes(p) for p in one.payload}) == 3
    assert abs(one.t_offset_sec.iloc[2] - 2 / 24.0) < 1e-12


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join == batch interval join."""
    import os
    import shutil

    from raptor_service_spark.streaming.events import (
        click_purchase_interval_join,
        stream_events_from_dir,
    )

    src = str(tmp_path / "events_src2")
    os.makedirs(src, exist_ok=True)
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    import pyspark.sql.functions as F

    expected = (
        click_purchase_interval_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
        )
        .orderBy("purchase_id", "click_id")
        .toPandas()
    )

    s = stream_events_from_dir(spark, src)
    assert s.isStreaming
    joined = click_purchase_interval_join(
        s.filter(F.col("event_type") == "purchase"),
        s.filter(F.col("event_type") == "click"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("cp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("cp_join").orderBy("purchase_id", "click_id").toPandas()
    assert len(got) > 0
    assert got.equals(expected)
