"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1).

Everything is reproducible from ``(seed, n_docs)`` alone — no external data
(BASELINE.json north_rule). Generation is DISTRIBUTED: ``spark.range(n_docs)``
partitions the id space and a ``mapInPandas`` UDF materializes each doc from a
per-doc counter-based RNG, so the same corpus comes out regardless of
parallelism or partitioning — and generating 10^12 docs is the same program
with a bigger range.

Doc geography is intentionally SKEWED: 60% of docs cluster into a handful of
metro hotspots so that hot-cell handling (salting, AQE skew join) is exercised
honestly, mirroring the reference's forced single-cluster stall case
(/root/reference/services/core/build_tree_service.py:109-114).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from raptor_service_spark.schema import SPAN_KINDS_MEDIA, SPAN_KINDS_TEXT

_WORDS = (
    "grid tile span raptor summary vector cosine polygon shard atlas basin "
    "cedar delta ember flint grove harbor inlet juniper knoll lagoon mesa "
    "north orbit prairie quarry ridge summit terrace upland vale willow "
    "yonder zephyr anchor beacon cairn dune estuary fjord glacier"
).split()

_HOTSPOTS = [  # (lat, lng) metro hotspots for skew
    (40.7, -74.0),
    (51.5, -0.1),
    (35.7, 139.7),
    (-33.9, 151.2),
    (37.8, -122.4),
]


def doc_id_for(seed: int, i: int) -> str:
    """FIXTURES.md §1: deterministic doc ids."""
    return hashlib.sha256(f"doc-{seed}-{i}".encode()).hexdigest()[:32]


def _gen_doc(seed: int, i: int) -> dict:
    rng = np.random.default_rng([seed, i])
    did = doc_id_for(seed, i)
    n_spans = int(rng.integers(8, 21))  # 8-20 spans, mirrors reference factories
    spans = []
    offset = 0
    for j in range(n_spans):
        is_media = rng.random() < 0.15
        if is_media:
            kind = SPAN_KINDS_MEDIA[int(rng.integers(0, len(SPAN_KINDS_MEDIA)))]
            text = ""
            media_ref = f"media://{did}/{j}"
            length = int(rng.integers(64, 4096))  # opaque payload size
        else:
            kind = SPAN_KINDS_TEXT[int(rng.integers(0, len(SPAN_KINDS_TEXT)))]
            n_words = int(rng.integers(5, 40))
            words = rng.choice(_WORDS, size=n_words)
            text = " ".join(words.tolist())
            media_ref = ""
            length = len(text)
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
        )
        offset += length + 1
    # 60% hotspot (skew), 40% uniform
    if rng.random() < 0.6:
        hlat, hlng = _HOTSPOTS[int(rng.integers(0, len(_HOTSPOTS)))]
        lat = float(np.clip(hlat + rng.normal(0, 0.5), -89.9, 89.9))
        lng = float(np.clip(hlng + rng.normal(0, 0.5), -179.9, 179.9))
    else:
        lat = float(rng.uniform(-85.0, 85.0))
        lng = float(rng.uniform(-179.9, 179.9))
    return {
        "doc_id": did,
        "dataset_id": f"ds-{seed}",
        "spans": spans,
        "lat": lat,
        "lng": lng,
    }


def gen_documents_df(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic corpus: same rows at any parallelism."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_gen_doc(seed, int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["spans"] = out["spans"].map(
                lambda sp: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp]
            )
            yield out

    schema = (
        "doc_id string, dataset_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "lat double, lng double"
    )
    npart = max(4, min(256, n_docs // 256 or 1))
    return spark.range(0, n_docs, numPartitions=npart).mapInPandas(gen, schema=schema)


def gen_documents_local(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side tiny corpora for unit tests (same rows as the Spark path)."""
    return pd.DataFrame([_gen_doc(seed, i) for i in range(n_docs)])


def gen_query_polygons(seed: int = 42, n: int = 8) -> list[np.ndarray]:
    """Seeded convex query polygons (FIXTURES.md §5): 3-12 vertices."""
    rng = np.random.default_rng([seed, 7777])
    polys = []
    for _ in range(n):
        # convex polygon: sorted angles around a random center
        cx_lat = rng.uniform(-60, 60)
        cx_lng = rng.uniform(-150, 150)
        k = int(rng.integers(3, 13))
        angles = np.sort(rng.uniform(0, 2 * np.pi, k))
        radius = rng.uniform(2.0, 15.0, k)
        lat = np.clip(cx_lat + radius * np.sin(angles), -89.0, 89.0)
        lng = np.clip(cx_lng + radius * np.cos(angles), -179.9, 179.9)
        polys.append(np.stack([lat, lng], axis=1))
    return polys


def gen_query_vectors(seed: int = 42, n: int = 4, dim: int = 64) -> np.ndarray:
    """Seeded L2-normalized query vectors (reference factories pattern:
    /root/reference/tests/factories/build_factories.py:27-36)."""
    rng = np.random.default_rng([seed, 8888])
    v = rng.normal(size=(n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)
