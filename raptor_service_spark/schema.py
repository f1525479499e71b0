"""Explicit StructTypes for every engine table (SURVEY.md §1).

Mirrors the reference's SQLAlchemy models (fixed schema; typed columns instead
of JSONB escape hatches):
  * documents/spans — BASELINE.json input_hint authoritative shape; reference
    analog: chunks with unique (doc_id, idx) (/root/reference/db/models/documents.py:30-45)
  * embeddings      — /root/reference/db/models/embeddings.py:21-35 (vector(1024)
    -> array<float>)
  * tiles/edges/links — /root/reference/db/models/raptor.py:37-81
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

N_DIM = 64  # test dim; reference default is 1024 (/root/reference/db/models/base.py:13)

SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("offset", IntegerType(), False),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("dataset_id", StringType(), False),
        StructField("spans", ArrayType(SPAN, containsNull=False), False),
        StructField("lat", DoubleType(), False),
        StructField("lng", DoubleType(), False),
    ]
)

SPANS_FLAT = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("dataset_id", StringType(), False),
        StructField("idx", IntegerType(), False),
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("token_cnt", IntegerType(), True),
        StructField("chunk_id", StringType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lng", DoubleType(), False),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("id", StringType(), False),
        StructField("dataset_id", StringType(), False),
        StructField("owner_type", StringType(), False),  # 'chunk' | 'tree_node'
        StructField("owner_id", StringType(), False),
        StructField("model", StringType(), False),
        StructField("dim", IntegerType(), False),
        StructField("v", ArrayType(FloatType(), containsNull=False), False),
    ]
)

TILE_NODES = StructType(
    [
        StructField("tree_id", StringType(), False),
        StructField("node_id", StringType(), False),
        StructField("dataset_id", StringType(), False),
        StructField("level", IntegerType(), False),
        StructField("kind", StringType(), False),  # leaf | summary | root
        StructField("cell", LongType(), False),
        StructField("text", StringType(), False),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

TILE_EDGES = StructType(
    [
        StructField("tree_id", StringType(), False),
        StructField("parent_id", StringType(), False),
        StructField("child_id", StringType(), False),
    ]
)

NODE_CHUNKS = StructType(
    [
        StructField("tree_id", StringType(), False),
        StructField("node_id", StringType(), False),
        StructField("chunk_id", StringType(), False),
        StructField("rank", IntegerType(), False),  # first-seen order (utils/chunking.py:4-11)
    ]
)

SPAN_KINDS_TEXT = ("text", "header", "code", "list", "quote")
SPAN_KINDS_MEDIA = ("table", "image")
SPAN_KINDS = SPAN_KINDS_TEXT + SPAN_KINDS_MEDIA
