"""Non-hermetic C7 adapter (functions/remote_embed.py) against a local stub
server: batching under a token budget, bounded retry, and a tile-tree build
whose vectors are IDENTICAL to the hermetic default because the stub serves
the same deterministic embedding (VERDICT r4 item 4)."""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest
from pyspark.sql import functions as F

from raptor_service_spark.functions.remote_embed import (
    pack_batches,
    remote_embed_fn,
    remote_summarize_fn,
)
from raptor_service_spark.functions.vector import hash_embed_np

DIM = 16


class _StubHandler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 - http.server API
        srv = self.server
        srv.n_attempts += 1
        if srv.fail_next > 0:
            srv.fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        texts = body["input"]
        srv.batch_sizes.append(len(texts))
        if body.get("task") == "summarize":
            # the hermetic default's semantics: first 512 chars of the
            # joined children (the prompt arrives pre-joined)
            data = [{"summary": t[:512]} for t in texts]
        else:
            mat = hash_embed_np(texts, DIM)
            data = [{"embedding": [float(x) for x in mat[i]]}
                    for i in range(len(texts))]
        out = json.dumps({"data": data}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture()
def stub():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    srv.fail_next = 0
    srv.n_attempts = 0
    srv.batch_sizes = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _endpoint(srv) -> str:
    return f"http://127.0.0.1:{srv.server_address[1]}/embed"


def test_pack_batches_budget_and_cap():
    # items of 5 tokens each, budget 12 -> pairs; batch_size binds at 2 too
    assert pack_batches([5, 5, 5, 5, 5], 10, 12) == [[0, 1], [2, 3], [4]]
    # oversized single item still ships alone (>=1 rule)
    assert pack_batches([50, 2, 2], 10, 10) == [[0], [1, 2]]
    # batch_size cap without budget
    assert pack_batches([1] * 5, 2, None) == [[0, 1], [2, 3], [4]]
    assert pack_batches([], 4, 8) == []


def test_adapter_matches_stub_vectors(spark, stub):
    texts = [f"doc {i} text body" for i in range(37)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    fn = remote_embed_fn(_endpoint(stub), dim=DIM, batch_size=8)
    got = {r.text: r.v for r in df.select("text", fn(F.col("text")).alias("v")).collect()}
    want = hash_embed_np(texts, DIM)
    for i, t in enumerate(texts):
        assert np.allclose(got[t], want[i], atol=1e-6)
    # batching honored server-side
    assert all(b <= 8 for b in stub.batch_sizes) and len(stub.batch_sizes) >= 5


def test_adapter_token_budget_splits(spark, stub):
    texts = ["w " * 30 for _ in range(10)]  # 30 tokens each
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    fn = remote_embed_fn(_endpoint(stub), dim=DIM, batch_size=100, token_budget=70)
    df.select(fn(F.col("text")).alias("v")).collect()
    assert stub.batch_sizes and max(stub.batch_sizes) <= 2  # 2*30 <= 70 < 3*30


def test_adapter_retries_transient_errors(spark, stub):
    stub.fail_next = 2  # two 503s, then healthy
    df = spark.createDataFrame([("hello world",)], "text string")
    fn = remote_embed_fn(_endpoint(stub), dim=DIM, max_retries=3, backoff_s=0.01)
    rows = df.select(fn(F.col("text")).alias("v")).collect()
    assert len(rows[0].v) == DIM
    assert stub.n_attempts >= 3  # 2 failures + 1 success


def test_adapter_exhausted_retries_raise(spark, stub):
    stub.fail_next = 10
    df = spark.createDataFrame([("boom",)], "text string")
    fn = remote_embed_fn(_endpoint(stub), dim=DIM, max_retries=1, backoff_s=0.01)
    with pytest.raises(Exception, match="remote embed failed|failed after"):
        df.select(fn(F.col("text")).alias("v")).collect()


def test_tree_build_with_adapter_equals_hermetic(spark, stub):
    """The adapter drives a full tile-tree build through TreeParams.embed_fn;
    because the stub serves the hermetic embedding, every node table must be
    IDENTICAL to the default build — the adapter is pure transport."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.functions.vector import embed_spans
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.tree import TreeParams, build_tile_tree

    docs = gen_documents_df(spark, 20, seed=23)
    spans = embed_spans(explode_spans(docs), dim=DIM).persist()
    spans.count()
    base = dict(res_ladder=(6, 3, 0), summary_cap=8, salt_buckets=2, dim=DIM)
    t_default = build_tile_tree(spans, TreeParams(**base))
    t_remote = build_tile_tree(
        spans,
        TreeParams(
            **base,
            embed_fn=remote_embed_fn(
                _endpoint(stub), dim=DIM, batch_size=16, token_budget=4096
            ),
        ),
    )

    def sig(tree):
        nodes = sorted(
            (r.node_id, r.level, r.kind, r.cell, r.text,
             tuple(round(float(x), 6) for x in r.v))
            for r in tree.nodes.select("node_id", "level", "kind", "cell",
                                       "text", "v").collect()
        )
        edges = sorted(map(tuple, tree.edges.select("parent_id", "child_id").collect()))
        return nodes, edges

    assert sig(t_remote) == sig(t_default)
    assert stub.n_attempts > 0  # the build really went through HTTP
    spans.unpersist()


def test_summarize_adapter_matches_hermetic_default(spark, stub):
    """remote_summarize_fn on array<string> groups: the stub applies the
    hermetic default's semantics (first 512 chars of the joined children),
    so outputs must equal fake_summarize exactly."""
    from raptor_service_spark.functions.text import fake_summarize

    rows = [
        (1, ["alpha text", "beta text", "gamma"]),
        (2, ["x" * 600]),                 # truncation branch
        (3, ["one"]),
    ]
    df = spark.createDataFrame(rows, "gid int, texts array<string>")
    fn = remote_summarize_fn(_endpoint(stub), batch_size=2, token_budget=256)
    got = {
        r.gid: r.s
        for r in df.select("gid", fn(F.col("texts")).alias("s")).collect()
    }
    want = {
        r.gid: r.s
        for r in df.select(
            "gid", fake_summarize(F.col("texts")).alias("s")
        ).collect()
    }
    assert got == want
    assert all(b <= 2 for b in stub.batch_sizes)


def test_tree_build_with_both_adapters_equals_hermetic(spark, stub):
    """C6 + C7 adapters together: a tile-tree build through BOTH hooks is
    bit-identical to the hermetic default when the stub serves the default
    semantics — closing the full adapter pair (reference summarizer.py +
    voyage_client.py analogs)."""
    from raptor_service_spark.datagen import gen_documents_df
    from raptor_service_spark.functions.vector import embed_spans
    from raptor_service_spark.operators.chunking import explode_spans
    from raptor_service_spark.operators.tree import TreeParams, build_tile_tree

    docs = gen_documents_df(spark, 15, seed=31)
    spans = embed_spans(explode_spans(docs), dim=DIM).persist()
    spans.count()
    base = dict(res_ladder=(6, 3, 0), summary_cap=8, salt_buckets=2, dim=DIM)
    t_default = build_tile_tree(spans, TreeParams(**base))
    t_remote = build_tile_tree(
        spans,
        TreeParams(
            **base,
            embed_fn=remote_embed_fn(_endpoint(stub), dim=DIM, batch_size=16),
            summarize_fn=remote_summarize_fn(_endpoint(stub), batch_size=8),
        ),
    )

    def sig(tree):
        return sorted(
            (r.node_id, r.level, r.kind, r.cell, r.text,
             tuple(round(float(x), 6) for x in r.v))
            for r in tree.nodes.select("node_id", "level", "kind", "cell",
                                       "text", "v").collect()
        )

    assert sig(t_remote) == sig(t_default)
    spans.unpersist()
