"""Span-sequence equality invariant (BASELINE.json input_hint; FIXTURES.md §7).

Reference analog: unique ordered (doc_id, idx)
(/root/reference/db/models/documents.py:43-44).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from raptor_service_spark.datagen import gen_documents_df, gen_documents_local
from raptor_service_spark.operators.chunking import (
    explode_spans,
    extract_markdown_elements,
    markdown_to_spans,
    regroup_spans,
    split_documents,
    split_text_recursive,
)


def test_explode_regroup_roundtrip(spark):
    docs = gen_documents_df(spark, 60, seed=7)
    flat = explode_spans(docs)
    back = regroup_spans(flat)
    orig = docs.select("doc_id", "spans").withColumn(
        "spans", F.expr("array_sort(spans, (a, b) -> a.offset - b.offset)")
    )
    # span-sequence equality per doc_id: (kind, text, media_ref, order)
    joined = orig.alias("o").join(back.alias("b"), "doc_id")
    mismatches = joined.filter(F.col("o.spans") != F.col("b.spans")).count()
    assert mismatches == 0
    assert back.count() == 60


def test_explode_idx_is_offset_order(spark):
    docs = gen_documents_df(spark, 20, seed=9)
    flat = explode_spans(docs).toPandas().sort_values(["doc_id", "idx"])
    for _, grp in flat.groupby("doc_id"):
        assert list(grp["idx"]) == list(range(len(grp)))
        assert list(grp["offset"]) == sorted(grp["offset"].tolist())


def test_distributed_generation_is_partition_invariant(spark):
    a = gen_documents_df(spark, 40, seed=3).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        gen_documents_df(spark.range(0).sparkSession, 40, seed=3)
        .repartition(17)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (a["doc_id"] == b["doc_id"]).all()
    assert a["spans"].map(len).tolist() == b["spans"].map(len).tolist()


def test_chunk_ids_match_reference_scheme(spark):
    docs = gen_documents_df(spark, 5, seed=1)
    flat = explode_spans(docs).toPandas()
    for _, r in flat.iterrows():
        assert r["chunk_id"] == f"{r['doc_id']}::c{r['idx']}"


def test_split_text_recursive_sizes():
    text = ("word " * 1000).strip()  # 4999 chars, no \n or .
    chunks = split_text_recursive(text, chunk_size=1200, overlap=200)
    assert all(len(c) <= 1200 for c in chunks)
    assert all(c.strip() for c in chunks)
    # coverage: every word present across chunks
    assert "word" in chunks[0] and "word" in chunks[-1]


def test_split_text_respects_paragraphs():
    text = "\n\n".join(f"paragraph {i} " + "x" * 100 for i in range(30))
    chunks = split_text_recursive(text, 1200, 200)
    assert all(len(c) <= 1200 for c in chunks)
    assert len(chunks) > 1


def test_split_documents_spark(spark):
    pdf = gen_documents_local(10, seed=5)
    pdf["text"] = pdf["spans"].map(lambda sp: "\n\n".join(s["text"] for s in sp if s["text"]))
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    out = split_documents(docs).toPandas()
    assert (out.groupby("doc_id")["idx"].apply(lambda s: list(s) == list(range(len(s))))).all()
    assert (out["text"].str.strip() != "").all()
    assert (out["token_cnt"] > 0).all()


def test_split_documents_vectorized_matches_loop(spark):
    """The round-3 vectorized short-doc fast path must be byte-identical to
    applying split_text_recursive per doc: mixed batch of short, exactly-
    chunk_size, whitespace-only (\\n\\t — Python strip, not SQL trim), empty,
    and three flavors of oversized docs."""
    rows = [
        ("s1", "a short doc."),
        ("s2", "x" * 1200),  # boundary: len == chunk_size -> single chunk
        ("b1", " \n\t \n"),  # blank by strip(): must vanish
        ("b2", ""),
        ("l1", ("word " * 1000).strip()),  # long, space-separated
        ("l2", "\n\n".join(f"para {i} " + "y" * 100 for i in range(30))),
        ("l3", "z" * 3000),  # no separators at all -> char windows
    ]
    expected = []
    for did, txt in rows:
        for i, c in enumerate(split_text_recursive(txt, 1200, 200)):
            if c.strip(" "):  # the operator's trim filter
                expected.append((did, i, c))
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = (
        split_documents(docs)
        .select("doc_id", "idx", "text")
        .toPandas()
        .sort_values(["doc_id", "idx"])
        .reset_index(drop=True)
    )
    exp = (
        pd.DataFrame(expected, columns=["doc_id", "idx", "text"])
        .sort_values(["doc_id", "idx"])
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.idx.tolist() == exp.idx.tolist()
    assert got.text.tolist() == exp.text.tolist()
    # also at a parallelism that splits the batch
    got13 = (
        split_documents(docs.repartition(13))
        .select("doc_id", "idx", "text")
        .toPandas()
        .sort_values(["doc_id", "idx"])
        .reset_index(drop=True)
    )
    assert got13.text.tolist() == exp.text.tolist()


def test_markdown_extractor_kinds():
    md = (
        "# Title\n"
        "Some intro paragraph.\n"
        "\n"
        "```python\nprint('hi')\n```\n"
        "- item one\n- item two\n"
        "> a quote line\n"
        "| a | b |\n|---|---|\n| 1 | 2 |\n"
        "closing text\n"
    )
    spans = extract_markdown_elements(md)
    kinds = [s[0] for s in spans]
    assert kinds[0] == "header"
    assert "code" in kinds and "list" in kinds and "quote" in kinds and "table" in kinds
    offs = [s[3] for s in spans]
    assert offs == sorted(offs)
    tbl = [s for s in spans if s[0] == "table"][0]
    assert tbl[2].startswith("table://")
    assert "| a | b |" in tbl[1]  # payload captured, not just the ref


def test_markdown_table_three_forms():
    """Reference markdown_extractor.py:36-100 semantics: bordered,
    borderless, and HTML tables are all ripped, payloads captured, offsets
    interleaved with surrounding elements."""
    from raptor_service_spark.operators.chunking import extract_tables_and_remainder

    md = (
        "# Doc\n"
        "intro text\n"
        "| h1 | h2 |\n|----|----|\n| a | b |\n| c | d |\n"
        "middle text\n"
        "col1 | col2\n--- | ---\nx | y\nz | w\n"
        "more text\n"
        "<table><tr><td>cell</td></tr></table>\n"
        "<body><table><tr><td>v2</td></tr></table></body>\n"
        "<html><body><table><tr><td>v3</td></tr></table></body></html>\n"
        "closing\n"
    )
    spans = extract_markdown_elements(md)
    tables = [s for s in spans if s[0] == "table"]
    assert len(tables) == 5
    payloads = [t[1] for t in tables]
    assert payloads[0].startswith("| h1 | h2 |") and "| c | d |" in payloads[0]
    assert payloads[1].startswith("col1 | col2") and "z | w" in payloads[1]
    assert payloads[2] == "<table><tr><td>cell</td></tr></table>"
    assert payloads[3].startswith("<body>") and "v2" in payloads[3]
    assert payloads[4].startswith("<html>") and "v3" in payloads[4]
    # media_refs numbered in document order; offsets strictly increasing
    assert [t[2] for t in tables] == [f"table://{i}" for i in range(5)]
    offs = [s[3] for s in spans]
    assert offs == sorted(offs)
    # interleaved text survives classification
    texts = [s[1] for s in spans if s[0] == "text"]
    assert any("middle text" in t for t in texts)
    assert any("closing" in t for t in texts)

    remainder, ripped = extract_tables_and_remainder(md)
    assert len(ripped) == 5
    assert "| h1 | h2 |" not in remainder and "<table>" not in remainder
    assert "intro text" in remainder and "closing" in remainder


def test_markdown_pipe_run_without_alignment_is_text():
    md = "before\na | b\nc | d\nafter\n"
    spans = extract_markdown_elements(md)
    assert all(s[0] != "table" for s in spans)


def test_markdown_to_spans_spark(spark):
    md = "# H\ntext body here\n\n- a\n- b\n"
    docs = spark.createDataFrame([("d1", md), ("d2", md)], "doc_id string, text string")
    out = markdown_to_spans(docs).toPandas().sort_values(["doc_id", "idx"])
    assert set(out["doc_id"]) == {"d1", "d2"}
    d1 = out[out.doc_id == "d1"]
    assert list(d1["kind"]) == ["header", "text", "list"]
