"""Span pipeline: explode/regroup + text splitting + markdown element kinds.

The reference's chunk invariant — unique ordered ``(doc_id, idx)``
(/root/reference/db/models/documents.py:43-44, ordered reads
repositories/chunk_repo_pg.py:37-45) — becomes the span-sequence equality
invariant here: after explode -> any processing -> regroup, each doc's
``(kind, text, media_ref, order)`` sequence must be unchanged
(BASELINE.json input_hint).

All operators are DataFrame programs; the only Python is the recursive text
splitter + markdown extractor, both Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raptor_service_spark.functions.text import chunk_id, token_count


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans[]) -> spans_flat with ordered idx + chunk ids.

    ``posexplode`` preserves array order, so idx == span position. Spans are
    first sorted by ``offset`` (they are generated sorted; re-sorting makes the
    invariant explicit and idempotent).
    """
    cols = [c for c in ("dataset_id", "lat", "lng") if c in docs.columns]
    out = docs.select(
        "doc_id",
        *cols,
        F.posexplode(
            F.expr("array_sort(spans, (a, b) -> a.offset - b.offset)")
        ).alias("idx", "span"),
    ).select(
        "doc_id",
        *cols,
        F.col("idx").cast("int").alias("idx"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    return out.withColumn("token_cnt", token_count(F.col("text"))).withColumn(
        "chunk_id", chunk_id(F.col("doc_id"), F.col("idx"))
    )


def regroup_spans(spans_flat: DataFrame) -> DataFrame:
    """Inverse of explode_spans: rebuild ordered spans arrays per doc.

    Order restored via sort_array on (idx, ...) structs — a shuffle on doc_id
    only; array order inside a group is deterministic regardless of task
    scheduling (the distributed-correctness point of the invariant test).
    """
    return (
        spans_flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("idx", "kind", "text", "media_ref", "offset"))
            ).alias("ispans")
        )
        .select(
            "doc_id",
            F.transform(
                "ispans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


# ---------------------------------------------------------------------------
# recursive character splitter (reference langchain_chunker.py:26-70:
# size 1200 / overlap 200 / separators ["\n\n", "\n", ".", " ", ""])
# ---------------------------------------------------------------------------

SEPARATORS = ["\n\n", "\n", ".", " ", ""]


def split_text_recursive(text: str, chunk_size: int = 1200, overlap: int = 200) -> list[str]:
    """Deterministic recursive splitter matching the reference's parameters.

    Greedy merge of separator-split pieces up to chunk_size with a suffix
    overlap carried into the next chunk; recursion falls through the separator
    ladder for oversized pieces.
    """

    def _split(t: str, seps: list[str]) -> list[str]:
        if len(t) <= chunk_size:
            return [t] if t.strip() else []
        if not seps:
            return [t[i : i + chunk_size] for i in range(0, len(t), chunk_size - overlap)]
        sep, rest = seps[0], seps[1:]
        parts = t.split(sep) if sep else list(t)
        pieces: list[str] = []
        for p in parts:
            if len(p) > chunk_size:
                pieces.extend(_split(p, rest))
            elif p:
                pieces.append(p)
        # greedy merge
        out: list[str] = []
        cur = ""
        joiner = sep if sep else ""
        for p in pieces:
            cand = (cur + joiner + p) if cur else p
            if len(cand) <= chunk_size:
                cur = cand
            else:
                if cur.strip():
                    out.append(cur)
                tail = cur[-overlap:] if overlap and cur else ""
                cur = (tail + joiner + p) if tail else p
                if len(cur) > chunk_size:
                    cur = p
        if cur.strip():
            out.append(cur)
        return out

    return _split(text, SEPARATORS)


def split_documents(docs: DataFrame, text_col: str = "text",
                    chunk_size: int = 1200, overlap: int = 200) -> DataFrame:
    """doc rows -> exploded (doc_id, idx, text, chunk_id) chunk rows.

    mapInPandas keeps the splitter Arrow-batched. Vectorized hot path
    (round 3): a doc of <= chunk_size chars IS its own single chunk
    (split_text_recursive's first base case), so the whole batch's short
    docs are emitted with numpy mask arithmetic — zero per-doc Python.
    Only OVERSIZED docs (rare at corpus scale; the reference's 1200-char
    window is ~4x a typical web paragraph) run the exact recursive state
    machine, which is inherently sequential per doc: every greedy-merge
    boundary depends on the previous chunk's overlap carry, so intra-doc
    prefix arithmetic cannot reproduce it. Output is byte-identical to the
    loop form (pytest-pinned, incl. the mixed short/long batch).
    Non-empty-text filter mirrors /root/reference/services/providers/
    langchain/langchain_chunker.py:66.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col].astype(str)
            lens = texts.str.len().to_numpy()
            # Python str.strip() (not SQL trim: strip drops \n\t too) — the
            # exact blank check _split applies to a short doc
            nonblank = (texts.str.strip() != "").to_numpy()
            short = (lens <= chunk_size) & nonblank
            long_m = lens > chunk_size
            outs = []
            if short.any():
                # short nonblank doc == its own chunk at idx 0
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf["doc_id"].to_numpy()[short],
                            "idx": np.zeros(int(short.sum()), dtype=np.int32),
                            "text": texts.to_numpy()[short],
                        }
                    )
                )
            if long_m.any():
                rows = []
                for did, txt in zip(
                    pdf["doc_id"].to_numpy()[long_m], texts.to_numpy()[long_m]
                ):
                    for i, c in enumerate(
                        split_text_recursive(txt, chunk_size, overlap)
                    ):
                        rows.append((did, i, c))
                outs.append(pd.DataFrame(rows, columns=["doc_id", "idx", "text"]))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    out = docs.select("doc_id", text_col).mapInPandas(
        gen, schema="doc_id string, idx int, text string"
    )
    return (
        out.filter(F.trim("text") != "")
        .withColumn("chunk_id", chunk_id(F.col("doc_id"), F.col("idx")))
        .withColumn("token_cnt", token_count(F.col("text")))
    )


# ---------------------------------------------------------------------------
# markdown element extraction (reference markdown_extractor.py:110-147 kinds,
# :11-100 table rip-out). Kinds: header/code/list/quote/table/text.
# Tables come in the reference's three forms — bordered pipe tables,
# borderless pipe tables (no leading |), and HTML <table> blocks (bare or
# wrapped in <body>/<html>) — all captured WITH their payload.
# ---------------------------------------------------------------------------

# bordered: |-led header row with >=2 columns, an alignment row, >=1 data rows
_BORDERED_TABLE_RE = re.compile(
    r"(?:^|\n)"
    r"\|[^\n]*\|[^\n]*\|[ \t]*\n"          # header: at least 3 pipes
    r"\|[ \t]*:?-+[-| :]*\n"               # alignment row
    r"(?:\|[^\n]*\|[^\n]*\|[ \t]*(?:\n|$))+"  # data rows
)
# borderless: rows contain | but do not start with it; alignment row between
_BORDERLESS_TABLE_RE = re.compile(
    r"(?:^|\n)"
    r"(?!\|)\S[^\n]*\|[^\n]*\n"            # header containing a pipe
    r"[ \t]*:?-+[-| :]*\n"                 # alignment row
    r"(?:(?!\|)\S[^\n]*\|[^\n]*(?:\n|$))+"  # data rows
)
# HTML: <table>...</table>, optionally wrapped in <body> / <html><body>
_HTML_TABLE_RE = re.compile(
    r"(?:^|\n)[ \t]*"
    r"(?:"
    r"<html[^>]*>\s*<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>\s*</html>"
    r"|<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>"
    r"|<table[^>]*>.*?</table>"
    r")[ \t]*(?=\n|$)",
    re.DOTALL | re.IGNORECASE,
)


def _find_table_regions(md: str) -> list[tuple[int, int, str]]:
    """All table occurrences as (start, end, payload), sorted by position.

    Mirrors the reference's rip-out order (markdown_extractor.py:36-100):
    bordered, then borderless, then HTML — each pass runs on a working copy
    where earlier matches are blanked (non-newline chars -> spaces, so
    offsets are preserved and blanked regions cannot re-match). ``start``
    points at the first payload character in the ORIGINAL text.
    """
    regions: list[tuple[int, int, str]] = []
    work = md
    for pat in (_BORDERED_TABLE_RE, _BORDERLESS_TABLE_RE, _HTML_TABLE_RE):
        if "|" not in work and pat is not _HTML_TABLE_RE:
            continue
        if pat is _HTML_TABLE_RE and "<table" not in work.lower():
            continue
        out = []
        last = 0
        for m in pat.finditer(work):
            raw = m.group()
            lead = len(raw) - len(raw.lstrip())
            start = m.start() + lead
            end = start + len(raw.strip())
            regions.append((start, end, md[start:end]))
            out.append(work[last : m.start()])
            out.append(
                "".join(c if c == "\n" else " " for c in work[m.start() : m.end()])
            )
            last = m.end()
        if out:
            out.append(work[last:])
            work = "".join(out)
    return sorted(regions)


def extract_tables_and_remainder(md: str) -> tuple[str, list[str]]:
    """Reference-parity surface (markdown_extractor.py:11-100,
    extract_tables_and_remainder with separate_tables=True): returns the
    text with tables removed plus the raw table payloads in rip order
    (bordered, borderless, HTML)."""
    regions = _find_table_regions(md)
    # rip order = pattern order; _find_table_regions sorts by position, so
    # recompute pattern-ordered payloads from the same masking walk
    ordered: list[str] = []
    work = md
    for pat in (_BORDERED_TABLE_RE, _BORDERLESS_TABLE_RE, _HTML_TABLE_RE):
        out, last = [], 0
        for m in pat.finditer(work):
            ordered.append(m.group().strip())
            out.append(work[last : m.start()])
            out.append(
                "".join(c if c == "\n" else " " for c in work[m.start() : m.end()])
            )
            last = m.end()
        if out:
            out.append(work[last:])
            work = "".join(out)
    remainder_parts = []
    pos = 0
    for s, e, _ in regions:
        remainder_parts.append(md[pos:s])
        remainder_parts.append("\n\n")
        pos = e
    remainder_parts.append(md[pos:])
    return "".join(remainder_parts), ordered


def _classify_lines(
    segment: str, base: int, spans: list[tuple[str, str, str, int]]
) -> None:
    """Line-oriented block classifier for table-free text: header / code /
    list / quote / text (reference markdown_extractor.py:110-147)."""
    lines = segment.split("\n")
    i, offset = 0, base

    def flush(kind: str, buf: list[str], off: int):
        text = "\n".join(buf).strip()
        if text:
            spans.append((kind, text, "", off))

    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            buf = [line]
            j = i + 1
            while j < len(lines) and not lines[j].startswith("```"):
                buf.append(lines[j])
                j += 1
            if j < len(lines):
                buf.append(lines[j])
            flush("code", buf, offset)
            offset += sum(len(l) + 1 for l in buf)
            i = j + 1
        elif line.startswith("#"):
            flush("header", [line.lstrip("#").strip()], offset)
            offset += len(line) + 1
            i += 1
        elif line.lstrip().startswith(("- ", "* ", "+ ")) or re.match(r"^\s*\d+\.\s", line):
            j = i
            buf = []
            while j < len(lines) and (
                lines[j].lstrip().startswith(("- ", "* ", "+ "))
                or re.match(r"^\s*\d+\.\s", lines[j])
            ):
                buf.append(lines[j])
                j += 1
            flush("list", buf, offset)
            offset += sum(len(l) + 1 for l in buf)
            i = j
        elif line.startswith(">"):
            j = i
            buf = []
            while j < len(lines) and lines[j].startswith(">"):
                buf.append(lines[j].lstrip("> "))
                j += 1
            flush("quote", buf, offset)
            offset += sum(len(l) + 1 for l in buf)
            i = j
        else:
            j = i
            buf = []
            while j < len(lines) and not (
                lines[j].startswith(("#", ">", "```"))
                or lines[j].lstrip().startswith(("- ", "* ", "+ "))
            ):
                buf.append(lines[j])
                j += 1
            flush("text", buf, offset)
            offset += sum(len(l) + 1 for l in buf)
            i = max(j, i + 1)


def extract_markdown_elements(md: str) -> list[tuple[str, str, str, int]]:
    """One markdown doc -> [(kind, text, media_ref, offset)] span tuples.

    Tables (bordered / borderless / HTML, reference markdown_extractor.py:
    36-100) are ripped first WITH payload capture: the span carries the raw
    table text AND a ``table://N`` media_ref, at the table's true character
    offset. The remaining segments go through the line classifier
    (header / code / list / quote / text). Pipe runs without an alignment
    row are NOT tables (same as the reference's patterns) and classify as
    text.
    """
    spans: list[tuple[str, str, str, int]] = []
    regions = _find_table_regions(md)
    pos, tbl_n = 0, 0
    for s, e, payload in regions:
        if s > pos:
            _classify_lines(md[pos:s], pos, spans)
        spans.append(("table", payload, f"table://{tbl_n}", s))
        tbl_n += 1
        pos = e
    if pos < len(md):
        _classify_lines(md[pos:], pos, spans)
    spans.sort(key=lambda t: t[3])
    return spans


def markdown_to_spans(docs: DataFrame, md_col: str = "text") -> DataFrame:
    """Markdown docs -> interleaved spans rows (ingest S1/S2 analog)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf["doc_id"], pdf[md_col]):
                for idx, (kind, text, ref, off) in enumerate(
                    extract_markdown_elements(str(txt))
                ):
                    rows.append((did, idx, kind, text, ref, off))
            yield pd.DataFrame(
                rows, columns=["doc_id", "idx", "kind", "text", "media_ref", "offset"]
            )

    return docs.select("doc_id", md_col).mapInPandas(
        gen,
        schema="doc_id string, idx int, kind string, text string, media_ref string, offset int",
    )
