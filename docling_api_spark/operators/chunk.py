"""Hybrid chunking (reference D6, services/chunking_service.py:28-95).

The reference wraps docling's ``HybridChunker(tokenizer=MiniLM,
max_tokens=512)`` and per chunk records: content, contextualized text
(section-heading prefixed), chunk_index, page_number (first doc item's
provenance), section_title (last heading seen), token_count. We
re-derive those semantics deterministically:

* **tokenizer** — whitespace+punctuation regex (``\\w+|[^\\w\\s]``),
  a BPE-ish deterministic stand-in for the HF wordpiece counter (the
  model isn't in this container and determinism is the contract);
* **packing** — sentence-aware: split text spans into sentences at
  ``[.!?]`` + whitespace, greedily pack whole sentences up to
  ``max_tokens``; a single oversized sentence hard-splits on token
  boundaries; headings flush the open chunk and update
  ``section_title`` (mirrors docling's doc-structure-aware splits);
* **context** — ``"{section_title}\\n{content}"`` when a section is
  open, else content (reference ``contextualize``,
  services/chunking_service.py:73-77).

Spark realization: the kernel is a pure-pandas function run through
``mapInPandas`` (Arrow batches, no per-row Spark UDF); one input row
per document, one output row per chunk. At 100 TB the operator is
shuffle-free — chunking is embarrassingly parallel over the extracted
table's existing partitioning.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
SENT_RE = re.compile(r"(?<=[.!?])\s+")

CHUNKS_DDL = (
    "doc_id string, chunk_index int, content string, context string, "
    "section_title string, page int, token_count int"
)


def count_tokens(text: str) -> int:
    """Deterministic BPE-ish token count (words + punctuation marks)."""
    return len(TOKEN_RE.findall(text))


def split_sentences(text: str) -> list[str]:
    return [s for s in SENT_RE.split(text) if s]


def chunk_spans(spans: list[dict], max_tokens: int = 512) -> list[dict]:
    """Pure kernel: ordered spans of one document → list of chunk dicts.

    Only textual kinds contribute content; tables join as their text
    block (reference embeds table markdown in chunks via serialization,
    services/multimodal_service.py:193-198); images are skipped (they
    go to the media side-table).
    """
    chunks: list[dict] = []
    section: str | None = None
    page = 0
    first_page: int | None = None
    parts: list[str] = []
    tok_count = 0

    def flush() -> None:
        nonlocal parts, tok_count, first_page
        if not parts:
            return
        content = " ".join(parts)
        context = f"{section}\n{content}" if section else content
        chunks.append(
            {
                "chunk_index": len(chunks),
                "content": content,
                "context": context,
                "section_title": section,
                "page": first_page if first_page is not None else 0,
                "token_count": tok_count,
            }
        )
        parts, tok_count, first_page = [], 0, None

    def add_piece(piece: str, n: int, pg: int) -> None:
        nonlocal tok_count, first_page
        if parts and tok_count + n > max_tokens:
            flush()
        if first_page is None:
            first_page = pg
        parts.append(piece)
        tok_count += n

    for span in spans:
        kind = span.get("kind", "text")
        text = span.get("text") or ""
        page = int(span.get("page") or 0)
        if kind == "heading":
            flush()
            section = text
            continue
        if kind == "image" or not text:
            continue
        for sent in split_sentences(text):
            n = count_tokens(sent)
            if n > max_tokens:
                # oversized sentence: hard-split on token boundaries
                toks = TOKEN_RE.findall(sent)
                for i in range(0, len(toks), max_tokens):
                    sub = " ".join(toks[i : i + max_tokens])
                    add_piece(sub, min(max_tokens, len(toks) - i), page)
            else:
                add_piece(sent, n, page)
        if kind == "table":
            flush()  # tables end a chunk (structure-aware boundary)
    flush()
    return chunks


def chunk_fixed(text: str, max_tokens: int) -> list[dict]:
    """Fixed-window chunking on whitespace tokens — exactly
    SQL-expressible (the oracle-parity policy; the sentence-aware
    policy above is fixture-tested instead)."""
    toks = [t for t in re.split(r"\s+", text) if t]
    out = []
    for i in range(0, len(toks), max_tokens):
        window = toks[i : i + max_tokens]
        out.append(
            {
                "chunk_index": i // max_tokens,
                "content": " ".join(window),
                "context": " ".join(window),
                "section_title": None,
                "page": 0,
                "token_count": len(window),
            }
        )
    return out


def chunk_extracted(
    extracted: DataFrame, max_tokens: int = 512, policy: str = "hybrid"
) -> DataFrame:
    """extracted(doc_id, spans) → chunks table (one row per chunk)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id",
            "chunk_index",
            "content",
            "context",
            "section_title",
            "page",
            "token_count",
        ]
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                span_dicts = [dict(s) for s in spans]
                if policy == "fixed":
                    text = " ".join(
                        s.get("text") or "" for s in span_dicts if s.get("kind") != "image"
                    )
                    cks = chunk_fixed(text, max_tokens)
                else:
                    cks = chunk_spans(span_dicts, max_tokens)
                for c in cks:
                    rows.append(
                        (
                            doc_id,
                            c["chunk_index"],
                            c["content"],
                            c["context"],
                            c["section_title"],
                            c["page"],
                            c["token_count"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return extracted.select("doc_id", "spans").mapInPandas(run, schema=CHUNKS_DDL)


def chunk_text_column(
    docs: DataFrame, text_col: str = "text", max_tokens: int = 32, policy: str = "fixed"
) -> DataFrame:
    """documents(doc_id, text) → chunks, for corpora already flattened
    to plain text (driver tables). Same kernel, same output schema."""
    from pyspark.sql import functions as F

    wrapped = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col(text_col).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    return chunk_extracted(wrapped, max_tokens=max_tokens, policy=policy)
