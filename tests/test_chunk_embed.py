"""Unit tests for the hybrid chunker kernel (D6) and feature-hash
embedder (D7) — the parts whose oracle coverage is partial (the
sentence-aware policy and float normalization aren't SQL-expressible).
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_api_spark.operators.chunk import (
    chunk_fixed,
    chunk_spans,
    count_tokens,
    split_sentences,
)
from docling_api_spark.operators.embed import (
    feature_hash_embed,
    hash_counts,
)


def _span(kind, text, page=0):
    return {"kind": kind, "text": text, "media_ref": "", "page": page}


class TestChunkKernel:
    def test_token_counter(self):
        assert count_tokens("hello, world!") == 4  # hello , world !
        assert count_tokens("") == 0

    def test_sentences(self):
        assert split_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]

    def test_heading_sets_section_and_flushes(self):
        spans = [
            _span("text", "intro text."),
            _span("heading", "Section One"),
            _span("text", "body one."),
        ]
        chunks = chunk_spans(spans, max_tokens=100)
        assert len(chunks) == 2
        assert chunks[0]["section_title"] is None
        assert chunks[1]["section_title"] == "Section One"
        assert chunks[1]["context"] == "Section One\nbody one."

    def test_max_tokens_packing(self):
        # 4 sentences of 3 tokens each (2 words + period), budget 6 → 2 per chunk
        spans = [_span("text", "aa bb. cc dd. ee ff. gg hh.")]
        chunks = chunk_spans(spans, max_tokens=6)
        assert [c["content"] for c in chunks] == ["aa bb. cc dd.", "ee ff. gg hh."]
        assert all(c["token_count"] == 6 for c in chunks)

    def test_oversized_sentence_hard_splits(self):
        words = " ".join(f"w{i}" for i in range(25))
        chunks = chunk_spans([_span("text", words)], max_tokens=10)
        assert [c["token_count"] for c in chunks] == [10, 10, 5]
        rejoined = " ".join(c["content"] for c in chunks)
        assert rejoined == words

    def test_chunk_index_and_page(self):
        spans = [_span("text", "one one one.", page=3), _span("text", "two two two.", page=4)]
        chunks = chunk_spans(spans, max_tokens=4)
        assert [c["chunk_index"] for c in chunks] == [0, 1]
        assert [c["page"] for c in chunks] == [3, 4]

    def test_images_skipped_tables_bound(self):
        spans = [
            _span("text", "before."),
            _span("image", ""),
            _span("table", "a | b\nc | d"),
            _span("text", "after."),
        ]
        chunks = chunk_spans(spans, max_tokens=100)
        # table ends its chunk; "after." starts a new one
        assert len(chunks) == 2
        assert "a | b" in chunks[0]["content"]
        assert chunks[1]["content"] == "after."

    def test_fixed_policy_exact_windows(self):
        text = " ".join(str(i) for i in range(70))
        chunks = chunk_fixed(text, 32)
        assert [c["token_count"] for c in chunks] == [32, 32, 6]
        assert chunks[1]["content"].split()[0] == "32"


class TestEmbedder:
    def test_deterministic(self):
        a = feature_hash_embed(["spark joins fast"])
        b = feature_hash_embed(["spark joins fast"])
        np.testing.assert_array_equal(a, b)

    def test_unit_norm(self):
        m = feature_hash_embed(["some text here", "other words"])
        norms = np.linalg.norm(m, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)

    def test_empty_text_zero_vector(self):
        m = feature_hash_embed([""])
        assert np.all(m == 0)

    def test_counts_sum_matches_token_count(self):
        c = hash_counts("a b c a")
        assert int(np.abs(c).sum()) <= 4  # signs may cancel within a bucket
        assert c.dtype == np.int64

    def test_similar_texts_closer(self):
        m = feature_hash_embed(
            ["spark query engine fast join", "spark query engine fast scan", "zebra giraffe lion"]
        )
        sim_ab = float(m[0] @ m[1])
        sim_ac = float(m[0] @ m[2])
        assert sim_ab > sim_ac

    def test_dim(self):
        assert feature_hash_embed(["x"], dim=64).shape == (1, 64)


class TestSparkChunkPath:
    @pytest.fixture(autouse=True)
    def _spark(self, spark):
        self.spark = spark

    def test_chunk_extracted_matches_kernel(self):
        from docling_api_spark.operators.chunk import chunk_extracted

        spans = [
            _span("heading", "T"),
            _span("text", "alpha beta. gamma delta."),
        ]
        df = self.spark.createDataFrame(
            [("d1", spans)],
            "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,page:int>>",
        )
        got = chunk_extracted(df, max_tokens=4).collect()
        want = chunk_spans(spans, max_tokens=4)
        assert len(got) == len(want)
        for g, w in zip(sorted(got, key=lambda r: r.chunk_index), want):
            assert g.content == w["content"]
            assert g.section_title == w["section_title"]
            assert g.token_count == w["token_count"]


def test_chunk_page_provenance_from_pdf(spark):
    """Chunks of a multi-page PDF carry the page number of their first
    span (reference: page_number from doc item provenance,
    services/chunking_service.py:73-77)."""
    from docling_api_spark.operators.chunk import chunk_extracted
    from docling_api_spark.operators.extract import extract
    from docling_api_spark.sources.catalog import load, wrap_documents_as_pdf_corpus

    corpus = wrap_documents_as_pdf_corpus(load(spark, "/root/testdata/sf0.001", "documents").limit(20))
    chunks = chunk_extracted(extract(corpus), max_tokens=16).collect()
    pages = {c.page for c in chunks}
    assert 1 in pages and 2 in pages  # content from both pages survives
    # page-2 chunks contain the doc body text (page 2 = the text para)
    p2 = [c for c in chunks if c.page == 2]
    assert p2 and all(c.content for c in p2)


def test_embed_deduped_null_text_matches_direct(spark):
    """NULL-text rows must get the same embedding ('' embedding) on the
    deduped-cache path as on the direct path (null-safe join key)."""
    from docling_api_spark.operators.embed import embed_chunks, embed_chunks_deduped

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "alpha beta"), (4, None)],
        "id int, context string",
    )
    direct = {r["id"]: r["embedding"] for r in embed_chunks(df).collect()}
    deduped = {r["id"]: r["embedding"] for r in embed_chunks_deduped(df).collect()}
    assert set(direct) == set(deduped)
    for i in direct:
        assert deduped[i] is not None, f"row {i} lost its embedding on the deduped path"
        assert direct[i] == deduped[i]
