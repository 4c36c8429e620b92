"""Provider conformance contracts (VERDICT r3 ask #6).

The engine's three honest integration points — embedding model
(reference core/embeddings.py:26-54, MiniLM), OCR engine (reference
services/docling_converter.py:55-61, EasyOCR), image/video codec
(reference services/image_service.py:12-75, PIL) — ship as
deterministic stubs because the real libraries are not in this
container. These tests pin the contract any user-supplied provider
must satisfy, and prove the contract by running BOTH the built-in stub
AND a second, structurally different "user" provider through the same
checker: shape, determinism, Spark round-trip fidelity, and error
quarantine (a poisoned provider quarantines the affected rows/docs —
it never fails the job).

If the container ever gains sentence-transformers/easyocr/PIL, the
real provider plugs into these same checkers unchanged.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest
from pyspark import cloudpickle
from pyspark.sql import Row
from pyspark.sql import functions as F

from docling_api_spark import EMBEDDING_DIM
from docling_api_spark.kernels.ocr import OcrOptions, StubOcrProvider, ocr_spans
from docling_api_spark.operators.embed import embedding_udf, feature_hash_embed
from docling_api_spark.operators.extract import extract, extract_errors
from docling_api_spark.operators.multimodal import (
    StubCodecProvider,
    fake_image_bytes,
    media_features,
)

# ---------------------------------------------------------------------------
# "user" providers — structurally different from the built-ins. Registered
# for pickle-by-value: this test module is not importable on Spark workers
# (a real deployment ships its provider module via spark-submit --py-files
# instead, jobs/package.py).
# ---------------------------------------------------------------------------

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class TinyEmbedProvider:
    """Minimal user embedding provider: char-statistics features,
    nothing shared with the built-in feature-hash path."""

    def __init__(self, dim: int):
        self.dim = dim

    def __call__(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t.encode("utf-8")):
                out[i, (j * 31 + ch) % self.dim] += (ch % 7) - 3
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out


class UppercaseOcrProvider:
    """Minimal user OCR engine: recognizes LINE rows uppercased."""

    def recognize(self, payload: str) -> list[str]:
        return [
            " ".join(line[5:].split()).upper()
            for line in payload.split("\n")
            if line.strip().startswith("LINE ") and line[5:].strip()
        ]


class PoisonOcrProvider:
    """Raises on any payload — models a real engine segfault/abort."""

    def recognize(self, payload: str) -> list[str]:
        raise RuntimeError("ocr engine crashed")


class TinyCodecProvider:
    """Minimal user codec: fixed 2x2 header, byte-histogram features."""

    def header(self, payload: bytes):
        return (2, 2) if payload else None

    def features(self, payload: bytes, dim: int):
        if not payload:
            return None
        out = np.zeros(dim, dtype=np.float32)
        for b in payload[:64]:
            out[b % dim] += 1.0
        return out


class PoisonCodecProvider:
    def header(self, payload: bytes):
        raise RuntimeError("codec crashed")

    def features(self, payload: bytes, dim: int):
        raise RuntimeError("codec crashed")


# ---------------------------------------------------------------------------
# conformance checkers — the reusable contract
# ---------------------------------------------------------------------------


def check_embedding_provider(spark, provider, dim: int) -> None:
    """The embedding-provider contract: ``provider(list[str]) ->
    (n, dim) float32-coercible matrix``, deterministic, total on empty
    strings, and bit-identical when run through the Arrow
    ``embedding_udf`` path vs called locally."""
    texts = ["hello world", "", "a much longer piece of text with more tokens", "hello world"]
    a = np.asarray(provider(list(texts)), dtype=np.float32)
    b = np.asarray(provider(list(texts)), dtype=np.float32)
    assert a.shape == (len(texts), dim)
    assert np.isfinite(a).all()
    # determinism — a nondeterministic provider breaks dedup-before-embed
    assert np.array_equal(a, b)
    # identical inputs embed identically (rows 0 and 3)
    assert np.array_equal(a[0], a[3])
    # Spark round-trip: the Arrow UDF adds no numeric drift
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, context string")
    got = {
        r["i"]: np.asarray(r["e"], dtype=np.float32)
        for r in df.select("i", embedding_udf(dim, provider)(F.col("context")).alias("e")).collect()
    }
    for i in range(len(texts)):
        assert got[i].shape == (dim,)
        assert np.array_equal(got[i], a[i]), f"row {i}: Spark path diverged from local call"
    # NULL text behaves exactly like "" (the UDF's fillna contract)
    null_df = spark.createDataFrame([(None,)], "context string")
    (null_row,) = null_df.select(embedding_udf(dim, provider)(F.col("context")).alias("e")).collect()
    assert np.array_equal(np.asarray(null_row["e"], dtype=np.float32), a[1])


_SCAN_PAYLOAD = "SCAN page=1\nLINE first recognized   line\nLINE second line\nnoise\nLINE \n"


def check_ocr_provider(spark, provider) -> None:
    """The OCR-provider contract: ``recognize(payload) -> list[str]``
    deterministic with no empty strings; spans enter the stream as
    kind='ocr_text'; the provider reaches extract() workers through
    OcrOptions; and a raising provider quarantines the document."""
    r1, r2 = provider.recognize(_SCAN_PAYLOAD), provider.recognize(_SCAN_PAYLOAD)
    assert isinstance(r1, list) and all(isinstance(t, str) and t for t in r1)
    assert r1 == r2, "OCR provider must be deterministic"
    spans = ocr_spans(_SCAN_PAYLOAD, provider=provider)
    assert [s["kind"] for s in spans] == ["ocr_text"] * len(r1)
    assert [s["text"] for s in spans] == r1

    span = Row(kind="pdf_page_image", text=_SCAN_PAYLOAD, media_ref="", offset=1)
    corpus = spark.createDataFrame(
        [Row(doc_id="scan1", fmt="pdf", size_bytes=64, spans=[span])]
    )
    # provider OFF → scanned page yields nothing; ON → its recognitions
    assert extract(corpus, salt_partitions=2).count() == 0
    opts = OcrOptions(do_ocr=True, provider=provider)
    (doc,) = extract(corpus, salt_partitions=2, ocr=opts).collect()
    got = [(s["kind"], s["text"]) for s in doc["spans"]]
    assert got == [("ocr_text", t) for t in r1]


def check_ocr_quarantine(spark, poison_provider) -> None:
    """A provider that raises must quarantine the doc, not the job —
    and clean docs in the same batch still extract."""
    scan = Row(kind="pdf_page_image", text=_SCAN_PAYLOAD, media_ref="", offset=1)
    clean = Row(kind="html_doc", text="<html><body><p>fine text here</p></body></html>",
                media_ref="", offset=0)
    corpus = spark.createDataFrame(
        [
            Row(doc_id="scan_bad", fmt="pdf", size_bytes=64, spans=[scan]),
            Row(doc_id="ok", fmt="html", size_bytes=64, spans=[clean]),
        ]
    )
    opts = OcrOptions(do_ocr=True, provider=poison_provider)
    out = {r["doc_id"] for r in extract(corpus, salt_partitions=2, ocr=opts).collect()}
    assert out == {"ok"}
    errs = {r["doc_id"]: r for r in extract_errors(corpus, salt_partitions=2, ocr=opts).collect()}
    assert set(errs) == {"scan_bad"}
    assert errs["scan_bad"]["status"] == "error"
    assert "RuntimeError" in errs["scan_bad"]["error_message"]


def check_codec_provider(spark, provider, dim: int = 8) -> None:
    """The codec-provider contract: ``header -> (w, h) | None``,
    ``features -> float32 ndarray | None``, deterministic; through
    ``media_features`` every input row yields exactly one output row
    with ok=false (not a drop, not a task failure) for undecodable
    payloads."""
    good = fake_image_bytes(4, 2, "conf")
    hdr = provider.header(good)
    if hdr is not None:
        w, h = hdr
        assert int(w) > 0 and int(h) > 0
        vec = np.asarray(provider.features(good, dim), dtype=np.float32)
        assert vec.shape == (dim,) and np.isfinite(vec).all()
        vec2 = np.asarray(provider.features(good, dim), dtype=np.float32)
        assert np.array_equal(vec, vec2), "codec features must be deterministic"
    assert provider.header(b"") is None

    media = spark.createDataFrame(
        [
            Row(media_ref="m/good", payload=bytearray(good)),
            Row(media_ref="m/empty", payload=bytearray(b"")),
            Row(media_ref="m/null", payload=None),
        ]
    )
    rows = {r["media_ref"]: r for r in media_features(media, dim=dim, provider=provider).collect()}
    assert set(rows) == {"m/good", "m/empty", "m/null"}, "one output row per input row"
    for ref in ("m/empty", "m/null"):
        r = rows[ref]
        assert r["ok"] is False and r["width"] == 0 and r["height"] == 0
        assert list(r["feature"]) == [0.0] * dim
    if hdr is not None:
        g = rows["m/good"]
        assert g["ok"] is True and (g["width"], g["height"]) == (int(hdr[0]), int(hdr[1]))


# ---------------------------------------------------------------------------
# the actual tests: built-in stub AND user provider through the same checker
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "provider",
    [lambda ts: feature_hash_embed(ts, EMBEDDING_DIM), TinyEmbedProvider(EMBEDDING_DIM)],
    ids=["builtin_feature_hash", "user_tiny"],
)
def test_embedding_provider_conformance(spark, provider):
    check_embedding_provider(spark, provider, EMBEDDING_DIM)


@pytest.mark.parametrize(
    "provider", [StubOcrProvider(), UppercaseOcrProvider()], ids=["builtin_stub", "user_upper"]
)
def test_ocr_provider_conformance(spark, provider):
    check_ocr_provider(spark, provider)


def test_ocr_provider_error_quarantine(spark):
    check_ocr_quarantine(spark, PoisonOcrProvider())


@pytest.mark.parametrize(
    "provider", [StubCodecProvider(), TinyCodecProvider()], ids=["builtin_stub", "user_tiny"]
)
def test_codec_provider_conformance(spark, provider):
    check_codec_provider(spark, provider)


def test_codec_provider_error_quarantine(spark):
    """Every row from a crashing codec comes back ok=false; the job
    completes."""
    media = spark.createDataFrame(
        [Row(media_ref="m/a", payload=bytearray(fake_image_bytes(4, 2, "x")))]
    )
    rows = media_features(media, dim=8, provider=PoisonCodecProvider()).collect()
    assert len(rows) == 1 and rows[0]["ok"] is False


def test_default_ocr_options_unchanged():
    """provider=None keeps the stub default everywhere (frozen
    dataclass equality still holds for existing call sites)."""
    assert OcrOptions() == OcrOptions(do_ocr=False, force_full_page_ocr=False, provider=None)
    spans = ocr_spans(_SCAN_PAYLOAD)  # default provider path
    assert [s["text"] for s in spans] == ["first recognized line", "second line"]
