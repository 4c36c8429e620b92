"""Multimodal media handling (reference D5: image extraction +
PNG side-files, services/image_service.py:12-75,
services/multimodal_service.py:87-152; ExtractedImage model
core/models.py:356-394).

Design for 100 TB: media payloads are **opaque binary columns with
typed metadata** riding next to the text corpus —

    media(media_ref string, doc_id string, media_type string,
          payload binary, width int, height int, page int,
          caption string)

never local-disk side files (the reference writes PNGs to a temp dir;
that doesn't exist on a 1000-executor cluster). Decode / resize /
feature-extract run as Arrow-batched ``mapInPandas`` stages so pixel
work stays off the JVM heap and batches amortize codec setup.

The image/audio codec libraries are **not in this container**, so the
decode step is stubbed: ``codec="stub"`` parses a deterministic fake
header (``FAKEIMG:<w>x<h>:`` prefix) and any real codec raises
``NotImplementedError`` with the integration point documented. The
Spark-side plumbing — schema, batch shape, partitioning, UDF
signatures — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_ref string, doc_id string, media_type string, payload binary, "
    "width int, height int, page int, caption string"
)

FEATURE_DDL = "media_ref string, width int, height int, feature array<float>, ok boolean"

_FAKE_MAGIC = b"FAKEIMG:"


def fake_image_bytes(width: int, height: int, seed: str) -> bytes:
    """Deterministic fake payload: header + md5-keyed noise body.
    Stands in for PNG/JPEG bytes in tests and synthetic corpora."""
    body = hashlib.md5(f"{seed}:{width}x{height}".encode()).digest()
    n = max(width * height // 16, 1)
    return _FAKE_MAGIC + f"{width}x{height}:".encode() + body * n


def decode_header(payload: bytes, codec: str = "stub") -> tuple[int, int] | None:
    """(width, height) from payload, or None if undecodable.

    codec="stub": the deterministic fake format above.
    Real codecs (PIL/libvips/ffmpeg) plug in here; they are not
    installed in this container.
    """
    if codec != "stub":
        raise NotImplementedError(
            f"codec {codec!r}: real decoders (PIL/libvips/ffmpeg) are not "
            "available in this environment; integrate by replacing "
            "decode_header/decode_features in operators/multimodal.py"
        )
    if not payload or not payload.startswith(_FAKE_MAGIC):
        return None
    try:
        dims = payload[len(_FAKE_MAGIC) :].split(b":", 1)[0]
        w, h = dims.split(b"x")
        return int(w), int(h)
    except (ValueError, IndexError):
        return None


def decode_features(payload: bytes, dim: int = 16, codec: str = "stub") -> np.ndarray | None:
    """Deterministic feature vector from the payload body (stands in
    for a CNN/CLIP embedding; same shape contract)."""
    hdr = decode_header(payload, codec)
    if hdr is None:
        return None
    digest = hashlib.md5(payload[:256]).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


class StubCodecProvider:
    """Default codec provider: the deterministic fake format above.

    The provider protocol a real codec (PIL/libvips/ffmpeg) implements
    to plug into ``media_features``: ``header(payload) -> (w, h) |
    None`` and ``features(payload, dim) -> float32 ndarray | None``,
    with None meaning "undecodable" (the row is kept with ``ok=false``,
    never dropped and never a task failure). Conformance is pinned by
    tests/test_provider_conformance.py."""

    def header(self, payload: bytes) -> tuple[int, int] | None:
        return decode_header(payload, "stub")

    def features(self, payload: bytes, dim: int) -> np.ndarray | None:
        return decode_features(payload, dim, "stub")


def media_features(
    media: DataFrame, dim: int = 16, codec: str = "stub", provider=None
) -> DataFrame:
    """media table → per-media decoded dims + feature vector.

    Arrow-batched ``mapInPandas``; one output row per input row
    (``ok=false`` for undecodable payloads — kept, not dropped, so
    error rates are aggregable downstream). ``provider`` (a
    ``StubCodecProvider``-shaped object) overrides the codec; a
    provider that raises on a payload quarantines that row as
    ``ok=false`` rather than failing the task."""
    prov = provider
    if prov is None:
        if codec != "stub":
            # surface the unsupported-codec error at plan-build time,
            # not inside every task
            decode_header(b"", codec)
        prov = StubCodecProvider()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ws, hs, feats, oks = [], [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    hdr = prov.header(b)
                    vec = prov.features(b, dim) if hdr is not None else None
                except Exception:  # noqa: BLE001 — per-row quarantine, never fail the task
                    hdr, vec = None, None
                refs.append(ref)
                ws.append(hdr[0] if hdr else 0)
                hs.append(hdr[1] if hdr else 0)
                feats.append(vec if vec is not None else np.zeros(dim, dtype=np.float32))
                oks.append(hdr is not None)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": ws,
                    "height": hs,
                    "feature": feats,
                    "ok": oks,
                }
            )

    return media.select("media_ref", "payload").mapInPandas(run, schema=FEATURE_DDL)


def synthesize_media_table(docs: DataFrame, per_doc: int = 1) -> DataFrame:
    """Deterministic media table for a documents DF (doc_id column):
    per_doc fake images per document, ref = '<doc_id>/m<j>'. Pure
    column ops except payload generation (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                for j in range(per_doc):
                    w = 64 + (abs(hash_str(f"{doc_id}/m{j}")) % 64)
                    h = 48 + (abs(hash_str(f"h{doc_id}/m{j}")) % 48)
                    rows.append(
                        (
                            f"{doc_id}/m{j}",
                            str(doc_id),
                            "image",
                            fake_image_bytes(w, h, f"{doc_id}/m{j}"),
                            w,
                            h,
                            0,
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref",
                    "doc_id",
                    "media_type",
                    "payload",
                    "width",
                    "height",
                    "page",
                    "caption",
                ],
            )

    return docs.select(F.col("doc_id").cast("string").alias("doc_id")).mapInPandas(
        run, schema=MEDIA_DDL
    )


def hash_str(s: str) -> int:
    """Process-stable string hash (builtin hash() is salted)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize *planning* stays JVM-side (pure arithmetic on metadata):
    compute target dims + scale, only then ship shortlisted payloads
    to the Python stage. At 100 TB this prunes the expensive decode
    stage by metadata predicate pushdown."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_ref",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )


FRAME_DDL = (
    "media_ref string, frame_index int, frame_time_s double, payload binary, ok boolean"
)


def frame_sample_plan(
    media: DataFrame,
    duration_col: str = "duration_s",
    fps_col: str = "fps",
    every_s: float = 1.0,
    max_frames: int = 32,
) -> DataFrame:
    """Frame-sampling *plan* (JVM-side, metadata only): which frame
    indices to decode for each video, one row per target frame —
    uniform every ``every_s`` seconds capped at ``max_frames``. Like
    resize_plan, the expensive decode stage is pruned by pure column
    arithmetic before any payload ships to Python."""
    n_frames = F.least(
        F.floor(F.col(duration_col) / F.lit(every_s)).cast("int") + 1,
        F.lit(max_frames),
    )
    exploded = media.select(
        "media_ref",
        F.col(fps_col).alias("fps"),
        (F.col(duration_col) / n_frames.cast("double")).alias("step"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    )
    return exploded.select(
        "media_ref",
        "frame_index",
        F.round(F.col("frame_index") * F.col("step"), 3).alias("frame_time_s"),
        (F.col("frame_index") * F.col("step") * F.col("fps")).cast("int").alias(
            "source_frame"
        ),
    )


def sample_frames(media: DataFrame, every_s: float = 1.0, codec: str = "stub") -> DataFrame:
    """Decode-and-sample frames (Arrow-batched). The stub emits
    deterministic fake frame payloads derived from (media_ref, index);
    a real implementation replaces ``_fake_frame`` with an ffmpeg/
    PyAV seek+decode — the schema, batch shape, and per-row error
    handling (``ok``) are the stable contract."""
    if codec != "stub":
        raise NotImplementedError(
            f"codec {codec!r}: real video decoders (ffmpeg/PyAV) are not "
            "available in this environment; integrate in sample_frames"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, dur in zip(
                pdf["media_ref"], pdf["payload"], pdf["duration_s"]
            ):
                b = bytes(payload) if payload is not None else b""
                ok = b.startswith(_FAKE_MAGIC)
                n = max(min(int(dur // every_s) + 1, 32), 1) if ok else 0
                for i in range(n):
                    rows.append(
                        (
                            ref,
                            i,
                            round(i * (dur / n), 3),
                            _fake_frame(ref, i),
                            True,
                        )
                    )
                if not ok:
                    rows.append((ref, -1, 0.0, b"", False))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "frame_index", "frame_time_s", "payload", "ok"],
            )

    return media.select("media_ref", "payload", "duration_s").mapInPandas(
        run, schema=FRAME_DDL
    )


def _fake_frame(ref: str, index: int) -> bytes:
    return _FAKE_MAGIC + f"frame:{ref}:{index}".encode()
