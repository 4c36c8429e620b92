"""OCR dispatch surface (stub provider; deterministic).

Mirrors the reference's OCR configuration
(services/docling_converter.py:46,56-61): ``do_ocr`` gates whether
scanned pages are recognized at all, ``force_full_page_ocr`` re-OCRs
even pages that carry a programmatic text layer (EasyOcrOptions
semantics). No OCR library ships in this container, so the default
provider is a deterministic stub over a synthetic scanned-page payload

    SCAN <meta>
    LINE <recognized text>
    LINE <recognized text>

(the multimodal stub-codec pattern, operators/multimodal.py:54-66); a
real engine (easyocr/tesseract) plugs in by implementing
``OcrProvider.recognize`` over image bytes — the integration point
raises ``NotImplementedError`` until then.

Provenance: OCR-recognized text enters the span stream as
``kind='ocr_text'`` — the provenance flag lives in the span vocabulary
so every downstream consumer (renders, chunkers, quality filters) can
distinguish recognized from born-digital text without a schema change.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["OcrOptions", "StubOcrProvider", "RealOcrProvider", "ocr_spans", "retag_ocr"]

# span kinds that carry a recognizable text layer (re-tagged to
# ocr_text under force_full_page_ocr; structure is lost, as with a
# real full-page re-OCR)
_TEXTUAL_KINDS = frozenset({"text", "heading", "list_item", "caption", "code"})


@dataclass(frozen=True)
class OcrOptions:
    """The reference's OCR knobs (docling_converter.py:46,56-61).

    ``provider`` is the pluggable recognition engine (any object with
    ``recognize(payload) -> list[str]``); None selects the default
    ``StubOcrProvider``. Carried here so a user-supplied engine flows
    through ``extract(corpus, ocr=OcrOptions(do_ocr=True,
    provider=MyEngine()))`` into every worker — the provider object is
    pickled once into the task closure, never per row. A provider that
    raises on a document quarantines that document (extract's per-doc
    error path), never the job; the contract is pinned by
    tests/test_provider_conformance.py."""

    do_ocr: bool = False
    force_full_page_ocr: bool = False
    provider: object | None = None


class StubOcrProvider:
    """Deterministic fake: 'recognizes' the LINE entries of the
    synthetic scanned-page payload. Whitespace-collapses each line
    (real OCR normalizes too); empty recognitions dropped."""

    def recognize(self, payload: str) -> list[str]:
        out = []
        for line in payload.split("\n"):
            line = line.strip()
            if line.startswith("LINE "):
                text = " ".join(line[5:].split())
                if text:
                    out.append(text)
        return out


class RealOcrProvider:
    """Integration point for a real OCR engine over image bytes."""

    def recognize(self, payload: str) -> list[str]:
        raise NotImplementedError(
            "real OCR engines (easyocr/tesseract) are not available in this "
            "environment; integrate by implementing OcrProvider.recognize "
            "in kernels/ocr.py"
        )


def ocr_spans(payload: str, provider=None) -> list[dict]:
    """Scanned-page payload → ordered ocr_text spans."""
    provider = provider or StubOcrProvider()
    return [
        {"kind": "ocr_text", "text": t, "media_ref": ""} for t in provider.recognize(payload)
    ]


def retag_ocr(spans: list[dict]) -> list[dict]:
    """force_full_page_ocr semantics: the page's text layer is replaced
    by recognition output — textual kinds collapse to ocr_text (layout
    classes are an artifact of the text layer); images/tables keep
    their kinds."""
    return [
        {**s, "kind": "ocr_text"} if s["kind"] in _TEXTUAL_KINDS else s for s in spans
    ]
