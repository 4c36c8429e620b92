"""Golden span fixtures — the north-rule invariant (BASELINE.json):
(kind, text, media_ref, order) sequence equality, checked row-by-row.
Kernels are pure functions, tested without Spark here; the Spark path
is proved equal in test_extract_spark.py."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from docling_api_spark.corpus import gen_doc
from docling_api_spark.kernels import extract_raw_span
from docling_api_spark.kernels.docx import extract_docx
from docling_api_spark.kernels.html import extract_html
from docling_api_spark.kernels.pdf import extract_pdf_page
from docling_api_spark.kernels.pptx import extract_pptx_slide
from docling_api_spark.kernels.xlsx import extract_xlsx_sheet

FIXDIR = Path(__file__).parent / "fixtures"


def _load(name: str):
    return json.loads((FIXDIR / name).read_text())


def _numbered(spans: list[dict]) -> list[dict]:
    return [
        {
            "kind": s["kind"],
            "text": s["text"],
            "media_ref": s["media_ref"],
            "order": i,
            **({"page": s["page"]} if "page" in s else {}),
        }
        for i, s in enumerate(spans)
    ]


@pytest.mark.parametrize("fx", _load("html_fixtures.json"), ids=lambda f: f["name"])
def test_html_golden(fx):
    assert _numbered(extract_html(fx["input"])) == fx["expected"]


@pytest.mark.parametrize("fx", _load("pdf_fixtures.json"), ids=lambda f: f["name"])
def test_pdf_golden(fx):
    assert _numbered(extract_pdf_page(fx["input"])) == fx["expected"]


def test_pdf_deep_single_column_page_no_recursion_limit():
    """A well-formed single-column page of n evenly-leaded paragraphs
    splits one block per cut (every projection gap ties), so the old
    recursive XY-cut hit Python's recursion limit near ~1000 blocks and
    quarantined a LEGITIMATE document. The iterative worklist must
    extract all 1500 blocks in reading order."""
    page = "\n".join(
        f"BLOCK 0,{4 * i},100,{4 * i + 2},para|line {i}" for i in range(1500)
    )
    spans = extract_pdf_page(page)
    assert [s["text"] for s in spans] == [f"line {i}" for i in range(1500)]


def test_pdf_no_gap_leaf_ties_break_by_parse_order():
    """Overlapping blocks with NO projection gap on either axis hit the
    xy-cut no-gap fallback sort. Blocks tied on (y0, x0) there must
    keep PARSE order — the pre-view implementation's stable-sort
    behavior — not the y-view's incidental (y0, y1) order. Found by
    differential review of the view-based rewrite: gate corpora use
    spread float coords and never tie, so only a degenerate/overlap
    layout exposes the order change."""
    page = (
        "BLOCK 0,0,10,10,para|AAAA body text\n"
        "BLOCK 0,0,10,5,para|BBBB body text"
    )
    assert [s["text"][:4] for s in extract_pdf_page(page)] == ["AAAA", "BBBB"]


@pytest.mark.parametrize(
    "coords",
    ["nan,20,100,30", "0,1e400,100,50", "0,0,100,inf", "0,0,100,-inf"],
)
def test_pdf_non_finite_geometry_raises(coords):
    """NaN mid-points compare False against any cut (the block silently
    vanished from BOTH xy-cut halves — silent data loss) and ±inf put
    every block on one side of an inf cut (unbounded splitting). Both
    are corrupt input: raise ValueError so the doc takes the visible
    per-doc quarantine path, same as non-numeric coords."""
    page = f"BLOCK 0,0,100,10,para|ok\nBLOCK {coords},para|corrupt"
    with pytest.raises(ValueError, match="non-finite block geometry"):
        extract_pdf_page(page)


@pytest.mark.parametrize("fx", _load("docx_fixtures.json"), ids=lambda f: f["name"])
def test_docx_golden(fx):
    assert _numbered(extract_docx(fx["input"])) == fx["expected"]


@pytest.mark.parametrize("fx", _load("xlsx_fixtures.json"), ids=lambda f: f["name"])
def test_xlsx_golden(fx):
    assert _numbered(extract_xlsx_sheet(fx["input"])) == fx["expected"]


@pytest.mark.parametrize("fx", _load("pptx_fixtures.json"), ids=lambda f: f["name"])
def test_pptx_golden(fx):
    assert _numbered(extract_pptx_slide(fx["input"])) == fx["expected"]


def test_unknown_kind_passthrough():
    assert extract_raw_span("txt", "  plain   text ") == [
        {"kind": "text", "text": "plain text", "media_ref": ""}
    ]
    assert extract_raw_span("txt", None) == []
    assert extract_raw_span("txt", "   ") == []


@pytest.mark.parametrize("i", list(range(0, 120)) + [499])
def test_corpus_roundtrip(i):
    """Generator golden == kernel output for every synthetic doc,
    including the oversized (skew-tail) PDF at index 499."""
    doc, golden = gen_doc(i)
    out: list[dict] = []
    from docling_api_spark.kernels import PAGED_KINDS

    for s in sorted(doc["spans"], key=lambda s: s["offset"]):
        page = s["offset"] if s["kind"] in PAGED_KINDS else 0
        for r in extract_raw_span(s["kind"], s["text"]):
            out.append({**r, "page": page})
    assert _numbered(out) == golden


def test_corpus_offsets_strictly_increasing():
    for i in range(50):
        doc, _ = gen_doc(i)
        offs = [s["offset"] for s in doc["spans"]]
        assert offs == sorted(set(offs))


def test_boilerplate_absent():
    """nav/footer/ads/pageno text never reaches output spans."""
    for i in range(40):
        doc, golden = gen_doc(i)
        joined = " ".join(g["text"] for g in golden)
        assert "internal header" not in joined
        assert "footer text" not in joined
        assert "Sitemap" not in joined and "Privacy" not in joined


class TestOcrDispatch:
    def test_scanned_page_off_by_default(self):
        assert extract_raw_span("pdf_page_image", "SCAN x\nLINE hello") == []

    def test_scanned_page_recognized_when_on(self):
        from docling_api_spark.kernels.ocr import OcrOptions

        spans = extract_raw_span(
            "pdf_page_image", "SCAN x\nLINE  hello   world \nLINE \nLINE second",
            ocr=OcrOptions(do_ocr=True),
        )
        assert spans == [
            {"kind": "ocr_text", "text": "hello world", "media_ref": ""},
            {"kind": "ocr_text", "text": "second", "media_ref": ""},
        ]

    def test_force_full_page_ocr_retags_text_layer(self):
        from docling_api_spark.kernels.ocr import OcrOptions

        page = "BLOCK 0,0,100,10,heading|Title\nBLOCK 0,20,100,40,para|Body\nBLOCK 0,50,100,60,figure|m0"
        normal = extract_raw_span("pdf_page", page, ocr=OcrOptions(do_ocr=True))
        assert [s["kind"] for s in normal] == ["heading", "text", "image"]
        forced = extract_raw_span(
            "pdf_page", page, ocr=OcrOptions(do_ocr=True, force_full_page_ocr=True)
        )
        assert [s["kind"] for s in forced] == ["ocr_text", "ocr_text", "image"]
        assert [s["text"] for s in forced] == [s["text"] for s in normal]

    def test_force_without_do_ocr_is_inert(self):
        from docling_api_spark.kernels.ocr import OcrOptions

        page = "BLOCK 0,0,100,10,para|Body"
        spans = extract_raw_span("pdf_page", page, ocr=OcrOptions(force_full_page_ocr=True))
        assert [s["kind"] for s in spans] == ["text"]

    def test_real_provider_is_explicit_integration_point(self):
        from docling_api_spark.kernels.ocr import RealOcrProvider

        with pytest.raises(NotImplementedError):
            RealOcrProvider().recognize("SCAN x")

    def test_image_doc_format_shares_ocr_path(self):
        from docling_api_spark.kernels.ocr import OcrOptions

        payload = "SCAN photo.png\nLINE recognized words"
        assert extract_raw_span("image_doc", payload) == []
        assert extract_raw_span("image_doc", payload, ocr=OcrOptions(do_ocr=True)) == [
            {"kind": "ocr_text", "text": "recognized words", "media_ref": ""}
        ]
