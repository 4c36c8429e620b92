"""Format dispatch for raw spans → output spans (pure Python).

Mirrors the reference's per-InputFormat converter dispatch
(services/docling_converter.py:63-67) as a kind-keyed kernel table.
Each RAW span is independently extractable (html/docx docs are a
single span; pdf docs carry one ``pdf_page`` span per page, and
reading order within a page is page-local) — this independence is what
lets the Spark pipeline shard oversized PDFs across partitions and
reassemble by (raw_offset, local_order).
"""

from __future__ import annotations

from docling_api_spark.kernels.docx import extract_docx
from docling_api_spark.kernels.html import extract_html
from docling_api_spark.kernels.ocr import OcrOptions, ocr_spans, retag_ocr
from docling_api_spark.kernels.pdf import extract_pdf_page
from docling_api_spark.kernels.pptx import extract_pptx_slide
from docling_api_spark.kernels.xlsx import extract_xlsx_sheet

__all__ = ["extract_raw_span", "KERNELS", "PAGED_KINDS"]

KERNELS = {
    "html": extract_html,
    "pdf_page": extract_pdf_page,
    "docx_xml": extract_docx,
    "xlsx_sheet": extract_xlsx_sheet,
    "pptx_slide": extract_pptx_slide,
}

# raw-span kinds whose raw offset is a page/sheet/slide number that must
# flow into output-span ``page`` provenance (other kinds are pageless)
PAGED_KINDS = frozenset({"pdf_page", "pdf_page_image", "xlsx_sheet", "pptx_slide"})


def extract_raw_span(
    kind: str, text: str | None, media_prefix: str = "", ocr=None
) -> list[dict]:
    """Extract one raw span; unknown kinds pass through as plain text
    (parity with the reference treating unhandled formats as text,
    README.md multi-format list).

    ``ocr`` (an ``OcrOptions``) gates the scanned-page path: raw spans
    of kind ``pdf_page_image`` produce nothing unless ``do_ocr`` is on
    (reference do_ocr toggle, services/docling_converter.py:46), and
    ``force_full_page_ocr`` re-tags even born-digital pdf_page text
    layers as recognition output (EasyOcrOptions force_full_page_ocr,
    docling_converter.py:56-61)."""
    if text is None:
        return []
    ocr = ocr or OcrOptions()
    if kind in ("pdf_page_image", "image_doc"):
        # scanned pdf pages and standalone image documents (the
        # reference's IMAGE input format, README.md:7) share the OCR
        # path: text only exists if recognition runs
        return ocr_spans(text, provider=ocr.provider) if ocr.do_ocr else []
    kernel = KERNELS.get(kind)
    if kernel is None:
        t = " ".join(text.split())
        return [{"kind": "text", "text": t, "media_ref": ""}] if t else []
    spans = kernel(text, media_prefix=media_prefix)
    if kind == "pdf_page" and ocr.do_ocr and ocr.force_full_page_ocr:
        spans = retag_ocr(spans)
    return spans
