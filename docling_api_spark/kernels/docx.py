"""DOCX (WordprocessingML) strip kernel (pure Python, deterministic).

Re-implements the DOCX extraction semantics the reference delegates to
docling (InputFormat.DOCX dispatch, reference
services/docling_converter.py:63-67) over simplified WordprocessingML:

  <w:p> [<w:pPr><w:pStyle w:val="HeadingN"/></w:pPr>]
        (<w:r><w:t>text</w:t></w:r>)*            → heading|text span
  <w:p> with <w:pStyle w:val="ListParagraph"/>   → list_item
  <w:drawing r:embed="REF"/> (inside a run)      → image span
  <w:tbl><w:tr><w:tc>…</w:tc></w:tr></w:tbl>     → table span

Text of adjacent <w:t> runs inside one paragraph is concatenated; the
usual XML entities are unescaped; whitespace collapsed. Paragraphs that
normalize to empty are dropped.
"""

from __future__ import annotations

import re

__all__ = ["extract_docx"]

_P_RE = re.compile(r"<w:p(?:\s[^>]*)?>(.*?)</w:p>|<w:tbl>(.*?)</w:tbl>", re.DOTALL)
_T_RE = re.compile(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.DOTALL)
_STYLE_RE = re.compile(r"<w:pStyle\s+w:val=\"([^\"]+)\"")
_DRAWING_RE = re.compile(r"<w:drawing\s+r:embed=\"([^\"]+)\"\s*/?>")
_TR_RE = re.compile(r"<w:tr(?:\s[^>]*)?>(.*?)</w:tr>", re.DOTALL)
_TC_RE = re.compile(r"<w:tc(?:\s[^>]*)?>(.*?)</w:tc>", re.DOTALL)
_WS_RE = re.compile(r"\s+")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], text)).strip()


def _para_text(body: str) -> str:
    return _norm(" ".join(m.group(1) for m in _T_RE.finditer(body)))


def extract_docx(xml: str, media_prefix: str = "") -> list[dict]:
    """Extract ordered output spans from a simplified WordprocessingML body."""
    spans: list[dict] = []
    for m in _P_RE.finditer(xml):
        para, tbl = m.group(1), m.group(2)
        if tbl is not None:
            rows = []
            for tr in _TR_RE.finditer(tbl):
                rows.append([_para_text(tc.group(1)) for tc in _TC_RE.finditer(tr.group(1))])
            rows = [r for r in rows if r]
            if rows:
                ncols = max(len(r) for r in rows)
                rows = [r + [""] * (ncols - len(r)) for r in rows]
                spans.append(
                    {"kind": "table", "text": "\n".join(" | ".join(row) for row in rows), "media_ref": ""}
                )
            continue
        style_m = _STYLE_RE.search(para)
        style = style_m.group(1) if style_m else ""
        for dm in _DRAWING_RE.finditer(para):
            ref = dm.group(1)
            spans.append({"kind": "image", "text": "", "media_ref": (media_prefix + ref) if ref else ""})
        text = _para_text(para)
        if not text:
            continue
        if style.startswith("Heading"):
            spans.append({"kind": "heading", "text": text, "media_ref": ""})
        elif style == "ListParagraph":
            spans.append({"kind": "list_item", "text": text, "media_ref": ""})
        elif style == "Caption":
            spans.append({"kind": "caption", "text": text, "media_ref": ""})
        elif style == "Code":
            spans.append({"kind": "code", "text": text, "media_ref": ""})
        else:
            spans.append({"kind": "text", "text": text, "media_ref": ""})
    return spans
