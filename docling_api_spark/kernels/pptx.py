"""PPTX (PresentationML) slide kernel (pure Python, deterministic).

Re-implements the PPTX extraction semantics the reference delegates to
docling (InputFormat.PPTX dispatch, reference
services/docling_converter.py:64-67; format list README.md:7) over a
simplified PresentationML slide body:

  <p:sp type="title"> <a:t>…</a:t> </p:sp>        → heading span
  <p:sp type="body">  (<a:p [bullet="1"]>
                        (<a:t>…</a:t>)* </a:p>)*  → text | list_item per para
  <p:pic r:embed="REF"/>                          → image span
  <p:graphicFrame><a:tbl>
    <a:tr>(<a:tc>…</a:tc>)*</a:tr>…</a:tbl>…     → table span

One RAW span per slide (``kind='pptx_slide'``, raw offset = 1-based
slide number, carried into span ``page`` provenance) — slides are
independently extractable, so a long deck shards across partitions
exactly like a multi-page PDF.

Shapes are emitted in document order; adjacent ``<a:t>`` runs inside a
paragraph concatenate; entities unescape; whitespace collapses;
paragraphs that normalize to empty are dropped.
"""

from __future__ import annotations

import re

__all__ = ["extract_pptx_slide"]

_SHAPE_RE = re.compile(
    r"<p:sp\s+type=\"(title|body)\"\s*>(.*?)</p:sp>"
    r"|<p:pic\s+r:embed=\"([^\"]*)\"\s*/?>"
    r"|<p:graphicFrame(?:\s[^>]*)?>(.*?)</p:graphicFrame>",
    re.DOTALL,
)
_PARA_RE = re.compile(r"<a:p(\s[^>]*)?>(.*?)</a:p>", re.DOTALL)
_T_RE = re.compile(r"<a:t(?:\s[^>]*)?>(.*?)</a:t>", re.DOTALL)
_BULLET_RE = re.compile(r"bullet=\"1\"")
_TR_RE = re.compile(r"<a:tr(?:\s[^>]*)?>(.*?)</a:tr>", re.DOTALL)
_TC_RE = re.compile(r"<a:tc(?:\s[^>]*)?>(.*?)</a:tc>", re.DOTALL)
_WS_RE = re.compile(r"\s+")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], text)).strip()


def _runs_text(body: str) -> str:
    return _norm(" ".join(t.group(1) for t in _T_RE.finditer(body)))


def extract_pptx_slide(xml: str, media_prefix: str = "") -> list[dict]:
    """Extract ordered output spans from one simplified PresentationML
    slide body."""
    spans: list[dict] = []
    for m in _SHAPE_RE.finditer(xml):
        sp_type, sp_body, pic_ref, frame_body = m.group(1), m.group(2), m.group(3), m.group(4)
        if pic_ref is not None:
            spans.append(
                {
                    "kind": "image",
                    "text": "",
                    "media_ref": (media_prefix + pic_ref) if pic_ref else "",
                }
            )
        elif frame_body is not None:
            rows = []
            for tr in _TR_RE.finditer(frame_body):
                cells = [_runs_text(tc.group(1)) for tc in _TC_RE.finditer(tr.group(1))]
                if cells:
                    rows.append(cells)
            if rows:
                ncols = max(len(r) for r in rows)
                rows = [r + [""] * (ncols - len(r)) for r in rows]
                spans.append(
                    {
                        "kind": "table",
                        "text": "\n".join(" | ".join(row) for row in rows),
                        "media_ref": "",
                    }
                )
        elif sp_type == "title":
            text = _runs_text(sp_body)
            if text:
                spans.append({"kind": "heading", "text": text, "media_ref": ""})
        else:  # body shape: one span per paragraph
            for pm in _PARA_RE.finditer(sp_body):
                attrs, pbody = pm.group(1) or "", pm.group(2)
                text = _runs_text(pbody)
                if not text:
                    continue
                kind = "list_item" if _BULLET_RE.search(attrs) else "text"
                spans.append({"kind": kind, "text": text, "media_ref": ""})
    return spans
