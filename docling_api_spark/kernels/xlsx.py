"""XLSX (SpreadsheetML) grid kernel (pure Python, deterministic).

Re-implements the XLSX extraction semantics the reference delegates to
docling (InputFormat.XLSX dispatch, reference
services/docling_converter.py:64-67; format list README.md:7) over a
simplified SpreadsheetML sheet body:

  <sheet name="NAME">                → heading span (the sheet name)
    <row> (<c>cell text</c>)* </row> → one table span for the grid
  </sheet>

One RAW span per worksheet (``kind='xlsx_sheet'``, raw offset = 1-based
sheet index) — sheets are independently extractable, so a 500-sheet
workbook shards across partitions exactly like a 500-page PDF.

Cell text is entity-unescaped and whitespace-collapsed; ragged rows are
padded to the widest row (docx table convention); rows with no cells
are dropped; a sheet whose grid is empty emits only its heading.
"""

from __future__ import annotations

import re

__all__ = ["extract_xlsx_sheet"]

_SHEET_RE = re.compile(r"<sheet\s+name=\"([^\"]*)\"\s*>(.*?)</sheet>", re.DOTALL)
_ROW_RE = re.compile(r"<row(?:\s[^>]*)?>(.*?)</row>", re.DOTALL)
_CELL_RE = re.compile(r"<c(?:\s[^>]*)?>(.*?)</c>", re.DOTALL)
_WS_RE = re.compile(r"\s+")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], text)).strip()


def extract_xlsx_sheet(xml: str, media_prefix: str = "") -> list[dict]:
    """Extract ordered output spans from one simplified SpreadsheetML
    worksheet: sheet-name heading followed by the cell grid as a table
    span in the engine-wide ``" | "``/newline table text format."""
    spans: list[dict] = []
    for m in _SHEET_RE.finditer(xml):
        name, body = _norm(m.group(1)), m.group(2)
        if name:
            spans.append({"kind": "heading", "text": name, "media_ref": ""})
        rows = []
        for rm in _ROW_RE.finditer(body):
            cells = [_norm(c.group(1)) for c in _CELL_RE.finditer(rm.group(1))]
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
    return spans
