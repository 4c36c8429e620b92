"""PDF layout-parse kernel (pure Python, deterministic).

Re-implements the layout-analysis semantics the reference obtains from
docling's PDF pipeline (PdfPipelineOptions: layout + table structure,
reference services/docling_converter.py:43-67) over an explicit,
deterministic *page block model* — the per-page raw span text is a list
of lines:

    BLOCK x0,y0,x1,y1,role|payload

with role ∈ {para, heading, list, code, table, figure, caption,
pageno, footer, header}. Geometry is in abstract page units (ints or
floats). The kernel:

  1. parses blocks;
  2. drops page furniture (pageno / footer / header roles) — the
     layout-filter assertion of the golden fixtures;
  3. reconstructs reading order with recursive XY-cut (Nagy & Seth
     1984, a published technique): alternate horizontal (y) and
     vertical (x) cuts at projection gaps; leaves sorted by (y0, x0);
  4. classifies into the output span vocabulary.

Table payload encodes rows with ``ROW_SEP`` and cells with ``CELL_SEP``
and is re-rendered to the engine-wide table text format (cells joined
by `` | ``, rows by newline). Figure payload is the media_ref.
"""

from __future__ import annotations

import math

__all__ = ["extract_pdf_page", "ROW_SEP", "CELL_SEP"]

ROW_SEP = " § "
CELL_SEP = " ¦ "

_ROLE_KIND = {
    "para": "text",
    "heading": "heading",
    "list": "list_item",
    "code": "code",
    "table": "table",
    "figure": "image",
    "caption": "caption",
}
_DROP_ROLES = frozenset({"pageno", "footer", "header"})

# Minimum projection gap (page units) that constitutes a cut.
MIN_GAP = 1.0


def _parse_blocks(page_text: str) -> list[dict]:
    blocks = []
    for line in page_text.split("\n"):
        line = line.strip()
        if not line.startswith("BLOCK "):
            continue
        head, _, payload = line[6:].partition("|")
        coords_role = head.strip().split(",")
        if len(coords_role) != 5:
            continue
        x0, y0, x1, y1 = (float(v) for v in coords_role[:4])
        # Non-finite geometry is corrupt input, same class as the
        # non-numeric coords ValueError above: NaN mid-points compare
        # False against any cut (the block would silently vanish from
        # BOTH xy-cut halves — silent data loss), and ±inf puts every
        # block on one side of an inf cut (the split never shrinks).
        # Raise so the doc takes the visible per-doc quarantine path
        # (operators/extract.py ERROR_KIND) instead.
        if not all(map(math.isfinite, (x0, y0, x1, y1))):
            raise ValueError(f"non-finite block geometry: {head.strip()!r}")
        role = coords_role[4].strip()
        blocks.append({"x0": x0, "y0": y0, "x1": x1, "y1": y1, "role": role, "payload": payload})
    return blocks


def _largest_gap(blocks: list[dict], axis: str) -> tuple[float, float | None]:
    """Widest gap (≥ MIN_GAP) in the blocks' projection onto `axis`.

    Returns (gap_width, cut_position) or (0.0, None) if no gap.
    """
    lo, hi = ("y0", "y1") if axis == "y" else ("x0", "x1")
    ivs = sorted((b[lo], b[hi]) for b in blocks)
    best_gap, best_cut = 0.0, None
    cur_end = ivs[0][1]
    for s, e in ivs[1:]:
        gap = s - cur_end
        if gap >= MIN_GAP and gap > best_gap:
            best_gap, best_cut = gap, (cur_end + s) / 2.0
        cur_end = max(cur_end, e)
    return best_gap, best_cut


def _xy_cut(blocks: list[dict]) -> list[dict]:
    """XY-cut reading order (largest-gap binary split).

    Cut at the single widest projection gap across both axes (a wide
    inter-column gutter beats narrow inter-paragraph leading, so
    columns are read fully left-before-right); y wins ties
    (top-before-bottom). Leaves sort by (y0, x0).

    Iterative depth-first worklist, NOT recursion: a single-column
    page of n evenly-leaded paragraphs splits one block per cut
    (every gap ties, the first wins), so recursion depth would be
    O(n) and a well-formed ~1000-block page would quarantine on
    RecursionError. The explicit stack emits the identical pre-order.
    """
    ordered: list[dict] = []
    stack = [blocks]
    while stack:
        blks = stack.pop()
        if len(blks) <= 1:
            ordered.extend(blks)
            continue
        gy, cy = _largest_gap(blks, "y")
        gx, cx = _largest_gap(blks, "x")
        if cy is None and cx is None:
            ordered.extend(sorted(blks, key=lambda b: (b["y0"], b["x0"])))
            continue
        if cx is not None and (cy is None or gx > gy):
            lo, hi, cut = "x0", "x1", cx
        else:
            lo, hi, cut = "y0", "y1", cy
        first = [b for b in blks if (b[lo] + b[hi]) / 2.0 <= cut]
        second = [b for b in blks if (b[lo] + b[hi]) / 2.0 > cut]
        stack.append(second)
        stack.append(first)
    return ordered


def _render_table(payload: str) -> str:
    rows = [r.split(CELL_SEP) for r in payload.split(ROW_SEP)]
    ncols = max(len(r) for r in rows)
    rows = [r + [""] * (ncols - len(r)) for r in rows]
    return "\n".join(" | ".join(c.strip() for c in row) for row in rows)


def extract_pdf_page(page_text: str, media_prefix: str = "") -> list[dict]:
    """Extract ordered output spans from one page's block model."""
    blocks = [b for b in _parse_blocks(page_text) if b["role"] not in _DROP_ROLES]
    ordered = _xy_cut(blocks)
    spans: list[dict] = []
    for b in ordered:
        kind = _ROLE_KIND.get(b["role"])
        if kind is None:
            continue
        payload = b["payload"].strip()
        if kind == "table":
            spans.append({"kind": "table", "text": _render_table(b["payload"]), "media_ref": ""})
        elif kind == "image":
            # figure geometry survives as bbox provenance (reference
            # ImageInfo.bbox, core/schemas.py:26)
            bbox = f"{b['x0']:g},{b['y0']:g},{b['x1']:g},{b['y1']:g}"
            spans.append(
                {
                    "kind": "image",
                    "text": "",
                    "media_ref": (media_prefix + payload) if payload else "",
                    "bbox": bbox,
                }
            )
        else:
            if payload:
                spans.append({"kind": kind, "text": payload, "media_ref": ""})
    return spans
