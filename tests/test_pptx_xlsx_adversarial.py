"""Adversarial PPTX/XLSX-kernel hardening (malformed office XML).

Same contract as tests/test_docx_adversarial.py: bounded, visible
recovery — never silent loss of a slide/sheet tail, never hallucinated
markup in span text. Regression classes (all reproduced against the
pre-fix kernels):

* pptx: unclosed trailing ``<p:sp>`` dropped its text; an unclosed
  ``<p:graphicFrame>`` regex-spanned to the NEXT frame's closer,
  swallowing every shape in between; an unclosed ``<a:t>`` leaked
  literal markup into extracted text.
* xlsx: an unclosed ``<sheet>`` at EOF dropped its whole grid (even
  with fully closed rows); an unclosed sheet followed by a closed one
  merged grids and lost the second heading; an unclosed ``<c>``
  leaked markup into cell text.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from docling_api_spark.kernels.pptx import extract_pptx_slide
from docling_api_spark.kernels.xlsx import extract_xlsx_sheet

KINDS = {"heading", "text", "list_item", "code", "table", "image", "caption"}

_WORD_RE = re.compile(r"\w+")


class TestPptxRecovery:
    def test_unclosed_trailing_shape_is_flushed(self):
        spans = extract_pptx_slide(
            '<p:sp type="body"><a:p><a:t>first</a:t></a:p></p:sp>'
            '<p:sp type="body"><a:p><a:t>tail text</a:t></a:p>'
        )
        assert [s["text"] for s in spans] == ["first", "tail text"]

    def test_unclosed_frame_does_not_swallow_shapes_before_next_frame(self):
        spans = extract_pptx_slide(
            "<p:graphicFrame><a:tbl><a:tr><a:tc><a:t>A</a:t></a:tc></a:tr>"
            '<p:sp type="body"><a:p><a:t>mid</a:t></a:p></p:sp>'
            "<p:graphicFrame><a:tbl><a:tr><a:tc><a:t>B</a:t></a:tc></a:tr>"
            "</a:tbl></p:graphicFrame>"
        )
        assert [(s["kind"], s["text"]) for s in spans] == [
            ("table", "A"),
            ("text", "mid"),
            ("table", "B"),
        ]

    def test_foster_paragraph_in_unclosed_frame(self):
        spans = extract_pptx_slide(
            "<p:graphicFrame><a:tbl><a:tr><a:tc><a:t>X</a:t></a:tc></a:tr>"
            "<a:p><a:t>foster</a:t></a:p>"
        )
        assert [(s["kind"], s["text"]) for s in spans] == [
            ("table", "X"),
            ("text", "foster"),
        ]

    def test_unclosed_run_never_hallucinates_markup(self):
        spans = extract_pptx_slide(
            '<p:sp type="body"><a:p><a:t>open <a:t>next</a:t></a:p></p:sp>'
        )
        assert [s["text"] for s in spans] == ["open next"]
        assert all("<" not in s["text"] for s in spans)

    def test_dangling_bullet_paragraph_keeps_kind(self):
        spans = extract_pptx_slide('<p:sp type="body"><a:p bullet="1"><a:t>dangling</a:t>')
        assert [(s["kind"], s["text"]) for s in spans] == [("list_item", "dangling")]

    def test_escaped_angle_brackets_stay_literal(self):
        # strip-tags-then-unescape: escaped markup in run text is
        # CONTENT, on the recovery path exactly as on the closed one
        spans = extract_pptx_slide(
            '<p:sp type="body"><a:p><a:t>keep &lt;tag&gt; literal</a:t></a:p></p:sp>'
        )
        assert [s["text"] for s in spans] == ["keep <tag> literal"]
        assert extract_pptx_slide('<p:sp type="title"><a:t>&lt;tag&gt;')[0]["text"] == "<tag>"


class TestXlsxRecovery:
    def test_unclosed_sheet_at_eof_keeps_grid(self):
        spans = extract_xlsx_sheet('<sheet name="S1"><row><c>a</c></row>')
        assert [(s["kind"], s["text"]) for s in spans] == [
            ("heading", "S1"),
            ("table", "a"),
        ]

    def test_unclosed_sheet_does_not_merge_into_next(self):
        spans = extract_xlsx_sheet(
            '<sheet name="S1"><row><c>a</c></row>'
            '<sheet name="S2"><row><c>b</c></row></sheet>'
        )
        assert [(s["kind"], s["text"]) for s in spans] == [
            ("heading", "S1"),
            ("table", "a"),
            ("heading", "S2"),
            ("table", "b"),
        ]

    def test_trailing_unclosed_row_yields_closed_cells(self):
        spans = extract_xlsx_sheet('<sheet name="S1"><row><c>a</c><c>b</c>')
        assert [(s["kind"], s["text"]) for s in spans] == [
            ("heading", "S1"),
            ("table", "a | b"),
        ]

    def test_unclosed_cell_never_hallucinates_markup(self):
        spans = extract_xlsx_sheet('<sheet name="S1"><row><c>a<c>b</c></row></sheet>')
        assert all("<" not in s["text"] for s in spans)
        assert [s["text"] for s in spans] == ["S1", "a b"]

    def test_escaped_angle_brackets_stay_literal(self):
        spans = extract_xlsx_sheet(
            '<sheet name="S1"><row><c>keep &lt;c&gt; literal</c></row></sheet>'
        )
        assert [s["text"] for s in spans] == ["S1", "keep <c> literal"]


_pptx_frag = st.sampled_from(
    [
        '<p:sp type="title">', '<p:sp type="body">', "</p:sp>",
        "<p:graphicFrame>", "</p:graphicFrame>", '<p:pic r:embed="m1"/>',
        "<a:p>", '<a:p bullet="1">', "</a:p>", "<a:t>", "</a:t>",
        "<a:tbl>", "</a:tbl>", "<a:tr>", "</a:tr>", "<a:tc>", "</a:tc>",
        "alpha", "bravo charlie", "&amp;", "&lt;tag&gt;", " ",
    ]
)

_xlsx_frag = st.sampled_from(
    [
        '<sheet name="One">', '<sheet name="Two">', "</sheet>",
        "<row>", "</row>", "<c>", "</c>",
        "alpha", "bravo charlie", "&amp;", "&lt;tag&gt;", " ",
    ]
)


@settings(max_examples=120, deadline=None)
@given(st.lists(_pptx_frag, min_size=0, max_size=30))
def test_pptx_tag_soup_safety(frags):
    xml = "".join(frags)
    spans = extract_pptx_slide(xml)
    assert extract_pptx_slide(xml) == spans
    input_words = set(
        _WORD_RE.findall(xml.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">"))
    )
    for s in spans:
        assert s["kind"] in KINDS
        # no raw-markup leak: the ONLY legitimate `<` in this
        # generator's output is the entity-unescaped `<tag>` (the
        # kernel's documented strip-tags-then-unescape order — pinned
        # well-formed by test_escaped_angle_brackets_stay_literal);
        # any other `<` is a leaked source tag
        assert "<" not in s["text"].replace("<tag>", "")
        for w in _WORD_RE.findall(s["text"]):
            assert w in input_words, (w, xml)


@settings(max_examples=120, deadline=None)
@given(st.lists(_xlsx_frag, min_size=0, max_size=30))
def test_xlsx_tag_soup_safety(frags):
    xml = "".join(frags)
    spans = extract_xlsx_sheet(xml)
    assert extract_xlsx_sheet(xml) == spans
    input_words = set(
        _WORD_RE.findall(xml.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">"))
    )
    for s in spans:
        assert s["kind"] in KINDS
        assert "<" not in s["text"].replace("<tag>", "")
        for w in _WORD_RE.findall(s["text"]):
            assert w in input_words, (w, xml)
