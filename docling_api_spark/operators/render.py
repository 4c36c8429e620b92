"""Render sinks (SURVEY.md §2.1 S5/S8): text / markdown / json exports
of the ordered spans array, plus the per-page NDJSON export.

All renders are pure Catalyst column expressions (higher-order
functions over the spans array) — fully JVM-side, whole-stage
codegen'd, zero Python. Parity: reference export_to_text /
export_to_markdown / export_to_dict (services/docling_converter.py:89-97)
and the per-page NDJSON stream (services/docling_streaming.py:19-38).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def render_text(spans: Column) -> Column:
    """Plain-text render: texts of non-media spans joined by newline."""
    keep = F.filter(spans, lambda s: (s["kind"] != "image") & (s["text"] != ""))
    return F.array_join(F.transform(keep, lambda s: s["text"]), "\n")


def _md_span(s: Column) -> Column:
    k = s["kind"]
    return (
        F.when(k == "heading", F.concat(F.lit("## "), s["text"]))
        .when(k == "list_item", F.concat(F.lit("- "), s["text"]))
        .when(k == "code", F.concat(F.lit("```\n"), s["text"], F.lit("\n```")))
        .when(k == "caption", F.concat(F.lit("*"), s["text"], F.lit("*")))
        .when(
            k == "image",
            F.concat(F.lit("!["), s["text"], F.lit("]("), s["media_ref"], F.lit(")")),
        )
        .otherwise(s["text"])
    )


def render_markdown(spans: Column) -> Column:
    """Markdown render; table spans are already pipe-formatted rows."""
    return F.array_join(F.transform(spans, _md_span), "\n\n")


def render_json(spans: Column) -> Column:
    """JSON render of the spans array (export_to_dict parity)."""
    return F.to_json(spans)


def rendered(extracted: DataFrame, fmt: str = "text") -> DataFrame:
    """Select a rendered column per doc, dispatch on output format
    (OutputFormat enum parity, services/docling_converter.py:23-28)."""
    col = {"text": render_text, "markdown": render_markdown, "json": render_json}[fmt](
        F.col("spans")
    )
    return extracted.select("doc_id", col.alias("content"))


def per_page_ndjson(flat: DataFrame) -> DataFrame:
    """Per-page export: one NDJSON line per (doc, page), ordered —
    parity with stream_pages (services/docling_streaming.py:19-38)."""
    pages = (
        flat.groupBy("doc_id", "page")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("raw_offset", "local_order", "kind", "text", "media_ref")
                        )
                    ),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("content")
        )
        .select(
            "doc_id",
            "page",
            "content",
            F.to_json(F.struct(F.col("page"), F.col("content"))).alias("line"),
        )
    )
    return pages.orderBy("doc_id", "page")
