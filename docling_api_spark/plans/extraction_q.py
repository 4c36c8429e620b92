"""Extraction-pipeline queries with SQL oracles.

The boilerplate-wrap round-trip makes the full kernel + Spark pipeline
oracle-checkable: wrap each document's text in boilerplate HTML, run
extraction, and the recovered content must equal the original text
(`SELECT doc_id, text`) — the strip is correct iff round-trip ≡ id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_api_spark.operators.extract import extract, extract_flat
from docling_api_spark.operators.render import render_text
from docling_api_spark.plans.registry import query
from docling_api_spark.sources.catalog import load, wrap_documents_as_corpus


@query(
    "extract_html_roundtrip",
    oracle="SELECT doc_id, text AS content FROM documents",
)
def extract_html_roundtrip(spark, sf_dir):
    corpus = wrap_documents_as_corpus(load(spark, sf_dir, "documents"))
    ext = extract(corpus)
    return ext.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        render_text(F.col("spans")).alias("content"),
    )


@query(
    "extract_span_counts",
    # wrapped docs always produce exactly 1 main-content span; the
    # boilerplate (header h1, nav links, ad sidebar, link-farm,
    # footer) must contribute zero spans.
    oracle="SELECT doc_id, 1 AS n_spans FROM documents",
)
def extract_span_counts(spark, sf_dir):
    corpus = wrap_documents_as_corpus(load(spark, sf_dir, "documents"))
    ext = extract(corpus)
    return ext.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("spans").alias("n_spans"),
    )


@query(
    "extract_metrics",
    # per-source extraction metrics (history-stats shape, SURVEY A1/A5)
    oracle="""
        SELECT source,
               COUNT(*) AS docs,
               SUM(n_chars) AS total_chars
        FROM documents GROUP BY source
    """,
)
def extract_metrics(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    corpus = wrap_documents_as_corpus(docs)
    flat = extract_flat(corpus)
    per_doc = flat.groupBy("doc_id").agg(F.sum(F.length("text")).alias("chars"))
    joined = per_doc.join(
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), "source"), "doc_id"
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("docs"), F.sum("chars").alias("total_chars")
    )
