"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, each checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_api_spark.operators.extract import extract
from docling_api_spark.operators.render import render_text
from docling_api_spark.sources.catalog import load, wrap_documents_as_corpus

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wrap sf0.001 documents in boilerplate HTML, run the
    full mapInPandas extraction pipeline, render text per doc."""
    docs = load(spark, SF0001, "documents")
    corpus = wrap_documents_as_corpus(docs)
    extracted = extract(corpus)
    return extracted.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        render_text(F.col("spans")).alias("content"),
        F.size("spans").alias("n_spans"),
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docling_api_spark.plans import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from docling_api_spark.plans import registry

    return registry.oracle_sql()
