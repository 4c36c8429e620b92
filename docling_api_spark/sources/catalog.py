"""Testdata catalog + adapters from the driver's flat `documents`
table to the engine's interleaved corpus shape.

``wrap_documents_as_corpus`` deterministically embeds each document's
text in boilerplate-laden HTML (nav/ads/footer + a link-farm block).
Running the full extraction pipeline over the wrapped corpus must
recover exactly the original text — which makes the *whole* HTML
kernel + Spark pipeline oracle-checkable with plain SQL
(`SELECT doc_id, text`): the boilerplate strip is correct iff the
round-trip is the identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


_HTML_PRE = (
    "<html><head><title>synthetic</title><style>b{}</style></head><body>"
    "<header><h1>Corpus Site</h1></header>"
    "<nav><a href='/'>Home</a><a href='/a'>About</a><a href='/p'>Privacy</a></nav>"
    "<div class='sidebar ad-banner'><p>buy now limited offer</p></div><main><p>"
)
_HTML_POST = (
    "</p></main><p><a href='/r1'>related one</a> <a href='/r2'>related two</a></p>"
    "<footer><p>© corpus footer</p></footer></body></html>"
)


def wrap_documents_as_corpus(docs: DataFrame) -> DataFrame:
    """documents(doc_id:any, text) → corpus(doc_id, fmt, size_bytes, spans).

    Pure column expressions (no Python); doc_id is carried through as a
    string and restored by the caller if needed.
    """
    markup = F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("html").alias("fmt"),
        F.length(markup).cast("long").alias("size_bytes"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                markup.alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
