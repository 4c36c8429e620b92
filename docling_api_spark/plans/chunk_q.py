"""Chunking + embedding queries (reference ingest path D6/D7,
services/chunking_service.py:40-95, core/embeddings.py:26-54).

Oracle policy: the *fixed-window* chunking policy and the *integer
core* of the feature-hash embedder are exactly SQL-expressible, so
those run through the DuckDB gate; the sentence-aware hybrid policy
and float normalization are covered by unit tests (tests/test_chunk_embed.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_api_spark import EMBEDDING_DIM
from docling_api_spark.operators.chunk import chunk_text_column
from docling_api_spark.operators.embed import hash_counts_udf
from docling_api_spark.plans import _sql as S
from docling_api_spark.plans.registry import query
from docling_api_spark.sources.catalog import load

_TOKS = S.toks("text")
MAXTOK = 32


@query(
    "chunk_documents",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS tok FROM documents),
        c AS (SELECT doc_id,
                     unnest([{{'chunk_index': i,
                               'content': array_to_string(tok[i*{MAXTOK}+1:(i+1)*{MAXTOK}], ' '),
                               'token_count': len(tok[i*{MAXTOK}+1:(i+1)*{MAXTOK}])}}
                             for i in range(0, CAST(ceil(len(tok)/{MAXTOK}.0) AS INT))],
                            recursive := true) AS u
              FROM t)
        SELECT doc_id, chunk_index, content, token_count FROM c
    """,
)
def chunk_documents(spark, sf_dir):
    """Fixed-window chunking (mapInPandas kernel) of documents.text at
    max_tokens=32; one output row per chunk. Shuffle-free."""
    d = load(spark, sf_dir, "documents")
    chunks = chunk_text_column(d, max_tokens=MAXTOK, policy="fixed")
    return chunks.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_index",
        "content",
        "token_count",
    )


@query(
    "embed_hash_stats",
    oracle=f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tk FROM documents),
        h AS (SELECT doc_id, {S.md5long("tk")} AS hv FROM t),
        b AS (SELECT doc_id, hv % {EMBEDDING_DIM} AS bucket,
                     SUM(CASE WHEN (hv >> 31) & 1 = 1 THEN 1 ELSE -1 END) AS w
              FROM h GROUP BY 1, 2)
        SELECT doc_id,
               COUNT(CASE WHEN w <> 0 THEN 1 END) AS n_nonzero,
               CAST(SUM(ABS(w)) AS BIGINT) AS sum_abs,
               CAST(SUM(w) AS BIGINT) AS net
        FROM b GROUP BY doc_id
    """,
)
def embed_hash_stats(spark, sf_dir):
    """The integer core of the dim-384 feature-hash embedder (bucket
    assignment + sign votes), verified bucket-exactly: stats are
    computed FROM the pandas-UDF output array."""
    d = load(spark, sf_dir, "documents")
    counts = d.select("doc_id", hash_counts_udf(EMBEDDING_DIM)(F.col("text")).alias("c"))
    return counts.select(
        "doc_id",
        F.size(F.filter("c", lambda x: x != 0)).alias("n_nonzero"),
        F.aggregate(
            F.transform("c", lambda x: F.abs(x)), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_abs"),
        F.aggregate("c", F.lit(0).cast("long"), lambda a, x: a + x).alias("net"),
    )


@query(
    "chunk_embed_pipeline", prio=90,
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS tok FROM documents),
        c AS (SELECT doc_id,
                     unnest([{{'chunk_index': i,
                               'ctoks': tok[i*{MAXTOK}+1:(i+1)*{MAXTOK}]}}
                             for i in range(0, CAST(ceil(len(tok)/{MAXTOK}.0) AS INT))],
                            recursive := true) AS u
              FROM t)
        SELECT doc_id, chunk_index,
               len(ctoks) AS token_count,
               CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                   [CAST((CASE WHEN ({S.md5long("tk")} >> 31) & 1 = 1 THEN 1 ELSE -1 END) *
                         ({S.md5long("tk")} % {EMBEDDING_DIM} + 1) AS BIGINT)
                    for tk in ctoks])) AS BIGINT) AS checksum
        FROM c
    """,
)
def chunk_embed_pipeline(spark, sf_dir):
    """End-to-end ingest lineage (chunk → embed) as one Spark job:
    fixed-window chunks, embedder counts per chunk, bucket-weighted
    checksum Σ count_b·(b+1) — equal on both engines iff every token
    landed in the right bucket with the right sign."""
    d = load(spark, sf_dir, "documents")
    chunks = chunk_text_column(d, max_tokens=MAXTOK, policy="fixed")
    counts = chunks.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_index",
        "token_count",
        hash_counts_udf(EMBEDDING_DIM)(F.col("content")).alias("c"),
    )
    checksum = F.aggregate(
        F.zip_with(
            F.col("c"),
            F.sequence(F.lit(1), F.lit(EMBEDDING_DIM)),
            lambda cnt, idx: cnt * idx.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return counts.select("doc_id", "chunk_index", "token_count", checksum.alias("checksum"))


@query(
    "ingest_end_to_end",
    # §3.2 full ingest lineage THROUGH extraction: wrap → mapInPandas
    # extract → chunk (fixed window) → embed counts → per-chunk
    # checksum. The boilerplate-strip roundtrip is the identity, so
    # the oracle is the same construction straight off documents.text —
    # any error in ANY stage (kernel, reassembly, chunker, embedder)
    # breaks the value hash.
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS tok FROM documents),
        c AS (SELECT doc_id,
                     unnest([{{'chunk_index': i,
                               'ctoks': tok[i*{MAXTOK}+1:(i+1)*{MAXTOK}]}}
                             for i in range(0, CAST(ceil(len(tok)/{MAXTOK}.0) AS INT))],
                            recursive := true) AS u
              FROM t)
        SELECT doc_id, chunk_index,
               len(ctoks) AS token_count,
               CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                   [CAST((CASE WHEN ({S.md5long("tk")} >> 31) & 1 = 1 THEN 1 ELSE -1 END) *
                         ({S.md5long("tk")} % {EMBEDDING_DIM} + 1) AS BIGINT)
                    for tk in ctoks])) AS BIGINT) AS checksum
        FROM c
    """,
)
def ingest_end_to_end(spark, sf_dir):
    from docling_api_spark.operators.chunk import chunk_extracted
    from docling_api_spark.operators.extract import extract
    from docling_api_spark.sources.catalog import wrap_documents_as_corpus

    corpus = wrap_documents_as_corpus(load(spark, sf_dir, "documents"))
    extracted = extract(corpus)
    chunks = chunk_extracted(extracted, max_tokens=MAXTOK, policy="fixed")
    counts = chunks.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_index",
        "token_count",
        hash_counts_udf(EMBEDDING_DIM)(F.col("content")).alias("c"),
    )
    checksum = F.aggregate(
        F.zip_with(
            F.col("c"),
            F.sequence(F.lit(1), F.lit(EMBEDDING_DIM)),
            lambda cnt, idx: cnt * idx.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return counts.select("doc_id", "chunk_index", "token_count", checksum.alias("checksum"))


# The sentence-aware packing itself IS SQL-expressible at the
# invariant level: inject deterministic sentence boundaries (a period
# after every 5th word — the driver corpus has none, verified 0/500
# docs with [.!?]), then the oracle replays the greedy
# pack-whole-sentences-up-to-max fold with an encoded
# (chunks, open_tokens) accumulator. No sentence here exceeds
# max_tokens (each is 5 words + '.'), so the oversized hard-split
# branch stays covered by the unit fixtures only.
_ENC = 100000  # acc = n_closed_chunks * _ENC + tokens_in_open_chunk


@query(
    "chunk_hybrid_invariants", prio=8,
    oracle=f"""
        WITH der AS (
            SELECT doc_id,
                   regexp_replace(text, '((?:\\w+ ){{4}}\\w+) ', '\\1. ', 'g') AS t2
            FROM documents
        ),
        s AS (
            SELECT doc_id,
                   [len(regexp_extract_all(x, '\\w+|[^\\w\\s]'))
                    for x in string_split(replace(t2, '. ', '.' || chr(1)), chr(1))] AS cnts
            FROM der
        ),
        f AS (
            SELECT doc_id, cnts,
                   list_reduce(list_prepend(0, cnts),
                       (acc, n) -> CASE
                           WHEN acc % {_ENC} > 0 AND acc % {_ENC} + n > {MAXTOK}
                           THEN (acc // {_ENC} + 1) * {_ENC} + n
                           ELSE acc + n END) AS acc
            FROM s
        )
        SELECT doc_id,
               CAST(acc // {_ENC} + CASE WHEN acc % {_ENC} > 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS n_chunks,
               CAST(list_sum(cnts) AS BIGINT) AS sum_tokens,
               CAST(list_max(cnts) AS INT) <= {MAXTOK} AS within_cap
        FROM f
    """,
)
def chunk_hybrid_invariants(spark, sf_dir):
    """Companion oracle gate for the sentence-aware hybrid chunker
    (VERDICT r2 item 7): per-doc chunk counts + token sums over a
    sentence-injected corpus, computed FROM the hybrid kernel's actual
    output and replayed exactly in SQL."""
    d = load(spark, sf_dir, "documents")
    der = d.select(
        "doc_id",
        F.regexp_replace("text", r"((?:\w+ ){4}\w+) ", r"$1. ").alias("text"),
    )
    chunks = chunk_text_column(der, max_tokens=MAXTOK, policy="hybrid")
    return chunks.groupBy(F.col("doc_id").cast("long").alias("doc_id")).agg(
        F.count("*").alias("n_chunks"),
        F.sum("token_count").alias("sum_tokens"),
        (F.max("token_count") <= MAXTOK).alias("within_cap"),
    )


@query("chunk_documents_hybrid", prio=20)  # sentence-aware policy → rows-only driver check
def chunk_documents_hybrid(spark, sf_dir):
    """Hybrid (sentence-aware, heading-tracked) chunking of documents
    — the reference's actual chunking policy
    (services/chunking_service.py:40-95). Sentence boundaries aren't
    ANSI-SQL-expressible, so this registers rows-only for the driver;
    the policy itself is golden-fixture-tested
    (tests/test_chunk_embed.py)."""
    d = load(spark, sf_dir, "documents")
    chunks = chunk_text_column(d, max_tokens=MAXTOK, policy="hybrid")
    return chunks.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_index",
        "content",
        "token_count",
    )
