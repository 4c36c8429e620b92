"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the training-pipeline extension that turns the
engine's token surface into a *learned* subword vocabulary.

Scale shape (the part that matters at 100 TB): the corpus is read
ONCE, collapsing to a word-frequency table that is vocab-sized (Heaps'
law: ~10^6 rows for a 10^12-doc corpus). No stage force-broadcasts
that table (r4 ask #5 audit: joins on it shuffle on the word key;
only per-iteration argmax scalars reach the driver), so a junk-token
vocab blowup degrades to bigger shuffles, never a broadcast OOM.
Every merge
iteration then runs on that small weighted table: one explode+agg for
pair counts, one argmax row to the driver (the merge decision is a
single scalar triple — the same driver-coordination shape as a KMeans
step, NOT a data collect), one map to apply the merge. The documents
table never participates in the loop.

Merge application uses the delimited-string replace trick: symbols are
rendered ``' s1  s2  s3 '`` (each symbol space-wrapped; tokens are
whitespace-split so a space can never occur inside a symbol), and
merging pair (p1, p2) is ``replace(' p1  p2 ', ' p1p2 ')`` — SQL
replace scans left-to-right non-overlapping, which is exactly greedy
BPE merge order, and both engines implement it identically. This keeps
the merge a pure Catalyst expression (no Python fold, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_api_spark.functions.hashing import tokens

END_MARK = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass -> (word, freq, syms) weighted vocabulary with
    each word exploded to characters + the end-of-word marker. This is
    the ONLY stage that touches the corpus; everything downstream is
    vocab-sized."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                ),
                F.array(F.lit(END_MARK)),
            ).alias("syms"),
        )
    )


def _merge_pair(syms, p1: str, p2: str):
    """Apply one BPE merge to an array<string> of symbols via the
    space-delimited replace (greedy left-to-right, = BPE order)."""
    wrapped = F.concat(F.lit(" "), F.array_join(syms, "  "), F.lit(" "))
    replaced = F.replace(
        wrapped,
        F.lit(f" {p1}  {p2} "),
        F.lit(f" {p1}{p2} "),
    )
    return F.split(F.trim(replaced), "  ")


def bpe_train(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the merge
    table (step, p1, p2, merged, pair_count) — one row per learned
    merge. Argmax pair with (count desc, p1 asc, p2 asc) tie-break and
    integer frequency sums, so the table is bit-reproducible
    cross-engine and under repartitioning."""
    spark = docs.sparkSession
    merges, vocab0 = _train_merges(docs, n_merges, text_col)
    vocab0.unpersist()
    return spark.createDataFrame(
        merges, "step int, p1 string, p2 string, merged string, pair_count bigint"
    )


def _train_merges(
    docs: DataFrame, n_merges: int, text_col: str
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Returns (merges, vocab0) where vocab0 is the PERSISTED initial
    word-frequency table — callers that also encode (bpe_apply) reuse
    it so the corpus is scanned exactly once; standalone callers must
    unpersist it (bpe_train does)."""
    vocab0 = word_freq_table(docs, text_col).persist()
    vocab = vocab0
    merges = []
    # guard: sequence(1, k) is DESCENDING [1,0] for k<1, not empty (the
    # hashing.window_hashes pitfall) — a fully-merged single-symbol word
    # would otherwise emit out-of-bounds pair structs (ANSI error, or
    # NULL pairs that poison the argmax)
    pair_expr = (
        "CASE WHEN size(syms) >= 2 THEN"
        " transform(sequence(1, size(syms) - 1),"
        " i -> struct(syms[i-1] AS p1, syms[i] AS p2))"
        " ELSE CAST(array() AS array<struct<p1:string,p2:string>>) END"
    )
    for step in range(1, n_merges + 1):
        pairs = vocab.select(
            "freq",
            F.explode(F.expr(pair_expr)).alias("p"),
        )
        # single-ROW argmax fetch (the merge decision is one scalar
        # triple — KMeans-style driver coordination, not a data
        # collect; TakeOrderedAndProject(limit=1) on the executors)
        best = (
            pairs.groupBy("p.p1", "p.p2")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "p1", "p2")
            .first()
        )
        if best is None:
            break
        p1, p2, cnt = best["p1"], best["p2"], best["cnt"]
        merges.append((step, p1, p2, p1 + p2, cnt))
        old = vocab
        vocab = old.select(
            "word", "freq", _merge_pair(F.col("syms"), p1, p2).alias("syms")
        ).persist()
        vocab.count()  # materialize before dropping the parent cache
        if old is not vocab0:  # keep vocab0 cached for encode reuse
            old.unpersist()
    if vocab is not vocab0:
        vocab.unpersist()
    return merges, vocab0


def bpe_apply(
    docs: DataFrame | None,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Encode the corpus vocabulary with a learned merge list: returns
    (word, freq, syms) with all merges applied in training order.

    The whole merge stack compiles to ONE chained Catalyst expression
    (nested replace over the space-delimited symbol string) — a single
    whole-stage-codegen projection over the vocab-sized table, no
    per-merge materialization and no Python in the row path. Pass the
    ``vocab0`` returned by training as ``vocab`` to reuse its cached
    word-frequency table (the corpus then scans exactly ONCE across
    train + encode); otherwise the table is rebuilt from ``docs``."""
    syms = F.col("syms")
    for p1, p2 in merges:
        syms = _merge_pair(syms, p1, p2)
    base = vocab if vocab is not None else word_freq_table(docs, text_col)
    return base.select("word", "freq", syms.alias("syms"))
