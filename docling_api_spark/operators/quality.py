"""Gopher-style document quality signals (repetition + composition
filters from the published Gopher/MassiveText rules; same family as
C4/DataTrove hygiene): token-count bounds, mean word length,
alphabetic-token fraction, most-common-bigram mass, duplicate-line
fraction.

Design: one Arrow-batched ``mapInPandas`` pass emits INTEGER counters
per document (a per-doc Counter is linear and shuffle-free — the
frequency signals would otherwise need a (doc, gram)-keyed shuffle of
the whole token stream); every ratio, rounding, and threshold is then
pure Catalyst arithmetic. Integers cross the Python/JVM boundary, so
the DuckDB oracle reproduces the ratios bit-exactly (Python round()
is banker's; SQL ROUND is half-up — never round in the kernel).
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIGNAL_DDL = (
    "id string, n_tokens int, sum_tok_len int, n_alpha int, "
    "top_bigram_cnt int, n_lines int, n_distinct_lines int"
)

_ALPHA_RE = re.compile(r"[A-Za-z]")  # ASCII-alpha: exact twin of the SQL regex
# ASCII \s+ — the canonical tokenizer (functions.hashing.tokens / the
# oracle's string_split_regex('\s+')). Python str.split() would also
# split on UNICODE whitespace (NBSP etc.) and silently diverge from
# both engines' ASCII regex semantics on HTML-extracted text.
_WS_RE = re.compile(r"\s+", re.ASCII)


def _signal_batches(text_col: str, id_col: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                toks = [t for t in _WS_RE.split(text) if t]
                lines = text.split("\n")
                bigrams = Counter(
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                )
                rows.append(
                    (
                        str(doc_id),
                        len(toks),
                        sum(len(t) for t in toks),
                        sum(1 for t in toks if _ALPHA_RE.search(t)),
                        max(bigrams.values()) if bigrams else 0,
                        len(lines),
                        len(set(lines)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "n_tokens", "sum_tok_len", "n_alpha",
                    "top_bigram_cnt", "n_lines", "n_distinct_lines",
                ],
            )

    return run


def gopher_quality_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_top_bigram_frac: float = 0.2,
    max_dup_line_frac: float = 0.3,
) -> DataFrame:
    """docs → per-doc quality signals + the composite ``passes`` flag.

    Thresholds default to the published Gopher rules (token bounds,
    mean word length 3-10, ≥80% alphabetic tokens, top-bigram mass
    ≤20%, duplicate-line fraction ≤30%)."""
    counters = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _signal_batches(text_col, id_col), schema=SIGNAL_DDL
    )
    n = F.col("n_tokens").cast("double")
    mean_len = F.when(F.col("n_tokens") > 0, F.round(F.col("sum_tok_len") / n, 4))
    alpha = F.when(F.col("n_tokens") > 0, F.round(F.col("n_alpha") / n, 4))
    bigram = F.when(
        F.col("n_tokens") > 1,
        F.round(F.col("top_bigram_cnt") / (n - 1), 4),
    ).otherwise(F.lit(0.0))
    dup_line = F.round(
        1 - F.col("n_distinct_lines") / F.col("n_lines").cast("double"), 4
    )  # n_lines >= 1 always (split of "" is [""])
    sig = counters.select(
        "id",
        "n_tokens",
        mean_len.alias("mean_tok_len"),
        alpha.alias("alpha_frac"),
        bigram.alias("top_bigram_frac"),
        dup_line.alias("dup_line_frac"),
    )
    passes = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_tok_len") >= min_mean_len)
        & (F.col("mean_tok_len") <= max_mean_len)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
    )
    return sig.select("*", F.coalesce(passes, F.lit(False)).alias("passes"))


# PII patterns chosen for cross-dialect identical semantics (Java regex
# on the Spark side, RE2 in the DuckDB oracle): plain character
# classes, \b, and bounded repetition only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def scrub_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing (standard pre-training hygiene): mask emails,
    phone numbers, and IPv4 addresses with typed placeholders, count
    replacements per document. Pure Catalyst regexp expressions —
    whole-stage codegen, no Python, no shuffle (map-only).

    Counts are ACTUAL replacements: each stage counts on the text the
    previous stage already scrubbed, so a digit run consumed inside an
    earlier match (an IP-shaped local part of an email) never inflates
    a later counter — counts always reconcile with the placeholders in
    ``scrubbed``."""
    stage = F.col(text_col)
    counts = {}
    for kind, pat in PII_PATTERNS.items():
        counts[kind] = F.size(F.regexp_extract_all(stage, F.lit(pat), 0))
        stage = F.regexp_replace(stage, pat, f"<{kind.upper()}>")
    return docs.select(
        F.col(id_col),
        stage.alias("scrubbed"),
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ip"].alias("n_ips"),
    )
