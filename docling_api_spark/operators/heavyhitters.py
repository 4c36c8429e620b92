"""Distributed heavy hitters via per-partition Misra-Gries sketches
(Misra & Gries 1982; merge form per Agarwal et al., "Mergeable
Summaries", PODS 2012).

Scale shape — why this beats a full groupBy at 100 TB: the exact
`vocab_heavy_hitters` plan shuffles the ENTIRE token vocabulary
(hash-agg on every distinct token). Here each input partition emits at
most ``k`` candidate tokens (an Arrow-batched Misra-Gries pass, bulk
decrements — no per-row Python), so the only full-corpus work after
the narrow candidate union is ONE aggregation restricted to candidate
tokens via a broadcast semi-join. The vocabulary-wide shuffle never
happens.

Exactness contract (what lets the oracle be plain SQL): an item with
global frequency ≥ n/k has, by pigeonhole, frequency ≥ n_p/k on at
least one partition p, and MG with k counters under-counts by at most
n_p/(k+1) < n_p/k — so every true heavy hitter survives in some
partition's candidate set (recall = 1, guaranteed). The exact
counting pass then restores precision, and the final filter is the
integer comparison ``count * k >= n`` (no division, no float lane).
"""

from __future__ import annotations

from collections import Counter
from heapq import nlargest

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition_fn(k: int):
    def mg(batches):
        c: Counter = Counter()
        n = 0
        for pdf in batches:
            # bulk MG step: merge the batch's exact counts, then if
            # more than k counters remain, subtract the (k+1)-th
            # largest value from all and drop non-positives — a valid
            # sequence of MG decrements (each unit decrement retires
            # >= k+1 distinct counters), preserving the error bound
            # non-null occurrences only, CONSISTENTLY: value_counts()
            # drops NULLs from the sketch, so counting them into n
            # would inflate the threshold and break the pigeonhole
            # recall guarantee (a NULL row can never be a candidate)
            n += int(pdf["tok"].count())
            c.update(pdf["tok"].value_counts().to_dict())
            if len(c) > k:
                kth = nlargest(k + 1, c.values())[-1]
                c = Counter({t: v - kth for t, v in c.items() if v > kth})
        # the partition's total occurrence count rides the SAME pass as
        # a sentinel row (tok NULL) — the corpus is scanned once for
        # sketch+total, not once per statistic (ADVICE r3: a third
        # corpus-wide scan just for n was the dominant avoidable cost)
        yield pd.DataFrame(
            {
                "tok": pd.array(list(c.keys()) + [None], dtype="string"),
                "n_part": pd.array([None] * len(c) + [n], dtype="Int64"),
            }
        )

    return mg


def mg_sketch(toks: DataFrame, k: int) -> DataFrame:
    """``toks(tok)`` (one row per occurrence) → per-partition MG sketch
    rows: ≤ k candidate rows (tok, n_part NULL) per input partition —
    a superset of every token with global frequency ≥ n/k — plus one
    sentinel row (tok NULL, n_part = partition occurrence count)."""
    return toks.mapInPandas(_mg_partition_fn(k), "tok string, n_part long")


def mg_candidates(toks: DataFrame, k: int) -> DataFrame:
    """Distinct MG candidate tokens (see ``mg_sketch``)."""
    return (
        mg_sketch(toks, k).filter(F.col("tok").isNotNull()).select("tok").distinct()
    )


def heavy_hitters(toks: DataFrame, k: int) -> DataFrame:
    """Tokens with frequency ≥ n/k (n = total occurrences), with their
    EXACT counts: MG candidate generation → candidates-only exact count
    (broadcast semi-join keeps the big side's aggregation restricted to
    ≤ k·partitions keys) → integer threshold ``cnt * k >= n``.

    The corpus token stream is scanned exactly TWICE: once by the
    sketch pass (which also folds in the total count via sentinel
    rows) and once by the candidates-only counting join. The sketch
    output — ≤ (k+1)·partitions narrow rows — is persisted so deriving
    candidates and n from it never re-reads the corpus."""
    sketch = mg_sketch(toks, k).persist()
    cands = sketch.filter(F.col("tok").isNotNull()).select("tok").distinct()
    total = sketch.agg(F.sum("n_part").alias("n"))
    counted = (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k >= F.col("n"))
        .select("tok", "cnt", "n")
    )
