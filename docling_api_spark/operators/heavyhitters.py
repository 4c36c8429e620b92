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
        for pdf in batches:
            # bulk MG step: merge the batch's exact counts, then if
            # more than k counters remain, subtract the (k+1)-th
            # largest value from all and drop non-positives — a valid
            # sequence of MG decrements (each unit decrement retires
            # >= k+1 distinct counters), preserving the error bound
            c.update(pdf["tok"].value_counts().to_dict())
            if len(c) > k:
                kth = nlargest(k + 1, c.values())[-1]
                c = Counter({t: v - kth for t, v in c.items() if v > kth})
        yield pd.DataFrame({"tok": pd.array(list(c.keys()), dtype="string")})

    return mg


def mg_candidates(toks: DataFrame, k: int) -> DataFrame:
    """``toks(tok)`` (one row per occurrence) → distinct candidate
    tokens, ≤ k per input partition, superset of every token with
    global frequency ≥ n/k."""
    return toks.mapInPandas(_mg_partition_fn(k), "tok string").distinct()


def heavy_hitters(toks: DataFrame, k: int) -> DataFrame:
    """Tokens with frequency ≥ n/k (n = total occurrences), with their
    EXACT counts: MG candidate generation → candidates-only exact count
    (broadcast semi-join keeps the big side's aggregation restricted to
    ≤ k·partitions keys) → integer threshold ``cnt * k >= n``."""
    cands = mg_candidates(toks, k)
    counted = (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    total = toks.select(F.count("*").alias("n"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k >= F.col("n"))
        .select("tok", "cnt", "n")
    )
