"""Invariant tests for operators/heavyhitters.py beyond the oracle
gate: exact agreement with the brute-force heavy-hitter set under
adversarial repartitioning, and the per-partition candidate bound."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from docling_api_spark.operators.heavyhitters import heavy_hitters, mg_candidates


def _toks(spark, words, parts):
    return spark.createDataFrame(
        [(w,) for w in words], "tok string"
    ).repartition(parts)


def test_heavy_hitters_exact_vs_bruteforce_any_partitioning(spark):
    # skewed stream: one dominant token, a mid tier, a long tail — the
    # tail is crafted to evict mid-tier counters inside MG partitions
    words = (
        ["alpha"] * 400
        + ["beta"] * 120
        + ["gamma"] * 90
        + [f"tail{i}" for i in range(300)]
    )
    k = 10  # threshold n/k = 91: alpha, beta qualify; gamma (90) just misses
    n = len(words)
    want = {w: c for w, c in Counter(words).items() if c * k >= n}
    for parts in (1, 3, 17):
        got = {
            r["tok"]: r["cnt"]
            for r in heavy_hitters(_toks(spark, words, parts), k).collect()
        }
        assert got == want, f"parts={parts}"


def test_mg_candidates_bounded_and_recall(spark):
    words = ["hot"] * 500 + [f"cold{i}" for i in range(1000)]
    k = 8
    toks = _toks(spark, words, 5)
    cands = {r["tok"] for r in mg_candidates(toks, k).collect()}
    # per-partition bound: <= k candidates x 5 partitions
    assert len(cands) <= k * 5
    # guaranteed recall: every token with freq >= n/k is a candidate
    n = len(words)
    for w, c in Counter(words).items():
        if c * k >= n:
            assert w in cands


def test_null_token_rows_are_ignored_consistently(spark):
    """NULL-token rows can never be sketch candidates (value_counts
    drops them), so they must not inflate the total n either — before
    the guard, enough NULL noise raised the n/k threshold and evicted
    true heavy hitters from the result."""
    rows = [("a",)] * 40 + [("b",)] * 10 + [(None,)] * 200
    toks = spark.createDataFrame(rows, "tok string").repartition(4)
    got = {r.tok: (r.cnt, r.n) for r in heavy_hitters(toks, k=4).collect()}
    # n counts the 50 real occurrences only; a (40*4 >= 50) qualifies
    assert got.get("a") == (40, 50)
    assert "b" not in got  # 10*4 < 50
    assert None not in got
