"""Alternating large-star/small-star connected components (Kiveris et
al., SOCC 2014): label-equivalence with the one-hop propagation
variant, plus the deep-chain case that motivates it — O(log^2 n)
rounds vs diameter-many."""

from __future__ import annotations

import random

from docling_api_spark.operators.asof import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_star_clique_and_isolated(spark):
    # clique {1,2,3}, pair {10,11}, isolated {99}
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    n = _nodes(spark, [1, 2, 3, 10, 11, 99])
    assert _labels(connected_components_star(e, n)) == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99,
    }


def test_star_deep_chain_converges_in_log_rounds(spark):
    # a 64-node chain: one-hop propagation needs 63 rounds; the
    # alternating algorithm collapses it within max_iter=8 — the
    # topology class this variant exists for
    ids = list(range(1, 65))
    e = _edges(spark, [(i, i + 1) for i in ids[:-1]])
    n = _nodes(spark, ids)
    lab = _labels(connected_components_star(e, n, max_iter=8))
    assert lab == {i: 1 for i in ids}
    # the same budget is insufficient for one-hop propagation
    # (documents WHY the star variant exists; propagation semantics
    # are one-hop-per-round by contract, see test_asof_cc.py)
    partial = _labels(connected_components(e, n, max_iter=8))
    assert partial != lab


def test_star_matches_propagation_on_random_graphs(spark):
    rng = random.Random(42)
    ids = list(range(100))
    pairs = [
        (a, b)
        for a, b in (
            (rng.randrange(100), rng.randrange(100)) for _ in range(80)
        )
        if a != b
    ]
    e = _edges(spark, pairs)
    n = _nodes(spark, ids)
    star = _labels(connected_components_star(e, n))
    prop = _labels(connected_components(e, n, max_iter=100))
    assert star == prop


def test_star_empty_edges(spark):
    e = _edges(spark, []).limit(0)
    n = _nodes(spark, [5, 6])
    assert _labels(connected_components_star(e, n)) == {5: 5, 6: 6}


def test_star_reversed_and_duplicate_edges(spark):
    # orientation-free input: duplicates and both orientations collapse
    e = _edges(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (2, 3)])
    n = _nodes(spark, [1, 2, 3])
    assert _labels(connected_components_star(e, n)) == {1: 1, 2: 1, 3: 1}


def test_star_cutoff_emits_one_row_per_id(spark):
    # max_iter cutoff path (ADVICE r4): before the fix, a node could
    # appear both as src (stale label) and as a synthesized root —
    # an 8-node chain cut at max_iter=1 emitted 13 rows for 8 nodes.
    # Contract: one row per id, labels stale-but-unique at cutoff.
    ids = list(range(1, 9))
    e = _edges(spark, [(i, i + 1) for i in ids[:-1]])
    n = _nodes(spark, ids)
    rows = connected_components_star(e, n, max_iter=1).collect()
    assert len(rows) == len(ids)
    assert sorted(r["id"] for r in rows) == ids


def test_star_round_count_bounded_on_cliques(spark):
    # dedup cluster graphs are (near-)cliques: the alternating stars
    # must close them in <=3 rounds (1-2 to converge + 1 to detect
    # stability) — the fixed per-round job cost is what the star CC
    # swap in dedup_best_representative/dedup_clusters buys back
    # (VERDICT r4 ask #4 round-count contract).
    pairs = []
    for base in (0, 100, 200):
        ids = [base + i for i in range(5)]
        pairs += [(a, b) for a in ids for b in ids if a < b]
    e = _edges(spark, pairs)
    n = _nodes(spark, sorted({x for p in pairs for x in p}))
    stats = {}
    lab = _labels(connected_components_star(e, n, stats=stats))
    assert stats["rounds"] <= 3
    assert lab == {base + i: base for base in (0, 100, 200) for i in range(5)}
