"""Non-vacuity pins for similarity plans: a green driver row proves
nothing if the result is empty by construction (VERDICT r4 ask #3 —
mutual_nn_pairs shipped rounds 1-4 with a dedup guard the equi-join
collapsed to `x.id < x.id`, i.e. always-false)."""

from __future__ import annotations

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"


def test_mutual_nn_pairs_non_empty(spark):
    rows = E.queries()["mutual_nn_pairs"](spark, SF_DIR).collect()
    # 51 reciprocal-top-1 pairs exist in the capped slice (verified
    # against the DuckDB oracle when the guard was fixed); pin a
    # loose floor so corpus regeneration doesn't flake the test.
    assert len(rows) >= 10
    for r in rows:
        assert r["a"] < r["b"]
    # reciprocity is symmetric: no pair may appear twice
    assert len({(r["a"], r["b"]) for r in rows}) == len(rows)
