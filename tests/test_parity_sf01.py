"""Opt-in 10×-scale parity: every query whose DuckDB oracle is
sub-quadratic re-verified exactly at sf0.1 (600k lineitem, 100k
events). Slow (~3 min) and therefore opt-in:

    SPARK_GRAFT_PARITY_SF01=1 python -m pytest tests/test_parity_sf01.py -q

The skipped names in QUADRATIC_ORACLES are the O(n²) brute-force
ground-truth oracles — infeasible in the oracle engine at this size
by design, not Spark limits (their semantics are already gated at
sf0.01).
"""

from __future__ import annotations

import os

import pytest

from tests.test_oracle_parity import _ORACLES, _QUERIES, _canon, _duck_at

SF_DIR = "/root/testdata/sf0.1"

QUADRATIC_ORACLES = {
    "dedup_minhash_pairs",
    "simhash_dup_pairs",
    "dedup_cascade_survivors",
    "embedding_dup_pairs",
    "dedup_clusters",
    "curation_pipeline_audit",  # chains the brute-force near-dup oracle
}

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_PARITY_SF01"),
    reason="10x-scale parity is opt-in (SPARK_GRAFT_PARITY_SF01=1); ~3 min",
)


@pytest.mark.parametrize("name", sorted(set(_ORACLES) - QUADRATIC_ORACLES))
def test_parity_at_sf01(spark, name):
    got = _QUERIES[name](spark, SF_DIR).toPandas()
    want = _duck_at(_ORACLES[name], SF_DIR)
    gc, gr = _canon(got)
    wc, wr = _canon(want)
    assert gc == wc, f"{name}: column mismatch {gc} vs {wc}"
    assert len(gr) == len(wr), f"{name}: row count {len(gr)} vs {len(wr)}"
    mismatches = [(a, b) for a, b in zip(gr, wr) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[0]}"
