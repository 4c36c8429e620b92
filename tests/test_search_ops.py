"""Recall checks for the approximate vector-search paths against the
exact brute-force baseline (the oracle can't cover MLlib internals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_api_spark.operators.search import ann_topk, ivf_topk, knn_topk

SF_DIR = "/root/testdata/sf0.01"


def _query(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"))
    )


def _corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ivf_recall_vs_bruteforce(spark):
    corpus, q = _corpus(spark), _query(spark)
    exact = {r.vec_id for r in knn_topk(corpus, q, k=10).collect()}
    approx = {r.vec_id for r in ivf_topk(corpus, q, k=10, n_cells=8, nprobe=4).collect()}
    # probing half the cells must recover most of the true top-10
    assert len(exact & approx) >= 6


def test_ivf_exact_when_probing_all_cells(spark):
    corpus, q = _corpus(spark), _query(spark)
    exact = [tuple(r) for r in knn_topk(corpus, q, k=10).collect()]
    full = [tuple(r) for r in ivf_topk(corpus, q, k=10, n_cells=8, nprobe=8).collect()]
    assert exact == full


def test_srp_ann_subset_of_corpus_and_sane(spark):
    corpus, q = _corpus(spark), _query(spark)
    rows = ann_topk(corpus, q, dim=64, k=5, n_bits=8).collect()
    assert 1 <= len(rows) <= 5
    # query vector itself is in its own bucket with sim 1.0
    assert rows[0].vec_id == 0 and abs(rows[0].sim - 1.0) < 1e-6
