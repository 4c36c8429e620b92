"""Zero-norm embedding safety across the cosine family.

Under Spark 4's default ANSI mode a double ``0.0/0.0`` raises
DIVIDE_BY_ZERO and ABORTS THE JOB — so before the guard in
``functions/hashing.py:cosine`` (and its DuckDB twin
``plans/_sql.py:cosine``), one all-zero embedding anywhere in a
100 TB corpus killed every cosine-based operator: knn/ann top-k,
embedding near-dup pairs, SemDeDup, mutual-NN. Real model providers
emit zero vectors for empty/whitespace inputs, so this is a
legitimate-at-scale input, same hardening class as the round-5
kernel tag-soup work (a malformed ROW must quarantine or degrade,
never abort the job).

Contract: cosine is UNDEFINED on a zero-norm side → NULL. NULL
fails every ``>= threshold`` filter and sorts last under the
``(sim DESC, id ASC)`` convention, so zero vectors are excluded
from pair/dup results and rank last in top-k — on BOTH engines
(DuckDB's CASE-guarded twin returns NULL the same way; its default
ORDER BY ... DESC is also NULLS LAST).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_api_spark.functions import hashing as H
from docling_api_spark.operators.dedup import embedding_dup_pairs, semdedup
from docling_api_spark.operators.search import assign_cells, knn_topk
from docling_api_spark.plans import _sql as S


@pytest.fixture()
def vecs(spark):
    # vec 3 is all-zero; 0/1 are near-dups; 2 is distinct
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.5, 0.0]),
            (1, [0.99, 0.01, 0.5, 0.0]),
            (2, [-1.0, 0.5, 0.0, 1.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id int, embedding array<float>",
    )


def test_cosine_null_on_zero_norm(spark):
    df = spark.createDataFrame(
        [
            ([0.0, 0.0], [1.0, 0.0]),   # zero left
            ([1.0, 0.0], [0.0, 0.0]),   # zero right
            ([0.0, 0.0], [0.0, 0.0]),   # zero both (the 0/0 abort case)
            ([1.0, 0.0], [1.0, 0.0]),   # sane pair unchanged
        ],
        "a array<float>, b array<float>",
    )
    rows = df.select(H.cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert [r.c for r in rows[:3]] == [None, None, None]
    assert abs(rows[3].c - 1.0) < 1e-9


def test_sql_twin_matches_null_semantics():
    con = duckdb.connect()
    expr = S.cosine("a", "b", 2)
    got = con.execute(
        f"SELECT {expr} AS c FROM (VALUES ([0.0,0.0], [1.0,0.0]),"
        f" ([0.0,0.0], [0.0,0.0]), ([1.0,0.0], [1.0,0.0])) t(a,b)"
    ).fetchall()
    assert got[0][0] is None and got[1][0] is None
    assert abs(got[2][0] - 1.0) < 1e-9


def test_knn_topk_zero_corpus_vector_ranks_last(spark, vecs):
    q = spark.createDataFrame([([1.0, 0.0, 0.5, 0.0],)], "qv array<float>")
    rows = knn_topk(vecs, q, k=4).collect()  # no DIVIDE_BY_ZERO abort
    assert [r.vec_id for r in rows[:2]] == [0, 1]
    assert rows[-1].vec_id == 3 and rows[-1].sim is None


def test_knn_topk_zero_query_vector_no_abort(spark, vecs):
    q = spark.createDataFrame([([0.0, 0.0, 0.0, 0.0],)], "qv array<float>")
    rows = knn_topk(vecs, q, k=4).collect()
    assert all(r.sim is None for r in rows)


def test_embedding_dup_pairs_excludes_zero_vectors(spark, vecs):
    # two zero vectors share every SRP bucket (sign(0)=sign(0)) — the
    # exact shape that used to 0/0-abort inside the bucket self-join
    two_zeros = vecs.union(
        spark.createDataFrame([(4, [0.0, 0.0, 0.0, 0.0])], vecs.schema)
    )
    rows = embedding_dup_pairs(two_zeros, dim=4, threshold=0.9).collect()
    got = {(r.a, r.b) for r in rows}
    assert (0, 1) in got
    assert all(3 not in p and 4 not in p for p in got)


def test_semdedup_zero_vector_survives_undefined(spark, vecs):
    two_zeros = vecs.union(
        spark.createDataFrame([(4, [0.0, 0.0, 0.0, 0.0])], vecs.schema)
    )
    rows = semdedup(two_zeros, dim=4, n_cells=4, threshold=0.9).collect()
    by_id = {r.id: r for r in rows}
    assert len(by_id) == 5
    # the near-dup pair resolved: 0 kept, 1 dropped
    assert not by_id[0].dropped and by_id[1].dropped
    # zero vectors: similarity undefined -> never dropped, cell NULL
    for z in (3, 4):
        assert not by_id[z].dropped and by_id[z].cell is None


def test_assign_cells_zero_vector_null_cell(spark, vecs):
    cents = H.ivf_centroids(4, 4)
    rows = assign_cells(
        vecs.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        cents,
        "v",
    ).collect()
    by_id = {r.id: r for r in rows}
    assert by_id[3].cell is None and by_id[3].ccos is None
    for i in (0, 1, 2):
        assert by_id[i].cell is not None
