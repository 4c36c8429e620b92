"""Non-finite (NaN/±inf) embedding safety — the second corrupt-vector
class after tests/test_zero_norm_vectors.py's zero-norm one.

Two failure shapes, both reproduced against the unguarded code:

* **job abort** — ANSI casts of NaN/±inf doubles to BIGINT/INT throw
  CAST_OVERFLOW, so ``embedding_dim_health`` (the audit that EXISTS to
  catch corrupt vectors) and ``quantize_int8`` aborted on the first
  corrupt component instead of surfacing it;
* **rank poisoning** — NaN compares GREATER than everything on both
  engines, so an unguarded NaN cosine would pass every ``>=
  threshold`` filter and rank FIRST in every top-k.

Contract: non-finite components quantize to NULL (counted in
``n_nonfinite`` by the health audit); cosine of a vector with a
non-finite component is NULL (the norm check ``> 0 AND < inf`` is
false for both NaN and inf norms on both engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from docling_api_spark.functions import hashing as H
from docling_api_spark.operators.sample import quantize_int8
from docling_api_spark.operators.search import knn_topk
from docling_api_spark.plans import _sql as S
from docling_api_spark.plans.similarity_q import embedding_dim_health
from tests.test_oracle_parity import _canon


def _duck_embeddings(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con.execute(sql).fetch_df()

NAN, INF = float("nan"), float("inf")

_VECS = [
    (0, [1.0, 0.0, 0.5, 0.25]),
    (1, [0.9, 0.1, 0.5, 0.25]),
    (2, [NAN, 1.0, 1.0, 1.0]),
    (3, [1.0, INF, 1.0, 1.0]),
    (4, [1.0, 1.0, -INF, 1.0]),
]


@pytest.fixture()
def corrupt_dir(tmp_path):
    """sf-dir shaped directory whose embeddings table has non-finite
    components — one plain parquet FILE so DuckDB and Spark read the
    identical bytes."""
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in _VECS], pa.int64()),
            "embedding": pa.array(
                [np.array(v[1], dtype=np.float32) for v in _VECS],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(_VECS), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_cosine_null_on_nonfinite(spark):
    df = spark.createDataFrame(
        [
            ([NAN, 1.0], [1.0, 0.0]),
            ([1.0, 0.0], [INF, 1.0]),
            ([-INF, 1.0], [NAN, 1.0]),
            ([1.0, 0.0], [1.0, 0.0]),
        ],
        "a array<float>, b array<float>",
    )
    rows = df.select(H.cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert [r.c for r in rows[:3]] == [None, None, None]
    assert abs(rows[3].c - 1.0) < 1e-9


def test_sql_twin_null_on_nonfinite():
    import duckdb

    con = duckdb.connect()
    expr = S.cosine("a", "b", 2)
    got = con.execute(
        f"SELECT {expr} AS c FROM (VALUES "
        f"(['nan'::FLOAT, 1.0::FLOAT], [1.0::FLOAT, 0.0::FLOAT]), "
        f"([1.0::FLOAT, 0.0::FLOAT], ['inf'::FLOAT, 1.0::FLOAT]), "
        f"([1.0::FLOAT, 0.0::FLOAT], [1.0::FLOAT, 0.0::FLOAT])) t(a,b)"
    ).fetchall()
    assert got[0][0] is None and got[1][0] is None
    assert abs(got[2][0] - 1.0) < 1e-9


def test_knn_nan_vector_never_tops(spark):
    corpus = spark.createDataFrame(_VECS, "vec_id int, embedding array<float>")
    q = spark.createDataFrame([([1.0, 0.0, 0.5, 0.25],)], "qv array<float>")
    rows = knn_topk(corpus, q, k=5).collect()  # no abort
    assert rows[0].vec_id == 0 and abs(rows[0].sim - 1.0) < 1e-9
    assert {r.vec_id for r in rows if r.sim is None} == {2, 3, 4}
    assert [r.vec_id for r in rows[:2]] == [0, 1]


def test_quantize_int8_nulls_nonfinite_components(spark):
    df = spark.createDataFrame(
        [(v[0], v[1]) for v in _VECS], "vec_id int, embedding array<float>"
    )
    rows = (
        df.select("vec_id", quantize_int8(F.col("embedding")).alias("qs"))
        .select("vec_id", "qs.scale", "qs.q")
        .collect()
    )
    by_id = {r.vec_id: r for r in rows}
    assert by_id[0].q == [127, 0, 64, 32] and abs(by_id[0].scale - 1.0) < 1e-12
    # NaN position NULL, scale from the finite components only
    assert by_id[2].q == [None, 127, 127, 127]
    assert by_id[3].q == [127, None, 127, 127]
    assert by_id[4].q == [127, 127, None, 127]
    for vid in (2, 3, 4):
        assert abs(by_id[vid].scale - 1.0) < 1e-12


def test_dim_health_counts_nonfinite_and_matches_oracle(spark, corrupt_dir):
    got = embedding_dim_health(spark, corrupt_dir)  # no abort
    pdf = got.toPandas()
    by_dim = {int(r.dim): r for r in pdf.itertuples()}
    assert [by_dim[d].n_nonfinite for d in (1, 2, 3, 4)] == [1, 1, 1, 0]
    assert all(by_dim[d].n == 5 for d in (1, 2, 3, 4))
    # exact cross-engine parity on the corrupt table, driver semantics
    from docling_api_spark.plans.registry import oracle_sql

    sql = oracle_sql()["embedding_dim_health"]
    assert _canon(pdf) == _canon(_duck_embeddings(sql, corrupt_dir))


def test_quantize_oracle_parity_on_corrupt_table(spark, corrupt_dir):
    from docling_api_spark.plans.registry import oracle_sql, queries

    for name in ("embedding_quantize_int8", "ann_quantized_topk"):
        got = queries()[name](spark, corrupt_dir).toPandas()  # no abort
        assert _canon(got) == _canon(
            _duck_embeddings(oracle_sql()[name], corrupt_dir)
        ), name
