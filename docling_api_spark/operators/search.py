"""Vector retrieval (reference T1/T2: sqlite-vec KNN,
core/vector_store.py:54-74; score/sort services/rag_service.py:89-103).

Two strategies, same contract (query vectors × corpus → top-k by
cosine):

* **Brute-force** (`knn_topk`) — exact. The query side is tiny and
  broadcast; similarity is a pure JVM expression (zip_with/aggregate
  in index order — no UDF, no shuffle except the final
  TakeOrderedAndProject). Right up to ~10^7 vectors per executor scan;
  this is the reference's own semantics (exact KNN).
* **SRP-LSH** (`ann_topk`) — approximate scale path. A deterministic
  signed-random-projection signature (hyperplanes derived from the
  md5 hash family, functions/hashing.py:srp_planes) buckets vectors;
  candidates come from the query's bucket only, then exact cosine
  rescoring. At 10^9+ vectors the bucket column becomes the partition
  key: the probe is a partition-pruned scan instead of a full sweep.
  Everything (planes included) is reproducible from constants, so the
  whole approximate pipeline is still exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_api_spark.functions.hashing import cosine, srp_planes, srp_signature


def knn_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Exact top-k: corpus ⨯ broadcast(query) → cosine → TakeOrdered.

    ``query`` must have one row with column ``qv`` (the query vector).
    Deterministic total order: (sim desc, id asc) on the *rounded*
    similarity so cross-engine comparisons sort identically.
    """
    joined = corpus.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col),
        cosine(F.col(vec_col), F.col("qv"), scale).alias("sim"),
    )
    return scored.orderBy(F.desc("sim"), id_col).limit(k)


def with_srp_bucket(
    df: DataFrame, dim: int, n_bits: int = 16, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the LSH bucket column (BIGINT signature)."""
    planes = srp_planes(dim, n_bits)
    return df.withColumn("bucket", srp_signature(F.col(vec_col), planes))


def ann_topk(
    corpus: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact
    cosine rescoring inside it. ``query``: one row, column ``qv``."""
    planes = srp_planes(dim, n_bits)
    bucketed = corpus.withColumn("bucket", srp_signature(F.col(vec_col), planes))
    qb = query.withColumn("qbucket", srp_signature(F.col("qv"), planes))
    cands = bucketed.join(
        F.broadcast(qb), bucketed["bucket"] == qb["qbucket"], "inner"
    )
    scored = cands.select(
        F.col(id_col),
        cosine(F.col(vec_col), F.col("qv"), scale).alias("sim"),
    )
    return scored.orderBy(F.desc("sim"), id_col).limit(k)
