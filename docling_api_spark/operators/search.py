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


def ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: MLlib KMeans over the vector column.
    Returns (model, indexed) where ``indexed`` carries a ``cell``
    column. At 10^9+ vectors the cell is the physical partition key
    (write the index table partitioned by cell) so probes scan only
    nprobe/n_cells of the data. Deterministic given the seed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_fv = corpus.withColumn("__fv", array_to_vector(F.col(vec_col)))
    # coarse quantization converges in a few sweeps; 20-iter default
    # just burns driver jobs (cells only steer the probe, exact
    # rescoring fixes residual assignment noise)
    model = KMeans(
        k=n_cells, seed=seed, maxIter=6, featuresCol="__fv", predictionCol="cell"
    ).fit(with_fv)
    return model, model.transform(with_fv).drop("__fv")


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """IVF approximate top-k: assign corpus to KMeans cells, probe the
    ``nprobe`` cells nearest the query, exact cosine rescoring inside
    them. ``query``: one row, column ``qv``.

    Approximate by design (no SQL oracle; recall vs brute force is
    pytest-checked) — the scale path when SRP-LSH bucket skew matters.
    """
    spark = corpus.sparkSession
    model, indexed = ivf_index(corpus, n_cells=n_cells, vec_col=vec_col)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = spark.createDataFrame(centers, "cell int, centroid array<double>")
    probe_cells = (
        query.crossJoin(cent_df)
        .select(
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.col("centroid"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist2"),
        )
        .orderBy("dist2", "cell")
        .limit(nprobe)
        .select("cell")
    )
    cands = indexed.join(F.broadcast(probe_cells), "cell")
    scored = cands.crossJoin(F.broadcast(query)).select(
        F.col(id_col), cosine(F.col(vec_col), F.col("qv"), scale).alias("sim")
    )
    return scored.orderBy(F.desc("sim"), id_col).limit(k)
