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

from docling_api_spark.functions.hashing import cosine, let, srp_planes, srp_signature


def assign_cells(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str,
    scale: int = 6,
    score_col: str | None = "ccos",
) -> DataFrame:
    """Argmax-cosine coarse-quantizer cell per row (adds ``cell`` INT
    and, when ``score_col`` is set, the winning rounded cosine) with
    ZERO row multiplication and ZERO shuffle.

    The n_cells×dim centroid grid rides a single-row broadcast join as
    one ``array<array<double>>`` column (constant-size plan — no
    ``F.lit`` unrolling, VERDICT r3 #3); per-row scores are one
    let-bound ``transform`` over it, and the cell is
    ``array_position(scores, array_max(scores)) - 1``. array_position
    returns the FIRST match, i.e. the smallest cell id — identical
    tie-break to the previous ``ORDER BY ccos DESC, cell ASC`` window
    (ties are well-defined because scores are rounded to ``scale``).

    This replaces the ``centroid_scores`` + per-id window-argmax shape
    for ASSIGNMENT consumers: that shape multiplied every corpus row
    n_cells× and shuffled the multiplied rows — payload vector
    included — through a per-id row_number sort. At 100 TB the
    difference is a full corpus-width shuffle vs none at all.
    ``centroid_scores`` below remains for the multi-cell PROBE side
    (top-nprobe cells of a single query row needs all n_cells scores
    as rows)."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [([[float(x) for x in v] for v in cents],)],
        schema="__cents ARRAY<ARRAY<DOUBLE>> NOT NULL",
    )
    best = let(
        F.transform(F.col("__cents"), lambda c: cosine(F.col(vec_col), c, scale)),
        lambda s: let(
            F.array_max(s),
            lambda m: F.struct(
                (F.array_position(s, m) - 1).cast("int").alias("cell"),
                m.alias("ccos"),
            ),
        ),
    )
    out = [F.col("__best.cell").alias("cell")]
    if score_col is not None:
        out.append(F.col("__best.ccos").alias(score_col))
    return (
        df.crossJoin(F.broadcast(cent_df))
        .withColumn("__best", best)
        .select(*[F.col(c) for c in df.columns], *out)
    )


def centroid_scores(
    df: DataFrame, cents: list[list[float]], vec_col: str, scale: int = 6
) -> DataFrame:
    """Score every row against every coarse centroid via a BROADCAST
    n_cells-row centroid table (adds ``cell``, ``ccos``; caller applies
    its own ranking — the top-nprobe PROBE side of IVF, where all
    n_cells scores are needed as rows; pure argmax assignment should
    use ``assign_cells``, which never multiplies rows). Replaces the
    unrolled per-cell ``F.array(*[F.lit(x) ...])`` expression — 16
    cells × 384 dims = 6,144 literal nodes of pure codegen/compile
    weight (VERDICT r3 #3: the data work is milliseconds; plan
    compilation wasn't). The broadcast nested-loop join emits the same
    n_cells rows per vector the explode did, with a constant-size
    plan."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in enumerate(cents)],
        schema="cell INT NOT NULL, centroid ARRAY<DOUBLE> NOT NULL",
    )
    return (
        df.crossJoin(F.broadcast(cent_df))
        .withColumn("ccos", cosine(F.col(vec_col), F.col("centroid"), scale))
        .drop("centroid")
    )


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

    Convenience wrapper: fits the index inline. At scale, build the
    index ONCE (``ivf_index`` + ``ivf_centers_df``) and serve many
    queries through ``ivf_probe`` over the persisted indexed table —
    the deployment shape the bench times separately.
    """
    spark = corpus.sparkSession
    model, indexed = ivf_index(corpus, n_cells=n_cells, vec_col=vec_col)
    cent_df = ivf_centers_df(spark, model)
    return ivf_probe(
        indexed, cent_df, query, k=k, nprobe=nprobe,
        vec_col=vec_col, id_col=id_col, scale=scale,
    )


def ivf_centers_df(spark, model) -> DataFrame:
    """KMeans cluster centers as a (cell, centroid) DataFrame — the
    tiny broadcast side of every probe."""
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(centers, "cell int, centroid array<double>")


def ivf_probe(
    indexed: DataFrame,
    cent_df: DataFrame,
    query: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Probe stage only: nearest ``nprobe`` cells by centroid distance,
    exact cosine rescoring inside them. ``indexed`` is the built index
    (vector table + ``cell`` column — persisted/partitioned by cell at
    scale); ``cent_df`` the (cell, centroid) table."""
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


def ivf_fixed_topk(
    corpus: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """IVF top-k with a DETERMINISTIC md5-derived coarse quantizer
    (functions/hashing.py:ivf_centroids) instead of KMeans: cell =
    argmax cosine(vector, centroid) with (cosine desc, cell asc)
    tie-break on the rounded similarity; probe the ``nprobe`` cells
    nearest the query; exact rescoring inside.

    Same physical shape as ``ivf_topk`` (cell = partition key at
    scale, nprobe pruning) but every step is reproducible from
    constants — this pins the IVF *algorithm* exactly against the SQL
    oracle, while ``ivf_topk``'s KMeans recall stays pytest-gated.

    ``query`` must have exactly ONE row (same contract as knn_topk /
    ann_topk / ivf_topk): the probe ranking and the rescoring
    cross-join both assume a single query vector.
    """
    from docling_api_spark.functions.hashing import ivf_centroids

    cents = ivf_centroids(dim, n_cells)

    # Corpus assignment is the zero-shuffle argmax (assign_cells) —
    # the old per-id window shuffled every corpus vector n_cells×.
    # The SINGLE query row keeps the exploded shape (its top-nprobe
    # ranking needs all n_cells scores as rows, and one row × n_cells
    # is free), ranked by orderBy+limit: TakeOrderedAndProject over 16
    # rows, no window, no single-partition WindowExec warning.
    indexed = assign_cells(corpus, cents, vec_col, scale, score_col=None)
    probes = (
        centroid_scores(query, cents, "qv", scale)
        .orderBy(F.desc("ccos"), "cell")
        .limit(nprobe)
        .select("cell")
    )
    cands = indexed.join(F.broadcast(probes), "cell")
    scored = cands.crossJoin(F.broadcast(query)).select(
        F.col(id_col), cosine(F.col(vec_col), F.col("qv"), scale).alias("sim")
    )
    return scored.orderBy(F.desc("sim"), id_col).limit(k)


def topk_per_group(scored: DataFrame, group_col: str, order_cols: list, k: int) -> DataFrame:
    """Exact per-group top-k without a per-group full sort: a local
    (group, input-partition) rank first — parallel, bounded by input
    partition size — then the final per-group rank over ≤ P·k
    survivors. Output adds ``rnk`` (1..k per group). The order key
    must be total within a group (include a tiebreaker)."""
    from pyspark.sql import Window as W

    local = scored.select("*", F.spark_partition_id().alias("__pid"))
    w1 = W.partitionBy(group_col, "__pid").orderBy(*order_cols)
    pruned = local.withColumn("__lr", F.row_number().over(w1)).filter(
        F.col("__lr") <= k
    )
    w2 = W.partitionBy(group_col).orderBy(*order_cols)
    return (
        pruned.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .drop("__pid", "__lr")
    )


def multi_knn_rrf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rrf_k: int = 60,
    final_k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Multi-query KNN with reciprocal-rank fusion (the engine core of
    the reference's multi_query_search, services/advanced_rag.py:
    199-252, minus the LLM query generation): every query scores the
    corpus in ONE broadcast cross join — not N sequential scans — then
    per-query exact top-k (topk_per_group, no per-query full sort) and
    the RRF merge 1/(rrf_k + rank).

    ``queries``: (qid, qv) — small, broadcast side."""
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(id_col),
        F.col("qid"),
        cosine(F.col(vec_col), F.col("qv"), scale).alias("sim"),
    )
    top = topk_per_group(scored, "qid", [F.desc("sim"), F.col(id_col)], k)
    return (
        top.groupBy(id_col)
        .agg(F.round(F.sum(1.0 / (rrf_k + F.col("rnk"))), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), id_col)
        .limit(final_k)
    )
