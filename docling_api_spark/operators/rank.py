"""Scale-safe exact global ranking.

``row_number().over(Window.orderBy(...))`` with no partition spec
forces every row through ONE task (Spark plans an Exchange
SinglePartition + a single sort) — the classic scale-killer in ranking
pipelines (the reference's hybrid search / RRF fusion ranks the whole
corpus, advanced_rag.py:221-234). ``global_rank`` computes the exact
same 1..N row numbers with ONE parallel shuffle:

1. ``repartitionByRange`` on the order key + ``sortWithinPartitions``
   — together exactly the distributed sort Spark plans for a global
   ``orderBy``, parallel by construction;
2. a per-row ``monotonically_increasing_id`` evaluated above the sort
   (nondeterministic expressions are never pushed through a Sort, so
   ids are assigned in sorted order, consecutively within each
   partition);
3. per-partition ``(count, min_id)`` — ONE ROW per partition; the only
   single-task step is a cumulative sum over ≤#partitions rows —
   broadcast back: ``rank = offset + (id - min_id) + 1``.

Rank exactness does not depend on where the sampled range boundaries
land: range partition *i* holds strictly-earlier keys than *i+1*, so
offset + local position is the exact global row number for any split.
The order key must be total (include a tiebreaker column) or ranks at
partition boundaries are nondeterministic — same contract as
``row_number`` itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + exact global ``row_number`` 1..N over ``order_cols``
    (list of Columns/names, e.g. ``[F.desc("score"), "doc_id"]``)
    without a single-task global sort."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
        )
        # persist: BOTH the offsets aggregate and the joined stream side
        # read this subtree, and it is nondeterministic (range-boundary
        # sampling + per-partition id counters). Without the cache,
        # correctness would rest on Spark's exchange reuse canonicalizing
        # the two instances to one — true under default configs, but not
        # a contract worth betting silent rank corruption on.
        .persist()
    )
    # one row per partition; the cumsum window is bounded by the
    # cluster's partition count, never by data volume
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"), F.min("__mid").alias("__min"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__min", "__off")
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_col,
            (F.col("__off") + (F.col("__mid") - F.col("__min")) + 1).cast("int"),
        )
        .drop("__pid", "__mid", "__min", "__off")
    )


def prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list,
    out_col: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact EXCLUSIVE global prefix sum of ``value_col`` over the
    total order ``order_cols`` — same single-parallel-shuffle shape as
    ``global_rank``: range partition + per-partition running sum
    (window partitioned by ``spark_partition_id`` — parallel), then a
    broadcast cumulative per-partition total (≤ #partitions rows).

    The classic driver of training-sequence packing: each document's
    token span in the concatenated corpus stream starts at its prefix
    sum. The order key must be total (include a tiebreaker).

    The per-partition running sum is an Arrow ``mapInPandas`` cumsum —
    a NARROW map over the already-range-sorted partitions (a
    ``Window.partitionBy(spark_partition_id)`` would instead force a
    second full-data hash exchange and cap the stage at one task per
    range partition)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select("*", F.spark_partition_id().alias("__pid"))
        .persist()  # offsets + stream side both read this (cf. global_rank)
    )
    out_schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("__lsum", T.LongType())]
    )

    def local_cumsum(batches):
        run = 0  # carries across Arrow batches WITHIN one partition
        for pdf in batches:
            # NULL contributes 0, matching the offsets half exactly:
            # F.sum() SKIPS NULLs, and an unguarded NaN→int64 cast
            # would abort the job (Arrow ships a nullable int column
            # as float64+NaN), desynchronizing the two halves
            vals = pdf[value_col].fillna(0).to_numpy(dtype="int64")
            pdf = pdf.assign(
                __lsum=run + np.concatenate(([0], np.cumsum(vals[:-1])))
                if len(vals)
                else np.array([], dtype="int64")
            )
            run += int(vals.sum())
            yield pdf

    local = ranged.mapInPandas(local_cumsum, schema=out_schema)
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("__psum"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__psum").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lsum"))
        .drop("__pid", "__lsum", "__off")
    )
