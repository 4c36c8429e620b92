"""global_rank (operators/rank.py): exact row_number equivalence +
the scale contract (no single-task sort of the ranked data)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from docling_api_spark.operators.rank import global_rank, prefix_sum


def _ref_rank(df, order_cols):
    return df.withColumn("rnk", F.row_number().over(W.orderBy(*order_cols)))


def test_global_rank_equals_row_number(spark):
    df = spark.range(0, 997).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 1000).alias("score"),  # many ties
    )
    order = [F.desc("score"), "id"]
    got = {r.id: r.rnk for r in global_rank(df, order, num_partitions=7).collect()}
    want = {r.id: r.rnk for r in _ref_rank(df, order).collect()}
    assert got == want


def test_global_rank_empty_and_tiny(spark):
    df = spark.range(0, 0).select(F.col("id"), F.col("id").alias("score"))
    assert global_rank(df, ["score", "id"], num_partitions=4).count() == 0
    one = spark.range(0, 1).select(F.col("id"), F.col("id").alias("score"))
    assert global_rank(one, ["score", "id"], num_partitions=8).collect()[0].rnk == 1


def test_global_rank_more_partitions_than_rows(spark):
    df = spark.range(0, 5).select(F.col("id"), (4 - F.col("id")).alias("score"))
    rows = global_rank(df, [F.desc("score"), "id"], num_partitions=32).collect()
    assert {r.id: r.rnk for r in rows} == {0: 1, 1: 2, 2: 3, 3: 4, 4: 5}


def test_global_rank_plan_has_no_corpus_window(spark):
    """The scale contract: ranking shuffles via rangepartitioning (a
    parallel distributed sort); the only Window in the plan runs over
    the per-partition offsets table (__pid), never the ranked rows."""
    df = spark.range(0, 100).select(F.col("id"), F.col("id").alias("score"))
    plan = (
        global_rank(df, [F.desc("score"), "id"], num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, line


def test_prefix_sum_matches_window_cumsum(spark):
    from docling_api_spark.operators.rank import prefix_sum

    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("v")
    )
    got = {
        r.id: r.prefix
        for r in prefix_sum(df, "v", ["id"], num_partitions=7).collect()
    }
    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, -1)
    want = {
        r.id: r.prefix
        for r in df.withColumn(
            "prefix", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_prefix_sum_empty_and_single(spark):
    from docling_api_spark.operators.rank import prefix_sum

    empty = spark.range(0, 0).select(F.col("id"), F.col("id").alias("v"))
    assert prefix_sum(empty, "v", ["id"], num_partitions=4).count() == 0
    one = spark.range(5, 6).select(F.col("id"), F.lit(9).alias("v"))
    assert prefix_sum(one, "v", ["id"], num_partitions=4).collect()[0].prefix == 0


def test_prefix_sum_null_values_count_as_zero(spark):
    """NULL values contribute 0 on BOTH halves of the operator: the
    offsets aggregate already skipped NULLs (F.sum semantics), and the
    Arrow cumsum used to abort on the NaN->int64 cast (a nullable int
    column ships as float64+NaN) — the two halves must agree."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5), (4, None), (5, 2)],
        "id long, v long",
    )
    rows = {
        r.id: r.prefix
        for r in prefix_sum(df, "v", ["id"], num_partitions=3).collect()
    }
    assert rows == {1: 0, 2: 10, 3: 10, 4: 15, 5: 15}
