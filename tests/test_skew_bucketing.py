"""Skew/bucketing scale mechanics: salted join equivalence and
shuffle-free bucketed joins (no Exchange in the physical plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_api_spark.operators.skew import salted_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, o, "l_orderkey", salt_buckets=4)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # one key carries 90% of rows; salts must split it across buckets
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    out = salted_join(big, small, "k", salt_buckets=4)
    assert out.count() == big.join(small, "k").count()
    # distinct salt values actually used for the hot key
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64("payload"), F.lit(4)).cast("int")
    )
    n_salts = salted_big.filter(F.col("k") == 7).select("__salt").distinct().count()
    assert n_salts == 4


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge (broadcast would sidestep bucketing on these
        # tiny tables; at 100 TB both sides are fact-sized)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(li, "li_bucketed", "l_orderkey", num_buckets=4)
        write_bucketed(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_bucketed", "l_orderkey", 4
        )
        a = spark.table("li_bucketed")
        b = spark.table("o_bucketed")
        joined = a.join(b, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # and it computes the right thing
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_salted_join_rejects_right_and_full(spark):
    """Right/full joins would replicate unmatched small-side rows
    salt_buckets times — the operator must refuse them."""
    import pytest

    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", salt_buckets=4, how=how)


def test_salted_join_keys_only_big_side(spark):
    """A big side with no non-key columns still salts (on the key)."""
    big = spark.createDataFrame([(i % 3,) for i in range(30)], "k int")
    small = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k int, w string")
    got = salted_join(big, small, "k", salt_buckets=4).orderBy("k", "w")
    want = big.join(small, "k").orderBy("k", "w")
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]
