"""Invariant tests for operators/layout.py: the Spark Morton key
matches a bit-level Python reference, and agrees with the DuckDB twin
expression on the same inputs."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from docling_api_spark.operators.layout import zorder_key, zorder_key_sql


def _ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_and_duckdb(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
             (255, 256), (40000, 1), (1, 40000)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _ref(a, b), (a, b)
    con = duckdb.connect()
    sql_expr = zorder_key_sql("a", "b")
    for a, b in pairs:
        (dz,) = con.execute(f"SELECT {sql_expr} FROM (SELECT {a} AS a, {b} AS b)").fetchone()
        assert dz == _ref(a, b), (a, b)


def test_zorder_locality(spark):
    """Morton order interleaves both dimensions: the 64-bucket split of
    a 256x256 grid must bound EACH dimension's per-bucket span at 64
    (= sqrt-ish tiles), which a single-column sort cannot do for the
    secondary column."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("a"), (F.col("id") / 256).cast("long").alias("b")
    )
    z = zorder_key(F.col("a"), F.col("b"), bits=8)
    stats = (
        grid.select(F.shiftright(z, 10).alias("bucket"), "a", "b")
        .groupBy("bucket")
        .agg(
            (F.max("a") - F.min("a")).alias("span_a"),
            (F.max("b") - F.min("b")).alias("span_b"),
        )
        .collect()
    )
    assert len(stats) == 64
    for r in stats:
        assert r["span_a"] <= 63 and r["span_b"] <= 63, dict(r.asDict())
