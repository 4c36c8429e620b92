"""Regenerate tests/fixtures/oracle_lanes.json — the golden type-lane
map (query → column → lane) derived from each registered query's SPARK
result schema. Run after adding/changing a query or oracle:

    PYTHONPATH=/root/repo python tests/gen_oracle_lanes.py

The fixture powers tests/test_oracle_lanes.py's DuckDB-only fast gate
(no JVM): the driver's value hash distinguishes integer from float
lanes, and DuckDB silently widens (HUGEINT, DECIMAL) where Spark does
not — the bug class that shipped in rounds 1 AND 2.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T


def spark_lane(dt: T.DataType) -> str:
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "f"
    if isinstance(dt, T.StringType):
        return "s"
    return "o"  # structs/arrays/binary/timestamps: not lane-checked


def generate(spark) -> dict[str, dict[str, str]]:
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    oracles = E.oracle_sql()
    out: dict[str, dict[str, str]] = {}
    for name, fn in E.queries().items():
        if name not in oracles:
            continue  # rows-only queries have no oracle to lane-check
        schema = fn(spark, sf).schema  # plan only — nothing executes
        out[name] = {f.name: spark_lane(f.dataType) for f in schema.fields}
    return out


def main() -> None:
    from docling_api_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    lanes = generate(spark)
    path = os.path.join(os.path.dirname(__file__), "fixtures", "oracle_lanes.json")
    with open(path, "w") as f:
        json.dump(lanes, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(lanes)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
