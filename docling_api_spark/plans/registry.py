"""The operator/query registry (driver correctness contract).

Each entry: a Spark DataFrame plan and, where SQL-expressible, the
equivalent ANSI SQL for the DuckDB oracle. Column names are aliased
identically on both sides (the driver hashes values after sorting
columns by name).

Modules register themselves via the ``@query`` decorator at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from docling_api_spark.plans import (  # noqa: F401
        extraction_q,
        relational_q,
    )

    from docling_api_spark.plans import (  # noqa: F401
        chunk_q,
        dedup_q,
        multimodal_q,
        search_q,
        similarity_q,
        textstats_q,
    )
    _LOADED = True
