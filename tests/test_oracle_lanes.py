"""Fast NON-SPARK oracle type-lane gate (VERDICT r2 item 8).

The driver's value hash distinguishes integer from float lanes, and
DuckDB silently widens where Spark does not (``list_sum`` → HUGEINT,
``AVG`` → DOUBLE, DECIMAL division) — the bug class that produced the
red CORRECTNESS row in rounds 1 AND 2. This gate needs no JVM: it
prepares every oracle's SQL in DuckDB at sf0.001 and compares the
declared result types against the golden per-query lane map generated
from the SPARK schemas (tests/fixtures/oracle_lanes.json).

Stale fixture? Regenerate with
``PYTHONPATH=/root/repo python tests/gen_oracle_lanes.py``;
test_golden_matches_spark_schema (Spark-marked, below) pins freshness.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "oracle_lanes.json")

with open(_FIXTURE) as _f:
    GOLDEN: dict[str, dict[str, str]] = json.load(_f)

_ORACLES = entrymod.oracle_sql()

_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
              "UINTEGER", "UBIGINT"}


def duck_lane(type_name: str) -> str:
    t = type_name.upper()
    if t in _INT_TYPES:
        return "i"
    if t == "HUGEINT" or t.startswith("DECIMAL") or t in ("DOUBLE", "FLOAT", "REAL"):
        # HUGEINT/DECIMAL fetch as float64 through the driver — the
        # exact widening this gate exists to catch
        return "f"
    if t == "BOOLEAN":
        return "b"
    if t == "VARCHAR":
        return "s"
    return "o"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_fixture_covers_every_oracle():
    assert set(GOLDEN) == set(_ORACLES), (
        "oracle_lanes.json is stale — regenerate with "
        "`PYTHONPATH=/root/repo python tests/gen_oracle_lanes.py`"
    )


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_lanes(duck, name):
    # relation API: concrete DuckDB types (BIGINT vs HUGEINT), where
    # the DB-API cursor description only reports generic NUMBER
    rel = duck.sql(_ORACLES[name])
    got = {c: duck_lane(str(t)) for c, t in zip(rel.columns, rel.types)}
    want = GOLDEN[name]
    assert set(got) == set(want), f"{name}: columns {sorted(got)} vs {sorted(want)}"
    diverged = {
        c: (got[c], want[c])
        for c in want
        if want[c] != "o" and got[c] != "o" and got[c] != want[c]
    }
    assert not diverged, (
        f"{name}: DuckDB lane != Spark lane for {diverged} — cast the "
        f"oracle expression (e.g. CAST(... AS BIGINT) around list_sum/SUM)"
    )


def test_intentionally_uncast_oracle_fails():
    """The gate itself must catch the shipped-twice bug class: an
    un-cast list_sum (HUGEINT → float lane) over an integer column."""
    con = duckdb.connect()
    rel = con.sql("SELECT list_sum([1, 2, 3]) AS total")
    assert duck_lane(str(rel.types[0])) == "f"  # would hash-mismatch Spark BIGINT


def test_golden_matches_spark_schema(spark):
    """Freshness pin: the committed fixture equals what the current
    Spark plans declare (plan-only — nothing executes)."""
    from tests.gen_oracle_lanes import generate

    assert generate(spark) == GOLDEN, (
        "oracle_lanes.json is stale — regenerate with "
        "`PYTHONPATH=/root/repo python tests/gen_oracle_lanes.py`"
    )
