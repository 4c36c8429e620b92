"""Skew-defusing join strategies (SURVEY.md §2.3/§4: the join class
the 100 TB tier adds beyond the reference's all-equi-join surface).

Two tools, complementary to AQE's runtime skew splitting:

* **Salted join** (`salted_join`) — for a known-skewed key column:
  replicate the small side S ways (explode a salt array), salt the big
  side with ``pmod(xxhash64(...), S)``, join on (key, salt). A hot key
  that would pin one reducer spreads across S tasks. Result is
  row-identical to the plain join (oracle-checked in plans).
* **Bucketed co-located join** (`write_bucketed` + a no-Exchange
  assertion in tests) — pre-shuffle both tables into the same bucket
  layout at write time; joins on the bucket key then run with NO
  shuffle at read time (SortMergeJoin without Exchange). At 100 TB
  this converts every recurring fact⋈fact join from a 2×full-shuffle
  into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``: small side replicated
    ``salt_buckets``×, big side salted deterministically; the output
    drops the salt and equals the unsalted join row-for-row.

    Only ``inner``/``left`` joins are supported: for right/full joins
    the replicated small side would emit each unmatched row
    ``salt_buckets`` times, silently breaking row-equality.

    Limitation: the salt must derive from NON-key columns to spread a
    hot key. The keys-only fallback below keeps the plan valid but the
    salt is then constant per key — no skew mitigation for that input
    shape (a keys-only hot-key table has no row identity to spread on;
    pre-attach a row discriminator if that case matters).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins only, got how={how!r}")
    non_key = [c for c in big.columns if c != key]
    # a keys-only big side still needs a deterministic salt source
    salt_src = F.xxhash64(*non_key) if non_key else F.xxhash64(F.col(key))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    salted_big = big.withColumn("__salt", F.pmod(salt_src, F.lit(salt_buckets)).cast("int"))
    return salted_big.join(salted_small, on=[key, "__salt"], how=how).drop("__salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, num_buckets: int = 8
) -> None:
    """Persist a table bucketed+sorted by ``key`` so future joins on
    the key are shuffle-free (co-located)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )
