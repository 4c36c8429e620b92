"""Text-quality column expressions shared by the textstats plans and
the curation pipeline. Pure Catalyst expressions (whole-stage
codegen); the DuckDB twins live in plans/textstats_q.py."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal English stopword set (reference rag lexical scoring uses
# lowercase whitespace tokens; this list is the engine's own). Shared
# with plans/textstats_q.py — its oracle SQL inlines this exact list,
# so changing it changes the gated semantics.
STOP_EN = ["the", "a", "of", "and", "to", "in"]


def stopword_count(tok: Column) -> Column:
    stop_lits = F.array(*[F.lit(s) for s in STOP_EN])
    return F.size(F.filter(tok, lambda x: F.array_contains(stop_lits, x)))


def quality_score(tok: Column) -> Column:
    """Length + stopword-density composite in [0,1], rounded 4:
    0.5·min(n_tokens/100, 1) + 0.5·stop_ratio. NULL for an empty token
    array — the CASE keeps the division un-evaluated for zero-token
    rows, which under ANSI mode (Spark 4 default) would otherwise be a
    hard DIVIDE_BY_ZERO error, not a NULL."""
    n = F.size(tok).cast("double")
    score = F.round(
        0.5 * F.least(F.size(tok) / 100.0, F.lit(1.0)) + 0.5 * (stopword_count(tok) / n),
        4,
    )
    return F.when(F.size(tok) > 0, score)
