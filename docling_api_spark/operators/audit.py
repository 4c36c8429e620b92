"""Post-extraction invariant audits for the production job.

The north rule's span-sequence invariant — (kind, text, media_ref,
order) dense and well-formed per document — is enforced in the driver
gate via the ``span_order_audit`` / ``media_ref_integrity`` registry
queries (plans/extraction_q.py). This module promotes the same
invariants into ``jobs/run_extract.py`` (VERDICT r4 ask #7): after the
last bucket batch commits, the job re-reads the MATERIALIZED table and
fails loudly on any violation, so a corrupted resume (partial bucket
write, manifest/data divergence) can never publish silently.

Scale shape: each audit is one narrow explode + a doc-keyed hash
aggregate (partial+final), plus — for the media audit — one anti-join
on the media_ref key. Text never rides a shuffle; violation frames are
empty in the healthy case, so the bounded limit(k) sample feeding the
error message does no meaningful driver work (and only runs when the
job is about to abort — see the guard-exempt pragma).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExtractionAuditError(RuntimeError):
    """An extraction-output invariant failed; the job must not publish."""


def _spans_flat(extracted: DataFrame) -> DataFrame:
    # NULL-harden every audited field: the engine's convention is
    # empty-string media_ref and dense non-null order, but this module
    # audits the MATERIALIZED table, where a corrupt/partial write can
    # surface NULLs the schema technically allows. Without coalesce a
    # NULL makes the violation predicates evaluate to NULL and the
    # filter silently drops the row — e.g. a doc whose every span has
    # NULL `order` would PASS the density check. Map NULL order to -1
    # (fails min==0) and NULL kind/media_ref to sentinel/"".
    return extracted.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.coalesce(F.col("s.kind"), F.lit("<null-kind>")).alias("kind"),
        F.coalesce(F.col("s.media_ref"), F.lit("")).alias("media_ref"),
        F.coalesce(F.col("s.order"), F.lit(-1)).alias("ord"),
    )


def span_order_violations(extracted: DataFrame) -> DataFrame:
    """Docs whose span ``order`` is not dense 0..n-1 (gap, duplicate,
    or offset start). Returns (doc_id, n_spans, min_ord, max_ord,
    n_distinct) — empty when the invariant holds."""
    s = _spans_flat(extracted)
    agg = s.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.min("ord").alias("min_ord"),
        F.max("ord").alias("max_ord"),
        F.count_distinct("ord").alias("n_distinct"),
    )
    return agg.filter(
        ~(
            (F.col("min_ord") == 0)
            & (F.col("max_ord") == F.col("n_spans") - 1)
            & (F.col("n_distinct") == F.col("n_spans"))
        )
    )


def media_ref_violations(extracted: DataFrame) -> DataFrame:
    """Referential integrity of the interleaved stream, checked from
    the materialized table alone: every non-empty ``media_ref`` must
    belong to a media-kind span (the sidecar views derive their rows
    from exactly those spans, so a ref on a text-kind span — or a
    media span missing its ref — dangles by construction). Returns
    (doc_id, media_ref, kind, violation) — empty when healthy."""
    s = _spans_flat(extracted)
    ref_on_non_media = s.filter(
        (F.col("media_ref") != "") & (F.col("kind") != "image")
    ).select("doc_id", "media_ref", "kind", F.lit("ref_on_non_media_span").alias("violation"))
    media_without_ref = s.filter(
        (F.col("kind") == "image") & (F.col("media_ref") == "")
    ).select("doc_id", "media_ref", "kind", F.lit("media_span_missing_ref").alias("violation"))
    # a ref reused across documents breaks sidecar-row uniqueness
    dup_refs = (
        s.filter(F.col("media_ref") != "")
        .groupBy("media_ref")
        .agg(F.count_distinct("doc_id").alias("nd"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("nd") > 1)
        .select(
            "doc_id", "media_ref", F.lit("image").alias("kind"),
            F.lit("ref_shared_across_docs").alias("violation"),
        )
    )
    return ref_on_non_media.unionByName(media_without_ref).unionByName(dup_refs)


def assert_extraction_invariants(extracted: DataFrame, sample: int = 5) -> dict:
    """Run both audits; raise :class:`ExtractionAuditError` naming up
    to ``sample`` offending rows if either finds a violation. Returns
    the violation counts (all zero) for the job's metrics line."""
    order_bad = span_order_violations(extracted)
    media_bad = media_ref_violations(extracted)
    n_order = order_bad.count()
    n_media = media_bad.count()
    if n_order or n_media:
        examples = []
        if n_order:
            examples += [f"span_order {r.asDict()}" for r in order_bad.limit(sample).collect()]  # guard-exempt: bounded-error-sample
        if n_media:
            examples += [f"media_ref {r.asDict()}" for r in media_bad.limit(sample).collect()]  # guard-exempt: bounded-error-sample
        raise ExtractionAuditError(
            f"extraction output violates invariants: {n_order} span-order, "
            f"{n_media} media-ref; examples: " + "; ".join(examples)
        )
    return {"span_order_violations": 0, "media_ref_violations": 0}
