"""Post-extraction invariant audits for the production job.

The north rule's span-sequence invariant — (kind, text, media_ref,
order) dense and well-formed per document — is enforced in the driver
gate via the ``span_order_audit`` / ``media_ref_integrity`` registry
queries (plans/extraction_q.py). This module promotes the same
invariants into ``jobs/run_extract.py`` (VERDICT r4 ask #7): after the
last bucket batch commits, the job re-reads the MATERIALIZED table and
fails loudly on any violation, so a corrupted resume (partial bucket
write, manifest/data divergence) can never publish silently.

The audited rules are exactly the KERNEL guarantees, no stricter —
an audit stricter than the producer aborts healthy jobs:

* span ``order`` is dense 0..n-1 per doc, never NULL;
* ``media_ref`` is never NULL (engine convention is empty string);
* a non-empty ``media_ref`` appears only on media-kind spans;
* a row's ``spans`` column is neither NULL nor empty (a doc with no
  surviving spans is simply absent from the table).

Deliberately NOT audited (legitimate in crawled corpora): media spans
with an EMPTY ref — kernels emit ``media_ref=""`` for ref-less source
media (``<img>`` with no src, payload-less PDF figures, ref-less DOCX
drawings) — and refs shared across documents, since the production
``media_ref`` is the raw source src (two pages embedding the same
logo URL is normal) and the media sidecar keys rows per
``(doc_id, media_ref)``.

Scale shape: ONE narrow explode of the table into a persisted
(doc_id, kind, media_ref, ord) projection; both audits aggregate that
cached frame (partial+final hash aggs), so the materialized table is
scanned once per job however many rules run. Text never rides a
shuffle; violation frames are empty in the healthy case, so the
bounded limit(k) sample feeding the error message does no meaningful
driver work (and only runs when the job is about to abort — see the
guard-exempt pragma).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NULL_REF = "<null-ref>"


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
    # (fails min==0), NULL kind to a sentinel, and NULL media_ref to a
    # sentinel DISTINCT from "" (empty is legitimate; NULL is corrupt).
    # explode_outer, not explode: a row whose spans column is NULL or
    # an empty array must surface as a violation (ord=-1 fails the
    # density check) — plain explode drops the row entirely and the
    # corrupt doc publishes unaudited.
    return extracted.select(
        "doc_id", F.explode_outer("spans").alias("s")
    ).select(
        "doc_id",
        F.coalesce(F.col("s.kind"), F.lit("<null-kind>")).alias("kind"),
        F.coalesce(F.col("s.media_ref"), F.lit(_NULL_REF)).alias("media_ref"),
        F.coalesce(F.col("s.order"), F.lit(-1)).alias("ord"),
    )


def span_order_violations(extracted: DataFrame) -> DataFrame:
    """Docs whose span ``order`` is not dense 0..n-1 (gap, duplicate,
    offset start, NULL order, or a NULL/empty spans column). Returns
    (doc_id, n_spans, min_ord, max_ord, n_distinct) — empty when the
    invariant holds."""
    return _order_violations(_spans_flat(extracted))


def _order_violations(s: DataFrame) -> DataFrame:
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
    the materialized table alone, auditing only what the kernels
    guarantee (module docstring): a non-empty ``media_ref`` belongs to
    a media-kind span, and ``media_ref`` is never NULL. Returns
    (doc_id, media_ref, kind, violation) — empty when healthy."""
    return _media_violations(_spans_flat(extracted))


def _media_violations(s: DataFrame) -> DataFrame:
    ref_on_non_media = s.filter(
        (F.col("media_ref") != "")
        & (F.col("media_ref") != _NULL_REF)
        & (F.col("kind") != "image")
    ).select("doc_id", "media_ref", "kind", F.lit("ref_on_non_media_span").alias("violation"))
    # NULL media_ref on ANY span is a corrupt write: the engine writes
    # empty string, never NULL (the explode_outer NULL-spans row is
    # order-audited, not double-counted here)
    null_ref = s.filter(
        (F.col("media_ref") == _NULL_REF) & (F.col("kind") != "<null-kind>")
    ).select("doc_id", "media_ref", "kind", F.lit("null_media_ref").alias("violation"))
    return ref_on_non_media.unionByName(null_ref)


def assert_extraction_invariants(extracted: DataFrame, sample: int = 5) -> dict:
    """Run both audits over ONE persisted narrow projection of the
    table; raise :class:`ExtractionAuditError` naming up to ``sample``
    offending rows if either finds a violation. Returns the violation
    counts (all zero) for the job's metrics line."""
    s = _spans_flat(extracted).persist()
    try:
        order_bad = _order_violations(s)
        media_bad = _media_violations(s)
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
    finally:
        s.unpersist()
    return {"span_order_violations": 0, "media_ref_violations": 0}
