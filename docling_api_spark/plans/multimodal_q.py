"""Multimodal queries: binary payload → decode roundtrip.

The synthetic media payloads embed their dimensions via the same
md5-prefix-32 family the oracle can compute, so the full loop —
binary column synthesis (mapInPandas) → header decode (mapInPandas)
— is value-exactly checkable even though the pixels are fake.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_api_spark.operators.multimodal import media_features, synthesize_media_table
from docling_api_spark.plans import _sql as S
from docling_api_spark.plans.registry import query
from docling_api_spark.sources.catalog import load


@query(
    "media_decode_dims",
    oracle=f"""
        SELECT doc_id || '/m0' AS media_ref,
               64 + ({S.md5long("doc_id || '/m0'")} % 64) AS width,
               48 + ({S.md5long("'h' || doc_id || '/m0'")} % 48) AS height,
               TRUE AS ok
        FROM documents
    """,
)
def media_decode_dims(spark, sf_dir):
    """Binary media columns round-trip: synthesize payload bytes per
    doc, decode headers back in a second Arrow-batched stage; decoded
    dims must equal the md5-derived generation rule."""
    docs = load(spark, sf_dir, "documents")
    media = synthesize_media_table(docs, per_doc=1)
    return media_features(media, dim=8).select("media_ref", "width", "height", "ok")


@query(
    "media_resize_plan", prio=20,
    # resize PLANNING stays JVM-side metadata arithmetic (prunes the
    # expensive Python decode stage at 100 TB); target dims derive from
    # the same md5 family the oracle computes. scale is reported
    # rounded; targets use the unrounded scale on both engines.
    oracle=f"""
        WITH m AS (
            SELECT doc_id || '/m0' AS media_ref,
                   64 + ({S.md5long("doc_id || '/m0'")} % 64) AS width,
                   48 + ({S.md5long("'h' || doc_id || '/m0'")} % 48) AS height
            FROM documents)
        SELECT media_ref, width, height,
               ROUND(CASE WHEN GREATEST(width, height) > 96
                          THEN 96.0 / GREATEST(width, height) ELSE 1.0 END, 6) AS scale,
               CAST(CEIL(width * (CASE WHEN GREATEST(width, height) > 96
                          THEN 96.0 / GREATEST(width, height) ELSE 1.0 END)) AS INT) AS target_w,
               CAST(CEIL(height * (CASE WHEN GREATEST(width, height) > 96
                          THEN 96.0 / GREATEST(width, height) ELSE 1.0 END)) AS INT) AS target_h
        FROM m
    """,
)
def media_resize_plan(spark, sf_dir):
    from docling_api_spark.operators.multimodal import resize_plan

    docs = load(spark, sf_dir, "documents")
    media = synthesize_media_table(docs, per_doc=1)
    return resize_plan(media, max_side=96)


@query(
    "video_frame_plan", prio=20,
    # frame-sampling PLAN (JVM-side metadata arithmetic; the decode
    # stage it prunes is the stubbed codec): uniform every 1 s capped
    # at 32 frames, per-frame target time + source frame number.
    # Synthetic per-doc video metadata is a pure function of doc_id.
    oracle="""
        WITH m AS (SELECT doc_id || '/v0' AS media_ref,
                          CAST(5 + doc_id % 50 AS DOUBLE) AS dur,
                          CAST(24 + (doc_id % 2) * 6 AS DOUBLE) AS fps
                   FROM documents),
        n AS (SELECT media_ref, dur, fps,
                     LEAST(CAST(FLOOR(dur / 1.0) AS INT) + 1, 32) AS nf
              FROM m),
        e AS (SELECT media_ref, dur, fps, nf,
                     unnest(range(0, nf)) AS fi
              FROM n)
        SELECT media_ref,
               CAST(fi AS INT) AS frame_index,
               ROUND(fi * (dur / nf), 3) AS frame_time_s,
               CAST(FLOOR(fi * (dur / nf) * fps) AS INT) AS source_frame
        FROM e
    """,
)
def video_frame_plan(spark, sf_dir):
    from docling_api_spark.operators.multimodal import frame_sample_plan

    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("/v0")).alias("media_ref"),
        (5 + F.col("doc_id") % 50).cast("double").alias("duration_s"),
        (24 + (F.col("doc_id") % 2) * 6).cast("double").alias("fps"),
    )
    return frame_sample_plan(media, every_s=1.0, max_frames=32)
