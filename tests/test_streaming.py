"""Streaming tests: availableNow incremental extraction equals the
batch path; checkpoint prevents reprocessing; windowed metrics with
watermark agree with the batch aggregation of the same events."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_api_spark.operators.extract import extract_flat
from docling_api_spark.sources.catalog import load, wrap_documents_as_corpus
from docling_api_spark.streaming.pipeline import (
    stream_extract,
    stream_metrics_query,
    stream_windowed_metrics,
)

SF_DIR = "/root/testdata/sf0.001"


def _flat_content(df):
    rows = df.select("doc_id", "raw_offset", "local_order", "kind", "text").collect()
    return sorted(map(tuple, rows))


def test_stream_extract_matches_batch(spark, tmp_path):
    corpus = wrap_documents_as_corpus(load(spark, SF_DIR, "documents").limit(100))
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, corpus_path, out, ckpt)
    q.awaitTermination(120)

    got = _flat_content(spark.read.parquet(out))
    want = _flat_content(extract_flat(spark.read.parquet(corpus_path), salt_partitions=0))
    assert got == want


def test_stream_checkpoint_no_reprocess(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    corpus_path = str(tmp_path / "corpus")
    wrap_documents_as_corpus(docs.limit(50)).write.parquet(corpus_path)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_extract(spark, corpus_path, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # second run, no new files → nothing appended
    stream_extract(spark, corpus_path, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1

    # append a new corpus file → only its docs are processed
    more = wrap_documents_as_corpus(
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
    )
    more.write.mode("append").parquet(corpus_path)
    stream_extract(spark, corpus_path, out, ckpt).awaitTermination(120)
    n3 = spark.read.parquet(out).count()
    assert n3 > n1
    ids = {r.doc_id for r in spark.read.parquet(out).select("doc_id").distinct().collect()}
    assert len(ids) == 80


def test_windowed_metrics_stream_equals_batch(spark, tmp_path):
    # file stream sources need a directory, not a bare parquet file
    events_path = str(tmp_path / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(events_path)
    ckpt = str(tmp_path / "ckpt")
    q = stream_metrics_query(spark, events_path, ckpt)
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stream_metrics")
    want = stream_windowed_metrics(spark.read.parquet(events_path))
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w
    assert len(g) > 0


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization ≡ the batch lag+cumsum
    plan when the whole table arrives as one availableNow backlog."""
    from docling_api_spark.plans.registry import queries
    from docling_api_spark.streaming.pipeline import stream_sessionize

    events_path = str(tmp_path / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(events_path)
    ckpt = str(tmp_path / "ckpt")
    q = stream_sessionize(spark, events_path, ckpt)
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM stream_sessions").collect()))
    want = sorted(
        map(tuple, queries()["sessionize_events"](spark, SF_DIR).collect())
    )
    assert got == want
    assert len(got) > 0


def test_stateful_sessionize_across_arrow_chunks(spark, tmp_path):
    """Regression (ADVICE r2): a user whose events span multiple Arrow
    chunks must fold in ONE global (ts, event_id) order — per-chunk
    sorting over-counts sessions. Shuffle the input row order and force
    tiny Arrow batches so every user's group arrives in many chunks."""
    from docling_api_spark.plans.registry import queries
    from docling_api_spark.streaming.pipeline import stream_sessionize

    events_path = str(tmp_path / "events")
    # adversarial file order: interleave users and reverse time order
    spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy(
        F.desc("ts"), F.col("event_id")
    ).repartition(1).write.parquet(events_path)
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        q = stream_sessionize(spark, events_path, ckpt, query_name="chunked_sessions")
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    got = sorted(map(tuple, spark.sql("SELECT * FROM chunked_sessions").collect()))
    want = sorted(
        map(tuple, queries()["sessionize_events"](spark, SF_DIR).collect())
    )
    assert got == want
    assert len(got) > 0


def test_stream_ingest_end_to_end(spark, tmp_path):
    """Corpus stream → extract → chunk → embed, equal to the batch
    lineage over the same files."""
    from docling_api_spark.operators.chunk import chunk_extracted
    from docling_api_spark.operators.embed import embed_chunks
    from docling_api_spark.operators.extract import extract
    from docling_api_spark.streaming.pipeline import stream_ingest

    corpus_path = str(tmp_path / "corpus")
    wrap_documents_as_corpus(load(spark, SF_DIR, "documents").limit(40)).write.parquet(
        corpus_path
    )
    out = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    q = stream_ingest(spark, corpus_path, out, ckpt, max_tokens=32)
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    want = embed_chunks(
        chunk_extracted(
            extract(spark.read.parquet(corpus_path), salt_partitions=0), max_tokens=32
        ),
        text_col="context",
    )
    key = lambda r: (r["doc_id"], r["chunk_index"])  # noqa: E731
    g = sorted(got.collect(), key=key)
    w = sorted(want.collect(), key=key)
    assert len(g) == len(w) > 40  # multiple chunks per doc
    for a, b in zip(g, w):
        assert (a.doc_id, a.chunk_index, a.content, a.token_count) == (
            b.doc_id,
            b.chunk_index,
            b.content,
            b.token_count,
        )
        assert list(a.embedding) == list(b.embedding)


def test_streaming_dedup_incremental_resume(spark, tmp_path):
    """stream_exact_dedup drains backlog part 1, then a new file lands
    and a SECOND run on the same checkpoint folds it in incrementally —
    final state must equal the batch dedup over BOTH parts (MIN/COUNT
    commute across micro-batches), and the second run must not
    reprocess part 1 (state store carries it)."""
    from docling_api_spark.functions.hashing import md5_long
    from docling_api_spark.streaming.pipeline import stream_exact_dedup

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    d = str(tmp_path / "docs")
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(d)

    ckpt = str(tmp_path / "ckpt")
    q = stream_exact_dedup(spark, d, ckpt, query_name="dedup_inc_1")
    q.awaitTermination(120)

    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(d)
    q2 = stream_exact_dedup(spark, d, ckpt, query_name="dedup_inc_2")
    q2.awaitTermination(120)
    got = sorted(map(tuple, spark.table("dedup_inc_2").collect()))

    # batch twin over the full directory (same planted-dup derivation)
    full = spark.read.parquet(d)
    exact = full.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = full.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
    )
    corpus = full.select("doc_id", "text").unionByName(exact).unionByName(near)
    want = sorted(
        map(
            tuple,
            corpus.select(md5_long(F.col("text")).alias("content_hash"), "doc_id")
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
            .collect(),
        )
    )
    assert got == want
    # resume actually skipped part 1: the dup-corpus derivation scans
    # each file 3x (self-union), so the second run reads exactly
    # 3 x (appended rows) — a full reprocess would read 3 x (all rows)
    n_part2 = docs.filter(F.col("doc_id") >= 250).count()
    assert n_part2 > 0
    progress = q2.lastProgress
    assert progress is not None
    assert progress["numInputRows"] == 3 * n_part2, progress["numInputRows"]


def test_sessionize_microsecond_gap_boundary(spark, tmp_path):
    """Gaps compare in exact microseconds: a true gap of 1800.5 s is a
    NEW session (> 30 min) in the batch plan and the DuckDB oracle, but
    whole-second truncation could compute floor-diff == 1800 and merge
    it. Plant the boundary straddle and require two sessions."""
    from docling_api_spark.streaming.pipeline import stream_sessionize

    events_path = str(tmp_path / "events")
    spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00.600000"),
            (1, 11, "2024-01-01 00:30:01.100000"),  # gap = 1800.5 s
            (1, 12, "2024-01-01 00:40:01.100000"),  # gap = 600 s: same session
        ],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(events_path)
    ckpt = str(tmp_path / "ckpt")
    q = stream_sessionize(spark, events_path, ckpt, query_name="us_boundary")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM us_boundary").collect()
    assert [(r.user_id, r.n_sessions, r.n_events) for r in rows] == [(1, 2, 3)]


def test_sessionize_drops_null_ts_instead_of_aborting(spark, tmp_path):
    """A NULL event time ships to the state fold as NaN, and the
    unguarded int(t) aborted the whole stream. NULL-ts events have no
    gap semantics: they are dropped (quarantine class), every other
    event still folds."""
    from docling_api_spark.streaming.pipeline import stream_sessionize

    events_path = str(tmp_path / "events")
    spark.createDataFrame(
        [
            (1, 10, "2026-01-01 10:00:00"),
            (1, 11, None),  # the abort case
            (1, 12, "2026-01-01 11:00:00"),  # > 30 min gap: new session
            (2, 20, None),  # user with ONLY null-ts events
        ],
        "user_id long, event_id long, ts string",
    ).selectExpr(
        "user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts"
    ).write.parquet(events_path)
    q = stream_sessionize(
        spark, events_path, str(tmp_path / "ckpt"), query_name="null_ts_sessions"
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql("SELECT * FROM null_ts_sessions").collect()
    }
    assert got[1] == (2, 2)  # the two timed events, two sessions
    assert 2 not in got  # all-null user contributes no state row
