"""Streaming pipelines (SURVEY.md §2.9).

The reference's streaming is *transport* (byte-chunk generators +
SSE envelopes, services/docling_streaming.py:12-55) and its dataflow
incrementality is queue-based background work with an idempotent
pending-work predicate (ARQ jobs, core/jobs.py:22-24,106-130). The
faithful Spark mapping is **incremental batch**: Structured Streaming
over the corpus directory with ``Trigger.AvailableNow`` — each
invocation processes exactly the files not yet recorded in the
streaming checkpoint, then stops. That is the reference's
"process pending then idle" loop, with Spark's checkpoint replacing
the ``has_embedding == False`` scan.

Also provided: an event-time windowed metrics stream with a watermark
(the stateful-operator surface a live deployment would add in front
of the extraction sink — late data folded in up to the watermark).

Everything runs through the same ``extract_flat`` kernels as batch;
``mapInPandas`` is streaming-compatible, so the batch and streaming
paths share one code path (tested equal in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from docling_api_spark.operators.extract import extract_flat
from docling_api_spark.schema import CORPUS


def read_corpus_stream(spark: SparkSession, corpus_path: str) -> DataFrame:
    """File-source stream over a corpus parquet directory. Streams
    must declare their schema (no inference race on a live dir)."""
    return (
        spark.readStream.schema(CORPUS)
        .option("maxFilesPerTrigger", 64)
        .parquet(corpus_path)
    )


def stream_extract(
    spark: SparkSession,
    corpus_path: str,
    out_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Incremental extraction: new corpus files → flat spans parquet.

    ``availableNow`` = process the current backlog, commit the
    streaming checkpoint, stop — rerunning after a kill (or on new
    files) resumes from the checkpoint without reprocessing (the
    engine-level twin of checkpoint.extract_with_checkpoint; this one
    leans on Spark's own WAL instead of our manifest).

    Flat spans (not reassembled docs) are the streaming sink shape:
    reassembly is a blocking per-doc aggregation, which in a live
    stream belongs to the reader (or a downstream batch compaction) —
    append mode stays stateless and therefore exactly-once.
    """
    flat = extract_flat(read_corpus_stream(spark, corpus_path), salt_partitions=0)
    return (
        flat.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts with late-data watermark (the
    reference's history stats A1, restated over a stream): per
    (window, event_type) count + value sum. Works on both a streaming
    and a batch events DF (same plan, different sink semantics)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ for event time
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def stream_metrics_query(
    spark: SparkSession,
    events_path: str,
    checkpoint_path: str,
    query_name: str = "stream_metrics",
) -> StreamingQuery:
    """Streaming twin of the windowed metrics over a parquet events
    dir; COMPLETE-mode in-memory sink for inspection/tests (every
    batch re-emits all windows, so the final table is the full state
    regardless of how availableNow slices the backlog). Note complete
    mode never evicts window state — the watermark only bounds
    lateness, not memory — so a long-lived production stream would use
    update/append mode with a real sink instead of this test helper."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    metrics = stream_windowed_metrics(stream)
    return (
        metrics.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    checkpoint_path: str,
    gap_seconds: int = 1800,
    query_name: str = "stream_sessions",
) -> StreamingQuery:
    """Custom stateful streaming operator (applyInPandasWithState):
    gap-based per-user sessionization. State per user = (last event
    epoch, session count, event count); a batch's events fold in in
    (ts, event_id) order, opening a new session when the gap from the
    previous event exceeds ``gap_seconds``.

    This is the streaming twin of the batch ``sessionize_events`` plan
    (lag + conditional cumsum) — with all data in one availableNow
    batch the two agree exactly (tested). Gaps compare in exact
    MICROSECONDS (unix_micros), the same integer precision the batch
    plan and the DuckDB oracle use — truncating to whole seconds would
    silently merge sessions whose true gap is in (gap, gap+1).
    Update-mode memory sink ``stream_sessions`` for inspection; each
    batch appends that batch's updated users, so readers must reduce
    to final state per user (both outputs are monotone — take max),
    which the registered query does.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    # NULL event times have no gap semantics: the fold's int(t) would
    # abort the stream on the NaN a NULL ships as. Dropped here (the
    # quarantine class — a production flow filters them upstream); the
    # batch twin, which orders NULLs first, counts each as a one-event
    # session instead — gate corpora carry neither case.
    events = stream.select(
        "user_id",
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsec"),
    ).filter(F.col("tsec").isNotNull())
    gap_micros = gap_seconds * 1_000_000

    out_type = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_type = StructType(
        [
            StructField("last_ts", LongType()),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
        ]
    )

    def fold(key, pdf_iter, state: GroupState):
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        # one global (ts, event_id) sort per user-batch: a user whose
        # events span multiple Arrow chunks must not fold chunk-local
        # orders, or session gaps get over-counted
        frames = [p for p in pdf_iter if len(p)]
        batch = (
            pd.concat(frames, ignore_index=True).sort_values(["tsec", "event_id"])
            if frames
            else pd.DataFrame({"tsec": []})
        )
        for t in batch["tsec"]:
            t = int(t)
            if last_ts is None or t - last_ts > gap_micros:
                n_sessions += 1
            # max, not assignment: a later micro-batch can deliver an
            # event OLDER than the state's last_ts (late file); folding
            # it is the documented cross-batch inaccuracy, but rewinding
            # last_ts would also fabricate a session for the next
            # in-order event — keep the watermark of time seen instead
            last_ts = t if last_ts is None else max(last_ts, t)
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    sessions = events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest(
    spark: SparkSession,
    corpus_path: str,
    chunks_path: str,
    checkpoint_path: str,
    max_tokens: int = 512,
) -> StreamingQuery:
    """Incremental ingest (the reference's background embed worker,
    core/jobs.py:17-44, restated as a stream): new corpus files →
    extract → chunk → embed → chunks-with-embeddings parquet.

    The per-doc reassembly is an aggregation, which append-mode
    streaming only allows under a watermark — and doc reassembly has
    no event time. The idiomatic mapping is ``foreachBatch``: each
    micro-batch (a set of whole corpus files — docs never split across
    files) runs the standard *batch* lineage and writes its output.
    foreachBatch re-runs a batch whose offsets never committed, so the
    sink write must be IDEMPOTENT per batch_id to be exactly-once —
    each batch overwrites its own ``batch=<id>`` partition directory
    (the dynamic-partition-overwrite discipline checkpoint.py uses),
    so a replay after a crash-between-write-and-commit replaces the
    partial output instead of appending a duplicate. With
    ``availableNow`` this is the reference's "drain the queue" worker
    loop.
    """
    from docling_api_spark.operators.chunk import chunk_extracted
    from docling_api_spark.operators.embed import embed_chunks
    from docling_api_spark.operators.extract import extract

    corpus = read_corpus_stream(spark, corpus_path)

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted = extract(batch_df, salt_partitions=0)
        chunks = chunk_extracted(extracted, max_tokens=max_tokens)
        embedded = embed_chunks(chunks, text_col="context")
        embedded.write.mode("overwrite").parquet(f"{chunks_path}/batch={batch_id}")

    return (
        corpus.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_exact_dedup(
    spark: SparkSession,
    docs_path: str,
    checkpoint_path: str,
    query_name: str = "stream_dedup",
) -> StreamingQuery:
    """Streaming exact dedup: the stateful-aggregation twin of the
    batch ``dedup_exact`` pass (hash-groupBy, min-id survivor). State
    per content hash = (min doc_id, copy count) — Spark's streaming
    HashAggregate state store, updated incrementally per micro-batch,
    so the survivor decision is deterministic (MIN commutes across
    batches) unlike a ``dropDuplicates`` keep-first race.

    Complete-mode memory sink + ``availableNow`` = drain the backlog,
    commit, stop. At scale the state is bounded the same way the batch
    cascade bounds its hash table — by the 32-bit key domain (narrow
    state rows: hash → (long, long)); a production deployment with
    event-time data would add a watermark to age out settled hashes.
    """
    from docling_api_spark.functions.hashing import md5_long

    schema = spark.read.parquet(docs_path).schema
    d = spark.readStream.schema(schema).parquet(docs_path).select("doc_id", "text")
    # planted-duplicate derivation (dup_corpus's streaming twin): a
    # self-union of the stream is two scans of the same source, each
    # with its own file-tracking state — supported and exactly-once
    exact = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
    )
    corpus = d.unionByName(exact).unionByName(near)
    agg = corpus.select(md5_long(F.col("text")).alias("content_hash"), "doc_id").groupBy(
        "content_hash"
    ).agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_near_dup(
    spark: SparkSession,
    docs_path: str,
    checkpoint_path: str,
    out_path: str,
    threshold: float = 0.8,
) -> StreamingQuery:
    """Streaming ingest dedup: each micro-batch of NEW docs probes the
    STATIC existing corpus's banded MinHash keys via
    ``operators.dedup.incremental_near_dup`` (foreachBatch — the
    batch-vs-corpus join is not a stream-stream join, so the static
    side needs no watermark bookkeeping).

    Result is batch-partition-invariant by construction: a new doc's
    verified matches depend only on that doc and the static corpus,
    so however availableNow slices the backlog into micro-batches, the
    union of per-batch outputs equals the single-batch computation —
    exactly the equality the oracle checks. The sink write is
    IDEMPOTENT per batch_id (each batch overwrites its own
    ``batch=<id>`` partition directory): foreachBatch re-runs a batch
    whose offsets never committed, and a blind append there would land
    duplicate match rows — overwrite-own-partition makes the replay
    exactly-once. The batch-side shingle cache the operator pins (read
    by both band probe and verify) is explicitly unpersisted after the
    blocking write — one leaked cache per micro-batch would accumulate
    for the life of the stream.
    """
    from docling_api_spark.operators.dedup import incremental_near_dup

    schema = spark.read.parquet(docs_path).schema
    d = spark.readStream.schema(schema).parquet(docs_path).select("doc_id", "text")
    # the arriving batch: dup_corpus's planted docs (exact copies and
    # near-dup tails), derived from the stream
    exact = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
    )
    new_docs = exact.unionByName(near)
    static_corpus = spark.read.parquet(docs_path).select("doc_id", "text")

    def probe(batch_df, batch_id):
        caches: list = []
        out = incremental_near_dup(
            batch_df, static_corpus, threshold=threshold, caches=caches
        )
        try:
            out.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        finally:
            for c in caches:
                c.unpersist()

    return (
        new_docs.writeStream.foreachBatch(probe)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
