"""Resume-after-kill idempotence (SURVEY.md §5.3): a killed
checkpointed run, resumed, must produce the identical table as an
uninterrupted run, without reprocessing committed buckets."""

from __future__ import annotations

import pytest

from docling_api_spark.checkpoint import (
    CommitLog,
    commit_history,
    extract_with_checkpoint,
)
from docling_api_spark.sources.catalog import load, wrap_documents_as_corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return wrap_documents_as_corpus(load(spark, SF_DIR, "documents"))


def _content(spark, path):
    df = spark.read.parquet(path)
    rows = df.selectExpr(
        "doc_id",
        "transform(spans, s -> struct(s.kind, s.text, s.media_ref, s.order)) AS sp",
    ).collect()
    return sorted((r.doc_id, tuple(map(tuple, r.sp))) for r in rows)


def test_uninterrupted_run(spark, corpus, tmp_path):
    out = str(tmp_path / "t")
    res = extract_with_checkpoint(corpus, out, num_buckets=8, batch_buckets=4)
    assert res["processed_batches"] == 2
    assert spark.read.parquet(out).count() == 500
    log = CommitLog(out)
    assert sorted(b for c in log.commits() for b in c["buckets"]) == list(range(8))
    # lineage metrics add up to the table
    hist = commit_history(spark, out)
    assert hist.count() == 2
    assert hist.groupBy().sum("docs").first()[0] == 500


def test_killed_and_resumed_equals_uninterrupted(spark, corpus, tmp_path):
    full = str(tmp_path / "full")
    extract_with_checkpoint(corpus, full, num_buckets=8, batch_buckets=2)

    resumed = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(
            corpus, resumed, num_buckets=8, batch_buckets=2, fail_after_batches=2
        )
    # partial state: exactly 2 commits on disk
    assert len(CommitLog(resumed).commits()) == 2

    res = extract_with_checkpoint(corpus, resumed, num_buckets=8, batch_buckets=2)
    # resume skipped the 4 committed buckets and did only the rest
    assert sorted(res["skipped_buckets"]) == sorted(
        b for c in CommitLog(resumed).commits()[:2] for b in c["buckets"]
    )
    assert res["processed_batches"] == 2

    assert _content(spark, resumed) == _content(spark, full)


def test_resume_is_noop_when_complete(spark, corpus, tmp_path):
    out = str(tmp_path / "t")
    extract_with_checkpoint(corpus, out, num_buckets=4, batch_buckets=4)
    res = extract_with_checkpoint(corpus, out, num_buckets=4, batch_buckets=4)
    assert res["processed_batches"] == 0
    assert len(res["skipped_buckets"]) == 4
