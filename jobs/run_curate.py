#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation cascade
(operators/curate.py): exact dedup → MinHash near-dup → line-level
boilerplate removal → quality filter → optional 13-gram benchmark
decontamination.

Usage:

    python jobs/package.py                       # builds dist/docling_api_spark.zip
    spark-submit --py-files dist/docling_api_spark.zip \
        jobs/run_curate.py \
        --input  /path/to/documents_parquet \
        --output /path/to/curated_table \
        [--quality-threshold 0.3] [--near-dup-threshold 0.8] \
        [--line-df-cap 100] [--eval-set /path/to/eval_parquet]

Input: a documents table with (doc_id, text). Output: the full audit
table (one row per input doc: text, quality, drop_stage, kept)
partitioned by ``kept`` — the curated corpus is the kept=true
partition; the drop ledger rides along for reporting. A per-stage
summary prints as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:  # noqa: SIM105 — same bootstrap as run_extract.py
    import docling_api_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--quality-threshold", type=float, default=0.3)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--line-df-cap", type=int, default=100)
    ap.add_argument(
        "--eval-set",
        default=None,
        help="parquet with a `text` column; docs sharing any 13-gram are dropped",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("docling_api_spark.curate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from docling_api_spark.operators.curate import (
        assert_row_conservation,
        curate_corpus,
        curation_stats,
    )

    docs = spark.read.parquet(args.input)
    ev = spark.read.parquet(args.eval_set).select("text") if args.eval_set else None
    staged = curate_corpus(
        docs,
        quality_threshold=args.quality_threshold,
        near_threshold=args.near_dup_threshold,
        line_df_cap=args.line_df_cap,
        eval_texts=ev,
    ).persist()
    # refuse to publish an audit table that lost rows (same publish-gate
    # discipline as run_extract's span/media audits): every input doc
    # must come out as a LABELED row, kept or dropped
    assert_row_conservation(docs, staged)
    staged.write.mode("overwrite").partitionBy("kept").parquet(args.output)
    stats = {r["stage"]: r["docs"] for r in curation_stats(staged).collect()}
    staged.unpersist()
    print(json.dumps({"stages": stats, "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
