#!/usr/bin/env python
"""spark-submit driver program for the REAL-cluster scaling leg.

Runs the flagship extraction over a ×repl replicated corpus on
whatever cluster ``--master`` provides (here: a local standalone
master with N one-core executor JVMs — separate processes, real
executor registration, real task serialization — the closest this
sandbox gets to the north rule's "N and 4N executors"). Mirrors
bench.py _scaling_child's honest-measurement discipline: source
spread before the ×repl explode, pipeline-exact 1% warm-up (JIT +
executor Python worker pools), timing only the steady-state job.

Usage (via scripts/cluster_bench.py):
    spark-submit --master spark://127.0.0.1:7077 \
        --py-files dist/docling_api_spark.zip \
        --conf spark.cores.max=<N> --conf spark.executor.cores=1 \
        scripts/cluster_scale_child.py <sf_dir> <repl> <fmt>

Prints ONE JSON line: {"executors": N, "sec", "docs", "docs_per_sec",
"mb_per_sec", "fmt"}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir, repl, fmt = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    spark = SparkSession.builder.appName(f"cluster-scale-{fmt}").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from docling_api_spark.operators.extract import extract
    from docling_api_spark.operators.render import render_text
    from docling_api_spark.sources.catalog import (
        wrap_documents_as_corpus,
        wrap_documents_as_pdf_corpus,
    )

    n_exec = int(spark.conf.get("spark.cores.max"))
    n_tasks = n_exec * 2

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text", "n_chars")
    )

    if fmt == "mixed":
        # TRUE interleaved corpus: the 40/30/10/10/10 format mix with
        # the 1-in-500 oversized-PDF skew tail, generated distributed
        # (same path as bench.py --scaling fmt=mixed)
        from docling_api_spark.corpus import corpus_df

        base = docs.count()

        def job(replication: int):
            corpus = corpus_df(spark, base * replication, partitions=n_tasks)
            return extract(corpus).select(
                "doc_id", render_text(F.col("spans")).alias("content")
            )

        job(max(repl // 100, 1)).write.format("noop").mode("overwrite").save()
        n_docs = base * repl
        n_bytes = (
            corpus_df(spark, n_docs, partitions=n_tasks)
            .select(
                F.aggregate(
                    "spans", F.lit(0).cast("long"), lambda a, s: a + F.length(s["text"])
                ).alias("b")
            )
            .agg(F.sum("b"))
            .first()[0]
        )
    else:
        wrap = wrap_documents_as_pdf_corpus if fmt == "pdf" else wrap_documents_as_corpus

        def job(replication: int):
            big = (
                docs.repartition(n_tasks)
                .withColumn(
                    "r", F.explode(F.sequence(F.lit(0), F.lit(replication - 1)))
                )
                .select(F.concat_ws("_", "doc_id", "r").alias("doc_id"), "text")
            )
            return extract(wrap(big)).select(
                "doc_id", render_text(F.col("spans")).alias("content")
            )

        # pipeline-exact warm-up at 1% scale: JIT-compiles every codegen
        # stage and spins each executor's Python worker
        job(max(repl // 100, 1)).write.format("noop").mode("overwrite").save()

        n_docs, n_bytes = docs.selectExpr("count(*)", "sum(n_chars)").first()
        n_docs, n_bytes = n_docs * repl, (n_bytes or 0) * repl

    # Two steady-state timings, best-of reported (both recorded): the
    # first full-scale pass still pays residual first-touch faults
    # (Python-worker arenas, Arrow buffers, shuffle-dir pages) that the
    # 1% warm-up could not fully fault in; on this box's degraded
    # windows that host cost is serialized across executors and skews
    # the scaling ratio. The second pass runs on warmed allocators.
    out = job(repl)
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    elapsed = min(runs)
    print(
        json.dumps(
            {
                "executors": n_exec,
                "fmt": fmt,
                "sec": elapsed,
                "runs": runs,
                "docs": int(n_docs),
                "docs_per_sec": round(n_docs / elapsed, 1),
                "mb_per_sec": round(n_bytes / 1e6 / elapsed, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
