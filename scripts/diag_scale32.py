"""Diagnose the 8->32 html scaling gap: run the EXACT _scaling_child
html job at a given width, then pull per-stage task metrics from the
live Spark UI REST API before stopping, so wall-clock can be split
into (sum of executor task time)/width vs scheduler/straggler/driver
gap. Usage: python scripts/diag_scale32.py <cpus> [repl]"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from pyspark.sql import functions as F

    from bench import _warm
    from docling_api_spark.operators.extract import extract
    from docling_api_spark.operators.render import render_text
    from docling_api_spark.session import get_spark
    from docling_api_spark.sources.catalog import load, wrap_documents_as_corpus

    extra = {
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.driver.memory": "16g",
        "spark.driver.extraJavaOptions": "-Xms16g -XX:+AlwaysPreTouch",
        "spark.ui.enabled": "true",
    }
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-bench-tmp"
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"diag-{cpus}",
        shuffle_partitions=int(cpus) * 4,
        extra_conf=extra,
    )
    _warm(spark)
    n_tasks = int(cpus) * 2
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "n_chars"
    )

    def job(replication: int):
        big = (
            docs.repartition(n_tasks)
            .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(replication - 1))))
            .select(F.concat_ws("_", "doc_id", "r").alias("doc_id"), "text")
        )
        return extract(wrap_documents_as_corpus(big)).select(
            "doc_id", render_text(F.col("spans")).alias("content")
        )

    job(max(repl // 100, 1)).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    pre = {s["stageId"] for s in stages()}
    out = job(repl)
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0

    rows = []
    for s in stages():
        if s["stageId"] in pre:
            continue
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "executorRunTime_s": round(s["executorRunTime"] / 1e3, 2),
                "executorCpuTime_s": round(s["executorCpuTime"] / 1e9, 2),
                "jvmGcTime_s": round(s.get("jvmGcTime", 0) / 1e3, 2),
                "shuffleWrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "sched_span_s": round(
                    (s["executorRunTime"] / 1e3) / max(int(cpus), 1), 2
                ),
            }
        )
    total_run = sum(r["executorRunTime_s"] for r in rows)
    total_cpu = sum(r["executorCpuTime_s"] for r in rows)
    total_gc = sum(r["jvmGcTime_s"] for r in rows)
    print(
        json.dumps(
            {
                "cpus": int(cpus),
                "repl": repl,
                "wall_s": round(elapsed, 3),
                "ideal_busy_s": round(total_run / int(cpus), 3),
                "sched_gap_s": round(elapsed - total_run / int(cpus), 3),
                "executorRunTime_sum_s": round(total_run, 2),
                "executorCpuTime_sum_s": round(total_cpu, 2),
                "run_minus_cpu_s (blocked/python wait)": round(
                    total_run - total_cpu, 2
                ),
                "jvmGcTime_sum_s": round(total_gc, 2),
                "stages": rows,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
