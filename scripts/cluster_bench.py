#!/usr/bin/env python
"""REAL-cluster scaling evidence: N vs 4N one-core executor JVMs on a
local standalone master (north rule: "spark-submit --py-files on a
multi-executor cluster at two cluster sizes (N and 4N executors) with
throughput scaling efficiency >=0.8").

local[N] legs (bench.py --scaling) scale THREADS in one JVM; this
harness scales EXECUTOR PROCESSES: a standalone master + one worker
are started, then each level submits the flagship extraction with
``spark.cores.max=N, spark.executor.cores=1`` — N separate executor
JVMs, each with its own Python worker, real registration/serialization
paths. Per-level CPU + membw calibrations ship with every trial (same
degraded-window discipline as bench.py).

Writes BENCH_CLUSTER.json {levels, legs, scaling_efficiency, trials}.

Usage: python scripts/cluster_bench.py [sf_dir]
Env: SPARK_GRAFT_CLUSTER_LEVELS=2,8  SPARK_GRAFT_SCALE_REPL=400
     SPARK_GRAFT_SCALE_FMT=html|pdf
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_BIN = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)), "bin"
)
MASTER_URL = "spark://127.0.0.1:7077"
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (repo-root bench.py: calibration helpers)


def _spawn(cls: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("SPARK_LOG_DIR", "/tmp/spark_cluster_logs")
    return subprocess.Popen(
        [os.path.join(SPARK_BIN, "spark-class"), cls, *args],
        stdout=open(f"/tmp/spark_cluster_logs/{cls.rsplit('.', 1)[-1]}.log", "ab"),
        stderr=subprocess.STDOUT,
        env=env,
    )


def _wait_for(pattern: str, path: str, timeout_s: int = 60) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if os.path.exists(path) and pattern in open(path, errors="ignore").read():
            return
        time.sleep(1)
    raise RuntimeError(f"'{pattern}' not seen in {path} within {timeout_s}s")


def run_level(sf_dir: str, n_exec: int, repl: int, fmt: str) -> dict:
    # calibrate BEFORE the submit's JVMs exist (bench.py discipline)
    cal = bench._cpu_calibration(n_exec)
    membw = bench._membw_calibration(n_exec)
    conf = [
        "--conf", f"spark.cores.max={n_exec}",
        "--conf", "spark.executor.cores=1",
        "--conf", "spark.executor.memory=2g",
        "--conf", f"spark.sql.shuffle.partitions={n_exec * 4}",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.ui.enabled=false",
        # Fault the whole heap in at JVM launch (Xms=Xmx under Spark),
        # OUTSIDE the timed region: this box's degraded-memory windows
        # collapse the first-touch path specifically (BASELINE.md), and
        # lazy heap growth otherwise lands that host-serialized cost
        # inside the measured job — asymmetrically, since 4N executors
        # fault 4N heaps. Healthy boxes are unaffected.
        "--conf", "spark.executor.extraJavaOptions=-XX:+AlwaysPreTouch",
        "--conf", "spark.driver.extraJavaOptions=-XX:+AlwaysPreTouch",
    ]
    if os.path.isdir("/dev/shm"):
        conf += ["--conf", "spark.local.dir=/dev/shm/spark-cluster-tmp"]
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            os.path.join(SPARK_BIN, "spark-submit"),
            "--master", MASTER_URL,
            "--py-files", os.path.join(ROOT, "dist", "docling_api_spark.zip"),
            *conf,
            os.path.join(ROOT, "scripts", "cluster_scale_child.py"),
            sf_dir, str(repl), fmt,
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd="/tmp",  # imports must come from the --py-files zip
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"level {n_exec} failed:\n{out.stderr[-3000:]}")
    rec = json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    rec["cpu_calibration"] = cal
    rec["membw_calibration_gbps"] = round(membw / 1e9, 2)
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    levels = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_CLUSTER_LEVELS", "2,8").split(",")
    ]
    repl = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "400"))
    fmt = os.environ.get("SPARK_GRAFT_SCALE_FMT", "html")

    os.makedirs("/tmp/spark_cluster_logs", exist_ok=True)
    subprocess.run(["python", os.path.join(ROOT, "jobs", "package.py")], check=True)

    procs: list[subprocess.Popen] = []
    try:
        procs.append(
            _spawn(
                "org.apache.spark.deploy.master.Master",
                "-h", "127.0.0.1", "-p", "7077", "--webui-port", "8081",
            )
        )
        _wait_for("started service 'sparkMaster'", "/tmp/spark_cluster_logs/Master.log")
        procs.append(
            _spawn(
                "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                "-c", str(max(levels)), "-m", "24g", "--webui-port", "8082",
            )
        )
        _wait_for("Registering worker", "/tmp/spark_cluster_logs/Master.log")

        results = [run_level(sf_dir, n, repl, fmt) for n in levels]
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)

    degraded = any(
        r["membw_calibration_gbps"] < bench.DEGRADED_GBPS for r in results
    )
    lo, hi = results[0], results[-1]
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    ideal = hi["executors"] / lo["executors"]
    hw = hi["cpu_calibration"] / lo["cpu_calibration"]
    rep = {
        "metric": "cluster_scaling_efficiency",
        "mode": "standalone master + one-core executor JVMs (spark-submit --py-files)",
        "fmt": fmt,
        "levels": results,
        "speedup": round(speedup, 3),
        "ideal": ideal,
        "scaling_efficiency": round(speedup / ideal, 3),
        "scaling_efficiency_vs_hardware": round(speedup / (ideal * hw), 3)
        if hw
        else None,
        "degraded_memory_window": degraded,
        "sf_dir": sf_dir,
        "repl": repl,
    }
    out_name = (
        "BENCH_CLUSTER.json" if fmt == "html" else f"BENCH_CLUSTER_{fmt}.json"
    )
    path = os.path.join(ROOT, out_name)
    prev = {}
    if os.path.exists(path):
        try:
            prev = json.load(open(path))
        except ValueError:
            prev = {}
    trials = prev.get("trials", [])
    trials.insert(0, {"ts": int(time.time()), **{k: rep[k] for k in (
        "fmt", "speedup", "scaling_efficiency",
        "scaling_efficiency_vs_hardware", "degraded_memory_window", "repl")}})
    rep["trials"] = trials
    with open(path, "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps({k: v for k, v in rep.items() if k != "trials"}))


if __name__ == "__main__":
    main()
