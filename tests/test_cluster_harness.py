"""Opt-in gate for the real-executor scaling harness (slow: starts a
standalone master + worker and submits two jobs). Run with
SPARK_GRAFT_CLUSTER_TEST=1; skipped otherwise (same convention as the
sf0.1 parity suite)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_CLUSTER_TEST") != "1",
    reason="opt-in: SPARK_GRAFT_CLUSTER_TEST=1 (starts a standalone cluster)",
)


def test_cluster_bench_two_executor_levels(tmp_path):
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CLUSTER_LEVELS="2,8",
        SPARK_GRAFT_SCALE_REPL="20",
        SPARK_GRAFT_SCALE_FMT="html",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "cluster_bench.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, env=env, timeout=900, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert [lv["executors"] for lv in rep["levels"]] == [2, 8]
    assert all(lv["docs"] == 10_000 for lv in rep["levels"])
    assert all(lv["docs_per_sec"] > 0 for lv in rep["levels"])
    assert "scaling_efficiency" in rep and "degraded_memory_window" in rep
    # master/worker must be torn down
    ps = subprocess.run(["ps", "ax"], capture_output=True, text=True).stdout
    assert "deploy.master.Master" not in ps and "deploy.worker.Worker" not in ps
