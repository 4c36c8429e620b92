"""End-to-end spark-submit packaging test: build the --py-files zip,
run the extraction job entry point against a corpus dir in a clean
subprocess whose only import path to the engine is the zip."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from docling_api_spark.sources.catalog import load, wrap_documents_as_corpus

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def test_package_builds():
    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    try:
        import package

        out = package.build()
    finally:
        sys.path.pop(0)
    assert os.path.exists(out)
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "docling_api_spark/__init__.py" in names
    assert "docling_api_spark/checkpoint.py" in names
    assert not any("__pycache__" in n for n in names)


def test_submit_job_runs_from_zip(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    wrap_documents_as_corpus(load(spark, SF_DIR, "documents").limit(60)).write.parquet(
        corpus_path
    )

    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    try:
        import package

        zip_path = package.build(str(tmp_path / "docling_api_spark.zip"))
    finally:
        sys.path.pop(0)

    out_path = str(tmp_path / "extracted")
    env = dict(os.environ)
    # the child must resolve the package from the zip, not the repo
    env["PYTHONPATH"] = zip_path
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "jobs", "run_extract.py"),
            "--input",
            corpus_path,
            "--output",
            out_path,
            "--num-buckets",
            "4",
            "--batch-buckets",
            "2",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo so imports come from the zip
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["docs"] == 60
    assert report["processed_batches"] == 2
    assert os.path.isdir(os.path.join(out_path, "_commits"))


def test_curate_job_runs_from_zip(spark, tmp_path):
    """The curation cascade ships the same way as extraction: child
    process resolves the engine only from the --py-files zip."""
    docs_path = str(tmp_path / "docs")
    load(spark, SF_DIR, "documents").select("doc_id", "text").write.parquet(docs_path)
    eval_path = str(tmp_path / "eval")
    load(spark, SF_DIR, "documents").filter("doc_id < 5").select("text").write.parquet(
        eval_path
    )

    sys.path.insert(0, os.path.join(ROOT, "jobs"))
    try:
        import package

        zip_path = package.build(str(tmp_path / "docling_api_spark.zip"))
    finally:
        sys.path.pop(0)

    out_path = str(tmp_path / "curated")
    env = dict(os.environ)
    env["PYTHONPATH"] = zip_path
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "jobs", "run_curate.py"),
            "--input", docs_path,
            "--output", out_path,
            "--eval-set", eval_path,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    stages = report["stages"]
    assert sum(stages.values()) == 500  # every input doc accounted for
    assert stages.get("kept", 0) > 0 and stages.get("quality", 0) > 0
    # audit table partitioned by kept; curated corpus = kept=true leg
    # (partition-column values read back as strings — standard Spark
    # partition inference)
    got = spark.read.parquet(out_path)
    assert got.count() == 500
    assert got.filter("kept = 'true'").count() == stages["kept"]
