"""Deployment-path smoke test (north_rule: "runs via spark-submit
--py-files on multi-executor clusters"): build the --py-files zip with
scripts/package.py, copy the job file OUT of the repo so the package is
importable only from the zip, and run a tiny crawl through the real
spark-submit launcher."""

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_spark_submit_py_files_crawl(tmp_path):
    from package import build

    zip_path = build(str(tmp_path / "dist" / "smart_crawler_spark.zip"))
    # the copied job sits beside no smart_crawler_spark/ dir, so its
    # local-run sys.path fallback stays inert — imports MUST come from
    # the shipped zip, exactly like a cluster executor/driver
    job = str(tmp_path / "crawl_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "crawl_job.py"), job)

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            job,
            "--hosts", "2",
            "--details", "10",
            "--budget", "50",
            "--checkpoint-every", "1",
            "--workdir", str(tmp_path / "wd"),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["fetched"] > 0
    assert metrics["rounds"] >= 1
    # the checkpointed run left a committed snapshot behind (resume path)
    assert os.path.isdir(str(tmp_path / "wd" / "checkpoints"))


def test_spark_submit_py_files_corpus_build(tmp_path):
    """The crawl->corpus job must also deploy via spark-submit
    --py-files (imports only from the shipped zip)."""
    from package import build

    zip_path = build(str(tmp_path / "dist" / "smart_crawler_spark.zip"))
    job = str(tmp_path / "corpus_build_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "corpus_build_job.py"), job)

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            job,
            "--hosts", "2",
            "--details", "10",
            "--output", str(tmp_path / "corpus"),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    manifest = json.loads(out.stdout.strip().splitlines()[-1])
    assert manifest["documents"] > 0
    assert manifest["kept"] > 0
    assert manifest["shards"] == manifest["kept"]
    assert os.path.isdir(str(tmp_path / "corpus" / "shards"))
