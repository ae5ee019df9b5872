"""End-to-end run of jobs/pipeline_job.py for the eval + hybrid stages:
the deployable job must produce the quality gate's report card (AUC,
calibration, kappa) and the fused hybrid retrieval list as parquet, and
the AUC/kappa values must equal the operator outputs computed in-process
(same input, same arithmetic)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@needs_testdata
def test_pipeline_job_eval_hybrid(tmp_path, spark):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "pipeline_job.py"),
            "--input", SF_DIR,
            "--output", str(tmp_path / "pipe"),
            "--stages", "eval,hybrid",
            "--master", "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    st = report["stages"]
    assert st["eval_auc"]["rows"] == 1
    assert st["eval_kappa"]["rows"] == 1
    assert 1 <= st["eval_calibration"]["rows"] <= 10
    assert st["hybrid"]["rows"] == 20

    auc = spark.read.parquet(st["eval_auc"]["path"]).first()
    assert auc["n_pos"] + auc["n_neg"] == 500  # sf0.001 documents
    assert 0.0 <= auc["auc"] <= 1.0

    # replay the stage in-process: identical input + arithmetic
    from pyspark.sql import functions as F

    from smart_crawler_spark.operators.evalmetrics import roc_auc
    from smart_crawler_spark.operators.textops import quality_score

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    scored = quality_score(docs).select("doc_id", "quality").join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")), "doc_id"
    )
    want = roc_auc(scored, "quality", "y").first()
    assert auc["auc"] == want["auc"]

    hybrid = spark.read.parquet(st["hybrid"]["path"])
    rows = {r["fused_rank"]: r for r in hybrid.collect()}
    assert set(rows) == set(range(1, 21))
    # fused scores are non-increasing in fused rank
    scores = [rows[i]["rrf_score"] for i in range(1, 21)]
    assert scores == sorted(scores, reverse=True)
