"""spark-submit --py-files packaging smoke test (SURVEY.md §7 step 9;
north rule: "submitted via spark-submit --py-files on multi-executor
clusters"). Builds ganda_spark.zip, submits a job whose UDFs must import
the package on executors, asserts the result."""

from __future__ import annotations

import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys, json
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from ganda_spark.config import EngineConfig
from ganda_spark.operators.fetch import mock_fetch_udf, split_results
from ganda_spark.sources.frontier import seed_frontier
f = seed_frontier(spark, "/root/testdata/sf0.001").limit(200)
results, errors = split_results(mock_fetch_udf(f, EngineConfig(retries=1)))
print("SUBMIT_RESULT " + json.dumps({"results": results.count(),
                                     "errors": errors.count()}))
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    zip_path = shutil.make_archive(
        str(tmp_path / "ganda_spark"), "zip", REPO, "ganda_spark"
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    res = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path, str(job)],
        capture_output=True,
        text=True,
        timeout=400,
        cwd=str(tmp_path),  # NOT the repo: the zip must be the import source
    )
    lines = [l for l in res.stdout.splitlines() if l.startswith("SUBMIT_RESULT")]
    assert lines, f"submit failed:\n{res.stderr[-3000:]}"
    import json

    payload = json.loads(lines[0].split(" ", 1)[1])
    assert payload["results"] + payload["errors"] == 200
    assert payload["results"] > 150
