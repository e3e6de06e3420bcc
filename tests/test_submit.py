"""spark-submit --py-files packaging: the job must run from the built zip
in a clean subprocess (no repo on PYTHONPATH), produce per-sink output, a
manifest, and lineage metrics — the north rule's shipping form."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyspark
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files(tmp_path):
    sys.path.insert(0, ROOT)
    from tools.package import build

    zip_path = build(str(tmp_path / "beats_spark.zip"))
    out_dir = str(tmp_path / "sinks")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(ROOT, "jobs", "run_pipeline.py"),
            "--input", "/root/testdata/sf0.001",
            "--output", out_dir,
            "--job-id", "submit-test",
        ],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path),  # NOT the repo root — the zip must supply the pkg
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["job_id"] == "submit-test"
    assert sum(report["sinks"].values()) == 1000
    assert report["n_conversations"] > 0
    stages = [s["stage"] for s in report["lineage"]]
    assert stages == ["scan", "parse", "enrich", "route"]
    assert all(s["rows"] == 1000 for s in report["lineage"])
    assert os.path.exists(os.path.join(out_dir, "_beats_manifest.json"))
