"""The north_rule's literal deploy surface: `spark-submit --py-files
cascade.zip <job>.py` with NO repo on sys.path.

test_resume/test_linkage already exercise the job CLIs via `python -m`
from the repo checkout; this test removes the checkout from the equation —
the job script and cascade.zip are copied to a scratch dir, spark-submit
runs from there, and the package must arrive on driver and executors
solely through --py-files (reference deployment: copying the
Regional_Run_Files tree to the runner box, runfile.py:257-261)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(out_path: str) -> str:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_pyfiles", os.path.join(REPO, "tools", "make_pyfiles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build(out_path, repo_root=REPO)


def _spark_submit_bin() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit binary on this box")


def test_spark_submit_pyfiles_round_trip(tmp_path):
    zip_path = _build_zip(str(tmp_path / "cascade.zip"))
    # job script travels as a plain file, package ONLY via the zip
    shutil.copy(
        os.path.join(REPO, "project_cascade_spark", "jobs", "dedup_job.py"),
        tmp_path / "dedup_job.py",
    )
    wd = str(tmp_path / "jobwd")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def run():
        out = subprocess.run(
            [_spark_submit_bin(), "--master", "local[4]",
             "--py-files", zip_path, str(tmp_path / "dedup_job.py"),
             "--input", "synth:150", "--workdir", wd,
             "--no-substring-pass", "--report"],
            capture_output=True, text=True, cwd=str(tmp_path), env=env,
            timeout=600,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        return json.loads(line)

    r1 = run()
    assert r1["files"] == 150
    assert r1["clusters"] > 0
    assert r1["computed_stages"] != []
    # second submit over the same workdir resumes every stage off the zip
    r2 = run()
    assert r2["computed_stages"] == []
    assert (r1["files"], r1["clusters"], r1["dup_edges"]) == \
           (r2["files"], r2["clusters"], r2["dup_edges"])
