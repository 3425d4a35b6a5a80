"""The ray-job entry point: end-to-end run + resume-after-loss, driven
as a real subprocess (what ``ray job submit`` executes)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys


def _run(out_dir: str) -> dict:
    res = subprocess.run(
        [sys.executable, "jobs/run_kg.py", "--pages", "synth:200",
         "--out", out_dir, "--concurrency", "2", "--num-cpus", "4"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_job_runs_and_resumes(tmp_path):
    out = str(tmp_path / "kgjob")
    s1 = _run(out)
    assert s1["stages"]["triples"]["rows"] > 0
    assert s1["stages"]["entities"]["rows"] > 0

    # lose one triples partition + downstream edges; re-submit
    part = os.path.join(out, "triples", "part-00000")
    man = os.path.join(out, "triples", "_manifest", "part-00000.json")
    shutil.rmtree(part)
    os.remove(man)
    s2 = _run(out)
    # identical final row counts; the lost partition was re-created,
    # completed ones were skipped
    assert s2["stages"]["triples"]["rows"] == s1["stages"]["triples"]["rows"]
    assert s2["stages"]["entities"]["rows"] == s1["stages"]["entities"]["rows"]


def _run_dedup(out_dir: str) -> dict:
    res = subprocess.run(
        [sys.executable, "jobs/run_dedup.py", "--docs",
         "/root/testdata/sf0.001/documents.parquet", "--out", out_dir,
         "--concurrency", "2", "--num-cpus", "4"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_dedup_job_runs_and_resumes(tmp_path):
    out = str(tmp_path / "dedupjob")
    s1 = _run_dedup(out)
    assert s1["stages"]["exact"]["rows"] > 0
    # near-dup removal keeps strictly fewer docs than the corpus
    assert 0 < s1["stages"]["kept"]["rows"] <= s1["stages"]["exact"]["rows"]

    # lose one kept partition; re-submit re-creates it only
    part = os.path.join(out, "kept", "part-00000")
    man = os.path.join(out, "kept", "_manifest", "part-00000.json")
    shutil.rmtree(part)
    os.remove(man)
    s2 = _run_dedup(out)
    assert s2["stages"]["kept"]["rows"] == s1["stages"]["kept"]["rows"]
    assert s2["stages"]["clusters"]["rows"] == s1["stages"]["clusters"]["rows"]
