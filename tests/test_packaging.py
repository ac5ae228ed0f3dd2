"""spark-submit --py-files packaging smoke (north_rule requirement)."""

import json
import os
import subprocess
import zipfile


def test_spark_submit_pyfiles(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = tmp_path / "engine.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "radarpipeline_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, repo))
    cfg = tmp_path / "job.yaml"
    cfg.write_text(
        f"""
input:
  path: /root/testdata/sf0.001/events.parquet
  format: events
output:
  path: {tmp_path}/out
  n_buckets: 2
"""
    )
    runner = os.path.join(repo, "radarpipeline_spark", "cli.py")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        ["spark-submit", "--py-files", str(zpath), runner, "--config", str(cfg)],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # NOT the repo: proves the zip is the import source
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["complete"] and summary["rows_out"] == 1000
    assert os.path.exists(f"{tmp_path}/out/manifest.jsonl")
