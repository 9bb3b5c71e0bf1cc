"""The deployment path the north rule names: `spark-submit --py-files
dist/sneller_spark.zip tools/submit_pipeline.py` in a REAL subprocess —
the package must reach executors via the zip, never via the working
directory (which is a scratch temp dir here precisely so a cwd import
would fail)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit on PATH"
)
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from sneller_spark.datagen import generate_chunk

    inp = tmp_path / "input"
    inp.mkdir()
    for k in range(2):
        generate_chunk(k * 1500, (k + 1) * 1500).to_parquet(
            inp / f"part-{k}.parquet", index=False
        )
    out = tmp_path / "out"

    zpath = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout.strip()
    assert zpath.endswith("sneller_spark.zip")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.driver.memory=4g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "submit_pipeline.py"),
            str(inp), str(out),
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # scratch cwd: no repo on sys.path
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["units"] == 2 and stats["rows_in"] == 3000
    assert stats["rows_routed"] == 3000 and stats["n_agg_groups"] > 0
    # lineage artifacts landed
    assert (out / "_commit.log").exists() and (out / "manifests").is_dir()
