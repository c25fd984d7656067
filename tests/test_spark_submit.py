"""spark-submit --py-files packaging smoke test.

The north rule requires the whole engine to run via
``spark-submit --py-files`` on a cluster. This test proves the
README's exact deployment recipe works end-to-end: zip the package,
submit ``run_pipeline.py`` against a synthetic pages input with ONLY
the zip on the python path (cwd stripped via a scratch working dir),
and assert the full ladder completed with manifests written.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_runs_full_ladder(tmp_path):
    pkg_zip = str(tmp_path / "spartan2_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as z:
        pkg_root = os.path.join(REPO, "spartan2_spark")
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))

    out_root = str(tmp_path / "tiers")
    workdir = str(tmp_path / "cwd")  # no repo on sys.path: zip must carry all
    os.makedirs(workdir)
    driver = shutil.copy(os.path.join(REPO, "run_pipeline.py"), workdir)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", pkg_zip,
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.shuffle.partitions=8",
            driver,
            "--pages", "synth:3000",
            "--out", out_root,
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the driver prints one JSON line with per-stage stats
    report = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"stages"' in line:
            report = json.loads(line)
    assert report is not None, proc.stdout[-2000:]
    stages = {s["stage"]: s for s in report["stages"]}
    assert set(stages) == {
        "canonical", "t1m", "t1h", "t1d", "gapfill_1h", "blocks_1h"
    }
    assert all(s["rows_written"] > 0 for s in stages.values())

    # manifests + tier tables durably on disk
    for st in ("t1m", "t1h", "t1d"):
        assert os.path.exists(os.path.join(out_root, "_manifests", f"{st}.json"))
        assert os.path.isdir(os.path.join(out_root, st))
