"""Multi-executor deployment proof: the production ladder on a REAL
standalone cluster (separate master/worker/executor JVMs, cross-JVM
netty shuffle, --py-files shipped to remote executors) produces output
bit-identical to local mode.

This is the part of the north rule local[k] cannot exercise: task
results and shuffle blocks serialize between executor processes, and
the package zip — not the repo checkout — must carry every module the
executors' python workers import. Uses its own ports (7301/8301) so it
can run alongside a tools/cluster_scaling.py session (7201/8201).
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")

_spec = importlib.util.spec_from_file_location(
    "cluster_scaling", os.path.join(REPO, "tools", "cluster_scaling.py")
)
cluster_scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cluster_scaling)

STAGES = ("t1m", "t1h", "t1d", "gapfill_1h", "blocks_1h")

# the SAME fingerprint the evidence harness uses — one implementation
_content_hash = cluster_scaling.content_hash


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SPARK_HOME, "bin", "spark-class")),
    reason="standalone Spark distribution not installed",
)
def test_two_executor_cluster_matches_local(spark, tmp_path):
    from spartan2_spark.datagen import synth_pages
    from spartan2_spark.plans.pipeline import run_pipeline

    pages_dir = str(tmp_path / "pages")
    (
        synth_pages(spark, 30_000, n_urls=50)
        .withColumn("dt", F.to_date("warc_ts"))
        .write.mode("overwrite").partitionBy("dt").parquet(pages_dir)
    )

    pkg_zip = cluster_scaling.build_zip(str(tmp_path))
    out_cluster = str(tmp_path / "tiers_cluster")
    driver = shutil.copy(
        os.path.join(REPO, "run_pipeline.py"), str(tmp_path / "run_pipeline.py")
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable

    with cluster_scaling.Cluster(
        2, str(tmp_path / "daemons"),
        master_port=7301, ui_port=8301, cores_per_worker=2, pin=False,
    ) as cl:
        proc = subprocess.run(
            [
                os.path.join(SPARK_HOME, "bin", "spark-submit"),
                "--master", cl.master_url,
                "--driver-memory", "4g",
                "--py-files", pkg_zip,
                "--conf", "spark.executor.cores=2",
                "--conf", "spark.executor.memory=3g",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                driver,
                "--pages", pages_dir,
                "--out", out_cluster,
                "--master", cl.master_url,
            ],
            cwd=str(tmp_path),  # repo off sys.path: the zip carries all
            env=env, capture_output=True, text=True, timeout=600,
        )
    assert proc.returncode == 0, proc.stderr[-4000:]
    report = None
    for line in proc.stdout.splitlines():
        if line.strip().startswith("{") and '"stages"' in line:
            report = json.loads(line)
    assert report is not None, proc.stdout[-2000:]
    stage_rows = {s["stage"]: s["rows_written"] for s in report["stages"]}
    assert all(stage_rows[s] > 0 for s in STAGES)

    # same input through the library in local mode -> bit-identical tables
    out_local = str(tmp_path / "tiers_local")
    pages = spark.read.parquet(pages_dir).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    run_pipeline(spark, pages, out_local, resume=False)
    for s in STAGES:
        assert _content_hash(spark, os.path.join(out_cluster, s)) == _content_hash(
            spark, os.path.join(out_local, s)
        ), f"{s} diverges between 2-executor cluster and local mode"
