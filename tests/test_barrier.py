"""barrier(): reliable checkpoint when a dir is configured, local otherwise.

The VERDICT r3 risk finding: 91 ``localCheckpoint()`` sites pin blocks
to executor lifetimes — on a real cluster one lost executor kills a
long iterative chain. ``barrier()`` routes every iterative operator
through reliable ``checkpoint()`` whenever a checkpoint directory is
configured (``sc.setCheckpointDir`` / ``spark.spartan2.checkpoint.dir``
/ ``SPARK_GRAFT_CHECKPOINT_DIR``), which survives executor loss because
the materialized blocks live in the checkpoint store, not executor RAM.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from spartan2_spark.operators.barrier import barrier
from spartan2_spark.operators.graph import pagerank_fixedpoint


def _reset_ckdir(spark):
    """Clear the JVM-side checkpoint dir so later tests keep the
    localCheckpoint fast path (no public unset API in PySpark)."""
    jsc = spark.sparkContext._jsc.sc()
    getattr(jsc, "checkpointDir_$eq")(
        spark.sparkContext._jvm.scala.Option.apply(None)
    )


def _edges(spark):
    rows = [(i, (i * 7 + 3) % 23) for i in range(120)] + [
        (i % 23, (i * 11 + 5) % 23) for i in range(60)
    ]
    return spark.createDataFrame(rows, "src int, dst int").filter(
        "src <> dst"
    )


def test_barrier_local_mode_no_dir(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(10).transform(barrier)
    # localCheckpoint path: materialized — the plan collapses to a
    # checkpointed-RDD scan (lineage truncated)
    assert df.count() == 10
    assert "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


def test_barrier_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    spark.sparkContext.setCheckpointDir(ckdir)
    try:
        df = spark.range(100).withColumn("x", F.col("id") * 2).transform(barrier)
        assert df.count() == 100
        # reliable checkpoint writes part files under the checkpoint dir
        written = glob.glob(os.path.join(ckdir, "**", "part-*"), recursive=True)
        assert written, "reliable checkpoint() left no files in the dir"
    finally:
        # reset so other session-scoped tests keep the local fast path
        _reset_ckdir(spark)
    assert spark.sparkContext.getCheckpointDir() is None


def test_iterative_chain_identical_with_and_without_dir(spark, tmp_path):
    """Resume-safety regression: an iterative op (pagerank, 6 barriered
    rounds) returns bit-identical rank masses whether its barriers are
    localCheckpoint (no dir) or reliable checkpoint (dir set)."""
    e = _edges(spark)
    local = {r["node"]: r["rank_mass"] for r in pagerank_fixedpoint(e).collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck2"))
    try:
        reliable = {
            r["node"]: r["rank_mass"] for r in pagerank_fixedpoint(e).collect()
        }
    finally:
        _reset_ckdir(spark)
    assert local == reliable


def test_barrier_conf_key_activates_dir(spark, tmp_path):
    ckdir = str(tmp_path / "ck3")
    spark.conf.set("spark.spartan2.checkpoint.dir", ckdir)
    try:
        df = spark.range(7).transform(barrier)
        assert df.count() == 7
        assert spark.sparkContext.getCheckpointDir() is not None
        assert glob.glob(os.path.join(ckdir, "**", "part-*"), recursive=True)
    finally:
        spark.conf.unset("spark.spartan2.checkpoint.dir")
        _reset_ckdir(spark)
