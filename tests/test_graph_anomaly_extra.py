"""k-core peeling + burst-involvement unit tests on handcrafted inputs."""

from __future__ import annotations

import datetime as dt
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from spartan2_spark.operators.anomaly import burst_involvement  # noqa: E402
from spartan2_spark.operators.graph import kcore  # noqa: E402


def test_kcore_triangle_plus_tail(spark):
    # triangle a-b-c (each degree 2) with a pendant tail c-d (d degree 1)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
    )
    core2 = kcore(edges, k=2)
    got = {r.node: r.degree for r in core2.collect()}
    assert got == {"a": 2, "b": 2, "c": 2}  # d peeled, c's degree drops to 2
    core3 = kcore(edges, k=3)
    assert core3.count() == 0


def test_kcore_keeps_multi_edges(spark):
    # multigraph: 3 parallel edges a-b -> both nodes have degree 3
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "b")], ["src", "dst"]
    )
    got = {r.node: r.degree for r in kcore(edges, k=3).collect()}
    assert got == {"a": 3, "b": 3}


def test_burst_involvement_ratio(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # sink x: 3 of 4 events in hour 0 (the global peak); sink y: 1 of 2
    for m in (1, 2, 3):
        rows.append(("x", t0 + dt.timedelta(minutes=m)))
    rows.append(("x", t0 + dt.timedelta(hours=5)))
    rows.append(("y", t0 + dt.timedelta(minutes=30)))
    rows.append(("y", t0 + dt.timedelta(hours=7)))
    df = spark.createDataFrame(rows, ["sink", "ts"])
    out = {r.sink: r for r in burst_involvement(df, "sink", "ts", 3600).collect()}
    assert out["x"].n_burst == 3 and out["x"].n_total == 4
    assert abs(out["x"].involv - 0.75) < 1e-9
    assert out["y"].n_burst == 1 and out["y"].n_total == 2
