"""Unit tests for flow balance (CubeFlow/FlowScope), peak detection
(RPeak), reconstruction scoring (BeatGAN shape), histogram-cell
clustering (EagleMine), SpecGreedy, and kGrass operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spartan2_spark.operators.flow import flow_balance, flow_suspicious_mids
from spartan2_spark.operators.histogram import cluster_histogram_cells
from spartan2_spark.operators.peaks import (
    detect_peaks,
    peak_segments,
    reconstruction_scores,
)
from spartan2_spark.operators.spectral import kgrass_summarize, specgreedy_subgraph


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_flow_balance_score(spark):
    am = spark.createDataFrame(
        [("m1", 0, 100.0), ("m1", 0, 50.0), ("m2", 0, 10.0)],
        "mid string, bucket int, value double",
    )
    mc = spark.createDataFrame(
        [("m1", 0, 140.0), ("m3", 0, 5.0)],
        "mid string, bucket int, value double",
    )
    rows = {r.mid: r for r in flow_balance(am, mc, alpha=0.75).collect()}
    # m1: in=150 out=140 -> min 140 - 0.75*10 = 132.5
    assert rows["m1"].balance_score == 132.5
    # m2: in=10 out=0 -> 0 - 7.5 = -7.5 (pure in-flow is NOT suspicious)
    assert rows["m2"].balance_score == -7.5
    assert rows["m3"].balance_score == -3.75
    top = flow_suspicious_mids(flow_balance(am, mc, alpha=0.75), k=1).collect()
    assert top[0].mid == "m1"


def test_detect_peaks_local_maxima(spark):
    # series: 1 5 1 1 9 1 — peaks at 5 and 9; mean = 3 so both clear thr
    vals = [1.0, 5.0, 1.0, 1.0, 9.0, 1.0]
    df = spark.createDataFrame(
        [("a", _ts(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, value double",
    )
    pk = detect_peaks(df, k_sigma=0.0).collect()
    assert sorted(r.value for r in pk) == [5.0, 9.0]
    seg = peak_segments(detect_peaks(df, k_sigma=0.0), before_s=60, after_s=60)
    r = seg.orderBy("ts").first()
    assert (r.seg_end - r.seg_start).total_seconds() == 120


def test_detect_peaks_plateau_single(spark):
    # plateau 7 7: value > prev and value >= next picks the FIRST sample
    vals = [1.0, 7.0, 7.0, 1.0]
    df = spark.createDataFrame(
        [("a", _ts(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, value double",
    )
    pk = detect_peaks(df, k_sigma=0.0).collect()
    assert len(pk) == 1 and pk[0].ts == _ts(1)


def test_reconstruction_scores_flags_spike(spark):
    vals = [10.0] * 5 + [100.0] + [10.0] * 5
    df = spark.createDataFrame(
        [("a", _ts(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, value double",
    )
    sc = reconstruction_scores(df, half_window=2)
    top = sc.orderBy(F.desc("err")).first()
    assert top.value == 100.0  # the spike has the largest error
    flat = sc.filter(F.col("ts") == _ts(9)).first()
    assert flat.err == 0.0  # far from the spike: perfect reconstruction


def test_cluster_histogram_cells_components(spark):
    # two L-shaped components separated by a gap
    cells = [(0, 0, 5), (0, 1, 3), (1, 0, 2), (5, 5, 7), (5, 6, 1)]
    hist = spark.createDataFrame(cells, "bin_x long, bin_y long, cnt long")
    out = cluster_histogram_cells(hist).collect()
    comp = {(r.bin_x, r.bin_y): r.cluster for r in out}
    assert comp[(0, 0)] == comp[(0, 1)] == comp[(1, 0)] == 0
    assert comp[(5, 5)] == comp[(5, 6)] == 5 * 100000 + 5
    assert len({r.cluster for r in out}) == 2


def test_specgreedy_finds_planted_block(spark):
    # dense 4x4 bipartite block + sparse noise
    block = [(f"u{i}", f"v{j}") for i in range(4) for j in range(4)]
    noise = [(f"u{i}", f"v{i}") for i in range(10, 30)]
    edges = spark.createDataFrame(block + noise, "src string, dst string")
    res = specgreedy_subgraph(edges, n_iter=6, refine_rounds=3)
    srcs = {r.node for r in res["src_nodes"].collect()}
    assert {"u0", "u1", "u2", "u3"} <= srcs
    assert res["density"] >= 2.0  # planted block density = 2*16/8 = 4


def test_kgrass_error_and_sizes(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 20}") for i in range(20)],
        "src string, dst string",
    )
    res = kgrass_summarize(edges, k=4)
    assign = res["assign"].collect()
    assert {r.supernode for r in assign} <= set(range(4))
    assert res["error"] >= 0.0
    # multiplicities conserve the edge count
    tot = res["superedges"].agg(F.sum("multiplicity")).collect()[0][0]
    assert tot == 20


def test_detect_peaks_rising_plateau_not_peak(spark):
    # [1, 5, 5, 9, 1]: the 5-plateau is followed by a rise to 9, so the
    # only peak is 9 (run-based flanking comparison, not sample-based)
    vals = [1.0, 5.0, 5.0, 9.0, 1.0]
    df = spark.createDataFrame(
        [("a", _ts(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, value double",
    )
    pk = detect_peaks(df, k_sigma=0.0).collect()
    assert [r.value for r in pk] == [9.0]


def test_peel_loops_empty_input_returns_empty_not_crash(spark):
    from spartan2_spark.operators.anomaly import holoscope_greedy_shave
    from spartan2_spark.operators.flow import flow_greedy_peel
    from spartan2_spark.operators.spectral import power_iteration

    none = spark.createDataFrame([], "k string, s long").filter("s > 0")
    r = flow_greedy_peel(none.selectExpr("k as mid", "s as iscore"))
    assert r["nodes"].count() == 0 and r["round"] == -1

    none_c = spark.createDataFrame([], "k string, c long").filter("c > 0")
    r2 = holoscope_greedy_shave(none_c.selectExpr("k as user_id", "c as credit"))
    assert r2["nodes"].count() == 0 and r2["round"] == -1

    no_edges = spark.createDataFrame([], "src long, dst long").filter("src > 0")
    tri = power_iteration(no_edges)
    assert tri["sigma1"] == 0.0
    assert tri["u"].count() == 0 and tri["v"].count() == 0


def test_flowscope_peel_recovers_planted_chain_block(spark):
    """FlowScope chain peel: a planted balanced A*->M*->C* block (high
    per-middle flow, zero imbalance) must survive the joint peel while
    imbalanced background mids are shaved (flowscopeFraudDect.py
    fastGreedyDecreasing recovers the densest balanced chain)."""
    from spartan2_spark.operators.flow import flowscope_peel

    am_rows, mc_rows = [], []
    # background: 60 mids, each receives from one A but sends NOTHING
    # on (pure imbalance -> heavily negative priority)
    for m in range(60):
        am_rows.append((1000 + (m % 7), m, 50 + m))
    # a second background family: mids that only send
    for m in range(60, 100):
        mc_rows.append((m, 2000 + (m % 5), 40 + m))
    # planted block: A* = {1..3}, M* = {500..504}, C* = {9000, 9001};
    # every planted mid moves 3000 in and exactly 3000 out
    for m in range(500, 505):
        for a in (1, 2, 3):
            am_rows.append((a, m, 1000))
        mc_rows.append((m, 9000, 1500))
        mc_rows.append((m, 9001, 1500))
    am = spark.createDataFrame(am_rows, "a long, mid long, value long")
    mc = spark.createDataFrame(mc_rows, "mid long, c long, value long")

    res = flowscope_peel(am, mc, alpha=4, max_rounds=8)
    nodes = {(r.side, r.node) for r in res["nodes"].collect()}
    # every planted node survives in the best block
    for m in range(500, 505):
        assert ("M", m) in nodes
    for a in (1, 2, 3):
        assert ("A", a) in nodes
    assert ("C", 9000) in nodes and ("C", 9001) in nodes
    # no imbalanced background mid survives
    assert not any(s == "M" and n < 500 for s, n in nodes)
    assert res["objective"] > 0


def test_cubeflow_plus_splits_hub_and_scores(spark):
    """Planted structure: two clean A->M->C blocks bridged by one hub
    middle with edges into both. With max_node_limit=2 the hub (max
    degree) is removed, the graph splits into the two blocks (plus the
    hub's isolated counterparties as singletons), and each block's fs
    score is (0.2*f - 0.8*q)/s computed from its own middles."""
    from spartan2_spark.operators.flow import cubeflow_plus

    am_rows, mc_rows = [], []
    # block 1: a=1,2 -> m=10,11 -> c=20 ; balanced flows of 100 per m
    for m in (10, 11):
        am_rows += [(1, m, 60), (2, m, 40)]
        mc_rows += [(m, 20, 100)]
    # block 2: a=3 -> m=12,13 -> c=21 ; in 80, out 50 per m
    for m in (12, 13):
        am_rows += [(3, m, 80)]
        mc_rows += [(m, 21, 50)]
    # hub m=14 connects to BOTH c=20 and c=21 (bridges the blocks) and
    # has the highest degree (4 edges)
    am_rows += [(4, 14, 10), (5, 14, 10)]
    mc_rows += [(14, 20, 5), (14, 21, 5)]
    am = spark.createDataFrame(am_rows, "a long, mid long, value long")
    mc = spark.createDataFrame(mc_rows, "mid long, c long, value long")
    blk = spark.createDataFrame([(m,) for m in (10, 11, 12, 13, 14)], "mid long")

    out = cubeflow_plus(am, mc, blk, max_node_limit=2, max_split_rounds=10)
    rows = {r["component"]: r for r in out.collect()}
    # block 1: nodes a{1,2} m{10,11} c{20} -> component label min node = 1*3=3
    b1 = rows[3]
    assert (b1["n_a"], b1["n_m"], b1["n_c"]) == (2, 2, 1)
    assert b1["f"] == 200 and b1["imbalance"] == 0
    assert abs(b1["score"] - (0.2 * 200) / 5) < 1e-9
    # block 2: a{3} m{12,13} c{21} -> label 3*3=9
    b2 = rows[9]
    assert (b2["n_a"], b2["n_m"], b2["n_c"]) == (1, 2, 1)
    assert b2["f"] == 100 and b2["imbalance"] == 60
    assert abs(b2["score"] - (0.2 * 100 - 0.8 * 60) / 4) < 1e-9
    # hub removed; its counterparties a=4,5 are singletons
    assert 14 * 3 + 1 not in rows
    assert rows[4 * 3]["n_a"] == 1 and rows[5 * 3]["n_a"] == 1
    # without the limit, everything is one component (hub bridges)
    whole = cubeflow_plus(am, mc, blk, max_node_limit=10).collect()
    assert len(whole) == 1 and whole[0]["n_m"] == 5
