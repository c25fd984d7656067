from __future__ import annotations

import numpy as np
import pandas as pd

from spartan2_spark.models.beatlex import dtw_banded, summarize, summarize_series
from spartan2_spark.operators import graph as GR
from spartan2_spark.operators import windows as WD


# ---------------- DTW + BeatLex


def _dtw_naive(a, b):
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = (a[i - 1] - b[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
    return D[n, m]


def test_dtw_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.standard_normal(rng.integers(3, 30))
        b = rng.standard_normal(rng.integers(3, 30))
        assert abs(dtw_banded(a, b, band=250) - _dtw_naive(a, b)) < 1e-9


def test_dtw_identical_zero():
    a = np.sin(np.arange(50) / 3)
    assert dtw_banded(a, a) == 0.0


def test_summarize_periodic_series():
    # periodic signal: segments should reuse one vocab term cheaply
    t = np.arange(160)
    x = np.sin(2 * np.pi * t / 16)
    res = summarize_series(x, smin=14, smax=18, max_vocab=3)
    assert res["ends"][-1] == 160
    assert res["starts"][0] == 0
    # contiguous cover
    assert res["starts"][1:] == res["ends"][:-1]
    # periodic -> near-zero total error with a single vocab term
    assert len(res["models"]) == 1
    assert res["tot_err"] < 1e-6 * 160


def test_summarize_spark(spark):
    t = np.arange(96)
    pdf = pd.DataFrame(
        {
            "key": ["s1"] * 96,
            "ts": t.astype(float),
            "value": np.sin(2 * np.pi * t / 16),
        }
    )
    out = summarize(spark.createDataFrame(pdf), smin=14, smax=18).toPandas()
    assert out["seg_end"].max() == 96
    assert (out["tot_err"] < 1e-6).all()


# ---------------- windows (EigenPulse / MonLAD batch replay)


def test_window_spectral_density(spark):
    rng = np.random.default_rng(5)
    n = 600
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 600, n)), unit="s"
    )
    users = rng.integers(0, 30, n)
    items = rng.integers(0, 20, n)
    # inject a dense block in the 300-400s range
    inj = (ts.astype("int64") // 10**9) % 600
    pdf = pd.DataFrame({"ts": ts, "user": users, "item": items})
    dense = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
                rng.integers(300, 360, 300), unit="s"
            ),
            "user": rng.integers(0, 3, 300),
            "item": rng.integers(0, 3, 300),
        }
    )
    df = spark.createDataFrame(pd.concat([pdf, dense]))
    out = WD.window_spectral_density(
        df, "120 seconds", "60 seconds", "user", "item"
    ).toPandas()
    assert out["density"].notna().all()
    flagged = out[out["is_anomaly"]]
    # the injected dense block must dominate at least one window
    peak = out.sort_values("density").iloc[-1]
    assert pd.Timestamp("2024-01-01 00:04:00") <= peak["win_start"] <= pd.Timestamp(
        "2024-01-01 00:06:00"
    )


def test_coo_sketch_matches_dense():
    """The sparse COO sketch products must equal the dense ones
    bit-for-bit (same summation per output cell via bincount)."""
    from spartan2_spark.operators.windows import _COO, _qb_sketch_svd

    rng = np.random.default_rng(7)
    m, n, nnz = 40, 25, 200
    ri = rng.integers(0, m, nnz)
    ci = rng.integers(0, n, nnz)
    dense = np.zeros((m, n))
    np.add.at(dense, (ri, ci), 1.0)
    flat = ri * n + ci
    uniq, counts = np.unique(flat, return_counts=True)
    coo = _COO(uniq // n, uniq % n, counts.astype(float), (m, n))

    omega = rng.standard_normal((n, 5))
    assert np.allclose(coo @ omega, dense @ omega, atol=1e-12)
    q = rng.standard_normal((m, 5))
    assert np.allclose(coo.tmatmul(q), q.T @ dense, atol=1e-12)

    u_d, s_d, vt_d = _qb_sketch_svd(dense, 5, seed=42)
    u_s, s_s, vt_s = _qb_sketch_svd(coo, 5, seed=42)
    assert np.allclose(s_d, s_s, atol=1e-9)
    assert np.allclose(np.abs(u_d[:, 0]), np.abs(u_s[:, 0]), atol=1e-9)

    sel_r = np.abs(u_s[:, 0]) >= 1.0 / np.sqrt(m)
    sel_c = np.abs(vt_s[0]) >= 1.0 / np.sqrt(n)
    assert coo.subsum(sel_r, sel_c) == dense[np.ix_(sel_r, sel_c)].sum()


def test_coo_sketch_large_window_bounded_memory():
    """A 40k x 40k window (12.8 GB dense) sketches fine from 100k COO
    triplets — the kernel never allocates O(m*n)."""
    from spartan2_spark.operators.windows import _COO, _qb_sketch_svd

    rng = np.random.default_rng(3)
    m = n = 40_000
    nnz = 100_000
    ri = rng.integers(0, m, nnz).astype(np.int64)
    ci = rng.integers(0, n, nnz).astype(np.int64)
    flat = ri * n + ci
    uniq, counts = np.unique(flat, return_counts=True)
    coo = _COO(uniq // n, uniq % n, counts.astype(float), (m, n))
    u, s, vt = _qb_sketch_svd(coo, 10, seed=42)
    assert u.shape == (m, 10) and vt.shape[1] == n
    assert np.isfinite(s).all()


def test_zero_out_replay(spark):
    rows = []
    # account A: pump 200, drain to 0, twice -> 2 cycles
    for t, amt in enumerate([200, -200, 150, -150]):
        rows.append(("A", float(t), float(amt)))
    # account B: drifts up, never drains
    for t, amt in enumerate([50, 60, 70]):
        rows.append(("B", float(t), float(amt)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ts", "amount"]))
    out = {r["key"]: r for r in WD.zero_out_replay(df, delta_up=100, epsilon=1).collect()}
    assert out["A"]["n_zero_outs"] == 2
    assert out["B"]["n_zero_outs"] == 0
    assert out["B"]["max_balance"] == 180.0


# ---------------- graph ops


def test_graph_ops(spark):
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": [1, 1, 1, 2, 2, 3], "dst": [10, 10, 11, 10, 12, 13],
             "value": [1.0, 2.0, 1.0, 1.0, 1.0, 5.0]}
        )
    )
    adj = GR.adjacency(edges, value="value").toPandas()
    assert len(adj) == 5
    assert adj.set_index(["src", "dst"]).loc[(1, 10), "weight"] == 3.0

    deg = GR.degrees(edges, "src", distinct_to="dst").toPandas()
    assert deg.set_index("node").loc[1, "degree"] == 2

    hist = GR.degree_histogram(GR.degrees(edges, "src", distinct_to="dst")).toPandas()
    assert hist.set_index("degree").loc[2, "n_nodes"] == 2

    rows = spark.createDataFrame(pd.DataFrame({"n": [1, 2]}))
    cols = spark.createDataFrame(pd.DataFrame({"n": [10]}))
    sub = GR.subgraph(edges, rows, cols).toPandas()
    assert set(zip(sub.src, sub.dst)) == {(1, 10), (2, 10)}

    minus = GR.graph_minus(edges, edges.filter("src = 1")).toPandas()
    assert (minus.src != 1).all()

    enc, dim = GR.encode_ids(edges, "src")
    assert dim.count() == 3
    assert set(r["src"] for r in enc.select("src").distinct().collect()) == {0, 1, 2}


def test_assign_windows_overlap(spark):
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:25"])}
    )
    out = WD.assign_windows(
        spark.createDataFrame(pdf), "20 seconds", "10 seconds"
    ).toPandas()
    # each row lands in window/stride = 2 windows
    assert len(out) == 4
