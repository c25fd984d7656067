"""Hamilton QRS detector (RPeak fidelity path) and the linear-AE
(PCA-subspace) BeatGAN reconstructor: numpy kernels + Spark wrappers."""

from __future__ import annotations

import datetime as dt

import numpy as np

from spartan2_spark.functions.hamilton import hamilton_detect
from spartan2_spark.models.beatgan import (
    beatgan_subspace_scores,
    subspace_window_scores,
)
from spartan2_spark.operators.peaks import hamilton_rpeaks

FS = 360.0


def _ecg(dur=20.0, rr=1.0, amp=None, twave=0.35):
    """Deterministic synthetic ECG: Gaussian QRS (10 ms sigma) + T-wave
    bump at +300 ms + baseline wander + 50 Hz ripple."""
    n = int(FS * dur)
    i = np.arange(n)
    t = i / FS
    x = 0.1 * np.sin(2 * np.pi * 0.3 * t) + 0.02 * np.sin(2 * np.pi * 50 * t)
    r = []
    for k in range(1, int(dur / rr) - 1):
        c = int(k * rr * FS)
        r.append(c)
        a = amp(k) if amp else 1.0
        x = x + a * np.exp(-0.5 * ((i - c) / (0.01 * FS)) ** 2)
        x = x + a * twave * np.exp(-0.5 * ((i - c - 0.30 * FS) / (0.05 * FS)) ** 2)
    return x, np.asarray(r)


def test_hamilton_exact_recovery_and_twave_rejection():
    x, r = _ecg()
    det = hamilton_detect(x, FS)
    assert len(det) == len(r)
    # every detection lands exactly on a planted R sample (T-waves at
    # 35% amplitude 300 ms after each beat are all rejected)
    assert np.abs(det[:, None] - r[None, :]).min(axis=1).max() <= 1


def test_hamilton_searchback_recovers_attenuated_beat():
    x, r = _ecg(amp=lambda k: 0.35 if k == 10 else 1.0)
    det = hamilton_detect(x, FS)
    assert len(det) == len(r)
    assert np.abs(det - r[9]).min() <= 1


def test_hamilton_degenerate_inputs():
    assert len(hamilton_detect(np.array([]), FS)) == 0
    assert len(hamilton_detect(np.zeros(10), FS)) == 0
    assert len(hamilton_detect(np.zeros(int(5 * FS)), FS)) == 0  # flatline


def test_hamilton_rpeaks_spark_wrapper(spark):
    x, r = _ecg(dur=10.0)
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(milliseconds=round(1000 * i / FS)), float(v))
        for i, v in enumerate(x)
    ]
    # second key: same wave shifted in amplitude, same R positions
    rows += [("b", t, 2.0 * v) for (_, t, v) in rows]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = hamilton_rpeaks(df, fs=FS, left=120, right=136).collect()
    got = {k: sorted(o.r_idx for o in out if o.key == k) for k in ("a", "b")}
    want = [int(i) for i in r if i - 120 >= 0 and i + 136 < len(x)]
    assert got["a"] == want
    assert got["b"] == want
    by_idx = {(o.key, o.r_idx): o for o in out}
    o = by_idx[("a", want[0])]
    assert o.seg_start_idx == want[0] - 120
    assert o.seg_end_idx == want[0] + 136
    assert abs(o.r_value - x[want[0]]) < 1e-12


def test_subspace_scores_planted_anomaly_and_full_rank():
    n, w, s = 512, 64, 32
    i = np.arange(n)
    x = np.sin(2 * np.pi * i / 64) + 0.3 * np.sin(2 * np.pi * i / 16)
    x[200:210] += 3.0
    starts, errs = subspace_window_scores(x, w, s, rank=2)
    # the two windows covering the planted corruption dominate
    top2 = set(starts[np.argsort(-errs)[:2]].tolist())
    assert top2 == {160, 192}
    # an over-parameterized rank request is capped strictly below the
    # numerical rank, so memorizing the training windows (all-zero
    # errors) is impossible and the anomaly stays visible
    _, e2 = subspace_window_scores(x, w, s, rank=len(starts))
    assert float(e2.max()) > 0
    assert int(np.argmax(e2)) in (5, 6)  # windows covering the spike


def test_beatgan_subspace_spark_wrapper(spark):
    n = 256
    i = np.arange(n)
    x = np.sin(2 * np.pi * i / 32)
    x[100:106] += 2.0
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k", base + dt.timedelta(seconds=int(j)), float(v))
        for j, v in enumerate(x)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = beatgan_subspace_scores(
        df, window=32, stride=16, rank=1
    ).collect()
    assert len(out) == (n - 32) // 16 + 1
    top = max(out, key=lambda o: o.err)
    assert top.win_start_idx in (80, 96)
    assert top.win_start_ts == base + dt.timedelta(seconds=int(top.win_start_idx))


def test_hamilton_deterministic_and_dtype_stable():
    x, _ = _ecg(dur=8.0)
    a = hamilton_detect(x, FS)
    b = hamilton_detect(x.astype(np.float32).astype(np.float64), FS)
    c = hamilton_detect(x, FS)
    assert np.array_equal(a, c)
    # float32 round-trip perturbs values by <1e-7 rel; detections stay put
    assert np.array_equal(a, b)


def test_hamilton_amplitude_invariance():
    # threshold chain is ratio-based: scaling the signal must not
    # change the detected sample set
    x, _ = _ecg(dur=8.0)
    a = hamilton_detect(x, FS)
    b = hamilton_detect(1000.0 * x, FS)
    assert np.array_equal(a, b)


def test_subspace_rank_monotone_and_nonnegative():
    i = np.arange(300)
    x = np.sin(2 * np.pi * i / 50) + 0.1 * np.cos(2 * np.pi * i / 7)
    prev = None
    for r in (0, 1, 2, 4, 8):
        _, errs = subspace_window_scores(x, 32, 16, r)
        assert (errs >= -1e-15).all()
        tot = float(errs.sum())
        if prev is not None:
            # larger subspace reconstructs at least as well in total
            assert tot <= prev + 1e-12
        prev = tot


def test_subspace_short_series_can_still_score_anomalies():
    """A short series must not collapse every error to zero: the fitted
    rank is capped strictly below the window matrix's numerical rank,
    so a window off the retained directions scores > 0."""
    import numpy as np

    from spartan2_spark.models.beatgan import subspace_window_scores

    # windows [A, B, A, C]: numerical rank 2; requested rank 4 would
    # span everything (all-zero errors). Capped to 1, the dominant A-B
    # direction is kept and C's off-subspace spike must score highest.
    t = np.linspace(0, 2 * np.pi, 16)
    A = 10.0 * np.sin(t)
    B = -10.0 * np.sin(t)
    C = A.copy()
    C[8] += 5.0
    x = np.concatenate([A, B, A, C])
    starts, errs = subspace_window_scores(x, window=16, stride=16, rank=4)
    assert len(errs) == 4
    assert errs.max() > 0
    assert int(np.argmax(errs)) == 3

    # identical windows stay all-zero (nothing is anomalous)
    x0 = np.tile(A, 4)
    _, errs0 = subspace_window_scores(x0, window=16, stride=16, rank=4)
    assert np.allclose(errs0, 0.0)

    # normal regime (n_windows >> rank): cap inactive, scores unchanged
    rng_x = np.sin(np.linspace(0, 40 * np.pi, 16 * 40)) * np.linspace(1, 3, 640)
    s_full, e_full = subspace_window_scores(rng_x, 16, 8, 2)
    assert (e_full > 0).any()


def test_mlp_ae_trains_and_recovers_planted_anomaly():
    """The trained nonlinear reconstructor: (1) training reduces
    reconstruction error vs the untrained net, (2) a planted anomalous
    window scores highest, (3) fixed seed + full batch -> bit-identical
    re-runs."""
    from spartan2_spark.models.beatgan import mlp_ae_window_scores

    rng = np.random.default_rng(0)
    t = np.arange(512)
    x = np.sin(2 * np.pi * t / 16) + 0.05 * rng.standard_normal(512)
    x[256:272] += 4.0 * np.sign(np.sin(2 * np.pi * t[256:272] / 3))  # planted

    starts, errs0 = mlp_ae_window_scores(x, 16, 16, hidden=3, epochs=0)
    starts2, errs = mlp_ae_window_scores(x, 16, 16, hidden=3, epochs=300)
    assert (starts == starts2).all()
    normal = np.ones(len(starts), bool)
    normal[np.flatnonzero(starts == 256)] = False
    # training reduces error on normal windows by a large factor
    assert errs[normal].mean() < 0.2 * errs0[normal].mean()
    # the planted window is the top anomaly after training
    assert starts[np.argmax(errs)] == 256
    # determinism: bit-identical replay
    _, errs_again = mlp_ae_window_scores(x, 16, 16, hidden=3, epochs=300)
    assert (errs == errs_again).all()


def test_beatgan_ae_spark_wrapper(spark):
    from spartan2_spark.models.beatgan import beatgan_ae_scores, mlp_ae_window_scores

    rows = []
    rng = np.random.default_rng(1)
    for key in ("a", "b"):
        x = np.sin(np.arange(128) / 5.0) + 0.01 * rng.standard_normal(128)
        if key == "b":
            x[64:72] += 5.0
        for i, v in enumerate(x):
            rows.append((key, i, float(v)))
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = beatgan_ae_scores(
        df, key="key", ts="ts", val="value", window=16, stride=8, hidden=4, epochs=100
    ).toPandas()
    b = out[out.key == "b"].set_index("win_start_idx")["err"]
    assert b.idxmax() in (56, 64)  # the window(s) covering the plant
    # Spark path == local kernel path exactly (same input order)
    x = np.array([r[2] for r in rows if r[0] == "a"])
    _, errs = mlp_ae_window_scores(x, 16, 8, hidden=4, epochs=100)
    a = out[out.key == "a"].sort_values("win_start_idx")["err"].to_numpy()
    assert np.array_equal(a, errs)


def test_adversarial_ae_planted_anomaly_and_determinism():
    """Full BeatGAN objective (generator + discriminator with
    feature-matching): recovers a planted distorted window, scores are
    bit-deterministic, and differ from the non-adversarial AE (the
    discriminator term engages)."""
    from spartan2_spark.models.beatgan import (
        adversarial_ae_window_scores,
        mlp_ae_window_scores,
    )

    rng = np.random.default_rng(0)
    t = np.arange(1024)
    x = np.sin(2 * np.pi * t / 64) + 0.05 * rng.standard_normal(1024)
    x[512:576] = x[512:576][::-1] * 2.5 + 1.0
    s, e = adversarial_ae_window_scores(x, 64, 32)
    assert s[np.argmax(e)] == 512
    assert e.max() / np.median(e) > 3.0
    _s2, e2 = adversarial_ae_window_scores(x, 64, 32)
    assert np.array_equal(e, e2)
    _s3, e3 = mlp_ae_window_scores(x, 64, 32)
    assert not np.allclose(e, e3)
    # fm_lambda=0 with matching shapes degenerates toward plain AE
    # dynamics: still recovers the plant
    _s4, e4 = adversarial_ae_window_scores(x, 64, 32, fm_lambda=0.0)
    assert _s4[np.argmax(e4)] == 512


def test_adversarial_training_actually_trains():
    """The alternating loop LEARNS: reconstruction error after the
    adversarial training is far below the untrained (epochs~0) error,
    and the discriminator-regularized reconstructor still fits the
    normal regime."""
    from spartan2_spark.models.beatgan import adversarial_ae_window_scores

    rng = np.random.default_rng(1)
    t = np.arange(2048)
    x = np.sin(2 * np.pi * t / 32) + 0.02 * rng.standard_normal(2048)
    _s0, e0 = adversarial_ae_window_scores(x, 32, 16, epochs=1)
    _s1, e1 = adversarial_ae_window_scores(x, 32, 16, epochs=300)
    assert e1.mean() < e0.mean() / 20.0


def test_beatgan_gan_spark_wrapper(spark):
    import datetime as dt

    from spartan2_spark.models.beatgan import beatgan_gan_scores

    rows = []
    base = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(5)
    for u in ("a", "b"):
        for i in range(96):
            v = float(np.sin(i / 6.0) * 10 + rng.standard_normal() * 0.1)
            if u == "b" and 48 <= i < 64:
                v = v * 4 + 30
            rows.append((u, base + dt.timedelta(minutes=i), i, v))
    df = spark.createDataFrame(rows, "key string, ts timestamp, eid long, value double")
    out = beatgan_gan_scores(
        df, key="key", ts="ts", val="value", window=16, stride=8,
        hidden=4, d_hidden=4, epochs=80, tie="eid",
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    assert set(by_key) == {"a", "b"}
    worst_b = max(by_key["b"], key=lambda r: r.err)
    assert 40 <= worst_b.win_start_idx <= 64
