"""BeatGAN-shape anomaly scoring with a *learned* reconstructor.

The reference (/root/reference/spartan/model/beatgan/BeatGAN_CNN.py,
BeatGAN_RNN.py — 906 LoC torch) trains an autoencoder-GAN on fixed
windows of a series and scores each window by its reconstruction error
|x - G(x)|. torch is absent from this container, so two reconstructor
families are provided behind the same per-series kernel contract:

* ``subspace`` — the closed-form optimum of a *linear* autoencoder:
  projection onto the top-``rank`` principal subspace of the window
  matrix (Baldi & Hornik 1989 — a linear AE trained to the global MSE
  optimum spans the PCA subspace). Deterministic, no training loop.
* ``mlp`` — a genuinely LEARNED nonlinear autoencoder: a 2-layer
  tanh-bottleneck MLP trained by full-batch Adam in plain numpy
  (fixed-seed init, no shuffling -> bit-deterministic runs).
* ``gan`` (r5) — the FULL BeatGAN objective: the same AE generator
  trained adversarially against a tanh-feature discriminator with the
  paper's feature-matching loss, alternating full-batch Adam steps —
  closing the last reference-surface gap (the r4 "discriminator out of
  scope" note) without torch. Scores remain |x - G(x)|^2, exactly the
  paper's inference rule.

A torch generator can still replace any scorer behind the same
kernel seam.

Scale: one grouped-pandas kernel per series; the window matrix is
(n_windows x window), SVD cost O(n_windows * window^2) — linear in
series length for fixed window size, and the parallel unit is the
series (same contract as the reference, which holds a full series in
torch tensors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "subspace_window_scores",
    "beatgan_subspace_scores",
    "mlp_ae_window_scores",
    "beatgan_ae_scores",
    "adversarial_ae_window_scores",
    "beatgan_gan_scores",
]


def subspace_window_scores(
    x: np.ndarray, window: int, stride: int, rank: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-window reconstruction MSE against the top-``rank`` principal
    subspace of the series' own windows. Returns (starts, errs)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < window:
        return np.empty(0, dtype=np.int64), np.empty(0)
    starts = np.arange(0, len(x) - window + 1, stride, dtype=np.int64)
    X = np.stack([x[s : s + window] for s in starts])
    mu = X.mean(axis=0)
    Xc = X - mu
    # economy SVD; V V^T is sign-invariant, so the scores are
    # deterministic even though singular-vector signs are not
    _, s, vt = np.linalg.svd(Xc, full_matrices=False)
    # a subspace spanning the centered matrix's FULL numerical rank
    # reconstructs every window exactly and all errors degenerate to 0
    # — short series (few windows, or few distinct window shapes) could
    # then never score an anomaly. Cap the fitted rank strictly below
    # the numerical rank so the weakest observed direction always stays
    # in the residual; with the usual n_windows >> rank regime the cap
    # is inactive and scores are unchanged.
    num_rank = int((s > max(s[0], 0.0) * 1e-10).sum()) if len(s) else 0
    eff_rank = min(max(rank, 0), max(num_rank - 1, 0))
    v = vt[:eff_rank]
    resid = Xc - Xc @ v.T @ v
    errs = (resid**2).mean(axis=1)
    return starts, errs


def beatgan_subspace_scores(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "value",
    window: int = 64,
    stride: int = 32,
    rank: int = 4,
    tie: str | None = None,
) -> DataFrame:
    """Window anomaly scores per series: sort each series by time, cut
    fixed windows (``window`` samples every ``stride``), fit the
    rank-``rank`` principal subspace of that series' windows, and emit
    each window's reconstruction MSE.

    Returns (key, win_start_idx, win_start_ts, err).
    """
    return _windowed_scores(
        df,
        key,
        ts,
        val,
        tie,
        lambda arr: subspace_window_scores(arr, window, stride, rank),
    )


def _windowed_scores(df, key, ts, val, tie, score_fn) -> DataFrame:
    """Shared per-series window-scoring plumbing: sort, cut groups, run
    ``score_fn(series) -> (starts, errs)``, emit one row per window.

    Thousands of short per-user series: whole-batch grouped apply
    (operators/grouped.py). Spark's sortWithinPartitions supplies the
    (key, ts, tie) order, so the kernel does zero pandas sorting —
    groups are cut with one numpy change-point scan and only the scorer
    runs per series. Profiled at sf0.1: per-group pandas sort_values
    on a string tie column alone cost ~1 ms/group vs 0.08 ms of SVD.
    """
    order = [ts] + ([tie] if tie else [])
    key_t = dict(df.dtypes)[key]
    ts_t = dict(df.dtypes)[ts]
    schema = (
        f"{key} {key_t}, win_start_idx long, win_start_ts {ts_t}, err double"
    )

    def batch_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].to_numpy()
        tv = pdf[ts].to_numpy()
        x = pdf[val].to_numpy(dtype="float64")
        change = np.flatnonzero(kv[1:] != kv[:-1]) + 1
        bounds = np.concatenate(([0], change, [len(kv)]))
        key_parts, idx_parts, ts_parts, err_parts = [], [], [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            starts, errs = score_fn(x[a:b])
            if not len(starts):
                continue
            key_parts.append(np.repeat(kv[a], len(starts)))
            idx_parts.append(starts)
            ts_parts.append(tv[a:b][starts])
            err_parts.append(errs)
        if not key_parts:
            return pd.DataFrame(
                {key: [], "win_start_idx": [], "win_start_ts": [], "err": []}
            )
        return pd.DataFrame(
            {
                key: np.concatenate(key_parts),
                "win_start_idx": np.concatenate(idx_parts),
                "win_start_ts": np.concatenate(ts_parts),
                "err": np.concatenate(err_parts),
            }
        )

    from spartan2_spark.operators.grouped import batched_group_apply

    return batched_group_apply(
        df.select(key, ts, val, *([tie] if tie else [])),
        [key],
        batch_kernel,
        schema,
        order=order,
        whole_batch=True,
    )

def mlp_ae_window_scores(
    x: np.ndarray,
    window: int,
    stride: int,
    hidden: int = 8,
    epochs: int = 200,
    lr: float = 0.01,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-window reconstruction MSE from a TRAINED nonlinear
    autoencoder: X -> tanh(X W1 + b1) W2 + b2, full-batch Adam on MSE.

    Deterministic by construction: fixed-seed Gaussian init, full-batch
    gradients (no shuffling), fixed epoch count. Windows are
    standardized by the series' own mean/std for conditioning; scores
    are reported in the standardized space (monotonic in the original
    space for a fixed series). Returns (starts, errs).
    """
    x = np.asarray(x, dtype=np.float64)
    if len(x) < window:
        return np.empty(0, dtype=np.int64), np.empty(0)
    starts = np.arange(0, len(x) - window + 1, stride, dtype=np.int64)
    X = np.stack([x[s : s + window] for s in starts])
    mu, sd = X.mean(), X.std()
    Xs = (X - mu) / (sd if sd > 0 else 1.0)
    n, w = Xs.shape

    rng = np.random.default_rng(seed)
    w1 = rng.normal(0.0, 1.0 / np.sqrt(w), (w, hidden))
    b1 = np.zeros(hidden)
    w2 = rng.normal(0.0, 1.0 / np.sqrt(hidden), (hidden, w))
    b2 = np.zeros(w)
    params = [w1, b1, w2, b2]
    m_t = [np.zeros_like(p) for p in params]
    v_t = [np.zeros_like(p) for p in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8

    for t in range(1, epochs + 1):
        h_pre = Xs @ params[0] + params[1]
        h = np.tanh(h_pre)
        out = h @ params[2] + params[3]
        err = out - Xs
        # d(mean over n*w of err^2) / d out
        g_out = 2.0 * err / (n * w)
        g_w2 = h.T @ g_out
        g_b2 = g_out.sum(axis=0)
        g_h = g_out @ params[2].T * (1.0 - h * h)
        g_w1 = Xs.T @ g_h
        g_b1 = g_h.sum(axis=0)
        for i, g in enumerate((g_w1, g_b1, g_w2, g_b2)):
            m_t[i] = beta1 * m_t[i] + (1 - beta1) * g
            v_t[i] = beta2 * v_t[i] + (1 - beta2) * g * g
            mhat = m_t[i] / (1 - beta1**t)
            vhat = v_t[i] / (1 - beta2**t)
            params[i] = params[i] - lr * mhat / (np.sqrt(vhat) + eps)

    h = np.tanh(Xs @ params[0] + params[1])
    recon = h @ params[2] + params[3]
    errs = ((recon - Xs) ** 2).mean(axis=1)
    return starts, errs


def beatgan_ae_scores(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "value",
    window: int = 64,
    stride: int = 32,
    hidden: int = 8,
    epochs: int = 200,
    tie: str | None = None,
) -> DataFrame:
    """beatgan_subspace_scores with the TRAINED nonlinear reconstructor
    (``mlp_ae_window_scores``): one fixed-seed Adam-trained tanh
    autoencoder per series, windows scored by reconstruction MSE.
    Returns (key, win_start_idx, win_start_ts, err)."""
    return _windowed_scores(
        df,
        key,
        ts,
        val,
        tie,
        lambda arr: mlp_ae_window_scores(
            arr, window, stride, hidden=hidden, epochs=epochs
        ),
    )



def adversarial_ae_window_scores(
    x: np.ndarray,
    window: int,
    stride: int,
    hidden: int = 8,
    d_hidden: int = 8,
    epochs: int = 200,
    lr: float = 0.01,
    fm_lambda: float = 0.1,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """The FULL BeatGAN training objective (Zhou et al., IJCAI 2019;
    reference /root/reference/spartan/model/beatgan/BeatGAN_CNN.py —
    906 LoC torch), in plain numpy: an autoencoder generator trained
    against an adversarial discriminator with the paper's
    feature-matching loss.

    * generator G: the same 2-layer tanh-bottleneck AE as
      :func:`mlp_ae_window_scores`;
    * discriminator D: windows -> tanh feature layer f(.) -> sigmoid
      real/fake logit;
    * D step (ascent): full-batch BCE on D(x) vs D(G(x));
    * G step (descent): ``|x - G(x)|^2 + fm_lambda * |f(x) - f(G(x))|^2``
      — the paper's pairwise feature-matching regularizer (its eq. for
      L_G replaces the raw adversarial term with the distance between
      discriminator features of real and reconstructed windows);
    * anomaly score: per-window reconstruction error |x - G(x)|^2,
      exactly the paper's inference rule — the discriminator shapes
      training, not the score.

    Deterministic by construction: fixed-seed init, full-batch
    alternating Adam steps, fixed epoch count — bit-identical scores on
    every run and engine. Returns (starts, errs).
    """
    x = np.asarray(x, dtype=np.float64)
    if len(x) < window:
        return np.empty(0, dtype=np.int64), np.empty(0)
    starts = np.arange(0, len(x) - window + 1, stride, dtype=np.int64)
    X = np.stack([x[s : s + window] for s in starts])
    mu, sd = X.mean(), X.std()
    Xs = (X - mu) / (sd if sd > 0 else 1.0)
    n, w = Xs.shape

    rng = np.random.default_rng(seed)
    # generator
    g = [
        rng.normal(0.0, 1.0 / np.sqrt(w), (w, hidden)),
        np.zeros(hidden),
        rng.normal(0.0, 1.0 / np.sqrt(hidden), (hidden, w)),
        np.zeros(w),
    ]
    # discriminator: feature layer + scalar logit
    d = [
        rng.normal(0.0, 1.0 / np.sqrt(w), (w, d_hidden)),
        np.zeros(d_hidden),
        rng.normal(0.0, 1.0 / np.sqrt(d_hidden), (d_hidden, 1)),
        np.zeros(1),
    ]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    gm = [np.zeros_like(p) for p in g]
    gv = [np.zeros_like(p) for p in g]
    dm = [np.zeros_like(p) for p in d]
    dv = [np.zeros_like(p) for p in d]

    def _adam(params, grads, ms, vs, t):
        for i, gr in enumerate(grads):
            ms[i] = beta1 * ms[i] + (1 - beta1) * gr
            vs[i] = beta2 * vs[i] + (1 - beta2) * gr * gr
            mhat = ms[i] / (1 - beta1**t)
            vhat = vs[i] / (1 - beta2**t)
            params[i] = params[i] - lr * mhat / (np.sqrt(vhat) + eps)

    def _gen(params):
        h = np.tanh(Xs @ params[0] + params[1])
        return h, h @ params[2] + params[3]

    def _disc(z, params):
        f = np.tanh(z @ params[0] + params[1])
        logit = f @ params[2] + params[3]
        p = 1.0 / (1.0 + np.exp(-logit))
        return f, p

    for t in range(1, epochs + 1):
        # ---- D step: BCE real-vs-fake on the CURRENT generator
        _h, fake = _gen(g)
        for z, label in ((Xs, 1.0), (fake, 0.0)):
            f = np.tanh(z @ d[0] + d[1])
            logit = f @ d[2] + d[3]
            p = 1.0 / (1.0 + np.exp(-logit))
            # d BCE / d logit = (p - label) / n
            g_logit = (p - label) / n
            g_d2 = f.T @ g_logit
            g_d3 = g_logit.sum(axis=0)
            g_f = g_logit @ d[2].T * (1.0 - f * f)
            g_d0 = z.T @ g_f
            g_d1 = g_f.sum(axis=0)
            _adam(d, (g_d0, g_d1, g_d2, g_d3), dm, dv, t)
        # ---- G step: reconstruction + feature matching through FROZEN D
        h, out = _gen(g)
        err = out - Xs
        f_real = np.tanh(Xs @ d[0] + d[1])
        f_fake = np.tanh(out @ d[0] + d[1])
        fdiff = f_fake - f_real
        # d/d out of [mean err^2 + lam * mean fdiff^2]
        g_out = 2.0 * err / (n * w) + fm_lambda * (
            (2.0 * fdiff / (n * d_hidden) * (1.0 - f_fake * f_fake)) @ d[0].T
        )
        g_w2 = h.T @ g_out
        g_b2 = g_out.sum(axis=0)
        g_h = g_out @ g[2].T * (1.0 - h * h)
        g_w1 = Xs.T @ g_h
        g_b1 = g_h.sum(axis=0)
        _adam(g, (g_w1, g_b1, g_w2, g_b2), gm, gv, t)

    _h, recon = _gen(g)
    errs = ((recon - Xs) ** 2).mean(axis=1)
    return starts, errs


def beatgan_gan_scores(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "value",
    window: int = 64,
    stride: int = 32,
    hidden: int = 8,
    d_hidden: int = 8,
    epochs: int = 200,
    fm_lambda: float = 0.1,
    tie: str | None = None,
) -> DataFrame:
    """:func:`beatgan_ae_scores` with the FULL adversarial objective
    (:func:`adversarial_ae_window_scores`): per series, one fixed-seed
    AE-generator + discriminator pair trained by alternating full-batch
    Adam with the paper's feature-matching loss; windows scored by
    reconstruction MSE. Returns (key, win_start_idx, win_start_ts, err).
    """
    return _windowed_scores(
        df,
        key,
        ts,
        val,
        tie,
        lambda arr: adversarial_ae_window_scores(
            arr, window, stride, hidden=hidden, d_hidden=d_hidden,
            epochs=epochs, fm_lambda=fm_lambda,
        ),
    )
