"""BeatGAN-shape anomaly scoring with a *learned* reconstructor.

The reference (/root/reference/spartan/model/beatgan/BeatGAN_CNN.py,
BeatGAN_RNN.py — 906 LoC torch) trains an autoencoder-GAN on fixed
windows of a series and scores each window by its reconstruction error
|x - G(x)|. torch is absent from this container, so the learned
reconstructor here is the closed-form optimum of a *linear*
autoencoder: projection onto the top-``rank`` principal subspace of
the window matrix (Baldi & Hornik 1989 — a linear AE trained to the
global MSE optimum spans the PCA subspace). That keeps the reference's
task shape exactly — fit a reconstruction model on a series' windows,
score each window by reconstruction MSE — while being deterministic
and dependency-free. A torch generator can replace ``_subspace_scores``
behind the same per-series kernel contract.

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

__all__ = ["subspace_window_scores", "beatgan_subspace_scores"]


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
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    v = vt[: max(rank, 0)]
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
    order = [ts] + ([tie] if tie else [])
    key_t = dict(df.dtypes)[key]
    ts_t = dict(df.dtypes)[ts]
    schema = (
        f"{key} {key_t}, win_start_idx long, win_start_ts {ts_t}, err double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        x = pdf[val].to_numpy(dtype="float64")
        starts, errs = subspace_window_scores(x, window, stride, rank)
        return pd.DataFrame(
            {
                key: pdf[key].iloc[:1].repeat(len(starts)).reset_index(
                    drop=True
                ),
                "win_start_idx": starts,
                "win_start_ts": pdf[ts].iloc[starts].reset_index(drop=True),
                "err": errs,
            }
        )

    return (
        df.select(key, ts, val, *([tie] if tie else []))
        .groupBy(key)
        .applyInPandas(kernel, schema)
    )
