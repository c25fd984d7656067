"""Matrix profile (STOMP) kernel — numpy only.

Implements the z-normalized Euclidean matrix profile with the STOMP
dot-product recurrence (Zhu et al., "Matrix Profile II: Exploiting a
Novel Algorithm and GPUs to Break the One Hundred Million Barrier for
Time Series Motifs and Joins", ICDM 2016 — published algorithm, written
from the paper; no reference-repo analogue). The matrix profile is the
assumption-free anomaly/motif primitive: P[i] is the distance from
subsequence i to its nearest non-trivial neighbor, so the profile's
maxima are DISCORDS (anomalies) and its minima are MOTIFS.

Cost is O(n^2) per series with O(n) memory — intended for
retention-bounded per-key series (a tier's serving window), not raw
corpora; the Spark wrapper runs one series per group.
"""

from __future__ import annotations

import numpy as np

__all__ = ["stomp_profile", "top_discords", "top_motifs"]

_EPS = 1e-12


def _sliding_stats(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Sliding mean/std (population) of every length-m window, O(n)."""
    c = np.concatenate(([0.0], np.cumsum(x)))
    c2 = np.concatenate(([0.0], np.cumsum(x * x)))
    s = c[m:] - c[:-m]
    s2 = c2[m:] - c2[:-m]
    mu = s / m
    var = np.maximum(s2 / m - mu * mu, 0.0)
    return mu, np.sqrt(var)


def stomp_profile(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile of ``x`` with window ``m``.

    Returns ``(profile, index)``: for each of the ``n - m + 1``
    subsequences, the z-normalized Euclidean distance to its nearest
    neighbor outside the trivial-match exclusion zone (|i-j| < m//2)
    and that neighbor's index. Zero-variance (constant) windows match
    other constant windows at distance 0 and are otherwise assigned
    the maximal distance 2*sqrt(m) against non-constant windows — the
    standard convention that keeps flat stretches from pairing with
    everything.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    l = n - m + 1
    if l < 2:
        return np.full(max(l, 0), np.inf), np.full(max(l, 0), -1, np.int64)
    mu, sig = _sliding_stats(x, m)
    flat = sig < _EPS
    excl = max(m // 2, 1)

    # first row of the dot-product matrix: QT[j] = x[0:m] . x[j:j+m]
    qt = np.array(
        [np.dot(x[:m], x[j : j + m]) for j in range(l)], dtype=np.float64
    )
    qt_first = qt.copy()

    prof = np.full(l, np.inf)
    idx = np.full(l, -1, dtype=np.int64)
    big = 2.0 * np.sqrt(m)  # max possible z-normalized distance

    for i in range(l):
        if i > 0:
            qt[1:] = (
                qt_prev[:-1]
                - x[i - 1] * x[: l - 1]
                + x[i + m - 1] * x[m : m + l - 1]
            )
            qt[0] = qt_first[i]
        qt_prev = qt.copy()

        with np.errstate(invalid="ignore", divide="ignore"):
            denom = m * sig[i] * sig
            corr = (qt - m * mu[i] * mu) / denom
        d = np.sqrt(np.maximum(2.0 * m * (1.0 - corr), 0.0))
        # zero-variance conventions
        if flat[i]:
            d = np.where(flat, 0.0, big)
        else:
            d = np.where(flat, big, d)
        lo, hi = max(0, i - excl + 1), min(l, i + excl)
        d[lo:hi] = np.inf
        j = int(np.argmin(d))
        prof[i] = d[j]
        idx[i] = j
    return prof, idx


def top_discords(
    x: np.ndarray, m: int, k: int = 3
) -> list[tuple[int, int, float]]:
    """Top-k discords of ``x``: the k subsequences with the LARGEST
    nearest-neighbor distance, greedily selected with an m//2
    exclusion zone between picks so one anomaly isn't reported k
    times. Returns [(idx, nn_idx, dist)] in decreasing dist order.
    """
    prof, idx = stomp_profile(x, m)
    l = len(prof)
    excl = max(m // 2, 1)
    p = prof.copy()
    p[~np.isfinite(p)] = -np.inf
    out: list[tuple[int, int, float]] = []
    for _ in range(min(k, l)):
        i = int(np.argmax(p))
        if not np.isfinite(p[i]) or p[i] < 0:
            break
        out.append((i, int(idx[i]), float(prof[i])))
        lo, hi = max(0, i - excl + 1), min(l, i + excl)
        p[lo:hi] = -np.inf
    return out


def top_motifs(
    x: np.ndarray, m: int, k: int = 3
) -> list[tuple[int, int, float]]:
    """Top-k motif pairs of ``x``: the k subsequence pairs with the
    SMALLEST nearest-neighbor distance, greedily selected with an
    m//2 exclusion zone around both members of each pick. Returns
    [(idx, nn_idx, dist)] in increasing dist order — the repeated-
    pattern complement of :func:`top_discords` on the same profile.
    """
    prof, idx = stomp_profile(x, m)
    l = len(prof)
    excl = max(m // 2, 1)
    p = prof.copy()
    p[~np.isfinite(p)] = np.inf
    out: list[tuple[int, int, float]] = []
    for _ in range(min(k, l)):
        i = int(np.argmin(p))
        if not np.isfinite(p[i]):
            break
        j = int(idx[i])
        out.append((i, j, float(prof[i])))
        for c in (i, j):
            lo, hi = max(0, c - excl + 1), min(l, c + excl)
            p[lo:hi] = np.inf
    return out
