"""BeatLex-style vocabulary summarization of a series (from scratch).

Semantics follow the published BeatLex algorithm (Hooi et al.,
"BeatLex: Summarizing and Forecasting Time Series with Patterns",
ECML-PKDD 2017), which the reference packages as
/root/reference/spartan/model/beatlex/Beatlex.py (segmentation loop
:39-148, banded DTW :170-215). This module is an independent
implementation of the algorithm, not a translation:

- greedy left-to-right segmentation: at each position try every vocab
  term x candidate segment length in [smin, smax], score by
  length-normalized banded DTW (Sakoe-Chiba band, squared-euclidean
  local cost);
- if the best match exceeds ``new_term_cost`` and the vocabulary has
  room, the segment founds a new vocab term (its own cost is 0); the
  new term's length is chosen by self-similarity — the L in
  [smin, smax] minimizing DTW(x[p:p+L], x[p+L:p+2L])/L — so periodic
  signals found terms of their true period;
- result: per-segment (start, end, vocab_idx, err) + total error.

Spark surface: one url/key's gap-filled tier series = one group ->
``summarize(df)`` runs the kernel per group in an Arrow-batched
grouped pandas UDF. The DTW loop is numpy row-vectorized (one DP row
per step, band-sliced).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["dtw_banded", "summarize_series", "summarize"]


def dtw_banded(a: np.ndarray, b: np.ndarray, band: int = 250) -> float:
    """Banded DTW with squared-euclidean local cost, O(len(a)*band)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return np.inf
    band = max(band, abs(n - m) + 1)
    INF = np.inf
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        lo = max(1, i - band)
        hi = min(m, i + band)
        cur = np.full(m + 1, INF)
        cost = (a[i - 1] - b[lo - 1 : hi]) ** 2
        # vectorized candidate mins over the band slice
        diag = prev[lo - 1 : hi]
        up = prev[lo:hi + 1]
        seg = np.minimum(diag, up)
        # left neighbour needs the running DP — do one tight scan
        cur[lo : hi + 1] = seg + cost
        run = cur[lo - 1]
        for j in range(lo, hi + 1):
            c = cost[j - lo]
            best = cur[j] - c  # min(diag, up) already folded in
            if run < best:
                cur[j] = run + c
            run = cur[j]
        prev = cur
    return float(prev[m])


def summarize_series(
    x: np.ndarray,
    smin: int = 8,
    smax: int = 32,
    band: int = 250,
    max_vocab: int = 5,
    new_term_cost: float = float("inf"),
) -> dict:
    """Segment one series against a learned vocabulary.

    ``new_term_cost``: average per-point DTW cost above which a new
    vocab term is founded (inf => only founded when vocab is empty).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    vocab: list[np.ndarray] = []
    starts, ends, idx, errs = [], [], [], []

    def new_term_len(pos: int) -> int:
        rem = n - pos
        hi = min(smax, rem)
        lo = min(smin, hi)
        best_L, best_d = hi, np.inf
        for L in range(lo, hi + 1):
            nxt = x[pos + L : pos + 2 * L]
            if len(nxt) < max(lo // 2, 1):
                continue
            d = dtw_banded(x[pos : pos + L], nxt, band) / L
            if d < best_d:
                best_d, best_L = d, L
        return best_L

    pos = 0
    while pos < n:
        rem = n - pos
        if not vocab:
            L = new_term_len(pos)
            vocab.append(x[pos : pos + L])
            starts.append(pos); ends.append(pos + L); idx.append(0); errs.append(0.0)
            pos += L
            continue
        best = (np.inf, None, None)  # (avg_cost, vocab_i, L)
        hi = min(smax, rem)
        lo = min(smin, rem)
        for vi, v in enumerate(vocab):
            for L in range(lo, hi + 1):
                d = dtw_banded(x[pos : pos + L], v, band) / L
                if d < best[0]:
                    best = (d, vi, L)
        if best[0] > new_term_cost and len(vocab) < max_vocab:
            L = new_term_len(pos)
            vocab.append(x[pos : pos + L])
            starts.append(pos); ends.append(pos + L)
            idx.append(len(vocab) - 1); errs.append(0.0)
            pos += L
        else:
            d, vi, L = best
            starts.append(pos); ends.append(pos + L); idx.append(vi)
            errs.append(d * L)
            pos += L
    return {
        "starts": starts,
        "ends": ends,
        "idx": idx,
        "errs": errs,
        "tot_err": float(sum(errs)),
        "models": vocab,
    }


_SEG_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("seg_start", T.LongType()),
        T.StructField("seg_end", T.LongType()),
        T.StructField("vocab_idx", T.IntegerType()),
        T.StructField("seg_err", T.DoubleType()),
        T.StructField("tot_err", T.DoubleType()),
        T.StructField("n_vocab", T.IntegerType()),
    ]
)


def summarize(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    value_col: str = "value",
    smin: int = 8,
    smax: int = 32,
    band: int = 250,
    max_vocab: int = 5,
    new_term_cost: float = float("inf"),
) -> DataFrame:
    """Per-key BeatLex summarization -> one row per segment."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        res = summarize_series(
            pdf[value_col].to_numpy(np.float64),
            smin, smax, band, max_vocab, new_term_cost,
        )
        k = len(res["starts"])
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])] * k,
                "seg_start": res["starts"],
                "seg_end": res["ends"],
                "vocab_idx": res["idx"],
                "seg_err": res["errs"],
                "tot_err": [res["tot_err"]] * k,
                "n_vocab": [len(res["models"])] * k,
            }
        )

    return df.groupBy(key_col).applyInPandas(kernel, _SEG_SCHEMA)
