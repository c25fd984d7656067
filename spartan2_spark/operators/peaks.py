"""Per-series peak detection + fixed-window segmentation (RPeak) and
moving-average reconstruction scoring (BeatGAN's task shape).

Reference semantics being re-expressed (NOT ported):

- RPeak (/root/reference/spartan/model/rpeak/RPeak.py:24-36) finds
  R-peaks in an ECG series with ``biosppy.signals.ecg`` (Hamilton
  detector) and cuts a fixed window of samples around each detected
  peak. biosppy is not in this container and the detector is an
  external black box; the *engine semantics* — "detect prominent local
  maxima per series, emit a fixed segment around each" — are expressed
  with window functions: a peak is a strict local maximum whose value
  clears an adaptive per-series threshold (mean + k*stddev, the same
  shape as the reference's adaptive thresholding stage). 100%
  JVM-side; no per-row Python.

- BeatGAN (/root/reference/spartan/model/beatgan/, 906 LoC torch GAN)
  trains an autoencoder-GAN and scores each window by reconstruction
  error |x - G(x)|. torch is not in this container; the *pipeline
  semantics* — "per series, reconstruct each point from its context and
  rank by reconstruction error" — are expressed with a centered
  moving-average reconstructor (the deterministic stand-in) so the
  whole scoring path is window aggregates in whole-stage codegen. A
  learned (linear-autoencoder/PCA) reconstructor lives in
  ``models/beatgan.py``; a torch generator slots in behind the same
  ``reconstructor=`` contract as a grouped pandas UDF when available.

- ``hamilton_rpeaks`` is the fidelity path for RPeak: the actual
  Hamilton QRS detection algorithm (band-pass -> |diff| -> 80 ms
  envelope -> adaptive dual-buffer thresholds with refractory, T-wave
  and search-back rules) re-implemented numpy-only from the published
  description in ``functions/hamilton.py``, run per series as a grouped
  pandas kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = [
    "detect_peaks",
    "peak_segments",
    "reconstruction_scores",
    "hamilton_rpeaks",
]


def detect_peaks(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "value",
    k_sigma: float = 1.0,
    tie: str | None = None,
) -> DataFrame:
    """Strict local maxima above the per-series adaptive threshold.

    Plateau-correct: consecutive equal values collapse to one RUN, and
    a run is a peak iff its value exceeds BOTH flanking runs' values
    (so a plateau followed by a further rise is NOT a peak) and clears
    ``mean + k_sigma * stddev_pop`` of its own series. The emitted row
    is the run's first sample. Returns (key, ts, value, thr).

    ``tie`` names a column appended to the window ORDER BY so duplicate
    (key, ts) rows segment deterministically across partitionings and
    engines (pass the same tie-break in any SQL twin).
    """
    order = [ts, tie] if tie else [ts]
    w = W.partitionBy(key).orderBy(*order)
    v = F.col(val)
    chg = F.when(
        F.lag(val).over(w).isNull() | (v != F.lag(val).over(w)), 1
    ).otherwise(0)
    runs = (
        df.withColumn("_chg", chg)
        .withColumn(
            "_rid",
            F.sum("_chg").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy(key, "_rid")
        .agg(F.min(ts).alias(ts), F.min(val).alias(val))
    )
    stats = df.groupBy(key).agg(
        (F.avg(val) + F.lit(k_sigma) * F.stddev_pop(val)).alias("thr")
    )
    wr = W.partitionBy(key).orderBy("_rid")
    return (
        runs.withColumn("_prev", F.lag(val).over(wr))
        .withColumn("_next", F.lead(val).over(wr))
        .join(stats, key)
        .filter(
            F.col("_prev").isNotNull()
            & F.col("_next").isNotNull()
            & (F.col(val) > F.col("_prev"))
            & (F.col(val) > F.col("_next"))
            & (F.col(val) >= F.col("thr"))
        )
        .select(key, ts, val, "thr")
    )


def peak_segments(
    peaks: DataFrame,
    ts: str = "ts",
    before_s: int = 60,
    after_s: int = 60,
) -> DataFrame:
    """RPeak's fixed window around each peak (RPeak.py:30-33 cuts
    ``[r - before, r + after]`` samples): emit segment bounds as
    timestamps; the caller range-joins raw points back in if the
    segment contents are needed."""
    t = F.col(ts).cast("timestamp")
    return peaks.withColumn(
        "seg_start", t - F.make_interval(secs=F.lit(before_s))
    ).withColumn("seg_end", t + F.make_interval(secs=F.lit(after_s)))


def reconstruction_scores(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "value",
    half_window: int = 2,
    reconstructor: Column | None = None,
    tie: str | None = None,
) -> DataFrame:
    """Per-point reconstruction error vs a centered moving average of
    ±half_window neighbours (the deterministic stand-in for BeatGAN's
    generator). Returns (key, ts, value, recon, err).

    ``reconstructor`` may override the reconstruction column (e.g. a
    pandas-UDF-computed generator output joined in upstream).
    ``tie`` appends a tie-break column to the window ORDER BY so
    duplicate (key, ts) rows get a deterministic neighbourhood."""
    order = [ts, tie] if tie else [ts]
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-half_window, half_window)
    )
    recon = reconstructor if reconstructor is not None else F.avg(val).over(w)
    cols = [key, ts] + ([tie] if tie else []) + [val, "recon", "err"]
    return (
        df.withColumn("recon", recon)
        .withColumn("err", F.abs(F.col(val) - F.col("recon")))
        .select(*cols)
    )


def hamilton_rpeaks(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    val: str = "value",
    fs: float = 360.0,
    left: int = 120,
    right: int = 136,
    tie: str | None = None,
) -> DataFrame:
    """Hamilton R-peak detection per series + the reference's segment
    bounds rule (RPeak.py:29-33 keeps a peak iff ``r - left >= 0`` and
    ``r + right < n``).

    One grouped-pandas kernel invocation per series — the same
    whole-series-in-memory contract as the reference model (and as the
    Fourier resample kernel); at 100x the parallel unit is the series,
    so kernel parallelism scales with series cardinality while each
    series must fit executor memory. Returns
    (key, r_idx, r_ts, r_value, seg_start_idx, seg_end_idx) where
    ``r_idx`` indexes the series' time-sorted samples.
    """
    from ..functions.hamilton import hamilton_detect

    order = [ts] + ([tie] if tie else [])
    key_t = dict(df.dtypes)[key]
    ts_t = dict(df.dtypes)[ts]
    schema = (
        f"{key} {key_t}, r_idx long, r_ts {ts_t}, r_value double, "
        "seg_start_idx long, seg_end_idx long"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        x = pdf[val].to_numpy(dtype="float64")
        n = len(x)
        r = hamilton_detect(x, fs)
        r = r[(r - left >= 0) & (r + right < n)]
        return pd.DataFrame(
            {
                key: pdf[key].iloc[:1].repeat(len(r)).reset_index(drop=True),
                "r_idx": r.astype("int64"),
                "r_ts": pdf[ts].iloc[r].reset_index(drop=True),
                "r_value": x[r],
                "seg_start_idx": (r - left).astype("int64"),
                "seg_end_idx": (r + right).astype("int64"),
            }
        )

    return df.select(key, ts, val, *([tie] if tie else [])).groupBy(
        key
    ).applyInPandas(kernel, schema)
