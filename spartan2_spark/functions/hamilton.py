"""Hamilton QRS detection kernel (numpy-only).

The reference's RPeak model (/root/reference/spartan/model/rpeak/
RPeak.py:24-36) delegates R-peak detection to ``biosppy.signals.ecg``,
whose default segmenter implements Hamilton's open-source ECG analysis
algorithm. biosppy/scipy are not in this environment, so this kernel is
written from the published algorithm description (P. Hamilton, "Open
Source ECG Analysis Software Documentation", E.P. Limited, 2002; and
Hamilton & Tompkins, IEEE Trans. BME 1986):

1. band-pass filter 8-16 Hz (windowed-sinc FIR, Hamming window),
2. absolute first difference,
3. 80 ms moving-average ("energy") envelope,
4. peak picking on the envelope with an adaptive detection threshold
   ``DT = nmean + TH * (qmean - nmean)`` over running 8-deep buffers of
   QRS-peak and noise-peak heights (TH = 0.3125),
5. decision rules: 195 ms refractory, T-wave discrimination inside
   360 ms of the previous QRS by comparing maximum envelope slopes,
   and a search-back pass at 1.5x the running mean RR interval with a
   halved threshold,
6. R localization: maximum of the raw signal around the envelope
   detection point after compensating the chain's group delay.

Everything is deterministic; no randomness, no scipy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bandpass_fir", "hamilton_detect"]

TH = 0.3125  # detection-threshold coefficient (E.P. Limited default)
REFRACTORY_S = 0.195
TWAVE_WINDOW_S = 0.360
SEARCHBACK_FACTOR = 1.5


def _sinc_lowpass(ntaps: int, fc: float) -> np.ndarray:
    """Windowed-sinc low-pass kernel, cutoff ``fc`` in cycles/sample."""
    n = np.arange(ntaps) - (ntaps - 1) / 2.0
    h = 2.0 * fc * np.sinc(2.0 * fc * n)
    return h * np.hamming(ntaps)


def bandpass_fir(fs: float, lo: float = 8.0, hi: float = 16.0) -> np.ndarray:
    """8-16 Hz band-pass FIR as a difference of two low-pass kernels,
    normalized to unit pass-band gain at the geometric center."""
    ntaps = int(0.1 * fs) | 1  # ~100 ms, odd length -> integer delay
    h = _sinc_lowpass(ntaps, hi / fs) - _sinc_lowpass(ntaps, lo / fs)
    fc = np.sqrt(lo * hi) / fs
    n = np.arange(ntaps) - (ntaps - 1) / 2.0
    gain = np.abs(np.sum(h * np.exp(-2j * np.pi * fc * n)))
    return h / gain if gain > 0 else h


def _envelope(x: np.ndarray, fs: float) -> tuple[np.ndarray, int]:
    """Band-pass -> |diff| -> 80 ms moving average. Returns the envelope
    and the total group delay (samples) back to the raw signal."""
    h = bandpass_fir(fs)
    y = np.convolve(x, h, mode="full")[: len(x) + (len(h) - 1) // 2]
    y = y[(len(h) - 1) // 2 :]  # zero-delay band-passed signal
    d = np.abs(np.diff(y, prepend=y[:1]))
    w = max(int(0.080 * fs), 1)
    m = np.convolve(d, np.ones(w) / w, mode="full")[: len(d)]
    return m, (w - 1) // 2


def _local_peaks(m: np.ndarray, min_dist: int) -> np.ndarray:
    """Strict-rise / non-strict-fall local maxima, then greedy merge of
    peaks closer than ``min_dist`` keeping the higher one."""
    if len(m) < 3:
        return np.empty(0, dtype=np.int64)
    rise = m[1:-1] > m[:-2]
    fall = m[1:-1] >= m[2:]
    idx = np.nonzero(rise & fall)[0] + 1
    if len(idx) == 0:
        return idx
    keep: list[int] = []
    for i in idx:
        if keep and i - keep[-1] < min_dist:
            if m[i] > m[keep[-1]]:
                keep[-1] = int(i)
        else:
            keep.append(int(i))
    return np.asarray(keep, dtype=np.int64)


def hamilton_detect(x: np.ndarray, fs: float = 360.0) -> np.ndarray:
    """Detect R-peak sample indices in a 1-D signal.

    Returns indices into ``x`` (sorted, unique). Series shorter than
    ~0.5 s return empty.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < int(0.5 * fs) or n < int(0.1 * fs) | 1:
        return np.empty(0, dtype=np.int64)

    m, delay = _envelope(x, fs)
    refractory = int(REFRACTORY_S * fs)
    peaks = _local_peaks(m, refractory)
    if len(peaks) == 0:
        return np.empty(0, dtype=np.int64)

    # threshold seeding from the first 2 s of envelope activity
    seed = m[: max(int(2.0 * fs), 1)]
    qbuf = [float(seed.max())] if len(seed) else [1.0]
    nbuf = [float(np.mean(seed))] if len(seed) else [0.0]
    rrbuf: list[float] = []

    def dt() -> float:
        q = float(np.mean(qbuf[-8:]))
        nn = float(np.mean(nbuf[-8:]))
        return nn + TH * (q - nn)

    def slope_at(p: int) -> float:
        a = max(p - int(0.050 * fs), 1)
        seg = np.diff(m[a : p + 1])
        return float(np.max(seg)) if len(seg) else 0.0

    twave = int(TWAVE_WINDOW_S * fs)
    det: list[int] = []
    noise_since: list[int] = []  # rejected peaks since the last QRS

    def accept(p: int) -> None:
        if det:
            rrbuf.append(float(p - det[-1]))
        det.append(p)
        qbuf.append(float(m[p]))
        noise_since.clear()

    for p in peaks:
        p = int(p)
        if det and p - det[-1] < refractory:
            continue
        is_qrs = m[p] > dt()
        if is_qrs and det and p - det[-1] < twave:
            if slope_at(p) < 0.5 * slope_at(det[-1]):
                is_qrs = False  # T-wave of the previous beat
        if is_qrs:
            accept(p)
        else:
            nbuf.append(float(m[p]))
            noise_since.append(p)
            # search-back: overdue for a beat at 1.5x the mean RR ->
            # re-examine the rejected peaks with a halved threshold
            if det and len(rrbuf) >= 2:
                rr = float(np.mean(rrbuf[-8:]))
                if p - det[-1] > SEARCHBACK_FACTOR * rr and noise_since:
                    cand = [
                        c
                        for c in noise_since
                        if c - det[-1] >= refractory and m[c] > 0.5 * dt()
                    ]
                    if cand:
                        best = int(max(cand, key=lambda c: m[c]))
                        # the recovered peak's envelope value was logged
                        # as noise when it was first rejected: remove
                        # that ONE entry (first occurrence — removing
                        # every equal value would strip coincidentally-
                        # equal noise samples on quantized signals and
                        # could empty the buffer, NaN-ing the threshold)
                        if len(nbuf) > 1:
                            try:
                                nbuf.remove(float(m[best]))
                            except ValueError:
                                pass
                        accept(best)

    if not det:
        return np.empty(0, dtype=np.int64)

    # map envelope detections back to raw-signal R positions
    half = int(0.100 * fs)
    out = []
    for p in det:
        c = max(p - delay, 0)
        a, b = max(c - half, 0), min(c + half + 1, n)
        out.append(a + int(np.argmax(x[a:b])))
    return np.unique(np.asarray(out, dtype=np.int64))
