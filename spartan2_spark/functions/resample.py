"""Fourier resampling kernel (numpy-only).

Implements the documented semantics of Fourier-method resampling used
by the reference (`/root/reference/spartan/tensor/timeseries.py:115-145`
delegates to scipy.signal.resample): FFT the signal, keep the lowest
``num`` frequency components (with the standard even-length Nyquist
fold/split), inverse-FFT, scale by num/n. scipy itself is not in this
environment, so the kernel is written from the published algorithm
(SciPy reference docs, "resample uses the FFT method") in pure numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fourier_resample"]


def fourier_resample(x: np.ndarray, num: int) -> np.ndarray:
    """Resample a real 1-D signal to ``num`` points by the FFT method."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n == 0 or num <= 0:
        return np.empty(0, dtype=np.float64)
    if num == n:
        return x.copy()
    X = np.fft.fft(x)
    Y = np.zeros(num, dtype=complex)
    m = min(num, n)
    nyq = m // 2 + 1
    Y[:nyq] = X[:nyq]
    if m > 2:
        Y[nyq - m :] = X[nyq - m :] if num > n else X[n - (m - nyq) : n]
    if m % 2 == 0:
        if num < n:  # downsample: fold the two half-Nyquist bins
            Y[m // 2] += X[n - m // 2]
        else:  # upsample: split the Nyquist bin
            Y[m // 2] *= 0.5
            Y[num - m // 2] = Y[m // 2]
    y = np.fft.ifft(Y) * (num / n)
    return y.real
