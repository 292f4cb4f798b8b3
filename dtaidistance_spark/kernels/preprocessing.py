"""Array-level preprocessing kernels (numpy twins of
functions/preprocessing.py, matching reference ``preprocessing.py``
semantics for use inside pandas UDFs and other kernels)."""

from __future__ import annotations

import numpy as np

__all__ = ["differencing", "derivative", "znormal", "logdomain",
           "mixedlinearlogdomain", "smoothing_ma"]


def differencing(series: np.ndarray, smooth: float | None = None) -> np.ndarray:
    """np.diff (+ optional moving-average smoothing) — reference
    preprocessing.py:16-42 (reference low-pass replaced by MA, scipy-free)."""
    out = np.diff(np.asarray(series, dtype=np.float64))
    if smooth is not None:
        out = smoothing_ma(out, max(3, int(round(1.0 / max(smooth, 1e-6)))))
    return out


def derivative(series: np.ndarray, smooth: float | None = None) -> np.ndarray:
    """Keogh DDTW derivative — reference preprocessing.py:91-138:
    interior ((q_i − q_{i−1}) + (q_{i+1} − q_{i−1})/2)/2, endpoints use
    the one-sided difference."""
    s = np.asarray(series, dtype=np.float64)
    out = np.zeros(len(s))
    out[1:-1] = ((s[1:-1] - s[:-2]) + (s[2:] - s[:-2]) / 2) / 2
    out[0] = s[1] - s[0]
    out[-1] = s[-1] - s[-2]
    if smooth is not None:
        out = smoothing_ma(out, max(3, int(round(1.0 / max(smooth, 1e-6)))))
    return out


def znormal(series: np.ndarray) -> np.ndarray:
    """(v - mean) / stddev (population) — reference preprocessing.py:194-206."""
    s = np.asarray(series, dtype=np.float64)
    std = s.std()
    if std == 0:
        return np.zeros(len(s))
    return (s - s.mean()) / std


def logdomain(series: np.ndarray) -> np.ndarray:
    """sign(x)·log1p(|x|) — reference preprocessing.py:141-151."""
    s = np.asarray(series, dtype=np.float64)
    return np.sign(s) * np.log1p(np.abs(s))


def mixedlinearlogdomain(series: np.ndarray, c=10) -> np.ndarray:
    """Linear below c, shifted log above — reference
    preprocessing.py:154-191 (scalar-c and (pos, neg) tuple forms)."""
    s = np.asarray(series, dtype=np.float64)
    if isinstance(c, (tuple, list)):
        pos = np.heaviside(s, 1)
        sp = pos * s
        sn = (1 - pos) * np.abs(s)
        cc = c[0]
        step = np.heaviside(sp - cc, 1)
        sp = (1 - step) * sp + step * (cc + np.log1p(step * (sp - cc)))
        cc = -c[1]
        step = np.heaviside(sn - cc, 1)
        sn = (1 - step) * sn + step * (cc + np.log1p(step * (sn - cc)))
        return -sn + sp
    sign = np.sign(s)
    a = np.abs(s)
    step = np.heaviside(a - c, 1)
    return sign * ((1 - step) * a + step * (c + np.log1p(step * (a - c))))


def smoothing_ma(series: np.ndarray, width: int = 5) -> np.ndarray:
    """Centered moving average with edge shrinking — the engine's
    scipy-free stand-in for the reference Butterworth filtfilt
    (preprocessing.py:45-88); same role (pre-DTW low-pass), different
    filter kernel (documented deviation)."""
    s = np.asarray(series, dtype=np.float64)
    if width <= 1 or len(s) == 0:
        return s.copy()
    half = width // 2
    csum = np.cumsum(np.concatenate([[0.0], s]))
    n = len(s)
    idx_lo = np.maximum(np.arange(n) - half, 0)
    idx_hi = np.minimum(np.arange(n) + half + 1, n)
    return (csum[idx_hi] - csum[idx_lo]) / (idx_hi - idx_lo)
