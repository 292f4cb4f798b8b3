"""Array-level preprocessing kernels (numpy twins of
functions/preprocessing.py, matching reference ``preprocessing.py``
semantics for use inside pandas UDFs and other kernels)."""

from __future__ import annotations

import numpy as np

__all__ = ["differencing", "derivative", "znormal", "logdomain",
           "mixedlinearlogdomain", "smoothing_ma", "butter2_lowpass",
           "lfilter2", "filtfilt_gust", "smoothing_butterworth"]


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


def butter2_lowpass(wn: float):
    """2nd-order Butterworth low-pass (b, a) by bilinear transform —
    closed form of scipy.signal.butter(N=2, Wn=wn, btype='low')
    (Oppenheim & Schafer; public formula, no scipy dependency)."""
    if not 0.0 < wn < 1.0:
        raise ValueError(f"requires 0 < Wn < 1 (got {wn})")
    w = np.tan(np.pi * wn / 2.0)  # pre-warped analog cutoff
    s2 = np.sqrt(2.0)
    den = 1.0 + s2 * w + w * w
    b = np.array([w * w, 2 * w * w, w * w]) / den
    a = np.array([1.0, 2 * (w * w - 1) / den, (1 - s2 * w + w * w) / den])
    return b, a


def lfilter2(b, a, x: np.ndarray, zi=None):
    """Order-2 IIR direct-form-II-transposed filter with initial state.
    Returns (y, zf).  Sequential recurrence (the 2-tap state carries)."""
    b0, b1, b2 = b
    _, a1, a2 = a
    z0, z1 = (0.0, 0.0) if zi is None else (float(zi[0]), float(zi[1]))
    y = np.empty(len(x))
    for i in range(len(x)):
        xi = x[i]
        yi = b0 * xi + z0
        z0 = b1 * xi - a1 * yi + z1
        z1 = b2 * xi - a2 * yi
        y[i] = yi
    return y, np.array([z0, z1])


def filtfilt_gust(b, a, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering with Gustafsson's method
    (F. Gustafsson, "Determining the initial states in forward-backward
    filtering", IEEE TSP 44(4), 1996 — public paper; independent
    implementation, scipy absent in this environment).

    Defining property: ONE forward state vector z_f and ONE backward
    state vector z_b are shared by both orderings, chosen so that
    forward(z_f)-then-backward(z_b) equals backward(z_b)-then-
    forward(z_f).  Filtering is affine in the 2-tap states, so the
    condition is a 4-unknown linear system (full rank for a stable
    filter); sharing the states across orderings is what makes the
    solution — and hence y — unique (with independent states per
    ordering the consistent set is a 4-parameter family)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 5:
        return x.copy()

    def fwd(v, zi=None):
        return lfilter2(b, a, v, zi=zi)[0]

    def bwd(v, zi=None):
        return lfilter2(b, a, v[::-1], zi=zi)[0][::-1]

    zero = np.zeros(n)
    e = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    fb0 = bwd(fwd(x))
    bf0 = fwd(bwd(x))
    zf_resp = [lfilter2(b, a, zero, zi=ek)[0] for ek in e]
    cols = []
    for k in range(2):   # z_f: FB first pass (through bwd) − BF second pass
        cols.append(bwd(zf_resp[k]) - zf_resp[k])
    for k in range(2):   # z_b: FB second pass − BF first pass (through fwd)
        cols.append(zf_resp[k][::-1] - fwd(zf_resp[k][::-1]))
    M = np.stack(cols, axis=1)
    theta, *_ = np.linalg.lstsq(M, bf0 - fb0, rcond=None)
    y = fb0 + np.stack([bwd(zf_resp[0]), bwd(zf_resp[1]),
                        zf_resp[0][::-1], zf_resp[1][::-1]], axis=1) @ theta
    return y


def smoothing_butterworth(series: np.ndarray, smooth: float) -> np.ndarray:
    """Reference preprocessing.smoothing semantics (preprocessing.py:45-88):
    2nd-order Butterworth low-pass at Wn = smooth/0.5 with Gustafsson
    forward-backward filtering.  scipy is absent in this sandbox, so
    parity is pinned by the filter's defining properties (see
    tests/test_round2_ops.py) rather than a scipy golden run."""
    s = np.asarray(series, dtype=np.float64)
    wn = (100 * smooth) / (0.5 * 100)  # fs = 100 Hz, nyq = 50 — ref :73-76
    b, a = butter2_lowpass(wn)
    return filtfilt_gust(b, a, s)


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
