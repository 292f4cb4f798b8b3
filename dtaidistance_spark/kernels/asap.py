"""ASAP smoothing — automatic smoothing-window selection for
visualization (Rong & Bailis, "ASAP: Prioritizing Attention via Time
Series Smoothing", VLDB 2017).  Complements the visual-downsampling
pair (LTTB keeps shape-defining points, M4 keeps per-pixel extremes):
ASAP chooses HOW MUCH to smooth — the sliding-mean window that
minimizes *roughness* (the standard deviation of the smoothed series'
first differences) subject to preserving *kurtosis* (so genuine
anomalies/spikes stay visible), searching candidate windows at the
autocorrelation peaks the way the paper's grid-search-with-ACF-pruning
does.

Semantics (deterministic, mirrored by the pytest reference):

* candidate windows = the lags of local ACF maxima with positive
  correlation (plus 1..max the paper's fallback when no peak exists),
  capped at ``max_window`` and n//2;
* for each candidate w: smooth with the plain w-point sliding mean
  (valid mode — (n-w+1) points), score roughness = population std of
  diff(smoothed); a candidate qualifies when kurtosis(smoothed) >=
  kurtosis(original) (excess-free m4/m2² form — scale-invariant);
* pick the qualifying window with minimal roughness (ties: the
  smaller window, i.e. the least smoothing that achieves it); window 1
  (no smoothing) always qualifies, so the result is well-defined.

Per-series whole-array (the window search is global to the series), so
the distributed surface is one ``applyInPandas`` per series — the same
shape as LTTB.  Cited for provenance only; implementation from the
paper's published description, not from any reference code.
"""

from __future__ import annotations

import numpy as np

__all__ = ["acf_peaks", "kurtosis", "roughness", "sliding_mean",
           "asap_window", "asap_smooth"]


def sliding_mean(v: np.ndarray, w: int) -> np.ndarray:
    """Plain w-point sliding mean, valid mode (len = n - w + 1)."""
    if w <= 1:
        return v.astype(np.float64, copy=True)
    c = np.cumsum(np.concatenate(([0.0], v.astype(np.float64))))
    return (c[w:] - c[:-w]) / float(w)


def kurtosis(v: np.ndarray) -> float:
    """Population kurtosis m4/m2² (3.0 for a normal); 0 for constant
    series (treated as minimal so any smoothing of a constant series
    trivially qualifies)."""
    v = v.astype(np.float64)
    d = v - v.mean()
    m2 = float(np.mean(d * d))
    if m2 == 0.0:
        return 0.0
    return float(np.mean(d ** 4) / (m2 * m2))


def roughness(v: np.ndarray) -> float:
    """Population std of the first differences (the paper's roughness
    metric); 0 for series shorter than 2."""
    if len(v) < 2:
        return 0.0
    return float(np.std(np.diff(v.astype(np.float64))))


def acf_peaks(v: np.ndarray, max_lag: int) -> list[int]:
    """Lags (>= 2) of strict local maxima of the normalized ACF with
    positive correlation, ascending."""
    v = v.astype(np.float64)
    n = len(v)
    d = v - v.mean()
    denom = float(np.dot(d, d))
    if denom == 0.0 or n < 4:
        return []
    lags = range(1, min(max_lag, n - 2) + 1)
    acf = np.array([float(np.dot(d[:-k], d[k:])) / denom for k in lags])
    peaks = []
    for i in range(1, len(acf) - 1):
        if acf[i] > acf[i - 1] and acf[i] > acf[i + 1] and acf[i] > 0:
            lag = i + 1
            if lag >= 2:
                peaks.append(lag)
    return peaks


def asap_window(v: np.ndarray, max_window: int = 100) -> int:
    """The ASAP window choice for one series (see module docstring)."""
    v = np.asarray(v, dtype=np.float64)
    n = len(v)
    if n < 4:
        return 1
    cap = min(int(max_window), n // 2)
    if cap < 2:
        return 1
    cands = [w for w in acf_peaks(v, cap) if w <= cap]
    if not cands:
        cands = list(range(2, cap + 1))
    k0 = kurtosis(v)
    best_w, best_r = 1, roughness(v)
    for w in cands:
        s = sliding_mean(v, w)
        if kurtosis(s) >= k0:
            r = roughness(s)
            if r < best_r:
                best_w, best_r = w, r
    return best_w


def asap_smooth(v: np.ndarray, max_window: int = 100):
    """(window, smoothed values) for one series."""
    w = asap_window(v, max_window)
    return w, sliding_mean(np.asarray(v, dtype=np.float64), w)
