"""LTTB downsampling — Largest-Triangle-Three-Buckets (Steinarsson,
"Downsampling Time Series for Visual Representation", MSc thesis,
University of Iceland, 2013; the algorithm TimescaleDB ships as
``lttb``).  Complements the tier cascade: rollups downsample by
aggregation, LTTB downsamples by *shape preservation* — it keeps the
n_out original points whose triangle areas trace the series' visual
extremes.

Deterministic semantics (mirrored exactly by the recursive-CTE DuckDB
oracle in plans/driver_queries.py):

* first and last points always kept;
* the n_out-2 interior buckets split the interior points as evenly as
  possible (bucket k covers interior indices
  [floor(k·m/B), floor((k+1)·m/B)) for m interior points, B buckets);
* bucket k's pick maximizes the triangle area with the previously
  selected point a and the centroid c of bucket k+1 (the last bucket's
  centroid is the final point); area = |(t_a−t_c)·(v_p−v_a) −
  (t_a−t_p)·(v_c−v_a)| computed in exactly that operand order so the
  SQL twin is bit-identical; ties keep the earliest point.

Per-series sequential (each pick depends on the previous), so the
distributed surface is one ``applyInPandas`` per series — the standard
per-series-kernel shape of this engine.
"""

from __future__ import annotations

import numpy as np

__all__ = ["lttb"]


def lttb(t: np.ndarray, v: np.ndarray, n_out: int):
    """Downsample (t, v) to ``n_out`` points; returns an index array
    into the input (sorted ascending).  Inputs must be sorted by t."""
    t = np.asarray(t, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    n = len(t)
    if n_out >= n or n <= 2:
        return np.arange(n)
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    m = n - 2                     # interior points
    b = n_out - 2                 # interior buckets
    # bucket bounds over interior indices 1..n-2
    starts = 1 + (np.arange(b) * m) // b
    ends = 1 + (np.arange(1, b + 1) * m) // b   # exclusive
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0                          # previously selected index
    for k in range(b):
        lo, hi = starts[k], ends[k]
        if k + 1 < b:
            nlo, nhi = starts[k + 1], ends[k + 1]
            t_c = float(np.mean(t[nlo:nhi]))
            v_c = float(np.mean(v[nlo:nhi]))
        else:
            t_c, v_c = float(t[n - 1]), float(v[n - 1])
        t_a, v_a = float(t[a]), float(v[a])
        # operand order matters for bit-parity with the SQL twin
        areas = np.abs((t_a - t_c) * (v[lo:hi] - v_a)
                       - (t_a - t[lo:hi]) * (v_c - v_a))
        a = lo + int(np.argmax(areas))   # first max = earliest point
        out[k + 1] = a
    return out
