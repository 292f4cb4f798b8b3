"""Matrix profile — z-normalized self-join distance profile (STOMP).

The matrix profile (Yeh et al., "Matrix Profile I: All Pairs
Similarity Joins for Time Series", ICDM 2016; STOMP formulation from
Zhu et al., ICDM 2016) annotates every length-``m`` subsequence of a
series with the z-normalized Euclidean distance to its nearest
non-trivial neighbour in the same series — THE modern primitive for
motif discovery and anomaly (discord) detection, and the natural
companion of this engine's subsequence-search and LoCo operators
(reference ``subsequence/`` and ``localconcurrences.py`` find matches
against a *query* / *other* series; the matrix profile is the
self-join case the reference doesn't cover).

Exactness strategy (the engine's standard integer trick): the inputs
are integer-valued gap-filled counts, so window sums ``S``, sums of
squares ``SS`` and sliding dot products ``QT`` are all exact integers
in float64 (every intermediate < 2^53).  The distance is then ONE
fixed IEEE expression tree over exact integers

    den_i  = sqrt(m*SS_i - S_i^2)            (exact int under sqrt)
    r      = (m*QT - S_i*S_j) / (den_i * den_j)
    dist   = sqrt(max((2*m) * (1 - r), 0))

→ bit-identical in numpy, Spark and DuckDB, so the driver oracle
hash-checks the full profile, argmin indices included.  Constant
(zero-variance) windows use the SCAMP convention: both constant → 0,
exactly one constant → sqrt(m).

The trivial-match exclusion zone is ``|i-j| <= m // 4`` (the UCR
default).  Dot products come from a chunked ``W @ W.T`` (BLAS on
exact integers is exact regardless of blocking/FMA); memory is
O(chunk·k), never O(k²·m).
"""

from __future__ import annotations

import numpy as np

__all__ = ["matrix_profile_1d"]


def matrix_profile_1d(values, m: int, excl: int | None = None,
                      chunk: int = 1024):
    """Self-join matrix profile of one series.

    Returns ``(dist, idx)`` — for each of the ``k = n - m + 1`` windows
    (0-based), the z-normalized ED to its nearest admissible neighbour
    window and that neighbour's 0-based index; windows with NO
    admissible neighbour (every j inside the exclusion zone) get
    ``dist = inf, idx = -1``.
    """
    x = np.asarray(values, dtype=np.float64)
    n = x.size
    k = n - m + 1
    if m < 2:
        raise ValueError("m must be >= 2")
    if k <= 0:
        return np.empty(0), np.empty(0, dtype=np.int64)
    if excl is None:
        excl = m // 4

    W = np.lib.stride_tricks.sliding_window_view(x, m)   # (k, m) view
    S = W.sum(axis=1)              # exact integers in float64
    SS = (W * W).sum(axis=1)       # exact
    den2 = float(m) * SS - S * S   # exact
    den = np.sqrt(den2)
    const = den2 == 0.0
    sqrt_m = np.sqrt(float(m))
    two_m = 2.0 * float(m)

    best_d = np.full(k, np.inf)
    best_j = np.full(k, -1, dtype=np.int64)
    for lo in range(0, k, chunk):
        hi = min(lo + chunk, k)
        # fused in-place pipeline: the same expression tree as the SQL
        # twin, evaluated with two full-size buffers (QT reused through
        # num → r → dist) instead of one temporary per step — the
        # operator is DRAM-bandwidth-bound, not FLOP-bound, so the
        # temporaries were the wall (measured ~1.2× on 32 cores)
        QT = W[lo:hi] @ W.T                          # exact integers
        QT *= float(m)
        QT -= np.outer(S[lo:hi], S)                  # num, still exact
        denom = np.outer(den[lo:hi], den)
        with np.errstate(divide="ignore", invalid="ignore"):
            QT /= denom                              # r
        np.subtract(1.0, QT, out=QT)
        QT *= two_m
        np.maximum(QT, 0.0, out=QT)
        np.sqrt(QT, out=QT)
        d = QT
        ci = const[lo:hi][:, None]
        cj = const[None, :]
        both = ci & cj
        d[ci | cj] = sqrt_m                          # one constant
        d[both] = 0.0                                # both constant
        for li in range(hi - lo):                    # trivial-match band
            gi = lo + li
            d[li, max(0, gi - excl):min(k, gi + excl + 1)] = np.inf
        j = np.argmin(d, axis=1)                     # first-min = low j
        best_j[lo:hi] = j
        best_d[lo:hi] = d[np.arange(hi - lo), j]
    best_j[~np.isfinite(best_d)] = -1
    return best_d, best_j


def topk_motifs(d, j, k: int, excl: int):
    """Greedy top-k motif extraction from a profile (Yeh et al.
    ICDM'16 §4.3): repeatedly take the admissible window with the
    LOWEST profile value (earliest index on ties), report the pair
    (i, j_i), then exclude the trivial-match zones ±excl around BOTH
    members before the next pick.  Returns [(rank, i, j, dist)] with
    0-based indices; fewer than k rows when the profile is exhausted."""
    import numpy as np

    d = np.asarray(d, dtype=float).copy()
    j = np.asarray(j)
    n = len(d)
    d[j < 0] = np.inf
    out = []
    for r in range(int(k)):
        if not np.isfinite(d).any():
            break
        i = int(np.argmin(d))           # first-min = earliest on ties
        out.append((r, i, int(j[i]), float(d[i])))
        for c in (i, int(j[i])):
            d[max(0, c - excl):min(n, c + excl + 1)] = np.inf
    return out


def topk_discords(d, j, k: int, excl: int):
    """Greedy top-k discord extraction: repeatedly take the admissible
    window with the HIGHEST profile value (earliest on ties — the
    subsequence farthest from everything else), then exclude ±excl
    around it.  Returns [(rank, i, dist)], 0-based."""
    import numpy as np

    d = np.asarray(d, dtype=float).copy()
    j = np.asarray(j)
    n = len(d)
    d[j < 0] = -np.inf
    out = []
    for r in range(int(k)):
        if not (d > -np.inf).any():
            break
        i = int(np.argmax(d))
        if not np.isfinite(d[i]):
            break
        out.append((r, i, float(d[i])))
        d[max(0, i - excl):min(n, i + excl + 1)] = -np.inf
    return out
