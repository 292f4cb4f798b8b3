"""Generic dynamic-programming engine (reference dp.py:36-141).

Pluggable cell-cost DP with border initialization, Sakoe-Chiba window,
max_dist row pruning, psi relaxation, and a direction-string traceback
matrix — the generalization that Needleman-Wunsch, edit distance, and
DTW all specialize (reference dp.py docstring; dtw.distance is ``fn =
(x-y)²``, NW is match/mismatch ± gap).  Independent implementation with
the reference's exact output conventions so its pytest fixtures port.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

__all__ = ["dp", "dp_best_path"]

_LEFT, _UP, _DIAG = "←", "↑", "↖"


def dp(s1: Sequence, s2: Sequence, fn: Callable, border: Optional[Callable] = None,
       window: Optional[int] = None, max_dist: Optional[float] = None,
       max_step: Optional[float] = None, max_length_diff: Optional[int] = None,
       penalty: Optional[float] = None, psi: Optional[int] = None):
    """Generic DP over two sequences.

    ``fn(a, b) -> (match_cost, indel_cost)``; ``border(ri, ci)`` fills
    row 0 / column 0.  Returns ``(value, scores, paths)`` where paths
    holds the direction strings of all argmin predecessors per cell
    (reference dp.py:88-127 semantics; early-exit returns
    ``(inf, scores)`` when a whole row exceeds max_dist).
    """
    r, c = len(s1), len(s2)
    if max_length_diff is not None and abs(r - c) > max_length_diff:
        return np.inf
    win = max(r, c) if window is None else window
    ms = np.inf if not max_step else max_step
    md = np.inf if not max_dist else max_dist
    pen = 0.0 if not penalty else penalty
    p = 0 if psi is None else psi

    # plain-Python cell loop: a generic engine is per-cell by nature, and
    # list indexing beats numpy scalar boxing ~20× in this hot loop
    inf = float("inf")
    sc = [[inf] * (c + 1) for _ in range(r + 1)]
    pt = [[""] * (c + 1) for _ in range(r + 1)]
    if border:
        sc[0] = [float(border(0, ci)) for ci in range(c + 1)]
        for ri in range(1, r + 1):
            sc[ri][0] = float(border(ri, 0))
    for ci in range(p + 1):
        sc[0][ci] = 0.0
    for ri in range(min(p, r) + 1):
        sc[ri][0] = 0.0

    M, N = max(0, r - c), max(0, c - r)
    last_ok = 0
    for i0 in range(r):
        i1 = i0 + 1
        prev_ok = inf if last_ok == -1 else last_ok
        last_ok = -1
        row1, row0 = sc[i1], sc[i0]
        prow = pt[i1]
        x = s1[i0]
        for j0 in range(max(0, i0 - M - win + 1), min(c, i0 + N + win)):
            j1 = j0 + 1
            d, d_indel = fn(x, s2[j0])
            if d > ms:
                d = inf
            if d_indel > ms:
                d_indel = inf
            if d == inf and d_indel == inf:
                continue
            from_left = d_indel + row1[j0] + pen
            from_up = d_indel + row0[j1] + pen
            from_diag = d + row0[j0]
            best = min(from_left, from_up, from_diag)
            row1[j1] = best
            tag = ""
            if best == from_left:
                tag += _LEFT
            if best == from_up:
                tag += _UP
            if best == from_diag:
                tag += _DIAG
            prow[j1] = tag
            if best <= md:
                last_ok = j0
            else:
                row1[j1] = inf
                if prev_ok < j1:
                    break
        if last_ok == -1 and md != inf:
            return np.inf, np.array(sc)
    scores = np.array(sc)
    paths = np.array(pt, dtype="<U4")
    if p == 0:
        d = scores[r, c]
    else:
        vr = scores[r - p: r + 1, c]
        vc = scores[r, c - p: c + 1]
        mir, mic = int(np.argmin(vr)), int(np.argmin(vc))
        if vr[mir] < vc[mic]:
            scores[r - p + mir + 1: r + 1, c] = -1
            d = vr[mir]
        else:
            scores[r, c - p + mic + 1: c + 1] = -1
            d = vc[mic]
    return d, scores, paths


def dp_best_path(paths: np.ndarray, row: Optional[int] = None,
                 col: Optional[int] = None):
    """Greedy traceback over the direction matrix (diag preferred)."""
    i = paths.shape[0] - 1 if row is None else row
    j = paths.shape[1] - 1 if col is None else col
    out = [(i - 1, j - 1)]
    while i > 1 or j > 1:
        tag = paths[i, j]
        if _DIAG in tag:
            i, j = i - 1, j - 1
        elif _UP in tag and i > 1:
            i -= 1
        elif _LEFT in tag and j > 1:
            j -= 1
        elif i > 1:
            i -= 1
        else:
            j -= 1
        out.append((i - 1, j - 1))
    out.reverse()
    return out
