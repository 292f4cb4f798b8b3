"""Subsequence alignment / search kernels (pure numpy).

Re-expresses the reference's SubsequenceAlignment
(subsequence/subsequencealignment.py:175-459): find where a short query
matches inside a long series via DTW with psi relaxation on the series
side only (psi=[0,0,len(series),len(series)], :201-203); the matching
function is the last warping-paths row normalized by query length
(:238-245); k-best matches iteratively take the argmin and mask
overlapping end-points (:362-405).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .dtw import DtwSettings, best_path, warping_paths

__all__ = ["SubseqMatch", "subsequence_alignment", "kbest_matches",
           "best_match_value"]


@dataclass
class SubseqMatch:
    idx: int          # end-point index in the matching function
    value: float      # normalized DTW distance (distance / len(query))
    start: int        # match start index in series
    end: int          # match end index in series (inclusive)
    path: list        # [(query_i, series_j)]


class SubseqAlignment:
    def __init__(self, query: np.ndarray, series: np.ndarray,
                 penalty: float = 0.1, **kwargs):
        self.query = np.asarray(query, dtype=np.float64)
        self.series = np.asarray(series, dtype=np.float64)
        self.settings = DtwSettings(
            penalty=penalty,
            psi=(0, 0, len(self.series), len(self.series)), **kwargs)
        # int-repr matrix (squared costs), psi_neg off: reference :222-224
        _, self.paths = warping_paths(self.query, self.series,
                                      psi_neg=False, keep_int_repr=True,
                                      settings=self.settings)
        matching = self.paths[-1, :]
        if len(matching) > len(self.series):
            matching = np.sqrt(matching[-len(self.series):])
        self.matching = np.array(matching) / len(self.query)

    def match_at(self, idx: int) -> SubseqMatch:
        path = best_path(self.paths, col=idx + 1,
                         penalty=self.settings.adj_penalty)
        start = path[0][1]
        end = idx  # matching fn is aligned with series end-points
        return SubseqMatch(idx=idx, value=float(self.matching[idx]),
                           start=int(start), end=int(end), path=path)


def subsequence_alignment(query, series, penalty: float = 0.1,
                          **kwargs) -> SubseqAlignment:
    return SubseqAlignment(query, series, penalty=penalty, **kwargs)


def _kbest_loop(paths: np.ndarray, matching0: np.ndarray, qlen: int,
                adj_penalty: float, k: Optional[int] = 1, overlap: int = 0,
                minlength: int = 2, maxlength: Optional[int] = None,
                max_rangefactor: Optional[float] = None) -> List[SubseqMatch]:
    """The greedy k-best masked-argmin loop over a precomputed lattice —
    shared by the per-series API and the batched path (reference
    best_matches, subsequencealignment.py:362-405)."""
    matching = np.array(matching0)
    maxv = np.ceil(np.max(matching) + 1)
    matching[:min(qlen - 1, overlap)] = maxv
    out: List[SubseqMatch] = []
    max_dist = np.inf
    while k is None or len(out) < k:
        best_idx = int(np.argmin(matching))
        if np.isinf(matching[best_idx]) or matching[best_idx] == maxv:
            break
        if max_rangefactor is not None:
            if not out:
                max_dist = matching[best_idx] * max_rangefactor
            elif matching[best_idx] > max_dist:
                break
        path = best_path(paths, col=best_idx + 1, penalty=adj_penalty)
        m = SubseqMatch(idx=best_idx, value=float(matching[best_idx]),
                        start=int(path[0][1]), end=best_idx, path=path)
        b, e = m.start, m.end
        cur_overlap = min(overlap, e - b - 1)
        mb, me = best_idx + 1 - (e - b) + cur_overlap, best_idx + 1
        if (e - b + 1 < minlength) or (maxlength is not None
                                       and e - b + 1 > maxlength):
            matching[best_idx] = maxv
            continue
        if np.isinf(np.max(matching[mb:me])):
            matching[best_idx] = maxv
            continue
        matching[mb:me] = np.inf
        out.append(m)
    return out


def kbest_matches(query, series, k: Optional[int] = 1, overlap: int = 0,
                  minlength: int = 2, maxlength: Optional[int] = None,
                  max_rangefactor: Optional[float] = None,
                  penalty: float = 0.1, **kwargs) -> List[SubseqMatch]:
    """Greedy k-best with overlap suppression — reference best_matches
    (subsequencealignment.py:362-405) semantics."""
    sa = SubseqAlignment(query, series, penalty=penalty, **kwargs)
    return _kbest_loop(sa.paths, sa.matching, len(sa.query),
                       sa.settings.adj_penalty, k=k, overlap=overlap,
                       minlength=minlength, maxlength=maxlength,
                       max_rangefactor=max_rangefactor)


def subseq_lattices_batch(query, S: np.ndarray, penalty: float = 0.1):
    """Subsequence-alignment lattices for a STACK of equal-length series
    in one anti-diagonal sweep: returns ``(wps, matching, settings)``
    with ``wps`` (B, |Q|+1, m+1) int-repr accumulated-cost matrices and
    ``matching`` (B, m).  Row b is bit-identical to
    ``SubseqAlignment(query, S[b])`` — ``warping_paths`` itself runs the
    same ``_dtw_batch_core`` at B=1, so this is the same arithmetic with
    the per-call fixed costs amortized over the whole stack (the engine
    pattern: vectorize the O(|Q|·m·B) lattice, keep Python for the
    O(#matches) selection)."""
    from .dtw import _dtw_batch_core

    q = np.asarray(query, dtype=np.float64)
    S = np.asarray(S, dtype=np.float64)
    B, m = S.shape
    st = DtwSettings(penalty=penalty, psi=(0, 0, m, m))
    Q = np.broadcast_to(q, (B, len(q)))
    _, wps = _dtw_batch_core(Q, S, st, keep_matrix=True)
    matching = np.sqrt(wps[:, -1, 1:]) / len(q)
    return wps, matching, st


def kbest_matches_batch(query, S: np.ndarray, k: Optional[int] = 1,
                        overlap: int = 0, minlength: int = 2,
                        maxlength: Optional[int] = None,
                        max_rangefactor: Optional[float] = None,
                        penalty: float = 0.1) -> List[List[SubseqMatch]]:
    """``kbest_matches`` over a stack of equal-length series: ONE batched
    DP sweep for all lattices, then the (cheap) greedy loop per series.
    Bit-identical to the per-series API (asserted in tests)."""
    q = np.asarray(query, dtype=np.float64)
    wps, matching, st = subseq_lattices_batch(q, S, penalty=penalty)
    return [_kbest_loop(wps[b], matching[b], len(q), st.adj_penalty, k=k,
                        overlap=overlap, minlength=minlength,
                        maxlength=maxlength, max_rangefactor=max_rangefactor)
            for b in range(len(S))]


def best_match_value(query, series, penalty: float = 0.1, **kwargs) -> float:
    """Cheapest summary: min of the matching function (no traceback)."""
    sa = SubseqAlignment(query, series, penalty=penalty, **kwargs)
    return float(np.min(sa.matching))


def linearly_scale(match: SubseqMatch, query, series,
                   return_coeff: bool = False):
    """Linearly rescale the query onto the matched segment (reference
    SAMatch.linearly_scale, subsequencealignment.py:109-135): fit a
    weighted straight line through the warping path (weights = |query
    derivative| at each matched query index), widen the segment to the
    line's span, and resample the query to the segment length."""
    from .preprocessing import derivative

    query = np.asarray(query, dtype=np.float64)
    series = np.asarray(series, dtype=np.float64)
    seg0, seg1 = match.start, match.end
    xy = np.array(match.path, dtype=np.float64)
    xy[:, 1] -= seg0
    wf = derivative(query)
    w = np.abs(wf[xy[:, 0].astype(int)])
    b, m = np.polynomial.polynomial.Polynomial.fit(
        xy[:, 1], xy[:, 0], 1, w=w).convert().coef
    segment = (int(max(0, seg0 - b / m)),
               int(min(len(series), seg0 + (len(query) - b) / m)))
    x = np.arange(len(query))
    x_new = np.linspace(x[0], x[-1], segment[1] - segment[0] + 1)
    scaled = np.interp(x_new, x, query)
    if return_coeff:
        return scaled, segment, (m, b), len(scaled) / len(query)
    return scaled, segment


# --- batched / bounded fast paths (reference subsequencesearch.py:225-246:
# LB prefilter + shrinking bound before the expensive alignment) ------------


def matching_function_batch(query: np.ndarray, S: np.ndarray,
                            penalty: float = 0.1) -> np.ndarray:
    """Matching functions for a stack of equal-length series — last-row-only
    DP, O(|Q|·B) memory instead of B full O(|Q|·m) matrices.

    ``S``: (B, m).  Returns (B, m), bit-identical to
    ``SubseqAlignment(query, S[b]).matching`` (same anti-diagonal core,
    same arithmetic; only the matrix retention differs)."""
    from .dtw import _dtw_batch_core

    q = np.asarray(query, dtype=np.float64)
    S = np.asarray(S, dtype=np.float64)
    B, m = S.shape
    st = DtwSettings(penalty=penalty, psi=(0, 0, m, m))
    Q = np.broadcast_to(q, (B, len(q)))
    _, lastrow = _dtw_batch_core(Q, S, st, keep_lastrow=True)
    return np.sqrt(lastrow[1:, :B].T) / len(q)


def matching_lb_batch(query: np.ndarray, S: np.ndarray) -> np.ndarray:
    """Admissible lower bound on ``min(matching)`` per series: every query
    point must align to SOME series point (order-free relaxation), so
    Σ_i min_j (q_i − s_j)² lower-bounds the best path's squared cost
    (penalty ≥ 0 only adds).  O(m log m) per series vs O(|Q|·m) DP."""
    q = np.asarray(query, dtype=np.float64)
    S = np.asarray(S, dtype=np.float64)
    out = np.empty(len(S))
    for b in range(len(S)):
        sv = np.sort(S[b])
        pos = np.searchsorted(sv, q).clip(1, len(sv) - 1)
        d = np.minimum(np.abs(q - sv[pos - 1]), np.abs(q - sv[pos]))
        out[b] = np.sqrt(np.sum(d * d))
    return out / len(q)


def matching_ub_batch(query: np.ndarray, S: np.ndarray,
                      chunk: int = 64) -> np.ndarray:
    """Upper bound on ``min(matching)``: best diagonal (euclidean sliding
    window) alignment — an actual warping path, hence admissible."""
    q = np.asarray(query, dtype=np.float64)
    S = np.asarray(S, dtype=np.float64)
    r = len(q)
    if S.shape[1] < r:
        # fewer columns than query points: fall back to the exact DP
        return matching_function_batch(q, S).min(axis=1)
    out = np.empty(len(S))
    for s0 in range(0, len(S), chunk):
        V = np.lib.stride_tricks.sliding_window_view(
            S[s0:s0 + chunk], r, axis=1)
        d2 = ((V - q) ** 2).sum(axis=2)
        out[s0:s0 + chunk] = np.sqrt(d2.min(axis=1))
    return out / len(q)
