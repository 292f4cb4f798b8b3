"""Symbolization: translate continuous series to discrete symbol
sequences by matching codebook motifs (reference
symbolization/alignment.py:10-196).

Per-series work is independent (embarrassingly parallel), so the Spark
operator wraps :func:`symbolize` in ``mapInPandas`` with the codebook
broadcast; this module is the pure-numpy kernel.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .subsequence import SubseqAlignment, kbest_matches

__all__ = ["symbolize", "symbolize_min", "hangover"]


def _exp_similarity(d: np.ndarray, r: float) -> np.ndarray:
    # reference similarity.distance_to_similarity method='exponential'
    return np.exp(-np.asarray(d, dtype=np.float64) / r) if r else np.zeros_like(d)


def _claim(patterns: List[Tuple[int, int, int, float]], n: int,
           noword: int, max_overlap: float) -> np.ndarray:
    """The greedy claim loop (reference alignment.py:120-161): score
    patterns by exp-similarity × length, repeatedly claim the argmax
    onto still-unclaimed positions, zero patterns overlapping the claim
    by more than ``max_overlap`` of the claimer's length."""
    best = np.full(n, noword, dtype=int)
    if not patterns:
        return best
    max_value = max(p[3] for p in patterns)
    D = np.array([p[3] for p in patterns])
    B = np.array([p[1] for p in patterns])
    E = np.array([p[2] + 1 for p in patterns])
    L = np.array([p[2] - p[1] + 1 for p in patterns])
    S = _exp_similarity(D, max_value) * L
    while True:
        bi = int(np.argmax(S))
        if S[bi] <= 0:
            break
        midx, b, e, _ = patterns[bi]
        free = best[b:e] == noword
        best[b:e][free] = midx
        overlaps = (np.maximum(0, np.minimum(E[bi], E) - np.maximum(B[bi], B))
                    / L[bi]) > max_overlap
        S[overlaps] = 0
        S[bi] = 0
    return best


def symbolize(series: np.ndarray, codebook: Sequence[np.ndarray],
              maxcompression: float = 0.5, maxexpansion: float = 2.0,
              max_rangefactor: float = 2.0,
              max_overlap: Optional[float] = None) -> np.ndarray:
    """Matching-pursuit symbol assignment (reference align,
    symbolization/alignment.py:83-161): gather candidate codeword
    matches per motif, score by exp-similarity × length, then greedily
    claim non-overlapping segments; unclaimed positions get the no-word
    symbol len(codebook)."""
    series = np.asarray(series, dtype=np.float64)
    if max_overlap is None:
        max_overlap = max(maxcompression, 1.0 / maxexpansion)

    patterns: List[Tuple[int, int, int, float]] = []
    for midx, motif in enumerate(codebook):
        motif = np.asarray(motif, dtype=np.float64)
        for m in kbest_matches(
                motif, series, k=None, max_rangefactor=max_rangefactor,
                minlength=math.floor(len(motif) * maxcompression),
                maxlength=math.ceil(len(motif) * maxexpansion)):
            patterns.append((midx, m.start, m.end + 1, m.value))
    return _claim(patterns, len(series), len(codebook), max_overlap)


def symbolize_batch(S: np.ndarray, codebook: Sequence[np.ndarray],
                    maxcompression: float = 0.5, maxexpansion: float = 2.0,
                    max_rangefactor: float = 2.0,
                    max_overlap: Optional[float] = None) -> np.ndarray:
    """``symbolize`` over a STACK of equal-length series: per motif ONE
    batched anti-diagonal DP builds every series' subsequence lattice
    (the same vectorized core the distance matrix uses), and Python
    handles only the O(#matches) kbest/claim selection per series.
    Bit-identical to per-series ``symbolize`` (asserted in tests);
    returns (B, m) int symbols."""
    from .subsequence import _kbest_loop, subseq_lattices_batch

    S = np.asarray(S, dtype=np.float64)
    if max_overlap is None:
        max_overlap = max(maxcompression, 1.0 / maxexpansion)
    noword = len(codebook)
    pats: List[List[Tuple[int, int, int, float]]] = [[] for _ in range(len(S))]
    for midx, motif in enumerate(codebook):
        motif = np.asarray(motif, dtype=np.float64)
        wps, matching, st = subseq_lattices_batch(motif, S)
        minl = math.floor(len(motif) * maxcompression)
        maxl = math.ceil(len(motif) * maxexpansion)
        for b in range(len(S)):
            for m in _kbest_loop(wps[b], matching[b], len(motif),
                                 st.adj_penalty, k=None, minlength=minl,
                                 maxlength=maxl,
                                 max_rangefactor=max_rangefactor):
                pats[b].append((midx, m.start, m.end + 1, m.value))
    return np.stack([_claim(p, S.shape[1], noword, max_overlap)
                     for p in pats])


def symbolize_min(series: np.ndarray, codebook: Sequence[np.ndarray],
                  maxcompression: float = 0.5,
                  maxexpansion: float = 2.0) -> np.ndarray:
    """Per-timepoint argmin assignment (reference align2 with agg_min,
    symbolization/alignment.py:56-81): each position takes the motif of
    the best-valued match covering it; uncovered → no-word symbol."""
    series = np.asarray(series, dtype=np.float64)
    n = len(series)
    k = len(codebook)
    scores = np.full((n, k + 1), np.inf)
    for midx, motif in enumerate(codebook):
        motif = np.asarray(motif, dtype=np.float64)
        for m in kbest_matches(
                motif, series, k=None,
                minlength=math.floor(len(motif) * maxcompression),
                maxlength=math.ceil(len(motif) * maxexpansion)):
            scores[m.start:m.end + 1, midx] = np.minimum(
                scores[m.start:m.end + 1, midx], m.value)
    finite = scores[:, :k][np.isfinite(scores[:, :k])]
    scores[:, k] = (finite.max() + 1) if len(finite) else 1.0
    return np.argmin(scores, axis=1).astype(int)


def hangover(symbols: np.ndarray, threshold: int = 4):
    """Run-length smoothing → (sequence of symbols+1, index ranges)
    (reference symbolization/alignment.py:171-195, 1-D variant)."""
    sequence, sequence_idx = [], []
    lastval, lastcnt, firstidx, lastsaved = None, 0, None, None
    for c, v in enumerate(symbols):
        if v != lastval:
            if lastcnt > threshold and lastval != lastsaved:
                sequence.append(int(lastval) + 1)
                sequence_idx.append((firstidx, c))
                lastsaved = lastval
            lastval = v
            lastcnt = 0
            firstidx = c
        else:
            lastcnt += 1
    return sequence, sequence_idx
