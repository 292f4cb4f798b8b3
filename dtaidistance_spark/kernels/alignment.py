"""Needleman-Wunsch global sequence alignment (pure numpy).

Reference semantics: alignment.py:21-100 — min-edit formulation (match
-1, mismatch/indel +1 internally minimized; the public matrix/value are
negated so higher is better), scipy-free DP with full traceback.
Golden fixture: GATTACA × GCATGCU (alignment.py:52-66).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

__all__ = ["needleman_wunsch", "best_alignment", "make_substitution",
           "read_substitution_dict"]


def _default_sub(a, b) -> Tuple[float, float]:
    return (-1.0 if a == b else 1.0), 1.0


def make_substitution(matrix: dict, gap: float = 1.0, opt: str = "max"
                      ) -> Callable:
    """Substitution function from a dict (reference
    alignment.py:103-132): values are negated when the matrix maximizes
    similarity; missing pairs fall back to match/mismatch defaults."""
    modifier = -1.0 if opt == "max" else 1.0

    def fn(a, b):
        if (a, b) in matrix:
            return matrix[(a, b)] * modifier, gap
        if (b, a) in matrix:
            return matrix[(b, a)] * modifier, gap
        return _default_sub(a, b)[0], gap

    return fn


def read_substitution_dict(path: str) -> dict:
    """Parse a BLOSUM-style substitution matrix text file (reference
    util.py:153-177): header row of symbols, one row per symbol."""
    matrix = {}
    with open(path) as f:
        lines = [ln for ln in f if ln.strip() and not ln.startswith("#")]
    header = lines[0].split()
    for ln in lines[1:]:
        parts = ln.split()
        row_sym = parts[0]
        for col_sym, v in zip(header, parts[1:]):
            matrix[(row_sym, col_sym)] = float(v)
    return matrix


def needleman_wunsch(s1: Sequence, s2: Sequence,
                     substitution: Optional[Callable] = None):
    """Returns ``(value, scores)`` with the reference's sign convention:
    ``scores`` is the negated min-edit matrix (match +1 on the diagonal),
    ``value = scores[-1, -1]`` negated edit distance."""
    sub = substitution or _default_sub
    r, c = len(s1), len(s2)
    m = np.zeros((r + 1, c + 1))
    m[0, :] = np.arange(c + 1)   # border: indels (alignment.py:78-83)
    m[:, 0] = np.arange(r + 1)
    for i in range(1, r + 1):
        for j in range(1, c + 1):
            d, gap = sub(s1[i - 1], s2[j - 1])
            m[i, j] = min(m[i - 1, j - 1] + d,
                          m[i - 1, j] + gap,
                          m[i, j - 1] + gap)
    return -m[r, c], -m


def best_alignment(scores: np.ndarray, s1: Sequence, s2: Sequence,
                   gap: str = "-",
                   substitution: Optional[Callable] = None):
    """Traceback of the optimal alignment (reference alignment.py:135-197;
    default preference order diagonal, up, left).  Takes the *negated*
    scores returned by :func:`needleman_wunsch`."""
    sub = substitution or _default_sub
    m = -scores  # back to the minimizing domain
    i, j = len(s1), len(s2)
    p = [(i - 1, j - 1)]
    while i > 0 and j > 0:
        d, gp = sub(s1[i - 1], s2[j - 1])
        if np.isclose(m[i, j], m[i - 1, j - 1] + d):
            i, j = i - 1, j - 1
        elif np.isclose(m[i, j], m[i - 1, j] + gp):
            i -= 1
        else:
            j -= 1
        p.append((i - 1, j - 1))
    while i > 0:
        i -= 1
        p.append((i - 1, j - 1))
    while j > 0:
        j -= 1
        p.append((i - 1, j - 1))
    s1a, s2a = [], []
    s1ip, s2ip = p[0]
    for s1i, s2i in p[1:]:
        if s1i != s1ip and s2i != s2ip:
            s1a.append(s1[s1ip])
            s2a.append(s2[s2ip])
        elif s1i == s1ip:
            s1a.append(gap)
            s2a.append(s2[s2ip])
        else:
            s1a.append(s1[s1ip])
            s2a.append(gap)
        s1ip, s2ip = s1i, s2i
    s1a.reverse()
    s2a.reverse()
    p.pop()
    p.reverse()
    return p, s1a, s2a
