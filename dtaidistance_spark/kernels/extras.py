"""Additional reference-parity kernels: MSM metric, weighted DTW,
EWMA knee detection, path post-processing, path penalty variants."""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .dtw import DtwSettings, best_path, warping_paths
from .preprocessing import derivative

__all__ = ["msm_distance", "weighted_warping_paths", "DetectKnee",
           "distance_from_path", "points_in_path_with_min_diff",
           "warping_path_penalty"]


def msm_distance(x, y, sm_cost: float = 0.1) -> float:
    """Move-Split-Merge metric (Stefan/Athitsos/Das, TKDE 2012) —
    reference msm.py:19-57.  NOTE: the reference implementation indexes
    its main loop as cost[i∈range(n)][j∈range(m)] on an (m, n) matrix,
    which is only consistent for equal-length inputs; this
    implementation uses the correct (len(x), len(y)) recurrence and
    matches the reference exactly when len(x) == len(y)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    def c(a, b, cc):
        if (b <= a <= cc) or (b >= a >= cc):
            return sm_cost
        return sm_cost + min(abs(a - b), abs(a - cc))

    m, n = len(x), len(y)
    cost = np.zeros((m, n))
    cost[0, 0] = abs(x[0] - y[0])
    for i in range(1, m):
        cost[i, 0] = cost[i - 1, 0] + c(x[i], x[i - 1], y[0])
    for j in range(1, n):
        cost[0, j] = cost[0, j - 1] + c(y[j], x[0], y[j - 1])
    for i in range(1, m):
        for j in range(1, n):
            cost[i, j] = min(
                cost[i - 1, j - 1] + abs(x[i] - y[j]),
                cost[i - 1, j] + c(x[i], x[i - 1], y[j]),
                cost[i, j - 1] + c(y[j], x[i], y[j - 1]))
    return float(cost[m - 1, n - 1])


def weighted_warping_paths(s1, s2, weights: Optional[np.ndarray] = None,
                           window: Optional[int] = None):
    """Weighted DTW (reference dtw_weighted.py:56-118): the local
    difference |s1[i]-s2[j]| is reshaped by a per-point 8-knot piecewise
    ("LeRu-like") weight profile before squaring.  Reference quirks kept:
    ``window`` is incremented by one when given, and the returned
    distance reads cell [l1-1, l2-1] of the sqrt'd matrix."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    l1, l2 = len(s1), len(s2)
    if window is None:
        window = max(l1, l2)
    else:
        window += 1
    paths = np.full((l1 + 1, l2 + 1), np.inf)
    paths[0, 0] = 0.0
    for i in range(l1):
        j_start = max(0, i - max(0, l1 - l2) - window + 1)
        j_end = min(l2, i + max(0, l2 - l1) + window)
        for j in range(j_start, j_end):
            d = s1[i] - s2[j]
            if weights is not None:
                xn3, xn2, xn1, xn0, xp0, xp1, xp2, xp3 = weights[i, :]
                if d < 0:
                    x0, x1, x2, x3 = xn0, xn1, xn2, xn3
                    d = -d
                else:
                    x0, x1, x2, x3 = xp0, xp1, xp2, xp3
                if d <= x0:
                    d = 0
                elif x0 < d < x1:
                    d *= (d - x0) / (x1 - x0)
                elif x2 <= d:
                    a = 1 if (np.isinf(x3) or x3 == x1) else 2 / (x3 - x2)
                    d *= (1 + a * (d - x2))
            paths[i + 1, j + 1] = d ** 2 + min(paths[i, j + 1],
                                               paths[i + 1, j], paths[i, j])
    paths = np.sqrt(paths)
    return float(paths[l1 - 1, l2 - 1]), paths


class DetectKnee:
    """EWMA-based knee/stop detection for decreasing/increasing match
    streams — reference util.py:373-455 semantics."""

    def __init__(self, alpha: float = 0.3, invert: bool = False,
                 alpha_onlyvar: float = 0.0, thr_value: Optional[float] = None):
        self.cnt = 0
        self.min_points = 3
        self.thr_value = thr_value if thr_value is not None else 0
        self.arrvar_fraction = 4
        self.alpha = alpha
        self.alpha_onlyvar = alpha_onlyvar
        self.arr = None
        self.arrvar = None
        self.invert = invert
        self.invert_value = None

    def dostop(self, value: float, only_var: bool = False) -> bool:
        if self.arr is None:
            if self.invert:
                self.invert_value = value
                self.thr_value = value - self.thr_value
                value = 0
            self.arr = value
            self.arrvar = 0
            return False
        elif self.invert:
            value = self.invert_value - value
        rvalue = False
        max_thr = self.arr + self.arrvar_fraction * self.arrvar
        if self.cnt >= self.min_points and value > self.thr_value \
                and value > max_thr:
            rvalue = True
        if only_var:
            self.arrvar = (1.0 - self.alpha_onlyvar) * self.arrvar
        else:
            self.arrvar = (self.alpha * max(0, value - self.arr)
                           + (1.0 - self.alpha) * self.arrvar)
            self.arr = self.alpha * value + (1.0 - self.alpha) * self.arr
            self.cnt += 1
        return rvalue


def distance_from_path(ts1, ts2, path, inner_dist: str = "squared euclidean",
                       relaxed: bool = True) -> float:
    """Distance along a given warping path (reference
    postprocessing.py:17-58), with the derivative-relaxed variant that
    allows each point to slide within its sampling interval."""
    ts1 = np.asarray(ts1, dtype=np.float64)
    ts2 = np.asarray(ts2, dtype=np.float64)
    sq = inner_dist == "squared euclidean"
    idist = (lambda a, b: (a - b) ** 2) if sq else (lambda a, b: abs(a - b))
    if relaxed:
        d1, d2 = derivative(ts1), derivative(ts2)
    dist = 0.0
    for i_f, i_t in path:
        if not relaxed:
            dist += idist(ts1[i_f], ts2[i_t])
            continue
        a1 = ts1[i_f] - d1[i_f] * 0.5
        a2 = ts1[i_f] + d1[i_f] * 0.5
        b1 = ts2[i_t] - d2[i_t] * 0.5
        b2 = ts2[i_t] + d2[i_t] * 0.5
        dist += min(idist(a1, b1), idist(a1, b2), idist(a2, b1), idist(a2, b2))
    return math.sqrt(dist) if sq else dist


def points_in_path_with_min_diff(ts1, ts2, path, min_diff: float,
                                 relaxed: bool = True):
    """Path points whose warped-pair difference exceeds min_diff
    (reference postprocessing.py:61-93)."""
    ts1 = np.asarray(ts1, dtype=np.float64)
    ts2 = np.asarray(ts2, dtype=np.float64)
    points = []
    for i_f, i_t in path:
        diff = abs(ts1[i_f] - ts2[i_t])
        if diff <= min_diff:
            continue
        if not relaxed:
            points.append((i_f, i_t))
            continue
        if 0 < i_f < len(ts1) - 1:
            dr = ((ts1[i_f] - ts1[i_f - 1]) + (ts1[i_f + 1] - ts1[i_f - 1]) / 2) / 2
        else:
            dr = 1
        if 0 < i_t < len(ts2) - 1:
            ds = ((ts2[i_t] - ts2[i_t - 1]) + (ts2[i_t + 1] - ts2[i_t - 1]) / 2) / 2
        else:
            ds = 1
        a1, a2 = ts1[i_f] - dr * 0.5, ts1[i_f] + dr * 0.5
        b1, b2 = ts2[i_t] - ds * 0.5, ts2[i_t] + ds * 0.5
        diff = min(abs(a1 - b1), abs(a1 - b2), abs(a2 - b1), abs(a2 - b2))
        if diff > min_diff:
            points.append((i_f, i_t))
    return points


def warping_path_penalty(s1, s2, penalty_post: float = 0.0,
                         settings: Optional[DtwSettings] = None, **kwargs):
    """DTW warping path with an additional post-hoc penalty per
    non-diagonal step (reference dtw.py:1069-1096): returns
    [path, total distance incl. penalties]."""
    s = settings if settings is not None else DtwSettings(**kwargs)
    _, paths = warping_paths(s1, s2, settings=s)
    path = best_path(paths)
    s1a = np.asarray(s1, dtype=np.float64)
    s2a = np.asarray(s2, dtype=np.float64)
    dist = 0.0
    for k, (i, j) in enumerate(path):
        dist += (s1a[i] - s2a[j]) ** 2
        if k > 0 and (path[k - 1][0] == i or path[k - 1][1] == j):
            dist += penalty_post
    return path, math.sqrt(dist)
