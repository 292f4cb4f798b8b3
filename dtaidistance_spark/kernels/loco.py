"""LocalConcurrences (LoCo): recurring-pattern mining on affinity
warping paths (reference subsequence/localconcurrences.py:328-1059;
based on §7.3.2 of Müller, Fundamentals of Music Processing, 2015).

The accumulated similarity matrix uses max-accumulation of
``exp(-gamma·diff²)`` with tau/delta thresholding:

    D(n,m) = max(0, S_tau(n,m) + max_steps(D(prev) − step_penalty))
    S_tau  = S if S ≥ tau else delta (+ delta_factor scaling of prev)

k-best matches repeatedly take the global argmax, trace the positive
ridge back (step penalties on non-diagonal moves), and negativize the
path (+ optional buffer) so later matches don't overlap.

Note: the reference's pure-Python ``best_matches`` requires the compiled
``loco_cc`` for its argmax buffer, so the iterative-match loop here is an
independent implementation of the same published procedure; the WP
matrix itself is oracle-checked against the reference pure-Python
``loco_warping_paths``.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from .extras import DetectKnee

STEPS_TYPES = {
    "TypeI": ((1, 1), (0, 1), (1, 0)),
    "TypeIII": ((1, 1), (1, 2), (2, 1)),
    "Diagonal": ((1, 1),),
}

__all__ = ["loco_warping_paths", "LocalConcurrences", "STEPS_TYPES"]


def loco_warping_paths(s1, s2, gamma: float = 1.0, tau: float = 0.0,
                       delta: float = 0.0, delta_factor: float = 1.0,
                       penalty: float = 0.0, window: Optional[int] = None,
                       psi=None, only_triu: bool = False,
                       step_type: str = "TypeI") -> np.ndarray:
    """Affinity accumulated-score matrix (reference
    localconcurrences.py:976-1025; the reference writes the cell at
    column offset ``inf_rows`` — a typo that is a no-op for TypeI where
    both offsets are 1; we use ``inf_cols``)."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    steps = STEPS_TYPES[step_type]
    penalty = penalty or 0.0
    penalties = [penalty if sr != sc else 0.0 for sr, sc in steps]
    r, c = len(s1), len(s2)
    if window is None or window == 0:
        window = max(r, c)
    if psi is None:
        psi_1b = psi_2b = 0
    elif isinstance(psi, int):
        psi_1b = psi_2b = psi
    else:
        psi_1b, psi_2b = psi
    inf_rows = max(sr for sr, _ in steps)
    inf_cols = max(sc for _, sc in steps)
    wps = np.full((r + inf_rows, c + inf_cols), -np.inf)
    wps[0:inf_rows, 0:psi_2b + inf_cols] = 0
    wps[0:psi_1b + inf_rows, 0:inf_cols] = 0
    if step_type == "TypeI":
        # Anti-diagonal vectorized sweep (the engine's standard DP
        # layout, kernels/dtw.py): the (0,1) "left" step reads the
        # current ROW — sequential in row-major order, but cell (i,j)
        # only depends on diagonals t-1 and t-2, so each anti-diagonal
        # is one vectorized update.  Same per-cell arithmetic as the
        # reference loop below → results identical (rtol 1e-12 pinned
        # vs the reference in tests/test_loco_symbol.py).
        M, N = max(0, r - c), max(0, c - r)
        rows = np.arange(r)
        js_lo = np.maximum(0, rows - M - window + 1)
        if only_triu:
            js_lo = np.maximum(rows, js_lo)
        js_hi = np.minimum(c, rows + N + window)  # exclusive
        for t in range(r + c - 1):
            i = np.arange(max(0, t - c + 1), min(r - 1, t) + 1)
            j = t - i
            keep = (j >= js_lo[i]) & (j < js_hi[i])
            i, j = i[keep], j[keep]
            if not len(i):
                continue
            d = np.exp(-gamma * (s1[i] - s2[j]) ** 2)
            prev = np.maximum(
                wps[i, j],
                np.maximum(wps[i + 1, j] - penalties[1],
                           wps[i, j + 1] - penalties[2]))
            low = delta + delta_factor * prev
            # python max(0, nan) is 0 (delta_factor=0 × -inf): replicate
            low = np.where(np.isnan(low), 0.0, np.maximum(0, low))
            wps[i + 1, j + 1] = np.where(d < tau, low,
                                         np.maximum(0, d + prev))
        return wps
    for i in range(r):
        j_start = max(0, i - max(0, r - c) - window + 1)
        if only_triu:
            j_start = max(i, j_start)
        j_end = min(c, i + max(0, c - r) + window)
        affin = np.exp(-gamma * (s1[i] - s2[j_start:j_end]) ** 2)
        for j in range(j_start, j_end):
            d = affin[j - j_start]
            prev = max(wps[i + inf_rows - sr, j + inf_cols - sc] - pen
                       for (sr, sc), pen in zip(steps, penalties))
            if d < tau:
                wps[i + inf_rows, j + inf_cols] = max(0, delta + delta_factor * prev)
            else:
                wps[i + inf_rows, j + inf_cols] = max(0, d + prev)
    return wps


class LocalConcurrences:
    """Reference-shaped LoCo driver (align → kbest_matches)."""

    def __init__(self, series1, series2=None, gamma: float = 1.0,
                 tau: float = 0.0, delta: float = 0.0,
                 delta_factor: float = 1.0, penalty: float = 0.0,
                 window: Optional[int] = None, only_triu: Optional[bool] = None,
                 step_type: str = "TypeI"):
        self.series1 = np.asarray(series1, dtype=np.float64)
        if series2 is None:
            self.series2 = self.series1
            self.only_triu = True if only_triu is None else only_triu
        else:
            self.series2 = np.asarray(series2, dtype=np.float64)
            self.only_triu = False if only_triu is None else only_triu
        self.gamma = gamma
        self.tau = tau
        self.delta = delta
        self.delta_factor = delta_factor
        self.penalty = penalty
        self.window = window
        self.steps = STEPS_TYPES[step_type]
        self.inf_rows = max(sr for sr, _ in self.steps)
        self.inf_cols = max(sc for _, sc in self.steps)
        self._wp: Optional[np.ndarray] = None

    # --- parameter estimation (reference :397-478) ---

    def estimate_settings(self, series=None, tau_factor: float = 0.33,
                          tau_type: str = "mean", gamma: Optional[float] = None):
        series = self.series1 if series is None else np.asarray(series)
        if tau_type == "abs":
            diffp = tau_factor
        else:
            diffm = float(np.std(series)) if tau_type == "std" \
                else float(np.mean(series))
            if gamma is None:
                assert diffm != 0
                self.gamma = 1.0 / diffm ** 2
            else:
                self.gamma = gamma
            diffp = tau_factor * diffm if tau_factor is not None else diffm
        self.tau = float(np.exp(-self.gamma * diffp ** 2))
        self.delta = -2 * self.tau
        self.delta_factor = 0.90
        self.penalty = self.tau / 10

    def estimate_settings_from_ssm(self, rho: float, set_penalty: bool = False,
                                   set_gamma: bool = False):
        sdm = np.subtract.outer(self.series1, self.series2)
        if set_gamma:
            m = float(np.mean(np.abs(sdm)))
            self.gamma = 1.0 if m == 0 else 1.0 / m ** 2
        ssm = np.exp(-self.gamma * sdm ** 2)
        if self.only_triu:
            self.tau = float(np.quantile(ssm[np.triu_indices(len(ssm))], rho))
        else:
            self.tau = float(np.quantile(ssm, rho))
        self.delta = -2 * self.tau
        self.delta_factor = 0.5
        if set_penalty:
            self.penalty = self.tau

    # --- alignment ---

    def align(self):
        if self._wp is not None:
            return
        self._wp = loco_warping_paths(
            self.series1, self.series2, gamma=self.gamma, tau=self.tau,
            delta=self.delta, delta_factor=self.delta_factor,
            penalty=self.penalty, window=self.window,
            only_triu=self.only_triu)
        self._reset_wp_mask()

    def _reset_wp_mask(self):
        # reference :512-535 (window-less variant + triu masking)
        wp = self._wp
        np.abs(wp, out=wp)
        wp[np.isinf(wp)] = -np.inf
        if self.window is not None:
            w = self.window
            il = np.tril_indices(n=wp.shape[0], k=-1 - w, m=wp.shape[1])
            wp[il] = -np.abs(wp[il])
            il = np.triu_indices(n=wp.shape[0], k=1 + w, m=wp.shape[1])
            wp[il] = -np.abs(wp[il])
            wp[np.isinf(wp)] = -np.inf
        if self.only_triu:
            il = np.tril_indices(wp.shape[0], k=-1)
            wp[il] = -np.inf

    # --- match extraction ---

    def best_path(self, row: int, col: int):
        """Trace the positive ridge back (reference :802-868)."""
        wp = self._wp
        penalties = [self.penalty if sr != sc else 0.0 for sr, sc in self.steps]
        i, j = row, col
        p = []
        while i > 0 and j > 0:
            p.append((i - self.inf_rows, j - self.inf_cols))
            values = []
            for (si, sj), pen in zip(self.steps, penalties):
                v = wp[i - si, j - sj]
                values.append(v + pen if v >= 0 else -1)
            c = int(np.argmax(values))
            if values[c] <= 0:
                break
            i -= self.steps[c][0]
            j -= self.steps[c][1]
        p.reverse()
        return p

    def kbest_matches(self, k: Optional[int] = 1, minlen: int = 2,
                      buffer: int = 0,
                      detectknee_alpha: Optional[float] = None
                      ) -> Iterator[dict]:
        """Iteratively yield {row, col, value, path}, negativizing each
        found path (+buffer) — reference :681-800 semantics."""
        self.align()
        wp = self._wp
        dk = DetectKnee(alpha=detectknee_alpha, invert=True,
                        alpha_onlyvar=detectknee_alpha / 100) \
            if detectknee_alpha is not None else None
        ki = 0
        while k is None or ki < k:
            found = None
            while found is None:
                flat = int(np.argmax(wp))
                r, c = np.unravel_index(flat, wp.shape)
                if r == 0 or c == 0 or wp[r, c] <= 0:
                    return
                value = float(wp[r, c])
                path = self.best_path(r, c)
                if dk is not None and dk.dostop(value, only_var=True):
                    return
                restart = False
                for (x, y) in path:
                    xx, yy = x + self.inf_rows, y + self.inf_cols
                    if wp[xx, yy] < 0:
                        restart = True
                        break
                    wp[xx, yy] = -abs(wp[xx, yy])
                if restart or len(path) < minlen:
                    continue
                found = {"row": int(r - self.inf_rows),
                         "col": int(c - self.inf_cols),
                         "value": value, "path": path}
            if buffer > 0:
                for p_idx, (x, y) in enumerate(found["path"]):
                    xx, yy = x + self.inf_rows, y + self.inf_cols
                    if p_idx < buffer:
                        cb = p_idx + 1
                    elif p_idx > len(found["path"]) - buffer:
                        cb = len(found["path"]) - p_idx
                    else:
                        cb = buffer
                    xl = max(self.inf_rows, xx - cb)
                    xr = min(xx + cb + 1, wp.shape[0])
                    yl = max(self.inf_cols, yy - cb)
                    yr = min(yy + cb + 1, wp.shape[1])
                    wp[xl:xr, yl:yr] = -np.abs(wp[xl:xr, yl:yr])
            ki += 1
            if dk is not None and dk.dostop(found["value"]):
                yield found
                return
            yield found
