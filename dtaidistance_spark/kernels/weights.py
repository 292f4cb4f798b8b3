"""Learnable weighted-DTW weights — the weight-LEARNING half of the
reference's ``dtw_weighted`` module (dtw_weighted.py:155-678 +
``DecisionTreeClassifier``/``Tree`` :680-1004), which the r1 survey had
listed only by its ``distance_matrix`` entry.

Pipeline (reference semantics, re-expressed):

1. ``path_features``: align every series to the prototype (the module's
   own unweighted ``warping_paths`` variant — kernels/extras.py
   ``weighted_warping_paths`` with ``weights=None``) and aggregate the
   per-prototype-index signed differences into 2·len(prototype)
   features (mean negative / mean positive deviation per index), while
   collecting must-link value lists.  This is the distributed part —
   one path per (series, prototype) pair, embarrassingly parallel; the
   Spark surface is ``operators/weights.py::learn_weights``.
2. ``DecisionTreeClassifier``: the reference's explainable two-class
   tree — split quality = information gain × (1 + kd/max_kd) where kd
   is the k-distance density of the threshold; BFS node expansion;
   per-path feature reuse switch.  Driver-side: the feature matrix is
   (n_series+1) × 2·len(prototype) — tiny next to the corpus.
3. ``dt_onewindow`` / ``dt_windows``: boosting-style ensemble — each
   round fits a tree on the not-yet-used features, converts its pure
   cannot-link leaves into per-index thresholds
   (``decisiontree_to_clweights``: the negated-disjunction reading of
   class-1 leaves), and down-weights later rounds (0.66^round), or the
   windowed variant scoring per-window trees and keeping the top band.
4. ``compute_weights_from_mlclvalues``: per prototype index, clean the
   must-link max / cannot-link min (``_clean_max``/``_clean_min``) and
   lay out the 8-knot rectifier profile (xn3..xn0, xp0..xp3) that
   ``weighted_warping_paths`` consumes.

Parity: every stage is pinned against the reference implementation in
tests/test_weights.py (the reference's own test fixtures for the split
/ kdistance / tree, plus end-to-end ``compute_weights_using_dt``
equality on labeled series; ``np.int`` in the reference needs a
documented test-side alias shim under numpy>=1.24).
"""

from __future__ import annotations

import math
from collections import defaultdict, deque
from typing import Dict, List, Optional, Tuple

import numpy as np

from .dtw import best_path
from .extras import weighted_warping_paths

__all__ = [
    "DecisionTreeClassifier", "Tree", "path_features", "series_to_dt",
    "compute_weights_from_mlclvalues", "compute_weights_using_dt",
    "decisiontree_to_clweights", "dt_onewindow", "dt_windows",
]


class Tree:
    """Array-of-columns decision-tree container (sklearn-layout
    compatible, as the reference's Tree — dtw_weighted.py:939)."""

    def __init__(self):
        self.threshold: List[float] = []
        self.feature: List[int] = []
        self.children_right: List[int] = []
        self.children_left: List[int] = []
        self.value: List[np.ndarray] = []
        self.impurity: List[float] = []
        self.n_node_samples: List[int] = []
        self.kd: List[float] = []
        self.add()

    def add(self) -> int:
        self.threshold.append(-1)
        self.feature.append(-1)
        self.children_right.append(-1)
        self.children_left.append(-1)
        self.value.append(np.array([[0, 0]], dtype=float))
        self.impurity.append(-1)
        self.n_node_samples.append(-1)
        self.kd.append(-1)
        return len(self.feature) - 1

    def last(self) -> int:
        return len(self.feature) - 1

    @property
    def nb_nodes(self) -> int:
        return len(self.threshold)

    @property
    def used_features(self) -> set:
        return set(self.feature)

    @property
    def depth(self) -> int:
        best = 1
        q = deque([(0, 1)])
        while q:
            idx, d = q.popleft()
            best = max(best, d)
            if self.children_left[idx] != -1:
                q.append((self.children_left[idx], d + 1))
            if self.children_right[idx] != -1:
                q.append((self.children_right[idx], d + 1))
        return best


class DecisionTreeClassifier:
    """Two-class explainable tree: information gain × k-distance
    density split criterion (reference dtw_weighted.py:680)."""

    def __init__(self):
        self.tree_: Optional[Tree] = None
        self.n_features_: Optional[int] = None

    @staticmethod
    def entropy(targets: np.ndarray) -> float:
        n = len(targets)
        if n == 0:
            raise ValueError("empty targets")
        prob = np.sum(targets) / n
        if prob == 0 or prob == 1:
            return 0.0
        return -prob * math.log(prob) - (1.0 - prob) * math.log(1.0 - prob)

    @staticmethod
    def informationgain_continuous(targets, values, h0=None):
        """Best threshold by information gain over unique-value
        midpoints (first minimum wins)."""
        if h0 is None:
            h0 = DecisionTreeClassifier.entropy(targets)
        thresholds = np.unique(values)
        thresholds = (thresholds[1:] + thresholds[:-1]) / 2
        n = len(values)
        h1_min, th_min = np.inf, None
        for threshold in thresholds:
            mask = values <= threshold
            prob = np.sum(mask) / n
            h1 = prob * DecisionTreeClassifier.entropy(targets[mask]) + \
                (1.0 - prob) * DecisionTreeClassifier.entropy(targets[~mask])
            if h1 < h1_min:
                h1_min = h1
                th_min = threshold
        ig = 0 if th_min is None else h0 - h1_min
        return ig, th_min, h0

    @staticmethod
    def kdistance(values, threshold, k: int = 5) -> float:
        """Distance from the threshold to its k-th nearest value — the
        density measure that prefers splits in sparse regions."""
        dists = np.sort(np.abs(np.asarray(values, dtype=float).ravel()
                               - threshold))
        k = min(k, len(dists))
        return float(dists[k - 1])

    def fit(self, features, targets, use_feature_once: bool = True,
            ignore_features=None, min_ig: float = 0):
        features = np.asarray(features, dtype=float)
        targets = np.asarray(targets)
        nb_features = features.shape[1]
        nb_instances = features.shape[0]
        self.n_features_ = nb_features
        k = int(math.ceil(len(targets) * 0.005))
        self.tree_ = Tree()
        queue = deque([(self.tree_.last(),
                        np.zeros(nb_features, dtype=bool),
                        np.ones(nb_instances, dtype=bool))])
        while queue:
            node, used_ftrs, idxs = queue.popleft()
            nb_samples = int(np.sum(idxs))
            targetsum = np.sum(targets[idxs])
            self.tree_.value[node][0, 1] = targetsum
            self.tree_.value[node][0, 0] = nb_samples - targetsum
            self.tree_.n_node_samples[node] = nb_samples
            if np.all(targets[idxs]) or not np.any(targets[idxs]):
                self.tree_.impurity[node] = 0
                continue
            curvalues = features[idxs, :]
            curtargets = targets[idxs]
            h0 = self.entropy(curtargets)
            all_gains = []
            max_kd = 0.0
            for fi in range(nb_features):
                if (use_feature_once and used_ftrs[fi]) or \
                        (ignore_features is not None
                         and fi in ignore_features):
                    continue
                ig, thr, _ = self.informationgain_continuous(
                    curtargets, curvalues[:, fi], h0=h0)
                if thr is None or ig < min_ig:
                    continue
                kd = self.kdistance(curvalues[:, fi], thr, k=k)
                max_kd = max(max_kd, kd)
                all_gains.append((fi, ig, thr, kd))
            best_gain, best_fi, best_thr, best_kd = 0, None, None, None
            for fi, ig, thr, kd in all_gains:
                gain = ig * (1 + (kd / max_kd) ** 1)
                if best_gain < gain:
                    best_gain, best_fi, best_thr, best_kd = gain, fi, thr, kd
            self.tree_.impurity[node] = h0
            if best_fi is not None:
                self.tree_.kd[node] = best_kd
                leq_idxs = idxs & (features[:, best_fi] <= best_thr)
                used_ftrs = used_ftrs.copy()
                used_ftrs[best_fi] = True
                self.tree_.feature[node] = best_fi
                self.tree_.threshold[node] = best_thr
                left = self.tree_.add()
                queue.append((left, used_ftrs, leq_idxs))
                self.tree_.children_left[node] = left
                right = self.tree_.add()
                queue.append((right, used_ftrs,
                              idxs & (features[:, best_fi] > best_thr)))
                self.tree_.children_right[node] = right
        return self

    def avg_impurity(self) -> float:
        vals = [self.tree_.impurity[i]
                for i in range(len(self.tree_.feature))
                if self.tree_.feature[i] == -1]
        return sum(vals) / len(vals)

    def score(self, max_kd: float) -> float:
        """Leaf-purity score weighted by the branch's densest split
        (reference :905)."""
        sum_w, cnt = 0.0, 0
        q = deque([(0, 0.0)])
        while q:
            idx, branch_max_kd = q.popleft()
            il = self.tree_.children_left[idx]
            ir = self.tree_.children_right[idx]
            if il == -1 and ir == -1:
                sum_w += (1.0 - self.tree_.impurity[idx]) \
                    * (1 + (branch_max_kd / max_kd) ** 1)
                cnt += 1
            else:
                ncsum = max(branch_max_kd, self.tree_.kd[idx])
                q.append((il, ncsum))
                q.append((ir, ncsum))
        return sum_w / cnt

    def set_features(self, features: List[int]) -> None:
        for i in range(len(self.tree_.feature)):
            if self.tree_.feature[i] != -1:
                self.tree_.feature[i] = features[self.tree_.feature[i]]

    # ensemble sorting only compares the (score, -nb_nodes) prefix
    def __eq__(self, other):
        return True

    def __lt__(self, other):
        return False


def path_features(prototype: np.ndarray, series: np.ndarray,
                  label: int, wp_params: Optional[dict] = None):
    """One series' feature row vs the prototype: per prototype index,
    mean negative / mean positive matched difference along the optimal
    path, plus the must-link value lists (reference series_to_dt inner
    loop, dtw_weighted.py:198-230).  This is the distributed unit —
    everything else operates on the tiny aggregated feature matrix."""
    n = len(prototype)
    # the reference's warping_paths variant consumes only `window` and
    # swallows the other DTW params (dtw_weighted.py:56 **_kwargs)
    wp = {k: v for k, v in (wp_params or {}).items() if k == "window"}
    _, paths = weighted_warping_paths(np.asarray(prototype, dtype=float),
                                      np.asarray(series, dtype=float),
                                      None, **wp)
    path = best_path(paths)
    feats = np.zeros(n * 2, dtype=float)
    cnts = np.zeros(n * 2, dtype=int)
    ml_n: Dict[int, List[float]] = defaultdict(list)
    ml_p: Dict[int, List[float]] = defaultdict(list)
    for i_to, i_from in path:
        d = prototype[i_to] - series[i_from]
        if label == 1:
            if d < 0:
                ml_n[i_to].append(-d)
            elif d > 0:
                ml_p[i_to].append(d)
        if d <= 0:
            feats[i_to * 2] += -d
            cnts[i_to * 2] += 1
        if d >= 0:
            feats[i_to * 2 + 1] += d
            cnts[i_to * 2 + 1] += 1
    cnts[cnts == 0] = 1
    return np.divide(feats, cnts), ml_n, ml_p


def series_to_dt(series, labels, prototypeidx, classifier=None,
                 max_clfs=None, min_ig=0, ignore_idxs=None,
                 patternlen=None, min_purity=1.0, **kwargs):
    """Feature extraction + tree-ensemble learning (reference
    dtw_weighted.py:170-280, minus the Graphviz export)."""
    ignore_idxs = ignore_idxs or set()
    wp_params = {key: kwargs[key] for key in
                 {"window", "max_dist", "max_step", "max_length_diff",
                  "penalty", "psi"}.intersection(kwargs.keys())}
    proto = np.asarray(series[prototypeidx], dtype=float)
    features = [[0] * (len(proto) * 2)]
    targets = [0]
    ml_values = defaultdict(lambda: ([], []))
    for idx, label in enumerate(labels):
        if idx in ignore_idxs:
            continue
        feats, ml_n, ml_p = path_features(
            proto, np.asarray(series[idx], dtype=float), label, wp_params)
        for i, vals in ml_n.items():
            ml_values[i][0].extend(vals)
        for i, vals in ml_p.items():
            ml_values[i][1].extend(vals)
        features.append(feats)
        if label == 0:
            targets.append(1)      # cannot-link → do not cluster
        elif label == 1:
            targets.append(0)      # must-link → do cluster
        else:
            raise ValueError(f"label must be 0 or 1, got {label}")
    classifier = classifier or DecisionTreeClassifier
    features = np.array(features)
    targets = np.array(targets)
    if patternlen is not None:
        cl_values, clfs, importances = dt_windows(
            features, targets, classifier, patternlen, max_clfs, min_ig,
            min_purity)
    else:
        cl_values, clfs, importances = dt_onewindow(
            features, targets, classifier, max_clfs, min_ig, min_purity)
    return ml_values, cl_values, clfs, importances


def dt_onewindow(features, targets, classifier, max_clfs, min_ig,
                 min_purity):
    """Boosting-style rounds over remaining features (reference :340)."""
    cl_values: dict = {}
    clfs = []
    ignore_features: set = set()
    clf_w = 1.0
    importances = defaultdict(lambda: [0, 0])
    while not (max_clfs is not None and len(clfs) >= max_clfs):
        clf = classifier()
        clf.fit(features, targets, ignore_features=ignore_features,
                min_ig=min_ig)
        if clf.tree_.nb_nodes <= 1:
            break
        clfs.append(clf)
        new_cl_values, used_features = decisiontree_to_clweights(
            clf, min_purity)
        if not used_features:
            used_features.update(clf.tree_.used_features)
        update_cl_values(cl_values, new_cl_values)
        update_importances(importances, new_cl_values, clf_w)
        ignore_features.update(used_features)
        clf_w *= 0.66
    return cl_values, clfs, importances


def dt_windows(features, targets, classifier, patternlen, max_clfs,
               min_ig, min_purity):
    """Sliding half-overlapping windows of patternlen features, top
    score band kept (reference :281)."""
    cl_values: dict = {}
    candidates = []
    importances = defaultdict(lambda: [0, 0])
    nb_indices = features.shape[1] // 2
    max_kd = 0.0
    for idx in range(0, int(nb_indices - patternlen / 2),
                     int(patternlen / 2)):
        idx_s = idx * 2
        idx_e = idx_s + patternlen * 2
        clf = classifier()
        clf.fit(features[:, idx_s:idx_e], targets, ignore_features=set(),
                min_ig=min_ig)
        if clf.tree_.nb_nodes <= 1:
            continue
        clf.set_features(list(range(idx_s, idx_e)))
        max_kd = max(max_kd, float(np.max(clf.tree_.kd)))
        candidates.append(clf)
    scored = sorted(((clf.score(max_kd), -clf.tree_.nb_nodes, clf)
                     for clf in candidates), reverse=True)
    if not scored:
        # no window produced a splittable tree (all-one-class labels or
        # patternlen beyond the usable features): return the empty
        # ensemble instead of the reference's IndexError (ADVICE r4) —
        # compute_weights_from_mlclvalues handles empty cl_values
        return cl_values, [], importances
    min_score = scored[-1][0]
    max_score = scored[0][0]
    minallowed = max_score - (max_score - min_score) / 5
    use = 1
    while len(scored) > use and minallowed > scored[use][0]:
        max_score = scored[use][0]
        minallowed = max_score - (max_score - min_score) / 5
        use += 1
    kept = [t for t in scored if t[0] >= minallowed]
    if max_clfs is not None:
        kept = kept[:max_clfs]
    ignore_features: set = set()
    for clf_score, _nn, clf in kept:
        new_cl_values, used_features = decisiontree_to_clweights(
            clf, min_purity)
        update_cl_values(cl_values, new_cl_values)
        # numpy scalar division: a single-window ensemble has
        # max_score == min_score and the weight degenerates to nan
        # exactly as in the reference (which divides numpy floats)
        update_importances(importances, new_cl_values,
                           np.float64(clf_score - min_score)
                           / np.float64(max_score - min_score))
        ignore_features.update(used_features)
    return cl_values, kept, importances


def update_cl_values(cl_values, new_cl_values):
    for idx, (n, p) in new_cl_values.items():
        if idx not in cl_values:
            cl_values[idx] = [n, p]
        else:
            cl_values[idx][0].extend(n)
            cl_values[idx][1].extend(p)


def update_importances(importances, new_cl_values, weight):
    for idx, (n, p) in new_cl_values.items():
        if n:
            importances[idx][0] = max(weight, importances[idx][0])
        if p:
            importances[idx][1] = max(weight, importances[idx][1])


def decisiontree_to_clweights(clf, min_purity: float = 1.0):
    """Pure class-1 (cannot-link) leaves → per-index thresholds via the
    negated-disjunction reading (reference :387)."""
    dtnodes = deque([(0, [])])
    cl_values = defaultdict(lambda: ([], []))
    used_features: set = set()
    while dtnodes:
        curnode, path = dtnodes.popleft()
        if clf.tree_.children_left[curnode] == -1 and \
                clf.tree_.children_right[curnode] == -1:
            value = clf.tree_.value[curnode][0]
            purity = value[1] / (value[0] + value[1])
            if purity >= min_purity:
                used_features.update(
                    clweights_updatefrompath(cl_values, path))
        else:
            threshold = clf.tree_.threshold[curnode]
            feature = clf.tree_.feature[curnode]
            dtnodes.append((clf.tree_.children_left[curnode],
                            path + [(feature, threshold, True)]))
            dtnodes.append((clf.tree_.children_right[curnode],
                            path + [(feature, threshold, False)]))
    return cl_values, used_features


def clweights_updatefrompath(cl_values, path):
    used_features = set()
    for feature, threshold, leq in path:
        if not leq:  # only the f > t branches assert a cannot-link bound
            index = feature // 2
            dneg = (feature % 2) == 0
            cl_values[index][0 if dneg else 1].append(threshold)
            used_features.add(feature)
    return used_features


def _clean_max(mls, cls):
    """Max must-link value smaller than every cannot-link value."""
    mls.sort()
    cls.sort()
    min_cls = cls[0] if cls else np.inf
    max_mls = 0
    for ml in mls:
        if ml > min_cls:
            return max_mls
        if ml > max_mls:
            max_mls = ml
    return max_mls


def _clean_min(cls, mls, keep_largest=True):
    """Min cannot-link value larger than every must-link value."""
    mls.sort()
    cls.sort()
    min_cls = np.inf
    max_mls = mls[-1] if mls else 0
    for cl in reversed(cls):
        if cl < max_mls:
            break
        if cl < min_cls:
            min_cls = cl
    if keep_largest and np.isinf(min_cls) and cls:
        min_cls = cls[-1]
    return min_cls


def compute_weights_from_mlclvalues(serie, ml_values, cl_values,
                                    only_max=False, strict_cl=True,
                                    **_kwargs):
    """Rectifier weight profile per prototype index (reference :441):
    knots at 0.5·/1.5· the cleaned must-link max and 0.9·/1.0· the
    cleaned cannot-link min, negative and positive sides separate."""
    n = len(serie)
    wn = np.zeros((n, 8), dtype=float)
    wn[:, 0:2] = np.inf
    wn[:, 6:8] = np.inf
    maxmin = np.zeros((2, n, 3))
    for side in (0, 1):
        for idx in range(n):
            mls = list(ml_values[idx][side]) if idx in ml_values else []
            cls = list(cl_values[idx][side]) if idx in cl_values else []
            ml_max = _clean_max(mls, cls)
            cl_min = _clean_min(cls, mls, strict_cl)
            diff = 0 if np.isinf(cl_min) else cl_min - ml_max
            maxmin[side, idx, :] = [ml_max, cl_min, diff]
    if only_max:
        for side in (0, 1):
            maxval = np.max(maxmin[side, :, 2])
            maxidx = maxmin[side, :, 2] == maxval
            vals = maxmin[side, :, 1][maxidx]
            maxmin[side, :, 1] = np.inf
            maxmin[side, :, 1][maxidx] = vals
    for idx in range(n):
        knots = []
        for side in (0, 1):
            v1 = 1.5 * maxmin[side, idx, 0]
            v3 = maxmin[side, idx, 1]
            if v1 > v3:
                v1 = v3
            v0 = 0.5 * v1
            v2 = 0.9 * v3
            if v2 < v1:
                v1 = v2 = (v1 + v2) / 2
            knots.append((v0, v1, v2, v3))
        (vn0, vn1, vn2, vn3), (vp0, vp1, vp2, vp3) = knots
        wn[idx, :] = [vn3, vn2, vn1, vn0, vp0, vp1, vp2, vp3]
    return wn


def compute_weights_using_dt(series, labels, prototypeidx, **kwargs):
    """End-to-end: features → tree ensemble → rectifier weights
    (reference dtw_weighted.py:155)."""
    ml_values, cl_values, _clfs, importances = series_to_dt(
        series, labels, prototypeidx, **kwargs)
    weights = compute_weights_from_mlclvalues(
        np.asarray(series[prototypeidx], dtype=float), ml_values,
        cl_values, **kwargs)
    return weights, importances
