"""sktime / sklearn distance-callable adapter.

Parity target: reference connectors/sktime.py:17-38 — a plain callable
``dtw_distance(x, y)`` usable as the ``distance`` argument of
sktime's ``KNeighborsTimeSeriesClassifier`` (or any sklearn metric
slot).  sktime hands each series as a column-major ``(n, 1)`` array;
the adapter takes column 0 and delegates to this package's own DTW
kernel — no sktime import is required (the contract is only the
callable's signature), so the module works whether or not sktime is
installed.

This is driver-side single-pair glue by design: the distributed path
for many series is ``operators/matrix.py`` (all-pairs) and the UDF
kernels; the connector exists so estimator libraries that want a
scalar ``f(x, y) -> float`` can reuse the exact same kernel the
distributed operators run.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..kernels.dtw import DtwSettings, dtw_distance as _kernel_distance


def dtw_distance(x: np.ndarray, y: np.ndarray,
                 dtw_settings: Optional[dict] = None, **kwargs) -> float:
    """sklearn/sktime-compatible DTW distance (reference sktime.py:17-33).

    ``x`` / ``y`` are sktime panel cells: column-major ``(n, 1)``
    arrays (a 1-D array is also accepted).  ``dtw_settings`` maps to
    :class:`DtwSettings` fields (window, psi, penalty, ...).
    """
    if dtw_settings is None:
        dtw_settings = {}
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # sktime hands a column of values; the kernels expect a row
    if x.ndim == 2:
        x = x[:, 0]
    if y.ndim == 2:
        y = y[:, 0]
    return _kernel_distance(x, y, DtwSettings(**dtw_settings))


def dtw_distance_create(**dtw_settings):
    """Bind settings once, get a 2-arg callable (reference sktime.py:36-38)."""
    def dtw_distance_fn(x, y, **kwargs):
        return dtw_distance(x, y, dtw_settings, **kwargs)
    return dtw_distance_fn
