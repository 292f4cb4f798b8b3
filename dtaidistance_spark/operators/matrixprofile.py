"""Distributed matrix profile over a series-arrays table.

One Arrow ``mapInPandas`` pass over the ``values array<double>`` series
table (kernels/matrixprofile.py does the per-series O(n²/chunk) work):
series are independent, so the operator adds ZERO shuffles beyond the
series build and parallelizes perfectly — at 100 TB the profile cost
is Σ nᵢ² per series, embarrassingly parallel across the corpus, and
each task holds only its own series' O(chunk·k) working set.  For the
cross-series (AB-join) regime use the existing subsequence-search
operators; this is the self-join motif/discord primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def matrix_profile(series: DataFrame, m: int, excl: int | None = None,
                   series_col: str = "series_id",
                   values_col: str = "values") -> DataFrame:
    """Per-series self-join matrix profile.

    Output: one row per admissible window — ``series_id``, ``i``
    (1-based window start), ``mp_dist`` (z-normalized ED to the nearest
    non-trivial neighbour window), ``mp_idx`` (that neighbour's 1-based
    start).  Windows with no admissible neighbour are dropped.
    """

    def prof(batches):
        import numpy as np
        import pandas as pd

        from ..kernels.matrixprofile import matrix_profile_1d

        for pdf in batches:
            out = {"series_id": [], "i": [], "mp_dist": [], "mp_idx": []}
            for sid, vals in zip(pdf["series_id"], pdf["vals"]):
                d, j = matrix_profile_1d(np.asarray(vals, dtype=float),
                                         m, excl)
                keep = j >= 0
                kk = int(keep.sum())
                if not kk:
                    continue
                idx = np.flatnonzero(keep)
                out["series_id"].extend([sid] * kk)
                out["i"].extend((idx + 1).tolist())
                out["mp_dist"].extend(d[keep].tolist())
                out["mp_idx"].extend((j[keep] + 1).tolist())
            yield pd.DataFrame(out, columns=["series_id", "i",
                                             "mp_dist", "mp_idx"])

    return (series
            .select(F.col(series_col).alias("series_id"),
                    F.col(values_col).alias("vals"))
            .mapInPandas(prof,
                         "series_id string, i int, "
                         "mp_dist double, mp_idx int"))


def _profile_head(profile: DataFrame, k: int, excl: int, kind: str):
    schema = ("series_id string, rank int, i int, j int, dist double"
              if kind == "motif" else
              "series_id string, rank int, i int, dist double")

    def pick(pdf):
        import numpy as np
        import pandas as pd

        from ..kernels.matrixprofile import topk_discords, topk_motifs

        n = int(pdf["i"].max())
        d = np.full(n, np.inf)
        j = np.full(n, -1, dtype=np.int64)
        d[pdf["i"].values - 1] = pdf["mp_dist"].values
        j[pdf["i"].values - 1] = pdf["mp_idx"].values - 1
        sid = pdf["series_id"].iloc[0]
        if kind == "motif":
            rows = [(sid, r, i + 1, jj + 1, v)
                    for (r, i, jj, v) in topk_motifs(d, j, k, excl)]
            cols = ["series_id", "rank", "i", "j", "dist"]
        else:
            rows = [(sid, r, i + 1, v)
                    for (r, i, v) in topk_discords(d, j, k, excl)]
            cols = ["series_id", "rank", "i", "dist"]
        return pd.DataFrame(rows, columns=cols)

    return profile.groupBy("series_id").applyInPandas(pick, schema=schema)


def motif_topk(profile: DataFrame, k: int = 3,
               excl: int | None = None, m: int | None = None) -> DataFrame:
    """Greedy top-k motifs per series from a ``matrix_profile`` result
    (kernels/matrixprofile.py::topk_motifs — lowest profile value,
    then both members' ±excl trivial-match zones suppressed).  The
    profile rows per series are tiny (n−m+1), so this is one cheap
    ``applyInPandas`` over the already-distributed profile; pass the
    same ``excl`` the profile used — when only ``m`` is given the
    default mirrors ``matrix_profile_1d``'s own m//4 zone."""
    if excl is None:
        if m is None:
            raise ValueError("pass excl or m")
        excl = max(1, int(m) // 4)
    return _profile_head(profile, int(k), int(excl), "motif")


def discord_topk(profile: DataFrame, k: int = 3,
                 excl: int | None = None, m: int | None = None) -> DataFrame:
    """Greedy top-k discords per series from a ``matrix_profile``
    result (highest profile value, ±excl suppression after each
    pick; the ``m``-derived default matches the profile's m//4)."""
    if excl is None:
        if m is None:
            raise ValueError("pass excl or m")
        excl = max(1, int(m) // 4)
    return _profile_head(profile, int(k), int(excl), "discord")
