"""Distributed LTTB downsampling (kernels/downsample.py::lttb).

Per-series sequential selection → one ``applyInPandas`` group per
series (the engine's per-series-kernel shape, same as compression).
The shuffle is one hash exchange on series_id; each task holds only its
series' points, O(n) memory; output is n_out rows per series —
downstream stages (plotting exports, dashboards) read a corpus whose
size is n_series × n_out regardless of the input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def downsample_lttb(points: DataFrame, n_out: int,
                    series_col: str = "series_id",
                    ts_col: str = "bucket_ts",
                    value_col: str = "value") -> DataFrame:
    """Keep the ``n_out`` shape-defining points of each series."""
    schema = points.select(series_col, ts_col, value_col).schema

    def pick(pdf):
        import numpy as np

        from ..kernels.downsample import lttb

        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        # integer-second epochs: exact in float64 (ns ints are not)
        t = (pdf[ts_col].values.astype("datetime64[ns]").view("int64")
             // 10**9).astype(np.float64)
        v = pdf[value_col].values.astype(np.float64)
        idx = lttb(t, v, n_out)
        return pdf.iloc[idx][[series_col, ts_col, value_col]]

    return (points.select(series_col, ts_col, value_col)
            .groupBy(series_col).applyInPandas(pick, schema=schema))
