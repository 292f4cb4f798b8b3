"""Distributed visual downsampling: LTTB + M4.

``downsample_lttb`` (kernels/downsample.py::lttb): per-series
sequential greedy selection → one ``applyInPandas`` group per series
(the engine's per-series-kernel shape, same as compression).  The
shuffle is one hash exchange on series_id; each task holds only its
series' points, O(n) memory; output is n_out rows per series.

``downsample_m4``: the declarative counterpart (Jugel et al.,
VLDB 2014) — pure window-rank column algebra, zero Python, ≤ 4·buckets
rows per series.  Both give downstream stages (plotting exports,
dashboards) a corpus whose size depends on n_series × n_out only,
regardless of the input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

def downsample_m4(points: DataFrame, n_buckets: int,
                  series_col: str = "series_id",
                  ts_col: str = "bucket_ts",
                  value_col: str = "value") -> DataFrame:
    """M4 visualization-oriented downsampling (Jugel, Markl et al.,
    "M4: A Visualization-Oriented Time Series Data Aggregation",
    VLDB 2014 — the width-aware min/max/first/last aggregation
    TimescaleDB and most dashboards use for lossless line rendering).

    Complements :func:`downsample_lttb` at the opposite end of the
    declarative spectrum: LTTB's greedy triangle selection is inherently
    sequential (per-series Arrow kernel), while M4 is PURE column
    algebra — the whole operator is one hash exchange + window ranks,
    entirely JVM-side / whole-stage-codegen-friendly, no Python
    anywhere.  At 100 TB that makes M4 the scale path for plot exports:
    output is ≤ 4·n_buckets rows per series regardless of input size.

    Semantics (deterministic, engine-portable):

    * each series' time span is split into ``n_buckets`` equal-width
      buckets over integer microsecond epochs:
      ``k = min(n-1, (t - t0)·n div (t1 - t0))`` — all-integer math, so
      both engines compute the identical bucket id;
    * per (series, bucket) the FIRST (min t), LAST (max t), MIN-value
      and MAX-value points are kept; value ties break to the earliest
      point; a point holding several roles appears once, flagged by the
      ``is_first/is_last/is_min/is_max`` booleans;
    * a single-point span (t1 == t0) degenerates to bucket 0.

    Plan shape: Exchange(series) → Window(series: t0/t1 span) →
    Window(series, bucket: 4 ranks — the bucket partition is a
    refinement of the series partition, so Spark inserts sorts but NO
    second exchange) → filter.  One shuffle total.
    """
    from pyspark.sql import Window, functions as F

    n = int(n_buckets)
    if n < 1:
        raise ValueError("n_buckets must be >= 1")
    w_series = Window.partitionBy(series_col)
    pts = (points.select(series_col, ts_col, value_col)
           .withColumn("_t", F.unix_micros(F.col(ts_col)))
           .withColumn("_t0", F.min("_t").over(w_series))
           .withColumn("_t1", F.max("_t").over(w_series))
           .withColumn(
               "bucket",
               F.when(F.col("_t1") == F.col("_t0"), F.lit(0)).otherwise(
                   F.least(F.lit(n - 1),
                           F.expr(f"(_t - _t0) * {n} div (_t1 - _t0)"))
               ).cast("int")))
    wb = Window.partitionBy(series_col, "bucket")
    ranked = (pts
              .withColumn("_rf", F.row_number().over(
                  wb.orderBy(F.col("_t").asc())))
              .withColumn("_rl", F.row_number().over(
                  wb.orderBy(F.col("_t").desc())))
              .withColumn("_rmin", F.row_number().over(
                  wb.orderBy(F.col(value_col).asc(), F.col("_t").asc())))
              .withColumn("_rmax", F.row_number().over(
                  wb.orderBy(F.col(value_col).desc(), F.col("_t").asc()))))
    return (ranked
            .where((F.col("_rf") == 1) | (F.col("_rl") == 1)
                   | (F.col("_rmin") == 1) | (F.col("_rmax") == 1))
            .select(series_col, "bucket", ts_col, value_col,
                    (F.col("_rf") == 1).alias("is_first"),
                    (F.col("_rl") == 1).alias("is_last"),
                    (F.col("_rmin") == 1).alias("is_min"),
                    (F.col("_rmax") == 1).alias("is_max")))


def smooth_asap(points: DataFrame, max_window: int = 100,
                series_col: str = "series_id",
                ts_col: str = "bucket_ts",
                value_col: str = "value") -> DataFrame:
    """ASAP smoothing (Rong & Bailis, VLDB 2017; kernels/asap.py):
    per series, pick the sliding-mean window that minimizes roughness
    while preserving kurtosis, and emit the smoothed series — one row
    per valid window position, stamped with the chosen ``window``.
    The i-th smoothed value is anchored to the timestamp of the
    window's FIRST point (positions are contiguous, so any other
    anchoring is a fixed shift).  One ``applyInPandas`` per series
    (the window search is global to the series), single hash exchange
    — the same per-series-kernel plan shape as LTTB."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)

    base = points.select(series_col, ts_col,
                         F.col(value_col).cast("double").alias(value_col))
    # value column forced to double: the smoothed means are fractional,
    # and an integer-typed passthrough schema would let Arrow truncate
    # them silently
    schema = StructType(
        [f if f.name != value_col
         else StructField(value_col, DoubleType(), True)
         for f in base.schema.fields]
        + [StructField("window", IntegerType(), False)])

    def pick(pdf):
        from ..kernels.asap import asap_smooth

        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        v = pdf[value_col].values.astype("float64")
        w, s = asap_smooth(v, max_window)
        out = pdf.iloc[: len(s)][[series_col, ts_col]].copy()
        out[value_col] = s
        out["window"] = w
        return out

    return base.groupBy(series_col).applyInPandas(pick, schema=schema)
