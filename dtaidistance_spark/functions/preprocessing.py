"""Series preprocessing as window/column expressions (reference
``preprocessing.py``; Spark mapping per SURVEY.md §2.7).

These operate on long-format point tables ``(series_id, ts|seq, value)``
with plain window functions — JVM-side, pushdown-friendly — instead of
the reference's per-array numpy calls.  Array-kernel twins for use inside
pandas UDFs live in ``kernels``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _w(order_col: str):
    return W.partitionBy("series_id").orderBy(order_col)


def differencing(points: DataFrame, order_col: str = "ts",
                 value_col: str = "value") -> DataFrame:
    """First differences (reference preprocessing.py:16-42, np.diff):
    value - lag(value); the first point of each series is dropped."""
    w = _w(order_col)
    return (points
            .withColumn("value_diff",
                        F.col(value_col) - F.lag(value_col).over(w))
            .where(F.col("value_diff").isNotNull()))


def derivative(points: DataFrame, order_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """Keogh DDTW derivative (reference preprocessing.py:91-138):
    ((q_i - q_{i-1}) + (q_{i+1} - q_{i-1}) / 2) / 2 — interior points only."""
    w = _w(order_col)
    prev = F.lag(value_col).over(w)
    nxt = F.lead(value_col).over(w)
    d = ((F.col(value_col) - prev) + (nxt - prev) / 2) / 2
    return (points.withColumn("value_deriv", d)
            .where(F.col("value_deriv").isNotNull()))


def znormal(points: DataFrame, value_col: str = "value") -> DataFrame:
    """Per-series z-normalization (reference preprocessing.py:194-206):
    (v - mean) / stddev over the whole series (population stddev)."""
    w = W.partitionBy("series_id")
    mean = F.avg(value_col).over(w)
    std = F.stddev_pop(value_col).over(w)
    return points.withColumn(
        "value_z",
        F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0)))


def logdomain(points: DataFrame, value_col: str = "value") -> DataFrame:
    """Signed log transform (reference preprocessing.py:141-160):
    sign(v) * log1p(|v|)."""
    v = F.col(value_col)
    return points.withColumn(
        "value_log", F.signum(v) * F.log1p(F.abs(v)))


def smoothing(points: DataFrame, order_col: str = "ts",
              value_col: str = "value", width: int = 5) -> DataFrame:
    """Low-pass smoothing. The reference uses a Butterworth filtfilt
    (preprocessing.py:45-88, needs scipy); the engine's declarative
    equivalent is a centered moving average of odd ``width`` — same role
    (pre-DTW noise reduction), different filter kernel, documented as a
    deliberate semantic deviation."""
    half = width // 2
    w = _w(order_col).rowsBetween(-half, half)
    return points.withColumn("value_smooth", F.avg(value_col).over(w))
