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


def hampel(points: DataFrame, window: int = 3, nsigma: float = 3.0,
           series_col: str = "series_id", idx_col: str = "idx",
           y_col: str = "y") -> DataFrame:
    """Hampel filter — rolling-median outlier detection and repair
    (Pearson's classic robust despiking rule): a point is an outlier
    when it deviates from the median of its ±``window``-observation
    neighborhood by more than ``nsigma`` robust standard deviations
    (1.4826·MAD, the Gaussian consistency constant); outliers are
    replaced by the local median.  The mean/stddev z-score scan
    (functions/stats.py::anomaly_zscore) breaks down exactly when it
    matters — a large spike inflates the very σ it is tested against —
    while median/MAD have a 50% breakdown point.

    Windows are positional over each series' existing buckets in
    ``idx_col`` order (the observation-indexed contract of ``ewma``),
    always the full 2·window+1 points: edge points with truncated
    neighborhoods pass through unjudged (med/mad NULL, is_outlier
    false) rather than being tested against a biased shorter window.

    Plan: ONE exchange per series builds the ordered value array; the
    whole filter is within-row higher-order-function column algebra
    (slice / array_sort / element_at per position), no Python, no
    per-point window spill.  Exactness: integer-valued ``y`` makes the
    odd-length-window median and MAD exact halves, so the decision
    threshold is one fixed IEEE tree and SQL twins hash-match.

    Output: (series_id, idx, y, med, mad, is_outlier, y_clean).
    """
    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    full = 2 * w + 1
    arr = (points.groupBy(F.col(series_col).alias("series_id")).agg(
        F.array_sort(F.collect_list(F.struct(
            F.col(idx_col).cast("long").alias("i"),
            F.col(y_col).cast("double").alias("v")))).alias("a"))
        .select("series_id",
                F.expr("transform(a, x -> x.i)").alias("idxs"),
                F.expr("transform(a, x -> x.v)").alias("vals"))
        .withColumn("n", F.size("vals")))
    # per 0-based position p: full window [p-w, p+w] when interior.
    # Two passes — medians first, then MADs referencing the finished
    # meds array — because Spark does not CSE across HOF lambda
    # scopes: inlining the median into the per-element MAD lambda
    # re-sorts the window 2w+1 extra times per position
    med = (f"element_at(array_sort(slice(vals, p - {w} + 1, {full})), "
           f"{w + 1})")
    meds = F.expr(
        f"transform(sequence(0, n - 1), p -> CASE "
        f"WHEN p >= {w} AND p <= n - 1 - {w} THEN {med} "
        f"ELSE CAST(NULL AS DOUBLE) END)")
    mads = F.expr(
        f"transform(sequence(0, n - 1), p -> CASE "
        f"WHEN p >= {w} AND p <= n - 1 - {w} THEN "
        f"element_at(array_sort(transform("
        f"slice(vals, p - {w} + 1, {full}), "
        f"v -> abs(v - element_at(meds, p + 1)))), {w + 1}) "
        f"ELSE CAST(NULL AS DOUBLE) END)")
    ex = (arr.withColumn("meds", meds)
          .withColumn("mads", mads)
          .select("series_id", F.posexplode(
              F.expr("arrays_zip(idxs, vals, meds, mads)"))
              .alias("p", "z"))
          .select("series_id",
                  F.col("z.idxs").alias("idx"),
                  F.col("z.vals").alias("y"),
                  F.col("z.meds").alias("med"),
                  F.col("z.mads").alias("mad")))
    is_out = (F.col("med").isNotNull() &
              (F.abs(F.col("y") - F.col("med"))
               > F.lit(float(nsigma)) * F.lit(1.4826) * F.col("mad")))
    return (ex.withColumn("is_outlier", is_out)
            .withColumn("y_clean",
                        F.when(F.col("is_outlier"), F.col("med"))
                        .otherwise(F.col("y"))))
