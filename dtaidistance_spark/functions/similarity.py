"""Distance → similarity transforms as column expressions (reference
``similarity.py:7-173``; Spark mapping per SURVEY.md §2.5).

``distance_to_similarity`` supports the reference's three methods with
the same formulas; the calibration radius ``r`` defaults to the max
distance (matrix-wide aggregate) like the reference's default, or a
quantile via ``percentile_approx`` for sketch-cheap calibration at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distance_to_similarity(dist: DataFrame, d_col: str = "d",
                           method: str = "exponential",
                           r: float | None = None,
                           quantile: float | None = None) -> DataFrame:
    """similarity column from a distance column.

    Methods (reference similarity.py:30-66):
    * exponential: exp(-d / r)
    * gaussian:    exp(-d² / r²)
    * reciprocal:  1 / (1 + d/r)
    * reverse:     (r - d) / r  (clipped at 0)
    """
    if r is None:
        agg = F.expr(f"percentile_approx({d_col}, {quantile})") if quantile \
            else F.max(F.col(d_col))
        r_val = dist.where(~F.isnan(d_col) & (F.col(d_col) != float("inf")))\
            .agg(agg.alias("r")).collect()[0]["r"]
    else:
        r_val = r
    d = F.col(d_col)
    if method == "exponential":
        sim = F.exp(-d / F.lit(r_val))
    elif method == "gaussian":
        sim = F.exp(-(d * d) / F.lit(r_val * r_val))
    elif method == "reciprocal":
        sim = F.lit(1.0) / (F.lit(1.0) + d / F.lit(r_val))
    elif method == "reverse":
        sim = F.greatest((F.lit(r_val) - d) / F.lit(r_val), F.lit(0.0))
    else:
        raise ValueError(f"unknown method: {method}")
    return dist.withColumn("similarity", F.round(sim, 6))


def squash(dist: DataFrame, d_col: str = "d", method: str = "logistic",
           x0: float = 0.0, k: float = 1.0) -> DataFrame:
    """Squash values into [0, 1] (reference similarity.py:81-173):
    logistic 1/(1+exp(-k(x-x0))) or gaussian exp(-(x-x0)²/k²)."""
    x = F.col(d_col)
    if method == "logistic":
        sq = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(k) * (x - F.lit(x0))))
    elif method == "gaussian":
        sq = F.exp(-((x - F.lit(x0)) ** 2) / F.lit(k * k))
    else:
        raise ValueError(f"unknown method: {method}")
    return dist.withColumn("squashed", F.round(sq, 6))
