"""PAA + SAX symbolic representation — within-row column algebra.

Piecewise Aggregate Approximation and Symbolic Aggregate approXimation
(Lin, Keogh, Wei, Lonardi, "Experiencing SAX: a novel symbolic
representation of time series", DMKD 2007).  SAX is the classic
symbolic time-series representation and the natural companion of the
reference's symbolization module (reference
``symbolization/__init__.py`` SymbolAlignment assigns *learned* motif
symbols; SAX assigns *distributional* symbols — together they cover
both symbolization regimes a transcript-series user reaches for).

Engine-portable exactness strategy (the same trick the stats family
uses): the inputs are integer-valued count series, and every segment is
exactly ``m = n div w`` points (the trailing ``n mod w`` points are
dropped, documented), so

* segment sums are exact integers in float64 → order-independent in
  both engines;
* the z-normalization of the w segment sums runs on INTEGER sufficient
  statistics (S = Σsᵢ, SS = Σsᵢ²) through one fixed IEEE expression
  tree ``z = (s - S/w) / sqrt((w·SS - S·S)/w²)`` → bit-identical in
  Spark and DuckDB;
* symbols cut the z values at the published N(0,1) breakpoint table
  (strict ``<``; a degenerate all-equal series has variance 0 and maps
  every segment to the symbol holding z = 0).

Spark surface: pure within-row higher-order functions (transform /
slice / aggregate) on the ``values array<double>`` series table — NO
shuffle and NO Python beyond plan construction; the per-segment long
format is one ``posexplode`` projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# N(0,1) equiprobable breakpoints, alphabet sizes 2..8 (Lin et al. 2007,
# Table 3; values as commonly published to 4 decimals so both engines
# parse the identical literal doubles).
BREAKPOINTS = {
    2: [0.0],
    3: [-0.43, 0.43],
    4: [-0.6745, 0.0, 0.6745],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
}

_ALPHA = "abcdefgh"


def paa_sax(series: DataFrame, w: int, alphabet: int = 4,
            series_col: str = "series_id",
            values_col: str = "values") -> DataFrame:
    """PAA + SAX over a series-arrays table.

    Input: one row per series with ``values array<double>`` (integer
    counts for exact cross-engine arithmetic) and ``n int`` length.
    Output long format, one row per (series, segment):

    ``(series_id, k int, seg_sum double, z double, sym string,
    word string)`` — ``seg_sum`` the exact integer segment sum, ``z``
    the z-normalized PAA coefficient, ``sym`` the SAX symbol, ``word``
    the w-char SAX word repeated on each row (computed within-row, no
    window).  Series shorter than ``w`` points are dropped.
    """
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(BREAKPOINTS)}")
    w = int(w)
    if w < 2:
        raise ValueError("w must be >= 2")

    bps = BREAKPOINTS[alphabet]
    # z -> symbol as a nested CASE over the breakpoints (strict <)
    sym_case = "CASE"
    for i, b in enumerate(bps):
        sym_case += f" WHEN z < CAST({b!r} AS DOUBLE) THEN '{_ALPHA[i]}'"
    sym_case += f" ELSE '{_ALPHA[len(bps)]}' END"

    df = (series
          .select(series_col, values_col)
          .withColumn("n", F.size(values_col))
          .where(F.col("n") >= w)
          # m points per segment; the trailing n mod w points drop
          .withColumn("m", F.expr(f"n div {w}"))
          .withColumn("segs", F.expr(
              f"transform(sequence(0, {w - 1}), "
              f"k -> aggregate(slice({values_col}, k * m + 1, m), "
              f"CAST(0.0 AS DOUBLE), (a, x) -> a + x))"))
          .withColumn("sum1", F.expr(
              "aggregate(segs, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"))
          .withColumn("sum2", F.expr(
              "aggregate(segs, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"))
          # NB: the lambda variable must not collide with the sum1/sum2
          # columns — SQL identifiers are case-insensitive and lambda
          # args shadow columns inside higher-order functions
          .withColumn("zs", F.expr(
              f"transform(segs, sv -> CASE "
              f"WHEN {w}.0 * sum2 - sum1 * sum1 > 0.0 "
              f"THEN (sv - sum1 / {w}.0) "
              f"     / sqrt(({w}.0 * sum2 - sum1 * sum1) / {float(w * w)!r}) "
              f"ELSE 0.0 END)"))
          .withColumn("syms", F.expr(
              f"transform(zs, z -> {sym_case})"))
          .withColumn("word", F.expr("concat_ws('', syms)")))
    return (df
            .select(series_col, "word",
                    F.posexplode(F.arrays_zip("segs", "zs", "syms"))
                    .alias("k", "seg"))
            .select(series_col,
                    F.col("k").cast("int").alias("k"),
                    F.col("seg.segs").alias("seg_sum"),
                    F.round(F.col("seg.zs"), 6).alias("z"),
                    F.col("seg.syms").alias("sym"),
                    "word"))
