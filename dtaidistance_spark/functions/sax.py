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

def sax_mindist_pairs(words: DataFrame, n: int, w: int,
                      alphabet: int = 4,
                      series_col: str = "series_id",
                      word_col: str = "word") -> DataFrame:
    """MINDIST between all ordered pairs of SAX words (Lin et al. 2007,
    eq. 6): the lower-bounding distance

    ``MINDIST(Q̂, Ĉ) = sqrt(n/w) · sqrt(Σₖ cell(q̂ₖ, ĉₖ)²)``

    where ``cell(r, c) = 0`` for adjacent-or-equal symbols and
    ``β_{max(r,c)-1} − β_{min(r,c)}`` otherwise (the breakpoint-table
    lookup).  MINDIST lower-bounds the true Euclidean distance of the
    z-normalized series — the SAX-space analogue of ``lb_keogh``: a
    symbolic prefilter for similarity search over the word table
    (filter ``mindist <= r`` before exact re-ranking).

    Pure JVM: the per-character cell distances are one zip_with +
    aggregate over the two words' char arrays (split on '') after a
    triangular self-join on the (small) words table; ``n`` is the
    original series length, ``w`` the word length.  Deterministic,
    engine-portable (same breakpoint literals as :func:`paa_sax`).
    """
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(BREAKPOINTS)}")
    bps = BREAKPOINTS[alphabet]
    # dist(r, c) lookup as a flat CASE over symbol-index pairs: indices
    # via ascii offset from 'a'
    cases = []
    for r in range(alphabet):
        for c in range(alphabet):
            if abs(r - c) <= 1:
                continue
            d = bps[max(r, c) - 1] - bps[min(r, c)]
            cases.append(f"WHEN __RI__ = {r} AND __CI__ = {c} "
                         f"THEN CAST({d!r} AS DOUBLE)")
    cell = ("CASE " + " ".join(cases) + " ELSE 0.0 END") if cases \
        else "0.0"

    a = words.select(F.col(series_col).alias("sid_a"),
                     F.col(word_col).alias("word_a"))
    b = words.select(F.col(series_col).alias("sid_b"),
                     F.col(word_col).alias("word_b"))
    pairs = a.join(b, F.col("sid_a") < F.col("sid_b"))
    # cell(x, y): chars -> 0-based symbol indices via ascii offset, then
    # the squared breakpoint-gap lookup, summed across the w positions
    cell_sq = cell.replace("__RI__", "(ascii(x) - 97)") \
                  .replace("__CI__", "(ascii(y) - 97)")
    return (pairs
            .withColumn("mindist", F.expr(
                f"sqrt({n} / {float(w)!r}) * sqrt(aggregate("
                f"zip_with(slice(split(word_a, ''), 1, {w}), "
                f"         slice(split(word_b, ''), 1, {w}), "
                f"(x, y) -> power({cell_sq}, 2)), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"))
            .select(F.col("sid_a").alias("i"), F.col("sid_b").alias("j"),
                    "mindist"))
