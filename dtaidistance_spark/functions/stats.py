"""Per-series statistical aggregates over point/bucket series — the
descriptive-analytics family a time-series engine is expected to ship
next to its rollups (the public TimescaleDB-toolkit ``stats_agg``
contract plus the classic series diagnostics):

* ``linreg_stats`` — per-group least-squares line fit (slope,
  intercept, Pearson correlation) from single-pass sufficient
  statistics (n, Σx, Σy, Σx², Σy², Σxy) — the ``stats_agg`` →
  ``slope()/intercept()/corr()`` contract.
* ``autocorr`` — per-series Pearson autocorrelation at integer bucket
  lags, with *time-lag* pairing semantics: a pair (yₜ, yₜ₊ₖ) exists
  only when both buckets exist, so gaps drop pairs instead of
  misaligning the series (the statsmodels ``acf(missing='drop')``
  pairing, not the observation-shift one).
* ``ewma`` — trailing-window exponentially weighted moving average in
  the normalized (pandas ``ewm(adjust=True)``) form over the last
  ``window`` *observations* of each series.
* ``cusum_changepoint`` — per-series CUSUM drift scan: the running
  deviation of the prefix sum from the global trend line
  (Sₖ − k·Sₙ/n), reporting the bucket where |CUSUM| peaks (the
  classic Page/Taylor single-changepoint location estimate).
* ``period_strength`` — per-series periodicity detection by phase
  folding (Stellingwerf 1978 PDM in ANOVA variance-ratio form): for
  each candidate period dividing the window, the fraction of series
  variance explained by the phase means — trig-free, so the score is
  a single division of exact int64 sufficient statistics.
* ``seasonal_decompose`` — classical additive seasonal-trend
  decomposition (the statsmodels contract): centered-MA trend,
  zero-centered phase-mean seasonal, residual — int64-scaled
  detrending plus an explicit phase-ordered fold keep all three
  components bit-equal across engines.
* ``holt_linear`` — Holt 1957 double exponential smoothing (level +
  trend + h-step forecasts, optional Gardner-McKenzie damping) as a
  sequential JVM aggregate-HOF fold per series; a recursive CTE
  replays the identical IEEE op sequence, so the states are
  bit-equal with no integer scaling.
* ``baseline_forecasts`` — the FPP §5.2 benchmark forecasters
  (naive / seasonal-naive / drift) as exact array selections over
  the same one-collect plan.
* ``cross_corr`` — the cross-correlation function (CCF) between
  series pairs at integer bucket lags: ``autocorr``'s two-series
  generalization, the classic lead/lag diagnostic, with the pair
  list broadcast onto the scan.

Plans: ``linreg_stats`` is ONE map-side-partial hash aggregation;
``autocorr`` and ``ewma`` are equi-joins on a shifted bucket/rank key
(the lag/depth expansion is a bounded explode of ≤ |lags| / ``window``
rows, so the join stays an ordinary shuffled hash join — no range
join, no window spill); ``cusum_changepoint`` is two stacked per-series
windows (running sum + argmax rank) over a single series exchange.
No Python anywhere, so every operator runs at scan speed at 100 TB;
the per-series windows inherit the skew remedy of the latency ingest
(`operators/ingest._latency_lag_salted`) if one series dominates.

Exactness contract (what makes the DuckDB driver oracles bit-equal):
with integer-valued ``x``/``y`` the sufficient statistics are exact
integers, and every derived value is a fixed tree of IEEE ops over
exact inputs — identical in any engine.  Correlations divide by
``sqrt(d1)*sqrt(d2)`` (NOT ``sqrt(d1*d2)``: the product can exceed
2⁵³ long before either factor does); EWMA restricts exactness to
``alpha`` with a power-of-two complement (0.5, 0.75, …) where
``pow(1-alpha, d)`` is exact, and to value·window bit-budgets ≤ 53.

The reference library has no notion of timestamps (SURVEY.md §1.1) —
these are engine-native additions on the rollup layer, not ports.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_D = "double"


def _corr_expr(n, sx, sy, sxx, syy, sxy):
    """Pearson r from exact sufficient statistics: num / (√d1·√d2).

    The two-sqrt form keeps every intermediate ≤ 2⁵³ for realistic
    integer inputs (d1·d2 overflows the exact-double range ~quadratically
    earlier), and both Spark and DuckDB evaluate the identical op tree,
    so the result is bit-equal across engines."""
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    return F.when((d1 > 0) & (d2 > 0),
                  num / (F.sqrt(d1) * F.sqrt(d2)))


def linreg_stats(
    points: DataFrame,
    group_cols: Sequence[str],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group least-squares fit of ``y`` on ``x`` (the public
    TimescaleDB-toolkit ``stats_agg(y, x)`` 2-D contract):

    * ``slope``     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    * ``intercept`` = (Σy − slope·Σx) / n
    * ``corr``      = Pearson r of (x, y)
    * ``n``         = points in the group

    NULL slope/intercept when all x coincide (vertical fit), NULL corr
    when either variance is zero.  ONE hash aggregation with map-side
    partials — the cheapest possible plan, same shape as the rollup
    tiers.  Sums are computed in double; with integer-valued inputs
    they are exact (see module docstring) and the outputs bit-equal
    any other engine evaluating the same formulas.
    """
    x = F.col(x_col).cast(_D)
    y = F.col(y_col).cast(_D)
    agg = points.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_D).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxx, syy, sxy = F.col("_sxx"), F.col("_syy"), F.col("_sxy")
    den = n * sxx - sx * sx
    slope = F.when(den > 0, (n * sxy - sx * sy) / den)
    intercept = F.when(den > 0, (sy - ((n * sxy - sx * sy) / den) * sx) / n)
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        _corr_expr(n, sx, sy, sxx, syy, sxy).alias("corr"),
    )


def autocorr(
    points: DataFrame,
    lags: Sequence[int],
    series_col: str = "series_id",
    idx_col: str = "idx",
    y_col: str = "y",
) -> DataFrame:
    """Per-series Pearson autocorrelation at integer bucket lags.

    ``idx`` is the integer bucket index (e.g. epoch-hours); for each
    lag k the pair set is {(yᵢ, yᵢ₊ₖ) : both buckets present} — gaps
    drop pairs (time-lag semantics).  Output one row per (series, lag)
    with ``n_pairs`` and ``acf`` (NULL when either side of the pair
    set has zero variance or fewer than 2 pairs).

    Plan: the lag list is a bounded literal explode on the probe side,
    then ONE shuffled equi-join on (series, idx+lag) == (series, idx)
    and ONE hash aggregation — no window, no range join, scales as
    |lags| · |points|.
    """
    lag_arr = F.array(*[F.lit(int(k)) for k in lags])
    a = (points.select(
            F.col(series_col).alias("_s"),
            F.col(idx_col).cast("long").alias("_i"),
            F.col(y_col).cast(_D).alias("_ya"))
         .withColumn("lag", F.explode(lag_arr))
         .withColumn("_j", F.col("_i") + F.col("lag")))
    b = points.select(
        F.col(series_col).alias("_s"),
        F.col(idx_col).cast("long").alias("_j"),
        F.col(y_col).cast(_D).alias("_yb"))
    pairs = a.join(b, ["_s", "_j"])
    g = pairs.groupBy(F.col("_s").alias(series_col), "lag").agg(
        F.count(F.lit(1)).cast(_D).alias("_n"),
        F.sum("_ya").alias("_sx"),
        F.sum("_yb").alias("_sy"),
        F.sum(F.col("_ya") * F.col("_ya")).alias("_sxx"),
        F.sum(F.col("_yb") * F.col("_yb")).alias("_syy"),
        F.sum(F.col("_ya") * F.col("_yb")).alias("_sxy"),
    )
    return g.select(
        series_col, "lag",
        F.col("_n").cast("long").alias("n_pairs"),
        _corr_expr(F.col("_n"), F.col("_sx"), F.col("_sy"),
                   F.col("_sxx"), F.col("_syy"), F.col("_sxy"))
        .alias("acf"),
    )


def ewma(
    points: DataFrame,
    alpha: float = 0.5,
    window: int = 16,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Trailing-window normalized EWMA per series (pandas
    ``ewm(alpha, adjust=True)`` over the last ``window`` observations):

        ewmaₙ = Σⱼ₌₀^{min(n,W)−1} (1−α)ʲ·yₙ₋ⱼ / Σⱼ (1−α)ʲ

    Observation-indexed (the j-th *previous row* of the series, not the
    j-th previous bucket), so gaps compress rather than zero-fill —
    the streaming-smoother convention.

    Plan: rank each series once (one exchange), explode each row into
    its ≤ ``window`` future depth slots (bounded literal explode), then
    ONE shuffled equi-join on (series, rank) and ONE hash aggregation —
    the same join shape as :func:`autocorr`, chosen over a
    collect_list window frame so the weight of each contribution is an
    explicit join key (engine-order-independent, hence oracle-exact
    for power-of-two ``1−alpha``: every term yⱼ·(1−α)ᵈ is an exact
    double and the ≤53-bit sum is order-free).

    Output: (series, order_col, n_obs, ewma).
    """
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    if window < 1:
        raise ValueError("window must be >= 1")
    decay = F.lit(1.0 - alpha)
    w = W.partitionBy(series_col).orderBy(order_col)
    ranked = points.select(
        F.col(series_col).alias("_s"),
        F.col(order_col).alias("_o"),
        F.col(y_col).cast(_D).alias("_y"),
        F.row_number().over(w).alias("_rn"),
    )
    depth = F.array(*[F.lit(d) for d in range(window)])
    contrib = (ranked
               .withColumn("_d", F.explode(depth))
               .select("_s", "_y", "_d",
                       (F.col("_rn") + F.col("_d")).alias("_tgt")))
    cur = ranked.select("_s", "_o", F.col("_rn").alias("_tgt"))
    joined = cur.join(contrib, ["_s", "_tgt"])
    wgt = F.pow(decay, F.col("_d").cast(_D))
    out = joined.groupBy(F.col("_s").alias(series_col),
                         F.col("_o").alias(order_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        (F.sum(F.col("_y") * wgt) / F.sum(wgt)).alias("ewma"),
    )
    return out


def histogram(
    points: DataFrame,
    lo: float,
    hi: float,
    nbins: int,
    group_cols: Sequence[str] = ("series_id", "bucket_ts"),
    y_col: str = "y",
) -> DataFrame:
    """Per-group fixed-width histogram (the public TimescaleDB
    ``histogram(value, lo, hi, nbins)`` contract): bin 0 is the
    underflow (y < lo), bins 1..nbins cover [lo, hi) uniformly, bin
    nbins+1 is the overflow (y ≥ hi).  Output is LONG format — one row
    per non-empty (group, bin) with its count — so the result scales
    with occupancy, not with groups × bins.

    Plan: a two-branch CASE projection + ONE map-side-partial hash
    aggregation; the bin expression is the identical IEEE tree in the
    DuckDB oracle (``floor((y − lo)·nbins / (hi − lo))``), so integer
    inputs bin identically in both engines.
    """
    if nbins < 1:
        raise ValueError("nbins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    y = F.col(y_col).cast(_D)
    bin_expr = (
        F.when(y < F.lit(float(lo)), F.lit(0))
        .when(y >= F.lit(float(hi)), F.lit(nbins + 1))
        .otherwise(1 + F.floor((y - F.lit(float(lo))) * F.lit(float(nbins))
                               / F.lit(float(hi - lo))).cast("int"))
    )
    return (points.withColumn("bin", bin_expr.cast("int"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).alias("n")))


def anomaly_zscore(
    points: DataFrame,
    window: int = 24,
    threshold: float = 3.0,
    min_obs: int = 8,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Trailing-window z-score anomaly detector: each observation is
    scored against the sample mean/stddev of the PREVIOUS ``window``
    observations of its series (the classic self-exclusive rolling
    z-score), and rows with ``|z| > threshold`` are flagged.  At least
    ``min_obs`` prior observations and nonzero variance are required
    to score at all — cold starts and flat windows emit nothing.

    Output: (series, order_col, y, n_prev, z) — anomalies only.

    Plan: one series exchange feeds a single bounded ROWS frame
    (``window PRECEDING .. 1 PRECEDING``) computing the exact sufficient
    sums; z is a fixed IEEE tree over them (sample variance
    ``(nΣy² − (Σy)²) / (n(n−1))``), so with integer inputs the flagged
    set is bit-identical across engines.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    if min_obs < 2:
        raise ValueError("min_obs must be >= 2 (sample variance)")
    y = F.col(y_col).cast(_D)
    frame = (W.partitionBy(series_col).orderBy(order_col)
             .rowsBetween(-window, -1))
    scored = points.select(series_col, order_col, y.alias("_y")) \
        .withColumn("_n", F.count(F.lit(1)).over(frame).cast(_D)) \
        .withColumn("_sy", F.sum("_y").over(frame)) \
        .withColumn("_syy", F.sum(F.col("_y") * F.col("_y")).over(frame))
    n, sy, syy = F.col("_n"), F.col("_sy"), F.col("_syy")
    d2 = n * syy - sy * sy
    var = d2 / (n * (n - 1))
    z = (F.col("_y") - sy / n) / F.sqrt(var)
    return (scored
            .withColumn("_z", F.when((n >= float(min_obs)) & (d2 > 0), z))
            .filter(F.abs(F.col("_z")) > float(threshold))
            .select(series_col, order_col,
                    F.col("_y").alias("y"),
                    n.cast("long").alias("n_prev"),
                    F.col("_z").alias("z")))


def cusum_changepoint(
    points: DataFrame,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Per-series CUSUM single-changepoint scan (Page 1954 / Taylor's
    cumulative-sum change detection): with prefix sums Sₖ over the
    ordered series and total Sₙ,

        CUSUMₖ = Sₖ − k·(Sₙ/n)

    the estimated change location is the k maximizing |CUSUMₖ|
    (earliest k on ties).  Output one row per series: the changepoint
    bucket, its 1-based position ``k``, the signed peak ``cusum``, and
    ``n``.

    Plan: one series exchange feeds two stacked windows (running sum +
    unbounded total, then an argmax rank over (|CUSUM| desc, k asc));
    every comparison happens on bit-exact doubles (single-division
    trend line over exact integer sums), so the argmax is
    deterministic and engine-independent.
    """
    w_ord = (W.partitionBy(series_col).orderBy(order_col)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_all = (W.partitionBy(series_col)
             .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    y = F.col(y_col).cast(_D)
    scanned = points.select(series_col, order_col, y.alias("_y")) \
        .withColumn("_k", F.row_number().over(
            W.partitionBy(series_col).orderBy(order_col))) \
        .withColumn("_sk", F.sum("_y").over(w_ord)) \
        .withColumn("_sn", F.sum("_y").over(w_all)) \
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
    cusum = (F.col("_sk")
             - F.col("_k").cast(_D) * (F.col("_sn") / F.col("_n").cast(_D)))
    ranked = scanned.withColumn("_cusum", cusum).withColumn(
        "_r", F.row_number().over(
            W.partitionBy(series_col)
            .orderBy(F.abs(F.col("_cusum")).desc(), F.col("_k").asc())))
    return (ranked.filter(F.col("_r") == 1)
            .select(series_col,
                    F.col(order_col).alias("cp_" + order_col),
                    F.col("_k").cast("long").alias("k"),
                    F.col("_cusum").alias("cusum"),
                    F.col("_n").cast("long").alias("n")))


def period_strength(
    points: DataFrame,
    n_total: int,
    periods: Sequence[int] | None = None,
    series_col: str = "series_id",
    idx_col: str = "idx",
    y_col: str = "y",
) -> DataFrame:
    """Per-series periodicity strength by phase folding (the
    Stellingwerf 1978 phase-dispersion / epoch-folding family, in its
    ANOVA variance-ratio form — no trigonometry, so no libm skew
    between engines).

    The series is a conceptual dense grid of ``n_total`` integer
    buckets ``idx ∈ [0, n_total)``; absent buckets are implicit zeros
    (missing rows contribute nothing to any sum, which IS the zero
    contribution — no gap-fill materialization needed).  For each
    candidate period ``p`` that divides ``n_total``, fold the grid on
    ``phase = idx mod p`` (every phase then holds exactly
    ``n_total / p`` buckets) and score the fraction of total variance
    explained by the phase means:

        R_p = SS_between / SS_total
            = (p·Σ_ph S_ph² − S²) / (n·Σ y² − S²)

    with S_ph the per-phase sum, S the grand sum, Σy² the grand sum of
    squares — ALL exact int64 for integer ``y``, so R_p is ONE double
    division of two exact integers: bit-equal in any engine.  A strong
    periodicity at p (or any divisor structure of p) drives R_p → 1;
    white noise sits near (p−1)/(n−1).  NULL when the series is
    constant on the grid (SS_total = 0).

    Exactness bit-budget: intermediates stay in int64 while
    S < 2²⁶ per (series, window) — ~67M events per series per window —
    far above any per-series hourly activity; beyond that, pre-scale y.

    Plan: a bounded literal explode of |periods| (like ``autocorr``'s
    lags) feeding TWO stacked map-side-partial hash aggregations
    ((series, p, phase) then (series, p)); no window functions, no
    joins, no Python — scan-speed at 100 TB, and the first shuffle key
    (series, p, phase) fans every series across p·|periods| reducers,
    so a single hot series cannot skew a partition.

    The reference library has no timestamp/periodicity notion
    (SURVEY.md §1.1) — engine-native addition on the rollup layer.
    """
    if periods is None:
        periods = [p for p in range(2, n_total // 2 + 1)
                   if n_total % p == 0]
    for p in periods:
        if int(p) < 2:
            raise ValueError(f"period {p} must be >= 2")
        if n_total % int(p) != 0:
            raise ValueError(
                f"period {p} does not divide n_total={n_total}")
    per_arr = F.array(*[F.lit(int(p)) for p in sorted(set(int(p) for p
                                                          in periods))])
    base = points.select(
        F.col(series_col).alias("_s"),
        F.col(idx_col).cast("long").alias("_i"),
        F.col(y_col).cast("long").alias("_y"),
    ).filter((F.col("_i") >= 0) & (F.col("_i") < int(n_total)))
    folded = (base.withColumn("p", F.explode(per_arr))
              .withColumn("_ph", F.col("_i") % F.col("p")))
    by_phase = folded.groupBy("_s", "p", "_ph").agg(
        F.sum("_y").alias("_sph"),
        F.sum(F.col("_y") * F.col("_y")).alias("_qph"),
        F.count(F.lit(1)).alias("_cph"))
    # NB: aliases must differ from "_s" case-insensitively — Spark's
    # default resolver is caseSensitive=false
    by_period = by_phase.groupBy("_s", "p").agg(
        F.sum("_sph").alias("_gs"),
        F.sum("_qph").alias("_gq"),
        F.sum(F.col("_sph") * F.col("_sph")).alias("_gss"),
        F.sum("_cph").alias("_n_obs"))
    n_lit = F.lit(int(n_total)).cast("long")
    num = (F.col("p").cast("long") * F.col("_gss")
           - F.col("_gs") * F.col("_gs"))
    den = n_lit * F.col("_gq") - F.col("_gs") * F.col("_gs")
    return by_period.select(
        F.col("_s").alias(series_col),
        F.col("p").cast("long").alias("period"),
        F.col("_n_obs").cast("long").alias("n_obs"),
        F.when(den != 0, num.cast(_D) / den.cast(_D))
        .otherwise(F.lit(None).cast(_D)).alias("strength"),
    )


def seasonal_decompose(
    points: DataFrame,
    period: int,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
    broadcast_seasonal: bool = True,
) -> DataFrame:
    """Classical additive seasonal-trend decomposition per series (the
    statsmodels ``seasonal_decompose(model='additive')`` contract over
    a REGULAR, position-indexed series):

    * ``trend``   — centered moving average: plain ``period``-point MA
      for odd periods, the standard 2×``period`` MA (half-weight
      endpoints) for even; NULL where the full window is unavailable
      (the first/last ``period//2`` rows of each series).
    * ``seasonal`` — per-phase mean of the detrended interior rows
      (phase = 0-based row position mod ``period``), centered so the
      present phases' seasonal values sum to zero.
    * ``resid``   — ``(y − trend) − seasonal`` on interior rows.

    The input must be gap-free within each series (feed a gap-filled
    grid, e.g. ``operators/rollup.gap_fill(policy='zero')``) with a
    unique ``order_col`` per row; ``y`` integer-valued.

    Exactness (what the DuckDB driver oracle leans on): with D = period
    (odd) or 2·period (even), the scaled window sum T and the scaled
    detrended value D·y − T are exact int64, so ``trend = T/D`` and
    each phase mean ``ΣA/(D·cnt)`` are ONE double division of exact
    integers — bit-equal in any engine.  The seasonal centering sums
    ≤``period`` bit-equal doubles in EXPLICIT ascending-phase order via
    a sequential fold (Spark ``aggregate`` over an ``array_sort``-ed
    struct list ≡ DuckDB ``list_reduce`` over ``list(... ORDER BY
    phase)``), so even that float sum is order-identical, and
    ``resid`` is a fixed op tree over bit-equal operands.

    Plan: ONE series exchange feeds the row-number + trend frames; the
    phase table (n_series × period rows) is two further tiny hash aggs
    and joins back onto the series-partitioned rows — broadcast by
    default (disable for extreme series counts and it degrades to a
    keyed shuffle join).  No Python anywhere.

    The reference library has no timestamp notion (SURVEY.md §1.1) —
    engine-native addition on the rollup layer.
    """
    P = int(period)
    if P < 2:
        raise ValueError("period must be >= 2")
    even = P % 2 == 0
    h = P // 2
    D = 2 * P if even else P
    w_ord = W.partitionBy(series_col).orderBy(order_col)
    base = points.select(
        F.col(series_col).alias("_s"),
        F.col(order_col).alias("_o"),
        F.col(y_col).cast("long").alias("_y"),
    ).withColumn("_rn", F.row_number().over(
        W.partitionBy("_s").orderBy("_o")))
    w_full = (W.partitionBy("_s").orderBy("_o").rowsBetween(-h, h))
    if even:
        w_in = (W.partitionBy("_s").orderBy("_o")
                .rowsBetween(-(h - 1), h - 1))
        w_seq = W.partitionBy("_s").orderBy("_o")
        t_expr = (F.lag("_y", h).over(w_seq)
                  + F.lit(2) * F.sum("_y").over(w_in)
                  + F.lead("_y", h).over(w_seq))
    else:
        t_expr = F.sum("_y").over(w_full)
    rows = base.withColumn(
        "_T",
        F.when(F.count(F.lit(1)).over(w_full) == 2 * h + 1, t_expr),
    ).withColumn("_ph", (F.col("_rn") - 1) % P)
    # the trend-window subtree feeds THREE consumers (phase means →
    # centers → the output join back onto rows); without a persist
    # Spark recomputes the series exchange + frames once per branch
    # (measured ~3× wall at sf0.1).  MEMORY_AND_DISK so a 100 TB grid
    # spills instead of evicting; released via resources.release_all
    # (long-lived sessions composing this operator over DIFFERENT
    # inputs should call it between runs — identical replans dedupe
    # via the CacheManager, distinct inputs accumulate until release).
    from ..resources import track_persist
    rows = track_persist(rows.persist())
    interior = rows.filter(F.col("_T").isNotNull()).select(
        "_s", "_ph",
        (F.lit(D) * F.col("_y") - F.col("_T")).alias("_dscaled"))
    ph_means = interior.groupBy("_s", "_ph").agg(
        F.sum("_dscaled").alias("_a"),
        F.count(F.lit(1)).alias("_c"),
    ).select(
        "_s", "_ph",
        (F.col("_a").cast(_D)
         / (F.lit(D) * F.col("_c")).cast(_D)).alias("_sraw"))
    centers = ph_means.groupBy("_s").agg(
        (F.aggregate(
            F.array_sort(F.collect_list(F.struct("_ph", "_sraw"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_sraw"])
         / F.count(F.lit(1)).cast(_D)).alias("_m"))
    seasonal = (ph_means.join(centers, "_s")
                .select("_s", "_ph",
                        (F.col("_sraw") - F.col("_m")).alias("_seas")))
    if broadcast_seasonal:
        seasonal = F.broadcast(seasonal)
    out = rows.join(seasonal, ["_s", "_ph"], "left")
    trend = F.col("_T").cast(_D) / F.lit(float(D))
    return out.select(
        F.col("_s").alias(series_col),
        F.col("_o").alias(order_col),
        F.col("_y").alias(y_col),
        trend.alias("trend"),
        F.col("_seas").alias("seasonal"),
        ((F.col("_y").cast(_D) - trend) - F.col("_seas")).alias("resid"),
    )


def holt_linear(
    points: DataFrame,
    horizons: Sequence[int] = (1,),
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
    phi: float = 1.0,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per series
    (Holt 1957 / Hyndman-Athanasopoulos FPP §7.2) with the classic
    α = β = 1/2 and textbook initialization l₁ = y₁, b₁ = y₂ − y₁:

        lₜ = (yₜ + lₜ₋₁ + φ·bₜ₋₁) / 2
        bₜ = ((lₜ − lₜ₋₁) + φ·bₜ₋₁) / 2
        ŷₙ₊ₕ = lₙ + (φ + φ² + … + φʰ)·bₙ

    ``phi`` is the Gardner-McKenzie (1985) trend damping: 1.0 (the
    default) is the undamped classic — the φ factors drop out of the
    op tree entirely, so existing replays stay bit-identical — and
    0 < φ < 1 flattens long-horizon forecasts toward the asymptote
    lₙ + φ/(1−φ)·bₙ (use a power-of-two φ like 0.5 to keep the φ·b
    products exact).

    Output one row per series: ``n``, final ``level`` / ``trend``, and
    one ``fc_{h}`` column per requested horizon.  NULL for series with
    fewer than 2 observations.  ``order_col`` must be UNIQUE per row
    within a series (feed a bucketed/rolled-up series): Spark breaks
    an order tie by ``y`` inside the sorted struct array while a
    rank-ordered replay breaks it engine-dependently, so ties void
    the bit-equality contract.

    Exactness: the recurrence is a DETERMINISTIC sequential fold in
    explicit ``order_col`` order — Spark evaluates it as a JVM
    ``aggregate`` HOF over the array_sort-ed series, a DuckDB oracle
    replays it as a recursive CTE stepping the same rank order — and
    every step is the identical IEEE op tree ((y + l + b)/2, halving
    is exact), so level/trend/forecasts are bit-equal across engines
    with no integer scaling needed.

    Plan: ONE hash aggregation (collect per series) + a per-row array
    fold — no window, no Python, no iteration driver-side; the fold
    is O(n) per series inside whole-stage codegen.  Series length is
    bounded by the rollup tier feeding it (the same contract as
    ``operators/rollup.series_arrays``).

    The reference library has no forecasting surface (SURVEY.md §1.1)
    — engine-native addition on the rollup layer.
    """
    hs = sorted(set(int(h) for h in horizons))
    if not hs or hs[0] < 1:
        raise ValueError("horizons must be positive integers")
    if not (0.0 < phi <= 1.0):
        raise ValueError("phi must be in (0, 1]")
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("_o"), F.col(y_col).cast(_D).alias("_y"))))
    g = points.groupBy(F.col(series_col).alias("_s")).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("_n"))
    y1 = F.col("_a")[0]["_y"]
    y2 = F.col("_a")[1]["_y"]
    init = F.struct(y1.alias("l"), (y2 - y1).alias("b"))
    rest = F.slice(F.col("_a"), 2, F.greatest(
        F.col("_n").cast("int") - 1, F.lit(0)))
    if phi == 1.0:
        # keep the undamped op tree literally free of phi factors so
        # existing recursive-CTE replays stay bit-identical
        def _merge(acc, x):
            return F.struct(
                ((x["_y"] + acc["l"] + acc["b"]) / F.lit(2.0)).alias("l"),
                (((((x["_y"] + acc["l"] + acc["b"]) / F.lit(2.0))
                   - acc["l"]) + acc["b"]) / F.lit(2.0)).alias("b"))
    else:
        ph = F.lit(float(phi))

        def _merge(acc, x):
            return F.struct(
                ((x["_y"] + acc["l"] + ph * acc["b"])
                 / F.lit(2.0)).alias("l"),
                (((((x["_y"] + acc["l"] + ph * acc["b"]) / F.lit(2.0))
                   - acc["l"]) + ph * acc["b"]) / F.lit(2.0)).alias("b"))
    state = F.aggregate(rest, init, _merge)
    out = g.select(
        F.col("_s").alias(series_col),
        F.col("_n").cast("long").alias("n"),
        F.when(F.col("_n") >= 2, state).alias("_st"))
    cols = [series_col, "n",
            F.col("_st")["l"].alias("level"),
            F.col("_st")["b"].alias("trend")]
    for h in hs:
        if phi == 1.0:
            fsum = float(h)               # Σ 1^i = h, exact
        else:
            fsum, p = 0.0, 1.0
            for _ in range(h):
                p *= phi
                fsum += p
        cols.append((F.col("_st")["l"]
                     + F.lit(fsum) * F.col("_st")["b"])
                    .alias(f"fc_{h}"))
    return out.select(*cols)


def baseline_forecasts(
    points: DataFrame,
    horizons: Sequence[int] = (1,),
    season: int | None = None,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """The three standard baseline forecasters every forecasting
    surface is benchmarked against (Hyndman-Athanasopoulos FPP §5.2),
    one row per series with one column set per horizon h:

    * ``naive_{h}``    = yₙ                       (last observation)
    * ``snaive_{h}``   = yₙ₊ₕ₋ₘ·⌈h/m⌉             (same phase, last
      season; requires ``season`` m — omitted when ``season`` is None)
    * ``drift_{h}``    = yₙ + h·(yₙ − y₁)/(n − 1) (first-to-last line)

    All three are pure selections/arithmetic over the sorted series
    array — exact integer picks and one fixed IEEE tree for drift, so
    any replay is bit-equal.  Plan: the same ONE collect aggregation
    as ``holt_linear``; no window, no Python.  NULL drift for n < 2,
    NULL snaive when the phase source precedes the series start.
    """
    hs = sorted(set(int(h) for h in horizons))
    if not hs or hs[0] < 1:
        raise ValueError("horizons must be positive integers")
    if season is not None and season < 1:
        raise ValueError("season must be >= 1")
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("_o"), F.col(y_col).cast(_D).alias("_y"))))
    g = points.groupBy(F.col(series_col).alias("_s")).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("_n"))
    n = F.col("_n")
    last = F.col("_a")[(n - 1).cast("int")]["_y"]
    first = F.col("_a")[0]["_y"]
    slope = F.when(n >= 2, (last - first) / (n - 1).cast(_D))
    cols = [F.col("_s").alias(series_col), n.cast("long").alias("n")]
    for h in hs:
        cols.append(last.alias(f"naive_{h}"))
        if season is not None:
            m = int(season)
            # index of the same phase in the most recent full season:
            # n + h - m*ceil(h/m), 1-based -> 0-based
            back = m * ((h + m - 1) // m)
            idx = (n + F.lit(int(h - back)) - 1).cast("int")
            cols.append(F.when(idx >= 0, F.col("_a")[idx]["_y"])
                        .alias(f"snaive_{h}"))
        cols.append((last + F.lit(float(h)) * slope).alias(f"drift_{h}"))
    return g.select(*cols)


def cross_corr(
    points: DataFrame,
    pairs,
    lags: Sequence[int] = (0,),
    series_col: str = "series_id",
    idx_col: str = "idx",
    y_col: str = "y",
) -> DataFrame:
    """Cross-correlation function (CCF) between series pairs at
    integer bucket lags — the two-series generalization of
    ``autocorr``: for each requested pair (a, b) and lag k, the
    Pearson correlation over {(yᵃᵢ, yᵇᵢ₊ₖ) : both buckets present}
    (gaps drop pairs, the same time-lag semantics).  A positive peak
    at lag k > 0 means b FOLLOWS a by k buckets — the classic
    lead/lag diagnostic between two metrics.

    ``pairs`` is a list of (a, b) tuples or a DataFrame with columns
    ``a``/``b`` (broadcast onto the scan — keep it to the pairs you
    actually want; all-pairs across a huge corpus is a quadratic ask
    and belongs to the distance-matrix machinery).  Output one row per
    (a, b, lag): ``n_pairs`` and ``ccf`` (NULL on zero variance or
    fewer than 2 pairs).

    Plan: pair list broadcast-joined onto both sides, bounded lag
    explode, ONE shuffled equi-join on (b, idx+lag) and ONE hash
    aggregation — |pairs|·|lags| · series-length rows, no window.
    Exactness: same contract as ``autocorr`` (integer y → exact
    sufficient sums → one fixed IEEE tree).
    """
    if not isinstance(pairs, DataFrame):
        spark = points.sparkSession
        pairs = spark.createDataFrame(
            [(str(a), str(b)) for a, b in pairs], ["a", "b"])
    lag_arr = F.array(*[F.lit(int(k)) for k in lags])
    left = (points.select(
                F.col(series_col).alias("a"),
                F.col(idx_col).cast("long").alias("_i"),
                F.col(y_col).cast(_D).alias("_ya"))
            .join(F.broadcast(pairs), "a")
            .withColumn("lag", F.explode(lag_arr))
            .withColumn("_j", F.col("_i") + F.col("lag")))
    right = points.select(
        F.col(series_col).alias("b"),
        F.col(idx_col).cast("long").alias("_j"),
        F.col(y_col).cast(_D).alias("_yb"))
    joined = left.join(right, ["b", "_j"])
    g = joined.groupBy("a", "b", "lag").agg(
        F.count(F.lit(1)).cast(_D).alias("_n"),
        F.sum("_ya").alias("_sx"),
        F.sum("_yb").alias("_sy"),
        F.sum(F.col("_ya") * F.col("_ya")).alias("_sxx"),
        F.sum(F.col("_yb") * F.col("_yb")).alias("_syy"),
        F.sum(F.col("_ya") * F.col("_yb")).alias("_sxy"),
    )
    return g.select(
        "a", "b", "lag",
        F.col("_n").cast("long").alias("n_pairs"),
        _corr_expr(F.col("_n"), F.col("_sx"), F.col("_sy"),
                   F.col("_sxx"), F.col("_syy"), F.col("_sxy"))
        .alias("ccf"),
    )


def _median_expr(arr_sql: str, presorted: bool = False) -> str:
    """Median of a double-array SQL expression: sort, middle element
    (odd) or the average of the two middles (even) — the explicit
    element-pick form, so a SQL twin replays the identical IEEE ops
    instead of trusting an engine's quantile interpolation.

    ``presorted=True`` skips the sorts: pass it when the caller has
    already materialized ``array_sort`` in its own column — Spark does
    no common-subexpression elimination across higher-order functions,
    so the inline form sorts the array once per ``element_at`` (the
    even branch pays two full sorts; ADVICE r5).  Values are identical
    either way."""
    s = arr_sql if presorted else f"array_sort({arr_sql})"
    return (f"CASE WHEN size({arr_sql}) = 0 THEN CAST(NULL AS DOUBLE) "
            f"WHEN size({arr_sql}) % 2 = 1 "
            f"THEN element_at({s}, CAST((size({arr_sql}) + 1) div 2 "
            f"                          AS INT)) "
            f"ELSE (element_at({s}, CAST(size({arr_sql}) div 2 AS INT)) "
            f"      + element_at({s}, CAST(size({arr_sql}) div 2 + 1 "
            f"                             AS INT))) / 2.0 "
            f"END")


def theilsen_trend(
    points: DataFrame,
    group_cols: Sequence[str],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group Theil-Sen robust line fit — the median of all
    pairwise slopes (yⱼ−yᵢ)/(xⱼ−xᵢ), intercept the median of the
    per-point residuals yᵢ − slope·xᵢ (Theil 1950 / Sen 1968): the
    29%-breakdown companion of ``linreg_stats``, immune to the
    outliers that drag a least-squares line (one bad day bends OLS;
    the slope median shrugs it off).

    Intended for BOUNDED groups — the slope set is quadratic in group
    size, so fit per (series, day) over hourly points (≤ 276 slopes),
    not per series over a year; the tier cascade is the tool that
    makes groups bounded.  Plan: ONE exchange builds the per-group
    point array; the pair expansion, sort and median picks are
    within-row higher-order functions — no Python, no second shuffle.

    Exactness: integer-valued inputs make every slope one double
    quotient of exact integers and the median an element pick (or an
    exact /2.0 average), so SQL twins replaying the same expression
    hash-match.  Vertical pairs (xᵢ = xⱼ) are excluded slope-wise;
    slope/intercept NULL when no valid pair exists.

    Output: (group_cols…, n long, slope, intercept).
    """
    x = F.col(x_col).cast(_D)
    y = F.col(y_col).cast(_D)
    arr = (points.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct(x.alias("x"), y.alias("y"))))
        .alias("a"))
        .select(*group_cols,
                F.expr("transform(a, p -> p.x)").alias("xs"),
                F.expr("transform(a, p -> p.y)").alias("ys"))
        .withColumn("n", F.size("xs")))
    slopes = (
        "flatten(transform(sequence(0, greatest(n - 2, 0)), i -> "
        "CASE WHEN n >= 2 AND i <= n - 2 THEN "
        "filter(transform(sequence(i + 1, n - 1), j -> "
        "CASE WHEN element_at(xs, j + 1) != element_at(xs, i + 1) "
        "THEN (element_at(ys, j + 1) - element_at(ys, i + 1)) "
        "     / (element_at(xs, j + 1) - element_at(xs, i + 1)) END), "
        "s -> s IS NOT NULL) ELSE array() END))")
    df = (arr.withColumn("_slopes", F.expr("array_sort(" + slopes + ")"))
          .withColumn("slope", F.expr(_median_expr("_slopes",
                                                   presorted=True))))
    resid = ("CASE WHEN slope IS NULL THEN "
             "CAST(array() AS array<double>) ELSE "
             "zip_with(ys, xs, (yv, xv) -> yv - slope * xv) END")
    return (df.withColumn("_resid", F.expr(f"array_sort({resid})"))
            .withColumn("intercept", F.expr(_median_expr("_resid",
                                                         presorted=True)))
            .select(*group_cols, F.col("n").cast("long").alias("n"),
                    "slope", "intercept"))


def forecast_accuracy(
    points: DataFrame,
    holdout: int,
    season: int | None = None,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Holdout backtest of the FPP §5.2 baseline forecasters — the
    accuracy-evaluation half every forecasting surface needs next to
    its forecasters (Hyndman-Athanasopoulos FPP §5.8 metrics): split
    each series into train = all but the last ``holdout`` points and
    test = those points, forecast h = 1..holdout from the train
    prefix with each method, and score

    * ``mae``  = mean |eₕ|
    * ``rmse`` = √(mean eₕ²)
    * ``mase`` = mae / scale — scale the train-set one-step (or
      ``season``-step) naive MAE, the scale-free FPP §5.8 benchmark:
      MASE < 1 beats the in-sample naive walk.

    One row per (series, method): methods ``naive``/``drift`` and,
    when ``season`` is given, ``snaive``.  Series shorter than
    holdout + max(2, season + 1) points are dropped (no sound train
    prefix).  Plan: the same ONE collect aggregation as
    ``baseline_forecasts``/``holt_linear``, then within-row HOF
    error/metric algebra over the per-method forecast arrays and a
    bounded 3-row method explode — no second shuffle, no Python.
    Exactness: naive/snaive errors are exact integer picks; drift and
    the final means are one fixed IEEE tree each (1e-6 rounding in
    driver twins absorbs fold-order noise in the ≤ holdout-term sums).
    """
    H = int(holdout)
    if H < 1:
        raise ValueError("holdout must be >= 1")
    m = int(season) if season is not None else None
    if m is not None and m < 1:
        raise ValueError("season must be >= 1")
    min_train = max(2, (m + 1) if m is not None else 2)
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("_o"), F.col(y_col).cast(_D).alias("_y"))))
    g = (points.groupBy(F.col(series_col).alias(series_col)).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= H + min_train)
        .select(series_col,
                F.expr("transform(_a, p -> p._y)").alias("ys"),
                (F.col("_n") - H).cast("int").alias("nt"),
                F.col("_n").cast("long").alias("_n")))
    # 1-based picks over ys; train prefix ys[1..nt], test ys[nt+1..n]
    last, first = "element_at(ys, nt)", "element_at(ys, 1)"
    fc = {
        "naive": f"{last}",
        "drift": (f"{last} + CAST(h AS DOUBLE) * "
                  f"(({last}) - ({first})) / CAST(nt - 1 AS DOUBLE)"),
    }
    if m is not None:
        # same phase in the last full train season:
        # nt + h - m*ceil(h/m)  (>= 1 once nt > m)
        fc["snaive"] = (f"element_at(ys, nt + h "
                        f"- {m} * CAST(ceil(h / {m}.0) AS INT))")
    methods = F.array(*[
        F.struct(F.lit(name).alias("method"),
                 F.expr(f"transform(sequence(1, {H}), h -> "
                        f"element_at(ys, nt + h) - ({expr}))")
                 .alias("errs"))
        for name, expr in fc.items()])
    scale_step = m if m is not None else 1
    scale = (f"aggregate(sequence({scale_step} + 1, nt), "
             f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + "
             f"abs(element_at(ys, t) - element_at(ys, t - {scale_step})))"
             f" / CAST(nt - {scale_step} AS DOUBLE)")
    ex = (g.withColumn("_m", F.explode(methods))
          .select(series_col,
                  F.col("_m.method").alias("method"),
                  F.col("nt").cast("long").alias("n_train"),
                  F.lit(H).cast("long").alias("n_test"),
                  F.expr("aggregate(_m.errs, CAST(0.0 AS DOUBLE), "
                         "(a, e) -> a + abs(e))").alias("_sae"),
                  F.expr("aggregate(_m.errs, CAST(0.0 AS DOUBLE), "
                         "(a, e) -> a + e * e)").alias("_sse"),
                  F.expr(scale).alias("_scale")))
    mae = F.col("_sae") / F.lit(float(H))
    return ex.select(
        series_col, "method", "n_train", "n_test",
        mae.alias("mae"),
        F.sqrt(F.col("_sse") / F.lit(float(H))).alias("rmse"),
        F.when(F.col("_scale") > 0, mae / F.col("_scale")).alias("mase"))


def kalman_level(
    points: DataFrame,
    q: float = 0.25,
    r: float = 1.0,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Kalman filter for the local-level state-space model (random
    walk + observation noise; Durbin-Koopman §2.2) per series — the
    adaptive-gain step past ``holt_linear``'s fixed α = 1/2: with
    state variance ``q`` and observation variance ``r``, each step

        p̂ₜ = pₜ₋₁ + q
        kₜ = p̂ₜ / (p̂ₜ + r)
        lₜ = lₜ₋₁ + kₜ·(yₜ − lₜ₋₁)
        pₜ = (1 − kₜ)·p̂ₜ

    so early observations get large gains (uncertain level) and the
    gain converges to the steady-state root of k² r = (1−k) q — the
    filter trusts data exactly as much as the noise ratio warrants.
    Initialization l₁ = y₁, p₁ = 1.0.

    Output one row per series: ``n``, final ``level`` (also the
    h-step forecast — the local-level model predicts a constant),
    final state variance ``var_p``, and ``gain_next`` (the gain the
    next observation would receive — the steady-state diagnostic).

    Exactness: the same deterministic sequential-fold contract as
    ``holt_linear`` (JVM ``aggregate`` HOF in explicit ``order_col``
    order == a recursive-CTE replay stepping the identical IEEE op
    tree); ``order_col`` must be unique per series.  Plan: ONE collect
    aggregation + an O(n) codegen fold — no window, no Python.
    """
    if q < 0 or r <= 0:
        raise ValueError("need q >= 0 and r > 0")
    qc, rc = F.lit(float(q)), F.lit(float(r))
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("_o"), F.col(y_col).cast(_D).alias("_y"))))
    g = points.groupBy(F.col(series_col).alias(series_col)).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("_n"))
    init = F.struct(F.col("_a")[0]["_y"].alias("l"),
                    F.lit(1.0).alias("p"))
    rest = F.slice(F.col("_a"), 2, F.greatest(
        F.col("_n").cast("int") - 1, F.lit(0)))

    def _merge(acc, x):
        gain = (acc["p"] + qc) / ((acc["p"] + qc) + rc)
        return F.struct(
            (acc["l"] + gain * (x["_y"] - acc["l"])).alias("l"),
            ((F.lit(1.0) - gain) * (acc["p"] + qc)).alias("p"))

    st = g.withColumn("_st", F.aggregate(rest, init, _merge))
    gain_next = ((F.col("_st")["p"] + qc)
                 / ((F.col("_st")["p"] + qc) + rc))
    return st.select(
        series_col, F.col("_n").cast("long").alias("n"),
        F.col("_st")["l"].alias("level"),
        F.col("_st")["p"].alias("var_p"),
        gain_next.alias("gain_next"))


def binary_segmentation(
    points: DataFrame,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Two-level binary segmentation (Scott-Knott / the classic
    recursive extension of the CUSUM scan): the root changepoint from
    ``cusum_changepoint``, then the SAME scan inside each resulting
    half — up to three changepoints per series, the standard answer
    when one shift is not enough (e.g. a ramp-up and a later
    regression in the same week).

    Output one row per (series, level, segment):
    ``level`` 1 (whole series, segment 0) or 2 (segment 0 = left of
    the root cp inclusive, 1 = right), with the segment-relative
    ``cp_<order>``, position ``k``, signed peak ``cusum`` and segment
    length ``n``.  Level-2 rows exist only for segments with ≥ 2
    points (a 1-point segment has a trivial zero scan and is
    dropped).

    Plan: the level-1 scan is the existing two-window pass; the
    level-2 scan re-runs it with the segment id folded into the
    partition key (one broadcast-size join to tag segments, one more
    series exchange) — same per-row cost as running CUSUM twice.
    Determinism: both levels inherit the bit-exact argmax contract
    (earliest k on ties) from ``cusum_changepoint``; the composite
    partition key uses '\\x1f' so series ids containing '#' stay
    unambiguous.
    """
    cp_col = "cp_" + order_col
    reserved = {"_cp", "_seg", "_ck", "_parts"}
    clash = reserved & set(points.columns)
    if clash:
        # same guard as interval_overlap_join (ADVICE r5): pre-existing
        # internal names would silently corrupt the level-2 tagging
        raise ValueError(
            f"input columns collide with internal names: {sorted(clash)}")
    lvl1 = cusum_changepoint(points, series_col, order_col, y_col)
    # level-2 ids are rebuilt from the composite string key below, so
    # pin level 1 to string too — otherwise a non-string series column
    # is silently coerced by the union (ADVICE r5)
    l1 = lvl1.select(
        F.col(series_col).cast("string").alias(series_col),
        F.lit(1).alias("level"),
        F.lit(0).alias("segment"), F.col(cp_col),
        F.col("k"), F.col("cusum"), F.col("n"))
    tagged = (points.join(
        lvl1.select(series_col, F.col(cp_col).alias("_cp")), series_col)
        .withColumn("_seg",
                    F.when(F.col(order_col) <= F.col("_cp"), F.lit(0))
                    .otherwise(F.lit(1)))
        .withColumn("_ck", F.concat_ws("\x1f",
                                       F.col(series_col).cast("string"),
                                       F.col("_seg").cast("string"))))
    lvl2 = cusum_changepoint(
        tagged.select(F.col("_ck").alias(series_col), order_col, y_col),
        series_col, order_col, y_col)
    # parse from the RIGHT: segment is the last component, the series
    # id is everything before it — ids containing the separator (or
    # any other byte) reconstruct exactly
    l2 = (lvl2.where(F.col("n") >= 2)
          .withColumn("_parts", F.split(F.col(series_col), "\x1f"))
          .select(
              F.expr("array_join(slice(_parts, 1, size(_parts) - 1), "
                     "'\x1f')").alias(series_col),
              F.lit(2).alias("level"),
              F.element_at("_parts", -1).cast("int").alias("segment"),
              F.col(cp_col), F.col("k"), F.col("cusum"), F.col("n")))
    return l1.unionAll(l2)


def rolling_corr(
    points: DataFrame,
    pairs,
    window: int = 24,
    series_col: str = "series_id",
    idx_col: str = "idx",
    y_col: str = "y",
) -> DataFrame:
    """Rolling Pearson correlation between series pairs over a
    trailing window of common buckets — the windowed refinement of
    ``cross_corr``'s single global coefficient: one output row per
    (pair, common bucket) with the correlation over the last
    ``window`` co-observed buckets, the classic drift /
    relationship-breakdown diagnostic (a pair that decouples shows
    its rolling corr collapsing long before the global number moves).

    ``pairs`` is a list of (a, b) tuples or a DataFrame with columns
    ``a``/``b`` (broadcast).  Pairing is the time-lag-0 inner join of
    ``cross_corr``: only buckets where BOTH series have a value
    enter, and the window counts co-observed buckets (observation
    indexed, the ``ewma`` convention), not wall-clock.

    Plan: broadcast pair join, ONE shuffled equi-join on (b, idx),
    then five running sufficient-statistic sums over a single
    per-pair window frame — one exchange, no self-join per output
    row.  Exactness: integer inputs → the trailing sums are exact
    (each is a sum of ≤ window exact integers in a ROWS frame, which
    both engines accumulate identically), and the correlation is the
    module's fixed num/(√d1·√d2) tree; NULL until ``window`` pairs
    exist and on zero variance.
    """
    win = int(window)
    if win < 2:
        raise ValueError("window must be >= 2")
    if not isinstance(pairs, DataFrame):
        spark = points.sparkSession
        pairs = spark.createDataFrame(
            [(str(a), str(b)) for a, b in pairs], ["a", "b"])
    left = (points.select(
                F.col(series_col).alias("a"),
                F.col(idx_col).cast("long").alias("idx"),
                F.col(y_col).cast(_D).alias("_ya"))
            .join(F.broadcast(pairs), "a"))
    right = points.select(
        F.col(series_col).alias("b"),
        F.col(idx_col).cast("long").alias("idx"),
        F.col(y_col).cast(_D).alias("_yb"))
    j = left.join(right, ["b", "idx"])
    w = (W.partitionBy("a", "b").orderBy("idx")
         .rowsBetween(-(win - 1), W.currentRow))
    n = F.count(F.lit(1)).over(w).cast(_D)
    sx = F.sum("_ya").over(w)
    sy = F.sum("_yb").over(w)
    sxx = F.sum(F.col("_ya") * F.col("_ya")).over(w)
    syy = F.sum(F.col("_yb") * F.col("_yb")).over(w)
    sxy = F.sum(F.col("_ya") * F.col("_yb")).over(w)
    out = j.select(
        "a", "b", "idx",
        n.cast("long").alias("n_win"),
        _corr_expr(n, sx, sy, sxx, syy, sxy).alias("corr"))
    return out.withColumn(
        "corr", F.when(F.col("n_win") >= win, F.col("corr")))


def wow_baseline(
    points: DataFrame,
    period: int = 168,
    n_periods: int = 2,
    flag_factor: float = 2.0,
    series_col: str = "series_id",
    idx_col: str = "idx",
    y_col: str = "y",
) -> DataFrame:
    """Week-over-week seasonal baseline deviation — the observability
    classic "compare this hour to the same hour in previous weeks":
    per (series, bucket), the mean of the values at idx − period,
    idx − 2·period, … idx − n_periods·period (buckets that exist —
    gaps shrink the baseline set), the ratio against it, and a flag
    when the ratio leaves [1/flag_factor, flag_factor].  Unlike the
    trailing z-score (`anomaly_zscore`) this judges against the SAME
    SEASONAL PHASE, so a daily/weekly cycle is never itself flagged.

    Output: (series_id, idx, y, n_base, baseline, ratio, anomalous)
    — baseline/ratio NULL (flag false) when no prior-period bucket
    exists or the baseline is 0.

    Plan: a bounded ``n_periods`` literal explode on the probe side +
    ONE shuffled equi-join on (series, idx − k·period) + ONE hash
    aggregation — the `autocorr` join shape, no window.  Integer
    inputs keep the baseline mean one exact-sum division and the
    ratio/flag one fixed IEEE tree, so SQL twins hash-match booleans
    included.
    """
    p = int(period)
    if p < 1 or int(n_periods) < 1:
        raise ValueError("period and n_periods must be >= 1")
    if flag_factor <= 1.0:
        raise ValueError("flag_factor must be > 1")
    ks = F.array(*[F.lit(k * p) for k in range(1, int(n_periods) + 1)])
    cur = (points.select(
        F.col(series_col).alias("series_id"),
        F.col(idx_col).cast("long").alias("idx"),
        F.col(y_col).cast(_D).alias("y"))
        .withColumn("_back", F.explode(ks))
        .withColumn("_j", F.col("idx") - F.col("_back")))
    base = points.select(
        F.col(series_col).alias("series_id"),
        F.col(idx_col).cast("long").alias("_j"),
        F.col(y_col).cast(_D).alias("_yb"))
    # count NON-NULL baseline values (a NULL-valued prior bucket must
    # not deflate the mean), and join back on (series, idx) only — a
    # NULL-y current row would never match a 3-key equi-join
    j = (cur.join(base, ["series_id", "_j"])
         .groupBy("series_id", "idx")
         .agg(F.count("_yb").alias("n_base"),
              F.sum("_yb").alias("_sb")))
    # left join back so buckets with NO prior-phase data still appear
    allb = points.select(
        F.col(series_col).alias("series_id"),
        F.col(idx_col).cast("long").alias("idx"),
        F.col(y_col).cast(_D).alias("y"))
    out = (allb.join(j, ["series_id", "idx"], "left")
           .withColumn("n_base",
                       F.coalesce(F.col("n_base"), F.lit(0))
                       .cast("long"))
           .withColumn("baseline",
                       F.when(F.col("n_base") > 0,
                              F.col("_sb")
                              / F.col("n_base").cast("double"))))
    ratio = F.when(F.col("baseline") > 0, F.col("y") / F.col("baseline"))
    f = float(flag_factor)
    return (out.withColumn("ratio", ratio)
            .withColumn("anomalous",
                        F.coalesce((F.col("ratio") > f)
                                   | (F.col("ratio") < 1.0 / f),
                                   F.lit(False)))
            .select("series_id", "idx", "y", "n_base", "baseline",
                    "ratio", "anomalous"))


def croston(
    points: DataFrame,
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972, with
    the Syntetos-Boylan approximate-bias correction as a second
    column) — the forecaster the smoothing family (holt / EWMA /
    baselines) fundamentally lacks: on a series that is mostly zeros
    with occasional positive "demands", exponential smoothing decays
    toward zero between demands and spikes after each one; Croston
    smooths the demand SIZES and the inter-demand INTERVALS as two
    separate α = 1/2 recurrences and forecasts their ratio.

    Convention (documented because published variants differ): the
    period counter q starts at 1; at the FIRST demand z := y, p := q;
    at later demands z := (y + z)/2, p := (q + p)/2 (the exact-halves
    α = 1/2 fold of ``holt_linear``); after any demand q resets to 1
    and increments per subsequent zero period.  ``forecast = z / p``
    per period; ``fc_sba = (1 − α/2)·z/p = 0.75·z/p`` (Syntetos-
    Boylan 2005).  Series with no demand yield NULL forecasts.

    The CALLER supplies the dense series — zeros are meaningful here,
    so feed the gap-filled grid, not the sparse bucket table.

    Output per series: (n, n_demands, z, p, forecast, fc_sba).
    Exactness: the same JVM-aggregate-fold == recursive-CTE contract
    as ``holt_linear``/``kalman_level`` — integer demands make every
    halve exact, and the final ratio is one division.  Plan: ONE
    collect aggregation + an O(n) codegen fold.
    """
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("_o"), F.col(y_col).cast(_D).alias("_y"))))
    g = points.groupBy(F.col(series_col).alias(series_col)).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("_n"))
    init = F.struct(
        F.lit(0.0).alias("z"), F.lit(0.0).alias("p"),
        F.lit(1.0).alias("q"), F.lit(0).cast("long").alias("k"))

    def _merge(acc, x):
        is_demand = x["_y"] > 0
        first = acc["k"] == 0
        z_new = (F.when(is_demand & first, x["_y"])
                 .when(is_demand, (x["_y"] + acc["z"]) / F.lit(2.0))
                 .otherwise(acc["z"]))
        p_new = (F.when(is_demand & first, acc["q"])
                 .when(is_demand, (acc["q"] + acc["p"]) / F.lit(2.0))
                 .otherwise(acc["p"]))
        q_new = (F.when(is_demand, F.lit(1.0))
                 .otherwise(acc["q"] + F.lit(1.0)))
        k_new = F.when(is_demand, acc["k"] + F.lit(1).cast("long")) \
                 .otherwise(acc["k"])
        return F.struct(z_new.alias("z"), p_new.alias("p"),
                        q_new.alias("q"), k_new.alias("k"))

    st = g.withColumn("_st", F.aggregate(F.col("_a"), init, _merge))
    fc = F.when(F.col("_st")["k"] > 0,
                F.col("_st")["z"] / F.col("_st")["p"])
    return st.select(
        series_col,
        F.col("_n").cast("long").alias("n"),
        F.col("_st")["k"].alias("n_demands"),
        F.when(F.col("_st")["k"] > 0, F.col("_st")["z"]).alias("z"),
        F.when(F.col("_st")["k"] > 0, F.col("_st")["p"]).alias("p"),
        fc.alias("forecast"),
        (F.lit(0.75) * fc).alias("fc_sba"))


def holt_winters(
    points: DataFrame,
    season: int,
    horizons: Sequence[int] = (1,),
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing (Winters
    1960 / FPP §7.3) with α = β = γ = 1/2 — the seasonal completion
    of ``holt_linear``: level, trend AND an m-element seasonal state,

        lₜ = ((yₜ − sₜ₋ₘ) + (lₜ₋₁ + bₜ₋₁)) / 2
        bₜ = ((lₜ − lₜ₋₁) + bₜ₋₁) / 2
        sₜ = ((yₜ − lₜ) + sₜ₋ₘ) / 2
        ŷₙ₊ₕ = lₙ + h·bₙ + sₙ₊ₕ₋ₘ·⌈h/m⌉

    Textbook initialization over the first two seasons (FPP): l_m =
    mean(y₁..y_m), b_m = (mean of season 2 − mean of season 1)/m,
    sᵢ = yᵢ − l_m for i = 1..m; the recurrence starts at t = m+1.
    Series shorter than 2·m observations are dropped (no sound b
    init).

    Output per series: n, level, trend, one ``fc_{h}`` per horizon.
    Exactness: the ``holt_linear`` contract — a deterministic
    sequential JVM aggregate-HOF fold (the m-element seasonal state
    is an array updated one phase per step), replayed by a recursive
    CTE carrying the same list state, every step exact halves over
    integer-rooted values → bit-equal.  Plan: ONE collect aggregation
    + an O(n·m) codegen fold, no window, no Python.
    """
    m = int(season)
    if m < 2:
        raise ValueError("season must be >= 2")
    hs = sorted(set(int(h) for h in horizons))
    if not hs or hs[0] < 1:
        raise ValueError("horizons must be positive integers")
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("_o"), F.col(y_col).cast(_D).alias("_y"))))
    g = (points.groupBy(F.col(series_col).alias(series_col)).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2 * m)
        .select(series_col,
                F.expr("transform(_a, p -> p._y)").alias("ys"),
                F.col("_n").cast("int").alias("n")))
    mean1 = (f"aggregate(slice(ys, 1, {m}), CAST(0.0 AS DOUBLE), "
             f"(a, x) -> a + x) / {float(m)!r}")
    mean2 = (f"aggregate(slice(ys, {m + 1}, {m}), CAST(0.0 AS DOUBLE), "
             f"(a, x) -> a + x) / {float(m)!r}")
    # fold over y_{m+1}..y_n; the phase read/updated at the step
    # consuming y_{t+1} is 0-based (t % m) in Spark's transform index
    merge = (
        "(acc, y) -> named_struct("
        "'l', ((y - element_at(acc.s, (acc.t % {m}) + 1)) "
        "      + (acc.l + acc.b)) / 2.0, "
        "'b', (((((y - element_at(acc.s, (acc.t % {m}) + 1)) "
        "         + (acc.l + acc.b)) / 2.0) - acc.l) + acc.b) / 2.0, "
        "'s', transform(acc.s, (x, i) -> CASE "
        "     WHEN i = (acc.t % {m}) THEN "
        "     ((y - (((y - element_at(acc.s, (acc.t % {m}) + 1)) "
        "            + (acc.l + acc.b)) / 2.0)) "
        "      + element_at(acc.s, (acc.t % {m}) + 1)) / 2.0 "
        "     ELSE x END), "
        "'t', acc.t + 1)"
    ).replace("{m}", str(m))
    st = g.withColumn("_st", F.expr(
        f"aggregate(slice(ys, {m + 1}, n - {m}), "
        f"named_struct('l', {mean1}, "
        f"'b', (({mean2}) - ({mean1})) / {float(m)!r}, "
        f"'s', transform(slice(ys, 1, {m}), v -> v - ({mean1})), "
        f"'t', {m}), {merge})"))
    cols = [series_col, F.col("n").cast("long").alias("n"),
            F.col("_st.l").alias("level"), F.col("_st.b").alias("trend")]
    for h in hs:
        # seasonal index for forecast h: n + h - m*ceil(h/m), whose
        # 0-based phase in s is ((n + h - back - 1) mod m); with the
        # state's s holding phases by original position i mod m
        back = m * ((h + m - 1) // m)
        cols.append(F.expr(
            f"_st.l + {float(h)!r} * _st.b + element_at(_st.s, "
            f"CAST(((n + {h - back} - 1) % {m}) + 1 AS INT))")
            .alias(f"fc_{h}"))
    return st.select(*cols)


def theta_forecast(
    points: DataFrame,
    horizons: Sequence[int] = (1,),
    series_col: str = "series_id",
    order_col: str = "bucket_ts",
    y_col: str = "y",
) -> DataFrame:
    """The Theta method (Assimakopoulos & Nikolopoulos 2000; the M3
    forecasting-competition winner in its classical two-line form):
    decompose the series into the θ = 0 line (the OLS trend, all
    curvature removed) and the θ = 2 line zₜ = 2·yₜ − (a + b·t)
    (curvature doubled), smooth the θ = 2 line with SES (α = 1/2
    here, the module's exact-halves convention; classical Theta
    optimizes α), and forecast the average:

        ŷₙ₊ₕ = ((a + b·(n + h)) + z̃ₙ) / 2

    — the trend line supplies long-run direction, the smoothed
    θ = 2 line supplies level; their mean is the M3 benchmark that
    famously beat every contestant.

    Output per series: n, slope, intercept, ses (z̃ₙ), one fc_{h}
    per horizon; NULL when n < 2 or the fit is degenerate (den 0).
    Exactness: OLS from exact integer sufficient statistics (Σt and
    Σt² in closed form, Σy/Σty by fold), the SES recurrence is the
    usual JVM fold == recursive-CTE contract, and the combination is
    one fixed tree.  Plan: ONE collect aggregation + an O(n) fold.
    """
    hs = sorted(set(int(h) for h in horizons))
    if not hs or hs[0] < 1:
        raise ValueError("horizons must be positive integers")
    arr = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).alias("_o"), F.col(y_col).cast(_D).alias("_y"))))
    g = (points.groupBy(F.col(series_col).alias(series_col)).agg(
        arr.alias("_a"), F.count(F.lit(1)).alias("_n"))
        .select(series_col,
                F.expr("transform(_a, p -> p._y)").alias("ys"),
                F.col("_n").cast("int").alias("n")))
    # Σt = n(n+1)/2 and Σt² = n(n+1)(2n+1)/6 in closed form (exact
    # integers); Σy and Σt·y by index-carrying fold
    sx = "(CAST(n AS DOUBLE) * (n + 1) / 2.0)"
    sxx = "(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 6.0)"
    sy = ("aggregate(ys, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    sxy = ("aggregate(zip_with(ys, sequence(1, n), (y, t) -> y * t), "
           "CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
    den = f"(CAST(n AS DOUBLE) * {sxx} - {sx} * {sx})"
    df = (g.withColumn("_sy", F.expr(sy))
          .withColumn("_sxy", F.expr(sxy))
          .withColumn("_den", F.expr(
              f"CASE WHEN n >= 2 THEN {den} END"))
          .withColumn("slope", F.expr(
              f"CASE WHEN _den > 0 THEN "
              f"(CAST(n AS DOUBLE) * _sxy - {sx} * _sy) / _den END"))
          .withColumn("intercept", F.expr(
              f"CASE WHEN _den > 0 THEN "
              f"(_sy - slope * {sx}) / CAST(n AS DOUBLE) END")))
    # SES over the theta-2 line z_t = 2y_t - (a + b t), alpha = 1/2
    # (materialize z once — building the zip_with array twice per row
    # doubles the per-series work for nothing)
    df = df.withColumn("_z", F.expr(
        "CASE WHEN slope IS NULL THEN CAST(NULL AS array<double>) "
        "ELSE zip_with(ys, sequence(1, n), "
        "(y, t) -> 2.0 * y - (intercept + slope * t)) END"))
    ses = ("CASE WHEN _z IS NULL THEN CAST(NULL AS DOUBLE) ELSE "
           "aggregate(slice(_z, 2, n - 1), element_at(_z, 1), "
           "(acc, z) -> (z + acc) / 2.0) END")
    df = df.withColumn("ses", F.expr(ses))
    cols = [series_col, F.col("n").cast("long").alias("n"),
            "slope", "intercept", "ses"]
    for h in hs:
        cols.append(F.expr(
            f"((intercept + slope * (n + {h})) + ses) / 2.0")
            .alias(f"fc_{h}"))
    return df.select(*cols)
