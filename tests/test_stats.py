"""functions/stats.py — linreg_stats / autocorr / ewma /
cusum_changepoint vs numpy/pandas references.

The module's exactness contract (integer inputs → bit-equal derived
values) is what the driver oracles lean on; here we pin the math
itself against the independent numpy/pandas implementations, plus the
NULL edges (vertical fits, zero variance, short series).
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from dtaidistance_spark.functions.stats import (
    anomaly_zscore,
    autocorr,
    cusum_changepoint,
    ewma,
    histogram,
    linreg_stats,
)


def _points_df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


class TestLinregStats:
    def test_matches_numpy_polyfit(self, spark, rng):
        rows = []
        for g in range(5):
            xs = rng.integers(0, 100, size=12)
            ys = rng.integers(0, 1000, size=12)
            rows += [(f"g{g}", int(x), int(y)) for x, y in zip(xs, ys)]
        df = _points_df(spark, rows, ["series_id", "x", "y"])
        out = (linreg_stats(df, ["series_id"], "x", "y")
               .toPandas().set_index("series_id").sort_index())
        for g in range(5):
            sub = [(x, y) for s, x, y in rows if s == f"g{g}"]
            xs = np.array([x for x, _ in sub], dtype=float)
            ys = np.array([y for _, y in sub], dtype=float)
            slope, intercept = np.polyfit(xs, ys, 1)
            r = np.corrcoef(xs, ys)[0, 1]
            got = out.loc[f"g{g}"]
            assert got["n"] == len(sub)
            np.testing.assert_allclose(got["slope"], slope, rtol=1e-9)
            np.testing.assert_allclose(got["intercept"], intercept,
                                       rtol=1e-9)
            np.testing.assert_allclose(got["corr"], r, rtol=1e-12)

    def test_vertical_and_constant_edges(self, spark):
        rows = [
            # all x equal → vertical fit: slope/intercept/corr NULL
            ("v", 5, 1), ("v", 5, 2), ("v", 5, 3),
            # constant y → slope 0, corr NULL (zero y-variance)
            ("c", 1, 7), ("c", 2, 7), ("c", 3, 7),
            # single point → everything NULL except n
            ("s", 4, 9),
        ]
        df = _points_df(spark, rows, ["series_id", "x", "y"])
        out = (linreg_stats(df, ["series_id"], "x", "y")
               .toPandas().set_index("series_id"))
        assert pd.isna(out.loc["v", "slope"])
        assert pd.isna(out.loc["v", "corr"])
        assert out.loc["c", "slope"] == 0.0
        assert out.loc["c", "intercept"] == 7.0
        assert pd.isna(out.loc["c", "corr"])
        assert out.loc["s", "n"] == 1
        assert pd.isna(out.loc["s", "slope"])


class TestAutocorr:
    def test_matches_pandas_dense(self, spark, rng):
        y = rng.integers(0, 50, size=40)
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        out = (autocorr(df, [1, 2, 3], "series_id", "idx", "y")
               .toPandas().set_index("lag").sort_index())
        s = pd.Series(y, dtype=float)
        for k in (1, 2, 3):
            # time-lag pairing on a dense grid == shifted Pearson corr
            expect = s.iloc[:-k].reset_index(drop=True).corr(
                s.iloc[k:].reset_index(drop=True))
            np.testing.assert_allclose(out.loc[k, "acf"], expect,
                                       rtol=1e-12)
            assert out.loc[k, "n_pairs"] == len(y) - k

    def test_gaps_drop_pairs(self, spark):
        # idx 0,1,2,5,6 — lag-1 pairs: (0,1),(1,2),(5,6) → 3 pairs
        rows = [("a", i, v) for i, v in
                [(0, 1), (1, 3), (2, 2), (5, 8), (6, 4)]]
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        out = (autocorr(df, [1], "series_id", "idx", "y")
               .toPandas().iloc[0])
        assert out["n_pairs"] == 3
        xs = np.array([1.0, 3.0, 8.0])
        ys = np.array([3.0, 2.0, 4.0])
        np.testing.assert_allclose(out["acf"], np.corrcoef(xs, ys)[0, 1],
                                   rtol=1e-12)

    def test_zero_variance_null(self, spark):
        rows = [("a", i, 5) for i in range(10)]
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        out = autocorr(df, [1], "series_id", "idx", "y").toPandas()
        assert pd.isna(out["acf"].iloc[0])
        assert out["n_pairs"].iloc[0] == 9


class TestEwma:
    def test_matches_pandas_adjusted(self, spark, rng):
        y = rng.integers(0, 100, size=12)
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = (ewma(df, alpha=0.5, window=16, order_col="bucket_ts")
               .toPandas().sort_values("bucket_ts"))
        # n <= window: identical to pandas ewm(adjust=True)
        expect = pd.Series(y, dtype=float).ewm(alpha=0.5,
                                               adjust=True).mean()
        np.testing.assert_allclose(out["ewma"].to_numpy(),
                                   expect.to_numpy(), rtol=1e-12)
        assert list(out["n_obs"]) == list(range(1, 13))

    def test_window_truncates(self, spark):
        n, w = 10, 4
        rows = [("a", i, i + 1) for i in range(n)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = (ewma(df, alpha=0.5, window=w, order_col="bucket_ts")
               .toPandas().sort_values("bucket_ts"))
        ys = np.arange(1.0, n + 1)
        for i in range(n):
            lo = max(0, i - w + 1)
            tail = ys[lo:i + 1][::-1]          # newest first
            wts = 0.5 ** np.arange(len(tail))
            np.testing.assert_allclose(
                out["ewma"].iloc[i], float((tail * wts).sum() / wts.sum()),
                rtol=1e-12)
        assert out["n_obs"].max() == w

    def test_alpha_validation(self, spark):
        df = _points_df(spark, [("a", 0, 1)], ["series_id", "bucket_ts", "y"])
        with pytest.raises(ValueError):
            ewma(df, alpha=0.0)
        with pytest.raises(ValueError):
            ewma(df, window=0)


class TestHistogram:
    def test_matches_numpy(self, spark, rng):
        ys = rng.integers(-20, 120, size=200)
        rows = [("a", "b0", int(v)) for v in ys]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = (histogram(df, lo=0.0, hi=100.0, nbins=10)
               .toPandas().set_index("bin")["n"])
        under = int((ys < 0).sum())
        over = int((ys >= 100).sum())
        counts, _ = np.histogram(ys[(ys >= 0) & (ys < 100)],
                                 bins=10, range=(0, 100))
        assert out.get(0, 0) == under
        assert out.get(11, 0) == over
        for b in range(10):
            assert out.get(b + 1, 0) == counts[b]
        assert out.sum() == len(ys)

    def test_boundaries(self, spark):
        # lo lands in bin 1, hi in overflow, hi-epsilon in bin nbins
        rows = [("a", "b0", v) for v in [0.0, 99.999, 100.0, -0.001]]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = (histogram(df, 0.0, 100.0, 10)
               .toPandas().set_index("bin")["n"])
        assert out.get(1) == 1 and out.get(10) == 1
        assert out.get(11) == 1 and out.get(0) == 1

    def test_long_format_sparse(self, spark):
        df = _points_df(spark, [("a", "b0", 5)],
                        ["series_id", "bucket_ts", "y"])
        out = histogram(df, 0.0, 100.0, 10).toPandas()
        assert len(out) == 1          # only the occupied bin emitted

    def test_validation(self, spark):
        df = _points_df(spark, [("a", "b0", 5)],
                        ["series_id", "bucket_ts", "y"])
        with pytest.raises(ValueError):
            histogram(df, 0.0, 100.0, 0)
        with pytest.raises(ValueError):
            histogram(df, 5.0, 5.0, 10)


class TestAnomalyZscore:
    def test_flags_spike_only(self, spark):
        # stable alternating series, one huge spike at position 20
        ys = [10, 12] * 15
        ys[20] = 500
        rows = [("a", i, v) for i, v in enumerate(ys)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = (anomaly_zscore(df, window=8, threshold=3.0, min_obs=4)
               .toPandas())
        assert list(out["bucket_ts"]) == [20]
        got = out.iloc[0]
        prev = np.array(ys[12:20], dtype=float)
        expect = (500 - prev.mean()) / prev.std(ddof=1)
        np.testing.assert_allclose(got["z"], expect, rtol=1e-12)
        assert got["n_prev"] == 8

    def test_flat_window_emits_nothing(self, spark):
        rows = [("a", i, 7) for i in range(30)]
        rows.append(("a", 30, 7000))     # spike after a zero-variance run
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = anomaly_zscore(df, window=8, threshold=3.0).toPandas()
        assert len(out) == 0             # flat prior window → unscorable

    def test_cold_start_guard(self, spark):
        rows = [("a", 0, 1), ("a", 1, 2), ("a", 2, 1000)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = anomaly_zscore(df, window=8, threshold=3.0,
                             min_obs=8).toPandas()
        assert len(out) == 0             # fewer than min_obs priors


class TestCusumChangepoint:
    def test_finds_step_change(self, spark):
        # flat 10 then flat 20 — CUSUM peaks exactly at the step
        y = [10] * 8 + [20] * 8
        rows = [("a", i, v) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = cusum_changepoint(df, order_col="bucket_ts").toPandas().iloc[0]
        s = np.cumsum(y, dtype=float)
        k = np.arange(1, len(y) + 1, dtype=float)
        cus = s - k * (s[-1] / len(y))
        want_k = int(np.argmax(np.abs(cus))) + 1
        assert out["k"] == want_k == 8
        np.testing.assert_allclose(out["cusum"], cus[want_k - 1],
                                   rtol=1e-12)
        assert out["n"] == len(y)

    def test_constant_series_picks_first(self, spark):
        rows = [("a", i, 5) for i in range(6)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = cusum_changepoint(df, order_col="bucket_ts").toPandas().iloc[0]
        assert out["k"] == 1            # all-zero CUSUM → earliest tie
        assert out["cusum"] == 0.0

    def test_plan_no_python(self, spark):
        rows = [("a", i, i) for i in range(4)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        for plan_df in (cusum_changepoint(df, order_col="bucket_ts"),
                        ewma(df, order_col="bucket_ts"),
                        autocorr(df.withColumnRenamed("bucket_ts", "idx"),
                                 [1], "series_id", "idx", "y"),
                        linreg_stats(df, ["series_id"], "bucket_ts", "y")):
            plan = plan_df._jdf.queryExecution().executedPlan().toString()
            assert "Python" not in plan and "BatchEval" not in plan


class TestPeriodStrength:
    def _run(self, spark, rows, n_total, periods=None):
        from dtaidistance_spark.functions.stats import period_strength
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        out = period_strength(df, n_total=n_total, periods=periods)
        return out.toPandas()

    @staticmethod
    def _numpy_r(y_dense, p):
        """Independent PDM variance-ratio on the dense grid."""
        y = np.asarray(y_dense, dtype=float)
        n = len(y)
        phase_means = y.reshape(n // p, p).mean(axis=0)
        ss_between = (n // p) * np.sum(
            (phase_means - y.mean()) ** 2)
        ss_total = np.sum((y - y.mean()) ** 2)
        return ss_between / ss_total

    def test_matches_numpy_dense(self, spark, rng):
        n = 48
        y = rng.integers(0, 50, size=n)
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        out = self._run(spark, rows, n).set_index("period")
        for p in (2, 3, 4, 6, 8, 12, 16, 24):
            np.testing.assert_allclose(
                out.loc[p, "strength"], self._numpy_r(y, p), rtol=1e-12)
            assert out.loc[p, "n_obs"] == n

    def test_sparse_equals_dense_with_zeros(self, spark, rng):
        """Absent buckets are implicit zeros: dropping the zero rows
        must not change any strength."""
        n = 36
        y = rng.integers(0, 8, size=n)
        y[rng.integers(0, n, size=12)] = 0
        dense = [("a", i, int(v)) for i, v in enumerate(y)]
        sparse = [r for r in dense if r[2] != 0]
        a = (self._run(spark, dense, n).set_index("period")["strength"]
             .sort_index())
        b = (self._run(spark, sparse, n).set_index("period")["strength"]
             .sort_index())
        pd.testing.assert_series_equal(a, b)

    def test_periodic_signal_peaks_at_true_period(self, spark):
        n = 336
        true_p = 24
        y = [10 + (7 if i % true_p == 3 else 0) for i in range(n)]
        rows = [("a", i, v) for i, v in enumerate(y)]
        out = self._run(spark, rows, n).set_index("period")
        # exact multiples of 24 explain the full variance (R = 1);
        # every period that is neither a multiple nor shares the
        # within-day structure scores strictly lower
        for p in (24, 48, 168):        # the multiples of 24 dividing 336
            np.testing.assert_allclose(out.loc[p, "strength"], 1.0,
                                       rtol=1e-12)
        assert out.loc[24, "strength"] > out.loc[16, "strength"]
        assert out.loc[24, "strength"] > out.loc[14, "strength"]

    def test_constant_series_null(self, spark):
        rows = [("a", i, 3) for i in range(12)]
        out = self._run(spark, rows, 12).set_index("period")
        assert out["strength"].isna().all()

    def test_non_divisor_period_rejected(self, spark):
        from dtaidistance_spark.functions.stats import period_strength
        df = _points_df(spark, [("a", 0, 1)], ["series_id", "idx", "y"])
        with pytest.raises(ValueError, match="does not divide"):
            period_strength(df, n_total=10, periods=[3])

    def test_out_of_window_rows_ignored(self, spark):
        n = 12
        base = [("a", i, i % 3 + 1) for i in range(n)]
        noisy = base + [("a", -1, 99), ("a", n, 99), ("a", n + 5, 1)]
        a = (self._run(spark, base, n).set_index("period")["strength"]
             .sort_index())
        b = (self._run(spark, noisy, n).set_index("period")["strength"]
             .sort_index())
        pd.testing.assert_series_equal(a, b)

    def test_plan_no_python(self, spark):
        from dtaidistance_spark.functions.stats import period_strength
        rows = [("a", i, 1) for i in range(6)]
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        plan = (period_strength(df, n_total=6)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "BatchEval" not in plan


class TestSeasonalDecompose:
    @staticmethod
    def _numpy_decompose(y, period):
        """Independent additive decomposition (the statsmodels
        seasonal_decompose(model='additive') contract) on a regular
        series: 2xP (even) / P-point (odd) centered MA trend, phase
        means of the detrended interior centered to zero, residual."""
        y = np.asarray(y, dtype=float)
        n = len(y)
        h = period // 2
        trend = np.full(n, np.nan)
        if period % 2 == 0:
            w = np.r_[0.5, np.ones(period - 1), 0.5] / period
        else:
            w = np.ones(period) / period
        half = len(w) // 2
        for i in range(half, n - half):
            trend[i] = np.dot(y[i - half:i + half + 1], w)
        detr = y - trend
        phases = np.arange(n) % period
        sraw = np.full(period, np.nan)
        for p in range(period):
            vals = detr[(phases == p) & ~np.isnan(detr)]
            if len(vals):
                sraw[p] = vals.mean()
        m = np.nanmean(sraw)
        seasonal_by_phase = sraw - m
        seasonal = seasonal_by_phase[phases]
        resid = y - trend - seasonal
        return trend, seasonal, resid

    def _run(self, spark, y, period):
        from dtaidistance_spark.functions.stats import seasonal_decompose
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        out = (seasonal_decompose(df, period=period)
               .toPandas().sort_values("bucket_ts").reset_index(drop=True))
        return out

    @pytest.mark.parametrize("period", [24, 7])
    def test_matches_numpy(self, spark, rng, period):
        n = 5 * period + 3
        y = (100 + 10 * np.sin(2 * np.pi * np.arange(n) / period)
             + rng.integers(0, 9, size=n)).round().astype(int)
        out = self._run(spark, y, period)
        trend, seasonal, resid = self._numpy_decompose(y, period)
        np.testing.assert_allclose(out["trend"], trend, rtol=1e-12)
        np.testing.assert_allclose(out["seasonal"], seasonal, rtol=1e-9,
                                   atol=1e-12)
        np.testing.assert_allclose(out["resid"], resid, rtol=1e-9,
                                   atol=1e-9)

    def test_pure_signal_zero_resid(self, spark):
        period, reps = 6, 8
        pattern = [3, 9, 1, 7, 5, 5]
        y = pattern * reps
        out = self._run(spark, y, period)
        interior = out.dropna(subset=["resid"])
        np.testing.assert_allclose(interior["resid"], 0.0, atol=1e-12)
        # seasonal sums to ~0 over one period
        seas = out["seasonal"].iloc[:period].to_numpy()
        np.testing.assert_allclose(seas.sum(), 0.0, atol=1e-12)

    def test_edges_null(self, spark):
        y = list(range(30))
        out = self._run(spark, y, 10)
        assert out["trend"].iloc[:5].isna().all()
        assert out["trend"].iloc[-5:].isna().all()
        assert out["trend"].iloc[5:-5].notna().all()

    def test_short_series_all_null(self, spark):
        out = self._run(spark, [1, 2, 3], 24)
        assert out["trend"].isna().all()
        assert out["seasonal"].isna().all()

    def test_invalid_period(self, spark):
        from dtaidistance_spark.functions.stats import seasonal_decompose
        df = _points_df(spark, [("a", 0, 1)], ["series_id", "bucket_ts", "y"])
        with pytest.raises(ValueError, match="period"):
            seasonal_decompose(df, period=1)

    def test_plan_no_python(self, spark):
        from dtaidistance_spark.functions.stats import seasonal_decompose
        rows = [("a", i, 1) for i in range(8)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        plan = (seasonal_decompose(df, period=4)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "BatchEval" not in plan


class TestHoltLinear:
    @staticmethod
    def _numpy_holt(y):
        y = np.asarray(y, dtype=float)
        l, b = y[0], y[1] - y[0]
        for v in y[1:]:
            l_new = (v + l + b) / 2.0
            b = ((l_new - l) + b) / 2.0
            l = l_new
        return l, b

    def _run(self, spark, y, horizons=(1,)):
        from dtaidistance_spark.functions.stats import holt_linear
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        return holt_linear(df, horizons=horizons,
                           order_col="bucket_ts").toPandas().iloc[0]

    def test_matches_numpy(self, spark, rng):
        y = rng.integers(0, 1000, size=40)
        out = self._run(spark, y, horizons=(1, 5))
        l, b = self._numpy_holt(y)
        assert out["n"] == 40
        np.testing.assert_allclose(out["level"], l, rtol=1e-12)
        np.testing.assert_allclose(out["trend"], b, rtol=1e-12)
        np.testing.assert_allclose(out["fc_1"], l + b, rtol=1e-12)
        np.testing.assert_allclose(out["fc_5"], l + 5.0 * b, rtol=1e-12)

    def test_linear_series_perfect_forecast(self, spark):
        # exactly linear input: level tracks, trend == slope, forecasts
        # continue the line exactly
        y = [10 + 3 * i for i in range(30)]
        out = self._run(spark, y, horizons=(1, 10))
        np.testing.assert_allclose(out["level"], y[-1], rtol=1e-12)
        np.testing.assert_allclose(out["trend"], 3.0, rtol=1e-12)
        np.testing.assert_allclose(out["fc_10"], y[-1] + 30.0, rtol=1e-12)

    def test_input_order_irrelevant(self, spark, rng):
        from dtaidistance_spark.functions.stats import holt_linear
        y = rng.integers(0, 100, size=20)
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        rows_shuffled = rows[::-1]
        a = holt_linear(_points_df(spark, rows,
                                   ["series_id", "bucket_ts", "y"]),
                        order_col="bucket_ts").toPandas().iloc[0]
        b = holt_linear(_points_df(spark, rows_shuffled,
                                   ["series_id", "bucket_ts", "y"]),
                        order_col="bucket_ts").toPandas().iloc[0]
        assert a["level"] == b["level"] and a["trend"] == b["trend"]

    def test_short_series_null(self, spark):
        out = self._run(spark, [7])
        assert out["n"] == 1
        assert pd.isna(out["level"]) and pd.isna(out["fc_1"])

    def test_horizon_validation(self, spark):
        from dtaidistance_spark.functions.stats import holt_linear
        df = _points_df(spark, [("a", 0, 1)], ["series_id", "bucket_ts", "y"])
        with pytest.raises(ValueError):
            holt_linear(df, horizons=[])
        with pytest.raises(ValueError):
            holt_linear(df, horizons=[0, 1])

    def test_plan_no_python(self, spark):
        from dtaidistance_spark.functions.stats import holt_linear
        rows = [("a", i, 1) for i in range(4)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        plan = (holt_linear(df, order_col="bucket_ts")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "BatchEval" not in plan


class TestHoltDamped:
    @staticmethod
    def _numpy_damped(y, phi):
        y = np.asarray(y, dtype=float)
        l, b = y[0], y[1] - y[0]
        for v in y[1:]:
            l_new = (v + l + phi * b) / 2.0
            b = ((l_new - l) + phi * b) / 2.0
            l = l_new
        return l, b

    def _run(self, spark, y, phi, horizons=(1,)):
        from dtaidistance_spark.functions.stats import holt_linear
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        return holt_linear(df, horizons=horizons, order_col="bucket_ts",
                           phi=phi).toPandas().iloc[0]

    def test_matches_numpy(self, spark, rng):
        y = rng.integers(0, 500, size=30)
        out = self._run(spark, y, phi=0.5, horizons=(1, 4))
        l, b = self._numpy_damped(y, 0.5)
        np.testing.assert_allclose(out["level"], l, rtol=1e-12)
        np.testing.assert_allclose(out["trend"], b, rtol=1e-12)
        np.testing.assert_allclose(out["fc_1"], l + 0.5 * b, rtol=1e-12)
        np.testing.assert_allclose(
            out["fc_4"], l + (0.5 + 0.25 + 0.125 + 0.0625) * b, rtol=1e-12)

    def test_phi_one_identical_to_undamped(self, spark, rng):
        from dtaidistance_spark.functions.stats import holt_linear
        y = [int(v) for v in rng.integers(0, 100, size=25)]
        rows = [("a", i, v) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        a = holt_linear(df, horizons=(3,), order_col="bucket_ts") \
            .toPandas().iloc[0]
        b = holt_linear(df, horizons=(3,), order_col="bucket_ts",
                        phi=1.0).toPandas().iloc[0]
        assert a["level"] == b["level"] and a["trend"] == b["trend"]
        assert a["fc_3"] == b["fc_3"]

    def test_damped_forecasts_bounded(self, spark):
        # a strong linear trend: undamped forecasts grow without bound,
        # phi-damped ones approach level + phi/(1-phi)*trend
        y = [10 + 5 * i for i in range(40)]
        und = self._run(spark, y, phi=1.0, horizons=(100,))
        dmp = self._run(spark, y, phi=0.5, horizons=(100,))
        assert und["fc_100"] > und["level"] + 400.0
        limit = dmp["level"] + (0.5 / 0.5) * dmp["trend"]
        np.testing.assert_allclose(dmp["fc_100"], limit, rtol=1e-9)

    def test_phi_validation(self, spark):
        from dtaidistance_spark.functions.stats import holt_linear
        df = _points_df(spark, [("a", 0, 1)], ["series_id", "bucket_ts", "y"])
        for bad in (0.0, -0.5, 1.5):
            with pytest.raises(ValueError, match="phi"):
                holt_linear(df, phi=bad)


class TestBaselineForecasts:
    def _run(self, spark, y, horizons=(1,), season=None):
        from dtaidistance_spark.functions.stats import baseline_forecasts
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        return baseline_forecasts(df, horizons=horizons, season=season,
                                  order_col="bucket_ts").toPandas().iloc[0]

    def test_naive_snaive_drift(self, spark, rng):
        m = 7
        y = [int(v) for v in rng.integers(0, 100, size=25)]
        out = self._run(spark, y, horizons=(1, 3, 9), season=m)
        n = len(y)
        for h in (1, 3, 9):
            assert out[f"naive_{h}"] == y[-1]
            # FPP snaive: y[n + h - m*ceil(h/m)] (1-based)
            back = m * -(-h // m)
            assert out[f"snaive_{h}"] == y[n + h - back - 1]
            np.testing.assert_allclose(
                out[f"drift_{h}"],
                y[-1] + h * (y[-1] - y[0]) / (n - 1), rtol=1e-12)

    def test_seasonal_signal_snaive_exact(self, spark):
        m = 4
        pattern = [10, 20, 30, 40]
        y = pattern * 6
        out = self._run(spark, y, horizons=(1, 2, 3, 4, 5), season=m)
        # a pure m-periodic series: snaive forecasts continue it exactly
        for h in (1, 2, 3, 4, 5):
            assert out[f"snaive_{h}"] == pattern[(len(y) + h - 1) % m]

    def test_single_point_edges(self, spark):
        out = self._run(spark, [7], horizons=(2,), season=3)
        assert out["naive_2"] == 7.0
        assert pd.isna(out["drift_2"])
        assert pd.isna(out["snaive_2"])     # phase source before start

    def test_validation(self, spark):
        from dtaidistance_spark.functions.stats import baseline_forecasts
        df = _points_df(spark, [("a", 0, 1)], ["series_id", "bucket_ts", "y"])
        with pytest.raises(ValueError):
            baseline_forecasts(df, horizons=())
        with pytest.raises(ValueError):
            baseline_forecasts(df, season=0)

    def test_plan_no_python(self, spark):
        from dtaidistance_spark.functions.stats import baseline_forecasts
        rows = [("a", i, 1) for i in range(5)]
        df = _points_df(spark, rows, ["series_id", "bucket_ts", "y"])
        plan = (baseline_forecasts(df, horizons=(1,), season=2,
                                   order_col="bucket_ts")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "BatchEval" not in plan


class TestCrossCorr:
    def test_matches_numpy_and_lead_lag(self, spark, rng):
        from dtaidistance_spark.functions.stats import cross_corr

        n = 60
        ya = [int(v) for v in rng.integers(0, 100, size=n)]
        yb = [0, 0, 0] + ya[:-3]         # b follows a by 3 buckets
        rows = ([("a", i, v) for i, v in enumerate(ya)]
                + [("b", i, v) for i, v in enumerate(yb)])
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        out = (cross_corr(df, [("a", "b")], lags=[0, 1, 2, 3, 4])
               .toPandas().set_index("lag").sort_index())
        # peak exactly at lag 3, correlation 1 (pure shift)
        np.testing.assert_allclose(out.loc[3, "ccf"], 1.0, rtol=1e-12)
        assert out.loc[3, "n_pairs"] == n - 3
        assert out["ccf"].idxmax() == 3
        # lag 0 matches numpy's plain Pearson on the overlap
        expect = np.corrcoef(ya, yb)[0, 1]
        np.testing.assert_allclose(out.loc[0, "ccf"], expect, rtol=1e-12)

    def test_gaps_drop_pairs_and_self_pair(self, spark):
        from dtaidistance_spark.functions.stats import autocorr, cross_corr

        rows = [("a", i, v) for i, v in
                [(0, 1), (1, 3), (2, 2), (5, 8), (6, 4)]]
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        # (a, a) at lag k must equal autocorr at lag k
        cc = (cross_corr(df, [("a", "a")], lags=[1])
              .toPandas().iloc[0])
        ac = autocorr(df, [1], "series_id", "idx", "y").toPandas().iloc[0]
        assert cc["n_pairs"] == ac["n_pairs"] == 3
        assert cc["ccf"] == ac["acf"]

    def test_pairs_dataframe_and_plan(self, spark):
        from dtaidistance_spark.functions.stats import cross_corr

        rows = ([("a", i, i % 5) for i in range(20)]
                + [("b", i, (i + 1) % 5) for i in range(20)]
                + [("c", i, 7) for i in range(20)])
        df = _points_df(spark, rows, ["series_id", "idx", "y"])
        pairs = spark.createDataFrame([("a", "b"), ("a", "c")],
                                      ["a", "b"])
        out = cross_corr(df, pairs, lags=[0]).toPandas() \
            .set_index(["a", "b"])
        assert pd.isna(out.loc[("a", "c"), "ccf"])   # zero variance
        assert out.loc[("a", "b"), "n_pairs"] == 20
        plan = (cross_corr(df, pairs, lags=[0])
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan
        assert "BroadcastHashJoin" in plan           # pair list broadcast


class TestHampel:
    """functions/preprocessing.py::hampel — rolling-median outlier
    repair, checked against a pure-numpy replay of the same contract
    (full ±w positional windows, 1.4826 consistency constant)."""

    @staticmethod
    def _numpy_hampel(vals, w, nsigma):
        import numpy as np
        v = np.asarray(vals, dtype=float)
        n = len(v)
        out = []
        for p in range(n):
            if p < w or p > n - 1 - w:
                out.append((None, None, False, v[p]))
                continue
            win = v[p - w:p + w + 1]
            med = float(np.sort(win)[w])
            mad = float(np.sort(np.abs(win - med))[w])
            is_out = bool(abs(v[p] - med) > nsigma * 1.4826 * mad)
            out.append((med, mad, is_out, med if is_out else v[p]))
        return out

    def test_matches_numpy_reference(self, spark):
        import numpy as np
        rng = np.random.default_rng(11)
        rows = []
        expect = {}
        for s in range(4):
            vals = list(rng.integers(0, 20, 40))
            for spike_at in (7, 23):              # planted spikes
                vals[spike_at] += 500
            rows += [(f"s{s}", i, int(v)) for i, v in enumerate(vals)]
            expect[f"s{s}"] = self._numpy_hampel(vals, 3, 3.0)
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        from dtaidistance_spark.functions.preprocessing import hampel
        got = hampel(df, window=3, nsigma=3.0).toPandas()
        assert len(got) == 160
        for _, r in got.iterrows():
            med, mad, is_out, clean = expect[r["series_id"]][r["idx"]]
            if med is None:
                assert r["med"] is None or r["med"] != r["med"]
                assert not r["is_outlier"]
            else:
                assert r["med"] == med and r["mad"] == mad
                assert bool(r["is_outlier"]) == is_out
            assert r["y_clean"] == clean

    def test_spikes_repaired_calm_points_untouched(self, spark):
        rows = [("s", i, 10) for i in range(21)]
        rows[10] = ("s", 10, 1000)
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        from dtaidistance_spark.functions.preprocessing import hampel
        got = (hampel(df, window=2, nsigma=3.0).toPandas()
               .set_index("idx").sort_index())
        assert bool(got.loc[10, "is_outlier"])
        assert got.loc[10, "y_clean"] == 10.0
        others = got.drop(index=10)
        assert not others["is_outlier"].any()
        assert (others["y_clean"] == others["y"]).all()

    def test_mad_zero_keeps_constant_series(self, spark):
        # constant window => MAD 0; strict > keeps equal-to-median
        # points in, so a flat series is never "repaired"
        rows = [("s", i, 5) for i in range(11)]
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        from dtaidistance_spark.functions.preprocessing import hampel
        got = hampel(df, window=3, nsigma=3.0).toPandas()
        assert not got["is_outlier"].any()
        assert (got["y_clean"] == 5.0).all()


class TestTheilSen:
    """functions/stats.py::theilsen_trend — median-of-pairwise-slopes
    robust fit, checked against a pure-numpy replay."""

    def test_matches_numpy_reference(self, spark):
        import numpy as np
        rng = np.random.default_rng(23)
        rows, expect = [], {}
        for s in range(5):
            xs = sorted(rng.choice(40, size=12, replace=False))
            ys = [int(3 * x + rng.integers(-4, 5)) for x in xs]
            ys[rng.integers(0, 12)] += 800          # one wild outlier
            rows += [(f"s{s}", int(x), int(y)) for x, y in zip(xs, ys)]
            sl = sorted((ys[j] - ys[i]) / (xs[j] - xs[i])
                        for i in range(12) for j in range(i + 1, 12))
            m = len(sl)
            slope = (sl[m // 2] if m % 2 == 1
                     else (sl[m // 2 - 1] + sl[m // 2]) / 2.0)
            rs = sorted(y - slope * x for x, y in zip(xs, ys))
            r = len(rs)
            inter = (rs[r // 2] if r % 2 == 1
                     else (rs[r // 2 - 1] + rs[r // 2]) / 2.0)
            expect[f"s{s}"] = (slope, inter)
        df = spark.createDataFrame(rows, ["series_id", "x", "y"])
        from dtaidistance_spark.functions.stats import theilsen_trend
        got = theilsen_trend(df, ["series_id"]).toPandas()
        for _, row in got.iterrows():
            slope, inter = expect[row["series_id"]]
            assert row["slope"] == slope         # identical IEEE tree
            assert row["intercept"] == inter
            assert row["n"] == 12

    def test_outlier_immune_where_ols_is_not(self, spark):
        from dtaidistance_spark.functions.stats import (linreg_stats,
                                                        theilsen_trend)
        xs = list(range(20))
        ys = [2 * x + 1 for x in xs]
        ys[10] = 10_000
        df = spark.createDataFrame(
            [("s", x, y) for x, y in zip(xs, ys)],
            ["series_id", "x", "y"])
        ts = theilsen_trend(df, ["series_id"]).toPandas().iloc[0]
        ols = linreg_stats(df, ["series_id"]).toPandas().iloc[0]
        assert ts["slope"] == 2.0 and ts["intercept"] == 1.0
        assert abs(ols["slope"] - 2.0) > 5      # OLS dragged hard

    def test_degenerate_groups_null(self, spark):
        from dtaidistance_spark.functions.stats import theilsen_trend
        df = spark.createDataFrame(
            [("one", 1, 5), ("vert", 3, 1), ("vert", 3, 9)],
            ["series_id", "x", "y"])
        got = (theilsen_trend(df, ["series_id"]).toPandas()
               .set_index("series_id"))
        assert got.loc["one", "slope"] != got.loc["one", "slope"]
        assert got.loc["vert", "slope"] != got.loc["vert", "slope"]


class TestForecastAccuracy:
    """functions/stats.py::forecast_accuracy — FPP §5.8 holdout
    backtest of the §5.2 baselines, vs a pure-numpy replay."""

    def test_matches_numpy_reference(self, spark):
        import numpy as np
        rng = np.random.default_rng(31)
        H, m = 8, 12
        rows, series = [], {}
        for s in range(4):
            ys = list(map(int, rng.integers(0, 25, 30 + 4 * s)))
            series[f"s{s}"] = ys
            rows += [(f"s{s}", i, v) for i, v in enumerate(ys)]
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import forecast_accuracy
        got = forecast_accuracy(df, holdout=H, season=m).toPandas()
        assert set(got["method"]) == {"naive", "drift", "snaive"}
        for (sid, meth), row in got.set_index(
                ["series_id", "method"]).iterrows():
            ys = series[sid]
            nt = len(ys) - H
            if meth == "naive":
                f = [ys[nt - 1]] * H
            elif meth == "drift":
                f = [ys[nt - 1] + h * (ys[nt - 1] - ys[0]) / (nt - 1)
                     for h in range(1, H + 1)]
            else:
                f = [ys[nt + h - m * int(np.ceil(h / m)) - 1]
                     for h in range(1, H + 1)]
            e = np.array(ys[nt:], dtype=float) - np.array(f)
            scale = np.mean([abs(ys[t] - ys[t - m])
                             for t in range(m, nt)])
            assert row["n_train"] == nt and row["n_test"] == H
            np.testing.assert_allclose(row["mae"], np.mean(np.abs(e)),
                                       rtol=1e-12)
            np.testing.assert_allclose(
                row["rmse"], np.sqrt(np.mean(e ** 2)), rtol=1e-12)
            np.testing.assert_allclose(
                row["mase"], np.mean(np.abs(e)) / scale, rtol=1e-12)

    def test_perfect_seasonal_series_snaive_wins(self, spark):
        pattern = [3, 9, 1, 7]
        ys = pattern * 10                     # perfectly 4-seasonal
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import forecast_accuracy
        got = (forecast_accuracy(df, holdout=8, season=4).toPandas()
               .set_index("method"))
        assert got.loc["snaive", "mae"] == 0.0
        # the in-sample seasonal naive is also perfect -> scale 0 ->
        # MASE undefined (NULL), the FPP degenerate case
        assert got.loc["snaive", "mase"] != got.loc["snaive", "mase"]
        assert got.loc["naive", "mae"] > 0

    def test_short_series_dropped(self, spark):
        df = spark.createDataFrame(
            [("s", i, i) for i in range(5)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import forecast_accuracy
        assert forecast_accuracy(df, holdout=4, season=None).count() == 0


class TestKalmanLevel:
    """functions/stats.py::kalman_level — local-level Kalman filter,
    vs a pure-python fold and its steady-state theory."""

    @staticmethod
    def _fold(ys, q, r):
        l, p = float(ys[0]), 1.0
        for y in ys[1:]:
            pp = p + q
            k = pp / (pp + r)
            l = l + k * (float(y) - l)
            p = (1 - k) * pp
        return l, p, (p + q) / ((p + q) + r)

    def test_matches_python_fold_bit_exact(self, spark):
        import numpy as np
        rng = np.random.default_rng(17)
        rows, expect = [], {}
        for s in range(5):
            ys = list(map(int, rng.integers(0, 50, 30 + s)))
            rows += [(f"s{s}", i, v) for i, v in enumerate(ys)]
            expect[f"s{s}"] = self._fold(ys, 0.25, 1.0)
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import kalman_level
        got = kalman_level(df, q=0.25, r=1.0).toPandas()
        for _, row in got.iterrows():
            l, p, k = expect[row["series_id"]]
            assert row["level"] == l          # identical IEEE fold
            assert row["var_p"] == p
            assert row["gain_next"] == k

    def test_steady_state_gain(self, spark):
        # long series: gain converges to the root of k^2 r = (1-k) q
        import numpy as np
        q, r = 0.25, 1.0
        ys = [(i * 7) % 13 for i in range(400)]
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import kalman_level
        got = kalman_level(df, q=q, r=r).toPandas().iloc[0]
        # k* solves k^2 + k q/r - q/r = 0 (Durbin-Koopman steady state)
        qr = q / r
        k_star = (-qr + np.sqrt(qr * qr + 4 * qr)) / 2
        assert abs(got["gain_next"] - k_star) < 1e-12
        assert 0 < got["gain_next"] < 1

    def test_constant_series_tracks_level(self, spark):
        df = spark.createDataFrame(
            [("s", i, 7) for i in range(50)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import kalman_level
        got = kalman_level(df).toPandas().iloc[0]
        assert got["level"] == 7.0
        assert got["n"] == 50

    def test_single_point_is_init_state(self, spark):
        df = spark.createDataFrame([("s", 0, 42)],
                                   ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import kalman_level
        got = kalman_level(df).toPandas().iloc[0]
        assert got["level"] == 42.0 and got["var_p"] == 1.0


class TestBinarySegmentation:
    """functions/stats.py::binary_segmentation — two-level CUSUM
    segmentation vs a numpy replay of the same argmax."""

    @staticmethod
    def _cusum_argmax(ys):
        import numpy as np
        y = np.asarray(ys, dtype=float)
        n = len(y)
        sk = np.cumsum(y)
        c = sk - np.arange(1, n + 1) * (sk[-1] / n)
        k = int(np.lexsort((np.arange(n), -np.abs(c)))[0])  # earliest max
        return k + 1, float(c[k])

    def test_two_planted_shifts_recovered(self, spark):
        ys = [0] * 30 + [50] * 30 + [100] * 30   # shifts at 30, 60
        rows = [("s", i, v) for i, v in enumerate(ys)]
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import binary_segmentation
        got = (binary_segmentation(df).toPandas()
               .set_index(["level", "segment"]).sort_index())
        k1, c1 = self._cusum_argmax(ys)
        assert got.loc[(1, 0), "k"] == k1
        assert got.loc[(1, 0), "cusum"] == c1
        left, right = ys[:k1], ys[k1:]
        kl, cl = self._cusum_argmax(left)
        kr, cr = self._cusum_argmax(right)
        assert got.loc[(2, 0), "k"] == kl
        assert got.loc[(2, 0), "cusum"] == cl
        assert got.loc[(2, 1), "k"] == kr
        assert got.loc[(2, 1), "cusum"] == cr
        # with these magnitudes both true shifts are found
        cps = sorted([got.loc[(1, 0), "k"],
                      got.loc[(2, 0), "k"] if got.loc[(1, 0), "k"] < 30
                      else got.loc[(1, 0), "k"] + got.loc[(2, 1), "k"]])
        assert 30 in set([got.loc[(1, 0), "k"],
                          got.loc[(1, 0), "k"] + got.loc[(2, 1), "k"], kl])
        assert 60 in set([got.loc[(1, 0), "k"],
                          got.loc[(1, 0), "k"] + got.loc[(2, 1), "k"], kl])

    def test_matches_numpy_on_random_series(self, spark):
        import numpy as np
        rng = np.random.default_rng(13)
        rows, series = [], {}
        for s in range(5):
            ys = list(map(int, rng.integers(0, 100, 40)))
            series[f"s{s}"] = ys
            rows += [(f"s{s}", i, v) for i, v in enumerate(ys)]
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import binary_segmentation
        got = (binary_segmentation(df).toPandas()
               .set_index(["series_id", "level", "segment"]))
        for sid, ys in series.items():
            k1, c1 = self._cusum_argmax(ys)
            assert got.loc[(sid, 1, 0), "k"] == k1
            assert got.loc[(sid, 1, 0), "cusum"] == c1
            kl, cl = self._cusum_argmax(ys[:k1])
            kr, cr = self._cusum_argmax(ys[k1:])
            if len(ys[:k1]) >= 2:
                assert got.loc[(sid, 2, 0), "k"] == kl
                assert got.loc[(sid, 2, 0), "cusum"] == cl
            if len(ys[k1:]) >= 2:
                assert got.loc[(sid, 2, 1), "k"] == kr
                assert got.loc[(sid, 2, 1), "cusum"] == cr

    def test_one_point_segment_dropped(self, spark):
        # argmax at k=1 -> left segment has a single point -> no
        # (2, 0) row
        ys = [100, 0, 0, 0, 0]
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import binary_segmentation
        got = (binary_segmentation(df).toPandas()
               .set_index(["level", "segment"]))
        assert got.loc[(1, 0), "k"] == 1
        assert (2, 0) not in got.index
        assert (2, 1) in got.index


class TestRollingCorr:
    """functions/stats.py::rolling_corr — windowed Pearson between
    pairs, vs pandas .rolling().corr() on the aligned frame."""

    def test_matches_pandas_rolling(self, spark):
        import numpy as np
        rng = np.random.default_rng(41)
        n = 60
        ya = rng.integers(0, 50, n)
        yb = (ya * 2 + rng.integers(0, 10, n))
        rows = ([("a", i, int(v)) for i, v in enumerate(ya)]
                + [("b", i, int(v)) for i, v in enumerate(yb)])
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        from dtaidistance_spark.functions.stats import rolling_corr
        got = (rolling_corr(df, [("a", "b")], window=12).toPandas()
               .sort_values("idx").reset_index(drop=True))
        ref = (pd.Series(ya, dtype=float).rolling(12)
               .corr(pd.Series(yb, dtype=float)))
        assert len(got) == n
        for i in range(n):
            if i < 11:
                assert pd.isna(got.loc[i, "corr"])
            else:
                np.testing.assert_allclose(got.loc[i, "corr"],
                                           ref.iloc[i], rtol=1e-12)
        assert (got["n_win"].iloc[11:] == 12).all()

    def test_gaps_pair_on_common_buckets(self, spark):
        # b missing idx 2: the pair stream skips it; window counts
        # co-observed buckets only
        rows = ([("a", i, v) for i, v in
                 [(0, 1), (1, 3), (2, 9), (3, 2), (4, 5)]]
                + [("b", i, v) for i, v in
                   [(0, 2), (1, 5), (3, 4), (4, 1)]])
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        from dtaidistance_spark.functions.stats import rolling_corr
        got = rolling_corr(df, [("a", "b")], window=2).toPandas()
        assert sorted(got["idx"]) == [0, 1, 3, 4]
        import numpy as np
        r13 = np.corrcoef([3, 2], [5, 4])[0, 1]
        row3 = got.set_index("idx").loc[3]
        np.testing.assert_allclose(row3["corr"], r13, rtol=1e-12)

    def test_decoupling_pair_detected(self, spark):
        import numpy as np
        # first half: b = a (corr 1); second half: b independent
        rng = np.random.default_rng(43)
        ya = list(rng.integers(0, 100, 80))
        yb = ya[:40] + list(rng.integers(0, 100, 40))
        rows = ([("a", i, int(v)) for i, v in enumerate(ya)]
                + [("b", i, int(v)) for i, v in enumerate(yb)])
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        from dtaidistance_spark.functions.stats import rolling_corr
        got = (rolling_corr(df, [("a", "b")], window=16).toPandas()
               .set_index("idx"))
        assert got.loc[39, "corr"] == 1.0          # fully coupled
        assert abs(got.loc[79, "corr"]) < 0.6      # decoupled window


class TestWowBaseline:
    """functions/stats.py::wow_baseline — same-phase prior-period
    baseline deviation."""

    def test_hand_fixture(self, spark):
        from dtaidistance_spark.functions.stats import wow_baseline
        # period 4, two prior periods; idx 8: baselines at 4 (y=6)
        # and 0 (y=10) -> mean 8; y=80 -> ratio 10 -> anomalous
        rows = [("s", 0, 10), ("s", 4, 6), ("s", 8, 80),
                ("s", 1, 5), ("s", 5, 5), ("s", 9, 5)]
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        got = (wow_baseline(df, period=4, n_periods=2, flag_factor=2.0)
               .toPandas().set_index("idx"))
        assert got.loc[8, "n_base"] == 2
        assert got.loc[8, "baseline"] == 8.0
        assert got.loc[8, "ratio"] == 10.0
        assert bool(got.loc[8, "anomalous"])
        assert got.loc[9, "ratio"] == 1.0
        assert not bool(got.loc[9, "anomalous"])
        # idx 0 has no prior period: NULL baseline, not flagged
        assert got.loc[0, "n_base"] == 0
        assert got.loc[0, "baseline"] != got.loc[0, "baseline"]
        assert not bool(got.loc[0, "anomalous"])

    def test_seasonal_cycle_not_flagged_spike_is(self, spark):
        from dtaidistance_spark.functions.stats import wow_baseline
        # strong daily cycle (period 24): hour-of-day pattern repeats
        # exactly; one planted 10x spike
        pattern = [1, 1, 1, 2, 5, 20, 40, 30] * 3   # 24 hours
        ys = pattern * 5                             # 5 days
        ys[4 * 24 + 6] *= 10                         # spike at peak hour
        rows = [("s", i, v) for i, v in enumerate(ys)]
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        got = (wow_baseline(df, period=24, n_periods=2, flag_factor=2.0)
               .toPandas())
        flagged = set(got[got["anomalous"]]["idx"])
        assert flagged == {4 * 24 + 6}   # only the spike, never the cycle

    def test_matches_pandas_reference(self, spark):
        import numpy as np
        from dtaidistance_spark.functions.stats import wow_baseline
        rng = np.random.default_rng(83)
        present = sorted(rng.choice(300, size=180, replace=False))
        ys = {int(i): int(rng.integers(1, 50)) for i in present}
        rows = [("s", i, v) for i, v in ys.items()]
        df = spark.createDataFrame(rows, ["series_id", "idx", "y"])
        got = (wow_baseline(df, period=24, n_periods=3, flag_factor=1.5)
               .toPandas().set_index("idx"))
        assert len(got) == len(ys)
        for i, y in ys.items():
            bases = [ys[i - 24 * k] for k in (1, 2, 3) if i - 24 * k in ys]
            r = got.loc[i]
            assert r["n_base"] == len(bases)
            if bases:
                b = sum(float(x) for x in bases) / len(bases)
                assert r["baseline"] == b
                expect_flag = (y / b > 1.5) or (y / b < 1 / 1.5)
                assert bool(r["anomalous"]) == expect_flag


class TestCroston:
    """functions/stats.py::croston — intermittent-demand forecasting,
    vs a pure-python fold of the documented convention."""

    @staticmethod
    def _fold(ys):
        z = p = 0.0
        q = 1.0
        k = 0
        for y in ys:
            if y > 0:
                if k == 0:
                    z, p = float(y), q
                else:
                    z = (float(y) + z) / 2.0
                    p = (q + p) / 2.0
                k += 1
                q = 1.0
            else:
                q += 1.0
        return z, p, k

    def test_matches_python_fold_bit_exact(self, spark):
        import numpy as np
        rng = np.random.default_rng(53)
        rows, expect = [], {}
        for s in range(5):
            ys = [int(rng.integers(1, 9)) if rng.random() < 0.2 else 0
                  for _ in range(60)]
            rows += [(f"s{s}", i, v) for i, v in enumerate(ys)]
            expect[f"s{s}"] = self._fold(ys)
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import croston
        got = croston(df).toPandas()
        for _, r in got.iterrows():
            z, p, k = expect[r["series_id"]]
            assert r["n_demands"] == k
            if k:
                assert r["z"] == z and r["p"] == p
                assert r["forecast"] == z / p
                assert r["fc_sba"] == 0.75 * (z / p)

    def test_regular_demand_converges_to_rate(self, spark):
        # demand 6 every 3rd period: forecast -> 6/3 = 2 per period
        ys = [6 if i % 3 == 0 else 0 for i in range(90)]
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import croston
        got = croston(df).toPandas().iloc[0]
        assert abs(got["forecast"] - 2.0) < 1e-6
        assert got["n_demands"] == 30

    def test_no_demand_series_null(self, spark):
        df = spark.createDataFrame(
            [("s", i, 0) for i in range(10)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import croston
        got = croston(df).toPandas().iloc[0]
        assert got["n_demands"] == 0
        assert got["forecast"] != got["forecast"]

    def test_beats_ewma_on_intermittent(self, spark):
        # the motivating property: on strictly periodic intermittent
        # demand the Croston forecast equals the true per-period rate,
        # while the plain smoother's last value depends on where in
        # the cycle the series stops
        ys = [9 if i % 3 == 2 else 0 for i in range(30)]   # ends on 9
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import croston, ewma
        c = croston(df).toPandas().iloc[0]
        e = (ewma(df, alpha=0.5, window=16, order_col="bucket_ts")
             .toPandas().sort_values("bucket_ts").iloc[-1])
        true_rate = 3.0
        assert abs(c["forecast"] - true_rate) < 0.2
        assert abs(e["ewma"] - true_rate) > 1.0   # spiked toward 9


class TestHoltWinters:
    """functions/stats.py::holt_winters — additive triple exponential
    smoothing, vs a pure-python fold of the documented convention."""

    @staticmethod
    def _fold(ys, m):
        import numpy as np
        y = np.asarray(ys, float)
        l = y[:m].mean()
        b = (y[m:2 * m].mean() - y[:m].mean()) / m
        s = list(y[:m] - y[:m].mean())
        for t in range(m, len(y)):
            ph = t % m
            l_new = ((y[t] - s[ph]) + (l + b)) / 2.0
            b_new = ((l_new - l) + b) / 2.0
            s[ph] = ((y[t] - l_new) + s[ph]) / 2.0
            l, b = l_new, b_new
        return l, b, s

    def test_matches_python_fold_bit_exact(self, spark):
        import numpy as np
        rng = np.random.default_rng(61)
        m = 6
        rows, expect = [], {}
        for sid in range(4):
            ys = [int(v) for v in rng.integers(0, 40, 30 + 6 * sid)]
            rows += [(f"s{sid}", i, v) for i, v in enumerate(ys)]
            expect[f"s{sid}"] = (ys, self._fold(ys, m))
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import holt_winters
        got = holt_winters(df, season=m, horizons=(1, 2, 6)).toPandas()
        for _, r in got.iterrows():
            ys, (l, b, s) = expect[r["series_id"]]
            n = len(ys)
            assert r["level"] == l and r["trend"] == b   # bit-equal
            for h in (1, 2, 6):
                back = m * ((h + m - 1) // m)
                fc = l + h * b + s[(n + h - back - 1) % m]
                assert r[f"fc_{h}"] == fc

    def test_pure_seasonal_series_forecast_exact(self, spark):
        # perfectly m-seasonal, zero trend: forecasts continue the
        # pattern (init is already exact, recurrence preserves it)
        pattern = [10, 20, 2, 8]
        ys = pattern * 8
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import holt_winters
        got = (holt_winters(df, season=4, horizons=(1, 2, 3, 4))
               .toPandas().iloc[0])
        assert got["trend"] == 0.0
        for h in (1, 2, 3, 4):
            assert abs(got[f"fc_{h}"] - pattern[(len(ys) + h - 1) % 4]) \
                < 1e-9

    def test_seasonal_beats_plain_holt(self, spark):
        import numpy as np
        # strong seasonality: HW one-step error << Holt's
        rng = np.random.default_rng(67)
        pattern = [0, 30, 5, 15]
        full = [int(p + rng.integers(0, 3)) for _ in range(11)
                for p in pattern]
        # cut AFTER a phase-0 value so the next point is the 0->30
        # jump — the spot where a non-seasonal smoother must miss
        ys = full[:41]                      # ends at phase 0
        actual = full[41]                   # phase 1, ~30
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import (holt_linear,
                                                        holt_winters)
        hw = holt_winters(df, season=4).toPandas().iloc[0]["fc_1"]
        ho = holt_linear(df, horizons=(1,)).toPandas().iloc[0]["fc_1"]
        assert abs(hw - actual) < 4
        assert abs(ho - actual) > 6

    def test_short_series_dropped(self, spark):
        df = spark.createDataFrame(
            [("s", i, i) for i in range(7)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import holt_winters
        assert holt_winters(df, season=4).count() == 0


class TestThetaForecast:
    """functions/stats.py::theta_forecast — the classical two-line
    Theta method vs a pure-python replay."""

    @staticmethod
    def _ref(ys, hs):
        import numpy as np
        n = len(ys)
        t = np.arange(1, n + 1, dtype=float)
        y = np.asarray(ys, float)
        sx, sxx = n * (n + 1) / 2.0, n * (n + 1) * (2 * n + 1) / 6.0
        sy, sxy = y.sum(), (y * t).sum()
        den = n * sxx - sx * sx
        b = (n * sxy - sx * sy) / den
        a = (sy - b * sx) / n
        z = 2.0 * y - (a + b * t)
        s = z[0]
        for v in z[1:]:
            s = (v + s) / 2.0
        return {h: ((a + b * (n + h)) + s) / 2.0 for h in hs}, a, b, s

    def test_matches_python_replay(self, spark):
        import numpy as np
        rng = np.random.default_rng(73)
        rows, expect = [], {}
        for sid in range(5):
            ys = [int(v) for v in rng.integers(0, 60, 25 + sid)]
            rows += [(f"s{sid}", i, v) for i, v in enumerate(ys)]
            expect[f"s{sid}"] = self._ref(ys, (1, 6))
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import theta_forecast
        got = theta_forecast(df, horizons=(1, 6)).toPandas()
        for _, r in got.iterrows():
            fcs, a, b, s = expect[r["series_id"]]
            np.testing.assert_allclose(r["slope"], b, rtol=1e-12)
            np.testing.assert_allclose(r["intercept"], a, rtol=1e-12)
            np.testing.assert_allclose(r["ses"], s, rtol=1e-12)
            for h in (1, 6):
                np.testing.assert_allclose(r[f"fc_{h}"], fcs[h],
                                           rtol=1e-12)

    def test_pure_linear_series_recovered_exactly(self, spark):
        # y = 3t + 2: theta-2 line collapses to the same line, SES
        # lags it but the AVERAGE still tracks the trend direction
        ys = [3 * t + 2 for t in range(1, 31)]
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import theta_forecast
        got = theta_forecast(df, horizons=(1,)).toPandas().iloc[0]
        assert abs(got["slope"] - 3.0) < 1e-12
        assert abs(got["intercept"] - 2.0) < 1e-12
        # fc_1 = (true next + SES of the same line)/2 — within the
        # SES lag bound of the true value
        true_next = 3 * 31 + 2
        assert abs(got["fc_1"] - true_next) < 3.0

    def test_degenerate_null(self, spark):
        df = spark.createDataFrame([("s", 0, 5)],
                                   ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import theta_forecast
        got = theta_forecast(df).toPandas().iloc[0]
        assert got["slope"] != got["slope"]
        assert got["fc_1"] != got["fc_1"]


class TestForecastFamilyCoherence:
    """Cross-operator invariant: on an exactly linear series y = 3t+2
    every forecaster in the family must track the line — drift is
    exact by construction, Holt locks on (its recurrence is exact for
    linear input after init), Theta's trend line is exact, and
    Holt-Winters reduces to Holt when the seasonal component is
    constant.  A family-wide regression canary: if any smoother's op
    tree drifts, this cross-check snaps before any oracle does."""

    def test_linear_series_all_forecasters_agree(self, spark):
        ys = [3 * t + 2 for t in range(1, 41)]
        true_next = 3 * 41 + 2
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(ys)],
            ["series_id", "bucket_ts", "y"])
        from dtaidistance_spark.functions.stats import (
            baseline_forecasts, holt_linear, holt_winters,
            theta_forecast)
        drift = (baseline_forecasts(df, horizons=(1,))
                 .toPandas().iloc[0]["drift_1"])
        holt = holt_linear(df, horizons=(1,)).toPandas().iloc[0]["fc_1"]
        hw = (holt_winters(df, season=4, horizons=(1,))
              .toPandas().iloc[0]["fc_1"])
        theta = theta_forecast(df, horizons=(1,)).toPandas().iloc[0]
        assert drift == float(true_next)            # exact
        assert abs(holt - true_next) < 1e-9         # locks onto line
        # the FPP seasonal init ignores the within-season trend, so
        # s carries a slope-sized bias that the γ=1/2 recurrence only
        # decays geometrically — ~0.11 left after 36 steps here
        assert abs(hw - true_next) < 0.2
        assert abs(theta["slope"] - 3.0) < 1e-12    # OLS exact
        # theta's SES lags a trending line by a bounded amount; the
        # blended forecast stays within the lag bound
        assert abs(theta["fc_1"] - true_next) < 3.5
