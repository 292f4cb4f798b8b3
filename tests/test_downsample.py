"""LTTB downsampling: brute-force parity, invariants, operator."""

import numpy as np
import pytest

from dtaidistance_spark.kernels.downsample import lttb


def brute_lttb(t, v, n_out):
    """Straight transcription of the published algorithm for oracle use."""
    n = len(t)
    if n_out >= n or n <= 2:
        return list(range(n))
    m, b = n - 2, n_out - 2
    out = [0]
    a = 0
    for k in range(b):
        lo, hi = 1 + (k * m) // b, 1 + ((k + 1) * m) // b
        if k + 1 < b:
            nlo, nhi = 1 + ((k + 1) * m) // b, 1 + ((k + 2) * m) // b
            t_c = sum(t[nlo:nhi]) / (nhi - nlo)
            v_c = sum(v[nlo:nhi]) / (nhi - nlo)
        else:
            t_c, v_c = t[n - 1], v[n - 1]
        best, besta = -1.0, lo
        for i in range(lo, hi):
            area = abs((t[a] - t_c) * (v[i] - v[a])
                       - (t[a] - t[i]) * (v_c - v[a]))
            if area > best:
                best, besta = area, i
        a = besta
        out.append(a)
    out.append(n - 1)
    return out


class TestLttbKernel:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        for trial in range(20):
            n = int(rng.integers(10, 400))
            t = np.cumsum(rng.integers(1, 5, n)).astype(float)
            v = np.round(rng.normal(0, 10, n), 0)
            n_out = int(rng.integers(3, min(n, 60)))
            assert lttb(t, v, n_out).tolist() == brute_lttb(
                t.tolist(), v.tolist(), n_out), (trial, n, n_out)

    def test_invariants(self):
        rng = np.random.default_rng(5)
        t = np.arange(100, dtype=float)
        v = rng.normal(0, 1, 100)
        idx = lttb(t, v, 12)
        assert len(idx) == 12
        assert idx[0] == 0 and idx[-1] == 99
        assert np.all(np.diff(idx) > 0)          # strictly increasing
        # short series pass through untouched
        assert lttb(t[:5], v[:5], 12).tolist() == [0, 1, 2, 3, 4]

    def test_keeps_extremes(self):
        # a single spike must survive aggressive downsampling
        t = np.arange(200, dtype=float)
        v = np.zeros(200)
        v[77] = 100.0
        idx = lttb(t, v, 10)
        assert 77 in idx


class TestLttbOperator:
    def test_distributed_matches_kernel(self, spark):
        import pandas as pd

        from dtaidistance_spark.operators.downsample import downsample_lttb

        rng = np.random.default_rng(7)
        rows = []
        for sid in ("a", "b", "c"):
            ts = pd.date_range("2024-01-01", periods=150, freq="h")
            vals = np.round(rng.normal(0, 5, 150), 0)
            rows.extend((sid, t.to_pydatetime(), float(v))
                        for t, v in zip(ts, vals))
        df = spark.createDataFrame(
            rows, "series_id string, bucket_ts timestamp, value double")
        got = downsample_lttb(df, 16).orderBy("series_id", "bucket_ts") \
            .toPandas()
        assert len(got) == 48
        pdf = df.toPandas()
        for sid, g in pdf.groupby("series_id"):
            g = g.sort_values("bucket_ts").reset_index(drop=True)
            t = (g["bucket_ts"].values.astype("datetime64[ns]")
                 .view("int64") // 10**9).astype(float)
            idx = lttb(t, g["value"].values.astype(float), 16)
            exp = g.iloc[idx]
            sub = got[got["series_id"] == sid]
            assert sub["value"].tolist() == exp["value"].tolist()
            assert list(sub["bucket_ts"]) == list(exp["bucket_ts"])


class TestAsap:
    def test_sliding_mean_and_metrics(self):
        import numpy as np

        from dtaidistance_spark.kernels.asap import (kurtosis, roughness,
                                                     sliding_mean)

        v = np.array([1.0, 2.0, 6.0, 2.0, 1.0])
        np.testing.assert_allclose(sliding_mean(v, 2),
                                   [1.5, 4.0, 4.0, 1.5])
        np.testing.assert_allclose(sliding_mean(v, 1), v)
        assert roughness(np.array([1.0, 1.0, 1.0])) == 0.0
        # kurtosis of a big spike >> kurtosis of a flat-ish series
        spike = np.zeros(100); spike[50] = 50.0
        assert kurtosis(spike) > 20.0 > kurtosis(np.arange(100.0))

    def test_periodic_noise_picks_period_and_reduces_roughness(self):
        import numpy as np

        from dtaidistance_spark.kernels.asap import (asap_smooth,
                                                     roughness)

        rng = np.random.default_rng(7)
        n, p = 400, 20
        v = (np.tile(np.sin(np.linspace(0, 2 * np.pi, p, endpoint=False)),
                     n // p) * 5.0 + rng.normal(0, 1.0, n))
        w, s = asap_smooth(v, max_window=60)
        assert w > 1                       # it chose to smooth
        assert roughness(s) < 0.5 * roughness(v)

    def test_spike_preservation_vs_oversmoothing(self):
        import numpy as np

        from dtaidistance_spark.kernels.asap import (asap_window,
                                                     kurtosis,
                                                     sliding_mean)

        rng = np.random.default_rng(11)
        v = rng.normal(0, 1.0, 300)
        v[150] = 60.0                      # the anomaly ASAP must keep
        w = asap_window(v, max_window=50)
        assert kurtosis(sliding_mean(v, w)) >= kurtosis(v)

    def test_short_and_constant_series(self):
        import numpy as np

        from dtaidistance_spark.kernels.asap import asap_window

        assert asap_window(np.array([1.0, 2.0]), 10) == 1
        assert asap_window(np.full(50, 3.0), 10) in (1, 2)  # any is fine

    def test_operator_matches_kernel(self, spark):
        import numpy as np
        import pandas as pd

        from dtaidistance_spark.kernels.asap import asap_smooth
        from dtaidistance_spark.operators.downsample import smooth_asap

        rng = np.random.default_rng(3)
        t0 = pd.Timestamp("2024-01-01")
        rows, expect = [], {}
        for sid in ("a", "b"):
            v = (np.tile([0.0, 5.0, 0.0, -5.0], 30)
                 + rng.normal(0, 0.5, 120))
            rows += [(sid, t0 + pd.Timedelta(hours=i), float(x))
                     for i, x in enumerate(v)]
            expect[sid] = asap_smooth(v, 40)
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["series_id", "bucket_ts",
                                        "value"]))
        out = (smooth_asap(df, max_window=40)
               .orderBy("series_id", "bucket_ts").toPandas())
        for sid in ("a", "b"):
            w, s = expect[sid]
            sub = out[out["series_id"] == sid]
            assert set(sub["window"]) == {w}
            np.testing.assert_allclose(sub["value"].to_numpy(), s,
                                       rtol=1e-12)
            assert len(sub) == 120 - w + 1
