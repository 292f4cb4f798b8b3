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
