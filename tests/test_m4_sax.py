"""M4 downsampling + PAA/SAX: brute-force parity and invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dtaidistance_spark.functions.sax import BREAKPOINTS, paa_sax
from dtaidistance_spark.operators.downsample import downsample_m4


def brute_m4(t_us, v, n_buckets):
    """Straight transcription of the M4 semantics (Jugel VLDB'14) —
    per-bucket first/last/min/max with earliest-point value ties."""
    t0, t1 = min(t_us), max(t_us)
    buckets = {}
    for i, (t, y) in enumerate(zip(t_us, v)):
        k = 0 if t1 == t0 else min(n_buckets - 1,
                                   (t - t0) * n_buckets // (t1 - t0))
        buckets.setdefault(k, []).append((t, y))
    out = {}
    for k, pts in buckets.items():
        pts.sort()
        first = pts[0]
        last = pts[-1]
        vmin = min(pts, key=lambda p: (p[1], p[0]))
        vmax = min(pts, key=lambda p: (-p[1], p[0]))
        for role, p in (("is_first", first), ("is_last", last),
                        ("is_min", vmin), ("is_max", vmax)):
            out.setdefault((k, p[0], p[1]),
                           dict.fromkeys(
                               ("is_first", "is_last",
                                "is_min", "is_max"), False))[role] = True
    return out


def _mk_points(spark, rng, n_series=5, n_pts=200):
    rows = []
    base = 1_600_000_000
    for s in range(n_series):
        ts = np.cumsum(rng.integers(60, 7200, n_pts)) + base
        vals = rng.integers(0, 50, n_pts).astype(float)
        for t, y in zip(ts, vals):
            rows.append((f"s{s}", int(t), float(y)))
    return (spark.createDataFrame(rows, "series_id string, t long, v double")
            .select("series_id",
                    F.timestamp_seconds("t").alias("bucket_ts"),
                    F.col("v").alias("value")))


class TestM4:
    def test_matches_bruteforce(self, spark, rng):
        pts = _mk_points(spark, rng)
        got = downsample_m4(pts, 16).collect()
        pdf = pts.toPandas()
        for sid, grp in pdf.groupby("series_id"):
            t_us = (grp["bucket_ts"].values.astype("datetime64[us]")
                    .view("int64").tolist())
            want = brute_m4(t_us, grp["value"].tolist(), 16)
            have = {}
            for r in got:
                if r["series_id"] != sid:
                    continue
                t = np.datetime64(r["bucket_ts"], "us").view("int64")
                have[(r["bucket"], int(t), r["value"])] = {
                    "is_first": r["is_first"], "is_last": r["is_last"],
                    "is_min": r["is_min"], "is_max": r["is_max"]}
            assert have == want, sid

    def test_single_point_series(self, spark):
        pts = (spark.createDataFrame([("a", 1_600_000_000, 5.0)],
                                     "series_id string, t long, v double")
               .select("series_id",
                       F.timestamp_seconds("t").alias("bucket_ts"),
                       F.col("v").alias("value")))
        rows = downsample_m4(pts, 10).collect()
        assert len(rows) == 1 and rows[0]["bucket"] == 0
        assert all(rows[0][c] for c in
                   ("is_first", "is_last", "is_min", "is_max"))

    def test_output_bounded(self, spark, rng):
        pts = _mk_points(spark, rng, n_series=3, n_pts=500)
        out = downsample_m4(pts, 12).groupBy("series_id").count().collect()
        for r in out:
            assert r["count"] <= 4 * 12

    def test_single_exchange_plan(self, spark, rng):
        plan = downsample_m4(_mk_points(spark, rng), 8) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "python" not in plan.lower()


def brute_paa_sax(vals, w, alphabet):
    n = len(vals)
    m = n // w
    segs = [float(sum(vals[k * m:(k + 1) * m])) for k in range(w)]
    S, SS = sum(segs), sum(s * s for s in segs)
    var = w * SS - S * S
    zs = [((s - S / w) / np.sqrt(var / (w * w))) if var > 0 else 0.0
          for s in segs]
    bps = BREAKPOINTS[alphabet]
    syms = []
    for z in zs:
        i = 0
        while i < len(bps) and z >= bps[i]:
            i += 1
        syms.append("abcdefgh"[i])
    return segs, zs, syms


class TestPaaSax:
    @pytest.mark.parametrize("alphabet", [2, 4, 8])
    def test_matches_bruteforce(self, spark, rng, alphabet):
        rows = []
        for s in range(8):
            n = int(rng.integers(16, 120))
            vals = rng.integers(0, 30, n).astype(float).tolist()
            rows.append((f"s{s}", vals))
        df = spark.createDataFrame(
            rows, "series_id string, values array<double>")
        got = paa_sax(df, w=8, alphabet=alphabet).collect()
        by_series = {}
        for r in got:
            by_series.setdefault(r["series_id"], []).append(r)
        for sid, vals in rows:
            segs, zs, syms = brute_paa_sax(vals, 8, alphabet)
            rs = sorted(by_series[sid], key=lambda r: r["k"])
            assert [r["seg_sum"] for r in rs] == segs, sid
            np.testing.assert_allclose([r["z"] for r in rs],
                                       np.round(zs, 6), atol=1e-6)
            assert [r["sym"] for r in rs] == syms, sid
            assert all(r["word"] == "".join(syms) for r in rs)

    def test_constant_series_degenerates(self, spark):
        df = spark.createDataFrame([("c", [3.0] * 32)],
                                   "series_id string, values array<double>")
        rows = paa_sax(df, w=8, alphabet=4).collect()
        assert all(r["z"] == 0.0 for r in rows)
        # z = 0 with strict < cuts falls in the symbol holding zero
        assert rows[0]["word"] == "c" * 8

    def test_short_series_dropped(self, spark):
        df = spark.createDataFrame([("x", [1.0, 2.0])],
                                   "series_id string, values array<double>")
        assert paa_sax(df, w=8).count() == 0

    def test_no_shuffle_no_python(self, spark):
        df = spark.createDataFrame([("a", list(map(float, range(32))))],
                                   "series_id string, values array<double>")
        plan = paa_sax(df, w=8)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "python" not in plan.lower()


def brute_mindist(wa, wb, n, w, alphabet):
    bps = BREAKPOINTS[alphabet]

    def cell(r, c):
        if abs(r - c) <= 1:
            return 0.0
        return bps[max(r, c) - 1] - bps[min(r, c)]

    s = sum(cell(ord(x) - 97, ord(y) - 97) ** 2 for x, y in zip(wa, wb))
    return np.sqrt(n / w) * np.sqrt(s)


class TestSaxMindist:
    @pytest.mark.parametrize("alphabet", [2, 4, 8])
    def test_matches_bruteforce(self, spark, rng, alphabet):
        from dtaidistance_spark.functions.sax import sax_mindist_pairs
        n, w = 64, 8
        rows = []
        for s in range(7):
            vals = rng.integers(0, 30, n).astype(float).tolist()
            _, _, syms = brute_paa_sax(vals, w, alphabet)
            rows.append((f"s{s}", "".join(syms)))
        df = spark.createDataFrame(rows, "series_id string, word string")
        got = {(r["i"], r["j"]): r["mindist"]
               for r in sax_mindist_pairs(df, n=n, w=w,
                                          alphabet=alphabet).collect()}
        words = dict(rows)
        ids = sorted(words)
        expected_pairs = {(a, b) for ai, a in enumerate(ids)
                          for b in ids[ai + 1:]}
        assert set(got) == expected_pairs
        for (a, b), d in got.items():
            want = brute_mindist(words[a], words[b], n, w, alphabet)
            np.testing.assert_allclose(d, want, atol=1e-12, err_msg=f"{a},{b}")

    def test_lower_bounds_euclidean(self, spark, rng):
        """MINDIST(Q̂,Ĉ) <= ED(znorm(Q), znorm(C)) — the Lin et al.
        guarantee that makes it a sound prefilter."""
        from dtaidistance_spark.functions.sax import sax_mindist_pairs
        n, w, alphabet = 128, 16, 4
        series, rows = {}, []
        for s in range(6):
            vals = rng.normal(0, 1, n)
            vals = np.round(vals * 10)  # integer-valued, like the counts
            series[f"s{s}"] = vals
            _, _, syms = brute_paa_sax(vals.tolist(), w, alphabet)
            rows.append((f"s{s}", "".join(syms)))
        df = spark.createDataFrame(rows, "series_id string, word string")
        got = sax_mindist_pairs(df, n=n, w=w, alphabet=alphabet).collect()

        def znorm(x):
            sd = x.std()
            return (x - x.mean()) / sd if sd > 0 else x * 0.0

        for r in got:
            ed = float(np.linalg.norm(znorm(series[r["i"]])
                                      - znorm(series[r["j"]])))
            assert r["mindist"] <= ed + 1e-9, (r["i"], r["j"])

    def test_identical_words_zero(self, spark):
        from dtaidistance_spark.functions.sax import sax_mindist_pairs
        df = spark.createDataFrame([("a", "abcd"), ("b", "abcd")],
                                   "series_id string, word string")
        rows = sax_mindist_pairs(df, n=32, w=4).collect()
        assert len(rows) == 1 and rows[0]["mindist"] == 0.0
