"""Matrix profile: brute-force parity, conventions, distributed==kernel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dtaidistance_spark.kernels.matrixprofile import matrix_profile_1d
from dtaidistance_spark.operators.matrixprofile import matrix_profile


def brute_mp(x, m, excl):
    """Literal z-normalize-then-ED transcription (independent of the
    kernel's sufficient-statistics formula)."""
    x = np.asarray(x, dtype=float)
    k = x.size - m + 1
    zs = []
    for i in range(k):
        w = x[i:i + m]
        sd = w.std()
        zs.append((w - w.mean()) / sd if sd > 0 else None)
    dist = np.full(k, np.inf)
    idx = np.full(k, -1)
    for i in range(k):
        for j in range(k):
            if abs(i - j) <= excl:
                continue
            if zs[i] is None and zs[j] is None:
                d = 0.0
            elif zs[i] is None or zs[j] is None:
                d = np.sqrt(m)
            else:
                d = float(np.linalg.norm(zs[i] - zs[j]))
            if d < dist[i]:
                dist[i], idx[i] = d, j
    return dist, idx


class TestKernel:
    @pytest.mark.parametrize("m", [4, 8, 24])
    def test_matches_bruteforce(self, rng, m):
        # cross-FORMULA tolerance: near r=1 the sufficient-statistics
        # tree and the znorm-then-ED path differ by ~sqrt(48*ulp) ≈
        # 3e-7 (the engine-vs-engine gate is bitwise — TestOperator and
        # the driver oracle — this pins the math itself)
        x = rng.integers(0, 20, 200).astype(float)
        d, j = matrix_profile_1d(x, m)
        bd, bj = brute_mp(x, m, m // 4)
        np.testing.assert_allclose(d, bd, atol=5e-7)
        # the kernel's chosen neighbour must be (near-)optimal under
        # the brute formula too; exact index equality only where the
        # minimum is isolated
        zb = []
        for i in range(len(x) - m + 1):
            w = x[i:i + m]
            sd = w.std()
            zb.append((w - w.mean()) / sd if sd > 0 else None)
        for i in range(d.size):
            if zb[i] is None or zb[j[i]] is None:
                continue
            bd_at = float(np.linalg.norm(zb[i] - zb[j[i]]))
            assert bd_at <= bd[i] + 5e-7, i

    def test_constant_window_conventions(self):
        # zeros -> constant windows; a lone spike makes one non-constant
        x = np.zeros(32)
        d, j = matrix_profile_1d(x, 8)
        assert (d == 0.0).all()          # both constant -> 0
        x[15] = 5.0
        d, j = matrix_profile_1d(x, 8)
        const_vs_spiky = d[0]            # window 0 is constant
        assert const_vs_spiky in (0.0, np.sqrt(8.0))

    def test_motif_found(self, rng):
        """An implanted repeated motif gives (near-)zero profile there."""
        x = rng.integers(0, 30, 300).astype(float)
        motif = rng.integers(0, 30, 16).astype(float)
        x[40:56] = motif
        x[200:216] = motif
        # tolerance 1e-6, not 1e-9: the z-norm distance is a sqrt of a
        # catastrophically-cancelling dot-product expression, so an
        # identical pair can read ~1e-8 depending on the surrounding
        # data (observed with a shifted session-rng stream); non-motif
        # profile values are O(1), so 1e-6 still separates cleanly
        d, j = matrix_profile_1d(x, 16)
        assert d[40] < 1e-6 and j[40] == 200
        assert d[200] < 1e-6 and j[200] == 40

    def test_too_short_series(self):
        d, j = matrix_profile_1d(np.arange(5, dtype=float), 8)
        assert d.size == 0 and j.size == 0

    def test_chunking_invariant(self, rng):
        x = rng.integers(0, 15, 150).astype(float)
        d1, j1 = matrix_profile_1d(x, 12, chunk=7)
        d2, j2 = matrix_profile_1d(x, 12, chunk=10_000)
        assert (d1 == d2).all() and (j1 == j2).all()


class TestOperator:
    def test_distributed_equals_kernel(self, spark, rng):
        rows = []
        for s in range(6):
            vals = rng.integers(0, 25, int(rng.integers(30, 120))
                                ).astype(float).tolist()
            rows.append((f"s{s}", vals))
        df = spark.createDataFrame(rows,
                                   "series_id string, values array<double>")
        got = matrix_profile(df, m=24).collect()
        by = {}
        for r in got:
            by.setdefault(r["series_id"], {})[r["i"]] = \
                (r["mp_dist"], r["mp_idx"])
        for sid, vals in rows:
            d, j = matrix_profile_1d(np.asarray(vals), 24)
            want = {i + 1: (d[i], j[i] + 1)
                    for i in range(d.size) if j[i] >= 0}
            have = by.get(sid, {})
            assert set(have) == set(want), sid
            for i, (dd, jj) in want.items():
                assert have[i][1] == jj, (sid, i)
                np.testing.assert_allclose(have[i][0], dd, atol=0)

    def test_no_admissible_neighbour_dropped(self, spark):
        # n = 24, m = 24 -> one window, no possible j
        df = spark.createDataFrame([("a", list(map(float, range(24))))],
                                   "series_id string, values array<double>")
        assert matrix_profile(df, m=24).count() == 0


class TestMotifDiscord:
    @staticmethod
    def _planted(n=300, m=16, seed=5):
        """Periodic background + a near-identical planted pair (the
        motif) + a shape anomaly (the discord).  NB the profile is
        z-normalized, so the discord must differ in SHAPE — a mean
        shift would be invisible."""
        import numpy as np
        rng = np.random.default_rng(seed)
        t = np.arange(n)
        v = np.sin(2 * np.pi * t / 16.0) * 2.0 + rng.normal(0, 0.3, n)
        pat = np.sin(np.linspace(0, 4 * np.pi, m)) * np.linspace(3, 1, m)
        v[40:40 + m] = pat + rng.normal(0, 0.02, m)   # motif pair
        v[200:200 + m] = pat + rng.normal(0, 0.02, m)
        v[120:120 + m] = rng.normal(0, 1.0, m)        # shape discord
        return v, m

    def test_kernel_finds_planted_motif_and_discord(self):
        import numpy as np

        from dtaidistance_spark.kernels.matrixprofile import (
            matrix_profile_1d, topk_discords, topk_motifs)

        v, m = self._planted()
        d, j = matrix_profile_1d(v, m)
        excl = m // 2
        motifs = topk_motifs(d, j, 2, excl)
        r, i, jj, dist = motifs[0]
        assert {min(i, jj) // 10, max(i, jj) // 10} == {4, 20}
        discords = topk_discords(d, j, 2, excl)
        assert abs(discords[0][1] - 120) <= m     # the planted anomaly
        # suppression: rank-1 picks are outside every rank-0 zone
        if len(motifs) > 1:
            for c in (motifs[1][1], motifs[1][2]):
                assert abs(c - i) > excl and abs(c - jj) > excl
        if len(discords) > 1:
            assert abs(discords[1][1] - discords[0][1]) > excl

    def test_operator_matches_kernel(self, spark):
        import numpy as np
        import pandas as pd

        from dtaidistance_spark.kernels.matrixprofile import (
            matrix_profile_1d, topk_discords, topk_motifs)
        from dtaidistance_spark.operators.matrixprofile import (
            discord_topk, matrix_profile, motif_topk)

        v, m = self._planted()
        df = spark.createDataFrame(
            pd.DataFrame({"series_id": ["a"],
                          "values": [[float(x) for x in v]]}))
        prof = matrix_profile(df, m=m)
        got_m = (motif_topk(prof, k=2, m=m)
                 .orderBy("rank").toPandas())
        got_d = (discord_topk(prof, k=2, m=m)
                 .orderBy("rank").toPandas())
        d, j = matrix_profile_1d(v, m)
        # the m-derived default exclusion zone mirrors the profile's m//4
        want_m = topk_motifs(d, j, 2, m // 4)
        want_d = topk_discords(d, j, 2, m // 4)
        assert len(got_m) == len(want_m)
        for (r, i, jj, dist), (_, row) in zip(want_m, got_m.iterrows()):
            assert (row["rank"], row["i"], row["j"]) == (r, i + 1, jj + 1)
            assert row["dist"] == dist
        assert len(got_d) == len(want_d)
        for (r, i, dist), (_, row) in zip(want_d, got_d.iterrows()):
            assert (row["rank"], row["i"]) == (r, i + 1)
            assert row["dist"] == dist

    def test_validation(self, spark):
        import pytest as _pt

        from dtaidistance_spark.operators.matrixprofile import motif_topk
        with _pt.raises(ValueError, match="excl or m"):
            motif_topk(None, k=1)
