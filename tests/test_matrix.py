"""Distributed distance_matrix ↔ reference parity (block semantics,
condensed ordering, golden fixtures from reference tests/test_dtw.py)."""

import math

import numpy as np
import pytest

from dtaidistance_spark.kernels.dtw import DtwSettings
from dtaidistance_spark.operators.matrix import (
    condensed_index, distance_matrix, distance_matrix_cross, to_condensed,
    to_matrix, with_index,
)

S6 = [
    [0.0, 0, 1, 2, 1, 0, 1, 0, 0],
    [0.0, 1, 2, 0, 0, 0, 0, 0, 0],
    [1.0, 2, 0, 0, 0, 0, 0, 1, 1],
    [0.0, 0, 1, 2, 1, 0, 1, 0, 0],
    [0.0, 1, 2, 0, 0, 0, 0, 0, 0],
    [1.0, 2, 0, 0, 0, 0, 0, 1, 1],
]


def _series_df(spark, series):
    rows = [(i, [float(x) for x in s]) for i, s in enumerate(series)]
    return spark.createDataFrame(rows, "i long, values array<double>")


class TestCondensedIndex:
    def test_golden_indices(self):
        # reference tests/test_dtw.py:36-50
        assert condensed_index(np.array([3]), np.array([2]), 6)[0] == 9
        assert condensed_index(np.array([0]), np.array([1]), 6)[0] == 0
        assert condensed_index(np.array([4]), np.array([5]), 6)[0] == 14

    def test_matches_reference(self, ref_dtw):
        n = 7
        for a in range(n):
            for b in range(n):
                if a == b:
                    continue
                got = int(condensed_index(np.array([a]), np.array([b]), n)[0])
                assert got == ref_dtw.distance_array_index(a, b, n)


class TestDistanceMatrix:
    def test_full_matrix_golden(self, spark, ref_dtw):
        df = _series_df(spark, S6)
        dist = distance_matrix(df, chunk_size=2)
        m = to_matrix(dist, 6)
        expected = ref_dtw.distance_matrix(S6)
        for i in range(6):
            for j in range(6):
                if math.isinf(expected[i][j]):
                    assert math.isinf(m[i][j]) or i == j
                else:
                    assert m[i][j] == pytest.approx(expected[i][j], rel=1e-15)

    def test_condensed_ordering(self, spark, ref_dtw):
        df = _series_df(spark, S6)
        cond = to_condensed(distance_matrix(df, chunk_size=4), 6)
        expected = ref_dtw.distance_matrix(S6, compact=True)
        np.testing.assert_allclose(cond, np.asarray(expected), rtol=1e-15)

    def test_block_golden(self, spark, ref_dtw):
        # reference tests/test_dtw.py:171-191
        block = ((1, 4), (3, 5))
        df = _series_df(spark, S6)
        dist = distance_matrix(df, block=block, chunk_size=2)
        m = to_matrix(dist, 6, only_triu=True)
        expected = ref_dtw.distance_matrix(S6, block=block, only_triu=True)
        np.testing.assert_allclose(m, np.asarray(expected), rtol=1e-14)

    def test_block_not_triu(self, spark, ref_dtw):
        block = ((1, 4), (0, 5), False)
        df = _series_df(spark, S6)
        pdf = distance_matrix(df, block=block, chunk_size=3).toPandas()
        # full rectangle: rows 1..3 × cols 0..4, including i >= j
        assert len(pdf) == 3 * 5
        for row in pdf.itertuples(index=False):
            expected = ref_dtw.distance(S6[row.i], S6[row.j])
            assert row.d == pytest.approx(expected, rel=1e-14)

    def test_random_ragged_vs_reference(self, spark, ref_dtw, rng):
        series = [list(rng.normal(size=int(rng.choice([8, 12, 17])))) for _ in range(15)]
        df = _series_df(spark, series)
        cond = to_condensed(distance_matrix(df, chunk_size=4), 15)
        expected = np.asarray(ref_dtw.distance_matrix(series, compact=True))
        np.testing.assert_allclose(cond, expected, rtol=1e-14)

    def test_settings_window_psi(self, spark, ref_dtw, rng):
        series = [list(rng.normal(size=12)) for _ in range(8)]
        df = _series_df(spark, series)
        st = DtwSettings(window=3, psi=1)
        cond = to_condensed(distance_matrix(df, settings=st, chunk_size=3), 8)
        expected = np.asarray(ref_dtw.distance_matrix(series, compact=True,
                                                      window=3, psi=1))
        np.testing.assert_allclose(cond, expected, rtol=1e-14)

    def test_max_dist_lb_prefilter(self, spark, ref_dtw, rng):
        series = [list(rng.normal(size=16)) for _ in range(10)]
        df = _series_df(spark, series)
        st = DtwSettings(max_dist=2.0, window=4)
        cond = to_condensed(distance_matrix(df, settings=st, chunk_size=5), 10)
        expected = np.asarray(ref_dtw.distance_matrix(series, compact=True,
                                                      max_dist=2.0, window=4))
        finite = np.isfinite(expected)
        # pruned pairs are inf on both sides; finite pairs match exactly
        np.testing.assert_array_equal(np.isfinite(cond), finite)
        np.testing.assert_allclose(cond[finite], expected[finite], rtol=1e-14)


class TestBlockedPath:
    """Force the blocked-shuffle physical strategy (small inputs
    auto-route to the broadcast strategy) and verify identical results."""

    def test_blocked_equals_broadcast(self, spark, ref_dtw, rng):
        series = [list(rng.normal(size=12)) for _ in range(15)]
        df = _series_df(spark, series)
        spark.conf.set("spark.dtaidistance.broadcastMatrixMaxBytes", "0")
        try:
            cond = to_condensed(distance_matrix(df, chunk_size=4), 15)
        finally:
            spark.conf.unset("spark.dtaidistance.broadcastMatrixMaxBytes")
        expected = np.asarray(ref_dtw.distance_matrix(series, compact=True))
        np.testing.assert_allclose(cond, expected, rtol=1e-14)

    def test_blocked_block_semantics(self, spark, ref_dtw):
        block = ((1, 4), (3, 5))
        df = _series_df(spark, S6)
        spark.conf.set("spark.dtaidistance.broadcastMatrixMaxBytes", "0")
        try:
            m = to_matrix(distance_matrix(df, block=block, chunk_size=2), 6,
                          only_triu=True)
        finally:
            spark.conf.unset("spark.dtaidistance.broadcastMatrixMaxBytes")
        expected = ref_dtw.distance_matrix(S6, block=block, only_triu=True)
        np.testing.assert_allclose(m, np.asarray(expected), rtol=1e-14)


class TestCostAwareScheduling:
    """Cost-weighted guided ranges + length-balanced chunks for ragged
    corpora (VERDICT r4 item 4): the schedule equalizes estimated
    kernel cost len_i·len_j, outputs stay bit-identical."""

    def test_cost_ranges_partition_and_guided_profile(self):
        from dtaidistance_spark.operators.matrix import (
            _guided_ranges_cost, _triu_cost_fn)

        rng = np.random.default_rng(3)
        lens = (5 + rng.pareto(1.5, 200) * 40).astype(np.int64)  # power law
        n = len(lens)
        n_pairs = n * (n - 1) // 2
        cost_upto, total = _triu_cost_fn(lens)
        par = 32
        ranges = _guided_ranges_cost(cost_upto, n_pairs, total, par)
        # exact partition of the linear pair space
        assert ranges[0][0] == 0 and ranges[-1][1] == n_pairs
        assert all(a[1] == b[0] for a, b in zip(ranges, ranges[1:]))
        assert all(lo < hi for lo, hi in ranges)
        # guided profile in COST: each range holds at most the guided
        # quantum of the cost remaining at its start, up to one pair of
        # binary-search overshoot
        sl = np.sort(lens)
        slack = float(sl[-1] * sl[-2])  # max possible single-pair cost
        floor_c = max(total / n_pairs, total / (par * 24))
        for lo, hi in ranges:
            c_lo, c_hi = cost_upto(lo), cost_upto(hi)
            quantum = max(floor_c, (total - c_lo) / (2 * par))
            assert c_hi - c_lo <= quantum + slack, (lo, hi)

    def test_equal_lengths_reduce_to_count_schedule(self):
        from dtaidistance_spark.operators.matrix import (
            _guided_ranges, _guided_ranges_cost, _triu_cost_fn)

        lens = np.full(150, 37, dtype=np.int64)
        n_pairs = 150 * 149 // 2
        cost_upto, total = _triu_cost_fn(lens)
        got = _guided_ranges_cost(cost_upto, n_pairs, total, 16)
        want = _guided_ranges(n_pairs, 16)
        # same decay profile (the cost search is ceil-of-quantum where
        # the count schedule floors, so boundaries drift by ≤1 pair per
        # range and the tail may pack into ±2 ranges)
        assert abs(len(got) - len(want)) <= 2
        for k, ((gl, gh), (wl, wh)) in enumerate(zip(got, want)):
            assert abs((gh - gl) - (wh - wl)) <= k + 1, k

    def test_cost_vs_count_schedules_bit_identical(self, spark, rng,
                                                   monkeypatch):
        series = [list(rng.normal(size=int(n)))
                  for n in rng.integers(6, 60, 20)]
        df = _series_df(spark, series)
        monkeypatch.setenv("DTW_COST_GUIDED", "1")
        a = distance_matrix(df).toPandas().sort_values(["i", "j"]) \
            .reset_index(drop=True)
        monkeypatch.setenv("DTW_COST_GUIDED", "0")
        b = distance_matrix(df).toPandas().sort_values(["i", "j"]) \
            .reset_index(drop=True)
        assert a.equals(b)  # bit-identical, schedule only moves work

    def test_ragged_shuffle_path_matches_reference(self, spark, ref_dtw,
                                                   rng):
        # force the chunked-shuffle strategy on a ragged corpus: chunk
        # ids come from the length-balanced histogram path
        series = [list(rng.normal(size=int(n)))
                  for n in rng.integers(6, 80, 18)]
        df = _series_df(spark, series)
        spark.conf.set("spark.dtaidistance.broadcastMatrixMaxBytes", "0")
        try:
            cond = to_condensed(distance_matrix(df, chunk_size=4), 18)
        finally:
            spark.conf.unset("spark.dtaidistance.broadcastMatrixMaxBytes")
        expected = np.asarray(ref_dtw.distance_matrix(series, compact=True))
        np.testing.assert_allclose(cond, expected, rtol=1e-14)

    def test_ragged_block_rectangular_cost_ranges(self, spark, ref_dtw,
                                                  rng):
        # broadcast strategy + block restriction + ragged lengths: the
        # rectangular cost function drives the ranges
        series = [list(rng.normal(size=int(n)))
                  for n in rng.integers(6, 60, 12)]
        block = ((0, 7), (4, 12))
        df = _series_df(spark, series)
        m = to_matrix(distance_matrix(df, block=block), 12, only_triu=True)
        expected = ref_dtw.distance_matrix(series, block=block,
                                           only_triu=True)
        np.testing.assert_allclose(m, np.asarray(expected), rtol=1e-14)


class TestCross:
    def test_cross_matrix(self, spark, ref_dtw, rng):
        corpus = [list(rng.normal(size=10)) for _ in range(12)]
        queries = [list(rng.normal(size=10)) for _ in range(3)]
        cdf = _series_df(spark, corpus)
        qdf = _series_df(spark, queries).withColumnRenamed("i", "qi") \
            .withColumnRenamed("values", "qvalues")
        qdf = qdf.selectExpr("qi as i", "qvalues as values")
        out = distance_matrix_cross(qdf, cdf).toPandas()
        assert len(out) == 36
        for row in out.itertuples(index=False):
            expected = ref_dtw.distance(queries[row.qi], corpus[row.i])
            assert row.d == pytest.approx(expected, rel=1e-14)


class TestWithIndex:
    def test_dense_indices(self, spark):
        df = spark.createDataFrame(
            [("c", [1.0]), ("a", [2.0]), ("b", [3.0])],
            "series_id string, values array<double>")
        out = with_index(df).orderBy("i").toPandas()
        assert list(out["i"]) == [0, 1, 2]
        assert list(out["series_id"]) == ["a", "b", "c"]

    def test_many_partitions_no_global_exchange(self, spark):
        """Dense global indices must survive a 32-partition input, and the
        plan must contain no single-partition exchange (round-1 regression:
        global row_number)."""
        n = 500
        rows = [(f"s{k:05d}", [float(k)]) for k in range(n)]
        df = spark.createDataFrame(
            rows, "series_id string, values array<double>").repartition(32)
        idx = with_index(df)
        plan = idx._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        out = idx.orderBy("i").toPandas()
        assert list(out["i"]) == list(range(n))
        assert list(out["series_id"]) == sorted(r[0] for r in rows)

    def test_matrix_golden_with_32_partition_input(self, spark, ref_dtw):
        series = [np.asarray(s, dtype=np.float64) for s in S6]
        df = spark.createDataFrame(
            [(f"id{i}", [float(x) for x in s]) for i, s in enumerate(series)],
            "series_id string, values array<double>").repartition(32)
        idx = with_index(df, order_col="series_id")
        got = to_matrix(distance_matrix(idx), len(series), only_triu=True)
        exp = ref_dtw.distance_matrix(series)
        iu = np.triu_indices(len(series), k=1)
        assert np.allclose(got[iu], exp[iu], rtol=1e-14)


class TestTriuUnrank:
    def test_inverse_of_condensed(self):
        from dtaidistance_spark.operators.matrix import _triu_unrank
        for n in (2, 3, 7, 64, 501):
            p = np.arange(n * (n - 1) // 2, dtype=np.int64)
            i, j = _triu_unrank(p, n)
            ei, ej = np.triu_indices(n, k=1)
            assert np.array_equal(i, ei) and np.array_equal(j, ej)
            assert np.array_equal(condensed_index(i, j, n), p)
