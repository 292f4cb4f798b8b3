"""Gorilla XOR + delta-of-delta codec: exact round-trip tests
(FIXTURES.md §8: decode(encode(values)) must equal values to the float64
bit pattern)."""

import numpy as np
import pytest

from dtaidistance_spark.kernels.codec import decode_chunk, encode_chunk


def _roundtrip(ts, vals):
    payload = encode_chunk(np.asarray(ts, dtype=np.int64),
                           np.asarray(vals, dtype=np.float64))
    ts2, vals2 = decode_chunk(payload)
    np.testing.assert_array_equal(ts2, np.asarray(ts, dtype=np.int64))
    a = np.asarray(vals, dtype=np.float64).view(np.uint64)
    b = vals2.view(np.uint64)
    np.testing.assert_array_equal(a, b)  # bit-pattern equality (handles NaN)
    return payload


def test_empty():
    payload = encode_chunk(np.array([], dtype=np.int64), np.array([]))
    ts, vals = decode_chunk(payload)
    assert len(ts) == 0 and len(vals) == 0


def test_single():
    _roundtrip([1704067200], [3.14159])


def test_regular_intervals_compress_well():
    n = 1000
    ts = 1704067200 + 60 * np.arange(n)
    vals = np.full(n, 42.5)
    payload = _roundtrip(ts, vals)
    # constant values + constant deltas → ~1 bit per point after headers
    assert len(payload) < 64 + n // 4


def test_irregular_and_negative_dod():
    rng = np.random.default_rng(7)
    n = 500
    deltas = rng.integers(1, 3600, size=n - 1)
    ts = 1704067200 + np.concatenate([[0], np.cumsum(deltas)])
    vals = rng.normal(size=n) * 1e6
    _roundtrip(ts, vals)


def test_special_floats():
    ts = np.arange(8, dtype=np.int64)
    vals = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1.7e308, 1.0])
    _roundtrip(ts, vals)


def test_counter_like_values():
    # monotone counters: classic Gorilla sweet spot
    n = 2000
    ts = np.arange(n, dtype=np.int64) * 60
    vals = np.cumsum(np.ones(n))
    payload = _roundtrip(ts, vals)
    assert len(payload) < n * 8  # beats raw float64


def test_gapfilled_rollup_series():
    rng = np.random.default_rng(11)
    n = 1440  # a day of 1m buckets
    ts = 1704067200 + 60 * np.arange(n)
    vals = np.where(rng.random(n) < 0.3, 0.0, rng.poisson(5, n).astype(float))
    payload = _roundtrip(ts, vals)
    assert len(payload) < n * 8
