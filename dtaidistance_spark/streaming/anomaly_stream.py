"""Streaming stats-family operators (applyInPandasWithState): the
trailing-window z-score anomaly detector, the Holt level+trend
smoother, the trailing-window normalized EWMA (each the bit-equal
streaming twin of its batch operator in ``functions/stats.py``), and
Page's sequential two-sided CUSUM test (the genuinely streaming
member of the Page/Taylor family; the batch ``cusum_changepoint`` is
its retrospective locator sibling).

Anomaly detection — the streaming twin of ``anomaly_zscore``: score
every arriving observation against the sample mean/stddev of the
PREVIOUS ``window`` observations of its series (the self-exclusive
rolling z-score), emitting the flagged rows (|z| > threshold, at least
``min_obs`` priors, nonzero variance) as they happen.  Per-series
state is ONE ring of ≤ ``window`` integer values — independent of
stream length — so the operator runs forever at constant memory per
key, state-store-partitioned by series_id.

Bit-exactness contract (tests assert ``==`` against the batch
operator): the batch plan computes the bounded-frame sums in double
over integer-valued observations, so every sufficient statistic is an
exact integer in both implementations; the streaming step then applies
the IDENTICAL IEEE op tree —

    d2  = n·Σy² − (Σy)²        (on float64 copies of exact ints)
    z   = (y − Σy/n) / sqrt(d2 / (n·(n−1)))

— and correctly-rounded IEEE ops over identical operands are
deterministic across the JVM and CPython, so the flagged set AND the z
values match the batch output bit-for-bit (exact while Σy² < 2⁵³ per
window, the same budget the batch frame carries).

Ordering contract: within one micro-batch rows are sorted by event
time before stepping; ACROSS micro-batches the state advances in
arrival order (the same in-order-source assumption as
``match_stream``/``sessionize_stream`` — feed a per-series-ordered
source, e.g. the 1m rollup stream, not raw shuffled events).

The reference library has no streaming surface (SURVEY.md §1.1) —
engine-native addition, the streaming member of the stats family.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Sequence, Tuple

import pandas as pd

__all__ = ["zscore_step", "stream_anomaly_zscore",
           "holt_step", "stream_holt_linear",
           "ewma_step", "stream_ewma",
           "cusum_step", "stream_cusum",
           "kalman_step", "stream_kalman_level",
           "slo_burn_step", "stream_slo_burn",
           "holt_winters_step", "stream_holt_winters",
           "croston_step", "stream_croston"]

OUT_SCHEMA = ("series_id string, ts timestamp, y long, n_prev long, "
              "z double")
STATE_SCHEMA = "ys array<long>"


def zscore_step(state: List[int], ys: Sequence[int], window: int,
                threshold: float, min_obs: int):
    """Advance one series' trailing window through ``ys`` (event
    order), mutating ``state`` in place and returning the flagged
    ``(index_in_ys, y, n_prev, z)`` rows.  Pure-Python kernel so the
    recurrence is unit-testable without a stream; the float tree
    mirrors functions/stats.anomaly_zscore exactly (see module
    docstring)."""
    out = []
    # O(1) running sums: python ints are arbitrary precision, so
    # add-on-append / subtract-on-evict stays EXACT — identical values
    # to a from-scratch rescan, without the O(window) per-step cost
    sy = sum(state)
    syy = sum(v * v for v in state)
    for i, y in enumerate(ys):
        y = int(y)
        n = len(state)
        if n >= min_obs:
            nf = float(n)
            syf = float(sy)
            d2 = nf * float(syy) - syf * syf     # the batch op tree
            if d2 > 0:
                z = ((float(y) - syf / nf)
                     / math.sqrt(d2 / (nf * (nf - 1.0))))
                if abs(z) > threshold:
                    out.append((i, y, n, z))
        state.append(y)
        sy += y
        syy += y * y
        if len(state) > window:
            old_v = state.pop(0)
            sy -= old_v
            syy -= old_v * old_v
    return out


def _anomaly_fn(window: int, threshold: float, min_obs: int):
    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "ts", "y", "n_prev", "z"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        ring = list(state.get[0]) if state.exists else []
        data = pd.concat(list(pdfs)).sort_values("ts")
        ys = data["y"].to_numpy()
        ts = list(data["ts"])
        flagged = zscore_step(ring, ys, window, threshold, min_obs)
        state.update((ring,))
        yield pd.DataFrame(
            [(sid, ts[i], y, n, z) for (i, y, n, z) in flagged],
            columns=cols)

    return fn


def stream_anomaly_zscore(stream, window: int = 24,
                          threshold: float = 3.0, min_obs: int = 8):
    """(series_id, ts, y) stream → flagged anomalies
    (series_id, ts, y, n_prev, z), the streaming twin of
    functions/stats.anomaly_zscore (same defaults, same flag rule,
    bit-equal z values on integer inputs)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if window < 2:
        raise ValueError("window must be >= 2")
    if min_obs < 2:
        raise ValueError("min_obs must be >= 2 (sample variance)")
    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _anomaly_fn(int(window), float(threshold), int(min_obs)),
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming Holt double exponential smoothing (level + trend + forecast)
# ---------------------------------------------------------------------------

HOLT_OUT_SCHEMA = ("series_id string, ts timestamp, y long, n long, "
                   "level double, trend double, fc_1 double")
HOLT_STATE_SCHEMA = "n long, y1 long, l double, b double"


def holt_step(state, ys):
    """Advance one series' Holt α=β=1/2 recurrence through ``ys``
    (event order).  ``state`` is ``[n, y1, l, b]`` (mutated in place;
    ``y1`` only matters while n == 1); returns one ``(i, y, n, l, b)``
    row per observation with the post-update state (levels are NaN
    until the second observation initializes l₁=y₁, b₁=y₂−y₁ — the
    same textbook init as functions/stats.holt_linear, whose exact
    IEEE op tree this mirrors, so a batch re-run over the same prefix
    is bit-equal at every step)."""
    out = []
    for i, y in enumerate(ys):
        y = int(y)
        n, y1, l, b = state
        if n == 0:
            state[:] = [1, y, float("nan"), float("nan")]
        elif n == 1:
            l = float(y1)
            b = float(y) - float(y1)
            l_new = (float(y) + l + b) / 2.0
            b_new = ((l_new - l) + b) / 2.0
            state[:] = [2, y1, l_new, b_new]
        else:
            l_new = (float(y) + l + b) / 2.0
            b_new = ((l_new - l) + b) / 2.0
            state[:] = [n + 1, y1, l_new, b_new]
        out.append((i, y, state[0], state[2], state[3]))
    return out


def _holt_fn():
    def fn(key, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "ts", "y", "n", "level", "trend", "fc_1"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = list(state.get) if state.exists else [0, 0, float("nan"),
                                                   float("nan")]
        data = pd.concat(list(pdfs)).sort_values("ts")
        ts = list(data["ts"])
        rows = holt_step(st, data["y"].to_numpy())
        state.update((int(st[0]), int(st[1]), float(st[2]), float(st[3])))
        yield pd.DataFrame(
            [(sid, ts[i], y, n, l, b, l + 1.0 * b)
             for (i, y, n, l, b) in rows], columns=cols)

    return fn


def stream_holt_linear(stream):
    """(series_id, ts, y) stream → per-observation Holt level/trend and
    one-step-ahead forecast, the streaming twin of
    functions/stats.holt_linear (α=β=1/2, textbook init; bit-equal
    states on integer inputs — same caveats on event order as
    stream_anomaly_zscore).  Per-series state is FOUR scalars,
    stream-length independent."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _holt_fn(),
                outputStructType=HOLT_OUT_SCHEMA,
                stateStructType=HOLT_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming trailing-window normalized EWMA
# ---------------------------------------------------------------------------

EWMA_OUT_SCHEMA = ("series_id string, ts timestamp, y long, n_obs long, "
                   "ewma double")
EWMA_STATE_SCHEMA = "ys array<long>"


def ewma_step(state: List[int], ys: Sequence[int], alpha: float,
              window: int):
    """Advance one series' trailing-window normalized EWMA (pandas
    ``ewm(adjust=True)`` over the last ``window`` observations) through
    ``ys`` in event order; ``state`` is the ring of the most recent
    ≤ ``window`` values (newest last, mutated in place).  Returns one
    ``(i, y, n_obs, ewma)`` row per observation.  With a power-of-two
    decay every term y·(1−α)^d is exact and the ≤53-bit weighted sums
    are order-free, so the values equal functions/stats.ewma (whose
    join computes the same terms in arbitrary order) bit-for-bit —
    the same exactness contract the batch operator documents."""
    decay = 1.0 - alpha
    out = []
    for i, y in enumerate(ys):
        state.append(int(y))
        if len(state) > window:
            del state[0]
        num = 0.0
        den = 0.0
        w = 1.0
        for v in reversed(state):            # d = 0 (newest) .. n-1
            num += float(v) * w
            den += w
            w *= decay
        out.append((i, int(y), len(state), num / den))
    return out


def _ewma_fn(alpha: float, window: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "ts", "y", "n_obs", "ewma"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        ring = list(state.get[0]) if state.exists else []
        data = pd.concat(list(pdfs)).sort_values("ts")
        ts = list(data["ts"])
        rows = ewma_step(ring, data["y"].to_numpy(), alpha, window)
        state.update((ring,))
        yield pd.DataFrame(
            [(sid, ts[i], y, n, e) for (i, y, n, e) in rows],
            columns=cols)

    return fn


def stream_ewma(stream, alpha: float = 0.5, window: int = 16):
    """(series_id, ts, y) stream → per-observation trailing-window
    normalized EWMA, the streaming twin of functions/stats.ewma (same
    defaults; bit-equal values for power-of-two decay on integer
    inputs — same event-order caveats as stream_anomaly_zscore).
    Per-series state is one ring of ≤ ``window`` integers."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    if window < 1:
        raise ValueError("window must be >= 1")
    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _ewma_fn(float(alpha), int(window)),
                outputStructType=EWMA_OUT_SCHEMA,
                stateStructType=EWMA_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming sequential CUSUM (Page 1954 one-sided pair test)
# ---------------------------------------------------------------------------

CUSUM_OUT_SCHEMA = ("series_id string, ts timestamp, y long, "
                    "direction string, stat double, n_since_reset long")
CUSUM_STATE_SCHEMA = "s_hi double, s_lo double, n long"


def cusum_step(state, ys, mu0: float, k: float, h: float):
    """Advance Page's two-sided sequential CUSUM through ``ys`` (event
    order): with target mean ``mu0``, slack ``k`` and decision
    interval ``h``,

        S⁺ₜ = max(0, S⁺ₜ₋₁ + (yₜ − mu0 − k))
        S⁻ₜ = max(0, S⁻ₜ₋₁ + (mu0 − yₜ − k))

    an alarm fires when either side crosses ``h``; BOTH sides reset to
    0 after an alarm (the classic restart), so repeated shifts re-fire.
    ``state`` is ``[s_hi, s_lo, n_since_reset]`` (mutated in place);
    returns the alarm rows ``(i, y, direction, stat, n_since_reset)``.
    This is the genuinely sequential test — the batch
    ``cusum_changepoint`` is the retrospective single-changepoint
    locator; the two answer different questions and are both part of
    the Page/Taylor family.  Deterministic: a fixed IEEE op tree per
    step, so any replay over the same prefix is bit-equal."""
    out = []
    for i, y in enumerate(ys):
        yf = float(int(y))
        s_hi = state[0] + (yf - mu0 - k)
        if s_hi < 0.0:
            s_hi = 0.0
        s_lo = state[1] + (mu0 - yf - k)
        if s_lo < 0.0:
            s_lo = 0.0
        n = state[2] + 1
        if s_hi > h or s_lo > h:
            direction = "up" if s_hi > h else "down"
            out.append((i, int(y), direction,
                        s_hi if direction == "up" else s_lo, n))
            s_hi, s_lo, n = 0.0, 0.0, 0
        state[:] = [s_hi, s_lo, n]
    return out


def _cusum_fn(mu0: float, k: float, h: float):
    def fn(key, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "ts", "y", "direction", "stat",
                "n_since_reset"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = list(state.get) if state.exists else [0.0, 0.0, 0]
        data = pd.concat(list(pdfs)).sort_values("ts")
        ts = list(data["ts"])
        alarms = cusum_step(st, data["y"].to_numpy(), mu0, k, h)
        state.update((float(st[0]), float(st[1]), int(st[2])))
        yield pd.DataFrame(
            [(sid, ts[i], y, d, s, n) for (i, y, d, s, n) in alarms],
            columns=cols)

    return fn


def stream_cusum(stream, mu0: float, k: float, h: float):
    """(series_id, ts, y) stream → CUSUM alarm rows (series_id, ts, y,
    direction up|down, crossing statistic, observations since the last
    reset).  Page's sequential two-sided test with target ``mu0``,
    slack ``k`` (typically δ/2 for the shift size δ you care about)
    and decision interval ``h`` (typically 4-5 σ).  Per-series state
    is THREE scalars — constant memory forever."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if k < 0 or h <= 0:
        raise ValueError("need k >= 0 and h > 0")
    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _cusum_fn(float(mu0), float(k), float(h)),
                outputStructType=CUSUM_OUT_SCHEMA,
                stateStructType=CUSUM_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming local-level Kalman filter
# ---------------------------------------------------------------------------

KALMAN_OUT_SCHEMA = ("series_id string, ts timestamp, y long, n long, "
                     "level double, var_p double, gain double")
KALMAN_STATE_SCHEMA = "n long, l double, p double"


def kalman_step(state, ys, q: float = 0.25, r: float = 1.0):
    """Advance one series' local-level Kalman recurrence through
    ``ys`` (event order).  ``state`` is ``[n, l, p]`` (mutated in
    place); init l₁ = y₁, p₁ = 1.0, then the predict/gain/update tree
    of functions/stats.kalman_level verbatim, so a batch re-run over
    the same prefix is bit-equal at every step.  Returns one
    ``(i, y, n, l, p, k)`` row per observation (``k`` the gain this
    observation received; NaN for the init observation)."""
    out = []
    for i, y in enumerate(ys):
        y = int(y)
        n, l, p = state
        if n == 0:
            state[:] = [1, float(y), 1.0]
            k = float("nan")
        else:
            pp = p + q
            k = pp / (pp + r)
            l_new = l + k * (float(y) - l)
            p_new = (1.0 - k) * pp
            state[:] = [n + 1, l_new, p_new]
        out.append((i, y, state[0], state[1], state[2], k))
    return out


def _kalman_fn(q: float, r: float):
    def fn(key, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "ts", "y", "n", "level", "var_p", "gain"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = list(state.get) if state.exists else [0, float("nan"),
                                                   float("nan")]
        data = pd.concat(list(pdfs)).sort_values("ts")
        ts = list(data["ts"])
        rows = kalman_step(st, data["y"].to_numpy(), q=q, r=r)
        state.update((int(st[0]), float(st[1]), float(st[2])))
        yield pd.DataFrame(
            [(sid, ts[i], y, n, l, p, k)
             for (i, y, n, l, p, k) in rows], columns=cols)

    return fn


def stream_kalman_level(stream, q: float = 0.25, r: float = 1.0):
    """(series_id, ts, y) stream → per-observation filtered level,
    state variance and applied gain — the streaming twin of
    functions/stats.kalman_level (bit-equal states on integer inputs;
    same event-order caveats as stream_anomaly_zscore).  Per-series
    state is THREE scalars, stream-length independent — the cheapest
    stateful operator in the family."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _kalman_fn(q, r),
                outputStructType=KALMAN_OUT_SCHEMA,
                stateStructType=KALMAN_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming multiwindow SLO burn-rate alerts
# ---------------------------------------------------------------------------

SLO_OUT_SCHEMA = ("series_id string, idx long, good long, bad long, "
                  "burn_long double, burn_short double, alert boolean")
SLO_STATE_SCHEMA = ("idxs array<long>, goods array<long>, "
                    "bads array<long>")


def slo_burn_step(state, rows, slo: float, long_window: int,
                  short_window: int, threshold: float):
    """Advance one service's multiwindow burn-rate scan through
    finalized (idx, good, bad) bucket rows (bucket order).  ``state``
    is three parallel arrays holding the trailing ≤ long_window
    RANGE-eligible buckets (pruned by INDEX distance, not position —
    the batch operator's gap-honest RANGE frame semantics,
    functions/timeagg.py::slo_burn_rate, whose exact ratio tree this
    mirrors so emitted rows are bit-equal to the batch scan at every
    prefix)."""
    budget = 1.0 - slo
    out = []
    for idx, good, bad in rows:
        idx, good, bad = int(idx), int(good), int(bad)
        state[0].append(idx)
        state[1].append(good)
        state[2].append(bad)
        keep = max(long_window, short_window)
        while state[0] and state[0][0] < idx - (keep - 1):
            state[0].pop(0)
            state[1].pop(0)
            state[2].pop(0)

        def burn(win):
            g = b = 0
            for i, gg, bb in zip(state[0], state[1], state[2]):
                if i >= idx - (win - 1):
                    g += gg
                    b += bb
            tot = float(g + b)
            return (float(b) / tot) / budget if tot > 0 else None

        bl, bs = burn(long_window), burn(short_window)
        alert = bool(bl is not None and bl > threshold
                     and bs is not None and bs > threshold)
        out.append((idx, good, bad, bl, bs, alert))
    return out


def _slo_fn(slo: float, long_window: int, short_window: int,
            threshold: float):
    def fn(key, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "idx", "good", "bad", "burn_long",
                "burn_short", "alert"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = ([list(x) for x in state.get] if state.exists
              else [[], [], []])
        data = pd.concat(list(pdfs)).sort_values("idx")
        rows = slo_burn_step(
            st, data[["idx", "good", "bad"]].itertuples(index=False),
            slo, long_window, short_window, threshold)
        state.update((list(st[0]), list(st[1]), list(st[2])))
        df = pd.DataFrame([(sid, *r) for r in rows], columns=cols)
        # zero-traffic buckets: keep None as SQL NULL (the batch
        # operator's F.when yields NULL there, not NaN)
        for c in ("burn_long", "burn_short"):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
        yield df

    return fn


def stream_slo_burn(stream, slo: float = 0.95, long_window: int = 6,
                    short_window: int = 1, threshold: float = 2.0):
    """(series_id, idx, good, bad) finalized-bucket stream →
    per-bucket multiwindow burn rates + alert flags, the streaming
    twin of functions/timeagg.slo_burn_rate (bit-equal on integer
    counts; feed it the closed windows of a counting aggregation).
    Per-service state is ≤ max(long, short)_window integer triples —
    stream-length independent.  Defaults mirror the batch operator's."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if int(long_window) < 1 or int(short_window) < 1:
        raise ValueError("windows must be >= 1 bucket")
    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _slo_fn(float(slo), int(long_window),
                        int(short_window), float(threshold)),
                outputStructType=SLO_OUT_SCHEMA,
                stateStructType=SLO_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming Holt-Winters additive seasonal smoothing
# ---------------------------------------------------------------------------

HW_OUT_SCHEMA = ("series_id string, ts timestamp, y long, n long, "
                 "level double, trend double, fc_1 double")
HW_STATE_SCHEMA = ("n long, warm array<long>, l double, b double, "
                   "s array<double>")


def holt_winters_step(state, ys, m: int):
    """Advance one series' Holt-Winters α=β=γ=1/2 recurrence through
    ``ys`` (event order).  ``state`` is ``[n, warmup, l, b, s]``: the
    first 2·m observations accumulate in ``warmup``; on the 2·m-th
    the FPP two-season init fires (l = mean of season 1, b = season
    mean difference / m, s = season-1 deviations) and the recurrence
    consumes observations 2m+1… exactly like the batch fold
    (functions/stats.holt_winters), so emitted states are bit-equal
    to a batch run over the same prefix.  Rows before init emit NaN
    level/trend."""
    out = []
    for y in ys:
        y = int(y)
        n, warm, l, b, s = state
        n += 1
        if n < 2 * m:
            warm.append(y)
            state[0] = n
            out.append((y, n, float("nan"), float("nan"),
                        float("nan")))
            continue
        if n == 2 * m:
            warm.append(y)
            m1 = 0.0
            for v in warm[:m]:
                m1 += float(v)
            m1 /= float(m)
            m2 = 0.0
            for v in warm[m:]:
                m2 += float(v)
            m2 /= float(m)
            l = m1
            b = (m2 - m1) / float(m)
            s = [float(v) - m1 for v in warm[:m]]
            # replay the recurrence over season 2 (observations
            # m+1..2m), exactly as the batch fold consumes them
            for t, v in enumerate(warm[m:], start=m):
                ph = t % m
                l_new = ((float(v) - s[ph]) + (l + b)) / 2.0
                b_new = ((l_new - l) + b) / 2.0
                s[ph] = ((float(v) - l_new) + s[ph]) / 2.0
                l, b = l_new, b_new
            state[:] = [n, [], l, b, s]   # warm never read post-init
        else:
            t = n - 1              # 0-based position of this y
            ph = t % m
            l_new = ((float(y) - s[ph]) + (l + b)) / 2.0
            b_new = ((l_new - l) + b) / 2.0
            s[ph] = ((float(y) - l_new) + s[ph]) / 2.0
            state[:] = [n, warm, l_new, b_new, s]
        n2, _, l2, b2, s2 = state
        fc = l2 + 1.0 * b2 + s2[n2 % m]
        out.append((y, n2, l2, b2, fc))
    return out


def _hw_fn(m: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "ts", "y", "n", "level", "trend", "fc_1"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        if state.exists:
            n, warm, l, b, s = state.get
            st = [int(n), list(warm), float(l), float(b), list(s)]
        else:
            st = [0, [], float("nan"), float("nan"), []]
        data = pd.concat(list(pdfs)).sort_values("ts")
        ts = list(data["ts"])
        rows = holt_winters_step(st, data["y"].to_numpy(), m)
        state.update((int(st[0]), list(st[1]), float(st[2]),
                      float(st[3]), list(st[4])))
        yield pd.DataFrame(
            [(sid, ts[i], *r) for i, r in enumerate(rows)],
            columns=cols)

    return fn


def stream_holt_winters(stream, season: int = 24):
    """(series_id, ts, y) stream → per-observation Holt-Winters
    level/trend and one-step seasonal forecast — the streaming twin
    of functions/stats.holt_winters (FPP two-season init after 2·m
    warmup observations; states bit-equal to the batch fold at every
    post-init prefix).  Per-series state is 2·m integers of warmup +
    m seasonal doubles + two scalars — stream-length independent."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if season < 2:
        raise ValueError("season must be >= 2")
    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _hw_fn(int(season)),
                outputStructType=HW_OUT_SCHEMA,
                stateStructType=HW_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming Croston intermittent-demand forecasting
# ---------------------------------------------------------------------------

CROSTON_OUT_SCHEMA = ("series_id string, ts timestamp, y long, n long, "
                      "n_demands long, forecast double, fc_sba double")
CROSTON_STATE_SCHEMA = "n long, k long, z double, p double, q double"


def croston_step(state, ys):
    """Advance one series' Croston α=1/2 recurrence through ``ys``
    (dense bucket order, zeros meaningful).  ``state`` is
    ``[n, k, z, p, q]`` mirroring functions/stats.croston's fold
    convention exactly (q starts 1, first demand seeds z/p, later
    demands halve, q resets after a demand), so emitted states are
    bit-equal to a batch run over the same prefix."""
    out = []
    for y in ys:
        y = int(y)
        n, k, z, p, q = state
        n += 1
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
        state[:] = [n, k, z, p, q]
        # pre-demand buckets: None (SQL NULL), matching the batch
        # operator's F.when NULL — not float NaN (ADVICE r5: NaN's null
        # semantics diverge from the batch twin through Arrow)
        if k > 0:
            fc = z / p
            out.append((y, n, k, fc, 0.75 * fc))
        else:
            out.append((y, n, k, None, None))
    return out


def _croston_fn():
    def fn(key, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "ts", "y", "n", "n_demands", "forecast",
                "fc_sba"]
        if state.hasTimedOut:               # pragma: no cover - NoTimeout
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        st = ([int(state.get[0]), int(state.get[1]),
               float(state.get[2]), float(state.get[3]),
               float(state.get[4])] if state.exists
              else [0, 0, 0.0, 0.0, 1.0])
        data = pd.concat(list(pdfs)).sort_values("ts")
        ts = list(data["ts"])
        rows = croston_step(st, data["y"].to_numpy())
        state.update((int(st[0]), int(st[1]), float(st[2]),
                      float(st[3]), float(st[4])))
        df = pd.DataFrame(
            [(sid, ts[i], *r) for i, r in enumerate(rows)],
            columns=cols)
        # pre-demand buckets: keep None as SQL NULL (same conversion as
        # _slo_fn — pandas would otherwise coerce None to NaN here)
        for c in ("forecast", "fc_sba"):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
        yield df

    return fn


def stream_croston(stream):
    """(series_id, ts, y) DENSE stream (zeros meaningful — feed the
    gap-filled bucket stream) → per-bucket Croston forecast + SBA
    correction, the streaming twin of functions/stats.croston
    (bit-equal states at every prefix).  Per-series state is FIVE
    scalars — with Kalman's three, the cheapest stateful pair in the
    family."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (stream
            .groupBy("series_id")
            .applyInPandasWithState(
                _croston_fn(),
                outputStructType=CROSTON_OUT_SCHEMA,
                stateStructType=CROSTON_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
