"""Streaming subsequence DTW matching (applyInPandasWithState).

The streaming twin of kernels/subsequence.py (reference
subsequence/subsequencealignment.py:175-459): monitor an unbounded
per-series stream for subsequences whose DTW distance to a short query
pattern is at most ``threshold``, emitting each disjoint optimal match
as soon as the stream proves it can no longer be improved or extended.

This is the SPRING algorithm (Sakurai, Faloutsos, Yamamuro: "Stream
Monitoring under the Time Warping Distance", ICDE 2007) re-expressed as
a Spark stateful streaming operator: subsequence-DTW's accumulated-cost
lattice only ever consumes its previous *column*, so per-series state is
one DP column (|Q|+1 doubles), one start-pointer column (SPRING's
subsequence bookkeeping), and the open match candidate.  State size is
O(|Q|) per series — independent of stream length — so the operator runs
forever at constant memory per key, scales horizontally with the number
of series (state-store-partitioned by series_id), and never re-reads
history.

Bit-exactness: the column recurrence computes ``cost + min(diag,
up + penalty, left + penalty)`` with the psi-relaxed top row pinned to 0
— the per-cell arithmetic of the batch kernel (kernels/dtw.py
``_dtw_batch_core`` + psi series-side), so the streaming matching
function sqrt(D[|Q|][j])/|Q| equals kernels/subsequence.py's
``SubseqAlignment.matching`` bit-for-bit at every index (min is
order-independent and float addition of identical operands is
deterministic; tests assert ``==``).

Emission semantics (SPRING, threshold-based): a candidate (value,
start, end) opens when the matching value at the current end-point
drops to ``<= threshold``; it is reported once every live DP cell
either already costs more than the candidate or belongs to a path
starting after the candidate's end (the stream can neither improve nor
overlap it), after which cells overlapping the reported range are
masked to +inf so later matches are disjoint — the streaming analogue
of kbest_matches' masked-argmin loop (kernels/subsequence.py:66-102).
The open candidate at end-of-stream is flushed by the event-time
timeout, exactly like sessionize_stream's open session.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

__all__ = ["SpringState", "spring_init", "spring_step", "spring_flush",
           "stream_subsequence_match"]

_INF = float("inf")


class SpringState:
    """Mutable per-series SPRING state: one DP column + start pointers +
    the open candidate.  ``col``/``starts`` index 0 is the psi-relaxed
    top row (always 0 / next point's index); index i>=1 is query point i."""

    __slots__ = ("pos", "col", "starts", "best_v", "best_s", "best_e")

    def __init__(self, pos: int, col: np.ndarray, starts: np.ndarray,
                 best_v: float, best_s: int, best_e: int):
        self.pos = pos          # series points consumed so far
        self.col = col          # (|Q|+1,) float64 accumulated squared cost
        self.starts = starts    # (|Q|+1,) int64 0-based match-start index
        self.best_v = best_v    # open candidate value (inf = none)
        self.best_s = best_s
        self.best_e = best_e


def spring_init(qlen: int) -> SpringState:
    col = np.full(qlen + 1, _INF, dtype=np.float64)
    col[0] = 0.0
    starts = np.zeros(qlen + 1, dtype=np.int64)
    return SpringState(0, col, starts, _INF, -1, -1)


def spring_step(st: SpringState, query: np.ndarray, values: np.ndarray,
                threshold: float, penalty_sq: float
                ) -> List[Tuple[int, int, float]]:
    """Advance the state over new points; return completed disjoint
    matches as (start_idx, end_idx, value) with 0-based inclusive
    stream-global indices.  Splitting ``values`` across calls at any
    boundary yields identical state and emissions (the chunk-invariance
    the tests pin), so micro-batch boundaries never change results."""
    q = np.asarray(query, dtype=np.float64)
    n = len(q)
    col, starts = st.col, st.starts
    out: List[Tuple[int, int, float]] = []
    for v in np.asarray(values, dtype=np.float64):
        j = st.pos  # 0-based index of this point
        cost = (float(v) - q) ** 2
        new_col = np.empty_like(col)
        new_starts = np.empty_like(starts)
        new_col[0] = 0.0
        new_starts[0] = j + 1  # a path entering after this point starts there
        for i in range(1, n + 1):
            diag = col[i - 1]
            up = new_col[i - 1] + penalty_sq
            left = col[i] + penalty_sq
            m = diag
            s = starts[i - 1]
            if up < m:
                m = up
                s = new_starts[i - 1]
            if left < m:
                m = left
                s = starts[i]
            new_col[i] = cost[i - 1] + m
            new_starts[i] = s
        col, starts = new_col, new_starts
        st.pos = j + 1
        # report the open candidate once no live path can beat or overlap it
        if st.best_v <= threshold:
            live = col[1:]
            if bool(np.all((np.sqrt(live) / n >= st.best_v)
                           | (starts[1:] > st.best_e))):
                out.append((st.best_s, st.best_e, st.best_v))
                # mask paths overlapping the reported range (disjointness,
                # the kbest overlap suppression analogue)
                overlap = starts <= st.best_e
                overlap[0] = False
                col[overlap] = _INF
                st.best_v, st.best_s, st.best_e = _INF, -1, -1
        # the matching function at end-point j (batch: sqrt(wps[-1, j+1])/|Q|),
        # read AFTER masking so a path overlapping a just-reported match
        # can't reopen as a candidate (SPRING's post-report d_i = inf)
        vj = float(np.sqrt(col[n]) / n)
        if vj <= threshold and vj < st.best_v:
            st.best_v, st.best_s, st.best_e = vj, int(starts[n]), j
    st.col, st.starts = col, starts
    return out


def spring_flush(st: SpringState) -> Optional[Tuple[int, int, float]]:
    """End-of-stream: the open candidate is final (nothing can improve it)."""
    if st.best_v != _INF:
        m = (st.best_s, st.best_e, st.best_v)
        st.best_v, st.best_s, st.best_e = _INF, -1, -1
        return m
    return None


# ---------------------------------------------------------------------------
# Spark stateful operator
# ---------------------------------------------------------------------------

OUT_SCHEMA = ("series_id string, match_start long, match_end long, "
              "value double, closed boolean")
STATE_SCHEMA = ("pos long, col array<double>, starts array<long>, "
                "best_v double, best_s long, best_e long")


def _match_fn(query_list: List[float], threshold: float, penalty_sq: float,
              timeout_gap_ms: int):
    # the query ships in the task closure: a few hundred bytes once per
    # task, never per row — no broadcast needed at any scale
    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        from pyspark.sql.streaming.state import GroupState  # noqa: F401
        (sid,) = key
        cols = ["series_id", "match_start", "match_end", "value", "closed"]
        q = np.asarray(query_list, dtype=np.float64)

        if state.hasTimedOut:
            rows = []
            if state.exists:
                pos, col, starts, bv, bs, be = state.get
                st = SpringState(pos, np.asarray(col), np.asarray(starts),
                                 bv if bv is not None else _INF, bs, be)
                m = spring_flush(st)
                if m is not None:
                    rows.append((sid, m[0], m[1], m[2], False))
            state.remove()
            yield pd.DataFrame(rows, columns=cols)
            return

        data = pd.concat(list(pdfs)).sort_values("ts")
        last_ts_ms = int(data["ts"].astype("int64").max() // 1_000_000)
        if state.exists:
            pos, col, starts, bv, bs, be = state.get
            st = SpringState(pos, np.asarray(col, dtype=np.float64),
                             np.asarray(starts, dtype=np.int64),
                             bv if bv is not None else _INF, bs, be)
            if not np.isfinite(st.best_v):
                st.best_v = _INF  # inf round-trips as None in some codecs
        else:
            st = spring_init(len(q))
        matches = spring_step(st, q, data["value"].to_numpy(),
                              threshold, penalty_sq)
        bv = st.best_v if np.isfinite(st.best_v) else None
        state.update((int(st.pos), [float(x) for x in st.col],
                      [int(x) for x in st.starts], bv,
                      int(st.best_s), int(st.best_e)))
        state.setTimeoutTimestamp(last_ts_ms + timeout_gap_ms)
        yield pd.DataFrame(
            [(sid, s, e, v, True) for (s, e, v) in matches], columns=cols)

    return fn


def parse_interval_ms(interval: str) -> int:
    """'<n> <unit>[s]' → milliseconds, accepting the same unit
    vocabulary as Spark interval strings (millisecond/second/minute/
    hour/day/week); anything else raises a clear ValueError instead of
    an opaque KeyError at plan-build time."""
    unit_ms = {"millisecond": 1, "second": 1_000, "minute": 60_000,
               "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000}
    parts = interval.strip().lower().split()
    if len(parts) != 2 or parts[1].rstrip("s") not in unit_ms:
        units = "|".join(sorted(unit_ms))
        raise ValueError(f"interval must be '<n> <{units}>[s]' "
                         f"(got {interval!r})")
    return int(parts[0]) * unit_ms[parts[1].rstrip("s")]


def stream_subsequence_match(stream, query, threshold: float,
                             penalty: float = 0.1,
                             watermark: str = "1 hour",
                             timeout_gap: str = "1 hour"):
    """events stream (series_id, ts, value) → disjoint DTW subsequence
    matches of ``query`` with normalized distance <= ``threshold``.

    ``closed=True`` rows were proven un-improvable by later data;
    ``closed=False`` rows are the final open candidate flushed by the
    event-time timeout (``timeout_gap`` of silence past the series'
    last event).  ``penalty`` follows the batch kernel's convention
    (squared before entering the DP, kernels/dtw.py:135)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = parse_interval_ms(timeout_gap)
    penalty_sq = 0.0 if not penalty else float(penalty) ** 2
    return (stream
            .withWatermark("ts", watermark)
            .groupBy("series_id")
            .applyInPandasWithState(
                _match_fn([float(x) for x in np.asarray(query)],
                          float(threshold), penalty_sq, gap_ms),
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
