"""Stateful streaming sessionization (applyInPandasWithState).

The engine-native streaming twin of the batch ``sessionize`` query
(plans/driver_queries.py): a session is a run of events per series with
no silence longer than ``gap_s``.  Batch computes it with a window
cumsum; an unbounded stream needs explicit per-key state — the open
session (start, last-event, count, sum) lives in the state store, closed
sessions are emitted either when a new event arrives after the gap or
when the event-time timeout fires (watermark-driven), giving exactly-once
session rows under the checkpointed sink.

This is the ``applyInPandasWithState`` pattern the reference has no
equivalent for (its engine is single-node batch): arbitrary stateful
logic over Arrow batches, keyed by series, with event-time timeouts.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("series_id string, session_start timestamp, "
              "session_end timestamp, n_events long, sum_val double")
STATE_SCHEMA = "start_us long, last_us long, n long, s double"


def _session_fn(gap_s: float):
    gap_us = int(gap_s * 1_000_000)

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (sid,) = key
        cols = ["series_id", "session_start", "session_end",
                "n_events", "sum_val"]

        def emit_row(st, last, n, sv):
            return (sid, pd.Timestamp(st, unit="us"),
                    pd.Timestamp(last, unit="us"), int(n), float(sv))

        rows = []
        if state.hasTimedOut:
            if state.exists:
                st, last, n, sv = state.get
                rows.append(emit_row(st, last, n, sv))
            state.remove()
            yield pd.DataFrame(rows, columns=cols)
            return

        data = pd.concat(list(pdfs))
        data = data.sort_values("ts")
        ts_us = (data["ts"].astype("int64") // 1000).to_numpy()
        vals = data["value"].to_numpy()
        if state.exists:
            st, last, n, sv = state.get
        else:
            st = None
        for t, v in zip(ts_us, vals):
            t = int(t)
            if st is None:
                st, last, n, sv = t, t, 1, float(v)
            elif t - last > gap_us:
                rows.append(emit_row(st, last, n, sv))
                st, last, n, sv = t, t, 1, float(v)
            else:
                last, n, sv = max(last, t), n + 1, sv + float(v)
        state.update((int(st), int(last), int(n), float(sv)))
        # close the open session when event time passes last + gap
        state.setTimeoutTimestamp((int(last) + gap_us) // 1000)
        yield pd.DataFrame(rows, columns=cols)

    return fn


def stream_sessionize(stream: DataFrame, gap_s: float = 1800.0,
                      watermark: str = "1 hour") -> DataFrame:
    """events stream (series_id, ts, value) → closed-session rows."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy("series_id")
            .applyInPandasWithState(
                _session_fn(gap_s),
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
