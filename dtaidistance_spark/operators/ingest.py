"""Transcript → per-conversation time-series points.

The two north-rule series kinds:

* ``inter_turn_latency`` — seconds between consecutive turns, under
  stable (conv_id, turn_idx) ordering; one point per turn_idx ≥ 1.
* ``turn_rate`` — one unit point per turn; the *rate* materializes at
  rollup time as ``cnt`` per bucket.

Both are single window/projection passes — one shuffle keyed by conv_id
(the lag window), then reused by every downstream rollup because the
partitioning key (series_id = conv_id + kind) is a superset of conv_id.

Skew (north-rule mandate: "salted repartitioning" for power-law turn
counts): ``salt_chunk=C`` replaces the per-conversation lag window with a
salted two-pass plan.  Pass 1 lags inside (conv_id, turn_idx div C)
chunks — the window partition is bounded at C rows no matter how hot the
conversation, so a 10M-turn conversation becomes 10M/C independent tasks
instead of one straggler.  Pass 2 repairs the chunk boundaries: a tiny
per-chunk aggregate (one row per chunk — max_by(ts, turn_idx)) is lagged
per conversation to fetch the previous *existing* chunk's last timestamp
(robust to whole chunk ranges skipped by sparse turn_idx), then joined
back on the same (conv_id, chunk) key the pass-1 shuffle already hashes.
The salted plan is value-identical to the plain one (pinned in
tests/test_pipeline.py::TestSaltedIngest) — only the physical partition
bound changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

POINT_COLUMNS = ["series_id", "conv_id", "kind", "seq", "ts", "value"]


def _latency_lag_plain(turns: DataFrame) -> DataFrame:
    """prev_ts via one lag window partitioned by conv_id (skew-exposed:
    the hottest conversation is one window partition)."""
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return turns.withColumn("prev_ts", F.lag("ts").over(w))


def _latency_lag_salted(turns: DataFrame, chunk: int) -> DataFrame:
    """prev_ts via the salted two-pass plan (see module docstring).

    The heavy window is partitioned by (conv_id, __chunk) — ≤ `chunk`
    rows per partition by construction — and the boundary repair runs on
    a table with one row per chunk (|turns| / chunk rows), lagged per
    conversation and joined back on the already-shuffled key.
    """
    chunked = turns.withColumn(
        "__chunk", (F.col("turn_idx").cast("long") / F.lit(int(chunk)))
        .cast("long"))
    w_in = W.partitionBy("conv_id", "__chunk").orderBy("turn_idx")
    in_chunk = chunked.withColumn("__prev_in", F.lag("ts").over(w_in))

    # one row per (conv_id, chunk): the chunk's last timestamp
    last_per_chunk = (
        chunked.groupBy("conv_id", "__chunk")
        .agg(F.max_by("ts", "turn_idx").alias("__chunk_last_ts"))
    )
    w_chunks = W.partitionBy("conv_id").orderBy("__chunk")
    prev_chunk = last_per_chunk.select(
        "conv_id", "__chunk",
        F.lag("__chunk_last_ts").over(w_chunks).alias("__prev_chunk_ts"),
    )
    return (
        in_chunk.join(prev_chunk, ["conv_id", "__chunk"], "left")
        .withColumn("prev_ts", F.coalesce("__prev_in", "__prev_chunk_ts"))
        .drop("__chunk", "__prev_in", "__prev_chunk_ts")
    )


def transcript_points(transcripts: DataFrame, kinds=("turn_rate",
                                                     "inter_turn_latency"),
                      salt_chunk: int | None = None) -> DataFrame:
    """Explode a transcript table into point series rows.

    ``salt_chunk``: when set, the inter-turn-latency lag uses the salted
    skew-safe plan with window partitions bounded at ``salt_chunk`` rows.
    """
    parts = []
    if "turn_rate" in kinds:
        parts.append(
            transcripts.select(
                F.concat("conv_id", F.lit(":turn_rate")).alias("series_id"),
                "conv_id", F.lit("turn_rate").alias("kind"),
                F.col("turn_idx").cast("long").alias("seq"),
                "ts", F.lit(1.0).alias("value"),
            )
        )
    if "inter_turn_latency" in kinds:
        # project before the window: the lag shuffle must move only
        # (conv_id, turn_idx, ts), not the text/tool payload
        turns = transcripts.select("conv_id", "turn_idx", "ts")
        lagged = (_latency_lag_salted(turns, salt_chunk) if salt_chunk
                  else _latency_lag_plain(turns))
        lat = (
            lagged.where(F.col("prev_ts").isNotNull())
            .select(
                F.concat("conv_id", F.lit(":inter_turn_latency")).alias("series_id"),
                "conv_id", F.lit("inter_turn_latency").alias("kind"),
                F.col("turn_idx").cast("long").alias("seq"),
                "ts",
                (F.col("ts").cast("double") - F.col("prev_ts").cast("double")
                 ).alias("value"),
            )
        )
        parts.append(lat)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx)-ordered view — the per-row invariant
    surface (per-turn text equality under stable turn ordering)."""
    return transcripts.orderBy("conv_id", "turn_idx")
