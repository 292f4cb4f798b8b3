"""Transcript → per-conversation time-series points.

The two north-rule series kinds:

* ``inter_turn_latency`` — seconds between consecutive turns, under
  stable (conv_id, turn_idx) ordering; one point per turn_idx ≥ 1.
* ``turn_rate`` — one unit point per turn; the *rate* materializes at
  rollup time as ``cnt`` per bucket.

Both are single window/projection passes — one shuffle keyed by conv_id
(the lag window), then reused by every downstream rollup because the
partitioning key (series_id = conv_id + kind) is a superset of conv_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

POINT_COLUMNS = ["series_id", "conv_id", "kind", "seq", "ts", "value"]


def transcript_points(transcripts: DataFrame, kinds=("turn_rate",
                                                     "inter_turn_latency")) -> DataFrame:
    """Explode a transcript table into point series rows."""
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
        w = W.partitionBy("conv_id").orderBy("turn_idx")
        lat = (
            # project before the window: the lag shuffle must move only
            # (conv_id, turn_idx, ts), not the text/tool payload
            transcripts.select("conv_id", "turn_idx", "ts")
            .withColumn("prev_ts", F.lag("ts").over(w))
            .where(F.col("prev_ts").isNotNull())
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
