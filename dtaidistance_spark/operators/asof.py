"""Distributed as-of join — attach to each left row the most recent
right row at-or-before its timestamp (per key), the classic timeseries
enrichment join ("join every event to the latest completed rollup").

The reference's query layer has no join operator at all (it is a
distance library); this is part of the relational surface SURVEY §2.8
adds around the north-rule tiers.  kdb/pandas ``merge_asof`` and DuckDB
``ASOF JOIN`` define the public semantics we match (backward,
inclusive); DuckDB's is the driver oracle.

Execution model — the union+window trick, NOT a range join:

  * a naive formulation (``l JOIN r ON l.key = r.key AND r.ts <= l.ts``
    + max-per-left) explodes to |matches| rows before the argmax and is
    quadratic per key;
  * instead, union both sides into one stream tagged ``__side`` (right
    rows first at equal ts so the join is inclusive), hash-partition by
    key, sort by (ts, side) inside each partition, and carry the right
    columns forward with ``last(col, ignorenulls=True)`` over an
    unbounded-preceding running window.  Left rows then hold exactly
    the most recent right values; filter ``__side = 1``.

  Cost at 100 TB: ONE hash exchange on the key for each input + one
  sort-based window — no row explosion, no per-key quadratic term, and
  the window is streaming (running frame), so nothing materializes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame,
              on: Union[str, Sequence[str]],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance: Optional[Column] = None,
              how: str = "inner",
              suffix: str = "_r") -> DataFrame:
    """As-of join ``left`` with ``right`` on ``on`` keys.

    direction="backward": most recent right row with
    ``r[right_ts] <= l[left_ts]`` (inclusive; pandas/DuckDB default).
    direction="forward": earliest right row with ``r[right_ts] >=
    l[left_ts]``.  direction="nearest": whichever of the two is closer
    in time (ties to the backward row, matching pandas) — computed as
    both running fills over ONE union and ONE exchange (two sorts).

    ``tolerance``: optional max allowed ``abs(l.ts - r.ts)`` as a
    Column interval/expression — matches farther away are nulled (and
    dropped under ``how="inner"``).

    ``how``: "inner" drops left rows with no match, "left" keeps them
    with null right columns.

    Right rows must be unique per (key, right_ts); among equal
    timestamps the carried row is unspecified (same caveat as
    ``pandas.merge_asof``).  Right value columns that collide with a
    left column name are suffixed with ``suffix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")

    rvals = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rvals}
    matched_ts = right_ts + suffix if right_ts in left.columns else right_ts

    # one unioned stream: right rows carry their values, left rows nulls
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in rvals],
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols],
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    both = l_side.unionByName(r_side)

    # backward: ascending ts, right (side 0) before left at equal ts so
    # an equal-timestamp right row is visible — inclusive semantics.
    # forward: descending ts, same side order.  nearest: both fills
    # share the one hash partitioning (two sorts), then pick per row.
    def running(asc: bool):
        ts_ord = F.col("__ts").asc() if asc else F.col("__ts").desc()
        return (W.partitionBy(*keys)
                .orderBy(ts_ord, F.col("__side").asc())
                .rowsBetween(W.unboundedPreceding, W.currentRow))

    if direction == "nearest":
        wb, wf = running(True), running(False)
        fill = lambda c, w: F.last(c, ignorenulls=True).over(w)  # noqa: E731
        stage = both.select(
            *keys, "__ts", "__side",
            *[F.col(f"__l_{c}") for c in lcols],
            fill("__rts", wb).alias("__b_ts"),
            fill("__rts", wf).alias("__f_ts"),
            *[fill(f"__r_{c}", wb).alias(f"__b_{c}") for c in rvals],
            *[fill(f"__r_{c}", wf).alias(f"__f_{c}") for c in rvals],
        ).where(F.col("__side") == 1)
        useb = F.col("__f_ts").isNull() | (
            F.col("__b_ts").isNotNull()
            & ((F.col("__ts") - F.col("__b_ts"))
               <= (F.col("__f_ts") - F.col("__ts"))))
        pick = lambda b, f: F.when(useb, F.col(b)).otherwise(F.col(f))  # noqa: E731
        filled = stage.select(
            *keys, "__ts",
            *[F.col(f"__l_{c}") for c in lcols],
            pick("__b_ts", "__f_ts").alias("__m_ts"),
            *[pick(f"__b_{c}", f"__f_{c}").alias(f"__m_{c}")
              for c in rvals],
        )
    else:
        w = running(direction == "backward")
        filled = both.select(
            *keys, "__ts", "__side",
            *[F.col(f"__l_{c}") for c in lcols],
            F.last("__rts", ignorenulls=True).over(w).alias("__m_ts"),
            *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
              for c in rvals],
        ).where(F.col("__side") == 1)

    if tolerance is not None:
        # |l.ts - matched ts|, valid for every direction
        gap = F.when(F.col("__ts") >= F.col("__m_ts"),
                     F.col("__ts") - F.col("__m_ts")) \
               .otherwise(F.col("__m_ts") - F.col("__ts"))
        ok = F.col("__m_ts").isNotNull() & (gap <= tolerance)
        filled = filled.select(
            *keys, "__ts",
            *[F.col(f"__l_{c}") for c in lcols],
            F.when(ok, F.col("__m_ts")).alias("__m_ts"),
            *[F.when(ok, F.col(f"__m_{c}")).alias(f"__m_{c}")
              for c in rvals],
        )

    out = filled.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__m_ts").alias(matched_ts),
        *[F.col(f"__m_{c}").alias(out_names[c]) for c in rvals],
    )
    if how == "inner":
        out = out.where(F.col(matched_ts).isNotNull())
    return out


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          bucket_s: int = 3600,
                          l_start: str = "l_start", l_end: str = "l_end",
                          r_start: str = "r_start", r_end: str = "r_end"
                          ) -> DataFrame:
    """Interval overlap join — every (left, right) pair whose
    half-open intervals [start, end) intersect, with the overlap in
    seconds appended: "which sessions overlapped an incident window",
    the second classic temporal join next to the as-of join above.

    Spark-first plan: instead of the O(|L|·|R|)-prone theta/range
    join, both sides explode onto the fixed-width time buckets their
    intervals overlap (a bounded ``sequence`` — one row per spanned
    bucket, the `state_durations` attribution trick) and meet in an
    ordinary SHUFFLED HASH EQUI-JOIN on the bucket id; a pair sharing
    several buckets is emitted exactly ONCE by keeping it only at the
    bucket of ``greatest(l_start, r_start)`` — the overlap's first
    instant, which both sides provably cover — so no distinct pass
    and no pair-id requirement.  Pick ``bucket_s`` near the typical
    interval length: cost is (interval span / bucket_s) rows per
    interval vs join selectivity — the same dial as every
    bucketized-interval scheme.

    Inputs keep ALL their columns (names must not collide across the
    two sides); output appends ``overlap_s``.  Exactness: bucket ids
    and the overlap are integer-microsecond arithmetic + one division,
    so a range-join SQL twin — the structurally DIFFERENT plan —
    hash-matches, which is itself the correctness argument for the
    bucket trick.
    """
    step = int(bucket_s) * 1_000_000
    reserved = {"_s", "_e", "_b", "_rs", "_re"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"input columns collide with internal names: {sorted(clash)}")
    cross = set(left.columns) & set(right.columns)
    if cross:
        # the docstring's no-collision requirement, enforced (ADVICE r5:
        # overlapping names silently produced ambiguous duplicate columns)
        raise ValueError(
            f"left/right column names collide: {sorted(cross)}; "
            "rename one side before joining")

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    def explode_buckets(df, s_col, e_col):
        return (df.withColumn("_s", us(s_col))
                .withColumn("_e", us(e_col))
                .where(F.col("_e") > F.col("_s"))
                .withColumn("_b", F.explode(F.sequence(
                    F.floor(F.col("_s") / step),
                    F.floor((F.col("_e") - 1) / step)))))
    le = explode_buckets(left, l_start, l_end)
    re_ = (explode_buckets(right, r_start, r_end)
           .withColumnRenamed("_s", "_rs")
           .withColumnRenamed("_e", "_re"))
    j = (le.join(re_, "_b")
         .where((F.col("_s") < F.col("_re"))
                & (F.col("_rs") < F.col("_e")))
         # exactly-once: keep the pair only at the overlap's first
         # bucket, which both exploded sides necessarily produced
         .where(F.col("_b") == F.floor(
             F.greatest(F.col("_s"), F.col("_rs")) / step)))
    overlap = ((F.least(F.col("_e"), F.col("_re"))
                - F.greatest(F.col("_s"), F.col("_rs")))
               .cast("double") / F.lit(1e6))
    out_cols = [c for c in left.columns] + [c for c in right.columns]
    return j.select(*out_cols, overlap.alias("overlap_s"))
