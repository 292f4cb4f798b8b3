"""Incremental continuous-aggregate refresh across retention tiers,
driven by snapshot-manifest diffs (sinks/snapshots.py).

The north rule's cascade (1m → 1h → 1d) must stay cheap when only a
sliver of the table changed — on a 10^12-turn corpus a micro-batch or a
late-data repair touches a handful of days, and recomputing the whole
coarser tier for that would be O(table).  This module makes the refresh
O(changed partitions), the TimescaleDB continuous-aggregate contract:

1. Each coarser-tier snapshot records ``source_snapshot`` — the
   finer-tier snapshot id it was computed from.
2. `changed_days` diffs the finer tier's current manifest against that
   recorded snapshot: a day needs refresh iff its (files, rows, bytes)
   entry differs (copy-on-write commits make the file list a version
   vector per partition — no data reads, no timestamps to trust).
3. `refresh_cascade` re-aggregates ONLY those days (manifest-pruned
   read, so Spark never lists the unchanged 99.9% of files) and
   commits them; unchanged days are carried over file-for-file by
   `commit_tier`.

Day alignment makes per-day refresh exact: ``date_trunc`` for every
tier keeps a bucket inside its calendar day, so a finer-tier day maps
onto exactly one coarser-tier day and a day-scoped re-aggregation
reproduces the full recompute bit-for-bit (asserted in
tests/test_sink.py::TestIncrementalRefresh).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import SparkSession

from ..operators.rollup import rollup_cascade
from .snapshots import commit_tier, load_manifest, read_tier


def changed_days(base: str, tier: str,
                 since_snapshot: Optional[int]) -> List[str]:
    """Days whose partition entry changed after ``since_snapshot``
    (None = everything is new).  Pure manifest diff — O(partitions)
    driver-side, no file I/O beyond two JSON reads."""
    latest = load_manifest(base, tier)
    if since_snapshot is None:
        return sorted(latest["partitions"])
    old = load_manifest(base, tier, since_snapshot)["partitions"]
    return sorted(d for d, e in latest["partitions"].items()
                  if old.get(d) != e)


def refresh_cascade(spark: SparkSession, base: str,
                    from_tier: str, to_tier: str) -> Optional[int]:
    """Refresh ``to_tier`` from ``from_tier`` incrementally; returns the
    new snapshot id, or None when the source is unchanged since the
    last refresh (no empty commits)."""
    src_man = load_manifest(base, from_tier)
    try:
        last_src = load_manifest(base, to_tier).get("source_snapshot")
    except FileNotFoundError:
        last_src = None
    try:
        days = changed_days(base, from_tier, last_src)
    except FileNotFoundError:
        # the recorded source snapshot was expired — fall back to full
        days = sorted(src_man["partitions"])
    if not days:
        return None
    src = read_tier(spark, base, from_tier, days=set(days))
    agg = rollup_cascade(src, to_tier)
    return commit_tier(agg, base, to_tier,
                       extra={"source_snapshot": src_man["snapshot_id"],
                              "refreshed_days": days})
