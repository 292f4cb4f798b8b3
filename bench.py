"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Every query is forced end-to-end with a noop-format write (all columns
materialize, nothing collects to the driver).  The "extra" field carries
the north-rule throughput numbers (rolled-up points/sec per tier chain,
DTW pairs/sec) and the run configuration so BENCH_r{N}.json is
self-describing.  For the N-vs-4N scaling-efficiency evidence, run
scripts/scaling_report.py (same job at local[8] and local[32]).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "rollup_1m",
    "rollup_1h_cascade",
    "rollup_1d_cascade",
    "gap_fill_1h",
    "compress_roundtrip_1h",
    "latency_points",
    "top_users_1d",
    "dedup_exact",
    "token_stats",
    "minhash_lsh",
    "ann_brute_topk",
    "subsequence_topk",
    "dtw_distance_matrix",
]


def _force(df) -> None:
    """Materialize every column of the plan (noop sink, nothing collects)."""
    df.write.format("noop").mode("overwrite").save()


def main():
    from dtaidistance_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", cores=CPUS,
                      shuffle_partitions=max(16, CPUS))
    qs = entrymod.queries()
    selected = sys.argv[1:] or BENCH_QUERIES
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in selected:
        df = qs[name](spark, SF_DIR)
        t0 = time.time()
        _force(df)
        timings[name] = round(time.time() - t0, 3)
        if name.startswith("rollup_"):
            rows[name] = df.count()  # cheap re-agg, untimed
        # queries are independent measurements: release any caches a
        # query persisted (search prefilters, index passes) and nudge the
        # driver GC so the ContextCleaner actually frees broadcasts and
        # shuffle state before the next timing — measured 3× on the DTW
        # matrix when run after the full pack without this
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    if "dtw_distance_matrix" in selected:
        # pair count from the series cardinality (n·(n-1)/2), not a re-run
        from dtaidistance_spark.plans import driver_queries as DQ
        n_series = DQ.hourly_series(spark, SF_DIR).count()
        rows["dtw_distance_matrix"] = n_series * (n_series - 1) // 2

    # derived north-rule throughputs
    n_points = rows.get("rollup_1m", 0) + rows.get("rollup_1h_cascade", 0) \
        + rows.get("rollup_1d_cascade", 0)
    t_tiers = (timings.get("rollup_1m", 0) + timings.get("rollup_1h_cascade", 0)
               + timings.get("rollup_1d_cascade", 0))
    n_pairs = rows.get("dtw_distance_matrix", 0)
    t_pairs = timings.get("dtw_distance_matrix", 1e-9)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline-suite wall time (rollup tiers + gap-fill + "
                  "compression + dedup + ANN + banded-DTW matrix)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "extra": {
            "cpus": CPUS,
            "sf_dir": SF_DIR,
            "rows": rows,
            "rolled_up_points_per_sec": round(n_points / t_tiers, 1) if t_tiers else None,
            "dtw_pairs_per_sec": round(n_pairs / t_pairs, 1),
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
