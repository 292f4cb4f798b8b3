"""Ragged-corpus schedule A/B (VERDICT r4 item 4): cost-weighted vs
count-weighted guided pair ranges for the broadcast distance-matrix
strategy, on a power-law length distribution shaped like real
conversation lengths (the bench corpus is equal-length, so the count
schedule is accidentally optimal there — this is the corpus where it
is not).

Three pieces of evidence, strongest first:

1. **Deterministic makespan simulation** — the exact per-range cost
   (sum of len_i·len_j, the DTW kernel's true work) list-scheduled onto
   ``par`` slots in launch order (Spark's slot model).  No Spark, no
   host noise: pure schedule quality.  Reported for both the shuffled
   layout (lengths randomly placed over ids) and the sorted layout
   (lengths correlated with id, as when ids follow user activity).
2. **Real A/B wall times** — alternating isolated subprocess legs
   (fresh JVM each) running the actual operator with
   ``DTW_COST_GUIDED`` toggled, CPU-metered (own/neighbor/steal).
3. **Bit-identical outputs** — per-leg checksum of the (i, j, d) rows;
   the schedule may only move work, never change it.

Usage: python scripts/ragged_bench.py [--child {cost|count} layout]
Env: RAGGED_N (series, default 500), RAGGED_CPUS (default 32),
RAGGED_REPS (default 2 per arm).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("RAGGED_N", "500"))
CPUS = int(os.environ.get("RAGGED_CPUS", "32"))
REPS = int(os.environ.get("RAGGED_REPS", "2"))
SEED = 42


def corpus_lengths(n: int, layout: str) -> np.ndarray:
    """Power-law length distribution over DISCRETE buckets (what a real
    pipeline produces after pad-to-bucket, and what keeps the batch
    kernel's equal-shape grouping effective: fully continuous lengths
    fragment every task into batch-1 groups whose per-diagonal Python
    overhead — linear in l1+l2 — swamps the quadratic cell work and
    hides any schedule signal).  Bucket probabilities follow a lognormal
    over the bucket index: median ~128, heavy right tail to 2048."""
    rng = np.random.default_rng(SEED)
    buckets = np.array([32, 64, 128, 256, 512, 1024, 2048],
                       dtype=np.int64)
    raw = np.clip(np.exp(rng.normal(np.log(128), 1.0, n)), 32, 2048)
    lens = buckets[np.searchsorted(buckets, raw, side="left")
                   .clip(0, len(buckets) - 1)]
    if layout == "sorted":
        lens = np.sort(lens)
    return lens


def build_series(lens: np.ndarray) -> list:
    rng = np.random.default_rng(SEED + 1)
    return [(int(i), rng.normal(0, 1, int(m)).tolist())
            for i, m in enumerate(lens)]


def simulate(ranges: list, cost_upto, par: int) -> float:
    """List-schedule range costs onto par slots in launch order;
    return makespan (in cost units)."""
    free = np.zeros(par)
    for lo, hi in ranges:
        c = cost_upto(hi) - cost_upto(lo)
        k = int(np.argmin(free))
        free[k] += c
    return float(free.max())


def makespan_ab(layout: str) -> dict:
    from dtaidistance_spark.operators.matrix import (
        _guided_ranges, _guided_ranges_cost, _triu_cost_fn)

    lens = corpus_lengths(N, layout)
    n_pairs = N * (N - 1) // 2
    cost_upto, total = _triu_cost_fn(lens)
    r_cost = _guided_ranges_cost(cost_upto, n_pairs, total, CPUS)
    r_count = _guided_ranges(n_pairs, CPUS)
    m_cost = simulate(r_cost, cost_upto, CPUS)
    m_count = simulate(r_count, cost_upto, CPUS)
    ideal = total / CPUS
    return {"layout": layout,
            "ranges_cost": len(r_cost), "ranges_count": len(r_count),
            "makespan_cost_vs_ideal": round(m_cost / ideal, 4),
            "makespan_count_vs_ideal": round(m_count / ideal, 4),
            "count_over_cost": round(m_count / m_cost, 4)}


def _child(mode: str, layout: str) -> None:
    os.environ["DTW_COST_GUIDED"] = "1" if mode == "cost" else "0"
    from pyspark.sql import functions as F

    from dtaidistance_spark.meter import CpuMeter
    from dtaidistance_spark.operators.matrix import distance_matrix
    from dtaidistance_spark.session import get_spark

    spark = get_spark(app_name=f"ragged-{mode}", cores=CPUS,
                      shuffle_partitions=CPUS)
    series = build_series(corpus_lengths(N, layout))
    df = spark.createDataFrame(series, "i long, values array<double>")
    df = df.repartition(CPUS).persist()
    df.count()
    meter = CpuMeter()
    # warm-up (JIT/codegen) then timed reps on fresh plans
    distance_matrix(df).write.format("noop").mode("overwrite").save()
    walls, loads = [], []
    for _ in range(REPS):
        out = distance_matrix(df)
        meter.begin()
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
        loads.append(meter.end())
    chk = distance_matrix(df).select(
        F.sum(F.xxhash64("i", "j", F.round("d", 9)) % F.lit(10 ** 12))
        .alias("c")).collect()[0]["c"]
    spark.stop()
    print("RAGGED_CHILD " + json.dumps(
        {"mode": mode, "layout": layout, "walls": walls,
         "best": min(walls), "loads": loads, "checksum": int(chk)}))


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3])
        return 0
    out = {"n": N, "cpus": CPUS,
           "sim": [makespan_ab("shuffled"), makespan_ab("sorted")],
           "legs": []}
    layout = "shuffled"
    for rep in range(REPS):
        for mode in ("cost", "count"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 mode, layout],
                capture_output=True, text=True, cwd=REPO)
            for line in p.stdout.splitlines():
                if line.startswith("RAGGED_CHILD "):
                    out["legs"].append(json.loads(line[13:]))
    chks = {l["checksum"] for l in out["legs"]}
    out["bit_identical"] = len(chks) == 1
    bests = {m: min(l["best"] for l in out["legs"] if l["mode"] == m)
             for m in ("cost", "count")}
    out["best_cost_s"] = bests.get("cost")
    out["best_count_s"] = bests.get("count")
    if bests.get("cost"):
        out["count_over_cost_wall"] = round(
            bests["count"] / bests["cost"], 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
