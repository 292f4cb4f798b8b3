"""No-Spark scaling control for the N-vs-4N evidence.

Runs the SAME per-task work as the Spark DTW matrix job — the
`_compute_pairs` kernel over closed-form-unranked pair ranges — with
plain ``multiprocessing`` (no JVM, no shuffle, no scheduler), at two
process counts, plus the memory-access pattern of a hash aggregation
(scattered ``np.add.at`` + stable sort).  The ratio between the two
levels is this box's *hardware* ceiling for each work shape: any Spark
efficiency number must be read against it, because a single shared box
does not quadruple its DRAM bandwidth when the worker count quadruples
(a real 4N-executor cluster does — each node brings its own memory
channels and shuffle disk).

Usage: python scripts/kernel_control.py [N] [4N]   (default 8 32)
Prints one JSON line per level and a summary with efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SERIES = int(os.environ.get("CONTROL_SERIES", "2048"))
SERIES_LEN = int(os.environ.get("CONTROL_LEN", "504"))
WINDOW = int(os.environ.get("CONTROL_WINDOW", "24"))
AGG_ROWS = int(os.environ.get("CONTROL_AGG_ROWS", "128000000"))

_corpus = None


def _init_corpus(seed: int = 7):
    global _corpus
    rng = np.random.default_rng(seed)
    _corpus = {i: rng.normal(0, 1, SERIES_LEN) for i in range(N_SERIES)}


def _triu_unrank(p, n):
    from dtaidistance_spark.operators.matrix import _triu_unrank as tu
    return tu(p, n)


def _dtw_range(args):
    lo, hi = args
    from dtaidistance_spark.operators.matrix import _compute_pairs
    from dtaidistance_spark.kernels.dtw import DtwSettings
    p = np.arange(lo, hi, dtype=np.int64)
    ii, jj = _triu_unrank(p, N_SERIES)
    st = DtwSettings(window=WINDOW)
    _compute_pairs(ii, jj, _corpus, st)
    return hi - lo


def _agg_task(args):
    seed, rows = args
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, rows // 16, rows)
    vals = rng.normal(0, 1, rows)
    acc = np.zeros(rows // 16)
    np.add.at(acc, keys, vals)          # scattered writes (hash agg)
    order = np.argsort(keys, kind="stable")  # shuffle sort
    return float(vals[order][:10].sum() + acc[:10].sum())


def run_level(nproc: int) -> dict:
    n_pairs = N_SERIES * (N_SERIES - 1) // 2
    bounds = np.linspace(0, n_pairs, nproc * 4 + 1, dtype=np.int64)
    ranges = [(int(bounds[k]), int(bounds[k + 1]))
              for k in range(len(bounds) - 1)]
    with mp.get_context("fork").Pool(nproc, initializer=_init_corpus) as pool:
        t0 = time.time()
        done = sum(pool.map(_dtw_range, ranges))
        t_dtw = time.time() - t0
        t0 = time.time()
        pool.map(_agg_task, [(s, AGG_ROWS // nproc // 4)
                             for s in range(nproc * 4)])
        t_agg = time.time() - t0
    out = {"nproc": nproc, "t_dtw": round(t_dtw, 3),
           "pairs_per_sec": round(done / t_dtw, 1),
           "t_agg": round(t_agg, 3)}
    print("CONTROL " + json.dumps(out), flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(os.environ.get("CONTROL_REPEATS", "2"))
    best = {}
    for _ in range(reps):
        for lvl in (n, n4):  # interleaved, like the Spark legs
            r = run_level(lvl)
            b = best.get(lvl)
            if b is None or r["t_dtw"] < b["t_dtw"]:
                best[lvl] = r
    eff_dtw = (best[n]["t_dtw"] / best[n4]["t_dtw"]) / (n4 / n)
    eff_agg = (best[n]["t_agg"] / best[n4]["t_agg"]) / (n4 / n)
    print("CONTROL_SUMMARY " + json.dumps({
        "pair": f"{n}->{n4}",
        "eff_dtw_kernel": round(eff_dtw, 3),
        "eff_agg_pattern": round(eff_agg, 3),
        "best": best,
    }))


if __name__ == "__main__":
    main()
