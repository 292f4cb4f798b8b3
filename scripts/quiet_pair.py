"""Opportunistic quiet-window 8→32 long-leg scaling pair (VERDICT r3
item 9): runs ONE interleaved local[8]/local[32] pair of the full
north-rule pipeline, but only when the box is actually quiet — the
1-minute load average is sampled immediately before each leg and the
pair is abandoned (exit 3) if background load is above the threshold,
so a published pair is quiet *by construction*, not by hope.

Reuses scaling_report.py's RUN_SNIPPET/run_at; does NOT overwrite
BENCH.md — appends one JSON line per attempt to scripts/quiet_pairs.jsonl
for manual curation into BENCH.md.

Usage: SCALING_INPUT=<transcripts parquet> python scripts/quiet_pair.py
Env: QUIET_MAX_LOAD (default 2.0).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_report import run_at  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "scripts", "quiet_pairs.jsonl")


def main() -> int:
    src = os.environ.get("SCALING_INPUT")
    if not src or not os.path.exists(src):
        print("SCALING_INPUT missing", file=sys.stderr)
        return 2
    max_load = float(os.environ.get("QUIET_MAX_LOAD", "2.0"))
    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "max_load": max_load, "legs": {}}
    for cores in (8, 32):
        load = os.getloadavg()[0]
        if load > max_load:
            rec["abandoned"] = f"load {load:.2f} before local[{cores}] leg"
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            return 3
        r = run_at(cores, src)
        r["load_before"] = round(load, 2)
        r["load_after"] = round(os.getloadavg()[0], 2)
        rec["legs"][str(cores)] = r
        print(json.dumps(r), flush=True)
        # let our own leg's load decay so the next sample sees background
        # (1-min EMA from ~8 needs ~90 s to fall under a 2.0 gate)
        if cores == 8:
            time.sleep(90)
    l8, l32 = rec["legs"]["8"], rec["legs"]["32"]
    rec["eff_total"] = round((l8["t_total"] / l32["t_total"]) / 4, 3)
    rec["eff_dtw"] = round((l8["t_dtw"] / l32["t_dtw"]) / 4, 3)
    rec["eff_rollup"] = round((l8["t_rollup"] / l32["t_rollup"]) / 4, 3)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
