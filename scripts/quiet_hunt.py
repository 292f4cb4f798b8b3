"""Clean-pair hunter: run quiet_pair.py attempts whenever the box is
quiet, until one pair is *provably* clean (both legs neighbor ≤ 1 core
AND steal ≤ 1 core, as metered by quiet_pair's /proc accounting) or a
deadline passes.  Appends every attempt to quiet_pairs.jsonl as usual —
stormed attempts are data too (they document the host), the hunter just
keeps going until the evidence-grade one lands.

Usage: SCALING_INPUT=... python scripts/quiet_hunt.py [deadline_min]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "scripts", "quiet_pairs.jsonl")


def main() -> int:
    deadline = time.time() + 60 * float(sys.argv[1] if len(sys.argv) > 1
                                        else "45")
    attempt = 0
    while time.time() < deadline:
        load = os.getloadavg()[0]
        if load > 0.8:
            print(f"load {load:.2f} — waiting for quiet", flush=True)
            time.sleep(30)
            continue
        attempt += 1
        print(f"attempt {attempt} (load {load:.2f})", flush=True)
        n0 = sum(1 for _ in open(OUT)) if os.path.exists(OUT) else 0
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "quiet_pair.py")])
        with open(OUT) as f:
            lines = f.readlines()
        for line in lines[n0:]:
            rec = json.loads(line)
            if rec.get("clean"):
                print("CLEAN PAIR: " + line.strip(), flush=True)
                return 0
        time.sleep(20)
    print("deadline reached without a clean pair", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
