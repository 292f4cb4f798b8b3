"""Deployment evidence for the corpus-curation pipeline: run
scripts/curate_corpus.py via a REAL ``spark-submit --py-files`` from
OUTSIDE the repo with PYTHONPATH stripped (the zip is the only package
source), twice against one workdir — run 2 must resume every
checkpointed stage (resumed=true for all six, identical final
checksum).  Records scripts/submit_evidence_curate.json.

Usage: python scripts/submit_evidence_curate.py [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from submit_evidence import build_zip, find_spark_submit, run_once  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "scripts", "submit_evidence_curate.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--input",
                    default="/root/testdata/sf0.001/documents.parquet")
    args = ap.parse_args()

    stage_dir = tempfile.mkdtemp(prefix="submit_curate_")
    zip_path = build_zip(stage_dir)
    driver = os.path.join(stage_dir, "curate_corpus.py")
    shutil.copy(os.path.join(REPO, "scripts", "curate_corpus.py"), driver)
    workdir = os.path.join(stage_dir, "stages")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["SPARK_LOCAL_DIRS"] = "/dev/shm/spark_submit_curate"
    os.makedirs(env["SPARK_LOCAL_DIRS"], exist_ok=True)

    argv = [find_spark_submit(),
            "--master", f"local[{args.cores}]",
            "--py-files", zip_path,
            driver,
            "--input", args.input,
            "--workdir", workdir]
    print("argv:", " ".join(argv), flush=True)

    cold = run_once(argv, env, prefix="CURATE_RESULT ")
    print("run1 (cold):", json.dumps(cold), flush=True)
    resumed = run_once(argv, env, prefix="CURATE_RESULT ")
    print("run2 (resume):", json.dumps(resumed), flush=True)

    s2 = resumed["metrics"]["stages"]
    all_resumed = bool(s2) and all(st["resumed"] for st in s2.values())
    same_sum = (resumed["metrics"]["final_checksum"]
                == cold["metrics"]["final_checksum"])
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "argv": argv,
        "pythonpath_stripped": True,
        "cold": cold,
        "resume": resumed,
        "resume_all_stages_resumed": all_resumed,
        "final_checksum_equal": same_sum,
        "resume_speedup": round(cold["wall_s"] / resumed["wall_s"], 2),
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"ok": all_resumed and same_sum, "out": OUT}),
          flush=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    return 0 if (all_resumed and same_sum) else 4


if __name__ == "__main__":
    sys.exit(main())
