"""Hard evidence for the north rule's deployment clause: run the full
pipeline via a REAL ``spark-submit --py-files dtaidistance_spark.zip``
invocation, twice, and record the result.

What makes this evidence rather than a smoke test:

* the driver script is copied to a temp dir OUTSIDE the repo and the
  subprocess strips the repo from PYTHONPATH, so ``import
  dtaidistance_spark`` can only resolve through the ``--py-files`` zip —
  proving the artifact is complete, not that the repo happened to be on
  the path;
* the pipeline runs twice against the same --workdir: run 1 executes
  every checkpointed stage, run 2 must resume (all stages
  ``skipped``) and finish much faster — the north rule's "resumable
  from checkpoint" clause exercised through the deployment entry point
  itself, not just through pytest;
* the recorded JSON (scripts/submit_evidence.json) carries both runs'
  metrics lines plus the spark-submit argv, so the claim is replayable.

Usage: python scripts/submit_evidence.py  [--convs 2000] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "scripts", "submit_evidence.json")


def build_zip(dest_dir: str) -> str:
    """Package dtaidistance_spark/ into the --py-files artifact."""
    base = os.path.join(dest_dir, "dtaidistance_spark")
    path = shutil.make_archive(base, "zip", root_dir=REPO,
                               base_dir="dtaidistance_spark")
    return path


def find_spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    # pip-installed pyspark ships bin/spark-submit inside the package
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError("spark-submit not found")


def run_once(argv: list[str], env: dict,
             prefix: str = "PIPELINE_RESULT ") -> dict:
    t0 = time.time()
    proc = subprocess.run(argv, capture_output=True, text=True, env=env)
    wall = round(time.time() - t0, 2)
    metrics = None
    for line in proc.stdout.splitlines():
        if line.startswith(prefix):
            metrics = json.loads(line[len(prefix):])
    if proc.returncode != 0 or metrics is None:
        tail = (proc.stderr or proc.stdout)[-3000:]
        raise RuntimeError(f"spark-submit failed rc={proc.returncode}: {tail}")
    return {"wall_s": wall, "metrics": metrics}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=2000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    stage_dir = tempfile.mkdtemp(prefix="submit_evidence_")
    zip_path = build_zip(stage_dir)
    driver = os.path.join(stage_dir, "run_pipeline.py")
    # copied outside the repo: its own sys.path.insert points at the
    # temp dir, which has no package — imports MUST come from the zip
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), driver)
    workdir = os.path.join(stage_dir, "stages")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip is the only source of the package
    env["SPARK_LOCAL_DIRS"] = "/dev/shm/spark_submit_evidence"
    os.makedirs(env["SPARK_LOCAL_DIRS"], exist_ok=True)

    argv = [find_spark_submit(),
            "--master", f"local[{args.cores}]",
            "--py-files", zip_path,
            driver,
            "--workdir", workdir,
            "--convs", str(args.convs),
            "--series-limit", "256"]
    print("argv:", " ".join(argv), flush=True)

    cold = run_once(argv, env)
    print("run1 (cold):", json.dumps(cold), flush=True)
    resumed = run_once(argv, env)
    print("run2 (resume):", json.dumps(resumed), flush=True)

    # resume proof: every stage's manifest written_at is UNCHANGED from
    # the cold run (run_stage never rewrites a complete manifest, so an
    # unchanged timestamp == the stage was skipped) and checksums agree
    s1 = cold["metrics"].get("stages", {})
    s2 = resumed["metrics"].get("stages", {})
    all_skipped = bool(s2) and set(s1) == set(s2) and all(
        s2[k]["written_at"] == s1[k]["written_at"]
        and s2[k]["checksum"] == s1[k]["checksum"] for k in s2)
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "argv": argv,
        "pythonpath_stripped": True,
        "cold": cold,
        "resume": resumed,
        "resume_all_stages_skipped": all_skipped,
        "resume_speedup": round(cold["wall_s"] / resumed["wall_s"], 2),
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"ok": True, "resume_all_stages_skipped": all_skipped,
                      "out": OUT}), flush=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    return 0 if all_skipped else 4


if __name__ == "__main__":
    sys.exit(main())
