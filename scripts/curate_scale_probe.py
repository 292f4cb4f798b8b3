"""Curation-layer scale probe (VERDICT r4 item 8): run the full
curate_corpus.py pipeline at sf0.1 (5k docs) and at a deterministic
synthetic 10x corpus (50k docs, same shape), and compare per-stage wall
times.  The dedup/decontam/split/mix plans are shuffle-light by design;
this probe measures whether any stage grows superlinearly in practice.

The 10x corpus is generated deterministically (seed 42) to match the
sf0.1 documents table's shape: per-language vocabulary and token-length
distribution are LEARNED from sf0.1 itself, the lang/source mix is kept,
and dup structure is injected (2% exact duplicates, 3% near duplicates
with a few token substitutions) so the dedup stages have real work at
both scales.  No external data.

Usage: python scripts/curate_scale_probe.py
Env: PROBE_CPUS (default 32), PROBE_MULT (default 10).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("PROBE_CPUS", "32"))
MULT = int(os.environ.get("PROBE_MULT", "10"))
SF01 = "/root/testdata/sf0.1/documents.parquet"
WORK = "/tmp/curate_probe"


def gen_10x(out_path: str) -> int:
    """Deterministic 10x documents corpus shaped like sf0.1."""
    import duckdb

    con = duckdb.connect()
    base = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{SF01}'").df()
    vocab = {}
    tok_lens = {}
    for lang, grp in base.groupby("lang"):
        toks = [t for txt in grp["text"] for t in txt.split()]
        vocab[lang] = sorted(set(toks))
        tok_lens[lang] = np.array([len(t.split()) for t in grp["text"]])
    mix = base.groupby(["lang", "source"]).size()
    total = len(base)
    rng = np.random.default_rng(42)
    rows = []
    doc_id = 0
    for (lang, source), cnt in mix.items():
        v = vocab[lang]
        lens = tok_lens[lang]
        for _ in range(int(cnt) * MULT):
            n = int(rng.choice(lens))
            words = rng.choice(v, size=n)
            text = " ".join(words)
            rows.append((doc_id, text, lang, source, len(text)))
            doc_id += 1
    # dup structure: 2% exact copies, 3% near copies (3 tokens swapped)
    n_docs = len(rows)
    for src in rng.choice(n_docs, size=n_docs // 50, replace=False):
        _, text, lang, source, _ = rows[int(src)]
        rows.append((doc_id, text, lang, source, len(text)))
        doc_id += 1
    for src in rng.choice(n_docs, size=3 * n_docs // 100, replace=False):
        _, text, lang, source, _ = rows[int(src)]
        toks = text.split()
        for _ in range(3):
            toks[int(rng.integers(len(toks)))] = str(
                rng.choice(vocab[lang]))
        t2 = " ".join(toks)
        rows.append((doc_id, t2, lang, source, len(t2)))
        doc_id += 1
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                      "n_chars"])
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   out_path)
    return len(pdf)


def run_curate(tag: str, input_path: str) -> dict:
    wd = os.path.join(WORK, f"work_{tag}")
    shutil.rmtree(wd, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(CPUS))
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "curate_corpus.py"),
         "--input", input_path, "--workdir", wd,
         # the synthetic vocab is tiny (~30 words/lang), so default
         # 3-shingle decontamination collides everything by chance and
         # zeroes the tail stages; longer shingles + higher overlap keep
         # survival realistic at BOTH scales (same knobs both legs)
         "--shingle-k", "6", "--min-overlap", "4"],
        capture_output=True, text=True, cwd=REPO, env=env)
    wall = round(time.time() - t0, 2)
    for line in p.stdout.splitlines():
        if line.startswith("CURATE_RESULT "):
            m = json.loads(line[len("CURATE_RESULT "):])
            m["tag"] = tag
            m["subprocess_wall"] = wall
            return m
    raise RuntimeError(f"curate {tag} failed rc={p.returncode}: "
                       f"{p.stderr[-1500:]}")


def main() -> int:
    big = os.path.join(WORK, "sf1_docs", "documents.parquet")
    n_big = gen_10x(big)
    base = run_curate("sf0.1", SF01)
    big_m = run_curate("10x", big)
    stages = {}
    for name, st in base["stages"].items():
        stages[name] = {"sf0.1_s": st["wall_sec"],
                        "sf0.1_rows": st["rows"]}
    for name, st in big_m["stages"].items():
        e = stages.setdefault(name, {})
        e["10x_s"] = st["wall_sec"]
        e["10x_rows"] = st["rows"]
        if e.get("sf0.1_s"):
            e["wall_ratio"] = round(st["wall_sec"] / e["sf0.1_s"], 2)
            e["rows_ratio"] = round(st["rows"] / max(e["sf0.1_rows"], 1), 2)
    print(json.dumps({"n_10x_docs": n_big, "cpus": CPUS,
                      "stages": stages,
                      "total_sf0.1_s": base["subprocess_wall"],
                      "total_10x_s": big_m["subprocess_wall"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
