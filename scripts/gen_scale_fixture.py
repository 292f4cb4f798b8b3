"""Generate a LOCAL 10x-scale measurement fixture (sf1.0-shaped).

The driver's round-end bench escalates to a driver-generated sf1.0
(BENCH_r05.json: 1M events, 15k users, 112.5M DTW pairs) that is not on
disk here.  This script builds a same-shape corpus from sf0.1 by
replicating each table K times with shifted entity ids (users, docs,
vectors) and deterministic value jitter, so optimizations can be
measured at the scale the driver actually times.  MEASUREMENT ONLY —
output goes to /root/testdata_local/, is never committed, and no query
result derived from it is ever used as a correctness artifact.

Usage: python scripts/gen_scale_fixture.py [K] [out_dir]
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_local/sf1.0x"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    ev = pq.read_table(f"{SRC}/events.parquet")
    n = ev.num_rows
    parts = []
    uid = ev["user_id"].to_numpy()
    eid = ev["event_id"].to_numpy()
    val = ev["value"].to_numpy()
    umax = int(uid.max()) + 1
    emax = int(eid.max()) + 1
    for r in range(k):
        jit = rng.normal(0, 0.01, size=n) if r else np.zeros(n)
        parts.append(pa.table({
            "event_id": pa.array(eid + r * emax, pa.int64()),
            "ts": ev["ts"].combine_chunks(),
            "user_id": pa.array(uid + r * umax, pa.int64()),
            "event_type": ev["event_type"].combine_chunks(),
            "value": pa.array(val + jit, pa.float64()),
            "props": ev["props"].combine_chunks(),
        }))
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
    print(f"events: {n} -> {n * k}")

    doc = pq.read_table(f"{SRC}/documents.parquet")
    n = doc.num_rows
    did = doc["doc_id"].to_numpy()
    dmax = int(did.max()) + 1
    parts = []
    for r in range(k):
        parts.append(pa.table({
            "doc_id": pa.array(did + r * dmax, pa.int64()),
            "text": doc["text"].combine_chunks(),
            "lang": doc["lang"].combine_chunks(),
            "source": doc["source"].combine_chunks(),
            "n_chars": doc["n_chars"].combine_chunks(),
        }))
    pq.write_table(pa.concat_tables(parts), f"{out}/documents.parquet")
    print(f"documents: {n} -> {n * k}")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    n = emb.num_rows
    vid = emb["vec_id"].to_numpy()
    vmax = int(vid.max()) + 1
    vecs = np.stack(emb["embedding"].to_pandas().to_numpy())
    parts = []
    for r in range(k):
        jit = (rng.normal(0, 0.005, size=vecs.shape).astype(np.float32)
               if r else np.zeros_like(vecs))
        parts.append(pa.table({
            "vec_id": pa.array(vid + r * vmax, pa.int64()),
            "embedding": pa.array(list(vecs + jit),
                                  pa.list_(pa.float32())),
            "label": emb["label"].combine_chunks(),
        }))
    pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet")
    print(f"embeddings: {n} -> {n * k}")

    # remaining star-schema tables: copy as-is (no bench query reads them
    # at scale; presence keeps loaders happy)
    for t in ["customer", "lineitem", "nation", "orders", "part",
              "region", "supplier"]:
        src = f"{SRC}/{t}.parquet"
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), f"{out}/{t}.parquet")
    open(f"{out}/_DONE", "w").close()
    print(f"fixture at {out}")


if __name__ == "__main__":
    main()
