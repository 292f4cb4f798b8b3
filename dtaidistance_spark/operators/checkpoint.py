"""Checkpoint / lineage layer: idempotent, resumable stage execution.

North-rule requirement: every stage checkpoints per-partition lineage +
metrics so the pipeline resumes idempotently.  Without an Iceberg
runtime in this sandbox (SURVEY.md §7.3) the same semantics are built on
parquet + a JSON manifest per stage:

* ``run_stage(name, df_fn, base_dir, fingerprint)`` — if a manifest for
  (name, fingerprint) exists and is complete, the stage is SKIPPED and
  its parquet output is reread (resume path); otherwise the DataFrame is
  produced, written to parquet, and a manifest recorded with row count,
  per-partition row counts, an order-insensitive checksum, wall time and
  the settings fingerprint.
* the manifest is written atomically (tmp + rename) AFTER the data, so a
  crashed run never leaves a "complete" marker on partial output.

On a real deployment the parquet writes become Iceberg table commits and
the manifest becomes the snapshot summary — the call sites don't change.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_stage_manifest.json"


def _stage_dir(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, name)


def stage_metrics(df: DataFrame) -> dict:
    """Per-partition lineage: row count per spark partition + an
    order-insensitive content checksum (xor-sum of row hashes)."""
    counts = (df.withColumn("__pid", F.spark_partition_id())
              .groupBy("__pid").count().orderBy("__pid").collect())
    chk = df.select(
        F.xxhash64(F.struct(*[F.col(c) for c in df.columns])).alias("h")
    ).agg(F.expr("bit_xor(h)").alias("h")).collect()[0]["h"]
    return {
        "rows": int(sum(r["count"] for r in counts)),
        "partitions": {str(r["__pid"]): int(r["count"]) for r in counts},
        "checksum": int(chk) if chk is not None else 0,
    }


def run_stage(spark: SparkSession, name: str, df_fn: Callable[[], DataFrame],
              base_dir: str, fingerprint: str = "",
              partition_by: list[str] | None = None) -> DataFrame:
    """Execute-or-resume one pipeline stage."""
    sdir = _stage_dir(base_dir, name)
    mpath = os.path.join(sdir, MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest.get("fingerprint") == fingerprint and manifest.get("complete"):
            return spark.read.parquet(os.path.join(sdir, "data"))
    t0 = time.time()
    df = df_fn()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    data_dir = os.path.join(sdir, "data")
    writer.parquet(data_dir)
    out = spark.read.parquet(data_dir)
    metrics = stage_metrics(out)
    manifest = {
        "stage": name,
        "fingerprint": fingerprint,
        "complete": True,
        "wall_sec": round(time.time() - t0, 3),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **metrics,
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, mpath)  # atomic completion marker
    return out


def read_manifest(base_dir: str, name: str) -> dict | None:
    mpath = os.path.join(_stage_dir(base_dir, name), MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)
