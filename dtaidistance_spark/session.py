"""SparkSession builder tuned for this engine.

Local mode is the test/bench environment (one JVM, N threads); the same
configuration carries to a real cluster via spark-submit --py-files, where
``spark.sql.shuffle.partitions`` should be sized to ~2-3× total cores and
AQE re-plans at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dtaidistance_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    # one BLAS thread per python worker: task-level parallelism already
    # saturates the cores, so multi-threaded OpenBLAS inside each Arrow
    # UDF worker (this build: MAX_THREADS=2) only oversubscribes —
    # measured 1.2× on the 32-way matrix-profile dgemm leg.  Set in the
    # driver env BEFORE the JVM starts (local-mode workers inherit it)
    # and as executorEnv for real clusters.  If a JVM already exists
    # (getOrCreate reuses it), the workers inherited the OLD env and
    # the pin is ineffective — warn instead of silently losing it.
    if "OPENBLAS_NUM_THREADS" not in os.environ \
            and SparkSession.getActiveSession() is not None:
        import warnings
        warnings.warn(
            "get_spark: a SparkSession already exists; "
            "OPENBLAS_NUM_THREADS=1 cannot reach its local-mode workers "
            "(BLAS oversubscription possible in Arrow UDF kernels)",
            RuntimeWarning, stacklevel=2)
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r6: 2048 -> 16384 rows/batch, with the Spark-4 byte cap as the
        # real guard (64 MB).  2048 was sized for fat rows (504-double
        # series cells, image blobs); for the narrow (i, j, d) output of
        # the 112.5M-row all-pairs job it meant ~55k Arrow flushes of
        # 48 KB each.  The byte cap keeps fat-row batches bounded at the
        # same working set as before while narrow rows batch efficiently.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # r6: allow shuffled-hash join when its size conditions are met
        # (no sort on either side); sort-merge remains the fallback for
        # build sides AQE can't bound.  A/B at the 10x corpus: gap-fill's
        # grid join 5.2 -> 4.1 s, the 1h cascade 3.3 -> 2.3 s.  Both
        # knobs are size-gated, so a build partition that wouldn't fit
        # still takes the sort-merge path.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                str(256 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # throughput GC: G1 measured 6× slower than ParallelGC on this
        # host at 32-way task concurrency (174.7s vs 27.3s for the same
        # 35M-row rollup job); batch-analytics workloads prefer
        # throughput collectors anyway.  GC threads are pinned to the
        # requested core count — the JVM default (~23 on a 32-CPU host)
        # would let a local[4] "cluster slice" borrow extra cores during
        # GC bursts, which skews N-vs-4N scaling legs
        .config("spark.driver.extraJavaOptions",
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cores)}")
        .config("spark.executor.extraJavaOptions",
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cores)}")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS",
                os.environ["OPENBLAS_NUM_THREADS"])
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
