"""Blocked all-pairs DTW distance matrix over a DataFrame of series.

The reference's central relational operator (distance_matrix,
dtw.py:725-828) is a triangular theta self-join with an expensive
per-pair kernel; its own distribution primitive is the rectangular
``block`` (dtw.py:757-761, intended "to distribute the computations over
multiple nodes", README.md:191-193).  Here the block becomes the Spark
unit of work:

1. series get dense indices and a chunk id ``ci = i // chunk_size``;
2. the *pair space* is pruned declaratively: only chunk pairs
   ``ci <= cj`` (triangular symmetry) that intersect the requested block
   survive — this is partition pruning over the pair space, done before
   any data moves;
3. each surviving chunk pair becomes one ``applyInPandas`` group whose
   kernel computes its intra-block pairs with the batched anti-diagonal
   DP (kernels/dtw.py), LB_Keogh-prefiltered when max_dist is set;
4. output is the long-format ``(i, j, d)`` DataFrame — the "condensed"
   matrix is just this table ordered row-major; a full numpy matrix is
   materialized only driver-side for small n.

Scale properties: data duplication per chunk is O(n/chunk_size) (the
unavoidable all-pairs fan-out), shuffle is keyed by (ci, cj) which is
uniformly distributed by construction, and within a task pairs of equal
length are batch-vectorized so Python overhead is amortized over
thousands of pairs per numpy call.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..kernels.dtw import DtwSettings, dtw_distance_batch, lb_keogh_batch
from ..resources import track_broadcast, track_persist

PAIR_SCHEMA = "i long, j long, d double"


def _series_np(v) -> np.ndarray:
    """Arrow→numpy for a series cell: 1-D array<double> or 2-D
    array<array<double>> (ndim series arrive as object arrays of rows)."""
    a = np.asarray(v)
    if a.dtype == object:
        a = np.stack([np.asarray(x, dtype=np.float64) for x in v])
    return a.astype(np.float64, copy=False)


def with_index(series_df: DataFrame, order_col: str = "series_id",
               index_col: str = "i", num_partitions: Optional[int] = None,
               persist: bool = True, ordered: bool = True) -> DataFrame:
    """Assign dense 0-based indices by ``order_col`` ordering — two-pass
    per-partition offset scheme, no single-partition exchange.

    Pass 1: range-repartition by ``order_col`` (globally ordered partition
    ranges), sort within partitions, persist, and collect the tiny
    per-partition row counts.  Pass 2: a ``mapInPandas`` running counter
    plus the broadcast cumulative offsets yields the dense global index.
    Every stage is parallel; the only driver data is one count per
    partition.  (Replaces the round-1 global ``row_number()`` that
    serialized the whole corpus through one task.)

    ``ordered=False`` skips the range exchange and sort entirely and
    indexes rows in the input's existing partition layout — still dense
    and stable for a deterministic upstream plan, but in no particular
    ``order_col`` order.  Use it when the index only needs to be a dense
    handle (e.g. symmetric all-pairs jobs that join names back at the
    end): it removes the range-partitioner sampling pass (which re-executes
    the upstream plan) and the sort.
    """
    spark = series_df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if ordered:
        # Persist the INPUT before the range exchange: repartitionByRange
        # runs a sampling pass that otherwise re-executes the entire
        # upstream plan once just to pick boundaries, and the exchange
        # itself executes it a second time (r6: measured 29 s -> ~10 s
        # for the 15k-series 10x corpus whose upstream is the full
        # rollup -> gap-fill -> arrays pipeline).  Both passes now read
        # the cache; release_all() frees it with every other handle.
        if persist:
            series_df = track_persist(series_df.persist())
        part = (series_df
                .repartitionByRange(num_partitions, F.col(order_col))
                .sortWithinPartitions(order_col)
                .withColumn("__pid", F.spark_partition_id()))
    else:
        part = series_df.withColumn("__pid", F.spark_partition_id())
    if persist:
        part = track_persist(part.persist())
    counts = {r["__pid"]: r["cnt"] for r in
              part.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = part.drop("__pid").schema.add(index_col, "long")
    in_names = [f.name for f in part.schema.fields]
    pid_pos = in_names.index("__pid")
    keep_pos = [k for k, name in enumerate(in_names) if name != "__pid"]
    out_names = [in_names[k] for k in keep_pos] + [index_col]

    def assign(batches):
        # mapInArrow, not mapInPandas: the job only appends a counter
        # column, and an Arrow->pandas->Arrow roundtrip would rebuild
        # every array<double> series cell as per-row Python objects
        # (r6: measured ~15 s of pure conversion on the 15k x 504
        # 10x corpus); record batches pass through zero-copy instead.
        import pyarrow as pa

        seen = 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            base = offsets[int(rb.column(pid_pos)[0].as_py())]
            idx = pa.array(np.arange(base + seen, base + seen + rb.num_rows,
                                     dtype=np.int64), type=pa.int64())
            seen += rb.num_rows
            yield pa.RecordBatch.from_arrays(
                [rb.column(k) for k in keep_pos] + [idx], names=out_names)

    return part.mapInArrow(assign, schema=out_schema)


def _norm_block(block) -> Tuple[Optional[tuple], bool]:
    if block is None or block == 0:
        return None, True
    triu = True
    if len(block) > 2 and block[2] is False:
        triu = False
    return ((int(block[0][0]), int(block[0][1])),
            (int(block[1][0]), int(block[1][1]))), triu


_CORPUS_CACHE: dict = {}


def _corpus_matrix(values_by_idx: dict):
    """(ids, V, pos) for an equal-length 1-D corpus dict, or None.

    Cached per dict identity: the broadcast path hands every task in a
    worker the SAME broadcast-held dict, so the (n, L) stack is built
    once per worker instead of once per task.  The cache holds a strong
    reference to the dict, which also keeps id() stable."""
    key = id(values_by_idx)
    hit = _CORPUS_CACHE.get(key)
    if hit is not None and hit[0] is values_by_idx:
        return hit[1]
    first = next(iter(values_by_idx.values()), None)
    if first is None or np.asarray(first).ndim != 1:
        res = None
    else:
        L = len(first)
        arrs = list(values_by_idx.values())
        if any(a.ndim != 1 or len(a) != L for a in arrs):
            res = None
        else:
            ids = np.fromiter(values_by_idx.keys(), dtype=np.int64,
                              count=len(values_by_idx))
            order = np.argsort(ids)
            ids = ids[order]
            V = np.empty((len(ids), L), dtype=np.float64)
            for row, k in enumerate(order):
                V[row] = arrs[k]
            res = (ids, V)
    if len(_CORPUS_CACHE) > 4:
        _CORPUS_CACHE.clear()
    _CORPUS_CACHE[key] = (values_by_idx, res)
    return res


def _compute_pairs(left: np.ndarray, right_idx: np.ndarray,
                   values_by_idx: dict, settings: DtwSettings,
                   max_buf_elems: int = 8_000_000):
    """Compute DTW for explicit (i, j) index pairs, batching equal-shape
    pairs through the vectorized kernel.

    Batch size is bounded by the DP working set — three (B, r+1) diagonal
    buffers plus the two (B, len) input stacks — NOT by r·c (the full
    cost matrix is never materialized); ~8M doubles ≈ 64 MB per buffer
    keeps thousands of moderate-length pairs in one vectorized sweep.

    Equal-length 1-D corpora without an LB prefilter skip the per-batch
    stacking entirely: the indexed kernel entry reads series rows from
    one shared (n, L) matrix (built once per worker), so no input bytes
    are copied per pair.  Results are identical either way."""
    use_lb_ = settings.max_dist is not None and settings.max_dist > 0
    if not use_lb_ and len(left):
        corpus = _corpus_matrix(values_by_idx)
        if corpus is not None:
            from ..kernels.dtw import dtw_distance_batch_indexed
            ids, V = corpus
            pi = np.searchsorted(ids, left)
            pj = np.searchsorted(ids, right_idx)
            d = dtw_distance_batch_indexed(V, pi, pj, settings=settings)
            return (np.asarray(left, dtype=np.int64),
                    np.asarray(right_idx, dtype=np.int64), d)
    out_i, out_j, out_d = [], [], []
    lens = {i: len(values_by_idx[i]) for i in values_by_idx}
    byshape: dict = {}
    for i, j in zip(left, right_idx):
        byshape.setdefault((lens[i], lens[j]), []).append((i, j))
    use_lb = settings.max_dist is not None and settings.max_dist > 0
    for (l1, l2), pairs in byshape.items():
        pairs = np.asarray(pairs, dtype=np.int64)
        # slice at the kernel's own cache-optimal batch size so each
        # np.stack copy is a few MB (reused heap), never tens of MB
        from ..kernels.dtw import _batch_elems
        bmax = max(64, _batch_elems() // (l1 + l2 + 1))
        for s in range(0, len(pairs), bmax):
            chunk = pairs[s:s + bmax]
            X1 = np.stack([values_by_idx[i] for i in chunk[:, 0]])
            X2 = np.stack([values_by_idx[j] for j in chunk[:, 1]])
            if use_lb and l1 == l2 and X1.ndim == 2:
                lb = lb_keogh_batch(X1, X2, window=settings.window,
                                    inner_dist=settings.inner_dist)
                todo = lb <= settings.max_dist
            else:
                todo = None
            if todo is None or todo.all():
                d = dtw_distance_batch(X1, X2, settings=settings)
            else:
                d = np.full(len(chunk), np.inf)
                if todo.any():
                    d[todo] = dtw_distance_batch(X1[todo], X2[todo],
                                                 settings=settings)
            out_i.append(chunk[:, 0])
            out_j.append(chunk[:, 1])
            out_d.append(d)
    if not out_i:
        return (np.array([], np.int64),) * 2 + (np.array([], np.float64),)
    return np.concatenate(out_i), np.concatenate(out_j), np.concatenate(out_d)


def distance_matrix(series_df: DataFrame, settings: Optional[DtwSettings] = None,
                    block=None, chunk_size: Optional[int] = None,
                    index_col: str = "i", values_col: str = "values",
                    **kwargs) -> DataFrame:
    """All-pairs DTW distances → long DataFrame ``(i, j, d)``.

    ``block=((rb,re),(cb,ce)[,triu])`` follows reference semantics
    (dtw.py:730, :757-761): with triu (default) only pairs ``i<j`` inside
    the block are produced; with ``triu=False`` the full rectangle.

    ``chunk_size=None`` sizes chunks so the pair space yields ≈8 groups
    per core — enough units for the scheduler to balance the quadratic
    per-group cost, while keeping series replication (one copy per
    partner chunk) low.
    """
    s = settings if settings is not None else DtwSettings(**kwargs)
    blk, triu = _norm_block(block)
    settings_json = s.to_json()

    src = series_df.select(F.col(index_col).cast("long").alias("i"),
                           F.col(values_col).alias("values"))
    if blk is not None:
        (rb, re_), (cb, ce) = blk
        src = src.where(
            ((F.col("i") >= rb) & (F.col("i") < re_)) |
            ((F.col("i") >= cb) & (F.col("i") < ce)))

    # Persist BEFORE the single stats pass: the upstream plan (often the
    # whole rollup → gap-fill → arrays pipeline) must execute exactly
    # once — round 1 executed it twice (stats agg + broadcast collect),
    # which showed up as a large serial component in the N-vs-4N curve.
    src = track_persist(src.persist())
    stats = src.agg(F.count("*").alias("n"),
                    F.avg(F.size("values")).alias("alen"),
                    F.max("i").alias("imax")).collect()[0]
    n_total = int(stats["n"] or 0)
    est_bytes = n_total * float(stats["alen"] or 0) * 8
    conf = series_df.sparkSession.conf
    max_bytes = float(conf.get("spark.dtaidistance.broadcastMatrixMaxBytes",
                               str(256 * 1024 * 1024)))
    # The pair cap only bounds per-task OUTPUT batches (ranges split as
    # n_pairs/(4·par); rows stream out as Arrow batches), not memory held
    # — the corpus-bytes gate above is the real memory guard.  r6: raised
    # 20M → 4B after the driver's sf1.0 leg (15k series, 112.5M pairs,
    # corpus 60 MB) fell off the broadcast path and paid the blocked
    # shuffle's series replication + groupBy skew for no reason; pair
    # ranges stream their output, so even a 4B-pair job holds only one
    # Arrow batch per task at a time, and corpora too big to broadcast
    # (the real constraint) still take the shuffle path via the bytes
    # gate — e.g. a 3x-escalated corpus is ~1.01B pairs at 181 MB, still
    # broadcastable, while ~5x trips the 256 MB bytes gate first.
    max_pairs = int(conf.get("spark.dtaidistance.broadcastMatrixMaxPairs",
                             str(4_000_000_000)))
    # Physical strategy switch: when the whole series set fits in
    # executor memory, broadcast it and shuffle ONLY pair-range tasks —
    # the all-pairs fan-out otherwise replicates every series to
    # ~n/chunk_size partner groups through the shuffle (the dominant
    # non-kernel cost at bench scale).  Large corpora take the blocked
    # shuffle path below, which scales to data that cannot be broadcast.
    if est_bytes <= max_bytes and n_total * (n_total - 1) // 2 <= max_pairs:
        return _distance_matrix_broadcast(src, s, blk, triu, settings_json)

    par = series_df.sparkSession.sparkContext.defaultParallelism
    # the broadcast-join fan-out below multiplies each row ~n/chunk_size
    # times in the map stage — that write must come from enough tasks
    if src.rdd.getNumPartitions() < max(2, par // 2):
        src = src.repartition(par)
    if chunk_size is None:
        n = int(stats["imax"]) + 1 if stats["imax"] is not None else 1
        n_chunks = max(1, int(np.ceil(np.sqrt(16.0 * par))))
        chunk_size = max(8, -(-n // n_chunks))
    tagged = _chunk_pair_tagged(src, chunk_size, triu, blk, ["values"], par)

    rb_, re__, cb_, ce_ = (-1, -1, -1, -1)
    if blk is not None:
        (rb_, re__), (cb_, ce_) = blk

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        st = DtwSettings.from_json(settings_json)
        rows_l = pdf[pdf["side"] == 0]
        rows_r = pdf[pdf["side"] == 1]
        vals = {}
        for r in pdf.itertuples(index=False):
            if r.i not in vals:
                vals[r.i] = _series_np(r.values)
        li = np.sort(rows_l["i"].unique())
        rj = np.sort(rows_r["i"].unique())
        ii, jj = np.meshgrid(li, rj, indexing="ij")
        ii, jj = ii.ravel(), jj.ravel()
        if triu:
            keep = ii < jj
            ii, jj = ii[keep], jj[keep]
        if rb_ >= 0:
            keep = ((ii >= rb_) & (ii < re__) & (jj >= cb_) & (jj < ce_))
            ii, jj = ii[keep], jj[keep]
        oi, oj, od = _compute_pairs(ii, jj, vals, st)
        return pd.DataFrame({"i": oi, "j": oj, "d": od})

    return tagged.groupBy("ci", "cj").applyInPandas(compute, schema=PAIR_SCHEMA)


def _chunk_pair_tagged(src: DataFrame, chunk_size: int, triu: bool, blk,
                       data_cols: list, par: int) -> DataFrame:
    """Shared chunked-shuffle plan: assign chunk ids, prune the chunk-pair
    space declaratively (triangular symmetry + block restriction — the
    reference's own distribution primitive, dtw.py:757-761), replicate
    each row to its surviving partner chunks, and hash-repartition on the
    group key.  Callers groupBy("ci","cj") and apply their kernel.

    The explicit repartition matters: the UDF stage's cost is CPU
    (quadratic pairs per group), not bytes — AQE's byte-based partition
    coalescing must not shrink its parallelism (observed 3×32 cores idle
    when it did).  groupBy reuses this partitioning, and AQE leaves
    user-specified repartitioning alone.

    Chunk ids (r5, VERDICT r4 item 4): ragged corpora get LENGTH-
    balanced chunks so each chunk holds ~equal total series length and
    the quadratic per-group cost stays ~equal under power-law lengths.
    Scale shape: one parallel histogram aggregate over fine id-range
    buckets (≤64k rows to the driver — never a single-partition window
    or a full-id collect), driver prefix-sums it into bucket→chunk
    boundaries, broadcast-joined back.  Chunk ids stay monotone in
    ``i``, so the triangular chunk-pair pruning below stays exact.
    Equal-length corpora keep the plain ``i // chunk_size`` projection
    (no extra jobs); block restriction keeps fixed-size chunks (its
    pruning arithmetic indexes chunks by ``id // chunk_size``)."""
    len_col = F.size(data_cols[0])
    probe = None
    if os.environ.get("DTW_COST_GUIDED", "1") == "1" and blk is None:
        # ONE combined aggregate decides raggedness AND feeds the
        # histogram bounds — previously this was two extra full scans
        probe = src.agg(
            (F.min(len_col) != F.max(len_col)).alias("r"),
            F.min("i"), F.max("i"), F.sum(len_col),
            F.count("*")).collect()[0]
    ragged = bool(probe and probe["r"])
    if ragged:
        _, imin, imax, tot, n_rows = probe
        n_chunks = max(1, -(-int(n_rows) // chunk_size))
        nb = min(max(n_chunks * 64, 256), 65536)
        span = int(imax) - int(imin) + 1
        bexpr = ((F.col("i") - F.lit(int(imin))) * nb / span).cast("long")
        hist = sorted(src.groupBy(bexpr.alias("b"))
                      .agg(F.sum(len_col).alias("s")).collect())
        target = max(1.0, float(tot) / n_chunks)
        cum = 0
        mapping = []
        for r in hist:
            # chunk from the length mass BEFORE the bucket: monotone
            # nondecreasing in b, hence in i
            mapping.append((int(r["b"]),
                            min(int(cum / target), n_chunks - 1)))
            cum += int(r["s"])
        mdf = src.sparkSession.createDataFrame(mapping, "b long, chunk long")
        src = src.withColumn("b", bexpr) \
                 .join(F.broadcast(mdf), "b").drop("b")
    else:
        src = src.withColumn("chunk", (F.col("i") / chunk_size).cast("long"))
    chunks = src.select("chunk").distinct()
    ca = chunks.select(F.col("chunk").alias("ci"))
    cb_df = chunks.select(F.col("chunk").alias("cj"))
    cp = ca.crossJoin(cb_df)
    if triu:
        cp = cp.where(F.col("ci") <= F.col("cj"))
    if blk is not None:
        (rb, re_), (cb, ce) = blk
        cp = cp.where(
            (F.col("ci") >= rb // chunk_size) & (F.col("ci") <= (re_ - 1) // chunk_size) &
            (F.col("cj") >= cb // chunk_size) & (F.col("cj") <= (ce - 1) // chunk_size))
    left = src.join(F.broadcast(cp), src["chunk"] == cp["ci"]) \
              .select("ci", "cj", F.lit(0).alias("side"), "i", *data_cols)
    right = src.join(F.broadcast(cp), src["chunk"] == cp["cj"]) \
               .select("ci", "cj", F.lit(1).alias("side"), "i", *data_cols)
    return left.unionByName(right).repartition(4 * par, "ci", "cj")


def _triu_unrank(p: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form unranking of row-major upper-triangular pair indices:
    linear position ``p`` in [0, n(n-1)/2) → (row, col) with row<col.
    Inverse of :func:`condensed_index`; float64-exact for n < 2^26, with
    an integer correction step for boundary round-off."""
    p = np.asarray(p, dtype=np.int64)
    b = 2 * n - 1
    i = np.floor((b - np.sqrt(b * b - 8.0 * p)) / 2).astype(np.int64)
    # correct float round-off at range boundaries
    start = lambda r: r * n - r * (r + 1) // 2
    i = np.where(start(i + 1) <= p, i + 1, i)
    i = np.where(start(i) > p, i - 1, i)
    j = p - start(i) + i + 1
    return i, j


def _guided_ranges(n_pairs: int, par: int) -> list:
    """Guided-schedule pair ranges (the reference's OMP ``guided``
    distribution for its matrix loop, dtw.py:681 ``schedule(guided)``,
    re-expressed for Spark's task scheduler): range k covers
    ``remaining // (2·par)`` pairs with a floor, so early tasks are big
    (low fixed cost) and the final wave is fine-grained — on a host
    where identical tasks spread 5× (neighbor contention), the tail
    straggler holds at most a small chunk instead of 1/(4·par) of the
    whole job.  Profiled 32-way on the 1.124M-pair bench corpus: equal
    128-range schedule idles ~30% of core-seconds in the decay tail
    (concurrency 32 → 2 over the last third of the wall)."""
    ranges = []
    lo = 0
    floor = max(1, -(-n_pairs // (par * 24)))
    while lo < n_pairs:
        # r6: first-wave divisor 2·par -> 4·par.  A range task's fixed
        # cost is one Arrow iterator + broadcast access (~ms), so the
        # "big first tasks" motivation barely applies, while at the
        # sf1.0 scale a 2·par first wave made single tasks ~40 s — any
        # one slowed worker (GC burst, cpufreq dip) stretched the whole
        # job by most of a wave.  Halving the wave size halves the
        # worst-case straggler exposure; outputs are identical (same
        # pairs, different task boundaries).
        # ceil like the cost-weighted twin's binary search, so the two
        # schedules coincide exactly on equal-length corpora
        size = max(floor, -(-(n_pairs - lo) // (4 * par)))
        hi = min(n_pairs, lo + size)
        ranges.append((lo, hi))
        lo = hi
    return ranges


def _guided_ranges_cost(cost_upto, n_pairs: int, total: float,
                        par: int) -> list:
    """Cost-weighted guided pair ranges (VERDICT r4 item 4): the same
    guided decay as :func:`_guided_ranges`, but measured in estimated
    kernel cost rather than pair count.  A DTW pair costs
    O(len_i · len_j); for the equal-length bench corpus count == cost
    and the two schedules coincide, but for a power-law ragged corpus
    (real conversation lengths) an early count-based range can hold
    10-100x the work of a late one, defeating the guided tail — the
    reference's OMP loop shares the concern (its guided schedule also
    decays in *pair count*, dd_dtw_openmp.c:111-116; we can do better
    because the driver knows every length upfront).

    ``cost_upto(p)`` must return the closed-form cumulative cost of the
    first ``p`` pairs of the linear pair space; boundaries are found by
    binary search on it, so nothing O(n²) is materialized.  Outputs are
    a partition of [0, n_pairs) — the kernel computes the same pairs in
    the same per-task order, so results are bit-identical to any other
    schedule."""
    ranges = []
    lo = 0
    cost_lo = 0.0
    floor_c = max(total / n_pairs, total / (par * 24))
    while lo < n_pairs:
        # same 4·par first wave as _guided_ranges (r6) — see note there
        want = cost_lo + max(floor_c, (total - cost_lo) / (4 * par))
        if want >= total:
            hi = n_pairs
        else:
            a, b = lo + 1, n_pairs
            while a < b:
                mid = (a + b) // 2
                if cost_upto(mid) >= want:
                    b = mid
                else:
                    a = mid + 1
            hi = a
        ranges.append((lo, hi))
        cost_lo = cost_upto(hi)
        lo = hi
    return ranges


def _triu_cost_fn(lens: np.ndarray):
    """(cost_upto, total) for the row-major upper-triangular pair space
    over series with the given lengths (in unranked-id order)."""
    n = len(lens)
    L = np.asarray(lens, dtype=np.float64)
    P = np.concatenate([[0.0], np.cumsum(L)])          # prefix len sums
    row_cost = L[:n - 1] * (P[n] - P[1:n])             # rows 0..n-2
    cumrow = np.concatenate([[0.0], np.cumsum(row_cost)])
    n_pairs = n * (n - 1) // 2
    total = float(cumrow[-1])

    def cost_upto(p: int) -> float:
        if p <= 0:
            return 0.0
        if p >= n_pairs:
            return total
        r, j = _triu_unrank(np.array([p], dtype=np.int64), n)
        r, j = int(r[0]), int(j[0])
        # pairs before p: rows < r complete, plus (r, r+1..j-1)
        return float(cumrow[r] + L[r] * (P[j] - P[r + 1]))

    return cost_upto, total


def _rect_cost_fn(row_lens: np.ndarray, col_lens: np.ndarray):
    """(cost_upto, total) for the rectangular (block) pair space with
    linear order p -> (rows[p // C], cols[p % C])."""
    Lr = np.asarray(row_lens, dtype=np.float64)
    Lc = np.asarray(col_lens, dtype=np.float64)
    Pc = np.concatenate([[0.0], np.cumsum(Lc)])
    sum_c = float(Pc[-1])
    cumrow = np.concatenate([[0.0], np.cumsum(Lr * sum_c)])
    C = len(Lc)
    n_pairs = len(Lr) * C
    total = float(cumrow[-1])

    def cost_upto(p: int) -> float:
        if p <= 0:
            return 0.0
        if p >= n_pairs:
            return total
        r, k = p // C, p % C
        return float(cumrow[r] + Lr[r] * Pc[k])

    return cost_upto, total


def _collect_series_dict(src: DataFrame) -> dict:
    """Collect ``(i, values)`` to a {id: float64 array} dict.

    Flat ``array<double>`` corpora go through ``DataFrame.toArrow()``:
    the list column arrives as ONE contiguous values buffer + offsets,
    and each series becomes a numpy slice view of it — no per-row
    Python objects (r6: ``toPandas`` rebuilt every cell as an object
    array; at 15k x 504 that conversion dwarfed the driver collect
    itself).  Nested (n-D) series keep the pandas path."""
    vtype = src.schema["values"].dataType
    flat = (vtype.typeName() == "array"
            and vtype.elementType.typeName() == "double")
    if flat:
        tb = src.select("i", "values").toArrow()
        ids = tb.column("i").to_numpy()
        va = tb.column("values").combine_chunks()
        if va.null_count == 0 and va.values.null_count == 0:
            off = va.offsets.to_numpy()
            buf = va.values.to_numpy()
            return {int(ids[k]): buf[off[k]:off[k + 1]]
                    for k in range(len(ids))}
    pdf = src.toPandas()
    return {int(i): _series_np(v)
            for i, v in zip(pdf["i"], pdf["values"])}


def _distance_matrix_broadcast(src: DataFrame, s: DtwSettings, blk, triu,
                               settings_json: str) -> DataFrame:
    """Broadcast-corpus physical strategy: series dict broadcast once,
    work distributed as (lo, hi) pair-range tasks over the triangular
    pair space.  Pair (i, j) coordinates are derived from the linear
    range by closed-form unranking INSIDE each task — the driver never
    materializes or broadcasts the O(n²) pair lists, only the O(n)
    series ids."""
    spark = src.sparkSession
    vals = _collect_series_dict(src)
    ids = np.array(sorted(vals), dtype=np.int64)
    bc = track_broadcast(spark.sparkContext.broadcast(vals))
    par = spark.sparkContext.defaultParallelism
    n_tasks = max(par * 4, 8)

    n_ids = len(ids)
    if blk is None:
        n_pairs = n_ids * (n_ids - 1) // 2
        rows_b = cols_b = None
    else:
        (rb, re_), (cb, ce) = blk
        rows = ids[(ids >= rb) & (ids < re_)]
        cols = ids[(ids >= cb) & (ids < ce)]
        n_pairs = len(rows) * len(cols)
        rows_b = track_broadcast(spark.sparkContext.broadcast(rows))
        cols_b = track_broadcast(spark.sparkContext.broadcast(cols))
    if n_pairs == 0:
        return spark.createDataFrame([], PAIR_SCHEMA)
    if os.environ.get("DTW_GUIDED", "1") == "1":
        # one range per partition, IN ORDER (big ranges first): Spark
        # launches tasks by partition index as slots free, which is
        # exactly OMP guided scheduling.  parallelize(n items, n slices)
        # keeps the order; .repartition() would round-robin it away.
        # Ragged corpora (unequal series lengths) get COST-weighted
        # boundaries — len_i·len_j, the DTW kernel's actual work — so a
        # power-law length distribution cannot hide 100x the work in an
        # early "equal-count" range (r5; DTW_COST_GUIDED=0 reverts to
        # count-weighted for A/B).  Equal lengths: identical schedule.
        lens = np.array([vals[int(i)].shape[0] for i in ids],
                        dtype=np.int64)
        ragged = lens.min() != lens.max() \
            and os.environ.get("DTW_COST_GUIDED", "1") == "1"
        if ragged and blk is None:
            cost_upto, total = _triu_cost_fn(lens)
            ranges = _guided_ranges_cost(cost_upto, n_pairs, total, par)
        elif ragged:
            pos = {int(v): k for k, v in enumerate(ids)}
            cost_upto, total = _rect_cost_fn(
                lens[[pos[int(r)] for r in rows]],
                lens[[pos[int(c)] for c in cols]])
            ranges = _guided_ranges_cost(cost_upto, n_pairs, total, par)
        else:
            ranges = _guided_ranges(n_pairs, par)
        rdf = spark.createDataFrame(
            spark.sparkContext.parallelize(ranges, len(ranges)),
            "lo long, hi long")
    else:
        bounds = np.linspace(0, n_pairs, min(n_tasks, n_pairs) + 1,
                             dtype=np.int64)
        ranges = [(int(bounds[k]), int(bounds[k + 1]))
                  for k in range(len(bounds) - 1) if bounds[k] < bounds[k + 1]]
        rdf = spark.createDataFrame(ranges, "lo long, hi long") \
            .repartition(len(ranges))
    ids_b = track_broadcast(spark.sparkContext.broadcast(ids))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = DtwSettings.from_json(settings_json)
        v = bc.value
        for pdf_ in batches:
            for row in pdf_.itertuples(index=False):
                p = np.arange(row.lo, row.hi, dtype=np.int64)
                if blk is None:
                    ri, rj = _triu_unrank(p, n_ids)
                    ii, jj = ids_b.value[ri], ids_b.value[rj]
                else:
                    rr, cc = rows_b.value, cols_b.value
                    ii = rr[p // len(cc)]
                    jj = cc[p % len(cc)]
                    if triu:
                        keep = ii < jj
                        ii, jj = ii[keep], jj[keep]
                oi, oj, od = _compute_pairs(ii, jj, v, st)
                yield pd.DataFrame({"i": oi, "j": oj, "d": od})

    return rdf.mapInPandas(compute, schema=PAIR_SCHEMA)


def distance_matrix_weighted(series_df: DataFrame, window: Optional[int] = None,
                             index_col: str = "i", values_col: str = "values",
                             weights_col: str = "weights") -> DataFrame:
    """All-pairs *weighted* DTW (reference dtw_weighted.py:121-152
    distance_matrix): per-point 8-knot weight profiles reshape the local
    difference of the row series.  The per-pair kernel is
    kernels/extras.weighted_warping_paths.  Like the reference (triu
    only, matrix[i,j] uses weights[i]), the output is asymmetric in
    principle and only i<j pairs are produced.

    Physical strategy mirrors :func:`distance_matrix`: when the corpus
    (values + 8-knot weight profiles ≈ 9 doubles/point) fits under the
    broadcast gate, it is collected once and work distributes as pair-
    range tasks; otherwise the blocked chunk-pair shuffle path runs —
    no ungated driver collect at any size."""
    from ..kernels.extras import weighted_warping_paths

    spark = series_df.sparkSession
    src = series_df.select(F.col(index_col).cast("long").alias("i"),
                           F.col(values_col).alias("values"),
                           F.col(weights_col).alias("weights"))
    src = track_persist(src.persist())
    stats = src.agg(F.count("*").alias("n"),
                    F.avg(F.size("values")).alias("alen"),
                    F.max("i").alias("imax")).collect()[0]
    n_total = int(stats["n"] or 0)
    # values (1 double/point) + weight profile (8 knots/point)
    est_bytes = n_total * float(stats["alen"] or 0) * 8 * 9
    conf = spark.conf
    max_bytes = float(conf.get("spark.dtaidistance.broadcastMatrixMaxBytes",
                               str(256 * 1024 * 1024)))
    max_pairs = int(conf.get("spark.dtaidistance.broadcastMatrixMaxPairs",
                             str(20_000_000)))
    if est_bytes > max_bytes or n_total * (n_total - 1) // 2 > max_pairs:
        return _distance_matrix_weighted_shuffle(src, window, stats)
    pdf = src.toPandas()
    vals = {int(r.i): np.asarray(r[1], dtype=np.float64)
            for r in pdf.itertuples(index=False)}
    wts = {int(r.i): (None if r[2] is None else np.asarray(
        [list(x) for x in r[2]], dtype=np.float64))
        for r in pdf.itertuples(index=False)}
    ids = np.array(sorted(vals), dtype=np.int64)
    n = len(ids)
    bc_v = track_broadcast(spark.sparkContext.broadcast(vals))
    bc_w = track_broadcast(spark.sparkContext.broadcast(wts))
    par = spark.sparkContext.defaultParallelism
    n_pairs = n * (n - 1) // 2
    if n_pairs == 0:
        return spark.createDataFrame([], PAIR_SCHEMA)
    bounds = np.linspace(0, n_pairs, min(max(par * 4, 8), n_pairs) + 1,
                         dtype=np.int64)
    ranges = [(int(bounds[k]), int(bounds[k + 1]))
              for k in range(len(bounds) - 1) if bounds[k] < bounds[k + 1]]
    rdf = spark.createDataFrame(ranges, "lo long, hi long") \
        .repartition(len(ranges))
    win = window

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v, w = bc_v.value, bc_w.value
        for pdf_ in batches:
            for row in pdf_.itertuples(index=False):
                p = np.arange(row.lo, row.hi, dtype=np.int64)
                ri, rj = _triu_unrank(p, n)
                out = [weighted_warping_paths(v[ids[a]], v[ids[b]],
                                              weights=w[ids[a]],
                                              window=win)[0]
                       for a, b in zip(ri, rj)]
                yield pd.DataFrame({"i": ids[ri], "j": ids[rj], "d": out})

    return rdf.mapInPandas(compute, schema=PAIR_SCHEMA)


def _distance_matrix_weighted_shuffle(src: DataFrame, window: Optional[int],
                                      stats) -> DataFrame:
    """Blocked chunk-pair fallback for the weighted matrix: same plan
    shape as the unweighted shuffle path (values AND weight profiles ride
    the shuffle), so corpora above the broadcast gate never hit the
    driver."""
    from ..kernels.extras import weighted_warping_paths

    spark = src.sparkSession
    par = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < max(2, par // 2):
        src = src.repartition(par)
    n = int(stats["imax"]) + 1 if stats["imax"] is not None else 1
    n_chunks = max(1, int(np.ceil(np.sqrt(16.0 * par))))
    chunk_size = max(8, -(-n // n_chunks))
    tagged = _chunk_pair_tagged(src, chunk_size, True, None,
                                ["values", "weights"], par)
    win = window

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        vals, wts = {}, {}
        for r in pdf.itertuples(index=False):
            if r.i not in vals:
                vals[r.i] = np.asarray(r.values, dtype=np.float64)
                wts[r.i] = (None if r.weights is None else np.asarray(
                    [list(x) for x in r.weights], dtype=np.float64))
        li = np.sort(pdf.loc[pdf["side"] == 0, "i"].unique())
        rj = np.sort(pdf.loc[pdf["side"] == 1, "i"].unique())
        ii, jj = np.meshgrid(li, rj, indexing="ij")
        ii, jj = ii.ravel(), jj.ravel()
        keep = ii < jj
        ii, jj = ii[keep], jj[keep]
        out = [weighted_warping_paths(vals[a], vals[b], weights=wts[a],
                                      window=win)[0]
               for a, b in zip(ii, jj)]
        return pd.DataFrame({"i": ii, "j": jj,
                             "d": np.asarray(out, dtype=np.float64)})

    return tagged.groupBy("ci", "cj").applyInPandas(compute, schema=PAIR_SCHEMA)


def distance_matrix_cross(query_df: DataFrame, corpus_df: DataFrame,
                          settings: Optional[DtwSettings] = None,
                          index_col: str = "i", values_col: str = "values",
                          **kwargs) -> DataFrame:
    """Rectangular cross-set distances (reference ``_matrices`` variant,
    dd_dtw.c:5227-5323): every query × every corpus series.  The query
    set is broadcast (it is small by assumption); the corpus streams."""
    s = settings if settings is not None else DtwSettings(**kwargs)
    settings_json = s.to_json()
    q = query_df.select(F.col(index_col).cast("long").alias("qi"),
                        F.col(values_col).alias("qvalues"))
    c = corpus_df.select(F.col(index_col).cast("long").alias("i"),
                         F.col(values_col).alias("values"))
    joined = c.crossJoin(F.broadcast(q))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = DtwSettings.from_json(settings_json)
        for pdf in batches:
            vals = {}
            out_q, out_c, out_d = [], [], []
            byshape = {}
            arrs_c = [_series_np(v) for v in pdf["values"]]
            arrs_q = [_series_np(v) for v in pdf["qvalues"]]
            for k in range(len(pdf)):
                byshape.setdefault((len(arrs_q[k]), len(arrs_c[k])), []).append(k)
            for (l1, l2), idxs in byshape.items():
                bmax = max(16, 4_000_000 // max(l1 * l2, 1))
                for sft in range(0, len(idxs), bmax):
                    sel = idxs[sft:sft + bmax]
                    X1 = np.stack([arrs_q[k] for k in sel])
                    X2 = np.stack([arrs_c[k] for k in sel])
                    d = dtw_distance_batch(X1, X2, settings=st)
                    out_q.extend(pdf["qi"].iloc[sel])
                    out_c.extend(pdf["i"].iloc[sel])
                    out_d.extend(d)
            yield pd.DataFrame({"qi": out_q, "i": out_c, "d": out_d})

    return joined.mapInPandas(compute, schema="qi long, i long, d double")


# --- driver-side assembly (small n only; reference dtw.py:831-862) ---


def condensed_index(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Closed form of the reference's distance_array_index (dtw.py:853-862):
    row-major upper-triangular position of pair (a<b) among n series."""
    a = np.minimum(a, b), np.maximum(a, b)
    lo, hi = a
    return lo * n - lo * (lo + 1) // 2 + hi - lo - 1


def to_condensed(dist_df: DataFrame, n: int) -> np.ndarray:
    """Collect the long pair table into the reference's condensed
    upper-triangular array ordering (dtw.py:865-884)."""
    pdf = dist_df.toPandas()
    out = np.full(n * (n - 1) // 2, np.inf)
    idx = condensed_index(pdf["i"].to_numpy(), pdf["j"].to_numpy(), n)
    out[idx] = pdf["d"].to_numpy()
    return out


def to_matrix(dist_df: DataFrame, n: int, only_triu: bool = False) -> np.ndarray:
    """Collect into a full n×n matrix (inf off-block, 0 diagonal unless
    only_triu — reference distances_array_to_matrix, dtw.py:831-850)."""
    pdf = dist_df.toPandas()
    m = np.full((n, n), np.inf)
    m[pdf["i"].to_numpy(), pdf["j"].to_numpy()] = pdf["d"].to_numpy()
    if not only_triu:
        m[pdf["j"].to_numpy(), pdf["i"].to_numpy()] = pdf["d"].to_numpy()
        np.fill_diagonal(m, 0.0)
    return m
