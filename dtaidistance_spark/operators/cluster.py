"""Clustering over DTW distances.

Split of labor (SURVEY.md §2.5): the expensive part — the all-pairs
distance matrix / assignment distances — is distributed
(operators/matrix.py); the merge loops themselves are inherently
sequential argmin scans over a small n×n matrix (n = clustered series
after rollup/downsampling), so they run driver-side exactly like the
reference (clustering/hierarchical.py:60-137).

* ``hierarchical_fit`` mirrors Hierarchical.fit semantics exactly:
  global argmin in row-major order, prototype absorbs column series,
  merged row/col set to inf ("distance to prototype", no linkage
  recomputation), stop at max_dist.
* ``hierarchical_tree`` additionally records scipy-compatible linkage
  rows with renumbered cluster ids (HierarchicalTree.fit:448-456).
* ``linkage`` is a scipy-free implementation of classic agglomerative
  linkage (complete/single/average) on the condensed matrix producing
  the (n-1)×4 Z structure of LinkageTree.fit (scipy absent in this
  environment; tie-breaking picks the row-major first minimum).
* ``kmeans_dtw`` is the Lloyd loop of clustering/kmeans.py:241-420,
  Spark-shaped: assignment = broadcast centers × corpus via
  distance_matrix_cross + window argmin; update = distributed DBA —
  map-side per-batch (sums, counts) partials per cluster
  (kernels/dtw.py::dba_partial, the associative half of the step) and
  a k × n_partitions driver reduce, so no cluster's membership ever
  has to be co-resident in one task.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..kernels.dtw import DtwSettings, dba_partial
from .matrix import distance_matrix, distance_matrix_cross, to_matrix


# ---------------------------------------------------------------------------
# driver-side merge loops (small n)
# ---------------------------------------------------------------------------


def hierarchical_fit(dists_triu: np.ndarray, max_dist: float = float("inf"),
                     merge_hook=None):
    """Reference-exact Hierarchical.fit on an upper-triangular matrix
    (inf on diagonal/lower).  Returns {prototype: set(members)}."""
    dists = dists_triu.copy()
    nb = dists.shape[0]
    cluster_idx: dict[int, set] = {}
    deleted: set[int] = set()
    min_value = np.min(dists)
    min_idx = np.argwhere(dists == min_value)[0, :] if np.isfinite(min_value) else None
    while min_idx is not None and min_value <= max_dist and not np.isinf(min_value):
        i1, i2 = int(min_idx[0]), int(min_idx[1])
        if merge_hook:
            result = merge_hook(i2, i1, float(min_value))
            if result:
                i1, i2 = result
        cluster_idx.setdefault(i1, {i1})
        if i2 in cluster_idx:
            cluster_idx[i1].update(cluster_idx[i2])
            del cluster_idx[i2]
        else:
            cluster_idx[i1].add(i2)
        dists[:i2, i2] = np.inf
        dists[i2, i2 + 1:] = np.inf
        deleted.add(i2)
        if len(deleted) == nb - 1:
            break
        min_value = np.min(dists)
        if np.isinf(min_value):
            break
        min_idx = np.argwhere(dists == min_value)[0, :]
    for i in range(nb):
        if i not in deleted:
            cluster_idx.setdefault(i, {i})
    return cluster_idx


def hierarchical_tree(dists_triu: np.ndarray):
    """Hierarchical.fit + scipy-compatible linkage recording
    (reference HierarchicalTree.fit).  Returns (linkage_rows, clusters)."""
    n = dists_triu.shape[0]
    linkage_rows: list[tuple] = []
    new_nodes = {i: i for i in range(n)}

    def merge_hook(from_idx, to_idx, distance):
        new_idx = n + len(linkage_rows)
        linkage_rows.append((new_nodes[from_idx], new_nodes[to_idx], distance, 0))
        new_nodes[to_idx] = new_idx
        new_nodes[from_idx] = None
        return None

    clusters = hierarchical_fit(dists_triu, merge_hook=merge_hook)
    return linkage_rows, clusters


def linkage(condensed: np.ndarray, n: int, method: str = "complete") -> np.ndarray:
    """Agglomerative linkage on a condensed distance array → (n-1)×4 Z
    (scipy layout: [left, right, dist, count], new cluster id = n+i)."""
    if method not in ("complete", "single", "average"):
        raise ValueError(f"unsupported method: {method}")
    # full symmetric working matrix
    d = np.full((n, n), np.inf)
    iu = np.triu_indices(n, k=1)
    d[iu] = condensed
    d[(iu[1], iu[0])] = condensed
    np.fill_diagonal(d, np.inf)
    active = list(range(n))
    ids = list(range(n))
    sizes = [1] * n
    Z = np.zeros((n - 1, 4))
    for step in range(n - 1):
        sub = d[np.ix_(active, active)]
        k = int(np.argmin(sub))
        a, b = divmod(k, len(active))
        if a > b:
            a, b = b, a
        dist = sub[a, b]
        ia, ib = active[a], active[b]
        Z[step] = (min(ids[ia], ids[ib]), max(ids[ia], ids[ib]), dist,
                   sizes[ia] + sizes[ib])
        # merged cluster replaces slot ia; update distances
        for other in active:
            if other in (ia, ib):
                continue
            if method == "complete":
                nd = max(d[ia, other], d[ib, other])
            elif method == "single":
                nd = min(d[ia, other], d[ib, other])
            else:  # average
                nd = (sizes[ia] * d[ia, other] + sizes[ib] * d[ib, other]) / (
                    sizes[ia] + sizes[ib])
            d[ia, other] = nd
            d[other, ia] = nd
        sizes[ia] = sizes[ia] + sizes[ib]
        ids[ia] = n + step
        active.remove(ib)
    return Z


def linkage_tree_fit(series_df: DataFrame, n: int,
                     settings: Optional[DtwSettings] = None,
                     method: str = "complete", **kwargs) -> np.ndarray:
    """Distributed matrix → driver-side linkage (reference
    LinkageTree.fit split per SURVEY.md §3.3)."""
    st = settings if settings is not None else DtwSettings(**kwargs)
    dist = distance_matrix(series_df, settings=st)
    m = to_matrix(dist, n, only_triu=True)
    condensed = m[np.triu_indices(n, k=1)]
    return linkage(condensed, n, method=method)


# ---------------------------------------------------------------------------
# k-means with DBA update (Spark-shaped Lloyd loop)
# ---------------------------------------------------------------------------


def kmeans_assign(series_df: DataFrame, centers: list[np.ndarray],
                  settings: DtwSettings, spark) -> DataFrame:
    """Assignment step: per-series argmin distance to the broadcast
    centers (crossJoin + window rank=1, reference kmeans.py:301-307)."""
    rows = [(int(ci), [float(x) for x in c]) for ci, c in enumerate(centers)]
    cdf = spark.createDataFrame(rows, "i long, values array<double>")
    dist = distance_matrix_cross(cdf, series_df, settings=settings)
    w = W.partitionBy("i").orderBy(F.asc("d"), F.asc("qi"))
    return (dist.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("i"), F.col("qi").alias("cluster"),
                    F.col("d").alias("dist_to_center")))


def get_good_c(seqs: list, nb_initial_samples: int,
               settings: Optional[DtwSettings] = None, seed: int = 42,
               **kwargs) -> np.ndarray:
    """Good DBA seed: among ``nb_initial_samples`` random candidates, the
    one with minimal summed DTW distance to the other candidates
    (reference dtw_barycenter.py:46-63 get_good_c)."""
    from ..kernels.dtw import dtw_distance

    st = settings if settings is not None else DtwSettings(**kwargs)
    rng = np.random.default_rng(seed)
    nb = min(nb_initial_samples, len(seqs))
    pick = rng.choice(len(seqs), size=nb, replace=False)
    cands = [np.asarray(seqs[p], dtype=np.float64) for p in pick]
    d = np.zeros((nb, nb))
    for a in range(nb):
        for b in range(a + 1, nb):
            d[a, b] = d[b, a] = dtw_distance(cands[a], cands[b], settings=st)
    return cands[int(np.argmin(d.sum(axis=1)))]


def kmeanspp_centers(spark, series_df: DataFrame, k: int,
                     settings: DtwSettings, seed: int = 42,
                     n_samples: Optional[int] = None) -> list:
    """Distributed k-means++ seeding (Arthur & Vassilvitskii SODA'07;
    reference clustering/kmeans.py:156-232 kmeansplusplus_centers).

    The per-series nearest-center distance state lives in a DataFrame —
    never collected — so seeding scales with the corpus: each round
    draws ``n_samples`` candidates by weighted reservoir sampling
    (Efraimidis-Spirakis key = u^(1/w) as order by log(u)/w), scores
    every candidate's potential with one broadcast cross-distance pass,
    and keeps the argmin."""
    import math

    if n_samples is None:
        n_samples = max(1, 2 + int(math.log(k)))
    # deterministic pseudo-random first pick; orderBy+limit(1) compiles
    # to TakeOrderedAndProject (no global sort — verified in the plan)
    first = series_df.orderBy(F.xxhash64(F.lit(seed), "i")).limit(1).toPandas()
    centers = [np.asarray(first["values"].iloc[0], dtype=np.float64)]
    cdf = spark.createDataFrame(
        [(0, [float(x) for x in centers[0]])], "qi long, values array<double>")
    md = (distance_matrix_cross(cdf.withColumnRenamed("qi", "i"), series_df,
                                settings=settings)
          .select("i", (F.col("d") * F.col("d")).alias("min_d2"))).persist()
    for k_idx in range(1, k):
        # weighted sample of candidate ids (weight = min_d2)
        key = F.when(F.col("min_d2") > 0,
                     F.log(F.rand(seed + k_idx)) / F.col("min_d2")) \
               .otherwise(F.lit(float("-inf")))
        cand_ids = (md.withColumn("wkey", key)
                    .orderBy(F.desc("wkey")).limit(n_samples).select("i"))
        cands = series_df.join(F.broadcast(cand_ids), "i") \
            .select(F.col("i").alias("qi"), "values")
        cand_pdf = cands.toPandas()
        if len(cand_pdf) == 0:
            break
        cd = distance_matrix_cross(
            cands.withColumnRenamed("qi", "i"), series_df, settings=settings)
        scored = (cd.join(md, on="i")
                  .withColumn("d2", F.least(F.col("d") * F.col("d"),
                                            F.col("min_d2"))))
        pots = (scored.groupBy("qi").agg(F.sum("d2").alias("pot"))
                .orderBy(F.asc("pot"), F.asc("qi")).limit(1).toPandas())
        best_qi = int(pots["qi"].iloc[0])
        best_vals = cand_pdf[cand_pdf["qi"] == best_qi]["values"].iloc[0]
        centers.append(np.asarray(best_vals, dtype=np.float64))
        # eager localCheckpoint truncates the per-round join lineage
        new_md = (scored.where(F.col("qi") == best_qi)
                  .select("i", F.col("d2").alias("min_d2"))) \
            .localCheckpoint(eager=True)
        md.unpersist()
        md = new_md
    md.unpersist()
    return centers


def kmeans_par_centers(spark, series_df: DataFrame, k: int,
                       settings: DtwSettings, seed: int = 42,
                       oversample: Optional[int] = None) -> list:
    """k-means‖ seeding (Bahmani, Moseley, Vattani, Kumar, Vassilvitskii,
    "Scalable k-means++", VLDB 2012), single oversampling round —
    replaces ``kmeanspp_centers``' k-1 sequential candidate-scoring
    rounds (each a full Spark job; 2k tiny jobs at k=64, VERDICT r4
    item 7) with THREE jobs total:

    1. deterministic first pick (TakeOrderedAndProject, job 1);
    2. ONE distance pass corpus → c0 + an Efraimidis-Spirakis weighted
       draw (key = log(u)/d², i.e. u^(1/w) in log space) of
       ``oversample`` candidates — a sample ∝ d² that never
       materializes the potential φ (job 2);
    3. ONE nearest-candidate pass for the paper's reweighting
       w_c = |points whose nearest candidate is c| (job 3).

    The weighted k-means++ reduction then runs DRIVER-side over the
    ≤ oversample candidates (numpy, O(ℓ²) short-series DTWs — the
    candidate set is tiny next to the corpus by construction), seeded
    and deterministic.  Oversampling default ℓ = max(8k, 16) ≈ the
    paper's ℓ=2k × 4-5 rounds collapsed into one round."""
    from ..kernels.dtw import dtw_distance

    ell = oversample if oversample is not None else max(8 * k, 16)
    first = series_df.orderBy(F.xxhash64(F.lit(seed), "i")).limit(1) \
        .toPandas()
    c0_id = int(first["i"].iloc[0])
    c0 = np.asarray(first["values"].iloc[0], dtype=np.float64)
    cdf = spark.createDataFrame(
        [(0, [float(x) for x in c0])], "i long, values array<double>")
    d0 = distance_matrix_cross(cdf, series_df, settings=settings) \
        .select("i", (F.col("d") * F.col("d")).alias("d2"))
    key = F.when(F.col("d2") > 0, F.log(F.rand(seed)) / F.col("d2")) \
           .otherwise(F.lit(float("-inf")))
    cand_pdf = (d0.withColumn("wkey", key)
                .orderBy(F.desc("wkey")).limit(ell).select("i")
                .join(series_df.select("i", "values"), "i")).toPandas()
    ids = [c0_id] + [int(i) for i in cand_pdf["i"] if int(i) != c0_id]
    by_id = {int(i): np.asarray(v, dtype=np.float64)
             for i, v in zip(cand_pdf["i"], cand_pdf["values"])}
    by_id[c0_id] = c0
    cands = [by_id[i] for i in ids]
    m = len(cands)
    if m <= k:
        return cands
    all_cdf = spark.createDataFrame(
        [(ci, [float(x) for x in c]) for ci, c in enumerate(cands)],
        "i long, values array<double>")
    cd = distance_matrix_cross(all_cdf, series_df, settings=settings)
    w = W.partitionBy("i").orderBy(F.asc("d"), F.asc("qi"))
    wrows = (cd.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1)
             .groupBy("qi").agg(F.count("*").alias("w"))).collect()
    wmap = {int(r["qi"]): float(r["w"]) for r in wrows}
    wts = np.array([wmap.get(ci, 0.0) for ci in range(m)])

    # driver-side weighted k-means++ over the candidate set
    D = np.zeros((m, m))
    for a in range(m):
        for b in range(a + 1, m):
            D[a, b] = D[b, a] = dtw_distance(cands[a], cands[b],
                                             settings=settings)
    rng = np.random.default_rng(seed)
    chosen = [0]                      # c0 is in C per the paper
    min_d2 = D[0] ** 2
    for _ in range(1, k):
        probs = wts * min_d2
        tot = probs.sum()
        if tot > 0:
            pick = int(rng.choice(m, p=probs / tot))
        else:
            rest = [x for x in range(m) if x not in chosen]
            if not rest:
                break
            pick = int(rng.choice(rest))
        chosen.append(pick)
        min_d2 = np.minimum(min_d2, D[pick] ** 2)
    return [cands[c] for c in chosen]


def kmeans_dtw(spark, series_df: DataFrame, k: int, max_it: int = 10,
               settings: Optional[DtwSettings] = None, seed: int = 42,
               dba_max_it: int = 5, init: str = "kmeans||",
               drop_stddev: Optional[float] = None, **kwargs):
    """Lloyd k-means with DBA centroid update (reference
    clustering/kmeans.py:241-420, multiprocessing pool → Spark jobs).

    * ``init``: "kmeans||" (default since r5 — the 3-job k-means‖
      oversampling seed, :func:`kmeans_par_centers`), "kmeans++" (the
      reference-shaped sequential seeding, reference :156-232; k-1
      Spark jobs), "sample" (random sample + ``get_good_c`` medoid pick
      per center, reference :135-150), or "random" (plain random
      series).
    * empty clusters are reseeded with the series currently farthest from
      its center (reference :361-367).
    * ``drop_stddev``: exclude members farther than mean + drop_stddev·σ
      of their cluster's distances from the DBA update (reference
      :327-345 monitor/trim logic).

    Returns (centers, assignment DataFrame (i, cluster, dist_to_center)).
    """
    from ..resources import track_persist

    st = settings if settings is not None else DtwSettings(**kwargs)
    st_json = st.to_json()
    series_df = track_persist(series_df.persist())
    if init in ("kmeans||", "kmeans++"):
        if init == "kmeans||":
            centers = kmeans_par_centers(spark, series_df, k, st, seed=seed)
        else:
            centers = kmeanspp_centers(spark, series_df, k, st, seed=seed)
        n_found = max(1, len(centers))
        while len(centers) < k:  # degenerate corpus: pad by cycling
            centers.append(centers[len(centers) % n_found])
    else:
        sample = series_df.orderBy("i").limit(max(4 * k, 64)).toPandas()
        rng = np.random.default_rng(seed)
        seqs = [np.asarray(v, dtype=np.float64) for v in sample["values"]]
        if init == "sample":
            centers = []
            for ki in range(k):
                centers.append(get_good_c(seqs, max(2, len(seqs) // k),
                                          settings=st, seed=seed + ki))
        else:
            pick = rng.choice(len(seqs), size=k, replace=False)
            centers = [seqs[p] for p in pick]

    assign = None
    for _ in range(max_it):
        assign = track_persist(kmeans_assign(series_df, centers, st, spark)
                               .persist())
        # empty-cluster reseed: farthest-from-center series takes the slot
        present = {int(r["cluster"]) for r in
                   assign.select("cluster").distinct().collect()}
        empties = [c for c in range(k) if c not in present]
        if empties:
            far = (assign.orderBy(F.desc("dist_to_center")).limit(len(empties))
                   .join(series_df, on="i").toPandas())
            for slot, row in zip(empties, far.itertuples(index=False)):
                centers[slot] = np.asarray(row.values, dtype=np.float64)
            assign.unpersist()
            assign = track_persist(kmeans_assign(series_df, centers, st, spark)
                                   .persist())
        members = series_df.join(assign, on="i")
        if drop_stddev is not None and float(drop_stddev) > 0:
            # per-cluster trim thresholds (mean + ds·sample-σ of distances,
            # reference :327-345) via a tiny broadcast-joined aggregate —
            # no cluster ever has to fit in one task
            thr = (assign.groupBy("cluster")
                   .agg((F.mean("dist_to_center")
                         + F.lit(float(drop_stddev))
                         * F.coalesce(F.stddev("dist_to_center"), F.lit(0.0))
                         ).alias("__thr"),
                        F.count("*").alias("__cn")))
            members = (members.join(F.broadcast(thr), on="cluster")
                       .where((F.col("__cn") <= 2)
                              | (F.col("dist_to_center") <= F.col("__thr")))
                       .drop("__thr", "__cn"))
        members = members.persist()

        # distributed DBA: each inner iteration is one map-side pass
        # emitting per-batch (sums, counts) partials per cluster (the
        # associative half of the update, kernels/dtw.py::dba_partial)
        # plus a k × n_partitions driver reduce — a cluster's membership
        # never has to be co-resident in a single task, unlike a
        # groupBy(cluster).applyInPandas barycenter (one task per
        # cluster = OOM at corpus scale).
        new_centers = [np.asarray(c, dtype=np.float64) for c in centers]
        for _ in range(dba_max_it):
            bc = [c.tolist() for c in new_centers]

            def partials(batches):
                stt = DtwSettings.from_json(st_json)
                cs = [np.asarray(x, dtype=np.float64) for x in bc]
                for pdf in batches:
                    rows = []
                    for cl, grp in pdf.groupby("cluster"):
                        seqs = [np.asarray(v, dtype=np.float64)
                                for v in grp["values"]]
                        s_, n_ = dba_partial(seqs, cs[int(cl)], settings=stt)
                        rows.append((int(cl), s_.tolist(), n_.tolist()))
                    yield pd.DataFrame(rows, columns=["cluster", "sums",
                                                      "counts"])

            part = members.select("cluster", "values").mapInPandas(
                partials,
                schema="cluster long, sums array<double>, counts array<double>"
            ).toPandas()
            for cl, grp in part.groupby("cluster"):
                S = np.sum([np.asarray(x) for x in grp["sums"]], axis=0)
                N = np.sum([np.asarray(x) for x in grp["counts"]], axis=0)
                N[N == 0] = 1
                new_centers[int(cl)] = S / N
        members.unpersist()
        moved = max(
            (float(np.mean(np.abs(a - b))) if len(a) == len(b) else np.inf)
            for a, b in zip(centers, new_centers))
        centers = new_centers
        if moved < 1e-6:
            break
    return centers, assign


def kmedoids_dtw(dists_full: np.ndarray, k: int, max_it: int = 20,
                 seed: int = 42):
    """Driver-side k-medoids (PAM-lite) on a full symmetric matrix
    (reference clustering/medoids.py wraps pyclustering; this is an
    independent implementation of the same algorithm)."""
    n = dists_full.shape[0]
    rng = np.random.default_rng(seed)
    medoids = list(rng.choice(n, size=k, replace=False))
    for _ in range(max_it):
        assign = np.argmin(dists_full[:, medoids], axis=1)
        new_medoids = []
        for c in range(k):
            members = np.flatnonzero(assign == c)
            if len(members) == 0:
                new_medoids.append(medoids[c])
                continue
            costs = dists_full[np.ix_(members, members)].sum(axis=1)
            new_medoids.append(int(members[np.argmin(costs)]))
        if new_medoids == medoids:
            break
        medoids = new_medoids
    assign = np.argmin(dists_full[:, medoids], axis=1)
    return medoids, assign
