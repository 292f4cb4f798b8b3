"""Distributed subsequence search (reference SubsequenceSearch,
subsequence/subsequencesearch.py:140-301, and SubsequenceAlignment over a
corpus).

Plan shape: the query is broadcast; every corpus series is scored
independently inside ``mapInPandas`` (embarrassingly parallel); the
global top-k is a Spark TakeOrdered (``orderBy().limit(k)``).  The
reference's adaptive shrinking max-heap bound (:230-239) is a sequential
device — distributed we do the classic two-stage equivalent: a cheap
LB_Keogh prefilter stage feeding the expensive DTW stage, then exact
top-k (SURVEY.md §4: correct, slightly less pruning)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.subsequence import (best_match_value, kbest_matches,
                                   matching_function_batch, matching_lb_batch,
                                   matching_ub_batch)


def _by_length(pdf: pd.DataFrame, values_col: str):
    """Group a batch's series by length for equal-shape vectorized DP."""
    arrs = [np.asarray(v, dtype=np.float64) for v in pdf[values_col]]
    groups: dict = {}
    for idx, a in enumerate(arrs):
        groups.setdefault(len(a), []).append(idx)
    for m, idxs in groups.items():
        yield m, idxs, np.stack([arrs[i] for i in idxs])


def score_series(corpus: DataFrame, query: np.ndarray, penalty: float = 0.1,
                 values_col: str = "values") -> DataFrame:
    """Best subsequence-match value of the query in every series —
    batched last-row DP (equal-length series vectorize together)."""
    q = [float(x) for x in np.asarray(query, dtype=np.float64)]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qa = np.asarray(q)
        for pdf in batches:
            vals = np.empty(len(pdf))
            for m, idxs, S in _by_length(pdf, values_col):
                bmax = max(8, 8_000_000 // (m + 1))
                for s0 in range(0, len(idxs), bmax):
                    sel = idxs[s0:s0 + bmax]
                    mf = matching_function_batch(qa, S[s0:s0 + bmax],
                                                 penalty=penalty)
                    vals[sel] = mf.min(axis=1)
            yield pd.DataFrame({"series_id": pdf["series_id"],
                                "match_value": vals})

    return corpus.mapInPandas(compute,
                              schema="series_id string, match_value double")


def score_bounds(corpus: DataFrame, query: np.ndarray,
                 values_col: str = "values") -> DataFrame:
    """Cheap per-series (lb, ub) on the best match value — the prefilter
    stage (reference subsequencesearch.py:225-228 uses LB_Keogh the same
    way before the full distance)."""
    q = [float(x) for x in np.asarray(query, dtype=np.float64)]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qa = np.asarray(q)
        for pdf in batches:
            lb = np.empty(len(pdf))
            ub = np.empty(len(pdf))
            for m, idxs, S in _by_length(pdf, values_col):
                lb[idxs] = matching_lb_batch(qa, S)
                ub[idxs] = matching_ub_batch(qa, S)
            yield pd.DataFrame({"series_id": pdf["series_id"],
                                "lb": lb, "ub": ub})

    return corpus.mapInPandas(compute,
                              schema="series_id string, lb double, ub double")


def search_topk(corpus: DataFrame, query: np.ndarray, k: int = 5,
                penalty: float = 0.1, prune: bool = True,
                prune_sample: int = 256,
                prune_min_frac: float = 0.3) -> DataFrame:
    """k series that contain the best matches (reference
    SubsequenceSearch.kbest_matches) — exact top-k via TakeOrdered.

    With ``prune`` (default): the prefilter is *selectivity-gated*.  A
    small sample's (lb, ub) bounds estimate how much the LB stage would
    actually prune at τ̂ = the sample's k-th smallest ub; below
    ``prune_min_frac`` the whole prefilter (bounds pass + τ TakeOrdered
    + survivor re-join) is skipped — on data where LB prunes nothing
    (e.g. zero-heavy count series, where the envelope always contains
    the query) the old always-on prefilter paid ~2× the plan for
    negative pruning.  τ̂ from a sample ≥ the true τ, so the estimate
    *understates* real pruning — the gate only errs toward skipping,
    never toward a uselessly-applied prefilter being measured as a win.

    When the prefilter does run: τ = k-th smallest ub (distributed
    TakeOrdered, scalar result); only series with lb ≤ τ reach the exact
    DP.  Output identical to the unpruned plan: ≥ k series have true
    value ≤ τ, and a pruned series has true ≥ lb > τ.  A relative ε on τ
    absorbs float summation-order noise (loosens pruning, never drops)."""
    from ..resources import track_persist

    if prune:
        corpus = track_persist(corpus.persist())
        sample = corpus.limit(int(prune_sample))
        bpdf = score_bounds(sample, query).toPandas()
        if len(bpdf) > k:
            tau_hat = np.sort(bpdf["ub"].to_numpy())[k - 1] * (1 + 1e-9) + 1e-12
            frac_pruned = float((bpdf["lb"].to_numpy() > tau_hat).mean())
            if frac_pruned < prune_min_frac:
                prune = False
        else:
            prune = False  # corpus barely larger than k: nothing to prune
    if not prune:
        scored = score_series(corpus, query, penalty=penalty)
        return scored.orderBy(F.asc("match_value"), F.asc("series_id")).limit(k)
    # bounds feed two consumers (τ and the survivor filter) — persist so
    # the prefilter pass runs once
    bounds = track_persist(score_bounds(corpus, query).persist())
    tau = (bounds.orderBy(F.asc("ub")).limit(k)
           .agg(F.max("ub").alias("tau")))
    keep = (bounds.crossJoin(F.broadcast(tau))
            .where(F.col("lb") <= F.col("tau") * (1 + 1e-9) + 1e-12)
            .select("series_id"))
    survivors = corpus.join(keep, "series_id")
    scored = score_series(survivors, query, penalty=penalty)
    return scored.orderBy(F.asc("match_value"), F.asc("series_id")).limit(k)


def kbest_matches_df(corpus: DataFrame, query: np.ndarray, k: int = 3,
                     overlap: int = 0, minlength: int = 2,
                     penalty: float = 0.1,
                     values_col: str = "values") -> DataFrame:
    """All per-series k-best matches with segments, as a long table
    ``(series_id, rank, end_idx, value, seg_start, seg_end)``."""
    q = [float(x) for x in np.asarray(query, dtype=np.float64)]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.subsequence import kbest_matches_batch

        qa = np.asarray(q)
        for pdf in batches:
            if not len(pdf):
                continue
            # equal-length stacks (the global-grid norm) take ONE batched
            # DP sweep for every lattice; ragged batches group by length
            rows = []
            by_len: dict = {}
            for sid, v in zip(pdf["series_id"], pdf[values_col]):
                by_len.setdefault(len(v), []).append((sid, v))
            for _, grp in sorted(by_len.items()):
                stack = np.stack([np.asarray(v, dtype=np.float64)
                                  for _, v in grp])
                per_series = kbest_matches_batch(
                    qa, stack, k=k, overlap=overlap, minlength=minlength,
                    penalty=penalty)
                for (sid, _), ms in zip(grp, per_series):
                    rows.extend((sid, rank, m.idx, m.value, m.start, m.end)
                                for rank, m in enumerate(ms))
            yield pd.DataFrame(rows, columns=["series_id", "rank", "end_idx",
                                              "value", "seg_start", "seg_end"])

    return corpus.mapInPandas(
        compute, schema=("series_id string, rank int, end_idx int, "
                         "value double, seg_start int, seg_end int"))
