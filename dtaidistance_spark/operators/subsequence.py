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
                penalty: float = 0.1, prune: bool = True) -> DataFrame:
    """k series that contain the best matches (reference
    SubsequenceSearch.kbest_matches) — exact top-k via TakeOrdered.

    With ``prune`` (default): two-stage plan. Stage 1 computes cheap
    admissible (lb, ub) per series; τ = k-th smallest ub (distributed
    TakeOrdered, scalar result); only series with lb ≤ τ reach the exact
    DP.  Output identical to the unpruned plan: ≥ k series have true
    value ≤ τ, and a pruned series has true ≥ lb > τ.  A relative ε on τ
    absorbs float summation-order noise (loosens pruning, never drops)."""
    if not prune:
        scored = score_series(corpus, query, penalty=penalty)
        return scored.orderBy(F.asc("match_value"), F.asc("series_id")).limit(k)
    corpus = corpus.persist()
    # bounds feed two consumers (τ and the survivor filter) — persist so
    # the prefilter pass runs once
    bounds = score_bounds(corpus, query).persist()
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
        qa = np.asarray(q)
        for pdf in batches:
            rows = []
            for sid, v in zip(pdf["series_id"], pdf[values_col]):
                series = np.asarray(v, dtype=np.float64)
                for rank, m in enumerate(
                        kbest_matches(qa, series, k=k, overlap=overlap,
                                      minlength=minlength, penalty=penalty)):
                    rows.append((sid, rank, m.idx, m.value, m.start, m.end))
            yield pd.DataFrame(rows, columns=["series_id", "rank", "end_idx",
                                              "value", "seg_start", "seg_end"])

    return corpus.mapInPandas(
        compute, schema=("series_id string, rank int, end_idx int, "
                         "value double, seg_start int, seg_end int"))
