"""Distributed symbolic sequence alignment (Needleman-Wunsch over a
corpus of symbol sequences).

The reference exposes NW as a single-pair kernel (alignment.py:21-100);
SURVEY §2.2 proposes the distributed surface: align every corpus
sequence (e.g. a conversation's tool-call sequence) against a broadcast
query pattern inside ``mapInPandas`` — embarrassingly parallel, the
same plan shape as subsequence scoring."""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.alignment import best_alignment, needleman_wunsch


def nw_align_series(corpus: DataFrame, query: list,
                    seq_col: str = "symbols",
                    id_col: str = "series_id",
                    with_alignment: bool = False) -> DataFrame:
    """Needleman-Wunsch score of ``query`` against every sequence.

    Returns ``(series_id, nw_value[, aligned_query, aligned_series])`` —
    value is the reference's negated edit distance (higher = better).
    """
    q = [str(x) for x in query]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, seq in zip(pdf[id_col], pdf[seq_col]):
                seq = [str(x) for x in seq]
                value, scores = needleman_wunsch(q, seq)
                if with_alignment:
                    _, qa, sa = best_alignment(scores, q, seq)
                    rows.append((sid, float(value),
                                 "".join(qa), "".join(sa)))
                else:
                    rows.append((sid, float(value)))
            cols = [id_col, "nw_value"] + \
                (["aligned_query", "aligned_series"] if with_alignment else [])
            yield pd.DataFrame(rows, columns=cols)

    schema = f"{id_col} string, nw_value double"
    if with_alignment:
        schema += ", aligned_query string, aligned_series string"
    return corpus.mapInPandas(compute, schema=schema)


def event_type_sequences(events: DataFrame, max_len: int = 64) -> DataFrame:
    """Per-user event-type symbol sequences under stable (ts, event_id)
    order — the symbolic-series input for alignment queries."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (events
           .withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= max_len)
           .groupBy("user_id")
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
               lambda s: s["event_type"]).alias("symbols")))
    return seq.select(
        F.concat(F.lit("user"), F.col("user_id").cast("string"))
        .alias("series_id"), "symbols")
