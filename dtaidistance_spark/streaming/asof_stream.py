"""Streaming as-of enrichment (Structured Streaming).

The streaming twin of ``operators/asof.py::asof_join``: enrich a
continuously-arriving event stream with the most recent dimension row
at-or-before each event's timestamp (per key) — the classic
"join the tick stream to the latest completed rollup / quote /
reference row" pattern.

Why ``foreachBatch`` and not a streaming join: the as-of argmax needs a
per-left-row running window over the unioned stream, and window
functions over unbounded streams are not expressible in Structured
Streaming's incremental model (a stream-static theta join l.ts >= r.ts
followed by a streaming max_by aggregation would carry O(matches)
state and still need watermark-delayed emission).  The canonical
production pattern is micro-batch enrichment: each micro-batch is a
small static frame, so the BATCH asof_join — whose union+running-window
plan is already hash-green vs DuckDB's native ASOF JOIN — runs
per batch against the dimension table, inheriting its one-exchange /
no-explosion cost shape at micro-batch granularity.

The dimension side is re-resolved every micro-batch via a callable, so
a slowly-changing dimension (e.g. the hourly rollup tier the batch
driver query uses, refreshed by its own streaming job) is picked up on
its natural cadence without restarting the query — the same
streaming-ingest / batch-refresh split rollup_stream.py documents.

The reference has no streaming surface (SURVEY.md §2.8); this extends
the engine's native streaming layer to the relational side.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from ..operators.asof import asof_join


def stream_asof_enrich(stream: DataFrame,
                       dim: Union[DataFrame, Callable[[], DataFrame]],
                       on: Union[str, Sequence[str]],
                       left_ts: str = "ts", right_ts: str = "ts",
                       how: str = "inner",
                       sink_batch: Optional[Callable[[DataFrame, int],
                                                     None]] = None):
    """Build the writeStream for stream-side as-of enrichment.

    ``dim`` is either a static DataFrame or a zero-arg callable
    returning one (re-evaluated per micro-batch — the slowly-changing
    case).  ``sink_batch(enriched_df, batch_id)`` writes each enriched
    micro-batch; delivery is the at-least-once ``foreachBatch``
    contract (use an idempotent sink — the batch-id-ledger pattern in
    streaming/rollup_stream.py::stream_to_snapshots — for
    exactly-once).

    Returns the un-started ``DataStreamWriter`` so the caller attaches
    checkpoint/trigger options.
    """
    get_dim = dim if callable(dim) else (lambda: dim)

    def enrich(bdf: DataFrame, batch_id: int) -> None:
        out = asof_join(bdf, get_dim(), on=on,
                        left_ts=left_ts, right_ts=right_ts, how=how)
        if sink_batch is not None:
            sink_batch(out, batch_id)
        else:
            out.write.format("noop").mode("overwrite").save()

    return stream.writeStream.foreachBatch(enrich).outputMode("append")


def run_asof_enrich_stream(spark: SparkSession, input_dir: str,
                           schema: str,
                           dim: Union[DataFrame, Callable[[], DataFrame]],
                           on: Union[str, Sequence[str]],
                           out_dir: str, checkpoint_dir: str,
                           left_ts: str = "ts", right_ts: str = "ts",
                           how: str = "inner"):
    """File-source event stream → as-of enrichment → parquet sink,
    processing everything currently available (availableNow) and
    stopping — the same harness shape as run_doc_dedup_stream."""
    src = spark.readStream.schema(schema).parquet(input_dir)

    def sink(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("append").parquet(out_dir)

    q = (stream_asof_enrich(src, dim, on=on, left_ts=left_ts,
                            right_ts=right_ts, how=how, sink_batch=sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
