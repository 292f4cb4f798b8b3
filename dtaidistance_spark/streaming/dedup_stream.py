"""Streaming exact dedup (Structured Streaming).

The streaming twin of ``operators/dedup.py::exact_dedup`` for a
continuously-ingesting document stream: keep the FIRST arrival of every
normalized text and drop later exact duplicates, with BOUNDED state —
``dropDuplicatesWithinWatermark`` keys the dedup state on the md5
fingerprint and expires entries once the event-time watermark passes
their arrival window, so state is O(docs per watermark horizon), not
O(corpus).  That is the production trade for an unbounded crawl stream:
an exact duplicate arriving within the horizon is suppressed
exactly-once through the checkpointed sink; one arriving after the
horizon re-enters (and the periodic BATCH exact_dedup pass over the
accumulated corpus is the corrector — the same streaming-ingest /
batch-repair split the tier sink uses, streaming/rollup_stream.py).

The reference has no streaming surface (SURVEY.md §2.8); this extends
the engine's native streaming layer to the curation side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F



def stream_exact_dedup(stream: DataFrame, ts_col: str = "ts",
                       watermark: str = "10 minutes") -> DataFrame:
    """Document stream → first-arrival-only stream.

    Fingerprint = md5 of whitespace-normalized lowercased text (the
    exact_dedup key, so streaming and batch agree on what "duplicate"
    means); state per fingerprint is dropped once the watermark moves
    ``watermark`` past its event time.
    """
    from ..operators.text import norm_text_col

    fp = F.md5(norm_text_col())
    return (stream
            .withColumn("fp", fp)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["fp"])
            .drop("fp"))


def run_doc_dedup_stream(spark: SparkSession, input_dir: str, schema: str,
                         out_dir: str, checkpoint_dir: str,
                         ts_col: str = "ts",
                         watermark: str = "10 minutes"):
    """File-source document stream → dedup → parquet sink, processing
    all available data (Trigger.AvailableNow): exactly-once via the
    checkpoint dir, idempotent resume from the last committed offset."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    out = stream_exact_dedup(src, ts_col=ts_col, watermark=watermark)
    q = (out.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
