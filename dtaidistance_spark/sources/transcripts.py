"""Deterministic synthetic transcript corpus, generated Spark-natively.

Schema is exactly the north-rule input hint (BASELINE.json):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.

Everything is derived from ``xxhash64`` of (seed, conv, turn) with pure
column expressions — no driver-side data, no Python UDFs — so the same
generator scales from unit-test size to cluster-bench size: ``spark.range``
parallelizes the conversation axis and ``explode(sequence(...))`` fans out
turns.  Turn counts follow a bounded power law (skew is intentional: the
engine's salting/skew handling must be exercised), inter-turn gaps follow
a heavy-tailed law with deliberate long silences (≥ several 1m buckets) so
gap-fill has real gaps to fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_TOOLS = ["search", "python", "browser", "calculator", "sql", "editor"]
_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _h01(*cols, salt: str) -> F.Column:
    """Deterministic uniform in [0, 1) from xxhash64 of the inputs."""
    h = F.xxhash64(F.lit(salt), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double") / F.lit(1_000_000_007.0))


def synth_transcripts(spark: SparkSession, n_convs: int = 200, seed: int = 42,
                      min_turns: int = 2, max_turns: int = 400,
                      alpha: float = 1.1, start: str = "2024-01-01",
                      n_parts: int | None = None) -> DataFrame:
    """Generate the deterministic transcript corpus.

    Turn counts: bounded Pareto ``n = min_turns / u^(1/alpha)`` clipped to
    ``max_turns`` (power-law skew, FIXTURES.md §1).  Gaps: ``3·u^-0.6``
    seconds clipped at 900, plus a deliberate 5-40 min silence for ~4% of
    turns, so 1m buckets go missing.  ``ts`` is a per-conversation running
    sum of gaps — monotone by construction.
    """
    conv = spark.range(0, n_convs, 1, n_parts or max(2, min(64, n_convs // 4 + 1)))
    sseed = f"s{seed}"
    conv = conv.select(
        F.concat(F.lit("conv"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("conv_id"),
        F.col("id").alias("conv_no"),
        _h01(F.col("id"), salt=sseed + "n").alias("u_n"),
        _h01(F.col("id"), salt=sseed + "t0").alias("u_t0"),
    )
    conv = conv.withColumn(
        "n_turns",
        F.least(
            F.lit(max_turns),
            F.greatest(
                F.lit(min_turns),
                F.floor(F.lit(float(min_turns)) / F.pow(F.col("u_n") + F.lit(1e-12),
                                                        F.lit(1.0 / alpha))).cast("int"),
            ),
        ).cast("int"),
    ).withColumn(
        "t0_off_s", (F.col("u_t0") * F.lit(86400.0 * 20)).cast("long")
    )

    turns = conv.select(
        "conv_id", "conv_no", "t0_off_s",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    u_gap = _h01(F.col("conv_no"), F.col("turn_idx"), salt=sseed + "g")
    u_skip = _h01(F.col("conv_no"), F.col("turn_idx"), salt=sseed + "sk")
    u_silence = _h01(F.col("conv_no"), F.col("turn_idx"), salt=sseed + "sl")
    gap_s = F.least(F.lit(900.0), F.lit(3.0) * F.pow(u_gap + F.lit(1e-12), F.lit(-0.6)))
    silence_s = F.when(u_skip < F.lit(0.04),
                       F.lit(300.0) + u_silence * F.lit(2100.0)).otherwise(F.lit(0.0))
    turns = turns.withColumn(
        "gap_s", F.when(F.col("turn_idx") == 0, F.lit(0.0)).otherwise(gap_s + silence_s))

    # running sum of gaps → monotone ts per conversation
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx") \
         .rowsBetween(W.unboundedPreceding, W.currentRow)
    turns = turns.withColumn("off_s", F.sum("gap_s").over(w))

    h_text = F.xxhash64(F.lit(sseed + "tx"), F.col("conv_no"), F.col("turn_idx"))
    word = F.array(*[F.lit(x) for x in _WORDS])[
        F.pmod(h_text, F.lit(len(_WORDS))).cast("int")]
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int"))
    tool = F.when(
        role == "tool",
        F.array(*[F.lit(x) for x in _TOOLS])[
            F.pmod(F.xxhash64(F.lit(sseed + "tl"), F.col("conv_no"),
                              F.col("turn_idx")), F.lit(len(_TOOLS))).cast("int")],
    ).otherwise(F.lit(None).cast("string"))

    return turns.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(word, F.lit(" "), F.conv(F.hex(h_text), 16, 36)).alias("text"),
        tool.alias("tool"),
        (F.to_timestamp(F.lit(start)).cast("double") + F.col("t0_off_s")
         + F.col("off_s")).cast("timestamp").alias("ts"),
    )


def events_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-provided ``events`` table to the transcript shape
    (user_id → conv_id, ts-ordered row number → turn_idx) so the same
    pipeline runs over driver test data and is DuckDB-oracle checkable."""
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("user"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
        F.col("value"),
    )
