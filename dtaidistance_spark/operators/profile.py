"""Table profiling — the Deequ/dbt-style data-quality report every
pipeline runs before trusting an input: per column, in ONE pass over
the table, the row/null/distinct counts and min/max (plus freshness
for timestamp columns), emitted in a long (column, metric) format
that diffs cleanly between runs.

Plan: a single hash aggregation computes every metric as one
expression list (count/count-distinct/min/max per column), then a
within-row ``stack`` unpivots to long format — ONE scan, ONE
(global) aggregate whose input is column-pruned to exactly the
profiled columns.  Exact ``count(DISTINCT)`` forces Spark's expand
operator (one duplicated stream per distinct column); at 100 TB swap
``approx_count_distinct`` via ``exact_distinct=False`` — the HLL
sketch the rollup tier already leans on — and the plan collapses to
a plain single-pass aggregate.

Cross-engine exactness (what lets the DuckDB twin hash-match): all
counts are exact integers; numeric min/max are emitted as DOUBLE in
``value_num``; string and timestamp min/max are emitted in
``value_str`` (timestamps formatted ``yyyy-MM-dd HH:mm:ss`` — both
engines render the same 19 chars for microsecond-free UTC buckets,
and raw event times are truncated to seconds before formatting so
the contract holds for them too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DateType, NumericType, StringType,
                               TimestampNTZType, TimestampType)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(df: DataFrame, columns=None,
                  exact_distinct: bool = True) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` — see module
    docstring.  Output: (column, metric, value_num double,
    value_str string), metrics ``n`` / ``nulls`` / ``distinct`` and
    ``min`` / ``max`` (numeric → value_num; string/timestamp/date →
    value_str; other types skip min/max)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    for c in cols:
        if c not in fields:
            raise ValueError(f"unknown column {c!r}")
    aggs = []
    rows = []            # (column, metric, agg_alias, is_num)
    total = F.count(F.lit(1)).alias("_total")
    aggs.append(total)
    for c in cols:
        t = fields[c]
        aggs.append(F.count(F.col(c)).alias(f"_n_{c}"))
        dist = (F.countDistinct(F.col(c)) if exact_distinct
                else F.approx_count_distinct(F.col(c)))
        aggs.append(dist.cast("long").alias(f"_d_{c}"))
        rows += [(c, "n", f"_n_{c}", True),
                 (c, "nulls", f"_nulls_{c}", True),
                 (c, "distinct", f"_d_{c}", True)]
        if isinstance(t, NumericType):
            aggs.append(F.min(F.col(c)).cast("double")
                        .alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double")
                        .alias(f"_max_{c}"))
            rows += [(c, "min", f"_min_{c}", True),
                     (c, "max", f"_max_{c}", True)]
        elif isinstance(t, StringType):
            aggs.append(F.min(F.col(c)).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"_max_{c}"))
            rows += [(c, "min", f"_min_{c}", False),
                     (c, "max", f"_max_{c}", False)]
        elif isinstance(t, (TimestampType, TimestampNTZType,
                            DateType)):
            aggs.append(F.date_format(F.min(F.col(c)), _TS_FMT)
                        .alias(f"_min_{c}"))
            aggs.append(F.date_format(F.max(F.col(c)), _TS_FMT)
                        .alias(f"_max_{c}"))
            rows += [(c, "min", f"_min_{c}", False),
                     (c, "max", f"_max_{c}", False)]
    agg = df.select(*cols).agg(*aggs)
    for c in cols:
        agg = agg.withColumn(f"_nulls_{c}",
                             (F.col("_total") - F.col(f"_n_{c}"))
                             .cast("long"))
    stack_args = []
    for c, metric, alias, is_num in rows:
        stack_args.append(f"'{c}'")
        stack_args.append(f"'{metric}'")
        if is_num:
            stack_args.append(f"CAST({alias} AS DOUBLE)")
            stack_args.append("CAST(NULL AS STRING)")
        else:
            stack_args.append("CAST(NULL AS DOUBLE)")
            stack_args.append(f"CAST({alias} AS STRING)")
    n = len(rows)
    return agg.select(F.expr(
        f"stack({n}, {', '.join(stack_args)}) "
        f"AS (column, metric, value_num, value_str)"))
