"""Physical-plan property assertions for the headline queries — the
claims the docs make about the plans, pinned so regressions surface:

* tier rollup: partial (map-side) aggregation starts on the scan and
  the plan has exactly ONE shuffle exchange (no row_number window pass);
* edit_distance: no Python evaluation node (JVM levenshtein only);
* lb_keogh / ub_euclidean bounds: pure column algebra, no Python;
* no SinglePartition exchange in any hot plan.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="testdata absent")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


PY_EVAL_NODES = ("BatchEvalPython", "ArrowEvalPython")


class TestPlans:
    def test_rollup_single_shuffle_partial_agg(self, spark):
        from dtaidistance_spark.plans import driver_queries as DQ
        plan = _plan(DQ.q_rollup_1m(spark, SF_DIR))
        # one HASH exchange: the final aggregation's partitioning — the
        # partial agg is map-side.  (An extra round-robin exchange may
        # precede it: _events spreads single-row-group scans, r6.)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert plan.count("Exchange") <= 2, plan
        assert "partial" in plan.lower()
        assert "SinglePartition" not in plan
        # r6: the decimal surrogate keeps the tier aggregation hash-based
        # (the struct key silently demoted it to SortAggregate)
        assert "SortAggregate" not in plan, plan

    def test_latency_quantiles_reuses_partitioning(self, spark):
        """The rank windows over (series_id, bucket_ts) and the final
        group-by must all reuse the series_id hash partitioning — two
        exchanges total (seq ordering on user_id + series re-key), no
        extra shuffle per window pass, no Python nodes."""
        from dtaidistance_spark.plans import driver_queries as DQ
        plan = _plan(DQ.q_latency_quantiles(spark, SF_DIR))
        assert plan.count("Exchange") <= 2, plan
        assert "SinglePartition" not in plan
        for node in PY_EVAL_NODES:
            assert node not in plan

    def test_edit_distance_is_jvm_only(self, spark):
        from dtaidistance_spark.plans import driver_queries as DQ
        plan = _plan(DQ.q_edit_distance(spark, SF_DIR))
        assert "levenshtein" in plan
        for node in PY_EVAL_NODES:
            assert node not in plan, plan

    def test_bounds_are_jvm_only(self, spark):
        from dtaidistance_spark.functions.bounds import (lb_keogh_pairs,
                                                         ub_euclidean_pairs)
        df = spark.createDataFrame(
            [(i, [float(i), 1.0, 2.0]) for i in range(4)],
            "i long, values array<double>")
        for out in (lb_keogh_pairs(df, window=2), ub_euclidean_pairs(df)):
            plan = _plan(out)
            for node in PY_EVAL_NODES:
                assert node not in plan, plan
            assert "SinglePartition" not in plan

    def test_gap_fill_arrays_jvm_only_and_broadcast_bounded(self, spark):
        """The gap-fill dense grid + series_arrays chain is pure JVM
        column algebra (two-level explode, left join, array_sort/
        transform — no Python eval), and the global-align bounds reach
        every series via a BROADCAST of the 1-row min/max aggregate —
        the only tolerated SinglePartition is that scalar aggregate,
        never the grid or the join."""
        from dtaidistance_spark.operators import rollup as R
        from dtaidistance_spark.plans.driver_queries import event_points_rollup
        agg = R.rollup_points(event_points_rollup(spark, SF_DIR), "1h")
        filled = R.gap_fill(agg, "1h", policy="zero", align="global")
        arrays = R.series_arrays(filled, "1h", value_col="cnt")
        plan = _plan(arrays)
        for node in PY_EVAL_NODES:
            assert node not in plan, plan
        assert "BroadcastExchange" in plan, plan
        # exactly ONE single-partition exchange is tolerated: the 1-row
        # global-bounds min/max aggregate feeding the broadcast — the
        # grid explode, the left join and the array groupBy must all
        # stay hash-partitioned
        assert plan.count("Exchange SinglePartition") <= 1, plan

    def test_retention_filter_reaches_scan_side(self, spark):
        """apply_retention's bucket filter sits below the aggregation
        output (declarative WHERE, not a post-collect filter)."""
        from dtaidistance_spark.operators import rollup as R
        from dtaidistance_spark.plans.driver_queries import event_points_rollup
        agg = R.rollup_points(event_points_rollup(spark, SF_DIR), "1h")
        kept = R.apply_retention(agg, "1h", "2024-01-15")
        plan = _plan(kept)
        assert "Filter" in plan
        assert "SinglePartition" not in plan

    def test_ann_lsh_plan_arrow_udf_and_bucket_join(self, spark):
        """lsh_topk computes every table's bucket in ONE Arrow-batched
        UDF (ArrowEvalPython — never row-at-a-time BatchEvalPython; the
        old 120-fold column form cost ~100 s of Catalyst analysis), the
        candidate step is a broadcast hash join on the (t, bucket) keys,
        and nothing collapses to a single partition."""
        from dtaidistance_spark.operators import ann as ANN
        emb = spark.createDataFrame(
            [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)])
             for i in range(32)],
            "vec_id long, embedding array<double>")
        q = emb.where(F.col("vec_id") < 3)
        plan = _plan(ANN.lsh_topk(emb, q, dim=8, k=3, n_planes=4,
                                  n_tables=6))
        assert "ArrowEvalPython" in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "SinglePartition" not in plan, plan
