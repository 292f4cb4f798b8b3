"""SemDeDup (operators/dedup.py::semdedup) — hand-computed cluster
assignment + dominance keep-rule, determinism, and the plan pin."""

import numpy as np
import pytest

from dtaidistance_spark.operators.dedup import semdedup

CENTS = np.array([[1.0, 0.0, 0.0, 0.0],
                  [0.0, 1.0, 0.0, 0.0]])

ROWS = [
    (0, [1.0, 0.0, 0.0, 0.0]),    # cluster 0, centroid_cos 1.0
    (1, [0.9, 0.1, 0.0, 0.0]),    # cluster 0, near-dup of 0 -> dropped
    (2, [0.0, 0.0, 0.0, 1.0]),    # orthogonal: tie -> cid DESC = 1; keep
    (3, [0.0, 1.0, 0.0, 0.0]),    # cluster 1 }
    (4, [0.0, 1.0, 0.0, 0.0]),    # cluster 1 } identical twins: id 3 wins
    (5, [0.72, 0.69, 0.0, 0.0]),  # cluster 0 } cross-cluster near-dups
    (6, [0.69, 0.72, 0.0, 0.0]),  # cluster 1 } (cos ~0.999): BOTH keep
]


@pytest.fixture()
def emb(spark):
    return spark.createDataFrame(ROWS, "vec_id long, embedding array<double>")


class TestSemDedup:
    def test_keep_rule_and_assignment(self, spark, emb):
        got = (semdedup(emb, CENTS, tau=0.9).orderBy("vec_id").toPandas())
        assert dict(zip(got["vec_id"], got["cid"])) == {
            0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 0, 6: 1}
        assert dict(zip(got["vec_id"], got["keep"])) == {
            0: True, 1: False,       # dominated by 0 (higher centroid_cos)
            2: True,
            3: True, 4: False,       # equal centroid_cos -> lower id wins
            5: True, 6: True,        # near-dups split across clusters
        }
        assert got.loc[got["vec_id"] == 0, "centroid_cos"].item() == 1.0

    def test_exactly_one_survivor_per_dup_group(self, spark, emb):
        got = semdedup(emb, CENTS, tau=0.9).toPandas()
        kept = set(got[got["keep"]]["vec_id"])
        assert kept == {0, 2, 3, 5, 6}

    def test_repartition_deterministic(self, spark, emb):
        a = (semdedup(emb, CENTS, tau=0.9)
             .orderBy("vec_id").toPandas())
        b = (semdedup(emb.repartition(7), CENTS, tau=0.9)
             .orderBy("vec_id").toPandas())
        assert a.equals(b)

    def test_plan_equi_join_only(self, spark, emb):
        plan = (semdedup(emb, CENTS, tau=0.9)._jdf.queryExecution()
                .executedPlan().toString())
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in plan  # intra-cluster stage is an equi-join
