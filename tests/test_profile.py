"""operators/profile.py — one-pass table profiling."""

import datetime as dt

import pandas as pd
import pytest


class TestProfileTable:
    def _df(self, spark):
        rows = [
            (1, "a", 10.5, dt.datetime(2024, 1, 1, 5, 0, 0)),
            (2, "b", None, dt.datetime(2024, 1, 3, 7, 30, 0)),
            (3, None, -2.0, None),
            (3, "a", 10.5, dt.datetime(2024, 1, 2, 0, 0, 0)),
        ]
        return spark.createDataFrame(
            rows, "id long, name string, score double, ts timestamp")

    def test_metrics_hand_fixture(self, spark):
        from dtaidistance_spark.operators.profile import profile_table
        got = (profile_table(self._df(spark)).toPandas()
               .set_index(["column", "metric"]))
        assert got.loc[("id", "n"), "value_num"] == 4
        assert got.loc[("id", "nulls"), "value_num"] == 0
        assert got.loc[("id", "distinct"), "value_num"] == 3
        assert got.loc[("id", "min"), "value_num"] == 1.0
        assert got.loc[("id", "max"), "value_num"] == 3.0
        assert got.loc[("name", "nulls"), "value_num"] == 1
        assert got.loc[("name", "min"), "value_str"] == "a"
        assert got.loc[("name", "max"), "value_str"] == "b"
        assert got.loc[("score", "n"), "value_num"] == 3
        assert got.loc[("score", "min"), "value_num"] == -2.0
        assert got.loc[("ts", "nulls"), "value_num"] == 1
        assert got.loc[("ts", "min"), "value_str"] == \
            "2024-01-01 05:00:00"
        assert got.loc[("ts", "max"), "value_str"] == \
            "2024-01-03 07:30:00"

    def test_column_subset_and_unknown(self, spark):
        from dtaidistance_spark.operators.profile import profile_table
        df = self._df(spark)
        got = profile_table(df, columns=["id"]).toPandas()
        assert set(got["column"]) == {"id"}
        with pytest.raises(ValueError):
            profile_table(df, columns=["nope"])

    def test_one_pass_plan(self, spark):
        from dtaidistance_spark.operators.profile import profile_table
        df = self._df(spark)
        plan = (profile_table(df)._jdf.queryExecution().executedPlan()
                .toString())
        # one scan feeding one (expanded) aggregate; no join, no Python
        assert plan.count("Scan") <= 2       # reused/exchanged scan
        assert "Join" not in plan
        assert "Python" not in plan
        # approx variant drops the exact-distinct Expand operator
        plan2 = (profile_table(df, exact_distinct=False)
                 ._jdf.queryExecution().executedPlan().toString())
        assert "Expand" not in plan2

    def test_matches_pandas_on_random(self, spark, rng):
        from dtaidistance_spark.operators.profile import profile_table
        vals = [int(v) if rng.random() > 0.2 else None
                for v in rng.integers(0, 50, 300)]
        pdf = pd.DataFrame({"v": vals})
        df = spark.createDataFrame(pdf.astype(object).where(
            pdf.notna(), None), "v long")
        got = (profile_table(df).toPandas()
               .set_index(["column", "metric"]))
        s = pd.Series(vals, dtype="Int64")
        assert got.loc[("v", "n"), "value_num"] == s.notna().sum()
        assert got.loc[("v", "nulls"), "value_num"] == s.isna().sum()
        assert got.loc[("v", "distinct"), "value_num"] == s.nunique()
        assert got.loc[("v", "min"), "value_num"] == float(s.min())
        assert got.loc[("v", "max"), "value_num"] == float(s.max())
