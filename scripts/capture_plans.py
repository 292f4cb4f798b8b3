"""Capture .explain('formatted') output for bench/driver queries.

Usage: python scripts/capture_plans.py <out_dir> [sf_dir] [query ...]
Writes <out_dir>/<query>.txt for each query (default: the 13 bench
queries).  Driver-side planning only — nothing executes.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    if not names:
        import bench
        names = list(bench.BENCH_QUERIES)
    os.makedirs(out_dir, exist_ok=True)

    from dtaidistance_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="capture-plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", len(plan), "chars")
    spark.stop()


if __name__ == "__main__":
    main()
