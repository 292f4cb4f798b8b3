"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count + sorted values.  Usage: python scripts/check_oracles.py [names...]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from dtaidistance_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    return str(v)


def canon(pdf: pd.DataFrame) -> list:
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def main():
    names = sys.argv[1:] or None
    spark = get_spark(app_name="check_oracles", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            results.append((name, "SPARK_ERROR", str(e)[:200]))
            continue
        t1 = time.time()
        if name not in oracles:
            results.append((name, f"ROWS_ONLY({len(sdf)})", f"{t1-t0:.1f}s"))
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            results.append((name, "ORACLE_ERROR", str(e)[:200]))
            continue
        if len(sdf) != len(odf):
            results.append((name, "ROWCOUNT_MISMATCH",
                            f"spark={len(sdf)} duck={len(odf)}"))
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            results.append((name, "SCHEMA_MISMATCH",
                            f"spark={sorted(sdf.columns)} duck={sorted(odf.columns)}"))
            continue
        a, b = canon(sdf), canon(odf)
        if a == b:
            results.append((name, f"OK({len(sdf)})", f"{t1-t0:.1f}s"))
        else:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            results.append((name, "VALUE_MISMATCH", f"{diffs}"))
    print()
    failed = 0
    for name, status, detail in results:
        flag = "✓" if status.startswith(("OK", "ROWS_ONLY")) else "✗"
        if flag == "✗":
            failed += 1
        print(f"{flag} {name:26s} {status:22s} {detail}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
