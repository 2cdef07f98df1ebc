"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
twin on DuckDB over the same parquet, compare row count, schema
(column names) and exact values (column-name-sorted, row-sorted).

Uses a DEFAULT-config Spark session (no engine tuning) to faithfully
simulate the driver's environment (ANSI on, constraint propagation on).

Usage: python tests/compare_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"schema: spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rows: spark={len(a)} duck={len(b)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        else:
            neq = av != bv
        if neq.any():
            i = int(np.argmax(neq))
            return False, (f"col {c}: {int(neq.sum())} diffs; first at row {i}: "
                           f"spark={av[i]!r} duck={bv[i]!r}")
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("compare-harness")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs, osql = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(ex).splitlines()[0][:300]}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in osql:
            print(f"weak  {name}: rows={len(got)} ({t_spark:.1f}s, no oracle)")
            continue
        t0 = time.time()
        try:
            want = con.execute(osql[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(ex).splitlines()[0][:300]}")
            failures += 1
            continue
        ok, msg = compare(got, want)
        status = "ok   " if ok else "FAIL "
        if not ok:
            failures += 1
        print(f"{status} {name}: rows={len(got)} spark={t_spark:.1f}s "
              f"duck={time.time() - t0:.1f}s {'' if ok else msg}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
