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


def canon_type(t) -> str:
    """Canonical dtype the driver's value-hash is sensitive to.

    Int widths coerce identically in pandas (int32 vs int64 passed the
    driver gate in round 1), so they collapse to one bucket — but
    decimal128 (DuckDB HUGEINT sums), date32-vs-timestamp and tz-ness
    do NOT coerce and must match exactly."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"DECIMAL<{t}>"  # never tolerated — driver hashes Decimal objects
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp_tz" if t.tz is not None else "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def arrow_schema_diffs(sa, sb) -> list[str]:
    """Dtype drift between two Arrow schemas (column-name matched)."""
    ta = {f.name: canon_type(f.type) for f in sa}
    tb = {f.name: canon_type(f.type) for f in sb}
    out = []
    for name in sorted(set(ta) & set(tb)):
        if ta[name] != tb[name]:
            out.append(f"{name}: spark={ta[name]} duck={tb[name]}")
    return out


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
            # NaT == NaT (datetime columns from outer joins)
            neq = (av != bv) & ~(pd.isna(av) & pd.isna(bv))
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
            got_arrow = fn(spark, sf_dir).toArrow()
            got = got_arrow.to_pandas()
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
            want_arrow = con.execute(osql[name]).arrow()
            want = want_arrow.to_pandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(ex).splitlines()[0][:300]}")
            failures += 1
            continue
        ok, msg = compare(got, want)
        if ok:
            drift = arrow_schema_diffs(got_arrow.schema, want_arrow.schema)
            if drift:
                ok, msg = False, "dtype drift (driver hash would fail): " + "; ".join(drift)
        status = "ok   " if ok else "FAIL "
        if not ok:
            failures += 1
        print(f"{status} {name}: rows={len(got)} spark={t_spark:.1f}s "
              f"duck={time.time() - t0:.1f}s {'' if ok else msg}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
