"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` additionally runs the flagship tiling+join job at two
parallelism levels (local[8] vs local[32]) on identical input and
reports throughput at both plus the scaling efficiency — the sandbox
stand-in for the north rule's N-vs-4N-executor criterion (results are
recorded in BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q_qt_assign",
    "q_cell_counts",
    "q_range_join",
    "q_pip_join",
    "q_knn",
    "q_raster",
    "q_topk_per_cell",
    "q_agg_wide",
]


def _session(cores: int):
    from optimizing_spark.session import get_spark

    return get_spark(f"bench-{cores}", cores=cores,
                     shuffle_partitions=max(cores, 16))


def run_headline() -> dict:
    import __spark_entry__ as entry

    spark = _session(CPUS)
    qs = entry.queries()
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, SF_DIR).count()  # count() forces full execution
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    return {
        "metric": "headline_queries_total_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }


def run_scaling() -> dict:
    """Same tiling+range-join job at local[8] and local[32]; docs/sec at
    both + efficiency (ratio of speedup to core ratio)."""
    from pyspark.sql import SparkSession

    results = {}
    for cores in (8, 32):
        # a fresh JVM-backed session per level: stop any existing one
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = _session(cores)
        import __spark_entry__ as entry

        rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
        # warm-up (JIT, file listing)
        entry.q_qt_assign(spark, SF_DIR).count()
        t0 = time.time()
        entry.q_qt_assign(spark, SF_DIR).count()
        entry.q_range_join(spark, SF_DIR).count()
        dt = time.time() - t0
        results[cores] = {"sec": round(dt, 3), "rows_per_sec": round(rows / dt)}
        spark.stop()
    speedup = results[8]["sec"] / results[32]["sec"]
    eff = speedup / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "per_level": results,
        "speedup": round(speedup, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_headline()))
