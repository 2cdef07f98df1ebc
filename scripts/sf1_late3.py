"""sf1 re-run for the final round-5 trio (q_st_pairs, q_snap,
q_union_area) under the sf1_sweep late-additions protocol: same
/tmp/sf1 build, local[32], per-query wall + rows + spill; results
appended to BENCH_sf1_r5.json under late_additions.queries.

q_union_area caveat probed here explicitly: the gate pins depth=6
(right for the sf0.01/sf0.1 densities); at sf1's 6M boxes the
per-cell clip population grows 10x, so the sweep records the gate
config as-is AND the density-matched depth=8 a real user would pick
(the operator's guard/docstring contract) for comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DST = os.environ.get("SPARK_GRAFT_SF1", "/tmp/sf1")


def _spill():
    base = "http://localhost:4040/api/v1"
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/applications"))
        app = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{base}/applications/{app}/stages?status=complete"))
        return (sum(s.get("memoryBytesSpilled", 0) for s in stages),
                sum(s.get("diskBytesSpilled", 0) for s in stages))
    except Exception:
        return (None, None)


def main() -> dict:
    import __spark_entry__ as entry
    from optimizing_spark.config import POW2_WORLD_2D
    from optimizing_spark.operators import measure
    from optimizing_spark.session import get_spark
    from optimizing_spark.sources import derived as D
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sf1_late3", cores=cpus,
                      shuffle_partitions=max(64, cpus * 2),
                      extra={"spark.ui.enabled": "true"})
    qs = entry.queries()
    out: dict = {}
    names = sys.argv[1:] or ["q_st_pairs", "q_snap", "q_union_area",
                             "q_coverage", "q_contour", "q_cube",
                             "q_distfield"]
    for name in names:
        m0, d0 = _spill()
        t0 = time.time()
        rows = qs[name](spark, DST).count()
        wall = time.time() - t0
        m1, d1 = _spill()
        scraped = None not in (m0, d0, m1, d1)
        out[name] = {
            "rows": rows, "wall_sec": round(wall, 2),
            "mem_spill_mb": round((m1 - m0) / 1e6, 1) if scraped else None,
            "disk_spill_mb": round((d1 - d0) / 1e6, 1) if scraped else None,
        }
        print(f"ok    {name}: rows={rows} ({wall:.1f}s)", flush=True)

    if "q_union_area" not in names:
        return out
    # depth-8 comparison run for union at sf1 (recorded: ~equal to
    # depth 6 at full compute; areas bit-identical)
    boxes = D.objects2d(spark, DST).select(
        F.col("ix").alias("x_min"), F.col("iy").alias("y_min"),
        (F.col("ix") + F.col("sx")).alias("x_max"),
        (F.col("iy") + F.col("sy")).alias("y_max"))
    t0 = time.time()
    area = measure.union_area(boxes, POW2_WORLD_2D, depth=8) \
        .collect()[0]["union_area"]
    out["q_union_area_depth8"] = {
        "rows": 1, "union_area": int(area),
        "wall_sec": round(time.time() - t0, 2),
        "note": "density-matched depth for sf1's 6M boxes; same exact "
                "union (depth-invariant, tests/test_measure.py)",
    }
    print(f"ok    union depth8: area={area} "
          f"({out['q_union_area_depth8']['wall_sec']}s)", flush=True)
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
