"""North-rule pipeline as a spark-submit job.

Ship + run:

    python -m optimizing_spark.plans.shipping dist/optimizing_spark.zip
    spark-submit --driver-memory 24g --py-files dist/optimizing_spark.zip \
        scripts/submit_tile_job.py --sf-dir /root/testdata/sf0.1 --cores 32

NOTE: heap size MUST be set at submit time (--driver-memory /
spark.executor.memory in cluster mode). get_spark()'s
spark.driver.memory only applies when the session itself launches the
JVM; under spark-submit the JVM already exists, so the builder value
is silently ignored — at the default 1g, 32 scan threads OOM.

This file deliberately lives OUTSIDE the package: everything it
imports from ``optimizing_spark`` must come from the ``--py-files``
zip, which is exactly what a 1000-executor cluster submission relies
on (the north rule's "spark-submit --py-files" shipping mode). The
job is the reference's frame pipeline at table scope (documents ->
interleaved spans -> geocode -> static quadtree tile -> per-depth
histogram; Optimizing WorldPartition.hpp insert/tile flow) and prints
ONE JSON line: {"docs": N, "secs": s, "docs_per_sec": r,
"depth_hist": {...}, "cores": c}.
"""

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--parquet", default=None,
                    help="read a documents parquet directly (e.g. the "
                         "bench --scaling 20M-doc table) instead of "
                         "<sf-dir>/documents.parquet")
    ap.add_argument("--cores", type=int, default=0,
                    help="local[N] parallelism; 0 = local[*]")
    ap.add_argument("--repeat", type=int, default=1,
                    help="timed repetitions (first run also JIT-warms)")
    args = ap.parse_args()

    # imported here so a missing --py-files zip fails loudly inside main
    from optimizing_spark.plans import pipeline
    from optimizing_spark.session import get_spark
    from optimizing_spark.sources import derived

    spark = get_spark("submit_tile_job", cores=args.cores or None)
    if args.parquet:
        # pre-generated interleaved table (input_hint shape): spans exist
        spans = spark.read.parquet(args.parquet).select("doc_id", "spans")
    else:
        spans = derived.docs_with_spans(
            derived.load(spark, args.sf_dir, "documents"))
    best = None
    hist: dict[str, int] = {}
    n_docs = 0
    for _ in range(max(1, args.repeat)):
        t0 = time.monotonic()
        tiled = pipeline.tile_documents(spans, how="jvm")
        rows = tiled.groupBy("qt_depth").count().orderBy("qt_depth").collect()
        secs = time.monotonic() - t0
        hist = {str(r["qt_depth"]): r["count"] for r in rows}
        n_docs = sum(r["count"] for r in rows)
        best = secs if best is None else min(best, secs)
    print(json.dumps({
        "docs": n_docs,
        "secs": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1) if best else 0.0,
        "depth_hist": hist,
        "cores": args.cores,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
