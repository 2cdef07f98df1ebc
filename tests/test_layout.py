"""Clustered layout: partition pruning + row-group skipping must
actually fire (plan-level evidence, not vibes)."""

from pyspark.sql import functions as F

from optimizing_spark.plans import layout, pipeline
from optimizing_spark.sources import datagen


def test_clustered_write_prunes(spark, tmp_path):
    path = str(tmp_path / "tiled")
    docs = datagen.documents_spark_fast(spark, 20000, partitions=8)
    tiled = pipeline.tile_documents(docs, how="jvm")
    layout.write_clustered(tiled, path)

    full = spark.read.parquet(path)
    n_all = full.count()
    assert n_all == 20000
    prefixes = [r.cell_prefix for r in full.select("cell_prefix").distinct().collect()]
    assert len(prefixes) > 3

    # 1) directory pruning: reading one prefix touches only its files
    one = layout.read_cells(spark, path, prefixes[0])
    n_one = one.count()
    assert 0 < n_one < n_all
    rep_one = layout.pruning_report(one.select("doc_id", "qt_code", "cell_prefix"))
    all_scan = full.select("doc_id", "qt_code", "cell_prefix") \
        .filter(F.col("doc_id").isNotNull())
    rep_all = layout.pruning_report(all_scan)
    assert rep_one["files_read"] is not None
    assert rep_one["files_read"] < rep_all["files_read"]

    # PartitionFilters visible in the plan text
    explain = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in explain and "cell_prefix" in explain

    # 2) row-group stats: qt_code range filter pushed to the scan
    ranged = layout.read_cells(spark, path, prefixes[0], code_lo=0, code_hi=10)
    ranged.count()
    explain2 = ranged._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in explain2 and "qt_code" in explain2

    # correctness: pruned read == filtered full read
    want = full.filter(
        (F.col("cell_prefix") == prefixes[0]) & F.col("qt_code").between(0, 10)
    ).count()
    assert ranged.count() == want


def test_bucketed_join_no_shuffle(spark):
    """Two cell-bucketed tables join with zero Exchange in the plan."""
    docs_a = datagen.documents_spark_fast(spark, 4000, partitions=4)
    docs_b = datagen.documents_spark_fast(spark, 4000, partitions=4, seed=77)
    ta = pipeline.tile_documents(docs_a, how="jvm").select(
        "doc_id", "qt_depth", "qt_code")
    tb = pipeline.tile_documents(docs_b, how="jvm").select(
        F.col("doc_id").alias("doc_id_b"), "qt_depth", "qt_code")
    layout.write_bucketed(ta, "bt_a", buckets=8)
    layout.write_bucketed(tb, "bt_b", buckets=8)

    a = spark.table("bt_a")
    b = spark.table("bt_b")
    # disable broadcast so the planner actually exercises the bucketed
    # sort-merge path (at real scale neither side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, ["qt_depth", "qt_code"]).groupBy("qt_depth").count()
        rows = j.collect()
        assert sum(r["count"] for r in rows) > 0
        joined = a.join(b, ["qt_depth", "qt_code"])
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan
        # control: the same join over plain data DOES shuffle
        pa = ta.localCheckpoint()
        pb = tb.localCheckpoint()
        ctrl = pa.join(pb, ["qt_depth", "qt_code"])
        ctrl.collect()
        assert "Exchange" in ctrl._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
