"""Skew handling end to end (SURVEY §4: the capacity rule's 'only
split hot nodes' heuristic at cluster scale): a deliberately hot cell
(~30% of all rows in one qt_code) must be (a) detected and salted by
refine_hot_cells, (b) spread across shuffle partitions by the salted
key where the raw cell key concentrates it in one task, and (c) split
by AQE's skew-join handling when joined unsalted."""

import pytest
from pyspark.sql import functions as F

from optimizing_spark.plans import pipeline

N = 300_000
HOT_FRAC = 0.3
HOT_CODE = 77
SALT_BUCKETS = 16


@pytest.fixture(scope="module")
def skewed(spark):
    """Tiled-table shape with 30% of rows in one depth-4 cell; the rest
    uniform over 255 other codes."""
    n_hot = int(N * HOT_FRAC)
    df = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.lit(4).alias("qt_depth"),
        F.when(F.col("id") < n_hot, F.lit(HOT_CODE))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(256))).alias("qt_code"),
        F.pmod(F.col("id") * 7919, F.lit(1 << 16)).alias("ix"),
        F.pmod(F.col("id") * 104729, F.lit(1 << 16)).alias("iy"),
    )
    return df.localCheckpoint()


def test_refine_hot_cells_marks_and_salts(skewed):
    out = pipeline.refine_hot_cells(
        skewed, max_rows_per_cell=N // 50, salt_buckets=SALT_BUCKETS)
    agg = out.groupBy("qt_code", "hot").agg(
        F.count("*").alias("n"),
        F.countDistinct("salt").alias("n_salts"),
        F.max("salt").alias("max_salt"),
    ).collect()
    by_code = {(r["qt_code"], r["hot"]): r for r in agg}
    hot = by_code[(HOT_CODE, True)]
    # >= : the uniform remainder also hashes a sliver onto HOT_CODE
    assert hot["n"] >= int(N * HOT_FRAC)
    assert hot["n_salts"] == SALT_BUCKETS  # spread over every bucket
    # cold cells keep salt 0 (stable join keys, no needless fan-out)
    for (code, is_hot), r in by_code.items():
        if code != HOT_CODE:
            assert not is_hot and r["max_salt"] == 0
    # salted groups are balanced: largest (code, salt) group ~ hot/16
    sizes = out.groupBy("qt_code", "salt").count().agg(F.max("count")).first()[0]
    assert sizes < int(N * HOT_FRAC) / SALT_BUCKETS * 1.5


def test_salted_key_bounds_max_partition(spark, skewed):
    """The scale-breaking symptom of a hot cell is one shuffle task
    holding 30% of the table; partitioning by the salted key must
    bound the largest partition near uniform."""
    salted = pipeline.refine_hot_cells(
        skewed, max_rows_per_cell=N // 50, salt_buckets=SALT_BUCKETS)

    def max_frac(df, *keys):
        parts = df.repartition(64, *[F.col(c) for c in keys]) \
            .withColumn("pid", F.spark_partition_id()) \
            .groupBy("pid").count()
        return parts.agg(F.max("count")).first()[0] / N

    unsalted_frac = max_frac(skewed, "qt_depth", "qt_code")
    salted_frac = max_frac(salted, "qt_depth", "qt_code", "salt")
    assert unsalted_frac >= HOT_FRAC  # the hot cell lands in ONE task
    assert salted_frac <= 0.08  # salted: every task near-uniform


def test_aqe_skew_join_engages(spark, skewed):
    """Under realistic thresholds (scaled to test data volume) AQE must
    mark the sort-merge join over the raw cell key as skew-split —
    the runtime backstop behind the explicit salting.

    The dim side must be an INDEPENDENT table (here: a cell-metadata
    manifest): OptimizeSkewedJoin pattern-matches Sort-over-shuffle-
    stage on both children, so a dim derived by aggregating on the join
    keys (its agg exchange is reused as the join partitioning) defeats
    the rule — worth knowing at scale: keep an aggregate out of the
    plan directly under a join you expect AQE to de-skew, or salt."""
    dim = spark.range(256).select(
        F.lit(4).alias("qt_depth"), F.col("id").alias("qt_code"),
        (F.col("id") * 3).alias("cell_meta")).localCheckpoint()
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )}
    try:
        # scale the production thresholds (256MB / factor 5) down to the
        # test's data volume so the same mechanism is observable
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                 "512KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        j = skewed.join(dim, ["qt_depth", "qt_code"])
        # collect() executes THIS DataFrame's QueryExecution (count()
        # would run a different one and leave this plan unfinalized)
        assert len(j.collect()) == N
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE skew split did not engage"
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)
