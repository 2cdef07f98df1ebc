"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N]; the same configs are what we would
ship via spark-submit to a real cluster (AQE on, Arrow on, sane shuffle
partitioning). Nothing here is local-mode-specific except the master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "optimizing_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: parallelism for local mode (defaults to $SPARK_GRAFT_CPUS or *).
    shuffle_partitions: defaults to max(cores, 32) — on a real cluster this
    would be ~2-3x total executor cores; AQE coalesces the excess.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else 0
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores or os.cpu_count() or 8, 32)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Constraint propagation is exponential over the per-level CASE WHEN
        # projection chains our iterative tiling builds (filters/joins on top
        # of tile_* would hang the optimizer); the engine never relies on
        # inferred constraints.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # Throughput GC for batch: G1's young pauses burn system time on
        # this virtualized host (observed Sys >> User in GC logs; 10x
        # slowdown at 32 threads on allocation-heavy string exprs).
        # ParallelGC restores linear scaling; on a real cluster apply the
        # same to spark.executor.extraJavaOptions.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # Our workloads are CPU-heavy per input byte (nested span decode +
        # hashing), so scan splits must outnumber cores even on small
        # compressed inputs; 128MB default caps a 2GB table at ~16-way.
        # At 100TB the same setting still yields millions of splits.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", "/tmp/optimizing_spark_warehouse")
    )
    # Shuffle/spill to RAM-backed storage when available: local-mode disk
    # serializes wide shuffles on this host (on a real cluster this is the
    # per-node NVMe scratch config).
    shm = "/dev/shm/spark-local"
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
