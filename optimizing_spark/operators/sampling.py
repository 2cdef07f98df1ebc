"""Deterministic sampling for training-data pipelines.

Spark's native ``df.sample`` is seed-dependent on partitioning, so a
resample after a repartition yields a different set — useless for
reproducible corpus construction. These operators derive the sampling
decision from a content hash (the portable md5-prefix uniform already
used by the text operators), so the sample is a pure function of the
data: stable across partitionings, cluster sizes, and engines (the
same rows fall out of the DuckDB oracle).

- ``bernoulli_sample``: keep a row iff hash(key) mod den < num. One
  narrow filter, no shuffle, pushes down past scans — the 100 TB
  plan for "take 1% of the corpus".
- ``stratified_sample``: exactly k rows per stratum, chosen by
  smallest hash (deterministic without-replacement). One hash shuffle
  on the stratum key + WindowGroupLimit (Spark pushes the top-k below
  the exchange, so each map task emits at most k rows per stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def uniform_hash(key) -> "F.Column":
    """Portable 60-bit uniform from md5(key-as-string); bit-identical
    in DuckDB as CAST(('0x'||substr(md5(CAST(key AS VARCHAR)),1,15))
    AS BIGINT). Canonical definition: functions/sketches.hash60 —
    ONE copy, so the sampling, LSH and sketch oracle twins can never
    silently desynchronize."""
    from ..functions.sketches import hash60

    return hash60(key)


def bernoulli_sample(
    df: DataFrame, key: str, num: int, den: int = 100
) -> DataFrame:
    """Deterministic ~num/den sample keyed on ``key``."""
    return df.filter(uniform_hash(key) % den < num)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, k: int
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — the k smallest
    (hash, key) pairs, so the choice is deterministic and uniform."""
    w = Window.partitionBy(stratum).orderBy(
        uniform_hash(key).asc(), F.col(key).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def priority_col(weight_col: str, key: str, salt: str = "ws") -> "F.Column":
    """Priority-sampling key (Duffield, Lund & Thorup, JACM 2007):
    priority = w / u with u = (h+1)/2^60 the salted portable uniform on
    (0, 1] (h the 60-bit md5-prefix hash). Written as w * 2^60 / (h+1):
    every step is a single EXACT or correctly-rounded IEEE-754 op
    (BIGINT→DOUBLE conversion; multiply by a power of two only shifts
    the exponent — exact; one division), so Spark and DuckDB compute
    the IDENTICAL double with no libm/rounding bridge needed (unlike
    ln/pow-based A-ES keys). The w/u scale matters beyond ordering:
    the (k+1)-th priority IS the estimator threshold tau compared
    against raw weights in max(w, tau) — a rescaled key would silently
    bias the subset-sum estimator (caught by the NumPy unbiasedness
    replay in test_rollup_sampling). Zero-weight rows get priority 0
    and sort last."""
    h = uniform_hash(
        F.concat_ws(":", F.lit(salt), F.col(key).cast("string")))
    return (F.col(weight_col).cast("double") * F.lit(float(1 << 60))) \
        / (h + F.lit(1)).cast("double")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key: str,
    k: int,
    salt: str = "ws",
    with_estimator: bool = False,
) -> DataFrame:
    """Deterministic weight-proportional sample WITHOUT replacement:
    the k largest priorities (ties broken by key). Importance-weighted
    corpus subsampling for training-data pipelines — e.g. keep 1M
    documents with probability ~ quality score — reproducible across
    partitionings, cluster sizes, and engines (the DuckDB oracle
    replays the identical sample).

    Plan: orderBy(...).limit(k) compiles to TakeOrderedAndProject —
    every map task emits only its local top-k and one tiny
    single-partition reduce merges them; the table is scanned once and
    NEVER shuffled. That is the 100 TB shape (k rows of driver memory,
    zero exchanges).

    with_estimator=True additionally returns the Horvitz-Thompson
    weight ``est_w = max(w, tau)`` per sampled row, where tau is the
    (k+1)-th priority — the priority-sampling subset-sum estimator
    (unbiased for ANY k; see test_rollup_sampling's NumPy replay).
    Costs one extra candidate row and a window over the k+1 survivors
    (already a single tiny partition after the take)."""
    pr = priority_col(weight_col, key, salt).alias("priority")
    base = df.select("*", pr)
    if not with_estimator:
        return base.orderBy(
            F.col("priority").desc(), F.col(key).asc()).limit(k)
    top = base.orderBy(
        F.col("priority").desc(), F.col(key).asc()).limit(k + 1)
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_rank = Window.partitionBy(F.lit(1)).orderBy(
        F.col("priority").desc(), F.col(key).asc())
    return (
        top.withColumn("_n", F.count("*").over(w_all))
        .withColumn("_tau", F.when(
            F.col("_n") > k, F.min("priority").over(w_all)
        ).otherwise(F.lit(0.0)))
        .withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") <= k)
        .withColumn(
            "est_w",
            F.greatest(F.col(weight_col).cast("double"), F.col("_tau")))
        .drop("_n", "_tau", "_rn")
    )
