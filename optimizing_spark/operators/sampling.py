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
