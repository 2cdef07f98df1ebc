"""Geocoding interleaved documents: derive deterministic spatial
coordinates from a document's span payloads (BASELINE.json north_star:
"documents are geocoded from their span payloads, bulk-encoded to
cells").

Two implementations with IDENTICAL output contract (integer coords in
[0, 2^world_bits) plus integer box extents), chosen by ``how=``:

- ``jvm`` (default): pure pyspark.sql expressions — the span array is
  folded to a canonical string with transform/concat_ws and hashed with
  xxhash64 (JVM-side, whole-stage codegen, zero Python). This is the
  100 TB hot path.
- ``arrow``: a vectorized pandas UDF (Arrow-batched) computing crc32
  over the same canonical string — demonstrates the pandas/Arrow
  plumbing the input_hint mandates for payload-level logic that SQL
  expressions cannot reach (media decode etc.). No per-row Python at
  the Spark row level; batches arrive as pandas Series.

The spans column itself is NEVER touched — it rides along so the
span-sequence invariant (kind, text, media_ref, order) holds trivially
by construction and is asserted in tests.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import POW2_WORLD_BITS


def _canon_expr():
    """Canonical per-doc string: 'kind\\x01text\\x01media_ref\\x01offset'
    joined with \\x02 in span order. Any change in content OR order
    changes the geocode."""
    return F.concat_ws(
        "\x02",
        F.transform(
            "spans",
            lambda s: F.concat_ws(
                "\x01", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
            ),
        ),
    )


def geocode_jvm(df: DataFrame, world_bits: int = POW2_WORLD_BITS) -> DataFrame:
    """JVM-side geocode: coords/extents from xxhash64 of the canonical
    span string (independent hash streams via seed columns)."""
    e = 1 << world_bits
    canon = _canon_expr()
    out = df.withColumn("_canon", canon)
    h1 = F.xxhash64(F.col("_canon"), F.lit(1))
    h2 = F.xxhash64(F.col("_canon"), F.lit(2))
    h3 = F.xxhash64(F.col("_canon"), F.lit(3))
    h4 = F.xxhash64(F.col("_canon"), F.lit(4))
    return (
        out.withColumn("ix", F.pmod(h1, F.lit(e)))
        .withColumn("iy", F.pmod(h2, F.lit(e)))
        .withColumn("sx", F.pmod(h3, F.lit(97)) + 1)
        .withColumn("sy", F.pmod(h4, F.lit(97)) + 1)
        .drop("_canon")
    )


@pandas_udf(T.ArrayType(T.LongType()))
def _crc_geocode(canon: pd.Series) -> pd.Series:
    e = 1 << POW2_WORLD_BITS

    def one(s: str) -> list[int]:
        b = s.encode("utf-8", "surrogatepass")
        h1 = zlib.crc32(b)
        h2 = zlib.crc32(b, 0xA5A5A5A5)
        h3 = zlib.crc32(b, 0x12345678)
        h4 = zlib.crc32(b, 0x87654321)
        return [h1 % e, h2 % e, h3 % 97 + 1, h4 % 97 + 1]

    return canon.map(one)


def geocode_arrow(df: DataFrame, world_bits: int = POW2_WORLD_BITS) -> DataFrame:
    """Arrow-batched pandas-UDF geocode (crc32 streams). Same output
    columns as geocode_jvm (different hash family, both deterministic)."""
    if world_bits != POW2_WORLD_BITS:
        raise ValueError("arrow geocoder is compiled for POW2_WORLD_BITS")
    out = df.withColumn("_g", _crc_geocode(_canon_expr()))
    return (
        out.withColumn("ix", F.col("_g")[0])
        .withColumn("iy", F.col("_g")[1])
        .withColumn("sx", F.col("_g")[2])
        .withColumn("sy", F.col("_g")[3])
        .drop("_g")
    )


def geocode_oracle(df: DataFrame, world_bits: int = POW2_WORLD_BITS) -> DataFrame:
    """md5-stream geocode twin: same output contract as geocode_jvm but
    every hash is a 60-bit md5 prefix, which DuckDB reproduces
    bit-for-bit (`CAST(('0x'||substr(md5(c),1,15)) AS BIGINT)`) — the
    portability bridge for oracle-exact pipeline queries. Slower than
    xxhash64 (md5 is interpreted); use geocode_jvm on hot paths."""
    e = 1 << world_bits
    out = df.withColumn("_canon", _canon_expr())

    def h(k: int):
        return F.expr(
            f"cast(conv(substr(md5(concat(_canon, chr(3), '{k}')), 1, 15), 16, 10) as bigint)"
        )

    return (
        out.withColumn("ix", h(1) % e)
        .withColumn("iy", h(2) % e)
        .withColumn("sx", h(3) % 97 + 1)
        .withColumn("sy", h(4) % 97 + 1)
        .drop("_canon")
    )


def geocode_oracle_sql(canon: str, world_bits: int = POW2_WORLD_BITS) -> dict[str, str]:
    """DuckDB expressions matching geocode_oracle, given the canonical
    span string SQL fragment ``canon``."""
    e = 1 << world_bits

    def h(k: int) -> str:
        return f"CAST(('0x' || substr(md5(({canon}) || chr(3) || '{k}'), 1, 15)) AS BIGINT)"

    return {
        "ix": f"({h(1)} % {e})",
        "iy": f"({h(2)} % {e})",
        "sx": f"({h(3)} % 97 + 1)",
        "sy": f"({h(4)} % 97 + 1)",
    }


def geocode(df: DataFrame, how: str = "jvm", world_bits: int = POW2_WORLD_BITS) -> DataFrame:
    if how == "jvm":
        return geocode_jvm(df, world_bits)
    if how == "arrow":
        return geocode_arrow(df, world_bits)
    if how == "oracle":
        return geocode_oracle(df, world_bits)
    raise ValueError(f"unknown geocode impl {how!r}")
