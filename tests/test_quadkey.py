"""quadkey (Bing tile-system string codes) vs a Python reference:
full 64x64 bijection at depth 6, the parent-is-prefix property, and
digit convention (x bit -> 1, y bit -> 2)."""

from pyspark.sql import functions as F

from optimizing_spark.functions.cells import quadkey


def _ref(cx, cy, depth):
    out = []
    for level in range(depth - 1, -1, -1):
        out.append(str(((cx >> level) & 1) + 2 * ((cy >> level) & 1)))
    return "".join(out)


def test_quadkey_bijection_and_prefix(spark):
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("cx"),
        (F.col("id") / 64).cast("long").alias("cy"))
    rows = df.select(
        "cx", "cy",
        quadkey(F.col("cx"), F.col("cy"), 6).alias("qk6"),
        quadkey(F.shiftright("cx", 1), F.shiftright("cy", 1), 5)
        .alias("qk5"),
    ).collect()
    seen = set()
    for r in rows:
        want = _ref(r["cx"], r["cy"], 6)
        assert r["qk6"] == want
        assert len(r["qk6"]) == 6
        seen.add(r["qk6"])
        # parent tile key is exactly the prefix
        assert r["qk5"] == r["qk6"][:5]
    assert len(seen) == 64 * 64  # bijective


def test_quadkey_digit_convention(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1)], "cx long, cy long"
    ).select(quadkey(F.col("cx"), F.col("cy"), 1).alias("qk")).collect()
    assert sorted(r["qk"] for r in rows) == ["0", "1", "2", "3"]
