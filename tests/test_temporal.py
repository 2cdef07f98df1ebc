"""asof_join vs a brute-force pandas oracle: inclusive/strict modes,
no-match NULLs, equal-timestamp ties, and partitioning determinism."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from optimizing_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:05:00"), "a"),
            (2, 10, _ts("2024-01-01T00:10:00"), "b"),
            (3, 10, _ts("2024-01-01T00:00:00"), "c"),  # before any right
            (4, 20, _ts("2024-01-01T01:00:00"), "d"),  # key with no right
            (5, 30, _ts("2024-01-01T00:10:00"), "e"),  # exact-tie with right
        ],
        "lid long, k long, ts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T00:04:00"), 1.0),
            (101, 10, _ts("2024-01-01T00:08:00"), 2.0),
            (102, 10, _ts("2024-01-01T00:08:00"), 3.0),  # same-ts pair: larger rid wins
            (103, 30, _ts("2024-01-01T00:10:00"), 4.0),  # == left ts
        ],
        "rid long, k long, ts timestamp_ntz, v double",
    )
    return left, right


def _brute(left_rows, right_rows, strict):
    out = {}
    for lid, k, lts in left_rows:
        best = None
        for rid, rk, rts, v in right_rows:
            if rk != k:
                continue
            if (rts > lts) if not strict else (rts >= lts):
                continue
            if best is None or (rts, rid) > (best[2], best[0]):
                best = (rid, rk, rts, v)
        out[lid] = best
    return out


@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_brute_force(spark, frames, strict):
    left, right = frames
    got = {
        r["lid"]: (r["asof_ts"], r["asof_v"], r["asof_rid"])
        for r in asof_join(
            left, right, on="k", right_cols=["v", "rid"],
            strict=strict, tiebreak="rid",
        ).collect()
    }
    lrows = [(r.lid, r.k, r.ts) for r in left.collect()]
    rrows = [(r.rid, r.k, r.ts, r.v) for r in right.collect()]
    want = _brute(lrows, rrows, strict)
    assert set(got) == set(want)
    for lid, best in want.items():
        if best is None:
            assert got[lid] == (None, None, None), lid
        else:
            rid, _, rts, v = best
            assert got[lid] == (rts, v, rid), lid


def test_asof_keeps_left_columns_and_rowcount(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", right_cols=["v"], tiebreak="rid")
    assert out.columns == ["lid", "k", "ts", "tag", "asof_ts", "asof_v"]
    assert out.count() == left.count()


def test_asof_deterministic_under_repartition(spark, frames):
    left, right = frames
    a = asof_join(left, right, on="k", right_cols=["v"], tiebreak="rid")
    b = asof_join(
        left.repartition(7, "ts"), right.repartition(5, "v"),
        on="k", right_cols=["v"], tiebreak="rid",
    )
    pa = a.toPandas().sort_values("lid").reset_index(drop=True)
    pb = b.toPandas().sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)


def test_asof_single_shuffle_plan(spark, frames):
    """The 100-TB contract: ONE hash exchange on the key, no join
    operator at all (never an inequality/nested-loop join)."""
    left, right = frames
    plan = asof_join(
        left, right, on="k", right_cols=["v"], tiebreak="rid",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def interval_frames(spark):
    import random

    rng = random.Random(7)
    left = [(i, rng.randrange(5), (t0 := rng.randrange(0, 100_000)),
             t0 + rng.randrange(1, 15_000)) for i in range(300)]
    right = [(1000 + i, rng.randrange(5), (t0 := rng.randrange(0, 100_000)),
              t0 + rng.randrange(1, 15_000)) for i in range(300)]
    l = spark.createDataFrame(left, ["a_id", "k", "t0", "t1"])
    r = spark.createDataFrame(right, ["b_id", "k", "t0", "t1"])
    return left, right, l, r


def test_interval_join_matches_brute_force(spark, interval_frames):
    from optimizing_spark.operators.temporal import interval_join

    left, right, l, r = interval_frames
    got = {(row["a_id"], row["b_id"])
           for row in interval_join(l, r, on="k", bucket=10_000).collect()}
    want = {(a, b)
            for a, ka, a0, a1 in left
            for b, kb, b0, b1 in right
            if ka == kb and a0 <= b1 and b0 <= a1}
    assert got == want and len(want) > 100
    # each pair exactly once (reporting-bucket dedup, no distinct pass)
    rows = interval_join(l, r, on="k", bucket=10_000).count()
    assert rows == len(want)


def test_interval_join_plan_has_no_nested_loop(spark, interval_frames):
    from optimizing_spark.operators.temporal import interval_join

    _, _, l, r = interval_frames
    plan = interval_join(l, r, on="k", bucket=10_000) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# peak_concurrency (sweep line)
# ---------------------------------------------------------------------------

def _brute_peak(ivals):
    """Brute closed-interval concurrency: evaluate the count at every
    start point (the max of a step function that only rises at starts
    is attained at a start), earliest argmax."""
    best_n, best_t = 0, None
    for s, _ in ivals:
        n = sum(1 for a, b in ivals if a <= s <= b)
        if n > best_n or (n == best_n and (best_t is None or s < best_t)):
            best_n, best_t = n, s
    return best_n, best_t


def test_peak_concurrency_matches_brute(spark):
    from optimizing_spark.operators.temporal import peak_concurrency

    rng = np.random.default_rng(42)
    rows = []
    per_key = {}
    for k in range(6):
        ivs = []
        for _ in range(40):
            s = int(rng.integers(0, 300))
            e = s + int(rng.integers(0, 60))
            ivs.append((s, e))
            rows.append((k, s, e))
        per_key[k] = ivs
    # forced degenerates: touching endpoints overlap (closed), and a
    # key with one interval peaks at 1 at its own start
    rows += [(7, 0, 5), (7, 5, 9), (8, 100, 100)]
    per_key[7] = [(0, 5), (5, 9)]
    per_key[8] = [(100, 100)]
    df = spark.createDataFrame(rows, "user_id long, t0 long, t1 long")
    got = {r.user_id: (r.peak, r.at_t)
           for r in peak_concurrency(df, on="user_id").collect()}
    assert set(got) == set(per_key)
    for k, ivs in per_key.items():
        assert got[k] == _brute_peak(ivs), k
    assert got[7] == (2, 5)  # the closed-interval touch convention


def test_peak_concurrency_partition_invariant(spark):
    from optimizing_spark.operators.temporal import peak_concurrency

    rows = [(i % 5, (i * 17) % 200, (i * 17) % 200 + i % 30)
            for i in range(500)]
    df = spark.createDataFrame(rows, "user_id long, t0 long, t1 long")
    a = sorted(map(tuple, peak_concurrency(df, on="user_id").collect()))
    b = sorted(map(tuple, peak_concurrency(
        df.repartition(13, "t0"), on="user_id").collect()))
    assert a == b
