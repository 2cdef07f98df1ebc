"""Temporal as-of join — "latest right-side state at each left event".

The training-data-pipeline staple (feature backfill: join every
observation to the most recent prior state of its key). The reference
engine has no temporal operators; this extends the engine's join
family (SURVEY §2.2) with the standard union+window as-of plan:

    tag right rows 0 / left rows 1
    -> unionByName (right payload nulled on left rows)
    -> window PARTITION BY key ORDER BY (ts, side, tiebreak)
       last(right_payload IGNORE NULLS) up to the current row
    -> keep left rows

Why this shape at 100 TB: ONE hash shuffle on the join key (same cost
as any equi-join) and a single sort within partitions — never an
inequality join (quadratic candidate blowup) and never a per-key
loop. Skewed keys behave like any window skew (AQE handles the
shuffle; a hot key's partition sort is O(n log n) in that key's rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None = None,
    starts: tuple[str, str] = ("t0", "t0"),
    ends: tuple[str, str] = ("t1", "t1"),
    bucket: int = 3_600_000_000,
) -> DataFrame:
    """Interval-overlap join: all (left, right) pairs (same ``on`` key
    if given) whose closed integer intervals [start, end] overlap.

    The temporal twin of joins.range_join, same three moves:
    (1) each side explodes to the coarse ``bucket``s its interval
    spans, (2) candidates meet in an EQUI-join on (key, bucket) — one
    hash shuffle, never an inequality join (which Spark can only run
    as a nested-loop / cross product), (3) the exact overlap residual
    filters co-bucketed candidates, and each pair is kept only in its
    REPORTING bucket (max of the two start buckets — the first bucket
    both intervals span) so no distinct pass is needed.

    Pick ``bucket`` ~ the typical interval length: shuffle volume is
    rows x spanned-buckets, per-key fan-in is bounded by interval
    density per bucket, and both scale linearly at 100 TB.
    """
    ls, rs = starts
    le, re = ends
    # internal aliases so left/right interval column names never clash
    rb = right.withColumnRenamed(rs, "_rs").withColumnRenamed(re, "_re")

    def spanned(df, s, e):
        return df.withColumn(
            "_b", F.explode(F.sequence(
                F.expr(f"{s} div {bucket}"), F.expr(f"{e} div {bucket}"))))

    keys = ([on] if on else []) + ["_b"]
    overlap = (F.col(ls) <= F.col("_re")) & (F.col("_rs") <= F.col(le))
    reporting = F.col("_b") == F.greatest(
        F.expr(f"{ls} div {bucket}"), F.expr(f"_rs div {bucket}"))
    return (
        spanned(left, ls, le).join(spanned(rb, "_rs", "_re"), keys)
        .filter(overlap & reporting)
        .withColumnRenamed("_rs", rs if rs not in left.columns else f"r_{rs}")
        .withColumnRenamed("_re", re if re not in left.columns else f"r_{re}")
        .drop("_b")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row of the same
    ``on`` key with right_ts <= left_ts (or < when ``strict``).

    right_cols: right columns to carry (default: all but key + ts),
    emitted as ``prefix + name`` (ts itself as ``prefix + right_ts``);
    NULLs when no prior right row exists (left-join semantics).
    tiebreak: column ordering equal-timestamp right rows — the LARGEST
    wins (deterministic result under any partitioning); required for
    exactness when right timestamps can collide.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else [F.lit(0).alias("_tb")]),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
    )
    # at equal ts the right row must sort BEFORE the left row for
    # inclusive semantics (and AFTER it for strict)
    side_rank = F.col("_side") if not strict else (1 - F.col("_side"))
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), side_rank.asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        F.col(f"_m.{right_ts}").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def interval_union(
    df: DataFrame,
    on: str,
    t0: str = "t0",
    t1: str = "t1",
) -> DataFrame:
    """Per-key UNION of closed integer intervals [t0, t1] — the
    gaps-and-islands merge (total activity coverage, uptime stitching,
    contiguous-session islands): one output row per maximal merged
    interval with the count of inputs it absorbed. The 1-D twin of
    measure.union_area's y-interval merge, promoted to a first-class
    operator.

    Closed-integer convention: ADJACENT intervals merge ([1,5] and
    [6,9] leave no uncovered instant, so they form one island [1,9]);
    a gap exists iff next t0 >= prev max t1 + 2. Degenerate inputs
    (t1 < t0) are treated as their normalization would be by the
    caller — they still sort and merge by the stated algebra.

    Plan: ONE hash shuffle on the key drives a single window pass
    (sort by (t0, t1), running max of t1 over preceding rows, new
    island when t0 > prevmax + 1, island id = prefix sum of flags)
    plus the per-island aggregate in the same exchange. Never an
    interval self-join; group structure depends only on the sorted
    multiset, so the result is engine-portable with no tiebreak rules.

    Returns (on, m_t0, m_t1, n_merged)."""
    # collapse duplicate intervals to a weight FIRST: the merge sort is
    # then a TOTAL order per key (no (_t0, _t1) ties), so an engine
    # that evaluates the island flag and its prefix sum in two
    # separate sorts (DuckDB) cannot permute tied rows differently
    # between them — the same collapse-before-prefix-sum principle as
    # peak_concurrency's boundary collapse. Counts survive as weights.
    w = Window.partitionBy(on).orderBy("_t0", "_t1")
    prevmax = F.max("_t1").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.select(
        F.col(on),
        F.col(t0).cast("long").alias("_t0"),
        F.col(t1).cast("long").alias("_t1"),
    ).groupBy(on, "_t0", "_t1").agg(F.count("*").alias("_w")) \
        .withColumn(
        "_new",
        F.when(prevmax.isNull()
               | (F.col("_t0") > prevmax + 1), 1).otherwise(0),
    ).withColumn(
        "_grp",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(on, "_grp")
        .agg(F.min("_t0").alias("m_t0"), F.max("_t1").alias("m_t1"),
             F.sum("_w").alias("n_merged"))
        .select(on, "m_t0", "m_t1", "n_merged")
    )


def interval_union_sql(
    intervals_sql: str, on: str, t0: str = "t0", t1: str = "t1"
) -> str:
    """DuckDB twin of interval_union — identical sort, running-max
    island flags and per-island aggregates, bit-exact BIGINT."""
    return f"""
        WITH ivals AS (
            -- duplicates collapse to a weight FIRST so the merge sort
            -- is a total order (no (_t0, _t1) ties between the flag
            -- window and the prefix-sum window), mirroring Spark
            SELECT {on}, CAST({t0} AS BIGINT) AS _t0,
                   CAST({t1} AS BIGINT) AS _t1,
                   count(*) AS _w
            FROM ({intervals_sql})
            GROUP BY {on}, CAST({t0} AS BIGINT), CAST({t1} AS BIGINT)
        ),
        flagged AS (
            SELECT {on}, _t0, _t1, _w,
                   CASE WHEN max(_t1) OVER (
                            PARTITION BY {on} ORDER BY _t0, _t1
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                          OR _t0 > max(_t1) OVER (
                            PARTITION BY {on} ORDER BY _t0, _t1
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) + 1
                        THEN 1 ELSE 0 END AS _new
            FROM ivals
        ),
        grp AS (
            SELECT {on}, _t0, _t1, _w,
                   CAST(sum(_new) OVER (
                       PARTITION BY {on} ORDER BY _t0, _t1
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS _grp
            FROM flagged
        )
        SELECT {on}, CAST(min(_t0) AS BIGINT) AS m_t0,
               CAST(max(_t1) AS BIGINT) AS m_t1,
               CAST(sum(_w) AS BIGINT) AS n_merged
        FROM grp GROUP BY {on}, _grp
    """


def peak_concurrency(
    df: DataFrame,
    on: str,
    t0: str = "t0",
    t1: str = "t1",
) -> DataFrame:
    """Per-key PEAK concurrency of closed integer intervals [t0, t1]
    and the earliest instant it is attained — the classic sweep-line
    (max simultaneous sessions / viewers / open orders), the
    aggregation companion to interval_join.

    Sweep line as DataFrame ops, exactly once per boundary: each
    interval contributes (+1 at t0) and (−1 at t1+1, the closed-
    interval convention — touching intervals DO overlap at the shared
    instant); deltas COLLAPSE per (key, t) with one hash aggregation
    BEFORE the running sum, so the prefix sum is order-unambiguous at
    equal timestamps and therefore engine-portable with no tiebreak
    rules. Then one key-partitioned window computes the running count
    and its per-key max in the same exchange, and the earliest arg-max
    falls out of a final tiny aggregate. All integers end to end.

    Scale shape: 2 rows per interval, ONE hash shuffle on (key, t),
    one window exchange on key (the collapsed boundary rows — at most
    2x intervals, usually far fewer), never an interval self-join.
    Skewed keys cost what their boundary count costs; the per-t
    collapse is the map-side combine.

    Returns one row per key: (on, peak, at_t)."""
    up = df.select(F.col(on), F.col(t0).cast("long").alias("t"),
                   F.lit(1).cast("long").alias("d"))
    down = df.select(F.col(on), (F.col(t1).cast("long") + 1).alias("t"),
                     F.lit(-1).cast("long").alias("d"))
    deltas = up.unionByName(down).groupBy(on, "t").agg(
        F.sum("d").alias("d"))
    w_run = (
        Window.partitionBy(on).orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_key = Window.partitionBy(on)
    r = deltas.withColumn("running", F.sum("d").over(w_run)) \
        .withColumn("_peak", F.max("running").over(w_key))
    return r.filter(F.col("running") == F.col("_peak")).groupBy(on).agg(
        F.max("running").alias("peak"),
        F.min("t").alias("at_t"),
    )


def peak_concurrency_sql(
    intervals_sql: str, on: str, t0: str = "t0", t1: str = "t1"
) -> str:
    """DuckDB twin of peak_concurrency: identical boundary collapse,
    prefix sum, and earliest-arg-max — all integer, bit-exact
    (DuckDB's SUM widens to HUGEINT, so every output is cast back to
    BIGINT)."""
    return f"""
        WITH ivals AS ({intervals_sql}),
        b AS (
            SELECT {on}, CAST({t0} AS BIGINT) AS t, 1 AS d FROM ivals
            UNION ALL
            SELECT {on}, CAST({t1} AS BIGINT) + 1 AS t, -1 AS d
            FROM ivals
        ),
        c AS (
            SELECT {on}, t, CAST(sum(d) AS BIGINT) AS d
            FROM b GROUP BY {on}, t
        ),
        r AS (
            SELECT {on}, t,
                   CAST(sum(d) OVER (PARTITION BY {on} ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
            FROM c
        ),
        p AS (
            SELECT {on}, t, running,
                   MAX(running) OVER (PARTITION BY {on}) AS peak
            FROM r
        )
        SELECT {on}, CAST(max(running) AS BIGINT) AS peak,
               CAST(min(t) AS BIGINT) AS at_t
        FROM p WHERE running = peak GROUP BY {on}
    """
