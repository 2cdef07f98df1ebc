"""Spatial autocorrelation over the cell index: Moran's I (Moran 1950)
and Geary's C (Geary 1954) with binary 8-adjacency weights — the
classic "is this surface clustered, random, or dispersed?" statistics,
computed EXACTLY in integers until one final IEEE division.

The trick that keeps both engines bit-identical (same discipline as the
shoelace/IDW operators): multiply the mean through. With N occupied
cells, S = Σx, and over the W ordered neighbor pairs P1 = Σ x_i·x_j,
P2 = Σ (x_i + x_j),

    Σ_pairs (N·x_i − S)(N·x_j − S)  =  N²·P1 − N·S·P2 + W·S²  (num_moran)
    N · Σ_i (x_i − x̄)²             =  N·Σx² − S²              (den1)

so the N-powers cancel in the ratios and

    I = (N/W) · Σp(x_i−x̄)(x_j−x̄) / Σ(x−x̄)²  =  num_moran / (W · den1)
    C = (N−1)/(2W) · Σp(x_i−x_j)² / Σ(x−x̄)²  =  N(N−1)·num_geary / (2W·den1)

— every operand a BIGINT, ONE double division each, no libm and no
accumulation-order sensitivity, so the DuckDB twin matches bit-for-bit.
Degenerate inputs surface as NULL: a constant field (den1 = 0) has no
defined autocorrelation, and neither does a graph with no neighbor
pairs (W = 0); both still return the one components row.

Plan shape (the 100 TB story): the point table collapses to occupied
cells with ONE hash aggregation; the neighbor join explodes each cell
to its 8 Chebyshev offsets and equi-joins on the shifted cell key —
exactly the focal/kring shuffle shape, uniform keys, never a distance
or inequality join; pair sums reduce with a KEYLESS global aggregate
(map-side partial combine to one row) and meet the 1-row cell globals
in a broadcast crossJoin. Distributed analog of the reference's
neighbor-ring load (WorldPartition.hpp:194-213) put to statistical use.

Overflow bounds (ANSI-safe): num_moran's largest term is N²·P1 ≤
N²·W·max(x)²; callers at extreme scale pre-bucket x (cell counts fit
comfortably: N ~ 10⁶ cells with max(x) ~ 10³ and W ~ 8N stays < 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                    if (dx, dy) != (0, 0)]


def spatial_autocorr(
    cells: DataFrame,
    val: str = "n",
    cx: str = "cx",
    cy: str = "cy",
) -> DataFrame:
    """One-row DataFrame of exact autocorrelation components + the two
    statistics, over a per-cell table (one row per OCCUPIED cell;
    missing cells are non-entities, the standard lattice-data
    convention). Columns: n_cells, w_pairs, sum_x, num_moran,
    num_geary, den1, moran_i, geary_c."""
    c = cells.select(
        F.col(cx).cast("long").alias("cx"),
        F.col(cy).cast("long").alias("cy"),
        F.col(val).cast("long").alias("x"),
    )
    glob = c.agg(
        F.count("*").alias("n_cells"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in NEIGHBOR_OFFSETS
    ])
    left = c.select("x", "cx", "cy", F.explode(offs).alias("o")).select(
        F.col("x").alias("x_i"),
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    pairs = left.join(
        c.select(F.col("cx").alias("jx"), F.col("cy").alias("jy"),
                 F.col("x").alias("x_j")),
        on=["jx", "jy"],
    )
    # keyless global agg: exactly one row even with zero pairs
    pair_agg = pairs.agg(
        F.count("*").alias("w_pairs"),
        F.coalesce(F.sum(F.col("x_i") * F.col("x_j")), F.lit(0))
        .alias("p1"),
        F.coalesce(F.sum(F.col("x_i") + F.col("x_j")), F.lit(0))
        .alias("p2"),
        F.coalesce(F.sum((F.col("x_i") - F.col("x_j"))
                         * (F.col("x_i") - F.col("x_j"))), F.lit(0))
        .alias("num_geary"),
    )
    n, s = F.col("n_cells"), F.col("sum_x")
    num_moran = (n * n * F.col("p1") - n * s * F.col("p2")
                 + F.col("w_pairs") * s * s)
    den1 = n * F.col("sum_x2") - s * s
    ok = (F.col("den1") > 0) & (F.col("w_pairs") > 0)
    return pair_agg.crossJoin(F.broadcast(glob)).select(
        "n_cells", "w_pairs", "sum_x",
        num_moran.alias("num_moran"),
        "num_geary",
        den1.alias("den1"),
    ).select(
        "*",
        F.when(ok, F.col("num_moran").cast("double")
               / (F.col("w_pairs") * F.col("den1")).cast("double"))
        .alias("moran_i"),
        F.when(ok, (F.col("n_cells") * (F.col("n_cells") - F.lit(1))
                    * F.col("num_geary")).cast("double")
               / (F.lit(2) * F.col("w_pairs") * F.col("den1"))
               .cast("double"))
        .alias("geary_c"),
    )


def spatial_autocorr_sql(cells_sql: str, val: str = "n",
                         cx: str = "cx", cy: str = "cy") -> str:
    """DuckDB twin: the identical integer algebra over the same
    occupied-cell table (``cells_sql`` must yield one row per cell).
    The two doubles are each ONE division of two exact BIGINT
    products, so they agree with Spark bit-for-bit."""
    offs = ",".join(f"({dx},{dy})" for dx, dy in NEIGHBOR_OFFSETS)
    return f"""
        WITH cells AS (
            SELECT CAST({cx} AS BIGINT) AS cx, CAST({cy} AS BIGINT) AS cy,
                   CAST({val} AS BIGINT) AS x
            FROM ({cells_sql}) base
        ),
        gstats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_cells,
                   CAST(sum(x) AS BIGINT) AS sum_x,
                   CAST(sum(x * x) AS BIGINT) AS sum_x2
            FROM cells
        ),
        offs AS (SELECT * FROM (VALUES {offs}) o(dx, dy)),
        pairs AS (
            SELECT a.x AS x_i, b.x AS x_j
            FROM cells a CROSS JOIN offs o
            JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        ),
        pair_agg AS (
            SELECT CAST(count(*) AS BIGINT) AS w_pairs,
                   COALESCE(CAST(sum(x_i * x_j) AS BIGINT), 0) AS p1,
                   COALESCE(CAST(sum(x_i + x_j) AS BIGINT), 0) AS p2,
                   COALESCE(CAST(sum((x_i - x_j) * (x_i - x_j))
                                 AS BIGINT), 0) AS num_geary
            FROM pairs
        ),
        comp AS (
            SELECT g.n_cells, p.w_pairs, g.sum_x,
                   g.n_cells * g.n_cells * p.p1
                   - g.n_cells * g.sum_x * p.p2
                   + p.w_pairs * g.sum_x * g.sum_x AS num_moran,
                   p.num_geary,
                   g.n_cells * g.sum_x2 - g.sum_x * g.sum_x AS den1
            FROM pair_agg p CROSS JOIN gstats g
        )
        SELECT n_cells, w_pairs, sum_x, num_moran, num_geary, den1,
               CASE WHEN den1 > 0 AND w_pairs > 0
                    THEN CAST(num_moran AS DOUBLE)
                         / CAST(w_pairs * den1 AS DOUBLE)
               END AS moran_i,
               CASE WHEN den1 > 0 AND w_pairs > 0
                    THEN CAST(n_cells * (n_cells - 1)
                              * num_geary AS DOUBLE)
                         / CAST(2 * w_pairs * den1 AS DOUBLE)
               END AS geary_c
        FROM comp
    """


STAR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def getis_ord_gstar(
    cells: DataFrame,
    val: str = "n",
    cx: str = "cx",
    cy: str = "cy",
) -> DataFrame:
    """Per-cell Getis-Ord Gi* hot/cold-spot z-scores (Ord & Getis
    1995) with binary queen weights INCLUDING self (the * variant) —
    the LOCAL companion to the global Moran/Geary row: q_moran says
    "the surface is clustered", Gi* says WHERE. Same occupied-cell
    convention as spatial_autocorr.

    Multiply the mean through as usual; with N cells, Sx = Σx,
    nbr_i = Σ_{j∈ring*(i)} x_j and W_i = |ring*(i)|,

        num_i = N·nbr_i − Sx·W_i                 (BIGINT)
        A     = N·Σx² − Sx²  (= N²·σ²·N)         (BIGINT)
        B_i   = W_i·(N − W_i)                    (BIGINT)
        z_i   = num_i / sqrt(A·B_i / (N−1))

    The z is engine-portable because every float step — BIGINT→DOUBLE
    conversion, one multiply, one divide, sqrt (IEEE-754 REQUIRES
    sqrt correctly rounded; q_ray_circle already banks on it), one
    final divide — is a single correctly-rounded op written in the
    same order in both engines. Degenerate cells (N < 2, A = 0, or
    W_i = N, i.e. a lattice so small everything neighbors everything)
    get NULL z with exact integer components intact.

    Plan: the focal scatter-gather (9-offset explode + equi-join on
    the shifted cell key + ONE hash agg) + a 1-row broadcast of the
    globals — the q_focal shuffle shape with statistics on top.

    Returns one row per occupied cell:
    (cx, cy, x, w_i, nbr_sum, num, z)."""
    c = cells.select(
        F.col(cx).cast("long").alias("cx"),
        F.col(cy).cast("long").alias("cy"),
        F.col(val).cast("long").alias("x"),
    )
    glob = c.agg(
        F.count("*").alias("n_cells"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in STAR_OFFSETS
    ])
    contrib = c.select("x", "cx", "cy", F.explode(offs).alias("o")).select(
        F.col("x").alias("x_j"),
        (F.col("cx") + F.col("o.dx")).alias("tx"),
        (F.col("cy") + F.col("o.dy")).alias("ty"),
    )
    ring = contrib.join(
        c.select(F.col("cx").alias("tx"), F.col("cy").alias("ty"),
                 F.col("x")),
        on=["tx", "ty"],
    ).groupBy("tx", "ty", "x").agg(
        F.count("*").alias("w_i"),
        F.sum("x_j").alias("nbr_sum"),
    )
    n, s = F.col("n_cells"), F.col("sum_x")
    num = n * F.col("nbr_sum") - s * F.col("w_i")
    a = n * F.col("sum_x2") - s * s
    b = F.col("w_i") * (n - F.col("w_i"))
    ok = (n > 1) & (F.col("a") > 0) & (F.col("b") > 0)
    return ring.crossJoin(F.broadcast(glob)).select(
        F.col("tx").alias("cx"), F.col("ty").alias("cy"), "x", "w_i",
        "nbr_sum",
        num.alias("num"), a.alias("a"), b.alias("b"), "n_cells",
    ).select(
        "cx", "cy", "x", "w_i", "nbr_sum", "num",
        F.when(
            ok,
            F.col("num").cast("double")
            / F.sqrt(F.col("a").cast("double") * F.col("b").cast("double")
                     / (F.col("n_cells") - F.lit(1)).cast("double")),
        ).alias("z"),
    )


def getis_ord_gstar_sql(cells_sql: str, val: str = "n",
                        cx: str = "cx", cy: str = "cy") -> str:
    """DuckDB twin of getis_ord_gstar: identical integers, identical
    float op order — z agrees bit-for-bit."""
    offs = ",".join(f"({dx},{dy})" for dx, dy in STAR_OFFSETS)
    return f"""
        WITH cells AS (
            SELECT CAST({cx} AS BIGINT) AS cx, CAST({cy} AS BIGINT) AS cy,
                   CAST({val} AS BIGINT) AS x
            FROM ({cells_sql}) base
        ),
        gstats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_cells,
                   CAST(sum(x) AS BIGINT) AS sum_x,
                   CAST(sum(x * x) AS BIGINT) AS sum_x2
            FROM cells
        ),
        offs AS (SELECT * FROM (VALUES {offs}) o(dx, dy)),
        ring AS (
            SELECT b.cx, b.cy, b.x,
                   CAST(count(*) AS BIGINT) AS w_i,
                   CAST(sum(a.x) AS BIGINT) AS nbr_sum
            FROM cells a CROSS JOIN offs o
            JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
            GROUP BY b.cx, b.cy, b.x
        ),
        comp AS (
            SELECT r.cx, r.cy, r.x, r.w_i, r.nbr_sum,
                   g.n_cells * r.nbr_sum - g.sum_x * r.w_i AS num,
                   g.n_cells * g.sum_x2 - g.sum_x * g.sum_x AS a,
                   r.w_i * (g.n_cells - r.w_i) AS b,
                   g.n_cells
            FROM ring r CROSS JOIN gstats g
        )
        SELECT cx, cy, x, w_i, nbr_sum, num,
               CASE WHEN n_cells > 1 AND a > 0 AND b > 0
                    THEN CAST(num AS DOUBLE)
                         / sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
                                / CAST(n_cells - 1 AS DOUBLE))
               END AS z
        FROM comp
    """
