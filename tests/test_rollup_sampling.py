"""cell_rollup and deterministic sampling vs brute-force oracles,
plus the plan-shape contracts that make them 100-TB-safe."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from optimizing_spark.operators.rollup import cell_rollup
from optimizing_spark.operators.sampling import (
    bernoulli_sample,
    stratified_sample,
    uniform_hash,
    weighted_sample,
)


@pytest.fixture(scope="module")
def cells_df(spark):
    # 500 rows with a deterministic depth-4 Morton code (0..255) + weights
    rows = [(i, (i * 37 + 11) % 256, i % 7, (i * 3) % 13) for i in range(500)]
    return spark.createDataFrame(rows, "rid long, cell long, qty long, w long")


def test_rollup_matches_pandas(spark, cells_df):
    got = (
        cell_rollup(cells_df, "cell", depth=4, sums=["qty", "w"])
        .toPandas().sort_values(["depth", "code"]).reset_index(drop=True)
    )
    pdf = cells_df.toPandas()
    want = []
    for d in range(0, 5):
        g = (
            pdf.assign(code=pdf.cell.values >> (2 * (4 - d)))
            .groupby("code", as_index=False)
            .agg(n=("rid", "size"), sum_qty=("qty", "sum"), sum_w=("w", "sum"))
        )
        g.insert(0, "depth", d)
        want.append(g)
    want = (
        pd.concat(want).sort_values(["depth", "code"]).reset_index(drop=True)
    )
    assert got.depth.tolist() == want.depth.tolist()
    assert got.code.tolist() == want.code.tolist()
    assert got.n.tolist() == want.n.tolist()
    assert got.sum_qty.tolist() == want.sum_qty.tolist()
    assert got.sum_w.tolist() == want.sum_w.tolist()


def test_rollup_level_totals_invariant(spark, cells_df):
    out = cell_rollup(cells_df, "cell", depth=4, sums=["qty"])
    per_level = (
        out.groupBy("depth")
        .agg(F.sum("n").alias("n"), F.sum("sum_qty").alias("q"),
             F.count("*").alias("cells"))
        .collect()
    )
    assert len(per_level) == 5
    for r in per_level:
        assert r["n"] == 500
        assert r["cells"] <= 4 ** r["depth"]


def test_rollup_two_exchanges_one_scan(spark, cells_df):
    plan = (
        cell_rollup(cells_df, "cell", depth=4, sums=["qty"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # base table aggregated once, pyramid re-agg once — never a
    # per-level union that re-executes the base aggregation
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Union" not in plan


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, f"doc text {i}", ["en", "fr", "de"][i % 3]) for i in range(300)],
        "doc_id long, text string, lang string",
    )


def test_bernoulli_deterministic_and_correct(spark, docs_df):
    a = bernoulli_sample(docs_df, "doc_id", 25, 100)
    b = bernoulli_sample(docs_df.repartition(13, "lang"), "doc_id", 25, 100)
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b
    # membership is exactly the hash predicate
    h = {r.doc_id: r.h for r in
         docs_df.select("doc_id", (uniform_hash("doc_id") % 100).alias("h"))
         .collect()}
    assert ids_a == sorted(d for d, v in h.items() if v < 25)
    # sane rate (binomial 300 @ .25)
    assert 45 <= len(ids_a) <= 105


def test_stratified_exactly_k_and_deterministic(spark, docs_df):
    out = stratified_sample(docs_df, "lang", "doc_id", 10)
    per = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 10, "fr": 10, "de": 10}
    out2 = stratified_sample(
        docs_df.repartition(17, "doc_id"), "lang", "doc_id", 10)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, out2.collect()))
    # k > stratum size: whole stratum survives
    all_rows = stratified_sample(docs_df, "lang", "doc_id", 1000)
    assert all_rows.count() == 300


def test_stratified_plan_pushes_group_limit(spark, docs_df):
    plan = (
        stratified_sample(docs_df, "lang", "doc_id", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partial top-k runs map-side before the single stratum exchange
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# weighted_sample (priority sampling)
# ---------------------------------------------------------------------------

def _pri(key, w, salt="ws"):
    import hashlib
    h = int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16)
    import numpy as np
    # w / u with u = (h+1)/2^60: the power-of-two multiply is exact
    return float(np.float64(w) * np.float64(1 << 60) / np.float64(h + 1))


def _replay(items, k, salt="ws"):
    """NumPy/hashlib replay of the whole scheme: top-k by (priority
    desc, key asc), tau = (k+1)th priority, est_w = max(w, tau)."""
    pri = sorted(((-_pri(key, w, salt), key, w) for key, w in items))
    tau = -pri[k][0] if len(pri) > k else 0.0
    return [(key, w, -np, max(float(w), tau)) for np, key, w in pri[:k]]


@pytest.fixture(scope="module")
def weighted_df(spark):
    # weights 1..97 cycling, incl. zero-weight rows that must sort last
    rows = [(i, (i * 13) % 97 + (0 if i % 50 == 0 else 1))
            for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_weighted_sample_matches_replay(spark, weighted_df):
    got = weighted_sample(
        weighted_df, "w", "doc_id", k=25, with_estimator=True).collect()
    rows = [(r.doc_id, r.w) for r in weighted_df.collect()]
    want = _replay(rows, 25)
    assert [(r.doc_id, r.w, r.priority, r.est_w) for r in got] == want


def test_weighted_sample_partition_invariant(spark, weighted_df):
    a = weighted_sample(weighted_df, "w", "doc_id", k=25).collect()
    b = weighted_sample(
        weighted_df.repartition(11, "w"), "w", "doc_id", k=25).collect()
    assert [(r.doc_id, r.priority) for r in a] == \
        [(r.doc_id, r.priority) for r in b]


def test_weighted_sample_plan_is_take_ordered(spark, weighted_df):
    plan = (
        weighted_sample(weighted_df, "w", "doc_id", k=25)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # map-side local top-k + one tiny reduce; the table never shuffles
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_weighted_sample_small_table_tau_zero(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_id long, w long")
    got = weighted_sample(df, "w", "doc_id", k=10,
                          with_estimator=True).collect()
    assert len(got) == 5
    # N <= k: everything included, tau = 0, est_w = w exactly
    assert all(r.est_w == float(r.w) for r in got)


def test_priority_estimator_unbiased_numpy():
    """Priority sampling's subset-sum estimator E[sum max(w, tau)] =
    sum w for any k (Duffield-Lund-Thorup). Replay the scheme over
    many salts (independent hash draws) in pure NumPy and check the
    mean estimate converges to the true total."""
    items = [(i, (i * 7) % 31 + 1) for i in range(120)]
    total = sum(w for _, w in items)
    k = 20
    ests = []
    for s in range(300):
        samp = _replay(items, k, salt=f"s{s}")
        ests.append(sum(e for _, _, _, e in samp))
    import numpy as np
    mean = float(np.mean(ests))
    assert abs(mean - total) / total < 0.05, (mean, total)
