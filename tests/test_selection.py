"""Scale-safe threshold-cut top-k (operators/selection.py): exact
set-equality against the global-rank window form at two corpus sizes,
tie-mass boundaries (the realistic adversary — a cut falling inside a
block of identically-scored rows), the integer tie-refinement path,
and the plan contract (the returned plan carries NO window and NO
single-partition exchange)."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.selection import (
    kth_boundary,
    kth_boundary_int,
    topk_threshold_cut,
)

SF_T2 = "/root/testdata/sf0.01"


def _ids(df, id_col="doc_id"):
    return sorted(r[id_col] for r in df.select(id_col).collect())


@pytest.fixture(scope="module")
def scores(db):
    from deep_db_learning_spark.operators.dsir import (
        dsir_scores,
        fit_dsir_weights,
    )

    docs = db.df("documents")
    lam = fit_dsir_weights(
        docs.where(F.col("source") == "src0"), docs, n_buckets=256
    )
    return dsir_scores(docs, lam).cache()


def test_cut_equals_window_form_two_sizes(spark, scores):
    """The threshold cut keeps EXACTLY the window form's rows — on the
    sf0.001 score frame and on the 10× sf0.01 frame."""
    from deep_db_learning_spark.operators.dsir import select_top_k

    for k in (1, 25, 499):
        want = _ids(select_top_k(scores, k, exact_window=True))
        got = _ids(select_top_k(scores, k))
        assert got == want, f"k={k}"

    from deep_db_learning_spark.operators.dsir import (
        dsir_scores,
        fit_dsir_weights,
    )
    from deep_db_learning_spark.sources import load_testdata

    db2 = load_testdata(spark, SF_T2)
    docs2 = db2.df("documents")
    lam2 = fit_dsir_weights(
        docs2.where(F.col("source") == "src0"), docs2, n_buckets=256
    )
    s2 = dsir_scores(docs2, lam2).cache()
    for k in (100, 3000):
        assert _ids(select_top_k(s2, k)) == _ids(
            select_top_k(s2, k, exact_window=True)
        ), f"sf0.01 k={k}"
    s2.unpersist()


def test_gumbel_cut_equals_window_form(scores):
    from deep_db_learning_spark.operators.dsir import gumbel_select

    for k in (10, 200):
        assert _ids(gumbel_select(scores, k, seed=7)) == _ids(
            gumbel_select(scores, k, seed=7, exact_window=True)
        )


def test_weighted_sample_cut_equals_window_form(db):
    from deep_db_learning_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    cust = db.df("customer").select(
        "c_custkey", F.abs(F.col("c_acctbal")).alias("w")
    )
    for k in (5, 120):
        got = weighted_sample_without_replacement(cust, "w", k, "c_custkey")
        want = weighted_sample_without_replacement(
            cust, "w", k, "c_custkey", exact_window=True
        )
        assert _ids(got, "c_custkey") == _ids(want, "c_custkey")


def test_tie_mass_boundary(spark):
    """The cut lands inside a block of 5_000 rows that share ONE score
    (the empty-document 0.0 mass): the id tie-breaker must pick the
    smallest ids, identically to the window form — through the bounded
    collect AND through the integer histogram refinement (forced by a
    tiny collect_cap)."""
    rows = [(i, 1.0) for i in range(100)] + [
        (i, 0.0) for i in range(100, 5100)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    k = 1234
    want = list(range(100)) + list(range(100, 100 + k - 100))
    got = topk_threshold_cut(df, "score", k, "doc_id")
    assert _ids(got) == want
    # force the integer-refinement path: tie set (5000) > collect_cap
    got2 = topk_threshold_cut(
        df, "score", k, "doc_id", n_bins=16, collect_cap=64
    )
    assert _ids(got2) == want


def test_string_id_tiebreak_and_cap_raise(spark):
    """String ids resolve ties through the bounded collect (binary
    UTF-8 order == python sort order) and raise loudly past the cap."""
    rows = [(f"d{i:05d}", 0.5) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, score double")
    got = topk_threshold_cut(df, "score", 17, "doc_id")
    assert _ids(got) == [f"d{i:05d}" for i in range(17)]
    with pytest.raises(RuntimeError, match="non-integral"):
        topk_threshold_cut(
            df, "score", 17, "doc_id", n_bins=4, collect_cap=8
        )


def test_k_edges(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id bigint, score double"
    )
    assert topk_threshold_cut(df, "score", 0, "doc_id").count() == 0
    assert topk_threshold_cut(df, "score", 10, "doc_id").count() == 10
    assert topk_threshold_cut(df, "score", 99, "doc_id").count() == 10
    assert _ids(topk_threshold_cut(df, "score", 3, "doc_id")) == [7, 8, 9]


def test_ascending_order(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], "doc_id bigint, score double"
    )
    got = topk_threshold_cut(df, "score", 9, "doc_id", descending=False)
    rows = sorted(
        [(r["score"], r["doc_id"]) for r in df.collect()]
    )[:9]
    assert _ids(got) == sorted(i for _s, i in rows)


def test_kth_boundary_exact(spark):
    import random

    rng = random.Random(5)
    vals = [rng.uniform(-10, 10) for _ in range(4000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id bigint, key double"
    )
    ordered = sorted(vals, reverse=True)
    for k in (1, 777, 4000):
        v, nb, ne = kth_boundary(df, "key", k, n_bins=32, collect_cap=128)
        assert v == ordered[k - 1]
        assert nb == sum(1 for x in vals if x > v)
        assert ne == sum(1 for x in vals if x == v)


def test_kth_boundary_int_exact(spark):
    ids = [i * 37 % 10007 for i in range(10007)]  # a permutation
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    for k in (1, 5000, 10007):
        assert (
            kth_boundary_int(df, "doc_id", k, n_bins=16, collect_cap=256)
            == sorted(ids)[k - 1]
        )


def test_plan_has_no_window_and_no_single_partition_exchange(scores):
    """The contract the module exists for: the RETURNED selection plan
    is filter-only — zero Window operators, zero single-partition
    exchanges (the probe jobs already ran; they are not in this
    plan)."""
    from deep_db_learning_spark.operators.dsir import select_top_k

    plan = select_top_k(scores, 50)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan

def test_null_keys_excluded_and_fraction_mode(spark):
    """NULL keys are outside the contract (excluded up front — a SQL
    rank orders them last, so kept sets agree for k ≤ non-NULL count);
    fraction mode derives k = ceil(f·n) from the cut's own count."""
    rows = [(i, float(i)) for i in range(40)] + [(100 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    got = topk_threshold_cut(df, "score", 10, "doc_id")
    assert _ids(got) == list(range(30, 40))
    # k covers every non-null row: nulls still excluded
    assert _ids(topk_threshold_cut(df, "score", 40, "doc_id")) == list(range(40))
    # fraction mode
    fr = topk_threshold_cut(df, "score", None, "doc_id", fraction=0.25)
    assert _ids(fr) == list(range(30, 40))  # ceil(0.25*40) = 10
    assert topk_threshold_cut(df, "score", None, "doc_id", fraction=0.0).count() == 0
    assert topk_threshold_cut(
        df, "score", None, "doc_id", fraction=1.0
    ).count() == 40
    with pytest.raises(ValueError, match="exactly one"):
        topk_threshold_cut(df, "score", 5, "doc_id", fraction=0.5)


def test_budget_threshold_cut_equals_window_cumsum(spark, db):
    """Budgeted selection ≡ the window form (greedy prefix of
    ORDER BY key DESC, id with cumulative weight ≤ budget), across
    budgets, orders, tie-heavy keys, and a collect_cap tight enough to
    force several refinement rounds."""
    from decimal import Decimal

    from pyspark.sql.window import Window

    from deep_db_learning_spark.operators.selection import (
        budget_threshold_cut,
    )

    li = db.df("lineitem").select(
        F.monotonically_increasing_id().alias("rid"),
        F.col("l_extendedprice").alias("key"),
        (F.col("l_quantity") + 1).alias("w"),
    ).localCheckpoint(eager=True)
    # tie-heavy variant: key quantized to a few hundred distinct values
    tied = li.select(
        "rid", F.floor(F.col("key") / 1000).cast("double").alias("key"), "w"
    ).localCheckpoint(eager=True)

    def window_form(df, budget, descending):
        order = [F.col("key").desc() if descending else F.col("key").asc(),
                 F.col("rid")]
        w = (
            Window.orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.sum(F.col("w").cast("decimal(30,9)")).over(w)
        return {
            r["rid"]
            for r in df.withColumn("__c", cum)
            .where(F.col("__c") <= F.lit(Decimal(str(budget))).cast(
                "decimal(30,9)"))
            .collect()
        }

    total = li.agg(F.sum("w")).first()[0]
    for frame in (li, tied):
        for descending in (True, False):
            for budget in (0, 1, int(total * 0.3), int(total * 0.9),
                           int(total) + 10):
                got = {
                    r["rid"]
                    for r in budget_threshold_cut(
                        frame, "key", "w", budget, "rid",
                        descending=descending, collect_cap=512,
                    ).collect()
                }
                want = window_form(frame, budget, descending)
                assert got == want, (descending, budget, len(got), len(want))

    # loud failure on undefined costs
    import pytest

    bad = li.withColumn(
        "w", F.when(F.col("rid") % 7 == 0, None).otherwise(F.col("w"))
    )
    with pytest.raises(ValueError, match="NULL or negative"):
        budget_threshold_cut(bad, "key", "w", 100, "rid")


def test_budget_threshold_cut_plan_is_pure_filter(spark, db):
    """The returned plan carries zero Window operators and zero
    SinglePartition exchanges — the topk_threshold_cut contract."""
    from deep_db_learning_spark.operators.selection import (
        budget_threshold_cut,
    )

    li = db.df("lineitem").select(
        F.monotonically_increasing_id().alias("rid"),
        F.col("l_extendedprice").alias("key"),
        (F.col("l_quantity") + 1).alias("w"),
    ).localCheckpoint(eager=True)
    out = budget_threshold_cut(li, "key", "w", 100000, "rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert out.count() > 0
