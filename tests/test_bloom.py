"""Bloom-filter semi-join pruning (operators/bloom.py): cross-engine
bitmap parity, the no-false-negative guarantee, semi-join equality,
false-positive sanity, and the shuffle-free probe plan."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.bloom import (
    bloom_build,
    bloom_build_sql,
    bloom_might_contain,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def build_side(db):
    return (
        db.df("orders")
        .where(F.col("o_totalprice") > 40000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )


@pytest.fixture(scope="module")
def words(build_side):
    return bloom_build(build_side, "l_orderkey")


def test_bitmap_matches_duckdb_twin(duck, words):
    got = dict(enumerate(words))
    rows = dict(
        duck.execute(
            bloom_build_sql(
                "(SELECT o_orderkey AS l_orderkey FROM orders "
                "WHERE o_totalprice > 40000)",
                "l_orderkey",
            )
        ).fetchall()
    )
    want = {i: rows.get(i, 0) for i in range(len(words))}
    assert got == want
    assert sum(1 for w in words if w) > 0
    # the sign-bit word path (Spark wraps 1<<63 to MIN_LONG, the twin
    # constructs it) is genuinely exercised: some word is negative
    assert any(w < 0 for w in words)


def test_no_false_negatives(build_side, words):
    members = build_side.withColumn(
        "hit", bloom_might_contain(F.col("l_orderkey"), words)
    )
    assert members.where(~F.col("hit")).count() == 0


def test_semi_join_equals_plain(db, build_side):
    li = db.df("lineitem")
    got = sorted(
        map(tuple, bloom_semi_join(li, build_side, "l_orderkey").collect())
    )
    want = sorted(
        map(
            tuple,
            li.join(build_side.distinct(), "l_orderkey", "leftsemi").collect(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_false_positive_rate_sane(spark, build_side, words):
    """Keys guaranteed absent from the build side: the pass fraction
    stays within an order of magnitude of the analytic rate."""
    n_keys = build_side.distinct().count()
    absent = spark.range(10_000_000, 10_020_000).select(
        F.col("id").alias("l_orderkey")
    )
    fp = absent.where(
        bloom_might_contain(F.col("l_orderkey"), words)
    ).count()
    import math

    m = len(words) * 64
    expected = (1 - math.exp(-4 * n_keys / m)) ** 4
    assert fp / 20_000 <= max(10 * expected, 1e-3)


def test_probe_filter_is_shuffle_free(db, words):
    """The whole point at scale: the bitmap test runs inside the scan
    stage — the pruned probe frame plans ZERO exchanges."""
    pruned = db.df("lineitem").where(
        bloom_might_contain(F.col("l_orderkey"), words)
    )
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "Filter" in plan
