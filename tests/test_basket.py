"""Pairwise association rules (operators/basket.py): handcrafted
ground truth, the hot-basket cap, and the DuckDB twin over order
baskets at two SFs."""

import pytest

from deep_db_learning_spark.operators.basket import (
    pair_association_rules,
    pair_association_rules_oracle_sql,
)


def test_handcrafted_rules(spark):
    # baskets: {a,b} x3, {a,c}, {b}, {c} -> N=6; n_a=4, n_b=4, n_c=2
    rows = (
        [(i, "a") for i in range(4)]
        + [(i, "b") for i in range(3)]
        + [(3, "c"), (4, "b"), (5, "c")]
    )
    f = spark.createDataFrame(rows, "g bigint, item string")
    rules, hot = pair_association_rules(f, "g", "item", min_pair_groups=1)
    assert hot.count() == 0
    r = {
        (x["antecedent"], x["consequent"]): (
            x["n_pair"], x["support"], x["confidence"], x["lift"],
        )
        for x in rules.collect()
    }
    # a&b co-occur in 3 of 6 baskets; n_a=4, n_b=4
    assert r[("a", "b")] == (3, 0.5, 0.75, 3 * 6 / (4 * 4))
    assert r[("b", "a")] == (3, 0.5, 0.75, 3 * 6 / (4 * 4))
    assert r[("a", "c")][0] == 1 and r[("c", "a")][2] == 0.5
    assert ("b", "c") not in r  # never co-occur


def test_hot_basket_cap(spark):
    rows = [(1, f"i{k}") for k in range(10)] + [(2, "x"), (2, "y")]
    f = spark.createDataFrame(rows, "g bigint, item string")
    rules, hot = pair_association_rules(
        f, "g", "item", min_pair_groups=1, max_per_group=5
    )
    assert [tuple(x) for x in hot.collect()] == [(1, 10)]
    got = {(x["antecedent"], x["consequent"]) for x in rules.collect()}
    assert got == {("x", "y"), ("y", "x")}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_order_baskets_match_duckdb_twin(spark, sf):
    import duckdb

    import __spark_entry__ as entry

    db = entry._db(spark, f"/root/testdata/{sf}")
    rules, hot = pair_association_rules(
        db.df("lineitem"), "l_orderkey", "l_partkey", min_pair_groups=2
    )
    assert hot.count() == 0
    got = sorted(map(tuple, rules.collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'/root/testdata/{sf}/lineitem.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                pair_association_rules_oracle_sql(
                    "lineitem", "l_orderkey", "l_partkey", min_pair_groups=2
                )
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
