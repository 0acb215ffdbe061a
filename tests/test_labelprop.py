"""Label propagation (operators/labelprop.py): unrolled-CTE DuckDB
twin over the customer↔orders FK graph, synchronous-update semantics,
clamped semi-supervised spreading, and determinism."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.labelprop import (
    label_propagation,
    label_propagation_oracle_sql,
)

EDGES_SQL = """
SELECT o_orderkey + 1000000 AS src, o_custkey AS dst FROM orders
"""
NODES_SQL = """
SELECT c_custkey AS node FROM customer
UNION ALL SELECT o_orderkey + 1000000 FROM orders
"""


@pytest.fixture(scope="module")
def fk_graph(db):
    orders = db.df("orders")
    edges = orders.select(
        (F.col("o_orderkey") + 1000000).alias("src"),
        F.col("o_custkey").alias("dst"),
    )
    nodes = db.df("customer").select(F.col("c_custkey").alias("node")).unionByName(
        orders.select((F.col("o_orderkey") + 1000000).alias("node"))
    )
    return edges, nodes


def test_matches_unrolled_cte_twin(fk_graph, duck):
    edges, nodes = fk_graph
    got = sorted(
        (r["node"], r["label"])
        for r in label_propagation(edges, nodes, iters=3).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            label_propagation_oracle_sql(EDGES_SQL, NODES_SQL, iters=3)
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # determinism across runs
    again = sorted(
        (r["node"], r["label"])
        for r in label_propagation(edges, nodes, iters=3).collect()
    )
    assert got == again


def test_synchronous_rounds_on_path(spark):
    # path 1-2-3-4: after ONE synchronous round each node takes its
    # smallest neighbor (asynchronous sweeps would collapse further)
    e = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4)])
    n = spark.createDataFrame([Row(node=i) for i in (1, 2, 3, 4)])
    one = {r["node"]: r["label"]
           for r in label_propagation(e, n, iters=1).collect()}
    assert one == {1: 2, 2: 1, 3: 2, 4: 3}


def test_clamped_seeds_spread(spark):
    # two hubs with disjoint leaf sets; only the hubs are labeled —
    # leaves must adopt their hub's class and the hubs stay clamped
    rows = [Row(src=1, dst=d) for d in (10, 11, 12)] + [
        Row(src=2, dst=d) for d in (20, 21)
    ]
    e = spark.createDataFrame(rows)
    n = spark.createDataFrame(
        [Row(node=i) for i in (1, 2, 10, 11, 12, 20, 21)]
    )
    seeds = spark.createDataFrame([Row(node=1, label=100), Row(node=2, label=200)])
    out = {r["node"]: r["label"]
           for r in label_propagation(e, n, labels=seeds, iters=3).collect()}
    assert out[1] == 100 and out[2] == 200
    assert out[10] == out[11] == out[12] == 100
    assert out[20] == out[21] == 200


def test_unlabeled_nodes_do_not_vote(spark):
    # node 3 is unlabeled: in round 1 it must not outvote the seed
    e = spark.createDataFrame(
        [Row(src=3, dst=2), Row(src=3, dst=2), Row(src=1, dst=2)]
    )
    n = spark.createDataFrame([Row(node=1), Row(node=2), Row(node=3)])
    seeds = spark.createDataFrame([Row(node=1, label=7)])
    out = {r["node"]: r["label"]
           for r in label_propagation(e, n, labels=seeds, iters=1).collect()}
    assert out[2] == 7 and out[1] == 7
    assert out[3] is None  # nothing reached it in one round
