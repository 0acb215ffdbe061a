"""HITS hubs & authorities (operators/hits.py): unrolled-CTE twin
bit-parity, the update-rule semantics against a python replay, and
the normalization/edge contracts."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.hits import (
    HITS_CONFIG,
    hits,
    hits_oracle_sql,
)

NODES_SQL = (
    "SELECT c_custkey*2 AS node FROM customer "
    "UNION ALL SELECT o_orderkey*2+1 FROM orders"
)
EDGES_SQL = "SELECT o_orderkey*2+1 AS src, o_custkey*2 AS dst FROM orders"


def _graph(db):
    cust, orders = db.df("customer"), db.df("orders")
    nodes = cust.select((F.col("c_custkey") * 2).alias("node")).unionByName(
        orders.select((F.col("o_orderkey") * 2 + 1).alias("node"))
    )
    fwd = orders.select(
        (F.col("o_orderkey") * 2 + 1).alias("src"),
        (F.col("o_custkey") * 2).alias("dst"),
    )
    return fwd, nodes


@pytest.fixture(scope="module")
def result(db):
    fwd, nodes = _graph(db)
    return hits(fwd, nodes).collect()


def test_matches_unrolled_cte_twin_bitwise(duck, result):
    got = sorted(map(tuple, result))
    want = sorted(
        map(tuple, duck.execute(hits_oracle_sql(NODES_SQL, EDGES_SQL)).fetchall())
    )
    assert got == want
    assert len(got) > 0


def test_update_rule_matches_python_replay(db, result):
    """The exact integer trajectory replayed per-node in python from
    the raw edges — h_i(u) = Σ a_{i−1}(dst), a_i(v) = Σ h_i(src)."""
    fwd, nodes = _graph(db)
    edges = [(r["src"], r["dst"]) for r in fwd.collect()]
    all_nodes = [r["node"] for r in nodes.collect()]
    a = {n: 1 for n in all_nodes}
    h = {}
    for _ in range(HITS_CONFIG["iters"]):
        h = {n: 0 for n in all_nodes}
        for s, d in edges:
            h[s] += a[d]
        a = {n: 0 for n in all_nodes}
        for s, d in edges:
            a[d] += h[s]
    got = {r["node"]: (r["hub_scaled"], r["auth_scaled"]) for r in result}
    assert got == {n: (h[n], a[n]) for n in all_nodes}


def test_normalization_and_edge_contracts(result):
    """Max-normalized doubles peak at exactly 1.0; customers (even
    node ids) have zero hub score on the bipartite forward graph,
    orders (odd ids) zero authority; isolated customers score zero on
    both sides."""
    hubs = [r["hub"] for r in result]
    auths = [r["auth"] for r in result]
    assert max(hubs) == 1.0 and max(auths) == 1.0
    assert min(hubs) >= 0.0 and min(auths) >= 0.0
    for r in result:
        if r["node"] % 2 == 0:       # customer: no out-edges
            assert r["hub_scaled"] == 0 and r["hub"] == 0.0
        else:                        # order: exactly one out-edge
            assert r["auth_scaled"] == 0 and r["auth"] == 0.0
    # the double rendering is the single division of the exact ints
    mh = max(r["hub_scaled"] for r in result)
    for r in result[:100]:
        assert r["hub"] == float(r["hub_scaled"]) / float(mh)


def test_ranking_matches_degree_weighted_intuition(db, result):
    """On the bipartite FK graph the round-1 authority of a customer
    is its order count; deeper rounds weight orders by their
    customer's mass — the top authority must be a customer with at
    least as many orders as the median customer."""
    fwd, _nodes = _graph(db)
    deg = {
        r["dst"]: r["c"]
        for r in fwd.groupBy("dst").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    top = max(result, key=lambda r: (r["auth_scaled"], r["node"]))
    degs = sorted(deg.values())
    assert deg.get(top["node"], 0) >= degs[len(degs) // 2]


def test_rescale_dense_graph_bit_equal_and_loud_overflow(spark):
    """The r9 documented escape, now built: a complete 40-node digraph
    at iters=8 would overflow BIGINT without rescale — the in-plan
    guard raises LOUDLY (independent of ANSI mode) when headroom is
    denied; with the default rescale the engine, the unrolled DuckDB
    twin (identical shift CTEs from the identical bit-length ladder),
    and the python replay agree bit-for-bit."""
    import duckdb

    from deep_db_learning_spark.operators.hits import hits_py

    n = 40
    nodes = list(range(n))
    edges = [(i, j) for i in nodes for j in nodes if i != j]
    ndf = spark.createDataFrame([(x,) for x in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(edf, ndf, iters=8).collect()
    }
    assert got == hits_py(edges, nodes, iters=8)
    assert max(v for h, a in got.values() for v in (h, a)) > 0
    nodes_sql = (
        "SELECT * FROM (VALUES "
        + ",".join(f"({x})" for x in nodes)
        + ") t(node)"
    )
    edges_sql = (
        "SELECT * FROM (VALUES "
        + ",".join(f"({s},{d})" for s, d in edges)
        + ") t(src, dst)"
    )
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            hits_oracle_sql(nodes_sql, edges_sql, iters=8)
        ).fetchall()
    }
    con.close()
    assert got == want
    with pytest.raises(Exception, match="fold exceeds BIGINT"):
        hits(edf, ndf, iters=8, rescale_bits=63).collect()


def test_rescale_never_fires_at_moderate_density(db, result):
    """At the FK graph's density the shift is 0 every round: the
    rescaled path returns the exact path counts (the driver-slot hash
    regime depends on this)."""
    fwd, nodes = _graph(db)
    noresc = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(fwd, nodes, rescale_bits=62).collect()
    }
    got = {r["node"]: (r["hub_scaled"], r["auth_scaled"]) for r in result}
    assert got == noresc
