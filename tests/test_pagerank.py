"""PageRank: integer-exact power iteration + unrolled-CTE oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.pagerank import (
    PR_CONFIG,
    pagerank,
    pagerank_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def _bipartite(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    nodes = cust.select((F.col("c_custkey") * 2).alias("node")).unionByName(
        orders.select((F.col("o_orderkey") * 2 + 1).alias("node"))
    )
    fwd = orders.select(
        (F.col("o_orderkey") * 2 + 1).alias("src"),
        (F.col("o_custkey") * 2).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return nodes, edges


def test_matches_unrolled_oracle(spark, duck):
    nodes, edges = _bipartite(spark)
    got = sorted(map(tuple, pagerank(edges, nodes, iters=3).collect()))
    nodes_sql = (
        "SELECT c_custkey*2 AS node FROM customer "
        "UNION ALL SELECT o_orderkey*2+1 FROM orders"
    )
    edges_sql = (
        "SELECT o_orderkey*2+1 AS src, o_custkey*2 AS dst FROM orders "
        "UNION ALL SELECT o_custkey*2, o_orderkey*2+1 FROM orders"
    )
    want = sorted(
        map(tuple, duck.sql(pagerank_oracle_sql(nodes_sql, edges_sql, 3)).fetchall())
    )
    assert got == want


def test_mass_conserved(spark):
    """Floor division leaks at most ~N·iters units of 10^-12 mass —
    total rank stays within 1e-6 of 1 on the bipartite graph."""
    nodes, edges = _bipartite(spark)
    total = (
        pagerank(edges, nodes, iters=5)
        .agg(F.sum("rank").alias("t"))
        .first()["t"]
    )
    assert total == pytest.approx(1.0, abs=1e-6)


def test_uniform_cycle_is_uniform(spark):
    """A directed cycle is perfectly symmetric ⇒ every node keeps the
    initial rank exactly (integer update included)."""
    n = 12
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    rows = pagerank(edges, nodes, iters=4).collect()
    assert len({r["rank_scaled"] for r in rows}) == 1


def test_hub_outranks_leaves(spark):
    """Star graph: all leaves point at the hub ⇒ hub rank ≫ leaf rank."""
    n = 50
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(1, n).select(
        F.col("id").alias("src"), F.lit(0).cast("bigint").alias("dst")
    )
    rows = {r["node"]: r["rank"] for r in pagerank(edges, nodes, iters=5).collect()}
    leaf = rows[1]
    assert rows[0] > 10 * leaf
    assert len({v for k, v in rows.items() if k != 0}) == 1


def test_dangling_mass_redistributes(spark):
    """2 nodes, edge a→b only: b is dangling; its mass must flow back
    uniformly rather than vanish — both ranks stay positive and total
    mass is conserved."""
    nodes = spark.range(2).select(F.col("id").alias("node"))
    edges = nodes.where("node = 0").select(
        F.col("node").alias("src"), F.lit(1).cast("bigint").alias("dst")
    )
    rows = {r["node"]: r for r in pagerank(edges, nodes, iters=6).collect()}
    assert rows[1]["rank"] > rows[0]["rank"] > 0.05
    total = rows[0]["rank"] + rows[1]["rank"]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_partitioning_invariance(spark):
    """DECIMAL folds make the trajectory independent of physical
    partitioning — 1 vs 13 shuffle partitions, identical BIGINT state."""
    nodes, edges = _bipartite(spark)
    a = sorted(
        map(tuple, pagerank(edges.coalesce(1), nodes.coalesce(1), iters=2).collect())
    )
    b = sorted(
        map(tuple, pagerank(edges.repartition(13), nodes.repartition(13), iters=2).collect())
    )
    assert a == b


def test_empty_graph(spark):
    nodes = spark.range(0).select(F.col("id").alias("node"))
    edges = spark.range(0).select(
        F.col("id").alias("src"), F.col("id").alias("dst")
    )
    assert pagerank(edges, nodes).count() == 0


def test_config_is_shared():
    """The oracle builder and engine read the same PR_CONFIG constants
    (a drifted copy would break bit-parity silently)."""
    sql = pagerank_oracle_sql("SELECT 1 AS node", "SELECT 1 AS src, 1 AS dst", 1)
    assert str(PR_CONFIG["scale"]) in sql
    assert f"({PR_CONFIG['damp_den'] - PR_CONFIG['damp_num']})" in sql


def test_guarded_bigint_raises_on_overflow(spark):
    """The shared decimal→BIGINT guard (functions/exact_agg): a fold
    past the long range raises in-plan regardless of ANSI mode instead
    of silently NULLing — pagerank's rank folds ride it (unreachable
    there by rank-mass conservation; this pins the guard itself)."""
    import pytest
    from pyspark.sql import functions as F

    from deep_db_learning_spark.functions.exact_agg import guarded_bigint

    big = spark.createDataFrame(
        [((1 << 62),), ((1 << 62),), ((1 << 62),)], "v long"
    )
    with pytest.raises(Exception, match="exceeds BIGINT"):
        big.agg(
            guarded_bigint(F.sum(F.col("v").cast("decimal(38,0)")), "test")
        ).collect()
    ok = big.limit(1).agg(
        guarded_bigint(F.sum(F.col("v").cast("decimal(38,0)")), "test")
    ).first()[0]
    assert ok == (1 << 62)
