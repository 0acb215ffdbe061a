from pyspark.sql import functions as F

from deep_db_learning_spark.operators.graph import build_hetero_graph, graph_statistics
from deep_db_learning_spark.plans import BlueprintPlan


def test_blueprint_one_layer_matches_manual_agg(db, duck):
    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys, add_reverse=False)
    plan = BlueprintPlan(graph=g, layers=1, aggs=("mean",))
    out = plan.run("customer")
    row = {
        r["node_id"]: r for r in out.collect()
    }
    # customer mean of orders o_totalprice must match SQL
    want = dict(
        duck.execute(
            "SELECT c_custkey, avg(o_totalprice) FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_custkey"
        ).fetchall()
    )
    col = "orders__o_custkey__customer__mean_o_totalprice"
    for k, v in want.items():
        assert abs(row[k][col] - v) < 1e-6


def test_blueprint_hooks_and_layers(db):
    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys, add_reverse=False)
    calls = []

    def pre(layer, table, df):
        calls.append(("pre", layer, table))
        return df

    def post(layer, table, df):
        calls.append(("post", layer, table))
        return df

    def decode(df):
        return df.withColumn("decoded", F.lit(1))

    plan = BlueprintPlan(
        graph=g, layers=2, pre_combination=pre, post_combination=post, decoder=decode
    )
    out = plan.run("customer")
    assert "decoded" in out.columns
    layers_seen = {c[1] for c in calls}
    assert layers_seen == {0, 1}
    # 2-layer receptive field: layer-2 columns aggregate layer-1 aggregates
    assert any(c.count("__mean_") >= 2 for c in out.columns)


def test_graph_statistics_matches_duckdb(db, duck):
    out = graph_statistics(db.tables, db.primary_keys, db.foreign_keys)
    got = {
        r["edge_type"]: (r["n_src_rows"], r["n_dst_rows"], r["n_edges"])
        for r in out.collect()
    }
    n = dict(
        duck.execute(
            "SELECT 'orders', count(*) FROM orders UNION ALL "
            "SELECT 'customer', count(*) FROM customer UNION ALL "
            "SELECT 'lineitem', count(*) FROM lineitem"
        ).fetchall()
    )
    edges = duck.execute(
        "SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey"
    ).fetchone()[0]
    assert got["orders__o_custkey__customer"] == (n["orders"], n["customer"], edges)
