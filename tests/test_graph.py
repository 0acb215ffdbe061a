from pyspark.sql import functions as F

from deep_db_learning_spark.operators.graph import (
    HeteroGraph,
    build_hetero_graph,
    fk_edges,
    reverse_edges,
    self_loop_edges,
    with_node_ids,
)
from deep_db_learning_spark.schema import ForeignKey


def test_pk_node_ids(db):
    nodes = with_node_ids(db.df("customer"), ["c_custkey"], "pk")
    rows = nodes.select("c_custkey", "node_id").collect()
    assert all(r["c_custkey"] == r["node_id"] for r in rows)


def test_positional_node_ids(db):
    nodes = with_node_ids(db.df("customer"), ["c_custkey"], "positional")
    ids = sorted(r["node_id"] for r in nodes.collect())
    assert ids == list(range(150))


def test_composite_pk_falls_back_positional(db):
    nodes = with_node_ids(db.df("lineitem"), ["l_orderkey", "l_linenumber"], "pk")
    n = nodes.count()
    assert nodes.select("node_id").distinct().count() == n


def test_fk_edges_match_duckdb(db, duck):
    fk = ForeignKey(["o_custkey"], "customer", ["c_custkey"])
    orders = with_node_ids(db.df("orders"), ["o_orderkey"], "pk")
    customer = with_node_ids(db.df("customer"), ["c_custkey"], "pk")
    edges = fk_edges(orders, customer, fk)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    want = set(
        duck.execute(
            "SELECT o_orderkey, c_custkey FROM orders JOIN customer ON o_custkey = c_custkey"
        ).fetchall()
    )
    assert got == want


def test_null_fk_drops(spark):
    # J2: NULL FKs and dangling references silently drop
    src = spark.createDataFrame([(1, 10), (2, None), (3, 99)], "id int, ref int")
    dst = spark.createDataFrame([(10,), (11,)], "rid int")
    s = with_node_ids(src, ["id"], "pk")
    d = with_node_ids(dst, ["rid"], "pk")
    edges = fk_edges(s, d, ForeignKey(["ref"], "dst", ["rid"]))
    assert {(r["src"], r["dst"]) for r in edges.collect()} == {(1, 10)}


def test_reverse_and_self_loops(db):
    customer = with_node_ids(db.df("customer"), ["c_custkey"], "pk")
    loops = self_loop_edges(customer)
    assert loops.filter(F.col("src") != F.col("dst")).count() == 0
    fk = ForeignKey(["o_custkey"], "customer", ["c_custkey"])
    orders = with_node_ids(db.df("orders"), ["o_orderkey"], "pk")
    edges = fk_edges(orders, customer, fk)
    rev = reverse_edges(edges)
    assert edges.count() == rev.count()
    a = {(r["src"], r["dst"]) for r in edges.collect()}
    b = {(r["dst"], r["src"]) for r in rev.collect()}
    assert a == b


def test_build_full_graph(db, duck, tmp_path):
    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys)
    # every FK produced a forward and reverse edge type
    n_fks = sum(len(v) for v in db.foreign_keys.values())
    fwd = [et for et in g.edges if not et.startswith(("rev_", "self_"))]
    assert len(fwd) == n_fks
    assert len([et for et in g.edges if et.startswith("rev_")]) == n_fks

    # edge counts match inner-join counts in duckdb
    want = duck.execute(
        "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).fetchone()[0]
    assert g.edges["lineitem__l_orderkey__orders"].count() == want

    # save/load round trip
    g2path = str(tmp_path / "graph")
    g.save(g2path)
    g2 = HeteroGraph.load(db.spark, g2path)
    assert set(g2.nodes) == set(g.nodes)
    assert set(g2.edges) == set(g.edges)
    assert g2.edge_meta["rev_lineitem__l_orderkey__orders"] == ("orders", "lineitem")


def test_drop_empty(spark):
    empty = spark.createDataFrame([], "id int")
    full = spark.createDataFrame([(1,)], "id int")
    g = HeteroGraph(
        nodes={
            "a": with_node_ids(full, ["id"], "pk"),
            "b": with_node_ids(empty, ["id"], "pk"),
        },
    )
    g.add_self_loops()
    g.drop_empty()
    assert set(g.nodes) == {"a"}
    assert set(g.edges) == {"self_a"}


def test_multi_column_fk_edges(spark):
    """fk_edges joins on ALL column pairs of a composite FK; partial
    matches produce no edge."""
    from deep_db_learning_spark.operators.graph import fk_edges
    from deep_db_learning_spark.schema import ForeignKey

    src = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "a"), (4, 99, "z")],
        "node_id long, rk1 long, rk2 string",
    )
    dst = spark.createDataFrame(
        [(100, 10, "a"), (200, 20, "a"), (300, 10, "z")],
        "node_id long, k1 long, k2 string",
    )
    fk = ForeignKey(["rk1", "rk2"], "dst", ["k1", "k2"])
    edges = {(r["src"], r["dst"]) for r in fk_edges(src, dst, fk).collect()}
    # (2,10,'b') matches k1 only; (4,99,'z') matches k2 only - both drop
    assert edges == {(1, 100), (3, 200)}
