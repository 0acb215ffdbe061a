from pyspark.sql import functions as F

from deep_db_learning_spark.operators.bfs import bfs_expand, bfs_visited_counts
from deep_db_learning_spark.operators.graph import fk_edges, with_node_ids
from deep_db_learning_spark.operators.sampling import random_node_split, sample_neighbors
from deep_db_learning_spark.schema import ForeignKey


def test_bfs_depth1_is_roots_only(spark, db):
    roots = spark.createDataFrame([(1,), (2,)], "c_custkey bigint")
    visited = bfs_expand(db.tables, db.foreign_keys, "customer", roots, 1)
    assert set(visited) == {"customer"}
    assert visited["customer"].count() == 2


def test_bfs_depth2_matches_duckdb(spark, db, duck):
    roots = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey bigint")
    visited = bfs_expand(db.tables, db.foreign_keys, "customer", roots, 2)
    # depth 2 from customer: forward → nation, reverse → orders, events
    assert set(visited) == {"customer", "nation", "orders", "events"}
    want_orders = duck.execute(
        "SELECT count(*) FROM orders WHERE o_custkey IN (1,2,3)"
    ).fetchone()[0]
    assert visited["orders"].count() == want_orders
    want_nation = duck.execute(
        "SELECT count(DISTINCT n_nationkey) FROM nation WHERE n_nationkey IN "
        "(SELECT c_nationkey FROM customer WHERE c_custkey IN (1,2,3))"
    ).fetchone()[0]
    assert visited["nation"].count() == want_nation


def test_bfs_depth3_parent_pruning(spark, db, duck):
    roots = spark.createDataFrame([(1,)], "c_custkey bigint")
    visited = bfs_expand(db.tables, db.foreign_keys, "customer", roots, 3)
    # depth 3 adds lineitem (via orders) and region (via nation),
    # supplier (reverse via nation) — but NOT other customers: the
    # nation→customer reverse hop is parent-pruned, and orders→customer
    # forward hop... is allowed (forward hops are never pruned), so
    # customer stays at exactly the root row + re-reached roots
    assert "lineitem" in visited and "region" in visited and "supplier" in visited
    want_li = duck.execute(
        "SELECT count(*) FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_custkey = 1)"
    ).fetchone()[0]
    assert visited["lineitem"].count() == want_li
    # customer visited set stays the root (forward orders→customer
    # re-reaches only customer 1)
    assert visited["customer"].count() == 1


def test_bfs_counts_summary(spark, db):
    roots = spark.createDataFrame([(1,), (2,)], "c_custkey bigint")
    out = bfs_visited_counts(db.tables, db.foreign_keys, "customer", roots, 2)
    rows = {r["table_name"]: r["n_visited"] for r in out.collect()}
    assert rows["customer"] == 2


def test_sample_neighbors_deterministic_and_bounded(db):
    fk = ForeignKey(["o_custkey"], "customer", ["c_custkey"])
    orders = with_node_ids(db.df("orders"), ["o_orderkey"], "pk")
    customer = with_node_ids(db.df("customer"), ["c_custkey"], "pk")
    edges = fk_edges(orders, customer, fk)  # src=order, dst=customer
    k = 5
    sampled = sample_neighbors(edges, k, seed=42)
    fanout = sampled.groupBy("dst").count()
    assert fanout.agg(F.max("count")).collect()[0][0] <= k
    # dsts with <k neighbors keep them all
    orig = edges.groupBy("dst").count().withColumnRenamed("count", "orig")
    joined = fanout.join(orig, "dst")
    assert joined.filter((F.col("orig") < k) & (F.col("count") != F.col("orig"))).count() == 0
    # deterministic across runs
    a = {(r["src"], r["dst"]) for r in sampled.collect()}
    b = {(r["src"], r["dst"]) for r in sample_neighbors(edges, k, seed=42).collect()}
    assert a == b
    # different seed → different sample (overwhelmingly likely)
    c = {(r["src"], r["dst"]) for r in sample_neighbors(edges, k, seed=7).collect()}
    assert a != c


def test_random_node_split(db):
    customer = with_node_ids(db.df("customer"), ["c_custkey"], "pk")
    out = random_node_split(customer, fractions=(0.5, 0.2, 0.3), seed=42)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 150
    # deterministic
    out2 = random_node_split(customer, fractions=(0.5, 0.2, 0.3), seed=42)
    assert out.select("node_id", "split").collect() == out2.select("node_id", "split").collect()


def test_top_k_per_group_ties_deterministic(spark):
    from deep_db_learning_spark.operators.sampling import top_k_per_group
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(g=1, id=i, v=float(v)) for i, v in enumerate([5.0, 5.0, 5.0, 3.0])]
    )
    out = top_k_per_group(df, "g", "v", k=2, tiebreak="id", rank_col="rank")
    rows = sorted((r["id"], r["rank"]) for r in out.collect())
    # tied values resolve by ascending id - always ids 0 and 1
    assert rows == [(0, 1), (1, 2)]


def test_bfs_per_root_matches_single_root_expansion(spark, db):
    from deep_db_learning_spark.operators.bfs import bfs_expand_per_root

    roots = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey bigint")
    tagged = bfs_expand_per_root(
        db.tables, db.foreign_keys, "customer", roots, 2, db.primary_keys
    )
    # per-root membership must equal running the merged BFS one root at
    # a time (the reference's get(idx) per-sample subgraphs)
    for root in (1, 2, 3):
        one = spark.createDataFrame([(root,)], "c_custkey bigint")
        merged = bfs_expand(db.tables, db.foreign_keys, "customer", one, 2)
        for t, vdf in merged.items():
            pk = db.primary_keys[t]
            want = {tuple(r) for r in vdf.select(*pk).collect()}
            got = {
                tuple(r)
                for r in tagged[t]
                .filter(F.col("root_id") == root)
                .select(*pk)
                .collect()
            }
            assert got == want, (root, t)


def test_bfs_per_root_depth3_tags_survive_multihop(spark, db):
    from deep_db_learning_spark.operators.bfs import bfs_expand_per_root

    roots = spark.createDataFrame([(5,)], "c_custkey bigint")
    tagged = bfs_expand_per_root(
        db.tables, db.foreign_keys, "customer", roots, 3, db.primary_keys
    )
    merged = bfs_expand(db.tables, db.foreign_keys, "customer", roots, 3)
    assert set(tagged) == set(merged)
    for t in merged:
        pk = db.primary_keys[t]
        want = {tuple(r) for r in merged[t].select(*pk).collect()}
        got = {tuple(r) for r in tagged[t].select(*pk).collect()}
        assert got == want, t
        # single root: every row tagged with it
        assert tagged[t].select("root_id").distinct().collect()[0][0] == 5


def test_two_phase_sampling_matches_plain_on_hub(spark):
    """sample_neighbors_two_phase == sample_neighbors bit-for-bit, on a
    graph with one hub dst holding 20k edges plus normal nodes — and
    its phase-1 window partitions on (dst, salt), so the hub's rows
    split across tasks instead of one."""
    from deep_db_learning_spark.operators.sampling import (
        sample_neighbors,
        sample_neighbors_two_phase,
    )

    rows = [(s, 0) for s in range(20_000)] + [
        (s, d) for d in range(1, 50) for s in range(d * 7, d * 7 + 5)
    ]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint").repartition(8)
    plain = sample_neighbors(edges, 10, seed=7)
    two = sample_neighbors_two_phase(edges, 10, seed=7, n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, two.collect()))
    # the hub still returns exactly k
    assert two.filter(F.col("dst") == 0).count() == 10
    # phase-1 exchange carries the salt expression, not bare dst
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan


# ---- stratified split + k-fold (r7) -----------------------------------

from deep_db_learning_spark.operators.sampling import (  # noqa: E402
    kfold_assign,
    kfold_train_test,
    stratified_node_split,
)


def test_stratified_split_exact_per_stratum(db):
    cust = db.df("customer").select("c_custkey", "c_mktsegment")
    got = stratified_node_split(
        cust, "c_mktsegment", "c_custkey", fractions=(0.7, 0.1, 0.2)
    )
    rows = got.groupBy("c_mktsegment", "split").count().collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], {})[r["split"]] = r["count"]
    for seg, parts in by_seg.items():
        n = sum(parts.values())
        # exact integer allocation: train = floor(0.7n), train+val =
        # floor(0.8n) — not merely in expectation
        assert parts.get("train", 0) == (7000 * n) // 10000
        assert parts.get("train", 0) + parts.get("val", 0) == (8000 * n) // 10000


def test_stratified_split_deterministic_under_repartition(db):
    cust = db.df("customer").select("c_custkey", "c_mktsegment")
    a = stratified_node_split(cust, "c_mktsegment", "c_custkey")
    b = stratified_node_split(cust.repartition(7), "c_mktsegment", "c_custkey")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kfold_covers_and_is_append_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "node_id long")
    folds = kfold_assign(df, k=5)
    got = {r["node_id"]: r["fold"] for r in folds.collect()}
    assert set(got.values()) == {0, 1, 2, 3, 4}
    # appending rows never reassigns existing ones (hash, not rank)
    df2 = spark.createDataFrame([(i,) for i in range(300)], "node_id long")
    got2 = {r["node_id"]: r["fold"] for r in kfold_assign(df2, k=5).collect()}
    assert all(got2[k] == v for k, v in got.items())
    train, test = kfold_train_test(df, fold=2, k=5)
    assert train.count() + test.count() == 200
    assert test.filter(F.col("node_id").isin(
        [k for k, v in got.items() if v != 2])).count() == 0
