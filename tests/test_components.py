"""Connected components vs a driver-side union-find on random graphs,
plus the dedup-cluster use case on planted near-dup pairs."""

import random

from pyspark.sql import functions as F

from deep_db_learning_spark.operators.components import connected_components


def _union_find(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labels
    return {x: find(x) for x in range(n)}


def test_components_match_union_find_random(spark):
    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, nodes=nodes).collect()
    }
    want_raw = _union_find(n, edges)
    # union-find roots are not guaranteed min-of-component; normalize both
    def canon(labels):
        groups = {}
        for node, lbl in labels.items():
            groups.setdefault(lbl, set()).add(node)
        return {frozenset(g) for g in groups.values()}

    assert canon(got) == canon(want_raw)
    assert len(got) == n
    # component label IS the min member id
    for node, comp in got.items():
        assert comp <= node


def test_components_chain_converges(spark):
    # a path graph needs diameter rounds - exercises the iteration logic
    n = 20
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    got = connected_components(df).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == n


def test_dedup_clusters_on_planted_pairs(db):
    from deep_db_learning_spark.operators.dedup import ngram_jaccard_pairs

    docs = db.df("documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_k=9, threshold=0.7)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=docs.select("doc_id"),
    )
    n_docs = docs.count()
    assert comp.count() == n_docs
    n_pairs = pairs.count()
    n_clusters = comp.select("component").distinct().count()
    # every near-dup pair merges two docs somewhere: clusters < docs
    if n_pairs > 0:
        assert n_clusters < n_docs
    # cluster sizes: total mass preserved
    assert comp.groupBy("component").count().agg(F.sum("count")).collect()[0][0] == n_docs


# ---- large-star/small-star (Kiveris et al. 2014) ----------------------

from deep_db_learning_spark.operators.components import (  # noqa: E402
    connected_components_star,
)


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_star_matches_min_label_random(spark):
    rng = random.Random(11)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = _labels(connected_components_star(df, nodes=nodes))
    want = _labels(connected_components(df, nodes=nodes))
    assert got == want


def test_star_collapses_path_in_log_rounds(spark):
    # a 256-node path is the min-label worst case: one hop per round,
    # ~255 rounds to converge. Star contraction must finish inside a
    # logarithmic budget — and still produce the exact components.
    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _labels(connected_components_star(df, max_iter=14))
    assert got == {i: 0 for i in range(n)}
    # the min-label loop under the same round budget has NOT converged
    # (this is the scale gap the star variant closes)
    partial = _labels(connected_components(df, max_iter=14))
    assert partial != got


def test_star_isolated_nodes_rings_and_self_loops(spark):
    edges = [(0, 1), (1, 2), (2, 0), (5, 5), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(10)], "node long")
    got = _labels(connected_components_star(df, nodes=nodes))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}


def test_star_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    got = _labels(connected_components_star(df, nodes=nodes))
    assert got == {1: 1, 2: 2}
