"""Exact triangle counting / clustering coefficients
(operators/triangles.py): handcrafted-graph ground truth, the
degree-orientation uniqueness property, the hot-group cap contract,
and the DuckDB twin hash over the co-purchase graph."""

from pyspark.sql import functions as F

from deep_db_learning_spark.operators.triangles import (
    cooccurrence_edges,
    cooccurrence_oracle_sql,
    triangle_stats,
    triangle_stats_oracle_sql,
    triangles,
)


def test_k4_plus_pendant_ground_truth(spark):
    # K4 on {1,2,3,4} (4 triangles) + pendant 5; duplicate, reversed
    # and self edges must all normalize away
    rows = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 5)]
    e = spark.createDataFrame(rows, "a bigint, b bigint")
    tri = sorted(map(tuple, triangles(e).collect()))
    assert len(tri) == 4
    assert len(set(map(lambda t: tuple(sorted(t)), tri))) == 4  # once each
    st = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in triangle_stats(e).collect()
    }
    assert st[1] == (3, 3, 1.0)
    assert st[4][0] == 4 and st[4][1] == 3 and abs(st[4][2] - 0.5) < 1e-15
    # degree-1 node: zero triangles, UNDEFINED (not 0.0) coefficient
    assert st[5] == (1, 0, None)


def test_triangle_free_graph_is_empty(spark):
    # a star has wedges but no closing edges
    e = spark.createDataFrame([(0, i) for i in range(1, 6)], "a bigint, b bigint")
    assert triangles(e).count() == 0
    st = triangle_stats(e)
    assert st.filter(F.col("n_triangles") != 0).count() == 0
    assert st.count() == 6


def test_cooccurrence_hot_group_cap(spark):
    rows = [(1, i) for i in range(5)] + [(2, 10), (2, 11)]
    f = spark.createDataFrame(rows, "g bigint, item bigint")
    edges, hot = cooccurrence_edges(f, "g", "item", max_per_group=3)
    assert [tuple(r) for r in hot.collect()] == [(1, 5)]
    assert sorted(map(tuple, edges.collect())) == [(10, 11)]


def test_copurchase_stats_match_duckdb_twin(db, duck):
    edges, hot = cooccurrence_edges(db.df("lineitem"), "l_orderkey", "l_partkey")
    assert hot.count() == 0
    got = sorted(
        (r["node"], r["degree"], r["n_triangles"], r["clustering"])
        for r in triangle_stats(edges).collect()
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                triangle_stats_oracle_sql(
                    cooccurrence_oracle_sql("lineitem", "l_orderkey", "l_partkey")
                )
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
    # sanity: the co-purchase graph actually has triangles, and the
    # total per-node count is divisible by 3 (each triangle counted at
    # its three corners)
    total = sum(g[2] for g in got)
    assert total > 0 and total % 3 == 0


def test_canonical_cut_shared_single_materialization(spark, monkeypatch):
    """ADVICE r12: a canonical_cut frame fanned into triangle_stats
    AND k_core pays ONE distinct + ONE checkpoint write total — each
    consumer takes the tagged frame as-is instead of re-running
    _canonical_und / re-checkpointing the whole edge set per call."""
    import deep_db_learning_spark.checkpoint as ckpt
    import deep_db_learning_spark.operators.triangles as tri_mod
    from deep_db_learning_spark.operators.kcore import k_core
    from deep_db_learning_spark.operators.triangles import canonical_cut

    # K4 + pendant: known truth (4 triangles, k_core(2) = the K4)
    rows = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    edges = spark.createDataFrame(rows, "a bigint, b bigint")

    canon_calls = {"n": 0}
    orig_canon = tri_mod._canonical_und

    def counting_canon(df):
        canon_calls["n"] += 1
        return orig_canon(df)

    monkeypatch.setattr(tri_mod, "_canonical_und", counting_canon)

    und = canonical_cut(edges)
    assert canon_calls["n"] == 1
    assert canonical_cut(und) is und  # idempotent, no second cut

    # from here on, NOTHING may re-checkpoint the edge frame itself:
    # spy cut_lineage and assert no call receives a 2-col (a, b) frame
    edge_cuts = {"n": 0}
    orig_cut = ckpt.cut_lineage

    def spying_cut(df, **kw):
        if df.columns == ["a", "b"]:
            edge_cuts["n"] += 1
        return orig_cut(df, **kw)

    monkeypatch.setattr(ckpt, "cut_lineage", spying_cut)

    stats = tri_mod.triangle_stats(und)
    kc = k_core(und, 2, max_iters=8)
    assert canon_calls["n"] == 1  # no consumer re-canonicalized
    assert edge_cuts["n"] == 0  # no consumer re-checkpointed the edges

    by_node = {r["node"]: r["n_triangles"] for r in stats.collect()}
    assert by_node == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}
    assert sorted(r["node"] for r in kc.collect()) == [0, 1, 2, 3]
