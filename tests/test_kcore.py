"""k-core peeling (operators/kcore.py): handcrafted ground truth, the
fixpoint property at the pinned round count, and the unrolled-CTE
DuckDB twin over the co-purchase graph."""

from deep_db_learning_spark.operators.kcore import k_core, k_core_oracle_sql
from deep_db_learning_spark.operators.triangles import (
    cooccurrence_edges,
    cooccurrence_oracle_sql,
)


def test_k4_with_tail_ground_truth(spark):
    # K4 on {1,2,3,4} plus tail 4-5-6: the 2-core is exactly the K4
    # (5 peels in round 1, then 6 — wait, 6 has degree 1 from the
    # start; the cascade needs two rounds to remove both)
    rows = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    e = spark.createDataFrame(rows, "a bigint, b bigint")
    got = sorted(map(tuple, k_core(e, 2, iters=4).collect()))
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]
    # fixpoint: extra rounds change nothing (monotone peeling)
    assert sorted(map(tuple, k_core(e, 2, iters=6).collect())) == got
    # k above the max degree empties the core
    assert k_core(e, 10, iters=3).count() == 0


def test_copurchase_kcore_matches_duckdb_twin(db, duck):
    edges, _hot = cooccurrence_edges(db.df("lineitem"), "l_orderkey", "l_partkey")
    k, iters = 80, 8
    got = sorted(map(tuple, k_core(edges, k, iters=iters).collect()))
    want = sorted(
        map(
            tuple,
            duck.execute(
                k_core_oracle_sql(
                    cooccurrence_oracle_sql(
                        "lineitem", "l_orderkey", "l_partkey"
                    ),
                    k,
                    iters=iters,
                )
            ).fetchall(),
        )
    )
    assert got == want
    # the pinned iters is at-or-past the fixpoint: every survivor
    # keeps induced degree >= k (otherwise one more round would peel)
    assert all(d >= k for _n, d in got) or got == []
