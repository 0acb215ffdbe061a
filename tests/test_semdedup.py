"""SemDeDup (operators/semdedup.py): cross-engine bit-parity of the
cluster+greedy-mark pipeline, the greedy-scan semantics, and the
keep-set contract."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_oracle_sql,
)

TAU = 0.30


@pytest.fixture(scope="module")
def result(db):
    return semantic_dedup(db.df("embeddings"), threshold=TAU).collect()


def test_matches_duckdb_twin_bitwise(db, duck, result):
    got = sorted(map(tuple, result))
    want = sorted(
        map(
            tuple,
            duck.execute(
                semantic_dedup_oracle_sql(TAU, sf_dir="/root/testdata/sf0.001")
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) == db.df("embeddings").count()


def test_greedy_scan_semantics(db, result):
    """dup_of is the LOWEST same-cluster id with round-6 cosine ≥ τ —
    replayed per-row in python from the raw vectors and the returned
    cluster assignment (compare against ALL earlier members, kept or
    not — the paper's upper-triangular scan)."""
    import numpy as np

    rows = {r["vec_id"]: r for r in result}
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=float)
        for r in db.df("embeddings").collect()
    }

    def cos(a, b):
        return round(
            float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b))), 6
        )

    by_cluster: dict = {}
    for vid, r in rows.items():
        by_cluster.setdefault(r["list_id"], []).append(vid)
    checked = 0
    for members in by_cluster.values():
        for vid in sorted(members)[:40]:
            earlier = [m for m in members if m < vid]
            hits = [
                m for m in earlier if cos(vecs[m], vecs[vid]) >= TAU
            ]
            r = rows[vid]
            if hits:
                assert r["dup_of"] == min(hits)
                assert r["sim"] == max(
                    cos(vecs[m], vecs[vid]) for m in hits
                )
            else:
                assert r["dup_of"] is None and r["sim"] is None
            checked += 1
    assert checked > 100


def test_keep_set_contract(db, result):
    """Every cluster keeps its lowest id unconditionally; kept ids
    never point at a duplicate source; the keep set plus the dropped
    set partition the corpus."""
    kept = {r["vec_id"] for r in result if r["dup_of"] is None}
    dropped = {r["vec_id"] for r in result if r["dup_of"] is not None}
    assert kept | dropped == {r["vec_id"] for r in result}
    assert kept.isdisjoint(dropped)
    by_cluster: dict = {}
    for r in result:
        by_cluster.setdefault(r["list_id"], []).append(r["vec_id"])
    for members in by_cluster.values():
        assert min(members) in kept
    # dup_of always points to a lower id in the SAME cluster
    cluster_of = {r["vec_id"]: r["list_id"] for r in result}
    for r in result:
        if r["dup_of"] is not None:
            assert r["dup_of"] < r["vec_id"]
            assert cluster_of[r["dup_of"]] == r["list_id"]


def test_threshold_monotone(db):
    """A stricter threshold never drops more documents."""
    loose = semantic_dedup(db.df("embeddings"), threshold=TAU)
    strict = semantic_dedup(db.df("embeddings"), threshold=0.4)
    n_loose = loose.where(F.col("dup_of").isNotNull()).count()
    n_strict = strict.where(F.col("dup_of").isNotNull()).count()
    assert n_strict <= n_loose
    assert n_loose > 0


def test_auto_n_lists_sizing():
    """k ∝ n with an 8-floor: fixture counts keep the stable 8;
    corpus-scale counts grow linearly with n."""
    from deep_db_learning_spark.operators.semdedup import auto_n_lists

    assert auto_n_lists(500) == 8
    assert auto_n_lists(4096 * 8) == 8
    assert auto_n_lists(4096 * 8 + 1) == 9
    assert auto_n_lists(10_000_000) == -(-10_000_000 // 4096)
    assert auto_n_lists(1000, target_cluster_rows=100) == 10


def test_hot_cluster_cap_excluded_and_returned(spark):
    """A degenerate cluster (60 identical vectors — Lloyd's puts them
    in ONE list) is excluded from the quadratic scan and returned as
    data; the small clusters still get verdicts; nothing is silently
    marked kept."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(60)] + [
        (100 + i, [0.0, 1.0 if i % 2 else -1.0, float(i % 3), 0.0])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    verdicts, hot = semantic_dedup(
        df, threshold=0.9, n_lists=4, hot_cluster_cap=30
    )
    hot_rows = hot.collect()
    assert len(hot_rows) >= 1
    assert any(r["n_vectors"] == 60 for r in hot_rows)
    got_ids = {r["vec_id"] for r in verdicts.collect()}
    assert got_ids and not (got_ids & set(range(60)))
    # without the cap the identical mass IS marked (id 0 the keeper)
    all_v = semantic_dedup(df, threshold=0.9, n_lists=4)
    dup = {r["vec_id"]: r["dup_of"] for r in all_v.collect()}
    assert dup[1] == 0 and dup[59] == 0 and dup[0] is None


def test_auto_default_matches_pinned_8_on_fixture(db):
    """At fixture scale the auto default derives exactly the historic
    n_lists=8, so the driver-slot clustering is unchanged."""
    auto = semantic_dedup(db.df("embeddings"), threshold=TAU)
    pinned = semantic_dedup(db.df("embeddings"), threshold=TAU, n_lists=8)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, pinned.collect())
    )
