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
