"""Weighted sampling without replacement (operators/sampling.py
A-ES): exact python key replay, determinism, weight-proportional
inclusion, and the positive-weight domain."""

def test_weighted_sample_without_replacement(db, spark):
    """A-ES: python replay of the exact key arithmetic picks the same
    set; heavier rows are sampled more often across seeds; non-positive
    weights never appear; the draw is deterministic."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    cust = db.df("customer").select(
        "c_custkey", F.abs(F.col("c_acctbal")).alias("w")
    )
    got = weighted_sample_without_replacement(cust, "w", 20, "c_custkey")
    ids = sorted(r["c_custkey"] for r in got.collect())
    assert len(ids) == 20

    def key(cid, w, seed=42):
        h = int(
            hashlib.md5(f"aes:{seed}:{cid}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / float(2**32)
        return math.log(u) / w

    rows = [(r["c_custkey"], r["w"]) for r in cust.collect()
            if r["w"] is not None and r["w"] > 0]
    want = sorted(
        sorted(rows, key=lambda t: (-key(*t), t[0]))[:20]
    )
    assert ids == sorted(c for c, _w in want)
    # determinism
    again = sorted(
        r["c_custkey"]
        for r in weighted_sample_without_replacement(
            cust, "w", 20, "c_custkey"
        ).collect()
    )
    assert again == ids
    # inclusion bias: across 30 seeds, the top-weight decile is drawn
    # far more often than the bottom decile
    ws = sorted(w for _c, w in rows)
    lo_cut, hi_cut = ws[len(ws) // 10], ws[-len(ws) // 10]
    hi_hits = lo_hits = 0
    for seed in range(30):
        samp = {
            r["c_custkey"]: r["w"]
            for r in weighted_sample_without_replacement(
                cust, "w", 20, "c_custkey", seed=seed
            ).collect()
        }
        hi_hits += sum(1 for w in samp.values() if w >= hi_cut)
        lo_hits += sum(1 for w in samp.values() if w <= lo_cut)
    assert hi_hits > 3 * max(lo_hits, 1)
    # zero/NULL weights excluded
    z = cust.withColumn("w", F.when(F.col("c_custkey") % 2 == 0, 0.0)
                        .otherwise(F.col("w")))
    s = weighted_sample_without_replacement(z, "w", 20, "c_custkey")
    assert all(r["c_custkey"] % 2 == 1 for r in s.collect())


def test_weighted_sample_per_group(db, spark):
    """Per-group A-ES: the python replay of the shared key arithmetic
    picks the same ≤k set within every group."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    cust = db.df("customer").select(
        "c_custkey", "c_mktsegment", F.abs(F.col("c_acctbal")).alias("w")
    )
    got = {}
    for r in weighted_sample_per_group(
        cust, "c_mktsegment", "w", 7, "c_custkey"
    ).collect():
        got.setdefault(r["c_mktsegment"], []).append(r["c_custkey"])

    def key(cid, w, seed=42):
        h = int(
            hashlib.md5(f"aes:{seed}:{cid}".encode()).hexdigest()[:8], 16
        )
        return math.log((h + 0.5) / float(2**32)) / w

    want = {}
    for r in cust.collect():
        if r["w"] is not None and r["w"] > 0:
            want.setdefault(r["c_mktsegment"], []).append(
                (r["c_custkey"], r["w"])
            )
    for seg, rows in want.items():
        top = sorted(rows, key=lambda t: (-key(*t), t[0]))[:7]
        assert sorted(got[seg]) == sorted(c for c, _w in top), seg
    assert set(got) == set(want)
