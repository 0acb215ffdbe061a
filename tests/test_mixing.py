import math

from pyspark.sql import functions as F

from deep_db_learning_spark.operators.mixing import (
    pack_shards,
    pack_shards_sql,
    stratified_sample,
    stratified_sample_sql,
)


def test_stratified_sample_matches_duckdb(db, duck):
    fractions = {"src1": 0.3, "src2": 1.0, "src3": 0.05}
    docs = db.df("documents")
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "source", fractions, "doc_id", seed=7).collect()
    )
    want = sorted(
        r[0]
        for r in duck.execute(
            stratified_sample_sql("documents", "source", fractions, "doc_id", seed=7)
        ).fetchall()
    )
    assert got == want
    assert 0 < len(got) < docs.count()

    # fractions hold per stratum (hash is uniform-ish; wide tolerance)
    src_counts = dict(
        docs.filter(F.col("source").isin(*fractions)).groupBy("source").count().collect()
    )
    kept_counts = dict(
        stratified_sample(docs, "source", fractions, "doc_id", seed=7)
        .groupBy("source")
        .count()
        .collect()
    )
    for s, f in fractions.items():
        if s not in src_counts:
            continue
        rate = kept_counts.get(s, 0) / src_counts[s]
        assert abs(rate - f) < 0.3, (s, rate, f)

    # unknown strata drop by default, and default_fraction=1.0 keeps all
    assert (
        stratified_sample(docs, "source", {"nosuch": 1.0}, "doc_id").count() == 0
        or "nosuch" in src_counts
    )
    assert (
        stratified_sample(
            docs, "source", {}, "doc_id", default_fraction=1.0
        ).count()
        == docs.count()
    )


def test_stratified_sample_deterministic_and_unshuffled(db):
    docs = db.df("documents")
    a = stratified_sample(docs, "source", {"src1": 0.5}, "doc_id", seed=3)
    b = stratified_sample(docs.repartition(13), "source", {"src1": 0.5}, "doc_id", seed=3)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    # row-local predicate: no Exchange in the unrepartitioned plan
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_shards_matches_duckdb(db, duck):
    docs = db.df("documents").select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(docs, "n_chars", budget=50_000, order_col="doc_id").collect()
    }
    want = {
        r[0]: r[2]
        for r in duck.execute(
            pack_shards_sql(
                "(SELECT doc_id, n_chars FROM documents) t",
                "n_chars",
                budget=50_000,
                order_col="doc_id",
            )
        ).fetchall()
    }
    assert got == want
    n_shards = len(set(got.values()))
    assert n_shards > 1  # budget actually splits the corpus
    # shard ids are dense 0..n-1 in doc order
    assert set(got.values()) == set(range(n_shards))


def test_pack_shards_chunking_invariance(db):
    """The two-phase prefix sum gives the same shards for any chunk
    size — including chunk_size=1 (every row its own chunk) and one
    giant chunk (plain window)."""
    docs = db.df("documents").select("doc_id", "n_chars")
    base = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(
            docs, "n_chars", budget=30_000, order_col="doc_id", chunk_size=97
        ).collect()
    }
    for cs in (1, 10**9):
        other = {
            r["doc_id"]: r["shard_id"]
            for r in pack_shards(
                docs, "n_chars", budget=30_000, order_col="doc_id", chunk_size=cs
            ).collect()
        }
        assert other == base
    # shard token totals ~ budget: every shard except possibly the last
    # is filled to at least budget minus the largest document
    from collections import defaultdict

    toks = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    per_shard = defaultdict(int)
    for d, s in base.items():
        per_shard[s] += toks[d]
    max_doc = max(toks.values())
    full = [t for s, t in sorted(per_shard.items())[:-1]]
    assert all(t >= 30_000 - max_doc for t in full)


def test_stratified_sample_string_keys(db, duck):
    """String keys take the md5 path (a bigint cast would NULL out and
    silently drop everything); Spark and DuckDB agree on the kept set."""
    from deep_db_learning_spark.operators.mixing import (
        stratified_sample,
        stratified_sample_sql,
    )

    docs = db.df("documents").withColumn(
        "key_str", F.concat(F.lit("doc-"), F.col("doc_id"))
    )
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, "source", {"src1": 0.5, "src2": 0.2}, "key_str", seed=5
        ).collect()
    )
    want = sorted(
        r[0]
        for r in duck.execute(
            stratified_sample_sql(
                "(SELECT *, 'doc-' || doc_id AS key_str FROM documents) t",
                "source",
                {"src1": 0.5, "src2": 0.2},
                "key_str",
                seed=5,
                numeric_key=False,
            )
        ).fetchall()
    )
    assert got == want and 0 < len(got)


def test_temperature_fractions_math_and_composition(spark, duck):
    """Temperature mixing (r5): w_i ∝ n_i^alpha. alpha=1 reproduces
    natural proportions (all fractions equal), alpha=0 equalizes
    expected counts; the fractions compose with stratified_sample and
    its DuckDB twin reproduces the exact kept set."""
    import math

    from deep_db_learning_spark.operators.mixing import (
        stratified_sample,
        stratified_sample_sql,
        temperature_fractions,
    )

    # skewed strata: 600 / 300 / 100
    rows = (
        [(i, "big") for i in range(600)]
        + [(600 + i, "mid") for i in range(300)]
        + [(900 + i, "small") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, source string")

    nat = temperature_fractions(df, "source", alpha=1.0)
    assert all(abs(f - 1.0) < 1e-12 for f in nat.values())

    uni = temperature_fractions(df, "source", alpha=0.0)
    # expected kept counts all equal the smallest stratum
    kept = {s: uni[s] * n for s, n in (("big", 600), ("mid", 300), ("small", 100))}
    assert all(abs(v - 100.0) < 1e-9 for v in kept.values())

    tf = temperature_fractions(df, "source", alpha=0.5)
    assert tf["small"] == 1.0  # most up-weighted source kept in full
    # expected counts follow n^0.5 proportions
    exp = {s: tf[s] * n for s, n in (("big", 600), ("mid", 300), ("small", 100))}
    assert abs(exp["big"] / exp["small"] - math.sqrt(6.0)) < 1e-9
    assert abs(exp["mid"] / exp["small"] - math.sqrt(3.0)) < 1e-9

    capped = temperature_fractions(df, "source", alpha=0.5, target_rows=200)
    assert all(0.0 < f <= 1.0 for f in capped.values())

    sampled = stratified_sample(df, "source", tf, key_col="doc_id", seed=7)
    got = sorted(r["doc_id"] for r in sampled.collect())
    duck.execute("CREATE OR REPLACE TABLE temp_mix(doc_id BIGINT, source VARCHAR)")
    duck.executemany("INSERT INTO temp_mix VALUES (?, ?)", rows)
    want = sorted(
        r[0]
        for r in duck.execute(
            stratified_sample_sql("temp_mix", "source", tf, "doc_id", seed=7)
        ).fetchall()
    )
    assert got == want
    # realized counts near expectation (hash Bernoulli, tolerance wide)
    by_src = {
        r["source"]: r["count"]
        for r in sampled.groupBy("source").count().collect()
    }
    assert by_src["small"] == 100
    assert abs(by_src["big"] - exp["big"]) < 60


def test_domain_weights_match_duckdb_twin_and_semantics(db, duck, spark):
    """Quality-aware domain reweighting: the engine's decimal folds +
    shared python arithmetic reproduce a DuckDB-fold twin bitwise;
    weights are a floored, normalized exponential tilt of the natural
    proportions (eta=0 recovers them exactly)."""
    from deep_db_learning_spark.functions.exact_agg import exact_sum_sql
    from deep_db_learning_spark.operators.mixing import (
        domain_weight_py,
        domain_weights,
    )

    docs = db.df("documents").withColumn(
        "score", F.length("text").cast("double") / F.lit(1000.0)
    )
    got = {
        r["source"]: (r["n_docs"], r["mean_score"], r["excess"], r["weight"])
        for r in domain_weights(docs, "source", "score", eta=2.0,
                                floor=0.01).collect()
    }
    duck_stats = {
        s: (float(t), int(n))
        for s, t, n in duck.execute(f"""
            SELECT source,
                   {exact_sum_sql('CAST(length(text) AS DOUBLE) / 1000.0')},
                   count(*)
            FROM documents
            WHERE source IS NOT NULL AND text IS NOT NULL
            GROUP BY source
        """).fetchall()
    }
    want = domain_weight_py(duck_stats, eta=2.0, floor=0.01)
    assert set(got) == set(want)
    for d in want:
        assert got[d][1:] == want[d], d
        assert got[d][0] == duck_stats[d][1]
    assert abs(sum(v[3] for v in got.values()) - 1.0) < 1e-12
    assert all(v[3] >= 0.01 - 1e-12 for v in got.values())

    # eta=0: exactly the natural proportions
    nat = {
        r["source"]: r["weight"]
        for r in domain_weights(docs, "source", "score", eta=0.0).collect()
    }
    n_tot = sum(v[0] for v in got.values())
    for d, v in got.items():
        # up to the final renormalization's float ulp (Σ frac_d sums
        # to 1−ε in doubles)
        assert abs(nat[d] - v[0] / n_tot) < 1e-12
    # higher-scoring domains gain share relative to natural at eta>0
    up = [d for d in got if got[d][2] > 0]
    assert any(got[d][3] > nat[d] for d in up)


def test_domain_weight_py_logit_scale_stays_finite():
    """Raw LR logits (or a large eta) must not overflow the exponential:
    the log-sum-exp shift keeps weights finite and normalized, and the
    shift cancels exactly for small exponents (same doubles as before)."""
    import math

    from deep_db_learning_spark.operators.mixing import domain_weight_py

    # means differ by 1e6: unshifted exp overflowed to inf -> NaN weights
    out = domain_weight_py(
        {"hot": (1e6, 1), "cold": (0.0, 1)}, eta=1.0
    )
    ws = {d: w for d, (_m, _e, w) in out.items()}
    assert all(math.isfinite(w) for w in ws.values())
    assert abs(sum(ws.values()) - 1.0) < 1e-12
    assert ws["hot"] > 0.999 and ws["cold"] >= 0.0
