from pyspark.sql import functions as F

from deep_db_learning_spark.functions.encode import dict_encode
from deep_db_learning_spark.operators.embedder import (
    assemble_features,
    deterministic_embedding_table,
    embed_categorical,
    embed_numeric,
    impute_values,
)


def test_embedding_table_shape_and_determinism(spark):
    t1 = deterministic_embedding_table(spark, card=5, dim=4)
    rows = t1.collect()
    assert len(rows) == 6  # codes 0..card, 0 = NULL
    assert all(len(r["vec"]) == 4 for r in rows)
    assert all(all(-0.5 <= x < 0.5 for x in r["vec"]) for r in rows)
    t2 = deterministic_embedding_table(spark, card=5, dim=4)
    assert [r["vec"] for r in t1.orderBy("code").collect()] == [
        r["vec"] for r in t2.orderBy("code").collect()
    ]


def test_embed_categorical_is_lookup(db):
    enc = dict_encode(db.df("customer"), "c_mktsegment", out="seg_code")
    out = embed_categorical(enc, "seg_code", card=5, dim=3)
    table = {
        r["code"]: r["vec"]
        for r in deterministic_embedding_table(enc.sparkSession, 5, 3).collect()
    }
    for r in out.select("seg_code", "seg_code_emb").limit(50).collect():
        assert r["seg_code_emb"] == table[r["seg_code"]]


def test_embed_numeric_linear(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (2.0,)], "x double")
    out = df.select(embed_numeric(F.col("x"), dim=3).alias("v")).collect()
    v0, v1, v2 = [r["v"] for r in out]
    # Linear(1, dim): v(x) = x*w + b => v2 - v1 == v1 - v0 (per dim)
    for a, b, c in zip(v0, v1, v2):
        assert abs((c - b) - (b - a)) < 1e-12
    # bias = v(0)
    assert v0 != [0.0, 0.0, 0.0]


def test_assemble_and_impute(spark):
    df = spark.createDataFrame(
        [(1, None, [1.0], [2.0, 3.0])], "id bigint, x double, a array<double>, b array<double>"
    )
    imp = impute_values(df, {"x": ("mean", 7.5)})
    assert imp.collect()[0]["x"] == 7.5
    asm = assemble_features(imp, ["a", "b"])
    assert asm.collect()[0]["features"] == [1.0, 2.0, 3.0]


def test_text_embedding_shape_and_determinism(db):
    from deep_db_learning_spark.operators.embedder import text_embedding

    docs = db.df("documents").limit(20)
    out1 = {
        r["doc_id"]: r["text_emb"]
        for r in text_embedding(docs, "text", dim=8).collect()
    }
    out2 = {
        r["doc_id"]: r["text_emb"]
        for r in text_embedding(docs, "text", dim=8).collect()
    }
    assert out1 == out2
    assert all(len(v) == 8 for v in out1.values())
    # L2-normalized non-empty docs
    import math

    for v in out1.values():
        n = math.sqrt(sum(x * x for x in v))
        assert abs(n - 1.0) < 1e-9 or n == 0.0


def test_imputation_stats_and_apply(spark):
    from deep_db_learning_spark.profiling.profiler import imputation_stats

    df = spark.createDataFrame(
        [(1.0, "a"), (3.0, "a"), (None, "b"), (None, None)],
        "x double, c string",
    )
    strat = imputation_stats(df, num_cols=["x"], cat_cols=["c"])
    assert strat["x"] == ("mean", 2.0)
    assert strat["c"] == ("most_frequent", "a")
    fixed = impute_values(df, strat)
    rows = fixed.collect()
    assert all(r["x"] is not None and r["c"] is not None for r in rows)


def test_run_trials_concurrent(db):
    from deep_db_learning_spark.plans import minimum_slice, run_trials

    def trial(params):
        return minimum_slice(
            db.tables,
            db.primary_keys,
            db.foreign_keys,
            target=("customer", "c_mktsegment"),
            depth=params["depth"],
            fit_model=False,
        )

    out = run_trials(trial, [{"depth": 1}, {"depth": 2}], max_concurrency=2)
    assert len(out) == 2
    assert all(not isinstance(r, Exception) for _, r in out)
    assert len(out[1][1].features.columns) > len(out[0][1].features.columns)
