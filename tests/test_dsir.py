"""DSIR importance resampling (operators/dsir.py): cross-engine
bit-parity of the featurizer and the decimal score fold, λ fit
sanity, deterministic + Gumbel selection."""

import math

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.dsir import (
    doc_ngram_buckets,
    doc_ngram_buckets_sql,
    dsir_lambda_py,
    dsir_scores,
    dsir_scores_sql,
    fit_dsir_weights,
    gumbel_select,
    select_top_k,
)

B = 512


@pytest.fixture(scope="module")
def lam(db):
    docs = db.df("documents")
    return fit_dsir_weights(
        docs.where(F.col("source") == "src0"), docs, n_buckets=B
    )


def test_featurizer_matches_duckdb_twin(db, duck):
    got = sorted(
        map(tuple, doc_ngram_buckets(db.df("documents"), n_buckets=B).collect())
    )
    want = sorted(
        map(tuple, duck.execute(
            doc_ngram_buckets_sql("documents", n_buckets=B)
        ).fetchall())
    )
    assert got == want
    assert len(got) > 0
    # occurrence rows: every bucket in range
    assert all(0 <= b < B for _i, b in got)


def test_gram_kernel_slides_on_leading_whitespace(spark, duck):
    """r14 rotation pin (VERDICT r13 task 4): a document starting with
    a tab/newline used to keep a leading space through normalization
    (trim-before-collapse), defeating the second bigram pass's anchor —
    the first pair double-counted and alternating pairs dropped. With
    word_embedding._norm_col adopted in _grams AND the SQL twin, the
    bigram multiset SLIDES: every consecutive pair exactly once,
    identical across engines and to the space-leading spelling."""
    rows = [
        (1, "\ta b c d"),   # the r13 edge: tab-leading
        (2, " a b c d"),    # space-leading (always worked)
        (3, "a b c d"),     # clean
        (4, "\n\na  b\tc d\n"),  # mixed internal whitespace
    ]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(map(tuple, doc_ngram_buckets(sdf, n_buckets=B).collect()))
    import pandas as pd

    duck.register("lead_ws", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        map(
            tuple,
            duck.execute(
                doc_ngram_buckets_sql("lead_ws", n_buckets=B)
            ).fetchall(),
        )
    )
    duck.unregister("lead_ws")
    assert got == want
    # all four docs normalize to 'a b c d': 4 unigrams + 3 sliding
    # bigrams = 7 occurrence rows each, and the per-doc bucket
    # multisets are IDENTICAL (the double-count would break this)
    per_doc = {}
    for i, b in got:
        per_doc.setdefault(i, []).append(b)
    assert all(len(v) == 7 for v in per_doc.values())
    assert len({tuple(sorted(v)) for v in per_doc.values()}) == 1


def test_scores_match_duckdb_twin_bitwise(db, duck, lam):
    got = sorted(map(tuple, dsir_scores(db.df("documents"), lam).collect()))
    want = sorted(
        map(tuple, duck.execute(dsir_scores_sql("documents", lam)).fetchall())
    )
    assert got == want
    assert len(got) == db.df("documents").where(
        F.col("text").isNotNull()
    ).count()


def test_target_documents_score_higher(db, lam):
    """The whole point: documents from the target domain (src0) get a
    higher mean importance than the corpus at large."""
    scores = dsir_scores(db.df("documents"), lam)
    joined = scores.join(
        db.df("documents").select("doc_id", "source"), "doc_id"
    )
    rows = {
        r["grp"]: r["m"]
        for r in joined.groupBy(
            (F.col("source") == "src0").alias("grp")
        ).agg(F.avg("score").alias("m")).collect()
    }
    assert rows[True] > rows[False]


def test_lambda_arithmetic_is_the_shared_python(db, lam):
    """λ recomputed from DuckDB-side counts with the shared python
    helper equals the engine fit exactly (the BM25-idf coupling)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    t = [0] * B
    r = [0] * B
    for bucket, c in con.execute(
        "SELECT bucket, count(*) FROM ("
        + doc_ngram_buckets_sql(
            "(SELECT * FROM documents WHERE source = 'src0')", n_buckets=B
        )
        + ") GROUP BY 1"
    ).fetchall():
        t[bucket] = c
    for bucket, c in con.execute(
        "SELECT bucket, count(*) FROM ("
        + doc_ngram_buckets_sql("documents", n_buckets=B)
        + ") GROUP BY 1"
    ).fetchall():
        r[bucket] = c
    con.close()
    assert dsir_lambda_py(t, r) == lam


def test_select_top_k_deterministic(db, lam):
    scores = dsir_scores(db.df("documents"), lam)
    a = [r["doc_id"] for r in select_top_k(scores, 25).collect()]
    b = [r["doc_id"] for r in select_top_k(scores, 25).collect()]
    assert sorted(a) == sorted(b)
    assert len(a) == 25
    # every kept score >= every dropped score
    kept_min = min(r["score"] for r in select_top_k(scores, 25).collect())
    dropped = scores.join(
        select_top_k(scores, 25).select("doc_id"), "doc_id", "left_anti"
    )
    assert all(r["score"] <= kept_min for r in dropped.collect())


def test_gumbel_select_matches_python_replay(db, lam):
    """The portable-hash Gumbel key replayed in python picks the same
    document set (noise is a deterministic function of (seed, id))."""
    import hashlib

    scores = dsir_scores(db.df("documents"), lam)
    rows = scores.collect()

    def key(doc_id, score, seed=42):
        h = int(
            hashlib.md5(f"dsir-gumbel:{seed}:{doc_id}".encode())
            .hexdigest()[:8],
            16,
        )
        u = (h + 0.5) / float(2**32)
        return score + -math.log(-math.log(u))

    want = sorted(
        (r["doc_id"] for r in rows),
        key=lambda d: (
            -key(d, {x["doc_id"]: x["score"] for x in rows}[d]),
            d,
        ),
    )[:25]
    got = [r["doc_id"] for r in gumbel_select(scores, 25).collect()]
    assert sorted(got) == sorted(want)
    # and a different seed picks a different set (noise is live)
    other = [
        r["doc_id"] for r in gumbel_select(scores, 25, seed=7).collect()
    ]
    assert sorted(other) != sorted(got)


def test_spread_input_memoizes_partition_probe(spark, monkeypatch):
    """The `.rdd` partition probe forces a plan materialization, so its
    verdict is memoized per frame: composing fit + scores on the same
    raw frame probes once, and re-spreading a spread frame never
    touches `.rdd` (spied at the DataFrame class)."""
    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.dsir import spread_input

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
    )
    out1 = spread_input(df)

    calls = {"n": 0}
    cls = type(df)
    orig = cls.rdd  # a functools.cached_property in pyspark 4

    def counting(self):
        calls["n"] += 1
        return orig.func(self)

    monkeypatch.setattr(cls, "rdd", property(counting))
    assert spread_input(df) is out1
    assert spread_input(out1) is out1
    assert calls["n"] == 0
    # a fresh frame still probes (exactly once)
    df2 = spark.range(10).toDF("doc_id")
    spread_input(df2)
    assert calls["n"] == 1
    # a caller-supplied partition count skips the probe entirely
    df3 = spark.range(10).toDF("doc_id")
    spread_input(df3, num_partitions=1)
    assert calls["n"] == 1


def test_spread_input_column_name_collision_and_cache_bypass(spark):
    """DataFrame.__getattr__ resolves unknown attributes to COLUMNS, so
    the memo read must not mistake a column literally named
    `_ddl_spread` for a cached result; and an explicit num_partitions
    bypasses the cache (the caller asserts fresh layout knowledge)."""
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.dsir import spread_input

    trap = spark.range(8).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("_ddl_spread")
    )
    out = spread_input(trap)
    assert isinstance(out, DataFrame)
    assert "_ddl_spread" in out.columns  # the column survives untouched

    df = spark.range(8).toDF("doc_id")
    spread_input(df)
    # explicit num_partitions wins over the memoized result
    par = spark.sparkContext.defaultParallelism
    again = spread_input(df, num_partitions=par + 1)
    assert isinstance(again, DataFrame)
    # plain cached path still intact (memo stability after the bypass)
    assert spread_input(df) is spread_input(df)


def test_spread_input_assertion_does_not_poison_memo(spark):
    """ADVICE r12: a caller-asserted ``num_partitions`` is scoped to
    THAT call — if the assertion is wrong (claims the frame is already
    wide when it really has 1 partition), later plain calls on the
    same frame must still probe and spread, not inherit the unspread
    pass-through from the bad assertion."""
    from deep_db_learning_spark.operators.dsir import spread_input

    par = spark.sparkContext.defaultParallelism
    if par < 2:
        import pytest

        pytest.skip("needs defaultParallelism >= 2")
    df = spark.range(100).coalesce(1).toDF("doc_id")
    # wrong assertion: claims >= par partitions, so no repartition
    lied = spread_input(df, num_partitions=par)
    assert lied.rdd.getNumPartitions() == 1  # the lie passes through
    # ...but the memo was NOT poisoned: the probed path still spreads
    honest = spread_input(df)
    assert honest.rdd.getNumPartitions() == par
    assert spread_input(df) is honest
