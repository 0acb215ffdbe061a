"""Stupid-backoff LM perplexity (operators/lm.py) — fit parity with
the independent DuckDB re-fit, bit-exact score parity, backoff and
edge-case semantics, and the scoring plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators import lm as L


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck_rows(duck, sql):
    return sorted(tuple(r) for r in duck.sql(sql).fetchall())


@pytest.fixture(scope="module")
def docs(db):
    return db.df("documents")


@pytest.fixture(scope="module")
def model(docs):
    return L.fit_stupid_backoff(docs, vocab_size=64, bigram_k=512)


@pytest.fixture(scope="module")
def duck_model(duck):
    return L.fit_counts_duckdb(duck, vocab_size=64, bigram_k=512)


def test_fit_matches_independent_duckdb_fit(model, duck_model):
    # counts, vocab order, and the derived log tables all agree —
    # the two fits share no code besides the count→log helper
    assert model == duck_model


def test_scores_match_oracle_bitwise(docs, model, duck):
    got = _rows(L.perplexity_scores(docs, model))
    want = _duck_rows(duck, L.perplexity_oracle_sql(model))
    assert got == want


def test_backoff_semantics(spark):
    # corpus: "a b" x3 and "a c" x1 — vocab {a, b, c}; the pair (c, a)
    # never occurs so scoring "c a" must take the backoff branch
    rows = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    m = L.fit_stupid_backoff(df, vocab_size=8, bigram_k=64)
    # T=8: a:4 b:3 c:1
    assert m.uni_counts == {"a": 4, "b": 3, "c": 1, L.UNK: 0}
    assert m.bi_counts == {("a", "b"): 3, ("a", "c"): 1}
    assert m.uni_logp["a"] == math.log(4 / 8)
    assert m.bi_logp[("a", "b")] == math.log(3 / 4)

    q = spark.createDataFrame([(9, "c a")], "doc_id int, text string")
    got = L.perplexity_scores(q, m).collect()[0]
    want = m.uni_logp["c"] + (m.lam_log + m.uni_logp["a"])
    assert got["n_tokens"] == 2
    assert got["logp_sum"] == pytest.approx(want, abs=1e-9)


def test_oov_maps_to_unk(spark):
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z")], "doc_id int, text string"
    )
    m = L.fit_stupid_backoff(df, vocab_size=1, bigram_k=8)  # vocab = {x}
    assert m.vocab == ("x",)
    assert m.uni_counts[L.UNK] == 2  # y, z
    # mapped bigrams: (x,x),(x,<unk>) from doc1; (x,<unk>) from doc2
    assert m.bi_counts == {("x", "x"): 1, ("x", L.UNK): 2}
    q = spark.createDataFrame([(3, "q")], "doc_id int, text string")
    got = L.perplexity_scores(q, m).collect()[0]
    assert got["logp_sum"] == pytest.approx(m.uni_logp[L.UNK], abs=1e-9)


def test_empty_and_null_docs_survive(spark, model):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "the data")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in L.perplexity_scores(df, model).collect()}
    assert set(got) == {1, 2, 3}
    for i in (1, 2):
        assert got[i]["n_tokens"] == 0
        assert got[i]["logp_sum"] is None and got[i]["avg_nll"] is None
    assert got[3]["n_tokens"] == 2
    assert got[3]["avg_nll"] == pytest.approx(
        -got[3]["logp_sum"] / 2, abs=1e-9
    )


def test_filter_keeps_head_and_original_rows(docs, model):
    scores = L.perplexity_scores(docs, model)
    thr = scores.agg(F.expr("percentile(avg_nll, 0.5)")).collect()[0][0]
    kept = L.perplexity_filter(docs, model, max_avg_nll=thr)
    assert kept.columns == docs.columns
    n_kept = kept.count()
    n_head = scores.filter(F.col("avg_nll") <= thr).count()
    assert n_kept == n_head
    assert 0 < n_kept < docs.count()


def test_scoring_plan_broadcasts_model_single_shuffle(docs, model):
    df = L.perplexity_scores(docs, model)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("BroadcastHashJoin") >= 2
    # two real shuffles (the _spread repartition of a single-file scan
    # + the per-doc fold); formatted output double-counts
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 4
