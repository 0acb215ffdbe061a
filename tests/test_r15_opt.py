"""r15 optimization parity pins.

The r15 minhash/mixing change fuses three full-corpus driver jobs into
one per-source groupBy and feeds the collected stats through
driver-side twins of temperature_fractions / domain_weights. These
pins hold the fused paths to IDENTICAL results, and pin the mark_cut
contract the candidate-slice reuse depends on.
"""

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["web", "books", "code", None][i % 4], float(50 + (i * 37) % 900) if i % 11 else None)
        for i in range(1, 400)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, source string, n_chars double")


def test_temperature_fractions_py_matches_df_path(spark, docs):
    from deep_db_learning_spark.operators.mixing import (
        temperature_fractions,
        temperature_fractions_py,
    )

    target = int(0.6 * docs.count())
    df_fr = temperature_fractions(docs, "source", alpha=0.5, target_rows=target)
    counts = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    py_fr = temperature_fractions_py(counts, alpha=0.5, target_rows=target)
    assert df_fr == py_fr


def test_domain_weights_from_stats_matches_df_path(spark, docs):
    from deep_db_learning_spark.functions.exact_agg import exact_sum
    from deep_db_learning_spark.operators.mixing import (
        domain_weights,
        domain_weights_from_stats,
    )

    df_dw = _rows(
        domain_weights(
            docs.select("source", F.col("n_chars").alias("score")),
            "source", "score", eta=0.002, floor=0.05,
        )
    )
    # the fused shape: one unfiltered groupBy, NULL scores skipped by
    # F.sum/F.count, NULL/empty domains dropped on the driver
    srows = docs.groupBy("source").agg(
        exact_sum(F.col("n_chars")).alias("s"),
        F.count("n_chars").alias("n"),
    ).collect()
    stats = {
        r["source"]: (float(r["s"]), int(r["n"]))
        for r in srows
        if r["source"] is not None and r["n"] > 0
    }
    py_dw = _rows(
        domain_weights_from_stats(spark, stats, "source", eta=0.002, floor=0.05)
    )
    assert df_dw == py_dw


def test_mark_cut_makes_cut_lineage_a_noop(spark):
    from deep_db_learning_spark.checkpoint import cut_lineage, mark_cut

    df = spark.range(10).select(F.col("id").alias("v"))
    tagged = mark_cut(df)
    assert tagged is df
    out = cut_lineage(tagged, eager=True)
    # same object back: no checkpoint job was scheduled
    assert out is df
    # a derived frame is a NEW object and must still cut normally
    derived = df.filter(F.col("v") > 3)
    cut = cut_lineage(derived, eager=True)
    assert cut is not derived
    assert _rows(cut) == _rows(derived)


def test_cut_count_counts_and_materializes_in_one_call(spark):
    from deep_db_learning_spark.checkpoint import cut_count, cut_lineage

    df = spark.range(25).select(F.col("id").alias("v")).filter(F.col("v") % 2 == 0)
    out, n = cut_count(df)
    assert n == 13
    assert _rows(out) == _rows(df)
    # the returned frame is tagged as MATERIALIZED: a later eager cut
    # must short-circuit (no second checkpoint of the same object)
    again = cut_lineage(out, eager=True)
    assert again is out
    # and a second cut_count reuses the cut frame too
    out2, n2 = cut_count(out)
    assert out2 is out and n2 == 13


def test_lazy_cut_does_not_satisfy_eager_request(spark):
    # ADVICE r14: a frame cut lazily must NOT short-circuit a later
    # eager request — the tag records the cut mode
    from deep_db_learning_spark.checkpoint import cut_lineage

    df = spark.range(8).select(F.col("id").alias("v"))
    lazy = cut_lineage(df, eager=False)
    assert lazy.__dict__.get("_ddl_lineage_cut") == "lazy"
    # lazy satisfies lazy
    assert cut_lineage(lazy, eager=False) is lazy
    # but an eager request re-cuts (stronger materialization)
    eager = cut_lineage(lazy, eager=True)
    assert eager is not lazy
    assert eager.__dict__.get("_ddl_lineage_cut") is True
    assert _rows(eager) == _rows(df)
