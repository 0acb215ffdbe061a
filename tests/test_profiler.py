from pyspark.sql import functions as F

from deep_db_learning_spark.profiling import (
    SchemaAnalyzer,
    distinct_count_including_null,
    profile_table,
)


def test_profile_matches_duckdb(db, duck):
    stats = profile_table(db.df("customer"))
    for col in ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"):
        nd = duck.execute(
            f"SELECT count(*) FROM (SELECT DISTINCT {col} FROM customer)"
        ).fetchone()[0]
        nn = duck.execute(f"SELECT count({col}) FROM customer").fetchone()[0]
        assert stats[col].n_distinct == nd, col
        assert stats[col].n_nonnull == nn, col
    assert stats["c_custkey"].n_rows == 150


def test_null_inclusive_distinct(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "v string"
    )
    stats = profile_table(df)
    assert stats["v"].n_distinct == 3  # a, b, NULL — reference A1 semantics
    assert stats["v"].has_null
    assert distinct_count_including_null(df, "v") == 3


def test_profile_auto_mode(db):
    exact = profile_table(db.df("orders"))
    auto = profile_table(db.df("orders"), mode="auto")
    # columns that might be categorical get exact refinement
    assert auto["o_orderstatus"].n_distinct == exact["o_orderstatus"].n_distinct
    assert not auto["o_orderstatus"].approximate


def test_schema_inference_golden(db):
    analyzer = SchemaAnalyzer(
        db.tables,
        primary_keys=db.primary_keys,
        foreign_keys=db.foreign_keys,
        target=("customer", "c_mktsegment"),
    )
    schema = analyzer.guess_schema()

    # FIXTURES.md expectations
    c = schema["customer"].columns
    assert c["c_custkey"].type == "omit" and c["c_custkey"].key  # lone PK
    assert c["c_nationkey"].type == "omit"  # non-composite FK
    assert c["c_acctbal"].type == "num"
    assert c["c_mktsegment"].type == "cat" and c["c_mktsegment"].card == 5

    r = schema["region"].columns
    assert r["r_regionkey"].type == "omit" and r["r_regionkey"].key
    # 5 rows / 5 distinct → ratio 1.0 > 0.2: the reference's verbatim
    # tree (schema_autodetect.py:372-380) infers text for tiny dims
    assert r["r_name"].type == "text"

    o = schema["orders"].columns
    assert o["o_orderkey"].type == "omit"
    assert o["o_custkey"].type == "omit"
    assert o["o_orderstatus"].type == "cat"
    assert o["o_totalprice"].type == "num"
    assert o["o_orderdate"].type == "datetime"
    assert o["o_orderpriority"].type == "cat"

    l = schema["lineitem"].columns
    # composite-PK members are NOT auto-omitted (lone-PK rule only)
    assert l["l_linenumber"].key and l["l_linenumber"].type != "omit"
    assert l["l_orderkey"].type == "omit"  # but FK-omit still applies
    assert l["l_returnflag"].type == "cat"
    assert l["l_quantity"].type == "num"
    assert l["l_shipdate"].type == "datetime"

    p = schema["part"].columns
    assert p["p_size"].type == "num"  # numeric-name regex
    assert p["p_retailprice"].type == "num"
    assert p["p_brand"].type == "cat"


def test_target_never_omitted(db):
    import pytest

    # with an explicit target_type, the target bypasses PK/FK omission
    # (reference guess_column_type :441-449)
    analyzer = SchemaAnalyzer(
        db.tables,
        primary_keys=db.primary_keys,
        foreign_keys=db.foreign_keys,
        target=("customer", "c_custkey"),
        target_type="num",
    )
    spec = analyzer.guess_column_type("customer", "c_custkey")
    assert spec.type == "num" and spec.key

    # without target_type, the lone-PK early return still applies —
    # parity with the reference's control flow (:451-461 runs in the
    # else branch only when target_type is None... it does NOT, so the
    # PK omit short-circuits even for the target)
    analyzer2 = SchemaAnalyzer(
        db.tables,
        primary_keys=db.primary_keys,
        foreign_keys=db.foreign_keys,
        target=("customer", "c_custkey"),
    )
    assert analyzer2.guess_column_type("customer", "c_custkey").type == "omit"


def test_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id int, v string")
    analyzer = SchemaAnalyzer({"t": df}, primary_keys={"t": ["id"]})
    schema = analyzer.guess_schema()
    assert schema["t"].columns["v"].type == "omit"

    import pytest

    analyzer2 = SchemaAnalyzer(
        {"t": df}, primary_keys={"t": ["id"]}, target=("t", "v")
    )
    with pytest.raises(ValueError):
        analyzer2.guess_schema()


def test_plural_and_id_heuristics(spark):
    # integer column with many distinct values + ID name → omit;
    # plural name low-card → num; low-card status → cat
    rows = [(i, i, i % 3, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "user_id int, votes int, level int, status string")
    analyzer = SchemaAnalyzer({"t": df})
    s = analyzer.guess_schema()["t"].columns
    assert s["user_id"].type == "omit"
    assert s["votes"].type == "num"  # plural noun... and high ratio → num anyway
    assert s["level"].type == "cat"
    assert s["status"].type == "cat"


def test_numeric_stats_matches_numpy(db):
    import numpy as np

    from deep_db_learning_spark.profiling.profiler import numeric_stats

    out = {
        r["column_name"]: r
        for r in numeric_stats(
            db.df("lineitem"), ["l_quantity", "l_extendedprice"]
        ).collect()
    }
    pdf = db.df("lineitem").select("l_quantity", "l_extendedprice").toPandas()
    for c in ("l_quantity", "l_extendedprice"):
        v = pdf[c].to_numpy()
        r = out[c]
        assert r["n"] == len(v)
        assert abs(r["mean"] - v.mean()) < 1e-9 * max(1, abs(v.mean()))
        assert r["min"] == v.min() and r["max"] == v.max()
        assert abs(r["std"] - v.std(ddof=1)) < 1e-9 * max(1, v.std(ddof=1))


def test_auto_mode_decisions_match_exact(db):
    """mode='auto' must reach the same analyzer decisions as exact
    profiling on every table - the 100 TB profiling path is only valid
    if the HLL pass + boundary refinement never flips a type."""
    from deep_db_learning_spark.profiling import SchemaAnalyzer

    exact = SchemaAnalyzer(db.tables, db.primary_keys, db.foreign_keys).guess_schema()
    auto = SchemaAnalyzer(
        db.tables, db.primary_keys, db.foreign_keys, profile_mode="auto"
    ).guess_schema()
    for t in exact.tables:
        ec = exact.tables[t].columns
        ac = auto.tables[t].columns
        assert set(ec) == set(ac)
        for c in ec:
            assert ec[c].type == ac[c].type, (t, c)
            # exact cardinality refinement: cat columns agree on card
            if ec[c].type == "cat":
                assert ec[c].card == ac[c].card, (t, c)


def test_plural_fallback_irregulars_and_false_positives():
    """The inflect-free fallback tracks inflect on the two divergence
    classes: irregular plurals without a trailing 's' and singular
    nouns ending in 's' beyond the ss/us/is suffix rules."""
    from deep_db_learning_spark.profiling.analyzer import _is_plural

    for plural in ("children", "indices", "data", "media", "criteria",
                   "orders", "items", "countries", "boxes", "analyses"):
        assert _is_plural(plural), plural
    for singular in ("alias", "bias", "gas", "lens", "news", "status",
                     "address", "axis", "analysis", "campus", "order"):
        assert not _is_plural(singular), singular


def test_pairwise_correlations_match_twin_and_ground_truth(spark, db, duck):
    """One-scan pairwise-complete Pearson: DuckDB twin bit-equal on
    lineitem measures; a handcrafted frame pins sign/magnitude, the
    pairwise-deletion n, the constant-column NULL, and perfect
    correlation."""
    from deep_db_learning_spark.profiling.profiler import (
        pairwise_correlations,
        pairwise_correlations_oracle_sql,
    )

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = sorted(
        map(tuple, pairwise_correlations(db.df("lineitem"), cols).collect())
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                pairwise_correlations_oracle_sql("lineitem", cols)
            ).fetchall(),
        )
    )
    assert got == want and len(got) == 6

    rows = [
        # y = 2x (perfect +), z constant, w anti-correlated, one NULL
        (1.0, 2.0, 5.0, 4.0),
        (2.0, 4.0, 5.0, 3.0),
        (3.0, 6.0, 5.0, 2.0),
        (4.0, 8.0, 5.0, None),
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    out = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr"])
        for r in pairwise_correlations(df, ["x", "y", "z", "w"]).collect()
    }
    assert abs(out[("x", "y")][1] - 1.0) < 1e-12
    assert out[("x", "z")] == (4, None)  # zero variance -> undefined
    assert out[("w", "x")][0] == 3  # pairwise deletion drops the NULL row
    assert abs(out[("w", "x")][1] + 1.0) < 1e-12


def test_key_skew_report_matches_twin_and_semantics(spark, db, duck):
    from deep_db_learning_spark.profiling.profiler import (
        key_skew_report,
        key_skew_report_oracle_sql,
    )

    got = sorted(
        map(tuple, key_skew_report(db.df("lineitem"), "l_partkey", k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                key_skew_report_oracle_sql("lineitem", "l_partkey", k=10)
            ).fetchall(),
        )
    )
    assert got == want and len(got) == 10

    # handcrafted skew: one hub key + uniform tail, plus NULLs
    rows = [(1,)] * 90 + [(i,) for i in range(2, 12)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "k bigint")
    rep = {r["rank"]: (r["key"], r["cnt"], r["share"], r["skew_factor"])
           for r in key_skew_report(df, "k", k=3).collect()}
    key, cnt, share, skew = rep[1]
    assert key == "1" and cnt == 90
    # 105 rows over 12 distinct keys (NULL is a key) -> mean 8.75
    assert abs(share - 90 / 105) < 1e-15
    assert abs(skew - 90 / (105 / 12)) < 1e-12
    assert rep[2][0] is None and rep[2][1] == 5  # NULL group reported
