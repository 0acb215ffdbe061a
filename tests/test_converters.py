import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.functions import datetime_funcs as dtf
from deep_db_learning_spark.functions import encode, hashing


def test_dict_encode_null_is_zero(spark):
    # FIXTURES micro-fixture 1: NULL→0, sorted values→1..n
    df = spark.createDataFrame([("a",), ("b",), (None,), ("a ",)], "v string")
    out = encode.dict_encode(df, "v", out="code")
    codes = {r["code"] for r in out.collect()}
    assert codes == {0, 1, 2, 3}  # NULL, 'a', 'a ', 'b'
    null_code = out.filter(F.col("v").isNull()).collect()[0]["code"]
    assert null_code == 0


def test_dict_encode_bijection(spark, db):
    df = db.df("customer")
    out = encode.dict_encode(df, "c_mktsegment", out="seg_code")
    pairs = out.select("c_mktsegment", "seg_code").distinct().collect()
    # bijection: one code per value, one value per code
    assert len({p["c_mktsegment"] for p in pairs}) == len(pairs)
    assert len({p["seg_code"] for p in pairs}) == len(pairs)
    assert out.count() == df.count()


def test_reconcile_cardinality(spark):
    # 'a', 'a ' differ raw but match with rstrip → card 2 incl NULL... :
    # values: 'a', 'a ', 'b', None → raw card 4; rstrip card 3
    df = spark.createDataFrame([("a",), ("a ",), ("b",), (None,)], "v string")
    name, codes = encode.reconcile_cardinality(df, "v", 3)
    assert name in ("strip", "rstrip")  # registry order: strip before rstrip
    assert codes.count() == 2  # code table holds non-null values only

    with pytest.raises(RuntimeError):
        encode.reconcile_cardinality(df, "v", 99)


def test_one_hot(db):
    out = encode.one_hot(db.df("orders"), "o_orderstatus")
    cols = [c for c in out.columns if c.startswith("o_orderstatus_")]
    assert len(cols) >= 2
    row = out.select(*cols).agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
    assert all(v == 1 for v in row)


def test_multilabel_binarize(spark):
    # FIXTURES micro-fixture 5: 'a,b' / 'b' / NULL
    df = spark.createDataFrame([("a,b",), ("b",), (None,)], "v string")
    out = encode.multilabel_binarize(df, "v")
    rows = out.orderBy(F.col("v").asc_nulls_first()).collect()
    by_v = {r["v"]: (r["v_a"], r["v_b"]) for r in rows}
    assert by_v["a,b"] == (1, 1)
    assert by_v["b"] == (0, 1)
    assert by_v[None] == (0, 0)


def test_factorize_target(db):
    out = encode.factorize_target(db.df("customer"), "c_mktsegment")
    labels = sorted(r["label"] for r in out.select("label").distinct().collect())
    assert labels == [0, 1, 2, 3, 4]
    assert out.count() == db.df("customer").count()


def test_datetime_decomposition(spark):
    # FIXTURES micro-fixture 4: one ts → _year/_dayofyear/_seconds
    df = spark.createDataFrame(
        [("2024-03-01 13:45:30",)], "ts string"
    ).select(F.to_timestamp("ts").alias("ts"))
    feats = dtf.datetime_features(F.col("ts"))
    row = df.select(
        *[v.alias(k) for k, v in feats.items()],
        dtf.epoch_seconds(F.col("ts")).alias("epoch"),
    ).collect()[0]
    assert row["_year"] == 2024
    assert row["_dayofyear"] == 61  # 2024 is a leap year
    assert row["_seconds_since_midnight"] == 13 * 3600 + 45 * 60 + 30
    assert row["epoch"] > 1_700_000_000


def test_legacy_date_segments(spark):
    df = spark.createDataFrame([("2024-03-01",)], "d string").select(
        F.to_timestamp("d").alias("d")
    )
    feats = dtf.legacy_date_segments(F.col("d"))
    row = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
    assert (row["_year"], row["_month"], row["_day"]) == (2024, 3, 1)
    import datetime

    assert row["_ordinal"] == datetime.date(2024, 3, 1).toordinal()


def test_knuth_hash_matches_duckdb(spark, duck):
    from deep_db_learning_spark.functions.hashing import knuth_hash, knuth_hash_sql

    df = spark.range(0, 1000).select(
        F.col("id"), knuth_hash(F.col("id"), seed=42).alias("h")
    )
    spark_rows = {(r["id"], r["h"]) for r in df.collect()}
    duck_rows = set(
        duck.execute(
            f"SELECT i, {knuth_hash_sql('i', 42)} FROM range(0, 1000) t(i)"
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_md5_prefix_hash_matches_duckdb(spark, duck):
    from deep_db_learning_spark.functions.hashing import (
        md5_prefix_hash,
        md5_prefix_hash_sql,
    )

    df = spark.createDataFrame([("hello",), ("wörld",), ("",)], "s string")
    got = {(r["s"], r["h"]) for r in df.select("s", md5_prefix_hash(F.col("s")).alias("h")).collect()}
    want = set(
        duck.execute(
            f"SELECT s, {md5_prefix_hash_sql('s')} FROM (VALUES ('hello'), ('wörld'), ('')) t(s)"
        ).fetchall()
    )
    assert got == want


def test_split_label_matches_duckdb(spark, duck):
    from deep_db_learning_spark.functions.hashing import split_label, split_label_sql

    df = spark.range(0, 2000).select("id", split_label(F.col("id")).alias("split"))
    got = {(r["id"], r["split"]) for r in df.collect()}
    want = set(
        duck.execute(
            f"SELECT i, {split_label_sql('i')} FROM range(0, 2000) t(i)"
        ).fetchall()
    )
    assert got == want
    # rough proportions
    from collections import Counter

    c = Counter(s for _, s in got)
    assert 0.6 < c["train"] / 2000 < 0.8
    assert 0.1 < c["test"] / 2000 < 0.3


def test_unidecode(spark):
    from deep_db_learning_spark.functions.normalize import normalize

    df = spark.createDataFrame([("Čžüé",), (None,)], "v string")
    rows = df.select(normalize(F.col("v"), "unidecode_ci").alias("v")).collect()
    vals = {r["v"] for r in rows}
    assert "czue" in vals and None in vals


def test_code_table_rejects_high_cardinality(spark, db):
    """A high-card column masquerading as `cat` (free text, an id) must
    raise loudly instead of funneling its whole distinct set through the
    single-reducer ranking and a broadcast (the contract guard)."""
    import pytest
    from pyspark.sql import functions as F

    from deep_db_learning_spark.functions.encode import (
        build_code_table,
        dict_encode,
        factorize_target,
    )

    # an id column guessed as categorical: 5000 distinct "values"
    fake_cat = spark.range(5000).select(
        F.concat(F.lit("user_"), F.col("id").cast("string")).alias("who")
    )
    with pytest.raises(ValueError, match="not a categorical"):
        build_code_table(fake_cat, "who", max_card=1000)
    # dict_encode hits the same guard through its table build
    with pytest.raises(ValueError, match="not a categorical"):
        dict_encode(
            fake_cat, "who",
            code_table=build_code_table(fake_cat, "who", max_card=100),
        )
    # explicit opt-in past the cap still works
    assert build_code_table(fake_cat, "who", max_card=10_000).count() == 5000
    # genuinely categorical columns are untouched
    li = db.df("lineitem")
    assert build_code_table(li, "l_linestatus", max_card=5).count() <= 5
    assert factorize_target(
        li.select("l_returnflag"), "l_returnflag"
    ).count() == li.count()
