from pyspark.sql import functions as F

from deep_db_learning_spark.functions.convert import (
    convert_database,
    convert_table,
    drop_constant_columns,
)
from deep_db_learning_spark.schema import ColumnSpec, TableSpec


def _orders_spec():
    return TableSpec(
        columns={
            "o_orderkey": ColumnSpec("omit", key=True),
            "o_custkey": ColumnSpec("omit"),
            "o_orderstatus": ColumnSpec("cat", card=3),
            "o_totalprice": ColumnSpec("num"),
            "o_orderdate": ColumnSpec("datetime"),
            "o_orderpriority": ColumnSpec("cat", card=5),
        }
    )


def test_convert_table_expansion_and_pruning(db, duck):
    out = convert_table(
        db.df("orders"), _orders_spec(), keep=["o_orderkey"]
    )
    # 1->N expansion: datetime -> 3 cols; omit/key pruned; cat -> _code
    assert set(out.columns) == {
        "o_orderkey",
        "o_totalprice",
        "o_orderdate_year",
        "o_orderdate_dayofyear",
        "o_orderdate_seconds_since_midnight",
        "o_orderstatus_code",
        "o_orderpriority_code",
    }
    got = {
        r["o_orderkey"]: (
            r["o_totalprice"],
            r["o_orderdate_year"],
            r["o_orderstatus_code"],
        )
        for r in out.collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            """
            SELECT o_orderkey, coalesce(o_totalprice, 0),
                   CAST(year(o_orderdate) AS INT),
                   coalesce((SELECT code FROM (
                      SELECT v AS value, row_number() OVER (ORDER BY v) AS code
                      FROM (SELECT DISTINCT o_orderstatus AS v FROM orders
                            WHERE o_orderstatus IS NOT NULL)) m
                      WHERE m.value = o_orderstatus), 0)
            FROM orders
            """
        ).fetchall()
    }
    assert got == want


def test_convert_custom_converter_override(db):
    # user extension point: replace the num converter (per_type dispatch)
    def log_num(spec, c, name):
        return {f"{name}_log": F.log1p(c)}

    out = convert_table(
        db.df("orders"),
        _orders_spec(),
        converters={"num": log_num},
        keep=["o_orderkey"],
    )
    assert "o_totalprice_log" in out.columns
    assert "o_totalprice" not in out.columns


def test_drop_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, 7.0, "x"), (2, 7.0, "y"), (3, 7.0, None)],
        "id bigint, const double, var string",
    )
    out = drop_constant_columns(df, protected=["id"])
    assert set(out.columns) == {"id", "var"}


def test_convert_database_all_tables(db):
    from deep_db_learning_spark.profiling import SchemaAnalyzer

    schema = SchemaAnalyzer(db.tables, db.primary_keys, db.foreign_keys).guess_schema()
    out = convert_database(
        {t: db.df(t) for t in ("orders", "customer")},
        schema,
        keep={"orders": ["o_orderkey"], "customer": ["c_custkey"]},
    )
    assert set(out) == {"orders", "customer"}
    # every output column is numeric, except text passthrough (N6 stage)
    text_cols = {
        (t, c)
        for t in out
        for c, spec in schema[t].columns.items()
        if spec.type == "text"
    }
    for t, df in out.items():
        for f in df.schema.fields:
            if (t, f.name) in text_cols:
                assert f.dataType.simpleString() == "string"
                continue
            assert f.dataType.simpleString() in ("int", "bigint", "float", "double"), (
                t,
                f.name,
                f.dataType,
            )


def test_duration_seconds_and_clamp(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from deep_db_learning_spark.functions.datetime_funcs import (
        clamp_to_pandas_bounds,
        duration_seconds,
    )

    df = spark.sql(
        "SELECT INTERVAL '1 02:03:04.5' DAY TO SECOND AS d, "
        "TIMESTAMP '1500-01-01 00:00:00' AS early, "
        "TIMESTAMP '2400-01-01 00:00:00' AS late, "
        "TIMESTAMP '2020-06-15 12:00:00' AS mid"
    )
    row = df.select(
        duration_seconds(F.col("d")).alias("secs"),
        clamp_to_pandas_bounds(F.col("early")).alias("early_c"),
        clamp_to_pandas_bounds(F.col("late")).alias("late_c"),
        clamp_to_pandas_bounds(F.col("mid")).alias("mid_c"),
    ).collect()[0]
    assert row["secs"] == 1 * 86400 + 2 * 3600 + 3 * 60 + 4.5
    assert row["early_c"] == dt.datetime(1677, 9, 22, 0, 12, 43)
    assert row["late_c"] == dt.datetime(2262, 4, 11, 23, 47, 16)
    assert row["mid_c"] == dt.datetime(2020, 6, 15, 12, 0, 0)


def test_convert_time_and_duration_specs(spark):
    """F5/F8 through the registry: a 'time' string column decomposes to
    seconds-since-midnight; a 'duration' interval column to seconds."""
    from deep_db_learning_spark.schema import ColumnSpec, TableSpec

    df = spark.sql(
        "SELECT '13:45:30' AS t, INTERVAL '0 01:00:00' DAY TO SECOND AS d, 1 AS id"
    )
    out = convert_table(
        df,
        TableSpec(columns={
            "t": ColumnSpec("time"),
            "d": ColumnSpec("duration"),
            "id": ColumnSpec("omit"),
        }),
    )
    row = out.collect()[0]
    assert row["t"] == 13 * 3600 + 45 * 60 + 30  # in-place seconds value
    assert row["d_seconds"] == 3600.0
    assert "id" not in out.columns
