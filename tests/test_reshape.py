"""Pivot/unpivot (operators/reshape.py) — DuckDB conditional-aggregate
twin, fill semantics, domain cap, round-trip, and single-shuffle plan."""

import re
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from tools.selfcheck import canon_rows  # noqa: E402

from deep_db_learning_spark.functions.exact_agg import (  # noqa: E402
    exact_sum,
    exact_sum_sql,
)
from deep_db_learning_spark.operators.reshape import (  # noqa: E402
    pivot_agg,
    pivot_domain,
    unpivot,
)

TYPES = ["click", "error", "purchase", "signup", "view"]


def test_pivot_matches_duckdb_conditional_agg(db, duck):
    wide = pivot_agg(
        db.df("events"),
        "user_id",
        "event_type",
        TYPES,
        exact_sum,
        "value",
        prefix="sum_",
        fill=0.0,
    )
    cases = ",\n".join(
        "COALESCE("
        + exact_sum_sql(f"CASE WHEN event_type = '{t}' THEN value END")
        + f", CAST('0' AS DOUBLE)) AS sum_{t}"
        for t in TYPES
    )
    res = duck.execute(
        f"SELECT user_id, {cases} FROM events GROUP BY user_id"
    )
    ocols = [d[0] for d in res.description]
    sh, sl = canon_rows(wide.columns, [tuple(r) for r in wide.collect()])
    oh, ol = canon_rows(ocols, res.fetchall())
    assert sorted(wide.columns) == sorted(ocols)
    assert sh == oh, [(a, b) for a, b in zip(sl, ol) if a != b][:3]


def test_fill_and_missing_categories(spark):
    df = spark.createDataFrame(
        [Row(k=1, c="a", v=1.0), Row(k=1, c="a", v=2.0), Row(k=2, c="b", v=5.0)]
    )
    wide = pivot_agg(df, "k", "c", ["a", "b", "z"], exact_sum, "v", fill=0.0)
    rows = {r["k"]: (r["a"], r["b"], r["z"]) for r in wide.collect()}
    assert rows == {1: (3.0, 0.0, 0.0), 2: (0.0, 5.0, 0.0)}
    # without fill, empty cells stay NULL
    wide2 = pivot_agg(df, "k", "c", ["a", "b"], exact_sum, "v")
    rows2 = {r["k"]: (r["a"], r["b"]) for r in wide2.collect()}
    assert rows2 == {1: (3.0, None), 2: (None, 5.0)}


def test_pivot_domain_discovery_and_cap(db):
    assert pivot_domain(db.df("events"), "event_type") == TYPES
    with pytest.raises(ValueError, match="exceeds cap"):
        pivot_domain(db.df("events"), "user_id", cap=10)


def test_unpivot_round_trip(db):
    ev = db.df("events")
    wide = pivot_agg(
        ev, "user_id", "event_type", TYPES, exact_sum, "value", fill=0.0
    )
    long = unpivot(wide, "user_id", TYPES, "event_type", "sum_value")
    # compare against the direct long aggregate (fill=0.0 adds rows for
    # absent (user, type) combos — filter them out on both sides? no:
    # keep them, the direct agg is padded the same way via the domain
    # cross join)
    direct = (
        ev.groupBy("user_id", "event_type")
        .agg(exact_sum("value").alias("sum_value"))
    )
    users = ev.select("user_id").distinct()
    types = ev.sparkSession.createDataFrame(
        [(t,) for t in TYPES], "event_type string"
    )
    padded = (
        users.crossJoin(types)
        .join(direct, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )
    lh, _ = canon_rows(long.columns, [tuple(r) for r in long.collect()])
    ph, _ = canon_rows(padded.columns, [tuple(r) for r in padded.collect()])
    assert lh == ph


def test_pivot_single_shuffle_unpivot_none(db):
    wide = pivot_agg(
        db.df("events"), "user_id", "event_type", TYPES, exact_sum, "value"
    )
    plan = wide._jdf.queryExecution().explainString(
        wide.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # formatted explain prints each node twice → 2 == one real shuffle
    assert len(re.findall(r"\bExchange\b", plan)) <= 2
    long = unpivot(wide, "user_id", TYPES)
    plan2 = long._jdf.queryExecution().explainString(
        long.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the expand adds no shuffle beyond the upstream pivot's
    assert len(re.findall(r"\bExchange\b", plan2)) <= 2
