"""Point-in-time feature-store joins (plans/feature_store.py) —
DuckDB twin on the smoke data, staleness nulling, leakage audit,
duplicate-spine sharing, and rolling decimal exactness."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deep_db_learning_spark.plans.feature_store import (
    FeatureView,
    RollingFeature,
    build_training_frame,
    point_in_time_audit,
    rolling_sum_oracle_sql,
)


@pytest.fixture(scope="module")
def frame(db):
    ev = db.df("events")
    spine = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("id"), "user_id", "ts",
        F.col("value").alias("label"),
    )
    views = [
        FeatureView(
            name="lastview",
            source=ev.filter(F.col("event_type") == "view"),
            entity_col="user_id",
            ts_col="ts",
            features=["value"],
            max_staleness="3 days",
            tie_break=["event_id"],
        )
    ]
    rollings = [
        RollingFeature(
            name="clicks24",
            source=ev.filter(F.col("event_type") == "click"),
            entity_col="user_id",
            ts_col="ts",
            window="24 hours",
            value_col="value",
        )
    ]
    return build_training_frame(spine, "user_id", "ts", views, rollings)


def _twin_sql():
    roll_sum = rolling_sum_oracle_sql(
        "sum(CASE WHEN side = 0 THEN CAST(cv AS DECIMAL(30,9)) END) OVER w"
    )
    return f"""
    WITH vsrc AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'view'
      QUALIFY row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ), u AS (
      SELECT user_id, ts AS uts, 1 AS side, event_id, value AS label,
             NULL AS vv, NULL AS vts
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 0, NULL, NULL, value, ts FROM vsrc
    ), c AS (
      SELECT user_id, uts, side, event_id, label,
             last_value(vv IGNORE NULLS) OVER w AS vv_raw,
             last_value(vts IGNORE NULLS) OVER w AS vts_raw
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY uts, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), ru AS (
      SELECT user_id, ts AS uts, 1 AS side, CAST(NULL AS DOUBLE) AS cv
      FROM (SELECT DISTINCT user_id, ts FROM events
            WHERE event_type = 'purchase')
      UNION ALL
      SELECT user_id, ts, 0, value FROM events WHERE event_type = 'click'
    ), roll AS (
      SELECT user_id, uts, side,
             count(CASE WHEN side = 0 THEN 1 END) OVER w AS cnt,
             coalesce({roll_sum}, 0.0) AS vsum
      FROM ru
      WINDOW w AS (PARTITION BY user_id ORDER BY uts
                   RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                   AND CURRENT ROW)
    )
    SELECT c.event_id AS id, c.user_id, CAST(c.uts AS TIMESTAMP) AS ts,
           c.label,
           CASE WHEN vts_raw >= c.uts - INTERVAL 3 DAYS
                THEN vv_raw END AS lastview_value,
           CAST(CASE WHEN vts_raw >= c.uts - INTERVAL 3 DAYS
                THEN vts_raw END AS TIMESTAMP) AS lastview_ts,
           CAST(r.cnt AS BIGINT) AS clicks24_cnt,
           r.vsum AS clicks24_sum
    FROM c
    JOIN roll r ON r.user_id = c.user_id AND r.uts = c.uts AND r.side = 1
    WHERE c.side = 1
    """


def test_matches_duckdb_twin(frame, duck):
    got = sorted(
        (
            r["id"], r["user_id"], r["ts"], r["label"],
            r["lastview_value"], r["lastview_ts"],
            r["clicks24_cnt"], r["clicks24_sum"],
        )
        for r in frame.collect()
    )
    want = sorted(tuple(r) for r in duck.execute(_twin_sql()).fetchall())
    assert got == want
    assert len(got) > 0


def test_leakage_audit_zero(frame):
    audit = point_in_time_audit(frame, "ts", ["lastview_ts"]).first()
    assert audit["lastview_ts_leaks"] == 0


def test_staleness_nulls_old_matches(spark):
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    spine = spark.createDataFrame(
        [
            Row(id=1, k=1, ts=t0),  # feature 1 day old → kept
            Row(id=2, k=2, ts=t0),  # feature 9 days old → nulled
            Row(id=3, k=3, ts=t0),  # no feature at all → null
        ]
    )
    feats = spark.createDataFrame(
        [
            Row(k=1, ts=t0 - dt.timedelta(days=1), v=10.0),
            Row(k=2, ts=t0 - dt.timedelta(days=9), v=20.0),
        ]
    )
    out = build_training_frame(
        spine, "k", "ts",
        views=[FeatureView("f", feats, "k", "ts", ["v"], max_staleness="3 days")],
    )
    rows = {r["id"]: (r["f_v"], r["f_ts"]) for r in out.collect()}
    assert rows[1] == (10.0, t0 - dt.timedelta(days=1))
    assert rows[2] == (None, None)
    assert rows[3] == (None, None)


def test_duplicate_spine_points_share_rolling_value(spark):
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    spine = spark.createDataFrame(
        [Row(id=1, k=1, ts=t0), Row(id=2, k=1, ts=t0)]
    )
    src = spark.createDataFrame(
        [
            Row(k=1, ts=t0 - dt.timedelta(hours=1), v=1.5),
            Row(k=1, ts=t0 - dt.timedelta(hours=25), v=99.0),  # outside
            Row(k=1, ts=t0, v=2.5),  # boundary: inclusive
        ]
    )
    out = build_training_frame(
        spine, "k", "ts",
        rollings=[RollingFeature("r24", src, "k", "ts", "24 hours", value_col="v")],
    )
    rows = {r["id"]: (r["r24_cnt"], r["r24_sum"]) for r in out.collect()}
    assert rows[1] == (2, 4.0)
    assert rows[2] == (2, 4.0)


def test_rolling_count_without_value_col(spark):
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    spine = spark.createDataFrame([Row(id=1, k=1, ts=t0)])
    src = spark.createDataFrame([Row(k=1, ts=t0 - dt.timedelta(hours=2))])
    out = build_training_frame(
        spine, "k", "ts",
        rollings=[RollingFeature("r", src, "k", "ts", "24 hours")],
    )
    row = out.first()
    assert row["r_cnt"] == 1
    assert "r_sum" not in out.columns


def test_empty_window_yields_zero_not_null(spark):
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    spine = spark.createDataFrame([Row(id=1, k=7, ts=t0)])
    src = spark.createDataFrame([Row(k=1, ts=t0, v=5.0)])  # other entity
    out = build_training_frame(
        spine, "k", "ts",
        rollings=[RollingFeature("r", src, "k", "ts", "24 hours", value_col="v")],
    )
    row = out.first()
    assert row["r_cnt"] == 0
    assert row["r_sum"] == 0.0


def test_view_tie_break_deterministic(spark):
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    spine = spark.createDataFrame([Row(id=1, k=1, ts=t0)])
    feats = spark.createDataFrame(
        [
            Row(k=1, ts=t0, v=1.0, eid=5),
            Row(k=1, ts=t0, v=2.0, eid=9),  # largest tie_break wins
        ]
    )
    out = build_training_frame(
        spine, "k", "ts",
        views=[FeatureView("f", feats, "k", "ts", ["v"], tie_break=["eid"])],
    )
    assert out.first()["f_v"] == 2.0
