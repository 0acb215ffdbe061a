"""Ordered funnel (operators/temporal.funnel): DuckDB sequential-CTE
twin (bitwise, decimal-fold avg), monotone reach, and the
earliest-anchor semantics on a constructed trace."""

import datetime as dt
import sys

from pyspark.sql import Row

sys.path.insert(0, "/root/repo")
from deep_db_learning_spark.functions.exact_agg import exact_avg_sql  # noqa: E402
from deep_db_learning_spark.operators.temporal import funnel  # noqa: E402

STEPS = ["click", "view", "purchase"]
W = 2 * 86400  # two days


def _twin_sql():
    us = "epoch_us(CAST({e}.ts AS TIMESTAMP))"
    lim = f"s1.t0 + CAST({W} AS BIGINT) * 1000000"
    return f"""
    WITH s1 AS (
      SELECT user_id AS u, min({us.format(e='events')}) AS t0
      FROM events WHERE event_type = '{STEPS[0]}' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id AS u, any_value(s1.t0) AS t0,
             min({us.format(e='e')}) AS a
      FROM events e JOIN s1 ON e.user_id = s1.u
      WHERE e.event_type = '{STEPS[1]}'
        AND {us.format(e='e')} > s1.t0 AND {us.format(e='e')} <= {lim}
      GROUP BY 1
    ), s3 AS (
      SELECT e.user_id AS u, any_value(s2.t0) AS t0,
             min({us.format(e='e')}) AS a
      FROM events e JOIN s2 ON e.user_id = s2.u
      JOIN s1 ON e.user_id = s1.u
      WHERE e.event_type = '{STEPS[2]}'
        AND {us.format(e='e')} > s2.a AND {us.format(e='e')} <= {lim}
      GROUP BY 1
    )
    SELECT 1 AS step, '{STEPS[0]}' AS name,
           count(*) AS n_users,
           CASE WHEN count(*) > 0 THEN CAST('0' AS DOUBLE) END AS avg_seconds
    FROM s1
    UNION ALL
    SELECT 2, '{STEPS[1]}', count(*),
           {exact_avg_sql("CAST(a - t0 AS DOUBLE) / CAST('1000000' AS DOUBLE)")}
    FROM s2
    UNION ALL
    SELECT 3, '{STEPS[2]}', count(*),
           {exact_avg_sql("CAST(a - t0 AS DOUBLE) / CAST('1000000' AS DOUBLE)")}
    FROM s3
    """


def test_funnel_matches_duckdb_twin(db, duck):
    got = sorted(
        tuple(r) for r in funnel(db.df("events"), STEPS, W).collect()
    )
    want = sorted(tuple(r) for r in duck.execute(_twin_sql()).fetchall())
    assert got == want
    reach = {r[0]: r[2] for r in got}
    assert reach[1] >= reach[2] >= reach[3] > 0  # monotone, non-vacuous


def test_funnel_earliest_anchor_semantics(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        # user 1 completes: click@1 -> view@3 -> purchase@4
        Row(user_id=1, ts=t(1), event_type="click"),
        Row(user_id=1, ts=t(3), event_type="view"),
        Row(user_id=1, ts=t(4), event_type="purchase"),
        # purchase BEFORE the view anchor does not count
        Row(user_id=2, ts=t(1), event_type="click"),
        Row(user_id=2, ts=t(3), event_type="purchase"),
        Row(user_id=2, ts=t(5), event_type="view"),
        # outside the window
        Row(user_id=3, ts=t(1), event_type="click"),
        Row(user_id=3, ts=t(1) + dt.timedelta(seconds=7201), event_type="view"),
        # never clicked
        Row(user_id=4, ts=t(2), event_type="view"),
    ]
    out = {r["step"]: (r["n_users"], r["avg_seconds"])
           for r in funnel(spark.createDataFrame(rows),
                           ["click", "view", "purchase"], 14400).collect()}
    assert out[1] == (3, 0.0)
    # user 1 view +2h, user 2 view +4h (window-inclusive), user 3 view
    # +7201 s — all reach step 2; user 2's purchase precedes its view
    # anchor, so only user 1 converts
    assert out[2] == (3, (7200.0 + 14400.0 + 7201.0) / 3)
    assert out[3] == (1, 3 * 3600.0)
    # empty step tail: avg NULL, count 0
    out2 = {r["step"]: (r["n_users"], r["avg_seconds"])
            for r in funnel(spark.createDataFrame(rows),
                            ["click", "error"], 14400).collect()}
    assert out2[2] == (0, None)
