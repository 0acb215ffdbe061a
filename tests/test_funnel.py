"""Ordered funnel (operators/temporal.funnel): DuckDB sequential-CTE
twin (bitwise, decimal-fold avg), monotone reach, and the
earliest-anchor semantics on a constructed trace."""

import datetime as dt
import sys

from pyspark.sql import Row

sys.path.insert(0, "/root/repo")
from deep_db_learning_spark.operators.temporal import (  # noqa: E402
    funnel,
    funnel_oracle_sql,
)

STEPS = ["click", "view", "purchase"]
W = 2 * 86400  # two days


def test_funnel_matches_duckdb_twin(db, duck):
    got = sorted(
        tuple(r) for r in funnel(db.df("events"), STEPS, W).collect()
    )
    want = sorted(tuple(r) for r in duck.execute(funnel_oracle_sql("events", STEPS, W)).fetchall())
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
