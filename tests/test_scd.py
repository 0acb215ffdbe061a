"""SCD Type 2 maintenance (sources/scd.py) — DuckDB single-pass twin,
batch-boundary independence, no-op suppression, late-change handling,
and point-in-time reads."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deep_db_learning_spark.sources.scd import (
    scd2_apply,
    scd2_current,
    scd2_late_changes,
    scd2_snapshot_at,
)

TWIN = """
WITH d AS (
  SELECT user_id, ts, event_type, value FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id, ts
    ORDER BY event_type DESC, value DESC) = 1
), s AS (
  SELECT *, lag(event_type) OVER w AS pt, lag(value) OVER w AS pv,
         lag(ts) OVER w AS pts
  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), k AS (
  SELECT user_id, ts, event_type, value FROM s
  WHERE pts IS NULL
     OR NOT (event_type IS NOT DISTINCT FROM pt
             AND value IS NOT DISTINCT FROM pv)
)
SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS valid_from,
       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
            AS TIMESTAMP) AS valid_to
FROM k
"""


@pytest.fixture(scope="module")
def changes(db):
    return db.df("events").select("user_id", "ts", "event_type", "value")


def _rows(df):
    return sorted(
        (r["user_id"], r["event_type"], r["value"], r["valid_from"], r["valid_to"])
        for r in df.collect()
    )


def test_single_batch_matches_duckdb_twin(changes, duck):
    hist = scd2_apply(None, changes, "user_id", ["event_type", "value"])
    got = _rows(hist)
    want = sorted(tuple(r) for r in duck.execute(TWIN).fetchall())
    assert got == want
    assert len(got) > 0


def test_batch_boundary_independence(changes):
    one = _rows(scd2_apply(None, changes, "user_id", ["event_type", "value"]))
    lo, hi = changes.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
    ).first()
    b1 = lo + (hi - lo) // 3
    b2 = lo + 2 * (hi - lo) // 3
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hist = None
    for pred in (us <= b1, (us > b1) & (us <= b2), us > b2):
        hist = scd2_apply(
            hist, changes.filter(pred), "user_id", ["event_type", "value"]
        )
    assert _rows(hist) == one


def test_noop_suppression(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    ch = spark.createDataFrame(
        [
            Row(k=1, ts=t(1), v="a"),
            Row(k=1, ts=t(2), v="a"),  # no-op
            Row(k=1, ts=t(3), v="b"),
            Row(k=1, ts=t(4), v="b"),  # no-op
            Row(k=1, ts=t(5), v="a"),  # change back → new version
        ]
    )
    hist = scd2_apply(None, ch, "k", ["v"])
    rows = sorted((r["v"], r["valid_from"], r["valid_to"]) for r in hist.collect())
    assert rows == [
        ("a", t(1), t(3)),
        ("a", t(5), None),
        ("b", t(3), t(5)),
    ]


def test_noop_suppression_across_batches(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    b1 = spark.createDataFrame([Row(k=1, ts=t(1), v="a")])
    b2 = spark.createDataFrame([Row(k=1, ts=t(2), v="a")])  # equals open
    hist = scd2_apply(scd2_apply(None, b1, "k", ["v"]), b2, "k", ["v"])
    assert hist.count() == 1
    r = hist.first()
    assert (r["v"], r["valid_from"], r["valid_to"]) == ("a", t(1), None)


def test_late_changes_dropped_and_audited(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    b1 = spark.createDataFrame([Row(k=1, ts=t(5), v="a")])
    hist = scd2_apply(None, b1, "k", ["v"])
    late = spark.createDataFrame(
        [Row(k=1, ts=t(3), v="z"), Row(k=1, ts=t(5), v="z"), Row(k=1, ts=t(6), v="b")]
    )
    audit = scd2_late_changes(hist, late, "k")
    assert sorted(r["ts"] for r in audit.collect()) == [t(3), t(5)]
    out = scd2_apply(hist, late, "k", ["v"])
    rows = sorted((r["v"], r["valid_from"], r["valid_to"]) for r in out.collect())
    assert rows == [("a", t(5), t(6)), ("b", t(6), None)]
    # empty-history audit is empty
    assert scd2_late_changes(None, late, "k").count() == 0


def test_snapshot_at_and_current(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    ch = spark.createDataFrame(
        [Row(k=1, ts=t(1), v="a"), Row(k=1, ts=t(3), v="b"), Row(k=2, ts=t(2), v="x")]
    )
    hist = scd2_apply(None, ch, "k", ["v"])
    snap = {r["k"]: r["v"] for r in scd2_snapshot_at(hist, t(2)).collect()}
    assert snap == {1: "a", 2: "x"}
    # boundary: valid_from <= as_of < valid_to
    snap3 = {r["k"]: r["v"] for r in scd2_snapshot_at(hist, t(3)).collect()}
    assert snap3 == {1: "b", 2: "x"}
    before = scd2_snapshot_at(hist, t(0)).count()
    assert before == 0
    cur = {r["k"]: r["v"] for r in scd2_current(hist).collect()}
    assert cur == {1: "b", 2: "x"}


def test_tie_break_deterministic(spark):
    t0 = dt.datetime(2024, 1, 1)
    ch = spark.createDataFrame(
        [Row(k=1, ts=t0, v="a", seq=1), Row(k=1, ts=t0, v="b", seq=2)]
    )
    hist = scd2_apply(None, ch, "k", ["v"], tie_break=["seq"])
    assert hist.count() == 1
    assert hist.first()["v"] == "b"  # largest tie_break wins


def test_history_schema_validated(spark):
    bad = spark.createDataFrame([Row(k=1, v="a")])
    ch = spark.createDataFrame([Row(k=1, ts=dt.datetime(2024, 1, 1), v="a")])
    with pytest.raises(ValueError):
        scd2_apply(bad, ch, "k", ["v"])
