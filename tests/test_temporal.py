"""As-of and range joins (operators/temporal.py) — correctness vs a
naive theta-join formulation on the smoke data, plus tie semantics on
crafted rows."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def events(db):
    return db.df("events").select("event_id", "ts", "user_id", "event_type", "value")


def test_asof_matches_naive(events):
    left = events.select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    got = asof_join(
        left, right, on="user_id", left_ts="ts", payload=["value"],
        suffix="_p",
    )
    # naive: max right ts <= left ts per left row, then fetch its value
    naive = (
        left.alias("l")
        .join(right.alias("r"), "user_id", "left")
        .filter(F.col("r.ts") <= F.col("l.ts"))
        .groupBy("event_id")
        .agg(F.max(F.col("r.ts")).alias("ts_p"))
    )
    naive_full = (
        left.join(naive, "event_id", "left")
        .join(
            right.select(
                "user_id", F.col("ts").alias("ts_p"), F.col("value")
            ),
            ["user_id", "ts_p"],
            "left",
        )
    )
    g = {r["event_id"]: (r["value"], r["ts_p"]) for r in got.collect()}
    n = {r["event_id"]: (r["value"], r["ts_p"]) for r in naive_full.collect()}
    assert g == n
    # left-outer: every left row present
    assert len(g) == left.count()


def test_asof_tie_semantics(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=dt.datetime(2024, 1, 1, 10, 0, 0), lid=1)]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=dt.datetime(2024, 1, 1, 9, 0, 0), v=1.0),
            Row(k=1, ts=dt.datetime(2024, 1, 1, 10, 0, 0), v=2.0),
        ]
    )
    inc = asof_join(left, right, on="k", left_ts="ts", payload=["v"]).collect()[0]
    assert inc["v"] == 2.0  # equal ts visible when inclusive
    exc = asof_join(
        left, right, on="k", left_ts="ts", payload=["v"], inclusive=False
    ).collect()[0]
    assert exc["v"] == 1.0  # equal ts hidden when exclusive
    # left row before any right row keeps NULL payload
    early = spark.createDataFrame(
        [Row(k=1, ts=dt.datetime(2024, 1, 1, 8, 0, 0), lid=2)]
    )
    none = asof_join(early, right, on="k", left_ts="ts", payload=["v"]).collect()[0]
    assert none["v"] is None and none["ts_asof"] is None


def test_range_join_matches_naive(events):
    # purchases within [click.ts, click.ts + 1h) of the same user
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    got = range_join(
        purchases, clicks, on="user_id", left_point="ts",
        right_start="start_ts", right_end="end_ts", bin_width="1 hour",
    ).select("click_id", "purchase_id")
    naive = (
        purchases.join(clicks, "user_id")
        .filter(
            (F.col("start_ts") <= F.col("ts")) & (F.col("ts") < F.col("end_ts"))
        )
        .select("click_id", "purchase_id")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    assert got.count() > 0  # the fixture actually exercises matches


def test_range_join_bin_width_invariance(events):
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    outs = [
        sorted(
            map(
                tuple,
                range_join(
                    purchases, clicks, on="user_id", left_point="ts",
                    right_start="start_ts", right_end="end_ts", bin_width=w,
                ).select("click_id", "purchase_id").collect(),
            )
        )
        for w in ("13 minutes", "1 hour", "6 hours")
    ]
    assert outs[0] == outs[1] == outs[2]


def test_asof_oracle_builder_matches_spark(db, duck):
    from deep_db_learning_spark.operators.temporal import asof_join_oracle_sql

    events = db.df("events")
    left = events.select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    got = sorted(
        (r["event_id"], r["pv"])
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", payload=["pv"]
        ).collect()
    )
    sql = asof_join_oracle_sql(
        left_sql="SELECT event_id, user_id, ts FROM events",
        right_sql="SELECT user_id, ts, value AS pv FROM events WHERE event_type = 'purchase'",
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        left_cols=["event_id"],
        payload=[("pv", "pv_out")],
        ts_alias="pv_ts",
    )
    want = sorted((r[0], r[1]) for r in duck.execute(
        f"SELECT event_id, pv_out FROM ({sql})"
    ).fetchall())
    assert got == want

    with pytest.raises(ValueError):
        asof_join_oracle_sql(
            "s", "s", on="user_id", left_ts="ts", right_ts="ts",
            left_cols=["user_id"], payload=[], ts_alias="x",
        )


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [
            Row(k1=1, k2="a", ts=dt.datetime(2024, 1, 1, 10), lid=1),
            Row(k1=1, k2="b", ts=dt.datetime(2024, 1, 1, 10), lid=2),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k1=1, k2="a", ts=dt.datetime(2024, 1, 1, 9), v=1.0),
            Row(k1=1, k2="b", ts=dt.datetime(2024, 1, 1, 8), v=2.0),
            Row(k1=2, k2="a", ts=dt.datetime(2024, 1, 1, 9, 30), v=3.0),
        ]
    )
    out = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on=["k1", "k2"], left_ts="ts", payload=["v"]
        ).collect()
    }
    # (1,a) sees only the (1,a) right row; (1,b) only (1,b); the k1=2
    # row is invisible to both
    assert out == {1: 1.0, 2: 2.0}


def test_range_join_left_keeps_null_and_duplicate_left_rows(spark):
    # regression: the left mode used to re-join matched rows back on
    # EVERY left column, so a left row with a NULL anywhere could never
    # match itself (NULL != NULL) and identical left rows
    # cross-multiplied; the surrogate-id re-join fixes both
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    left = spark.createDataFrame(
        [
            Row(k=1, ts=t0, payload=None),      # NULL payload, has a match
            Row(k=1, ts=t0, payload=None),      # exact duplicate row
            Row(k=2, ts=t0, payload="x"),       # no interval on this key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(
                k=1,
                start=dt.datetime(2024, 1, 1, 0, 0),
                end=dt.datetime(2024, 1, 1, 1, 0),
                tag="a",
            )
        ]
    )
    out = range_join(
        left, right, on="k", left_point="ts",
        right_start="start", right_end="end", how="left",
    )
    rows = sorted(
        ((r["k"], r["payload"], r["tag"]) for r in out.collect()),
        key=lambda t: (t[0], t[1] or "", t[2] or ""),
    )
    # each duplicate matches exactly once (no cross-multiply), the NULL
    # rows keep their match, the match-less key-2 row survives with NULLs
    assert rows == [(1, None, "a"), (1, None, "a"), (2, "x", None)]


def test_asof_tie_break_is_deterministic(spark):
    # two right rows at the SAME (key, ts): the largest tie_break tuple
    # must win, regardless of union or partition order
    t = dt.datetime(2024, 1, 1, 12, 0)
    left = spark.createDataFrame([Row(k=1, ts=dt.datetime(2024, 1, 1, 13, 0))])
    for order in ([("a", 1), ("b", 2)], [("b", 2), ("a", 1)]):
        right = spark.createDataFrame(
            [Row(k=1, ts=t, v=v, rid=rid) for v, rid in order]
        )
        got = asof_join(
            left, right, on="k", left_ts="ts", payload=["v"], tie_break=["rid"]
        ).collect()[0]
        assert got["v"] == "b"  # rid=2 sorts last -> carried


def test_resample_dense_fills_gaps(spark, db, duck):
    """Dense hourly grid over the per-user hourly features: DuckDB
    generate_series twin (per-key spans), fills applied, misalignment
    rejected."""
    import datetime as dt

    from pyspark.sql import Row

    from deep_db_learning_spark.operators.temporal import resample_dense
    from deep_db_learning_spark.streaming import hourly_user_features

    hourly = hourly_user_features(db.df("events")).select(
        "user_id", "window_start", "n_events"
    )
    dense = resample_dense(
        hourly, "user_id", "window_start", 3600, fill={"n_events": 0}
    )
    got = sorted(
        (r["user_id"], r["window_start"], r["n_events"])
        for r in dense.collect()
    )
    want = duck.execute(
        """
        WITH h AS (
          SELECT user_id, date_trunc('hour', ts) AS w, count(*) AS n
          FROM events GROUP BY 1, 2
        ), spans AS (
          SELECT user_id, min(w) AS lo, max(w) AS hi FROM h GROUP BY 1
        ), grid AS (
          SELECT user_id, unnest(generate_series(lo, hi,
                 INTERVAL 1 HOUR)) AS w
          FROM spans
        )
        SELECT g.user_id, CAST(g.w AS TIMESTAMP),
               coalesce(h.n, 0)
        FROM grid g LEFT JOIN h ON g.user_id = h.user_id AND g.w = h.w
        ORDER BY 1, 2
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > hourly.count()  # gaps existed and were filled

    import pytest as _pt

    bad = spark.createDataFrame(
        [Row(user_id=1, window_start=dt.datetime(2024, 1, 1, 0, 30), n_events=1)]
    )
    with _pt.raises(ValueError, match="aligned"):
        resample_dense(bad, "user_id", "window_start", 3600)

    # global bounds: every key spans the whole frame
    g = resample_dense(
        hourly, "user_id", "window_start", 3600, fill={"n_events": 0},
        bounds="global",
    )
    per_key = g.groupBy("user_id").count().select("count").distinct().count()
    assert per_key == 1


def test_cohort_retention_matches_duckdb(db, duck):
    from deep_db_learning_spark.operators.temporal import cohort_retention

    got = sorted(
        tuple(r) for r in cohort_retention(db.df("events"), period_days=7).collect()
    )
    want = duck.execute(
        """
        WITH ep AS (
          SELECT min(epoch_us(CAST(ts AS TIMESTAMP))) AS e FROM events
        ), pu AS (
          SELECT user_id AS u,
                 (epoch_us(CAST(ts AS TIMESTAMP)) - ep.e)
                      // (7 * 86400 * CAST(1000000 AS BIGINT)) AS p
          FROM events, ep
        ), fst AS (
          SELECT u, min(p) AS cohort FROM pu GROUP BY u
        ), act AS (
          SELECT DISTINCT pu.u, pu.p, fst.cohort
          FROM pu JOIN fst ON pu.u = fst.u
        ), cells AS (
          SELECT cohort AS cohort_period, p - cohort AS period_index,
                 count(*) AS n_active
          FROM act GROUP BY 1, 2
        ), sizes AS (
          SELECT cohort AS cohort_period, count(*) AS n_cohort
          FROM fst GROUP BY 1
        )
        SELECT c.cohort_period, c.period_index, c.n_active, s.n_cohort,
               CAST(c.n_active AS DOUBLE) / s.n_cohort AS retention
        FROM cells c JOIN sizes s USING (cohort_period)
        """
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)
    assert len(got) > 0
    # period 0 cell of each cohort covers the whole cohort
    for cp, pi, na, nc, r in got:
        if pi == 0:
            assert na == nc and r == 1.0
        assert 0 < r <= 1.0


def test_cohort_retention_small_trace(spark):
    import datetime as dt

    from pyspark.sql import Row

    from deep_db_learning_spark.operators.temporal import cohort_retention

    d = lambda day: dt.datetime(2024, 1, 1 + day)
    rows = [
        Row(user_id=1, ts=d(0)),   # cohort 0
        Row(user_id=1, ts=d(8)),   # active period 1
        Row(user_id=2, ts=d(1)),   # cohort 0, never again
        Row(user_id=3, ts=d(9)),   # cohort 1
    ]
    got = {
        (r["cohort_period"], r["period_index"]): (r["n_active"], r["retention"])
        for r in cohort_retention(spark.createDataFrame(rows), period_days=7).collect()
    }
    assert got == {
        (0, 0): (2, 1.0),
        (0, 1): (1, 0.5),
        (1, 0): (1, 1.0),
    }


def test_rolling_anomaly_matches_duckdb(db, duck):
    from deep_db_learning_spark.operators.temporal import rolling_anomaly

    out = rolling_anomaly(
        db.df("events").select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "value", window_seconds=7 * 86400,
        z_threshold=2.0, min_points=5,
    )
    got = sorted(
        (r["event_id"], r["roll_n"], r["roll_mean"], r["roll_std"],
         r["zscore"], r["is_anomaly"])
        for r in out.collect()
    )
    dbl = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    s = dbl.format(
        x="sum(CAST(value AS DECIMAL(30,9))) OVER w"
    )
    ss = dbl.format(
        x="sum(CAST(value * value AS DECIMAL(30,9))) OVER w"
    )
    want = duck.execute(
        f"""
        WITH t AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS u, value
          FROM events
        ), r AS (
          SELECT event_id,
                 count(value) OVER w AS n,
                 {s} AS s, {ss} AS ss, value
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY u
                       RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, n, s / n AS mean,
               sqrt(greatest((ss - s * s / n) / n, 0)) AS std,
               CASE WHEN n >= 5 AND sqrt(greatest((ss - s * s / n) / n, 0)) > 0
                    THEN (value - s / n) / sqrt(greatest((ss - s * s / n) / n, 0)) END AS z,
               coalesce(abs(CASE WHEN n >= 5 AND
                    sqrt(greatest((ss - s * s / n) / n, 0)) > 0
                    THEN (value - s / n) / sqrt(greatest((ss - s * s / n) / n, 0)) END)
                    >= 2.0, false) AS flag
        FROM r
        """
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)
    # the detector actually fires somewhere at |z|>=2 on this data
    assert any(r[5] for r in got)
    # early rows (n < min_points) are never flagged
    assert all(not r[5] for r in got if r[1] < 5)


def test_attribution_matches_duckdb_twin(db, duck):
    from deep_db_learning_spark.operators.temporal import (
        attribution,
        attribution_oracle_sql,
    )

    got = sorted(map(tuple, attribution(db.df("events")).collect()))
    want = sorted(map(tuple, duck.execute(attribution_oracle_sql()).fetchall()))
    assert got == want
    assert len(got) == 15  # 5 models × 3 touch channels


def test_attribution_credit_conservation(db, duck):
    """Every model distributes exactly one unit of credit per
    attributed conversion: per-model total credit equals the number of
    conversions with at least one window touch, and single-touch
    models hand out only whole units."""
    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.temporal import attribution

    rows = attribution(db.df("events")).collect()
    attributed = duck.execute("""
        SELECT count(DISTINCT c.event_id) FROM events c
        WHERE c.event_type = 'purchase' AND EXISTS (
          SELECT 1 FROM events t
          WHERE t.user_id = c.user_id
            AND t.event_type IN ('click', 'view', 'signup')
            AND t.ts >= c.ts - INTERVAL 1 DAY AND t.ts < c.ts)
    """).fetchone()[0]
    by_model = {}
    for r in rows:
        by_model.setdefault(r["model"], 0.0)
        by_model[r["model"]] += r["credit"]
    assert set(by_model) == {"first", "last", "linear", "ushape", "decay"}
    for model, total in by_model.items():
        assert abs(total - attributed) < 1e-6, (model, total, attributed)
    # first/last hand out whole conversions per channel
    for r in rows:
        if r["model"] in ("first", "last"):
            assert r["credit"] == int(r["credit"])
        assert 0 <= r["credit"] <= r["n_touches"]


def test_attribution_window_and_params(spark):
    """A handcrafted trace: touches outside the lookback are ignored,
    ties break by event_id, and each model credits the documented
    touch."""
    import datetime as dt

    rows = [
        # conversion at 10:00; touches at 9:00 (click), 9:30 (view),
        # and one click the day BEFORE (outside the 1h lookback)
        (1, dt.datetime(2024, 1, 2, 10, 0), 7, "purchase", 1.0, None),
        (2, dt.datetime(2024, 1, 2, 9, 0), 7, "click", 1.0, None),
        (3, dt.datetime(2024, 1, 2, 9, 30), 7, "view", 1.0, None),
        (4, dt.datetime(2024, 1, 1, 8, 0), 7, "click", 1.0, None),
        # another user, touch at the exact conversion instant: excluded
        # (half-open window)
        (5, dt.datetime(2024, 1, 2, 10, 0), 8, "purchase", 1.0, None),
        (6, dt.datetime(2024, 1, 2, 10, 0), 8, "click", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    from deep_db_learning_spark.operators.temporal import attribution

    got = {
        (r["model"], r["event_type"]): (r["n_touches"], r["credit"])
        for r in attribution(ev, lookback="2 hours").collect()
    }
    assert got[("first", "click")] == (1, 1.0)
    assert got[("last", "view")] == (1, 1.0)
    assert got[("linear", "click")] == (1, 0.5)
    assert got[("linear", "view")] == (1, 0.5)
    # n=2: the U-shape pair branch gives each endpoint exactly half
    assert got[("ushape", "click")] == (1, 0.5)
    assert got[("ushape", "view")] == (1, 0.5)
    assert ("first", "view") not in got or got[("first", "view")][1] == 0.0


def test_attribution_ushape_40_20_40(spark):
    """Position-based model on a 4-touch window: endpoints take 0.4
    each, the two middles split 0.2; a single-touch conversion takes
    the whole unit."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 2, 10, 0)
    rows = [
        (1, t0, 7, "purchase", 1.0, None),
        (2, t0 - dt.timedelta(minutes=50), 7, "click", 1.0, None),   # first
        (3, t0 - dt.timedelta(minutes=40), 7, "view", 1.0, None),    # middle
        (4, t0 - dt.timedelta(minutes=30), 7, "signup", 1.0, None),  # middle
        (5, t0 - dt.timedelta(minutes=20), 7, "view", 1.0, None),    # last
        (6, t0, 8, "purchase", 1.0, None),
        (7, t0 - dt.timedelta(minutes=5), 8, "click", 1.0, None),    # solo
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    from deep_db_learning_spark.operators.temporal import attribution

    got = {
        (r["model"], r["event_type"]): r["credit"]
        for r in attribution(ev, lookback="2 hours").collect()
    }
    assert got[("ushape", "click")] == 0.4 + 1.0   # first of u7 + solo u8
    assert got[("ushape", "signup")] == 0.2 / 2    # one middle
    assert got[("ushape", "view")] == 0.4 + 0.2 / 2  # last + one middle


def test_attribution_extreme_decay_stays_finite(spark):
    """lookback ≫ halflife (90 days / 1 hour → bucket 1920): the
    59-cap keeps every decimal weight nonzero, so the per-conversion
    normalizer never hits 0 and credits stay finite — and the DuckDB
    twin (same cap) agrees bitwise."""
    import datetime as dt
    import math

    import duckdb

    from deep_db_learning_spark.operators.temporal import (
        attribution,
        attribution_oracle_sql,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, "click", base - dt.timedelta(days=80)),
        (2, 10, "click", base - dt.timedelta(minutes=1)),
        (3, 10, "purchase", base),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = attribution(
        df, lookback="90 days", decay_halflife="1 hour"
    ).collect()
    decay = [r for r in out if r["model"] == "decay"]
    assert decay and all(math.isfinite(r["credit"]) for r in decay)
    assert abs(sum(r["credit"] for r in decay) - 1.0) < 1e-9
    con = duckdb.connect()
    vals = ",".join(
        f"({e}, {u}, '{t}', TIMESTAMP '{ts}')" for e, u, t, ts in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals
        + ") v(event_id, user_id, event_type, ts)"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                attribution_oracle_sql(
                    lookback="90 days", decay_halflife="1 hour"
                )
            ).fetchall(),
        )
    )
    con.close()
    assert sorted(map(tuple, out)) == want


def test_attribution_tied_timestamps_conserve_credit(spark):
    """All n >= 3 window touches at ONE timestamp: ra breaks ties by
    touch_id ASC and rd by touch_id DESC, so first != last, the 40/20/40
    branches all fire, and every model still hands out exactly one unit
    per conversion (the r10 ADVICE bug had the same row first AND last,
    leaking 0.2 of ushape credit) — and the DuckDB twin agrees bitwise."""
    import datetime as dt

    import duckdb

    from deep_db_learning_spark.operators.temporal import (
        attribution,
        attribution_oracle_sql,
    )

    base = dt.datetime(2024, 1, 1, 12, 0)
    tie = base - dt.timedelta(hours=1)
    rows = [
        (1, 10, "click", tie),
        (2, 10, "view", tie),
        (3, 10, "signup", tie),
        (4, 10, "purchase", base),
        # a 2-touch tie as well: the pair branch must give 1/2 each
        (5, 11, "click", tie),
        (6, 11, "view", tie),
        (7, 11, "purchase", base),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = attribution(df).collect()
    by_model = {}
    credit = {}
    for r in out:
        by_model[r["model"]] = by_model.get(r["model"], 0.0) + r["credit"]
        credit[(r["model"], r["event_type"])] = r["credit"]
    # 2 conversions, each with >=1 window touch -> every model sums to
    # 2 (up to the exact_sum fold's documented decimal-scale-9
    # quantization: 1/3 folds as 0.333333333, so 5e-10 per touch)
    for model in ("first", "last", "linear", "ushape", "decay"):
        assert abs(by_model[model] - 2.0) < 1e-8, (model, by_model[model])
    # ushape on the tied triple: first(click, lowest id)=0.4,
    # last(signup, highest id)=0.4, middle(view)=0.2; plus the tied
    # pair: click 0.5, view 0.5
    assert credit[("ushape", "click")] == 0.4 + 0.5
    assert credit[("ushape", "signup")] == 0.4
    assert credit[("ushape", "view")] == 0.2 + 0.5
    # first/last are distinct rows under the mirrored tie-break
    assert credit[("first", "click")] == 2.0
    assert credit[("last", "signup")] == 1.0
    assert credit[("last", "view")] == 1.0
    con = duckdb.connect()
    vals = ",".join(
        f"({e}, {u}, '{t}', TIMESTAMP '{ts}')" for e, u, t, ts in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals
        + ") v(event_id, user_id, event_type, ts)"
    )
    want = sorted(map(tuple, con.execute(attribution_oracle_sql()).fetchall()))
    con.close()
    assert sorted(map(tuple, out)) == want
