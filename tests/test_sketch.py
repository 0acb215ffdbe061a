"""Sketch family: KMV / HLL / Count-Min / no-sort exact quantiles.

Each operator is checked three ways: (1) bit-exact parity with its
DuckDB oracle SQL (the same portable-arithmetic coupling the driver
gate uses), (2) the estimator's theoretical guarantee (error bound /
overestimate-only / exactness), (3) the merge property that makes the
sketch usable incrementally at scale.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators import sketch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck_rows(duck, sql):
    return sorted(tuple(r) for r in duck.sql(sql).fetchall())


# ---------------------------------------------------------------------------
# oracle parity (bit-exact)
# ---------------------------------------------------------------------------


def test_kmv_matches_oracle(lineitem, duck):
    got = _rows(sketch.kmv_distinct(lineitem, "l_partkey"))
    want = _duck_rows(duck, sketch.kmv_distinct_oracle_sql("lineitem", "l_partkey"))
    assert got == want


def test_hll_matches_oracle(lineitem, duck):
    got = _rows(sketch.hll_distinct(lineitem, "l_partkey"))
    want = _duck_rows(duck, sketch.hll_distinct_oracle_sql("lineitem", "l_partkey"))
    assert got == want


def test_cms_matches_oracle(events, duck):
    got = _rows(sketch.cms_heavy_hitters(events, "user_id", threshold=10))
    want = _duck_rows(
        duck, sketch.cms_heavy_hitters_oracle_sql("events", "user_id", 10)
    )
    assert got == want


def test_quantiles_match_oracle(lineitem, duck):
    probs = [0.0, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0]
    got = _rows(sketch.exact_quantiles(lineitem, "l_extendedprice", probs))
    want = _duck_rows(
        duck, sketch.exact_quantiles_oracle_sql("lineitem", "l_extendedprice", probs)
    )
    assert got == want


# ---------------------------------------------------------------------------
# estimator guarantees
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(lineitem):
    """Fewer distinct values than k ⇒ KMV IS the exact count."""
    exact = lineitem.select("l_partkey").distinct().count()
    row = sketch.kmv_distinct(lineitem, "l_partkey", k=256).first()
    assert exact < 256
    assert row["k_used"] == exact and row["est"] == float(exact)


def test_kmv_error_bound(spark):
    """Full synopsis: relative error within 4/sqrt(k) (theory: ~1/sqrt(k)
    per trial; 4x leaves room for one fixed hash draw)."""
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = sketch.kmv_distinct(df, "v", k=256).first()["est"]
    assert abs(est - n) / n < 4 / math.sqrt(256)


def test_hll_error_bound(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = sketch.hll_distinct(df, "v").first()["est"]
    assert abs(est - n) / n < 4 * 1.04 / math.sqrt(256)


def test_cms_overestimates_only_and_full_recall(events):
    """CMS point estimates never undercount, so thresholding the
    estimate can only ADD items vs thresholding the exact count."""
    hh = sketch.cms_heavy_hitters(events, "user_id", threshold=1).collect()
    assert hh, "events fixture should have users"
    for r in hh:
        assert r["est"] >= r["exact"]
    exact_heavy = {
        r["item"]
        for r in sketch.cms_heavy_hitters(events, "user_id", threshold=5).collect()
        if r["exact"] >= 5
    }
    got = {
        r["item"]
        for r in sketch.cms_heavy_hitters(events, "user_id", threshold=5).collect()
    }
    assert exact_heavy <= got


def test_quantiles_match_duckdb_builtin(lineitem, duck):
    """Our rank definition reproduces quantile_disc for the median on
    an odd-count restriction (where all definitions agree)."""
    vals = lineitem.where(F.col("l_extendedprice").isNotNull())
    n = vals.count()
    if n % 2 == 0:
        vals = vals.limit(n - 1)
        n -= 1
    med = sketch.exact_quantiles(vals, "l_extendedprice", [0.5]).first()["value"]
    want = duck.sql(
        f"""SELECT quantile_disc(l_extendedprice, 0.5)
            FROM (SELECT * FROM lineitem WHERE l_extendedprice IS NOT NULL LIMIT {n})"""
    ).fetchone()[0]
    assert med == pytest.approx(want)


def test_quantiles_extremes_are_min_max(lineitem):
    q = {
        r["p"]: r["value"]
        for r in sketch.exact_quantiles(lineitem, "l_extendedprice", [0.0, 1.0]).collect()
    }
    row = lineitem.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).first()
    assert q[0.0] == row["lo"] and q[1.0] == row["hi"]


def test_quantiles_constant_column(spark):
    df = spark.range(100).select(F.lit(7.5).alias("v"))
    rows = sketch.exact_quantiles(df, "v", [0.25, 0.9]).collect()
    assert {r["value"] for r in rows} == {7.5} and len(rows) == 2


def test_quantiles_empty(spark):
    df = spark.range(0).select(F.col("id").cast("double").alias("v"))
    assert sketch.exact_quantiles(df, "v", [0.5]).count() == 0


# ---------------------------------------------------------------------------
# merge properties (the incremental / distributed story)
# ---------------------------------------------------------------------------


def test_cms_tables_add(events):
    """CMS counters from disjoint halves sum to the whole-corpus
    counters — the streaming/shard merge is a plain (d, bkt) sum."""
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 == 1)
    whole = _rows(sketch.cms_table(events, "user_id"))
    merged = _rows(
        sketch.cms_table(a, "user_id")
        .unionByName(sketch.cms_table(b, "user_id"))
        .groupBy("d", "bkt")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert whole == merged


def test_kmv_synopses_merge(lineitem):
    """Bottom-k of the union == bottom-k of (bottom-k(a) ∪ bottom-k(b))."""
    a = lineitem.where(F.col("l_orderkey") % 2 == 0)
    b = lineitem.where(F.col("l_orderkey") % 2 == 1)
    k = 64
    whole = _rows(sketch.kmv_bottom_hashes(lineitem, "l_partkey", k))
    remerged = _rows(
        sketch.kmv_bottom_hashes(a, "l_partkey", k)
        .unionByName(sketch.kmv_bottom_hashes(b, "l_partkey", k))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    assert whole == remerged


def test_hll_registers_merge(lineitem):
    """Register-wise max over shard register frames == whole-corpus
    registers (HLL's union law)."""
    a = lineitem.where(F.col("l_orderkey") % 2 == 0)
    b = lineitem.where(F.col("l_orderkey") % 2 == 1)
    whole = _rows(sketch.hll_registers(lineitem, "l_partkey"))
    merged = _rows(
        sketch.hll_registers(a, "l_partkey")
        .unionByName(sketch.hll_registers(b, "l_partkey"))
        .groupBy("b")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    assert whole == merged


def test_kmv_set_estimates_match_twin_and_exact(db, duck):
    """KMV set algebra: the engine row matches the DuckDB twin
    bit-for-bit, and the estimates land within the k^-1/2 error band
    of the exact union/intersection (computed independently)."""
    from deep_db_learning_spark.operators.sketch import (
        kmv_set_estimates,
        kmv_set_estimates_oracle_sql,
    )

    k = 256
    got = [
        tuple(r)
        for r in kmv_set_estimates(
            db.df("orders"), "o_custkey", db.df("events"), "user_id", k=k
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            kmv_set_estimates_oracle_sql(
                "orders", "o_custkey", "events", "user_id", k=k
            )
        ).fetchall()
    ]
    assert got == want and len(got) == 1
    k_used, _kth, n_common, union_est, jacc, inter = got[0]
    exact_union = duck.execute(
        "SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders "
        "UNION SELECT DISTINCT user_id FROM events)"
    ).fetchone()[0]
    exact_inter = duck.execute(
        "SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders "
        "INTERSECT SELECT DISTINCT user_id FROM events)"
    ).fetchone()[0]
    if k_used < k:  # sketch not full → exact by contract
        assert union_est == exact_union
        assert round(inter) == exact_inter
    else:
        band = 4.0 / (k ** 0.5)  # 4 standard errors
        assert abs(union_est - exact_union) <= band * exact_union
        assert abs(inter - exact_inter) <= band * exact_union
    assert 0.0 <= jacc <= 1.0


def test_kmv_set_estimates_disjoint_and_identical(spark):
    from deep_db_learning_spark.operators.sketch import kmv_set_estimates

    a = spark.range(0, 300).selectExpr("id AS x")
    b = spark.range(1000, 1300).selectExpr("id AS x")
    r = kmv_set_estimates(a, "x", b, "x", k=64).first()
    assert r["n_common"] == 0 and r["jaccard_est"] == 0.0
    assert r["intersect_est"] == 0.0
    same = kmv_set_estimates(a, "x", a, "x", k=64).first()
    assert same["jaccard_est"] == 1.0
    # identical inputs: intersection estimate equals the union estimate
    assert same["intersect_est"] == same["union_est"]


def test_grouped_quantiles_match_twin_and_global(db, duck):
    """Per-group exact order statistics: twin hash, consistency with
    the global exact_quantiles on a single-group projection, and the
    rank definition (rank-th smallest, ties share values)."""
    from deep_db_learning_spark.operators.sketch import (
        exact_quantiles,
        grouped_quantiles,
        grouped_quantiles_oracle_sql,
    )

    probs = [0.25, 0.5, 0.9]
    out = grouped_quantiles(db.df("lineitem"), "l_returnflag", "l_extendedprice", probs)
    got = sorted(map(tuple, out.collect()))
    want = sorted(
        map(
            tuple,
            duck.execute(
                grouped_quantiles_oracle_sql(
                    "lineitem", "l_returnflag", "l_extendedprice", probs
                )
            ).fetchall(),
        )
    )
    assert got == want
    flags = {g[0] for g in got}
    assert len(got) == len(flags) * len(probs)  # every (group, p) present
    # single-group slice agrees with the global operator
    one = db.df("lineitem").filter("l_returnflag = 'R'")
    glob = {
        (r["p"], r["rank"], r["value"])
        for r in exact_quantiles(one, "l_extendedprice", probs).collect()
    }
    grp = {
        (r["p"], r["rank"], r["value"])
        for r in grouped_quantiles(
            one, "l_returnflag", "l_extendedprice", probs
        ).collect()
    }
    assert glob == grp


def test_hll_distinct_by_matches_twin_and_global(db, duck):
    """Per-group HLL: twin bit-equal; a single-group slice agrees with
    the global hll_distinct (the algebraic empty-register form equals
    the materialized m-row register frame); estimates land within the
    HLL error band of exact per-group distincts."""
    from deep_db_learning_spark.operators.sketch import (
        SKETCH_CONFIG,
        hll_distinct,
        hll_distinct_by,
        hll_distinct_by_oracle_sql,
    )

    got = sorted(
        map(
            tuple,
            hll_distinct_by(db.df("lineitem"), "l_returnflag", "l_orderkey").collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                hll_distinct_by_oracle_sql("lineitem", "l_returnflag", "l_orderkey")
            ).fetchall(),
        )
    )
    assert got == want and len(got) == 3

    one = db.df("lineitem").filter("l_returnflag = 'R'")
    g = hll_distinct(one, "l_orderkey").first()
    bg = hll_distinct_by(one, "l_returnflag", "l_orderkey").first()
    assert (g["intsum"], g["zero_regs"], g["est"]) == (
        bg["intsum"], bg["zero_regs"], bg["est"],
    )

    m = SKETCH_CONFIG["hll_m"]
    band = 4 * 1.04 / (m ** 0.5)
    exact = {
        r[0]: r[1]
        for r in duck.execute(
            "SELECT l_returnflag, count(DISTINCT l_orderkey) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for flag, _i, _z, est in got:
        assert abs(est - exact[flag]) <= band * exact[flag]


def test_grouped_quantiles_hot_group_escape(db, duck):
    """r9: the hot-group histogram route produces IDENTICAL results to
    the window path and the full-sort twin at any threshold, and its
    windows partition by (group, bucket) — no single window ever holds
    a whole hot group."""
    from deep_db_learning_spark.operators.sketch import (
        grouped_quantiles,
        grouped_quantiles_oracle_sql,
    )

    probs = [0.25, 0.5, 0.9]
    li = db.df("lineitem")
    base = sorted(
        map(
            tuple,
            grouped_quantiles(
                li, "l_returnflag", "l_extendedprice", probs
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                grouped_quantiles_oracle_sql(
                    "lineitem", "l_returnflag", "l_extendedprice", probs
                )
            ).fetchall(),
        )
    )
    assert base == want
    # every-group-hot, mixed hot/small, and nothing-hot thresholds all
    # reproduce the window path bit-for-bit
    for thr in (100, 5000, 10**9):
        hot = grouped_quantiles(
            li, "l_returnflag", "l_extendedprice", probs,
            hot_group_threshold=thr,
        )
        assert sorted(map(tuple, hot.collect())) == base
    # plan shape: with every group hot, the row_number window is
    # partitioned by (group, bucket) — the per-group single-partition
    # sort window never appears
    def explain(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    plan = explain(
        grouped_quantiles(
            li, "l_returnflag", "l_extendedprice", probs,
            hot_group_threshold=100,
        )
    )
    # the bucket column appears as a window partition key
    assert "b#" in plan


def test_grouped_quantiles_hot_constant_group(spark):
    """A hot group whose values are all equal takes the driver-side
    constant shortcut (zero-width histogram would divide by zero)."""
    from deep_db_learning_spark.operators.sketch import grouped_quantiles

    rows = [("c", 7.0)] * 500 + [("s", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sorted(
        map(
            tuple,
            grouped_quantiles(
                df, "g", "v", [0.5], hot_group_threshold=100
            ).collect(),
        )
    )
    assert got == [("c", 0.5, 250, 7.0), ("s", 0.5, 5, 4.0)]
