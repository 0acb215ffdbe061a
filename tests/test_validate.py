"""Data-quality validation (profiling/validate.py) — constraint checks
against the (clean) testdata with DuckDB twins, synthetic dirty cases
(dup PKs, FK orphans, NULL-FK skipping), and the one-scan expectation
runner."""

import sys

import pytest
from pyspark.sql import Row

sys.path.insert(0, "/root/repo")

from deep_db_learning_spark.profiling.validate import (  # noqa: E402
    check_foreign_keys,
    check_primary_keys,
    expect,
    run_expectations,
)
from deep_db_learning_spark.schema import ForeignKey  # noqa: E402
from deep_db_learning_spark.sources.catalog import Database  # noqa: E402


def test_testdata_pk_check_matches_duckdb(db, duck):
    rows = {r["table"]: r for r in check_primary_keys(db).collect()}
    assert set(rows) == {t for t, pk in db.primary_keys.items() if pk}
    for t, r in rows.items():
        pk = ",".join(db.primary_keys[t])
        n, k, d = duck.execute(
            f"""SELECT count(*), count(DISTINCT ({pk})),
                (SELECT count(*) FROM (
                   SELECT 1 FROM {t} GROUP BY ({pk}) HAVING count(*) > 1))
                FROM {t}"""
        ).fetchone()
        assert (r["n_rows"], r["n_keys"], r["n_dup_keys"]) == (n, k, d), t
    # the checker catches a REAL testdata defect: the synthetic
    # generator does not keep (l_orderkey, l_linenumber) unique —
    # every single-column PK is clean, the declared composite one
    # is violated. Exactly the drift this op exists to surface.
    assert rows["lineitem"]["n_dup_keys"] > 0
    for t in rows:
        if t != "lineitem":
            assert rows[t]["n_dup_keys"] == 0, t


def test_testdata_fks_have_no_orphans(db, duck):
    out = check_foreign_keys(db).collect()
    assert len(out) == sum(len(v) for v in db.foreign_keys.values())
    for r in out:
        assert r["n_orphans"] == 0, (r["table"], r["fk_cols"])
        n = duck.execute(f"SELECT count(*) FROM {r['table']}").fetchone()[0]
        assert r["n_rows"] == n


def test_dup_pk_and_orphan_fk_detected(spark):
    dim = spark.createDataFrame([Row(id=1, v="a"), Row(id=1, v="b"), Row(id=2, v="c")])
    fact = spark.createDataFrame(
        [Row(fid=10, ref=1), Row(fid=11, ref=99), Row(fid=12, ref=None)]
    )
    db = Database(
        spark,
        {"dim": dim, "fact": fact},
        primary_keys={"dim": ["id"], "fact": ["fid"]},
        foreign_keys={"fact": [ForeignKey(["ref"], "dim", ["id"])]},
    )
    pks = {r["table"]: r for r in check_primary_keys(db).collect()}
    assert (pks["dim"]["n_rows"], pks["dim"]["n_keys"], pks["dim"]["n_dup_keys"]) == (3, 2, 1)
    assert pks["fact"]["n_dup_keys"] == 0
    fk = check_foreign_keys(db).collect()[0]
    # ref=99 is an orphan; ref=NULL is skipped (MATCH SIMPLE)
    assert (fk["n_rows"], fk["n_orphans"]) == (3, 1)


def test_expectations_one_scan_with_duckdb_twin(db, duck):
    ev = db.df("events")
    exps = [
        expect("event_id", "unique"),
        expect("event_type", "not_null"),
        expect("event_type", "in_set", {"click", "error", "purchase", "signup", "view"}),
        expect("value", "between", (0.0, 100.0)),
        expect("event_type", "matches", r"^[a-z]+$"),
        expect("props", "not_null"),
    ]
    got = {r["name"]: (r["violations"], r["total"], r["pass"])
           for r in run_expectations(ev, exps).collect()}
    n, nn_et, bad_set, bad_rng, bad_re, nn_props, du = duck.execute(
        """
        SELECT count(*),
               sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END),
               sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                   ('click','error','purchase','signup','view') THEN 1 ELSE 0 END),
               sum(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 100.0)
                   THEN 1 ELSE 0 END),
               sum(CASE WHEN event_type IS NOT NULL AND NOT
                   regexp_matches(event_type, '^[a-z]+$') THEN 1 ELSE 0 END),
               sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END),
               count(*) - count(DISTINCT event_id)
        FROM events
        """
    ).fetchone()
    assert got["event_id:unique"] == (du, n, du == 0)
    assert got["event_type:not_null"] == (nn_et, n, nn_et == 0)
    assert got["event_type:in_set"] == (bad_set, n, bad_set == 0)
    assert got["value:between"] == (bad_rng, n, bad_rng == 0)
    assert got["event_type:matches"] == (bad_re, n, bad_re == 0)
    assert got["props:not_null"] == (nn_props, n, nn_props == 0)


def test_expectation_null_semantics_and_unique_nulls(spark):
    df = spark.createDataFrame(
        [Row(x=None, y=1), Row(x="zz", y=None), Row(x="a", y=None)]
    )
    got = {r["name"]: r["violations"] for r in run_expectations(
        df,
        [
            expect("x", "in_set", {"a", "b"}),   # NULL skipped, zz violates
            expect("x", "not_null"),
            expect("y", "unique"),               # two NULLs collide
        ],
    ).collect()}
    assert got == {"x:in_set": 1, "x:not_null": 1, "y:unique": 1}


def test_unknown_kind_rejected():
    with pytest.raises(ValueError):
        expect("x", "gte")


def test_quarantine_routes_rows_with_reasons(spark):
    from deep_db_learning_spark.profiling.validate import quarantine

    df = spark.createDataFrame(
        [
            Row(id=1, t="click", v=5.0),
            Row(id=2, t=None, v=5.0),
            Row(id=3, t="bogus", v=-1.0),
        ]
    )
    exps = [
        expect("t", "not_null"),
        expect("t", "in_set", {"click", "view"}),
        expect("v", "between", (0.0, 10.0)),
    ]
    clean, dirty = quarantine(df, exps)
    assert [r["id"] for r in clean.collect()] == [1]
    got = {r["id"]: sorted(r["__failed"]) for r in dirty.collect()}
    assert got == {2: ["t:not_null"], 3: sorted(["t:in_set", "v:between"])}
    # zero shuffles: row-local gate
    import re
    plan = clean._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert len(re.findall(r"\bExchange\b", plan)) == 0
    with pytest.raises(ValueError, match="unique"):
        quarantine(df, [expect("id", "unique")])


def test_population_stability_detects_shift(spark, db, duck):
    """PSI: identical distributions score ~0; a shifted current
    snapshot scores past the 0.25 'shifted' rule of thumb; the per-bin
    frame reconciles with an independent python replay over
    DuckDB-computed counts."""
    import math

    from deep_db_learning_spark.profiling.validate import (
        population_stability,
    )

    li = db.df("lineitem")
    # self vs self: every contribution is exactly 0 (same exact counts)
    per_bin, psi = population_stability(li, li, "l_extendedprice")
    assert psi == 0.0
    assert per_bin.where("contrib != 0").count() == 0
    rows = per_bin.collect()
    # reference bins are equal-frequency by construction: shares within
    # a bin's worth of each other
    shares = [r["p_ref"] for r in rows]
    assert max(shares) - min(shares) < 2.0 / len(shares) / len(shares) + 0.02

    # shifted current: prices scaled 1.5x push mass to upper bins
    from pyspark.sql import functions as F

    cur = li.withColumn("l_extendedprice", F.col("l_extendedprice") * 1.5)
    per_bin2, psi2 = population_stability(li, cur, "l_extendedprice")
    assert psi2 > 0.25

    # independent replay: recompute PSI in python from DuckDB counts
    cuts = [r[1] for r in sorted(
        duck.execute(
            """
            WITH vals AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
                          FROM lineitem WHERE l_extendedprice IS NOT NULL),
            ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM vals),
            n AS (SELECT count(*) AS n FROM vals)
            SELECT p AS p, v AS value FROM (VALUES (0.1),(0.2),(0.3),(0.4),(0.5),(0.6),(0.7),(0.8),(0.9)) pv(p), ranked, n
            WHERE rn = CAST(floor(p * (n.n - 1)) AS BIGINT) + 1
            """
        ).fetchall(),
        key=lambda r: r[0],
    )]

    def binof(v):
        return sum(1 for c in cuts if v > c)
    vals = [r[0] for r in duck.execute(
        "SELECT l_extendedprice FROM lineitem WHERE l_extendedprice IS NOT NULL").fetchall()]
    ref_counts = {}
    cur_counts = {}
    for v in vals:
        ref_counts[binof(v)] = ref_counts.get(binof(v), 0) + 1
        b2 = binof(v * 1.5)
        cur_counts[b2] = cur_counts.get(b2, 0) + 1
    nr, nc = sum(ref_counts.values()), sum(cur_counts.values())
    want = 0.0
    for b in range(10):
        pr = max(ref_counts.get(b, 0) / nr, 1e-6)
        pc = max(cur_counts.get(b, 0) / nc, 1e-6)
        want += (pc - pr) * math.log(pc / pr)
    assert psi2 == want  # bitwise: same counts, same python log recipe


def test_stream_population_stability_monitor(spark, db, tmp_path):
    """Streaming PSI: a reference-like batch scores near 0, a shifted
    batch scores past 0.25; rows land in replay-idempotent batch
    partitions and the batch PSI equals the batch-API operator on the
    same slice."""
    import os
    import time

    from pyspark.sql import functions as F

    from deep_db_learning_spark.profiling.validate import (
        population_stability,
        stream_population_stability,
    )
    from deep_db_learning_spark.streaming.partdir import read_parts

    li = db.df("lineitem").select("l_orderkey", "l_extendedprice")
    src = str(tmp_path / "in")
    now = time.time()
    # batch 0: the reference distribution itself; batch 1: 2x shifted
    for i, frame in enumerate(
        [li, li.withColumn("l_extendedprice", F.col("l_extendedprice") * 2.0)]
    ):
        d = os.path.join(src, f"b{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(d)
        for root, _dirs, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))

    out = str(tmp_path / "psi")
    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_population_stability(
        stream, li, "l_extendedprice", out, str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    rows = read_parts(spark, out).collect()
    psi_by_batch = {r["batch_id"]: r["psi"] for r in rows}
    assert psi_by_batch[0] == 0.0  # identical slice -> exactly 0
    assert psi_by_batch[1] > 0.25
    # batch-API equivalence on the shifted slice
    _pb, want = population_stability(
        li, li.withColumn("l_extendedprice", F.col("l_extendedprice") * 2.0),
        "l_extendedprice",
    )
    assert psi_by_batch[1] == want
    # replay-idempotent: partitions named by batch, 2 x n_bins rows
    assert len(rows) == 20
