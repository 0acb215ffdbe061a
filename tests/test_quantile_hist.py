"""Mergeable per-key quantile histograms (streaming/quantile_hist.py):
DuckDB twin parity for the batch operator, bracket correctness of the
histogram quantile reads against the exact grouped_quantiles, and —
the operator's whole point — merge-order independence of the
streaming path (random split ≡ ts-range split ≡ batch, bit-for-bit)."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.streaming.quantile_hist import (
    grouped_hist,
    grouped_hist_oracle_sql,
    hist_quantile_bounds,
    reference_cuts,
    stream_grouped_hist,
)


@pytest.fixture(scope="module")
def cuts(db):
    return reference_cuts(db.df("events"), "value", n_bins=8)


def test_grouped_hist_matches_duckdb_twin(db, duck, cuts):
    got = sorted(
        (r["user_id"], r["n"], tuple(r["counts"]))
        for r in grouped_hist(db.df("events"), "user_id", "value", cuts).collect()
    )
    want = sorted(
        (u, n, tuple(c))
        for u, n, c in duck.execute(
            grouped_hist_oracle_sql("events", "user_id", "value", cuts)
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0
    # per-key totals reconcile with the raw count
    assert sum(n for _u, n, _c in got) == db.df("events").where(
        F.col("value").isNotNull()
    ).count()


def test_hist_quantile_bounds_bracket_exact(db, cuts):
    """The returned interval (lo, hi] always contains the true order
    statistic, and the rank formula is the repo-wide definition."""
    from deep_db_learning_spark.operators.sketch import grouped_quantiles

    probs = [0.25, 0.5, 0.9]
    hist = grouped_hist(db.df("events"), "user_id", "value", cuts)
    bounds = {
        (r["user_id"], r["p"]): r
        for r in hist_quantile_bounds(hist, cuts, probs).collect()
    }
    exact = grouped_quantiles(
        db.df("events"), "user_id", "value", probs
    ).collect()
    assert len(exact) == len(bounds) > 0
    for r in exact:
        b = bounds[(r["user_id"], r["p"])]
        assert b["rank"] == r["rank"]
        if b["lo"] is not None:
            assert r["value"] > b["lo"]
        if b["hi"] is not None:
            assert r["value"] <= b["hi"]


def _run_stream(spark, src_dirs, schema, cuts, tmp_path, tag):
    import os

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src_dirs)
    )
    out = stream_grouped_hist(stream, "value", cuts)
    name = f"qhist_{tag}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(str(tmp_path), f"ck_{tag}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # running snapshots: the final summary per key is the largest-n row
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n"] > final[r["user_id"]]["n"]:
            final[r["user_id"]] = r
    return sorted(
        (u, r["n"], tuple(r["counts"])) for u, r in final.items()
    )


def test_stream_hist_merge_order_independent(spark, db, cuts, tmp_path):
    """Final streaming state is a function of the data multiset alone:
    a time-ordered 3-range split and an arbitrary 4-way random split
    both land bit-for-bit on the batch histogram (integer vector
    addition is commutative/associative — the fixed-cut design's whole
    reason to exist; see the module docstring's KLL decision)."""
    ev = db.df("events").select("event_id", "user_id", "ts", "value")
    want = sorted(
        (r["user_id"], r["n"], tuple(r["counts"]))
        for r in grouped_hist(ev, "user_id", "value", cuts).collect()
    )

    # split A: three ts-range drops (time-ordered arrival)
    lo, hi = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
    ).first()
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    c1, c2 = (lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3)
    src_a = str(tmp_path / "a")
    for i, p in enumerate(
        [us <= c1, (us > c1) & (us <= c2), us > c2]
    ):
        ev.filter(p).coalesce(1).write.mode("overwrite").parquet(
            f"{src_a}/b{i}"
        )
    got_a = _run_stream(spark, src_a, ev.schema, cuts, tmp_path, "a")

    # split B: four random-partition drops (arbitrary arrival order)
    src_b = str(tmp_path / "b")
    ev.repartition(4).write.mode("overwrite").parquet(src_b)
    got_b = _run_stream(spark, src_b, ev.schema, cuts, tmp_path, "b")

    assert got_a == want
    assert got_b == want


def test_cut_drift_flag_and_recut_generation(spark, db, cuts, tmp_path):
    """The cut-set lifecycle (module docstring): the monitor scores a
    reference-like batch under the flag and a shifted batch over it;
    the re-cut generation (new cuts from the drifted data, fresh
    checkpoint/path) replays bit-identically against its own batch
    twin — histories never mix across cut sets."""
    import os

    from deep_db_learning_spark.streaming.quantile_hist import (
        cut_drift,
        stream_cut_drift_monitor,
    )

    ev = db.df("events").select("event_id", "user_id", "ts", "value")
    shifted = ev.withColumn(
        "value", F.col("value") * 100 + F.lit(1e6)
    )

    # batch-side semantics first: self-distribution ≈ uniform (tiny
    # PSI), everything-in-the-top-bucket is a shift (huge PSI)
    psi_ref, _ = cut_drift(ev, "value", cuts)
    psi_shift, per_bin = cut_drift(shifted, "value", cuts)
    assert psi_ref < 0.1 < 0.25 <= psi_shift
    assert per_bin[-1][1] == shifted.where(F.col("value").isNotNull()).count()

    # streaming monitor: one drop per distribution, one PSI row set per
    # batch, replay-idempotent overwrite partitions
    src = str(tmp_path / "drift_src")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    shifted.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_path = str(tmp_path / "drift_out")
    q = stream_cut_drift_monitor(
        stream, "value", cuts, out_path,
        os.path.join(str(tmp_path), "ck_drift"),
    )
    q.awaitTermination(180)
    rows = spark.read.option("basePath", out_path).parquet(
        f"{out_path}/batch=*"
    ).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], r)
    assert len(by_batch) == 2
    flags = sorted((r["psi"], r["drifted"]) for r in by_batch.values())
    assert flags[0][1] is False and flags[1][1] is True
    assert flags[0][0] == psi_ref and flags[1][0] == psi_shift

    # the re-cut: new generation under NEW cuts, fresh checkpoint —
    # stream ≡ batch bit-for-bit within the new cut set
    new_cuts = reference_cuts(shifted, "value", n_bins=8)
    assert new_cuts != cuts
    src2 = str(tmp_path / "gen2_src")
    shifted.repartition(3).write.mode("overwrite").parquet(src2)
    got = _run_stream(
        spark, src2, shifted.schema, new_cuts, tmp_path, "gen2"
    )
    want = sorted(
        (r["user_id"], r["n"], tuple(r["counts"]))
        for r in grouped_hist(shifted, "user_id", "value", new_cuts).collect()
    )
    assert got == want


def test_merge_hists_equals_whole(db, cuts, spark):
    """merge(hist(A), hist(B)) ≡ hist(A ∪ B) bit-for-bit — including
    keys present on only one side (zero-vector coalesce)."""
    from deep_db_learning_spark.streaming.quantile_hist import merge_hists

    ev = db.df("events").select("event_id", "user_id", "value")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = sorted(
        (r["user_id"], r["n"], tuple(r["counts"]))
        for r in merge_hists(
            grouped_hist(a, "user_id", "value", cuts),
            grouped_hist(b, "user_id", "value", cuts),
        ).collect()
    )
    want = sorted(
        (r["user_id"], r["n"], tuple(r["counts"]))
        for r in grouped_hist(ev, "user_id", "value", cuts).collect()
    )
    assert merged == want


def test_merge_hists_cut_set_mismatch_raises(spark):
    """Different cut sets → different counts lengths: the in-plan guard
    raises instead of letting zip_with NULL-pad the merged vector."""
    import pytest

    from deep_db_learning_spark.streaming.quantile_hist import merge_hists

    a = spark.createDataFrame(
        [(1, 3, [1, 2])], "user_id bigint, n bigint, counts array<bigint>"
    )
    b = spark.createDataFrame(
        [(1, 3, [1, 1, 1])], "user_id bigint, n bigint, counts array<bigint>"
    )
    with pytest.raises(Exception, match="cut-set mismatch"):
        merge_hists(a, b).collect()
    # one-sided keys still merge fine against a same-length frame
    c = spark.createDataFrame(
        [(2, 2, [2, 0])], "user_id bigint, n bigint, counts array<bigint>"
    )
    got = sorted(
        (r["user_id"], r["n"], tuple(r["counts"]))
        for r in merge_hists(a, c).collect()
    )
    assert got == [(1, 3, (1, 2)), (2, 2, (2, 0))]


def test_cut_drift_multi_matches_per_column(db, spark):
    """One-scan multi-column drift ≡ the per-column cut_drift calls,
    bit-for-bit (shared driver arithmetic), including a drifted column
    and a NULL-heavy column."""
    from deep_db_learning_spark.streaming.quantile_hist import (
        cut_drift,
        cut_drift_multi,
        reference_cuts,
    )

    ev = db.df("events").select(
        "value",
        (F.col("value") * 3 + 100).alias("shifted"),
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("holey"),
    )
    cut_sets = {
        c: reference_cuts(ev, c, n_bins=6)
        for c in ("value", "shifted", "holey")
    }
    # score a DIFFERENT frame against value's cuts to get real drift
    cur = ev.withColumn("shifted", F.col("shifted") * 10 + 1e5)
    multi = cut_drift_multi(cur, cut_sets)
    assert set(multi) == set(cut_sets)
    for c in cut_sets:
        psi, per_bin = cut_drift(cur, c, cut_sets[c])
        assert multi[c][0] == psi, c
        assert multi[c][1] == per_bin, c
    # the deliberately shifted column actually flags
    assert multi["shifted"][0] >= 0.25 > multi["value"][0]
    # the narrow unpivot shape (forced via wide_max=0) is bit-identical
    narrow = cut_drift_multi(cur, cut_sets, wide_max=0)
    assert narrow == multi


def test_cut_drift_multi_wide_monitor_auto_switches(spark):
    """Past DRIFT_MULTI_WIDE_MAX aggregate columns (cols × bins) the
    monitor must leave the compiled-pivot shape (codegen width blows
    past the method limit — the tabnet-gradient lesson) for the narrow
    explode→groupBy unpivot. A ~1.5k-aggregate synthetic monitor
    crosses the cap, runs the narrow path, and lands bit-identical to
    the wide shape forced over the same cut sets."""
    from deep_db_learning_spark.streaming.quantile_hist import (
        DRIFT_MULTI_WIDE_MAX,
        cut_drift_multi,
    )

    n_cols, n_cuts = 128, 11  # 128 × 12 bins = 1536 aggs > 1024 cap
    assert n_cols * (n_cuts + 1) > DRIFT_MULTI_WIDE_MAX
    base = spark.range(500)
    df = base.select(
        *[
            ((F.col("id") * (i + 3)) % 97).cast("double").alias(f"f{i:03d}")
            for i in range(n_cols)
        ]
    )
    cut_sets = {
        f"f{i:03d}": [float(8 * (j + 1)) for j in range(n_cuts)]
        for i in range(n_cols)
    }
    auto = cut_drift_multi(df, cut_sets)  # crosses the cap: narrow
    wide = cut_drift_multi(df, cut_sets, wide_max=10**9)  # forced wide
    assert auto == wide
    assert set(auto) == set(cut_sets)
