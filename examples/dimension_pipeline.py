"""Dimension-quality pipeline — the late-r7 surfaces composed the way
a production feature platform runs them, events → validated changes →
versioned dimension → training features:

    raw events ──► quarantine gate (profiling/validate: row-local
                   expectations; violators routed out WITH reasons,
                   never dropped silently)
      clean feed ──► SCD Type 2 dimension maintenance in ts-ordered
                     batches (sources/scd.scd2_apply — late changes
                     audited first via scd2_late_changes)
        history ──► point-in-time snapshot at a training cutoff
                    (scd2_snapshot_at: no label leakage from the
                     future)
       features ──► wide per-type value sums (reshape.pivot_agg, one
                    shuffle) + leakage-safe out-of-fold target
                    encoding of the market segment against account
                    balance (functions/feature_eng)
        report ──► click→view→purchase funnel reach + mean
                   time-to-step (temporal.funnel)

    python examples/dimension_pipeline.py --data /root/testdata/sf0.001

Prints one JSON summary line; returns the dict from ``run`` for tests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/root/testdata/sf0.001")
    p.add_argument("--batches", type=int, default=3)
    p.add_argument("--funnel-hours", type=int, default=48)
    p.add_argument(
        "--store", default=None,
        help="maintain the SCD2 history in a two-area store here "
        "(closed deltas + open snapshot) with retention/compaction — "
        "the at-scale posture; default keeps it in memory",
    )
    p.add_argument(
        "--keep-last", type=int, default=2,
        help="open-snapshot versions kept after each vacuum",
    )
    p.add_argument(
        "--compact-every", type=int, default=2,
        help="compact the closed area every N batches",
    )
    return p


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from deep_db_learning_spark.functions.feature_eng import target_encode_oof
    from deep_db_learning_spark.operators.reshape import pivot_agg, pivot_domain
    from deep_db_learning_spark.operators.temporal import funnel
    from deep_db_learning_spark.profiling.validate import expect, quarantine
    from deep_db_learning_spark.functions.exact_agg import exact_sum
    from deep_db_learning_spark.sources import load_testdata
    from deep_db_learning_spark.sources.scd import (
        scd2_apply,
        scd2_late_changes,
        scd2_snapshot_at,
    )

    db = load_testdata(spark, args.data)
    ev = db.df("events")

    # 1. ingest gate
    types = pivot_domain(ev, "event_type")
    clean, dirty = quarantine(
        ev,
        [
            expect("user_id", "not_null"),
            expect("event_type", "in_set", set(types)),
            expect("value", "between", (0.0, 1e6)),
        ],
    )
    n_dirty = dirty.count()

    # 2. SCD2 dimension from the clean change feed, ts-ordered batches
    ch = clean.select("user_id", "ts", "event_type", "value")
    lo, hi = ch.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
    ).first()
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hist, n_late = None, 0
    cuts = [lo + (hi - lo) * (i + 1) // args.batches for i in range(args.batches)]
    store = None
    if args.store:
        # the at-scale posture (r9): closed history lands as append-only
        # per-batch deltas + an open snapshot with an atomic pointer;
        # retention (vacuum superseded open versions) and closed-area
        # compaction run INSIDE the maintenance loop, not as an
        # afterthought — disk stays O(live history), and a reader mid-
        # commit still sees a consistent version (keep_last >= 2)
        from deep_db_learning_spark.streaming.scd_stream import (
            SCD2Store,
            scd2_store_apply,
        )

        store = SCD2Store(args.store)
    prev = None
    for i, cut in enumerate(cuts):
        pred = us <= cut if prev is None else (us > prev) & (us <= cut)
        batch = ch.filter(pred)
        open_rows = store.read_open(spark) if store else hist
        n_late += scd2_late_changes(open_rows, batch, "user_id").count()
        if store:
            scd2_store_apply(
                store, batch, "user_id", ["event_type", "value"], batch_id=i
            )
            store.vacuum(keep_last=args.keep_last)
            if (i + 1) % args.compact_every == 0:
                store.compact_closed(spark)
        else:
            hist = scd2_apply(
                hist, batch, "user_id", ["event_type", "value"]
            ).localCheckpoint(eager=True)
        prev = cut
    if store:
        hist = store.read(spark)
    # 3. leakage-safe training view: state as of 2/3 through history
    cutoff = (lo + 2 * (hi - lo) // 3) // 1_000_000
    snap = scd2_snapshot_at(
        hist, F.timestamp_seconds(F.lit(cutoff)).cast("timestamp_ntz")
    )

    # 4. features: wide per-type sums + out-of-fold target encoding
    wide = pivot_agg(
        clean, "user_id", "event_type", types, exact_sum, "value",
        prefix="sum_", fill=0.0,
    )
    cust = db.df("customer")
    te = target_encode_oof(
        cust, "c_mktsegment", "c_acctbal", "c_custkey", k=5
    )
    features = te.join(
        wide, te.c_custkey == wide.user_id, "left"
    ).drop("user_id")

    # 5. funnel report on the clean feed
    fun = funnel(
        clean, ["click", "view", "purchase"], args.funnel_hours * 3600
    ).collect()

    return {
        "events": ev.count(),
        "quarantined": n_dirty,
        "late_changes_dropped": n_late,
        "history_versions": hist.count(),
        "open_versions": hist.filter(F.col("valid_to").isNull()).count(),
        "snapshot_rows": snap.count(),
        "feature_rows": features.count(),
        "feature_cols": len(features.columns),
        "funnel": {r["name"]: r["n_users"] for r in fun},
        # store mode: the open-snapshot versions surviving vacuum
        # (<= keep_last by construction)
        "store_open_snapshots": (
            store.open_store.versions() if store else None
        ),
    }


def main() -> None:
    args = build_parser().parse_args()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dimension-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, args)))
    spark.stop()


if __name__ == "__main__":
    main()
