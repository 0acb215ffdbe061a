"""Streaming SCD2 (streaming/scd_stream.py): the two-area store
converges to the one-shot batch apply, replays are idempotent, and
closed history is partitioned per closing batch."""

import os
import time

from pyspark.sql import functions as F

from deep_db_learning_spark.sources.scd import scd2_apply
from deep_db_learning_spark.streaming.scd_stream import (
    SCD2Store,
    stream_changes_into_scd2,
)

KEY, TRACKED = "user_id", ["event_type", "value"]


def _changes(db):
    return db.df("events").select("user_id", "ts", "event_type", "value")


def _write_ordered_batches(ch, src, n=3):
    """n time-range parquet drops with strictly increasing mtimes so
    the file stream delivers them in change-time order."""
    lo, hi = ch.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
    ).first()
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cuts = [lo + (hi - lo) * (i + 1) // n for i in range(n - 1)]
    preds = []
    prev = None
    for c in cuts:
        preds.append(us <= c if prev is None else (us > prev) & (us <= c))
        prev = c
    preds.append(us > prev)
    now = time.time()
    for i, p in enumerate(preds):
        d = os.path.join(src, f"b{i}")
        ch.filter(p).coalesce(1).write.mode("overwrite").parquet(d)
        for root, _dirs, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))
    return [os.path.join(src, f"b{i}") for i in range(n)]


def _run_stream(spark, ch, src, store_path, ckpt):
    stream = (
        spark.readStream.schema(ch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_changes_into_scd2(
        stream, store_path, ckpt, KEY, TRACKED, "ts"
    )
    q.awaitTermination()


def _rows(df):
    return sorted(
        (r[KEY], r["event_type"], r["value"], r["valid_from"], r["valid_to"])
        for r in df.collect()
    )


def test_stream_converges_to_single_shot(spark, db, tmp_path):
    ch = _changes(db)
    src = str(tmp_path / "src")
    _write_ordered_batches(ch, src)
    store_path = str(tmp_path / "store")
    _run_stream(spark, ch, src, store_path, str(tmp_path / "ckpt"))
    store = SCD2Store(store_path)
    got = _rows(store.read(spark))
    want = _rows(scd2_apply(None, ch, KEY, TRACKED))
    assert got == want and len(got) > 0
    # open snapshot carries only open rows; closed area only closed
    assert store.read_open(spark).filter(F.col("valid_to").isNotNull()).count() == 0
    closed = store.read_closed(spark)
    assert closed.filter(F.col("valid_to").isNull()).count() == 0
    # each micro-batch owns its own closed partition (append-only area)
    parts = sorted(
        d for d in os.listdir(os.path.join(store_path, "closed"))
        if d.startswith("batch=")
    )
    assert parts == ["batch=0", "batch=1", "batch=2"]


def test_replay_is_idempotent(spark, db, tmp_path):
    ch = _changes(db)
    src = str(tmp_path / "src")
    _write_ordered_batches(ch, src)
    store_path = str(tmp_path / "store")
    _run_stream(spark, ch, src, store_path, str(tmp_path / "ckpt1"))
    store = SCD2Store(store_path)
    before = _rows(store.read(spark))
    v_before = store.open_store.latest_version()
    # lose the checkpoint → full replay of every batch
    _run_stream(spark, ch, src, store_path, str(tmp_path / "ckpt2"))
    assert _rows(store.read(spark)) == before
    # every replayed batch was skipped by the cursor — no new snapshot
    assert store.open_store.latest_version() == v_before


def test_compact_closed_preserves_history_and_gcs_partitions(spark, db, tmp_path):
    """r8 retention: compacting the closed area merges the per-batch
    partitions into one directory without changing a single history
    row; superseded partitions are GC'd; leftovers covered by the
    manifest (a crash between flip and GC) are ignored by reads; the
    stream keeps appending new batch partitions afterwards and a full
    replay is still idempotent."""
    import shutil

    ch = _changes(db)
    src = str(tmp_path / "src")
    dirs = _write_ordered_batches(ch, src)
    store_path = str(tmp_path / "store")
    _run_stream(spark, ch, src, store_path, str(tmp_path / "ckpt1"))
    store = SCD2Store(store_path)
    before = _rows(store.read(spark))
    closed_before = _rows(store.read_closed(spark))

    n = store.compact_closed(spark)
    assert n == 3
    assert _rows(store.read(spark)) == before
    assert _rows(store.read_closed(spark)) == closed_before
    live = [
        d for d in os.listdir(os.path.join(store_path, "closed"))
        if d.startswith("batch=")
    ]
    assert live == []  # all three partitions folded in and GC'd

    # a covered leftover (crash between manifest flip and GC) is
    # invisible to reads
    shutil.copytree(
        os.path.join(store_path, "closed", "compacted_2"),
        os.path.join(store_path, "closed", "batch=1"),
    )
    assert _rows(store.read_closed(spark)) == closed_before
    shutil.rmtree(os.path.join(store_path, "closed", "batch=1"))

    # replay after compaction: cursor still swallows every batch
    v_before = store.open_store.latest_version()
    _run_stream(spark, ch, src, store_path, str(tmp_path / "ckpt2"))
    assert _rows(store.read(spark)) == before
    assert store.open_store.latest_version() == v_before

    # open-area vacuum keeps the pointed-to snapshot only
    removed = store.vacuum(keep_last=1)
    assert removed and max(removed) == v_before - 1
    assert _rows(store.read(spark)) == before

    # re-compaction after more batches folds compacted_2 + new parts
    more = ch.withColumn(
        "ts", F.col("ts").cast("timestamp") + F.expr("INTERVAL 365 DAYS")
    ).withColumn("value", F.col("value") * 2)
    from deep_db_learning_spark.streaming.scd_stream import scd2_store_apply

    scd2_store_apply(store, more, KEY, TRACKED, "ts", batch_id=99)
    full = _rows(store.read(spark))
    store.compact_closed(spark)
    assert _rows(store.read(spark)) == full
    assert store._read_manifest()["covers_through"] == 99


def test_compact_every_policy_inline(spark, db, tmp_path):
    """compact_every runs closed-area compaction from inside the single
    writer on schedule; history is unchanged and later batches keep
    appending beside the compacted directory."""
    ch = _changes(db)
    src = str(tmp_path / "src")
    _write_ordered_batches(ch, src)
    store_path = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(ch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_changes_into_scd2(
        stream, store_path, str(tmp_path / "ckpt"), KEY, TRACKED, "ts",
        keep_last=1, compact_every=2,
    )
    q.awaitTermination()
    store = SCD2Store(store_path)
    # batches 0,1,2 ran; compaction fired after batch 1 -> manifest
    # covers through 1, batch=2 appended afterwards
    man = store._read_manifest()
    assert man is not None and man["covers_through"] == 1
    parts = sorted(
        d for d in os.listdir(os.path.join(store_path, "closed"))
        if d.startswith("batch=")
    )
    assert parts == ["batch=2"]
    # retention kept only the latest open snapshot
    assert [
        d for d in os.listdir(os.path.join(store_path, "open"))
        if d.startswith("v")
    ] == ["v3"]
    got = _rows(store.read(spark))
    want = _rows(scd2_apply(None, ch, KEY, TRACKED))
    assert got == want
