"""Streaming maintenance of the IVF vector store — the ANN half of the
incremental-crawl loop (``dedup.minhash_dedup_against`` is the text
half, ``operators.similarity.ivf_append`` the batch form this wraps).

Each arriving micro-batch of vectors is coarse-assigned with the
FROZEN centroids and appended to the versioned snapshot store (the
same :class:`~.node_store.SnapshotStore` layout the node store uses —
atomic pointer flips, Delta/Iceberg-swappable), and the batch's
per-list drift counters land beside the snapshot as ``drift_v{n}``.
The refit POLICY stays with the caller — read the latest drift frame,
and when ``refit`` fires on any list, run
``ivf_index_deterministic`` (or the MLlib fit) over the grown store
and swap the model; the streaming operator shape is unchanged.

At 100 TB this is the production posture: appends cost one Arrow pass
over the batch plus a snapshot commit; the standing store is never
reshuffled, and drift — not a timer — decides when the expensive
refit pass runs.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage
from .node_store import SnapshotStore


def stream_vectors_into_store(
    vec_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mass_threshold: float = 0.3,
    err_ratio_threshold: float = 1.5,
    query_name: str = "vector_store_append",
    keep_last: int | None = None,
):
    """Maintain the IVF-assigned vector store from a stream:
    ``foreachBatch`` appends each micro-batch with the frozen
    centroids (bit-identical to re-assigning the grown corpus — the
    ``ivf_append`` contract) and writes the drift verdict.
    Exactly-once per micro-batch (r7): the last committed ``batch_id``
    flips atomically with the snapshot pointer, so replayed batches
    are detected and skipped (the node-store cursor)."""
    from ..operators.similarity import (
        _assign_with_err,
        _model_centers,
        ivf_append,
        ivf_append_stats,
    )

    store = SnapshotStore(store_path)
    spark = vec_stream.sparkSession

    def stats_path(v: int) -> str:
        return os.path.join(store_path, f"stats_v{v}")

    def append(batch_df: DataFrame, batch_id: int) -> None:
        last = store.last_batch_id()
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch (r7 cursor)
        old = store.read(spark)
        if old is None:
            centers = _model_centers(model)
            assigned = (
                batch_df.withColumn("__a", _assign_with_err(centers, vec_col))
                .withColumn("list_id", F.col("__a.list_id"))
                .withColumn("__qerr", F.col("__a.qerr"))
                .drop("__a")
            )
            new_store = assigned.drop("__qerr")
            stats = assigned.groupBy("list_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("__qerr").alias("err_sum"),
            )
            drift = None
        else:
            # running stats from the previous version — each append
            # touches only the batch, never re-scans the store
            prev_v = store.latest_version()
            try:
                old_stats = spark.read.parquet(stats_path(prev_v))
            except AnalysisException:
                # only a MISSING stats snapshot degrades to the
                # O(store) re-derivation; a corrupt file must surface
                old_stats = ivf_append_stats(old, model, vec_col)
            new_store, drift, stats = ivf_append(
                old, model, batch_df, id_col, vec_col,
                mass_threshold, err_ratio_threshold,
                old_stats=old_stats, with_stats=True,
            )
        # materialize BEFORE overwriting: the appended plan reads the
        # old snapshot files the commit is about to supersede
        new_store = cut_lineage(new_store, eager=True)
        stats = cut_lineage(stats, eager=True)
        if drift is not None:
            drift = cut_lineage(drift, eager=True)
        # sidecars FIRST, pointer flip LAST (r8, the doc_index ordering):
        # a crash after commit() advances the batch cursor so the replay
        # is skipped and the sidecars would never land; orphans from a
        # pre-flip crash are overwritten by the replay
        next_v = (store.latest_version() or 0) + 1
        stats.write.mode("overwrite").parquet(stats_path(next_v))
        if drift is not None:
            drift.write.mode("overwrite").parquet(
                os.path.join(store_path, f"drift_v{next_v}")
            )
        v = store.commit(new_store, batch_id=batch_id)
        assert v == next_v  # single-writer foreachBatch contract
        if keep_last is not None:
            from .node_store import vacuum_snapshots

            vacuum_snapshots(store, keep_last=keep_last)

    return (
        vec_stream.writeStream.foreachBatch(append)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
