"""Streaming maintenance of the inverted-postings index — the
retrieval third of the incremental-crawl loop (``dedup``'s band index
is the dedup third, ``vector_store`` the ANN third;
``operators.search.postings_append`` is the batch form this wraps).

Each arriving micro-batch of documents is tokenized ONCE (only the
batch — the standing index is never re-scanned) and unioned into the
versioned snapshot store, and the corpus counters ``(n_docs,
total_tokens)`` that BM25 needs for idf/avgdl are maintained
associatively beside it as ``stats_v{n}`` — query time then runs
:func:`~..operators.search.bm25_topk_from_index` with ZERO corpus
scans. Postings rows are per-document immutable, so on a real cluster
the full-snapshot commit below swaps for an append-only partition
write + manifest (Delta/Iceberg) without touching the operator; the
snapshot store is the container-scale stand-in with the same atomic
pointer-flip isolation the node store uses.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage
from .node_store import SnapshotStore


def read_index_stats(spark, store_path: str) -> tuple[int, int]:
    """``(n_docs, total_tokens)`` of the latest committed index
    version — the inputs :func:`~..operators.search.bm25_topk_from_index`
    needs, read from the one-row stats snapshot."""
    store = SnapshotStore(store_path)
    v = store.latest_version()
    if v is None:
        return 0, 0
    try:
        row = spark.read.parquet(
            os.path.join(store_path, f"stats_v{v}")
        ).first()
        return int(row["n_docs"]), int(row["total_tokens"])
    except AnalysisException:
        # stats are written BEFORE the pointer flips (see append), so a
        # committed version always has them — this fallback covers only
        # stores written before that ordering fix. Re-derive from the
        # postings (approximate: zero-token docs carry no postings rows,
        # so n_docs is a lower bound there; total_tokens is exact).
        post = store.read(spark)
        row = post.agg(
            F.countDistinct(post.columns[0]).alias("n"),
            F.coalesce(F.sum("tf"), F.lit(0)).alias("s"),
        ).first()
        return int(row["n"]), int(row["s"])


def stream_docs_into_index(
    doc_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_name: str = "doc_index_append",
    keep_last: int | None = None,
):
    """Maintain the inverted index from a document stream:
    ``foreachBatch`` tokenizes each micro-batch, unions its postings
    into the snapshot store (bit-identical to rebuilding over the
    grown corpus — the ``postings_append`` contract, pinned in tests),
    and folds the batch's exact ``(n_docs, total_tokens)`` deltas into
    the running stats. Exactly-once per micro-batch (r7): the last
    committed ``batch_id`` flips atomically with the snapshot pointer,
    so replayed batches are detected and skipped (the node-store
    cursor)."""
    from ..operators.search import build_postings, search_tokens

    store = SnapshotStore(store_path)
    spark = doc_stream.sparkSession

    def stats_path(v: int) -> str:
        return os.path.join(store_path, f"stats_v{v}")

    def append(batch_df: DataFrame, batch_id: int) -> None:
        last = store.last_batch_id()
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch (r7 cursor)
        batch_post = build_postings(batch_df, text_col, id_col)
        brow = batch_df.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.size(search_tokens(text_col))), F.lit(0)
            ).alias("s"),
        ).first()
        old = store.read(spark)
        prev_docs = prev_tokens = 0
        if old is not None:
            prev_v = store.latest_version()
            try:
                srow = spark.read.parquet(stats_path(prev_v)).first()
                prev_docs = int(srow["n_docs"])
                prev_tokens = int(srow["total_tokens"])
            except AnalysisException:
                # only a MISSING stats snapshot (legacy store written
                # before the stats-before-pointer ordering) degrades to
                # the O(store) re-derivation — approximate: zero-token
                # docs carry no postings rows, so prev_docs is a lower
                # bound; the exact counters come from the maintained path
                prev_docs = old.select(id_col).distinct().count()
                prev_tokens = int(
                    old.agg(
                        F.coalesce(F.sum("tf"), F.lit(0)).alias("s")
                    ).first()["s"]
                )
            new_store = old.unionByName(batch_post)
        else:
            new_store = batch_post
        # materialize BEFORE overwriting: the appended plan reads the
        # old snapshot files the commit is about to supersede
        new_store = cut_lineage(new_store, eager=True)
        # stats FIRST, pointer flip LAST: a crash after commit() would
        # advance the batch cursor, so the replayed batch is skipped and
        # the version's stats would never be written; writing stats
        # before the flip makes the pointer the single commit point (an
        # orphan stats_v{n} from a pre-commit crash is simply
        # overwritten by the replay)
        next_v = (store.latest_version() or 0) + 1
        stats = spark.createDataFrame(
            [(prev_docs + int(brow["n"]), prev_tokens + int(brow["s"]))],
            "n_docs bigint, total_tokens bigint",
        )
        stats.write.mode("overwrite").parquet(stats_path(next_v))
        v = store.commit(new_store, batch_id=batch_id)
        assert v == next_v  # single-writer foreachBatch contract
        if keep_last is not None:
            from .node_store import vacuum_snapshots

            vacuum_snapshots(store, keep_last=keep_last)

    return (
        doc_stream.writeStream.foreachBatch(append)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
