"""Incremental maintenance of the word-embedding corpus statistics —
the streaming half of ``operators/word_embedding.py`` (r13).

GloVe's decomposition makes the trained text embedding INCREMENTALLY
maintainable for free: the model is a function of the co-occurrence
matrix alone, and co-occurrence/unigram counts are associative exact
integers — the same incremental-view-maintenance shape as the node
store (count/sum deltas, full-outer merge). So a document stream
(crawl batches, ingestion micro-batches) keeps the COUNTS current in
a :class:`~.node_store.SnapshotStore`, and :func:`refit_from_store`
re-runs the deterministic descent from the merged counts whenever a
fresh model is wanted — bit-equal to a batch fit over the
concatenated corpus, because the counts are a function of the
document multiset alone (pinned in tests/test_word_embedding.py::
test_streamed_counts_refit_bit_equals_batch_fit).

Store layout: ONE frame ``(kind, a, b, n)`` — ``kind='uni'`` rows
carry token totals (``b`` NULL), ``kind='pair'`` rows the directed
adjacent-pair counts. One store, one snapshot lineage, one writer
(the single-writer fence of r13 applies).

100 TB posture: per micro-batch the corpus delta is touched by ONE
tokenization scan + two groupBys; the merged snapshot is vocabulary-
sized (distinct tokens + distinct pairs), not corpus-sized; the refit
reads only the snapshot. Exactly-once via the store's atomic
``batch_id`` cursor (the node-store recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage
from .node_store import SnapshotStore, vacuum_snapshots


def cooc_delta(batch: DataFrame, text_col: str = "text") -> DataFrame:
    """Associative count delta of one document micro-batch:
    ``(kind, a, b, n)`` — unigram totals + directed adjacent-pair
    counts, both exact BIGINTs from the shared tokenization
    (``word_embedding._tokens_col`` / ``_pairs_df``)."""
    from ..operators.word_embedding import _pairs_df, _tokens_col

    uni = (
        batch.select(F.explode(_tokens_col(text_col)).alias("a"))
        .filter(F.col("a") != "")
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("uni").alias("kind"),
            "a",
            F.lit(None).cast("string").alias("b"),
            "n",
        )
    )
    pair = (
        _pairs_df(batch, text_col)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("pair").alias("kind"), "a", "b", "n")
    )
    return uni.unionByName(pair)


def merge_cooc(old: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Merge two count frames by key addition. Pure integer addition —
    the merged frame is a function of the document multiset alone
    (batch-boundary independent), which is what makes the refit
    bit-equal to the batch fit."""
    if old is None:
        return delta
    return (
        old.unionByName(delta)
        .groupBy("kind", "a", "b")
        .agg(F.sum("n").alias("n"))
    )


def stream_docs_into_cooc_store(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    text_col: str = "text",
    query_name: str = "cooc_store_upsert",
    keep_last: int | None = None,
):
    """Maintain the co-occurrence store from a document stream:
    ``foreachBatch`` computes the batch delta and commits the merged
    snapshot — the :func:`~.node_store.stream_profiles_into_store`
    recipe verbatim (exactly-once batch cursor, lineage cut before the
    overwrite, optional retention inside the single writer)."""
    store = SnapshotStore(store_path)
    spark = docs_stream.sparkSession

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        last = store.last_batch_id()
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch
        delta = cooc_delta(batch_df, text_col)
        old = store.read(spark)
        merged = cut_lineage(merge_cooc(old, delta), eager=True)
        store.commit(merged, batch_id=batch_id)
        if keep_last is not None:
            vacuum_snapshots(store, keep_last=keep_last)

    return (
        docs_stream.writeStream.foreachBatch(upsert)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def counts_from_store(
    spark: SparkSession, store: SnapshotStore, vocab_size: int
) -> tuple[list, dict]:
    """(vocab, pair_counts) from the merged snapshot — the same
    bounded collects the batch fit performs (top-V vocab by
    ``(count DESC, token ASC)``; ≤V² pair rows)."""
    from ..operators.word_embedding import check_vocab_size

    check_vocab_size(vocab_size)
    snap = store.read(spark)
    if snap is None:
        raise ValueError(f"co-occurrence store {store.path} is empty")
    vocab_rows = (
        snap.filter(F.col("kind") == "uni")
        .orderBy(F.desc("n"), F.asc("a"))
        .limit(vocab_size)
        .collect()
    )
    vocab = sorted(r["a"] for r in vocab_rows)
    pair_rows = (
        snap.filter(
            (F.col("kind") == "pair")
            & F.col("a").isin(vocab)
            & F.col("b").isin(vocab)
        )
        .collect()
    )
    return vocab, {(r["a"], r["b"]): r["n"] for r in pair_rows}


def refit_from_store(
    spark: SparkSession,
    store_path: str,
    *,
    dim: int | None = None,
    vocab_size: int | None = None,
    epochs: int | None = None,
    lr: float | None = None,
):
    """Re-run the deterministic descent from the CURRENT merged counts
    — bit-equal to ``fit_word_embedding`` over the concatenated
    corpus (same counts → same ``_descend`` trajectory)."""
    from ..operators.word_embedding import WE_CONFIG, _descend

    dim = WE_CONFIG["dim"] if dim is None else dim
    vocab_size = (
        WE_CONFIG["vocab_size"] if vocab_size is None else vocab_size
    )
    epochs = WE_CONFIG["epochs"] if epochs is None else epochs
    lr = WE_CONFIG["lr"] if lr is None else lr
    store = SnapshotStore(store_path)
    vocab, pair_counts = counts_from_store(spark, store, vocab_size)
    return _descend(vocab, pair_counts, dim, epochs, lr)
