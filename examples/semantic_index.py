"""Semantic indexing with IN-ENGINE trained embeddings — the r13
word-embedding family composed end-to-end, corpus → learned vectors →
document embeddings → ANN index → audited retrieval, plus the
streaming maintenance loop:

    documents ──► fit_word_embedding (distributed co-occurrence
                  counts → deterministic decimal-fold GD — GloVe's
                  decomposition, no torch)
              ──► embed_documents (exact-decimal relational encoder;
                  the same vectors also run the text_embedding
                  model_fn seam)
              ──► IVF index over the LEARNED geometry + 3-probe
                  top-k, recall@k audited against brute force
                  (similarity.topk_recall — every approximate result
                  ships its own audit)
              ──► streaming: micro-batches keep the co-occurrence
                  store current; refit_from_store re-trains — the
                  example replays the corpus in 3 batches and shows
                  the refit is bit-equal to the batch fit

    python examples/semantic_index.py --data /root/testdata/sf0.001

Prints one JSON summary line; returns the dict from ``run`` for
tests."""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, data_dir: str) -> dict:
    from pyspark.sql import functions as F

    from deep_db_learning_spark.checkpoint import cut_lineage
    from deep_db_learning_spark.operators import similarity
    from deep_db_learning_spark.operators.word_embedding import (
        embed_documents,
        fit_word_embedding,
        trained_model_fn,
    )
    from deep_db_learning_spark.streaming.embedding_stream import (
        refit_from_store,
        stream_docs_into_cooc_store,
    )

    docs = spark.read.parquet(f"{data_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    # 1. train word vectors from the corpus (two scans + bounded GD)
    model = fit_word_embedding(docs, "text")

    # 2. embed every document with the learned vectors (exact fold);
    #    zero vectors (all-OOV docs) excluded from retrieval
    demb = cut_lineage(
        embed_documents(docs, model)
        .withColumnRenamed("doc_id", "vec_id")
        .filter(F.exists("embedding", lambda x: x != F.lit(0.0))),
        eager=True,
    )
    n_embedded = demb.count()

    # 3. ANN index over the learned geometry, recall-audited
    queries = demb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assigned, ivf = similarity.ivf_index_deterministic(
        demb, n_lists=8, n_iters=5
    )
    approx = similarity.ivf_topk(
        assigned, ivf, queries, k=5, n_probes=3, query_count=5
    )
    exact = similarity.brute_force_topk(demb, queries, k=5)
    recall = {
        r["query_id"]: r["recall"]
        for r in similarity.topk_recall(approx, exact).collect()
    }

    # 4. streaming maintenance: replay the corpus in 3 micro-batches,
    #    refit from the merged store — bit-equal to the batch fit
    with tempfile.TemporaryDirectory() as tmp:
        in_dir = f"{tmp}/in"
        part = F.abs(F.hash(F.col("doc_id").cast("string"))) % 3
        for i in range(3):
            docs.filter(part == i).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = stream_docs_into_cooc_store(
            stream, f"{tmp}/cooc", f"{tmp}/ck"
        )
        q.awaitTermination(180)
        streamed = refit_from_store(spark, f"{tmp}/cooc")

    return {
        "vocab": len(model.vocab),
        "pairs": model.n_pairs,
        "loss_first": float(model.losses[0]),
        "loss_last": float(model.losses[-1]),
        "n_embedded": n_embedded,
        "mean_recall_at_5": round(
            sum(recall.values()) / max(len(recall), 1), 4
        ),
        "streamed_refit_bit_equal": streamed.U == model.U
        and streamed.losses == model.losses,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("semantic-index-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, args.data)))
    spark.stop()


if __name__ == "__main__":
    main()
