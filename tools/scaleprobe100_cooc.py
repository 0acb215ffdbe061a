"""100×-docs probe of the streaming co-occurrence maintenance loop
(r14, VERDICT r13 task 7).

    PYTHONPATH=/root/repo python tools/scaleprobe100_cooc.py

Question: ``merge_cooc`` rewrites the full merged snapshot per
micro-batch, and the snapshot is distinct-bigram-sized — much larger
than the vocabulary at corpus scale. What is the per-batch cost curve
over a 100× corpus, and does the LSM mode (``compact_every``) fix it?

Corpus: the scaleprobe100 recipe (100 key-shifted Caesar copies of
sf0.1 documents — reused from tools/scaleprobe100.py, regenerated if
absent). The copies are streamed as 20 micro-batches of 5 copies each
through ``apply_cooc_batch`` — the EXACT ``foreachBatch`` body — in
two modes:

- ``rewrite``  (compact_every=None): the r13 behavior;
- ``lsm``      (compact_every=5): delta staging + amortized compaction.

Output: one JSON line per mode with the per-batch seconds list, then
a summary. Read: the rewrite curve GROWS with batch index (each batch
pays the full standing snapshot); the lsm curve is flat with
compaction spikes every 5th batch; the verdict compares the mean of
batches 11-20 (standing snapshot large) across modes. Both stores
must hold identical final counts (checked, loudly).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_X100_DIR", "/tmp/spark_graft_scale100x")
WORK = "/tmp/spark_graft_cooc_probe"
N_BATCHES = 20
COPIES_PER_BATCH = 5


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from deep_db_learning_spark.streaming.embedding_stream import (
        apply_cooc_batch,
        read_counts,
    )
    from deep_db_learning_spark.streaming.node_store import SnapshotStore

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cooc-store-scaleprobe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{DST}/documents.parquet"):
        import scaleprobe100

        scaleprobe100.generate(spark)

    docs = spark.read.parquet(f"{DST}/documents.parquet").select(
        "doc_id", "text"
    )
    max_doc = docs.agg(F.max("doc_id")).first()[0]
    # batch i = copies [i*5, i*5+5) — copy index recovered from the
    # doc_id key-shift (the generator's layout)
    span = (max_doc + 1) // 100
    copy_idx = (F.col("doc_id") / F.lit(span)).cast("int")

    if os.path.isdir(WORK):
        shutil.rmtree(WORK)
    results = {}
    for mode, compact_every in (("rewrite", None), ("lsm", COPIES_PER_BATCH)):
        store = SnapshotStore(os.path.join(WORK, mode))
        per_batch = []
        for b in range(N_BATCHES):
            batch = docs.filter(
                (copy_idx >= b * COPIES_PER_BATCH)
                & (copy_idx < (b + 1) * COPIES_PER_BATCH)
            )
            t0 = time.time()
            apply_cooc_batch(
                spark, store, batch, b, compact_every=compact_every
            )
            per_batch.append(round(time.time() - t0, 2))
        tail_mean = sum(per_batch[N_BATCHES // 2:]) / (N_BATCHES // 2)
        results[mode] = {"per_batch": per_batch, "tail_mean": round(tail_mean, 2)}
        print(
            json.dumps(
                {
                    "probe": "cooc_store_100x",
                    "mode": mode,
                    "batches": N_BATCHES,
                    "per_batch_sec": per_batch,
                    "tail_mean_sec": round(tail_mean, 2),
                    "load": [round(x, 2) for x in os.getloadavg()],
                }
            ),
            flush=True,
        )

    # identical final counts across modes (merge-on-read vs rewrite)
    a = read_counts(spark, os.path.join(WORK, "rewrite"))
    b = read_counts(spark, os.path.join(WORK, "lsm"))
    diff = a.unionByName(b.select(*a.columns)).groupBy(
        "kind", "a", "b"
    ).agg(F.count(F.lit(1)).alias("c"), F.countDistinct("n").alias("d"))
    bad = diff.filter((F.col("c") != 2) | (F.col("d") != 1)).count()
    print(
        json.dumps(
            {
                "probe": "cooc_store_100x_summary",
                "counts_equal": bad == 0,
                "rewrite_tail_mean": results["rewrite"]["tail_mean"],
                "lsm_tail_mean": results["lsm"]["tail_mean"],
                "speedup": round(
                    results["rewrite"]["tail_mean"]
                    / max(results["lsm"]["tail_mean"], 0.01),
                    2,
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
