"""Scale probe for the frame-resident word-embedding fit (r14,
VERDICT r13 task 3): fit at vocab V and at 10×V on a vocabulary-
expanded corpus and report how the per-epoch cost moves.

    PYTHONPATH=/root/repo python tools/scaleprobe_wordemb.py

Corpus: 10 Caesar-cipher copies of sf0.1 ``documents`` (the
scaleprobe.py recipe) — each copy keeps the original token-frequency
distribution while sharing no tokens with the others, so the DISTINCT
vocabulary grows ~10× and in-vocab co-occurrence pairs grow ~10×
(cipher copies never cross-pair: every document lives in one copy).
That is exactly the axis the frame descent must scale on: the driver
descent's state is V² pair rows on the driver (gated at
MAX_VOCAB=256); the frame descent keeps pairs distributed and its
per-epoch cost is n_pairs-bounded.

Output: one JSON line per scale
``{"probe": "wordemb_frames", "vocab", "window", "epochs",
   "n_pairs", "count_sec", "fit_sec", "epoch_sec"}``
then a summary ratio line. Read: ``fit_sec`` ratio ≈ ``n_pairs``
ratio (linear in observed pairs) means the descent scales; a ratio
≈ (V ratio)² would flag a quadratic driver-style path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_WE_DIR", "/tmp/spark_graft_wordemb10x")
COPIES = 10
WINDOW = 5
EPOCHS = 4
V_BASE = 640


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "text"
    )
    max_doc = docs.agg(F.max("doc_id")).first()[0]
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    parts = [docs]
    for i in range(1, COPIES):
        rot = lower[i:] + lower[:i] + upper[i:] + upper[:i]
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * (max_doc + 1)))
            .withColumn("text", F.translate("text", lower + upper, rot))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")


def probe(spark, docs, vocab_size: int) -> dict:
    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.word_embedding import (
        _pairs_d_df,
        fit_word_embedding_frames,
    )

    t0 = time.time()
    n_occ = _pairs_d_df(docs, "text", WINDOW).count()
    count_sec = time.time() - t0
    t0 = time.time()
    m = fit_word_embedding_frames(
        docs, "text", vocab_size=vocab_size, epochs=EPOCHS, window=WINDOW
    )
    fit_sec = time.time() - t0
    row = {
        "probe": "wordemb_frames",
        "vocab": vocab_size,
        "window": WINDOW,
        "epochs": EPOCHS,
        "n_pairs": m.n_pairs,
        "pair_occurrences": n_occ,
        "count_sec": round(count_sec, 2),
        "fit_sec": round(fit_sec, 2),
        "epoch_sec": round(fit_sec / EPOCHS, 2),
        "loss_first": float(m.losses[0]),
        "loss_last": float(m.losses[-1]),
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wordemb-scaleprobe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--regen" in sys.argv or not os.path.exists(f"{DST}/documents.parquet"):
        generate(spark)

    base = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "text"
    )
    big = spark.read.parquet(f"{DST}/documents.parquet")
    r1 = probe(spark, base, V_BASE)
    r10 = probe(spark, big, V_BASE * 10)
    print(
        json.dumps(
            {
                "probe": "wordemb_frames_summary",
                "vocab_ratio": 10,
                "n_pairs_ratio": round(r10["n_pairs"] / max(r1["n_pairs"], 1), 2),
                "fit_ratio": round(r10["fit_sec"] / max(r1["fit_sec"], 0.01), 2),
                "epoch_ratio": round(
                    r10["epoch_sec"] / max(r1["epoch_sec"], 0.01), 2
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
