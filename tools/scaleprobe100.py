"""100×-facts scale probe of the curation-funnel stages.

    python tools/scaleprobe100.py            # generate (if absent) + probe
    python tools/scaleprobe100.py --regen    # force data regeneration

The 10× probe (`tools/scaleprobe.py`) is the per-round regression
gate; this probe asks the north-star question once — do the three
stages a pretraining-data funnel actually runs at corpus scale
(quality-filter scoring fold, threshold-cut selection, MinHash+LSH
dedup) stay scan-bound at 100× documents?

The 100× corpus derives from sf0.1 documents by 100 key-shifted
copies, each Caesar-ciphered by ``copy % 26`` (the 10× recipe's
bijective char map). With only 26 distinct rotations, copies ``i``
and ``i+26`` carry IDENTICAL text under different doc_ids — so ~74%
of the corpus is an exact duplicate of another row BY CONSTRUCTION.
That is deliberate, not a flaw: large crawls are duplicate-heavy, and
it makes the dedup stage's verify path carry real load (every
signature bucket holds the ~4-copy family). Scoring and selection are
volume-bound and don't care.

Timing protocol: each stage is timed as median-of-3 AFTER one warmup
run at each scale (this host shows 3-10× random swings on cold runs —
see BASELINE.md Round-11); the reported ratio is
median(100×)/median(sf0.1). Sub-linear means < 100.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_X100_DIR", "/tmp/spark_graft_scale100x")
COPIES = 100


def generate(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0]
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    parts = []
    for i in range(COPIES):
        rot_i = i % 26
        rot = lower[rot_i:] + lower[:rot_i] + upper[rot_i:] + upper[:rot_i]
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * (max_doc + 1)))
        if rot_i:
            p = p.withColumn(
                "text", F.translate("text", lower + upper, rot)
            ).withColumn("n_chars", F.length("text"))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    os.makedirs(DST, exist_ok=True)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )


def median3(fn) -> float:
    fn()  # warmup (JIT + page cache; see BASELINE.md on host noise)
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main() -> None:
    regen = "--regen" in sys.argv

    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators import dedup
    from deep_db_learning_spark.operators.quality_filter import (
        fit_quality_filter,
        quality_logit_scores,
    )
    from deep_db_learning_spark.operators.selection import topk_threshold_cut
    from deep_db_learning_spark.checkpoint import cut_lineage
    from deep_db_learning_spark.session import make_session

    spark = make_session("scaleprobe100", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")

    if regen or not os.path.exists(f"{DST}/documents.parquet"):
        t0 = time.time()
        generate(spark)
        print(f"# generated 100x documents in {time.time() - t0:.1f}s at {DST}")

    # one model, fit once on a bounded sample at sf0.1 (the sampled-fit
    # mode — fitting is NOT a probed stage; production fits on a
    # sample regardless of corpus size)
    base_docs = spark.read.parquet(f"{SRC}/documents.parquet")
    model = fit_quality_filter(
        base_docs.withColumn(
            "y", (F.col("source") == "src0").cast("int")
        ),
        "y",
        sample_n=512,
    )

    results = {}
    for label, path in (("sf01", SRC), ("x100", DST)):
        docs = spark.read.parquet(f"{path}/documents.parquet")
        n = docs.count()
        times = {}

        # stage 1: quality-filter scoring fold (broadcast dec9 weights
        # + one map-side-combinable decimal fold over the gram frame)
        times["qfilter_score"] = median3(
            lambda: quality_logit_scores(docs, model).count()
        )

        # stage 2: threshold-cut selection (probe aggregates with
        # n_bins driver state + a pure codegen filter) over a
        # materialized score frame — selection timed alone
        scores = cut_lineage(
            quality_logit_scores(docs, model).select("doc_id", "qf_logit"),
            eager=True,
        )
        times["threshold_cut"] = median3(
            lambda: topk_threshold_cut(
                scores, "qf_logit", None, "doc_id", fraction=0.5
            ).count()
        )
        scores.unpersist()

        # stage 3: MinHash+LSH dedup (shingle → signature → banded
        # buckets → verify → survivor anti-join)
        times["minhash_dedup"] = median3(
            lambda: dedup.minhash_lsh_dedup(
                docs, "text", "doc_id", threshold=0.7
            ).count()
        )
        results[label] = {"rows": n, **{k: round(v, 2) for k, v in times.items()}}
        print(json.dumps({"scale": label, **results[label]}), flush=True)

    for stage in ("qfilter_score", "threshold_cut", "minhash_dedup"):
        r = results["x100"][stage] / max(results["sf01"][stage], 1e-9)
        print(
            json.dumps(
                {
                    "stage": stage,
                    "sf01_sec": results["sf01"][stage],
                    "x100_sec": results["x100"][stage],
                    "ratio": round(r, 1),
                    "sublinear": r < 100,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
