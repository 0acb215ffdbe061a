"""100× scale probe of the retrieval + sketch families (VERDICT r12
task 6).

    python tools/scaleprobe100_retrieval.py          # generate + probe
    python tools/scaleprobe100_retrieval.py --regen  # force regeneration

The r11 funnel probe and the r12 graph probe each caught a real
super-linear stage; `text_search` and `sketches` only had 10× rows.
This probe runs their dominant pipelines over 100× corpora:

- **retrieval** — 100 doc_id-shifted copies of sf0.1 documents (the
  volume story a growing crawl actually has: postings lists and the
  positional index grow 100×, the query set and k stay fixed). Stages:
  the positional-index build, BM25 top-10, and the BM25+Jaccard RRF
  fusion — all off one shared index, exactly the `q_text_search`
  shape.
- **sketches** — 100 key-shifted copies of (l_orderkey,
  l_extendedprice) for kmv/hll/exact-quantiles (cardinality grows
  100×, sketch state must NOT), and 100 event_id-shifted copies of
  events (user_id kept) for CMS heavy hitters (stream grows 100×, the
  heavy-hitter set is invariant by construction).

Named bounds recorded per stage: postings/index row counts for
retrieval (they must scale linearly — the data IS bigger), and the
sketch driver-state sizes (k_used, register count, refinement rounds
— they must stay FLAT; a growing bound means the sketch is not a
sketch).

Timing protocol: median-of-3 after one warmup at each scale
(BASELINE.md Round-11 measurement hygiene); ratio =
median(100×)/median(1×). Sub-linear means < 100.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SPARK_GRAFT_X100_RETR_DIR", "/tmp/spark_graft_scale100x_retr"
)
COPIES = 100


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "text"
    )
    dmx = docs.agg(F.max("doc_id")).first()[0]
    (
        docs.withColumn(
            "__c", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (F.col("doc_id") + F.col("__c") * (dmx + 1)).alias("doc_id"),
            "text",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/documents.parquet")
    )
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    lmx = li.agg(F.max("l_orderkey")).first()[0]
    (
        li.withColumn(
            "__c", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (F.col("l_orderkey") + F.col("__c") * (lmx + 1)).alias(
                "l_orderkey"
            ),
            "l_extendedprice",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/lineitem.parquet")
    )
    ev = spark.read.parquet(f"{SRC}/events.parquet").select(
        "event_id", "user_id"
    )
    emx = ev.agg(F.max("event_id")).first()[0]
    (
        ev.withColumn(
            "__c", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        .select(
            (F.col("event_id") + F.col("__c") * (emx + 1)).alias(
                "event_id"
            ),
            "user_id",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/events.parquet")
    )


def median3(fn) -> float:
    fn()  # warmup
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main() -> None:
    regen = "--regen" in sys.argv

    from deep_db_learning_spark.checkpoint import cut_lineage
    from deep_db_learning_spark.operators import search, sketch
    from deep_db_learning_spark.session import make_session

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    spark = make_session("scaleprobe100-retrieval", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")

    if regen or not os.path.exists(f"{DST}/documents.parquet"):
        t0 = time.time()
        generate(spark)
        print(f"# generated 100x corpora in {time.time() - t0:.1f}s at {DST}")

    queries = entry.TEXT_SEARCH_QUERIES
    results = {}
    for label, base in (("sf01", SRC), ("x100", DST)):
        docs = spark.read.parquet(f"{base}/documents.parquet")
        li = spark.read.parquet(f"{base}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        ev = spark.read.parquet(f"{base}/events.parquet").select(
            "event_id", "user_id"
        )
        times = {}

        # retrieval stage 1: positional index build (the one
        # tokenization scan everything else derives from)
        times["index_build"] = median3(
            lambda: search.build_positional_postings(
                docs, "text", "doc_id"
            ).count()
        )
        # shared materialized index for the ranked stages (the
        # q_text_search shape: one index, many pipelines)
        pos = cut_lineage(
            search.build_positional_postings(docs, "text", "doc_id"),
            eager=True,
        )
        postings = cut_lineage(
            search.postings_from_positional(pos, "doc_id"), eager=True
        )
        n_postings = postings.count()

        times["bm25"] = median3(
            lambda: search.bm25_topk(
                docs, "text", "doc_id", queries, k=10, postings=postings
            ).count()
        )

        def rrf_run():
            bm = search.bm25_topk(
                docs, "text", "doc_id", queries, k=10, postings=postings
            )
            ja = search.jaccard_topk(
                docs, "text", "doc_id", queries, k=10, postings=postings
            )
            return search.rrf_fuse([bm, ja], "doc_id", k=10).count()

        times["rrf"] = median3(rrf_run)

        # sketches: cardinality 100x, state must stay flat
        times["kmv"] = median3(
            lambda: sketch.kmv_distinct(li, "l_orderkey").count()
        )
        times["hll"] = median3(
            lambda: sketch.hll_distinct(li, "l_orderkey").count()
        )
        times["cms"] = median3(
            lambda: sketch.cms_heavy_hitters(
                ev, "user_id", threshold=10
            ).count()
        )
        times["quantile"] = median3(
            lambda: sketch.exact_quantiles(
                li, "l_extendedprice", [0.25, 0.5, 0.75, 0.95, 0.99]
            ).count()
        )

        kmv_row = sketch.kmv_distinct(li, "l_orderkey").first()
        results[label] = {
            "n_docs": docs.count(),
            "n_rows_li": li.count(),
            "n_postings": n_postings,
            "kmv_k_used": kmv_row["k_used"],
            **{k: round(v, 2) for k, v in times.items()},
        }
        print(json.dumps({"scale": label, **results[label]}), flush=True)

    for stage in (
        "index_build", "bm25", "rrf", "kmv", "hll", "cms", "quantile"
    ):
        r = results["x100"][stage] / max(results["sf01"][stage], 1e-9)
        print(
            json.dumps(
                {
                    "stage": stage,
                    "sf01_sec": results["sf01"][stage],
                    "x100_sec": results["x100"][stage],
                    "ratio_vs_100x_data": round(r, 1),
                    "sublinear": r < 100,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
