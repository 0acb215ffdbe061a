"""Scale probe: run driver-contract queries at sf0.1 AND at a 10×-facts
variant, and report the time ratio per query.

    python tools/scaleprobe.py                 # default query set
    python tools/scaleprobe.py minhash_dedup simhash   # subset
    python tools/scaleprobe.py --regen         # force data regeneration

The 10× dataset is derived from sf0.1 by shifted-key union (the
BASELINE.md scaling-probe recipe, now reproducible):

- facts (``lineitem``, ``orders``, ``events``) get 10 copies with
  primary keys shifted by ``copy × max_key`` — FK targets (customer,
  part, supplier) stay fixed, so per-dimension fan-in grows 10×, the
  realistic shape of growing a fact table against stable dimensions;
- ``documents`` copies apply a per-copy Caesar cipher to the letters
  (a bijective char map, spaces/digits untouched): every copy keeps
  the ORIGINAL corpus's exact shingle-frequency distribution (so
  inverted-index/PPJoin behavior scales honestly) while sharing no
  shingles across copies — dedup workloads scale in corpus size, not
  in trivially-duplicated pairs and not via artificial heavy-hitter
  shingles (a naive word-suffix perturbation creates those and makes
  the pair join pathological);
- ``embeddings`` copies add a small deterministic per-copy offset to
  every component (distinct vectors, same geometry);
- dimensions are unchanged.

Output: one JSON line per query ``{"query", "sf01_sec", "x10_sec",
"ratio"}`` then a summary line. A ratio ≪ 10 means the plan is
overhead-bound at sf0.1 and has headroom; a ratio ≈ 10 means linear
scaling (expected once data dominates); a ratio ≫ 10 flags a
super-linear plan — investigate the shuffle/skew.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/spark_graft_scale10x")
COPIES = 10

DEFAULT_QUERIES = [
    "tpch_q1",
    "tpch_q5",
    "tpch_q6",
    "message_mean_conv",
    "message_2hop",
    "lineitem_numeric_profile",
    "bfs_per_root",
    "dedup_exact",
    "text_metrics",
    "decontamination",
    "simhash",
    "ngram_jaccard",
    "lsh_verify_pairs_t07",
    "minhash_dedup",
    "text_dedup_clusters",
    "embedding_topk",
    "ann_lsh",
    "events_sessions",
    "events_hourly",
    "customer_features",
    "attention_aggregate",
    # r5: the two-layer trainer step (driver state = root seed nodes
    # only — must not grow with facts) and the streaming node-store's
    # versioned-snapshot merge (re-streamed micro-batches at 10×
    # events — must not be rewrite-bound)
    "train_step",
    "node_store",
    # r7: retrieval — postings build + broadcast query joins must stay
    # scan-bound (driver state is the query vocabulary only)
    "text_search",
    # r7: LM perplexity — fit collects stay bounded (top-V/top-K) and
    # scoring is one scan + one fold, so 10× docs must scale ~linearly
    # (at sf0.1 the entry is fixed-overhead-dominated, so the observed
    # ratio understates even that)
    "text_quality",
    # r7: sketch state is O(sketch) and pagerank is 5 bounded
    # iterations — both must stay scan-bound at 10× facts
    "sketches",
    "pagerank",
    # r7: SCD2 — per-batch cost is one key shuffle of (open rows +
    # batch); 10× change feed must scale through the shuffle alone
    # (no driver state at all)
    "scd2_apply",
    # r7: funnel — per-step conditional aggregates + co-partitioned
    # joins; 10× events must stay scan/shuffle-bound
    "event_funnel",
    # r8: cohort + rolling-anomaly modes ride the events_windows slot —
    # the cohort distinct and the RANGE-frame window shuffle on
    # (user, period)/(user) and must scale through the shuffle alone
    "events_windows",
    # r8: the Q2/Q21 modes — the derived part-supplier groupBy and the
    # pair-distinct + semi/anti chain grow with lineitem; the per-part
    # min and the supplier count stay broadcast-sized
    "tpch_q18_modes",
    # r8: association rules ride graph_stats — the basket self-join's
    # pair-count groupBy grows with lineitem, the item counts stay
    # broadcast-sized (measured 0.73 at 10×)
    "graph_stats",
    # r9: the graph modes probed first-class — the wedge join is the
    # O(m^1.5) shape that must stay sub-quadratic at 10× facts, and
    # the k-core peel-round count may grow with the deeper cascade but
    # each round stays one groupBy + two semi joins
    "triangles",
    "kcore",
    # r10: the threshold-cut selection — probe jobs are count +
    # histogram aggregates over (id, key) (each a scan + n_bins of
    # driver state), so 10× facts must scale through scans alone; the
    # refinement may take one MORE round at 10× (log_{n_bins} growth),
    # never a bigger collect
    "wsample_select",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    dims = ["region", "nation", "customer", "supplier", "part"]
    for t in dims:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )

    def shifted_union(df, shift_cols: dict[str, int]):
        parts = []
        for i in range(COPIES):
            p = df
            for c, maxv in shift_cols.items():
                p = p.withColumn(c, F.col(c) + F.lit(i * (maxv + 1)))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).first()[0]
    shifted_union(orders, {"o_orderkey": max_ok}).write.mode("overwrite").parquet(
        f"{DST}/orders.parquet"
    )

    lineitem = spark.read.parquet(f"{SRC}/lineitem.parquet")
    shifted_union(lineitem, {"l_orderkey": max_ok}).write.mode("overwrite").parquet(
        f"{DST}/lineitem.parquet"
    )

    events = spark.read.parquet(f"{SRC}/events.parquet")
    max_ev = events.agg(F.max("event_id")).first()[0]
    shifted_union(events, {"event_id": max_ev}).write.mode("overwrite").parquet(
        f"{DST}/events.parquet"
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0]
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    parts = [docs]
    for i in range(1, COPIES):
        rot = lower[i:] + lower[:i] + upper[i:] + upper[:i]
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * (max_doc + 1)))
            .withColumn("text", F.translate("text", lower + upper, rot))
            .withColumn("n_chars", F.length("text"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).first()[0]
    parts = [emb]
    for i in range(1, COPIES):
        parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * (max_vec + 1)))
            .withColumn(
                "embedding",
                F.transform(
                    "embedding", lambda x: (x + F.lit(i * 0.013)).cast("float")
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    regen = "--regen" in sys.argv

    import __spark_entry__ as entry
    from deep_db_learning_spark.session import make_session

    spark = make_session("scaleprobe", driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")

    if regen or not os.path.exists(f"{DST}/embeddings.parquet"):
        t0 = time.time()
        generate(spark)
        print(f"# generated 10x data in {time.time() - t0:.1f}s at {DST}")

    names = args or DEFAULT_QUERIES
    qs = entry.queries()
    # bench-only entries (outside the 50-slot registry) resolve via
    # their q_<name> module functions, same as bench.py
    for name in names:
        if name not in qs and hasattr(entry, "q_" + name):
            qs[name] = getattr(entry, "q_" + name)
    results = {}
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}, skipping")
            continue
        times = {}
        for label, sf_dir in (("sf01", SRC), ("x10", DST)):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times[label] = time.time() - t0
        ratio = times["x10"] / times["sf01"] if times["sf01"] > 0 else float("inf")
        results[name] = {
            "sf01_sec": round(times["sf01"], 2),
            "x10_sec": round(times["x10"], 2),
            "ratio": round(ratio, 2),
        }
        print(json.dumps({"query": name, **results[name]}))

    worst = sorted(results.items(), key=lambda kv: -kv[1]["ratio"])[:5]
    print(
        json.dumps(
            {
                "summary": "scaleprobe",
                "n": len(results),
                "worst_ratios": {k: v["ratio"] for k, v in worst},
            }
        )
    )


if __name__ == "__main__":
    main()
