"""100×-facts scale probe of the graph family (VERDICT r11 task 6).

    python tools/scaleprobe100_graph.py          # generate + probe
    python tools/scaleprobe100_graph.py --regen  # force regeneration

The funnel probe (`tools/scaleprobe100.py`) covered the curation
stages; the remaining super-linear-in-density candidates are the
triangle wedge join and k-core peeling. This probe runs them over
100× FACTS with FIXED DIMENSIONS — the recipe that matches how a
warehouse actually grows: the part catalog stays put while 100× more
orders (baskets) arrive. 100 key-shifted copies of sf0.1 lineitem's
(l_orderkey, l_partkey) pairs, order keys disjoint per copy.

What the recipe implies about the graph: `cooccurrence_edges`
DEDUPLICATES item pairs across baskets, and every copy holds the
same basket contents, so the DISTINCT co-purchase edge set is
IDENTICAL at 1× and 100× by construction. The probe therefore
separates the two costs a 1000-executor run would see:

- the facts→distinct-pairs stage (volume-bound: 100× more
  (basket, item) rows flow into the pair join + distinct) — this is
  the part that must scale with data volume and should land well
  under 100×;
- the wedge join + peel rounds over the distinct graph (density-
  bound: identical input either way — the named bounds, wedge count
  and peel-round count, pin that the graph work itself did not grow).

A graph whose DENSITY also grows 100× is a different workload — the
per-group quadratic guard (``max_per_group``) and the hot-group
spill path are the documented backstops there (operators/
triangles.py); this probe pins the fixed-dims contract.

Timing protocol: median-of-3 after one warmup at each scale (host
shows 3-10× cold-run swings — BASELINE.md Round-11 measurement
hygiene); ratio = median(100×)/median(1×). Sub-linear means < 100.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_X100_GRAPH_DIR", "/tmp/spark_graft_scale100x_graph")
COPIES = 100
KCORE_K = 80  # the registry slot's k (__spark_entry__._KCORE_K)


def generate(spark) -> None:
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    mx = li.agg(F.max("l_orderkey")).first()[0]
    out = li.withColumn(
        "__c", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
    ).select(
        (F.col("l_orderkey") + F.col("__c") * (mx + 1)).alias("l_orderkey"),
        "l_partkey",
    )
    os.makedirs(DST, exist_ok=True)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/lineitem.parquet"
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

    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.kcore import k_core
    from deep_db_learning_spark.operators.triangles import (
        _oriented,
        canonical_cut,
        cooccurrence_edges,
        triangle_stats,
    )
    from deep_db_learning_spark.session import make_session

    spark = make_session("scaleprobe100-graph", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")

    if regen or not os.path.exists(f"{DST}/lineitem.parquet"):
        t0 = time.time()
        generate(spark)
        print(f"# generated 100x lineitem in {time.time() - t0:.1f}s at {DST}")

    results = {}
    for label, path in (("sf01", f"{SRC}/lineitem.parquet"),
                        ("x100", f"{DST}/lineitem.parquet")):
        li = spark.read.parquet(path).select("l_orderkey", "l_partkey")
        n = li.count()
        times = {}

        # stage 1: the full triangle pipeline from raw facts — edge
        # build (pair join + distinct; the volume-bound part) + wedge
        # join + closing-edge probe + per-node stats
        times["triangles"] = median3(
            lambda: triangle_stats(
                cooccurrence_edges(li, "l_orderkey", "l_partkey")[0]
            ).count()
        )

        # stage 2: k-core from raw facts (edge build + fixpoint peel)
        times["kcore"] = median3(
            lambda: k_core(
                cooccurrence_edges(li, "l_orderkey", "l_partkey")[0],
                KCORE_K,
                max_iters=32,
            ).count()
        )

        # named bounds: the graph the wedge join / peel actually see
        # (canonical_cut: _oriented requires canonical input as of r13)
        edges = canonical_cut(
            cooccurrence_edges(li, "l_orderkey", "l_partkey")[0]
        )
        n_edges = edges.count()
        wedges = int(
            _oriented(edges)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2))
            .first()[0]
        )
        _kc, rounds = k_core(edges, KCORE_K, max_iters=32, return_rounds=True)
        _kc.count()
        results[label] = {
            "rows": n,
            "n_edges": n_edges,
            "wedges": wedges,
            "peel_rounds": rounds,
            **{k: round(v, 2) for k, v in times.items()},
        }
        print(json.dumps({"scale": label, **results[label]}), flush=True)

    for stage in ("triangles", "kcore"):
        r = results["x100"][stage] / max(results["sf01"][stage], 1e-9)
        print(
            json.dumps(
                {
                    "stage": stage,
                    "sf01_sec": results["sf01"][stage],
                    "x100_sec": results["x100"][stage],
                    "ratio": round(r, 1),
                    "sublinear": r < 100,
                    "bound": {
                        "wedges_sf01": results["sf01"]["wedges"],
                        "wedges_x100": results["x100"]["wedges"],
                        "rounds_sf01": results["sf01"]["peel_rounds"],
                        "rounds_x100": results["x100"]["peel_rounds"],
                    },
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
