"""r15 experiment: edge-frame width vs kcore peel-loop time.

The peel loop scans the checkpointed edge frame every round (2 broadcast
semi joins + an aggregate); the per-round cost at bench scale is task
floor, so the scan width matters. A/B: und as-built (session width, 32)
vs coalesced to N in {1, 4, 8} before the loop.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("probe-kcore-width")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
from deep_db_learning_spark.checkpoint import cut_lineage
from deep_db_learning_spark.operators.kcore import k_core
from deep_db_learning_spark.operators.triangles import (
    canonical_cut,
    cooccurrence_edges,
)

db = entry._db(spark, sf_dir)
for t in db.get_tables():
    db.df(t).limit(1).count()

st = spark.sparkContext.statusTracker


def jobs() -> int:
    return len(st().getJobIdsForGroup(None))


edges, _hot = cooccurrence_edges(db.df("lineitem"), "l_orderkey", "l_partkey")
und = canonical_cut(edges)
und.count()

variants = [("as-built", und)]
for w in (8, 4, 1):
    c = cut_lineage(und.coalesce(w), eager=True)
    c._ddl_canonical_cut = True
    variants.append((f"coalesce({w})", c))

for rep in range(3):
    for name, u in variants:
        t0 = time.time()
        j0 = jobs()
        core, rounds = k_core(u, entry._KCORE_K, max_iters=32, return_rounds=True)
        n = core.count()
        t1 = time.time()
        print(
            f"rep {rep} {name:12s}: peel+count {t1-t0:.2f}s "
            f"({rounds} rounds, {jobs()-j0} jobs) core_nodes {n} "
            f"parts {u.rdd.getNumPartitions()}"
        )
spark.stop()
