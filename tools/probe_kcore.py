"""Isolated kcore probe (r15): per-phase timing + Spark job counts.

Usage: python tools/probe_kcore.py [sf_dir] [cpus]
Prints: edge-build time, peel-loop time, total rounds, job/stage counts
for the peel loop alone (statusTracker deltas), and total entry time —
the measurement behind the r15 per-round-job-floor work (guide §1).
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
    .appName("probe-kcore")
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


N_RUNS = int(os.environ.get("PROBE_RUNS", "3"))
for run in range(N_RUNS):
    t0 = time.time()
    edges, _hot = cooccurrence_edges(db.df("lineitem"), "l_orderkey", "l_partkey")
    und = canonical_cut(edges)
    t1 = time.time()
    j0 = jobs()
    core, rounds = k_core(und, entry._KCORE_K, max_iters=32, return_rounds=True)
    t2 = time.time()
    j1 = jobs()
    n = core.count()
    t3 = time.time()
    j2 = jobs()
    print(
        f"run {run}: edge_build {t1-t0:.2f}s | peel {t2-t1:.2f}s "
        f"({rounds} rounds, {j1-j0} jobs) | final count {t3-t2:.2f}s "
        f"({j2-j1} jobs) | total {t3-t0:.2f}s | core_nodes {n}"
    )
spark.stop()
