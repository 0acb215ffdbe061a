"""Isolated co-occurrence edge-build probe (r15): phase timings.

The build is shared by the kcore and triangles bench entries (each
builds its own copy) and the q_graph_iter slot. Phases:
  items distinct -> sizes/hot broadcast -> pair join -> distinct -> cut
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("probe-cooc")
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


facts = db.df("lineitem")
for run in range(int(os.environ.get("PROBE_RUNS", "3"))):
    t0 = time.time()
    items = facts.select(
        F.col("l_orderkey").alias("__g"), F.col("l_partkey").alias("__i")
    ).distinct()
    n_items = items.write.format("noop").mode("overwrite").save()
    t1 = time.time()
    edges, _hot = cooccurrence_edges(facts, "l_orderkey", "l_partkey")
    j0 = jobs()
    und = canonical_cut(edges)
    t2 = time.time()
    j1 = jobs()
    n = und.count()
    t3 = time.time()
    print(
        f"run {run}: items-distinct(noop) {t1-t0:.2f}s | "
        f"full build+cut {t2-t1:.2f}s ({j1-j0} jobs) | "
        f"count {t3-t2:.2f}s | edges {n}"
    )
spark.stop()
