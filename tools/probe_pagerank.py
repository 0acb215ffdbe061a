"""Isolated pagerank probe (r15): entry timing + job/stage counts.

Usage: python tools/probe_pagerank.py [sf_dir] [cpus]
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
    .appName("probe-pagerank")
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

db = entry._db(spark, sf_dir)
for t in db.get_tables():
    db.df(t).limit(1).count()

st = spark.sparkContext.statusTracker


def jobs() -> int:
    return len(st().getJobIdsForGroup(None))


N_RUNS = int(os.environ.get("PROBE_RUNS", "3"))
for run in range(N_RUNS):
    t0 = time.time()
    j0 = jobs()
    n = entry.q_pagerank(spark, sf_dir).count()
    t1 = time.time()
    print(f"run {run}: pagerank {t1-t0:.2f}s ({jobs()-j0} jobs) rows {n}")
spark.stop()
