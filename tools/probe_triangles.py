"""Isolated triangles probe (r15): per-phase timing + job counts.

Phases: cooc edge build+cut -> oriented cut -> wedge+closing probe
(tri cut) -> per-node stats tail. Usage: tools/probe_triangles.py
[sf_dir] [cpus]
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
    .appName("probe-triangles")
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
from deep_db_learning_spark.operators.triangles import (
    _oriented,
    _triangles_from_und,
    canonical_cut,
    cooccurrence_edges,
    triangle_stats,
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
    n_edges = und.count()
    o = cut_lineage(_oriented(und, n_edges=n_edges), eager=True)
    t2 = time.time()
    j1 = jobs()
    tri = cut_lineage(_triangles_from_und(und), eager=True)
    t3 = time.time()
    j2 = jobs()
    out = triangle_stats(und)
    n = out.count()
    t4 = time.time()
    print(
        f"run {run}: edge_build {t1-t0:.2f}s | orient_cut {t2-t1:.2f}s ({j1-j0} jobs) "
        f"| tri_cut(full second pipeline) {t3-t2:.2f}s ({j2-j1} jobs) | "
        f"stats-entry-from-cut-und {t4-t3:.2f}s ({jobs()-j2} jobs) | rows {n} | und_parts {und.rdd.getNumPartitions()}"
    )
spark.stop()
