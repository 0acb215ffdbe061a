"""Isolated text_search timing probe (r14) — same conf/action as bench.py."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("probe-text-search")
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

vals = []
for i in range(5):
    t0 = time.time()
    entry.q_text_search(spark, sf_dir).count()
    vals.append(round(time.time() - t0, 3))
print("text_search runs:", vals, "median:", sorted(vals)[len(vals) // 2])
spark.stop()
