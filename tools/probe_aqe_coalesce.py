"""A/B probe: AQE size-based coalescing (parallelismFirst=false) vs
the default parallelism-first behavior, on the bench's worst
anti-scalers (r15, VERDICT item 8 / guide §2.1).

Usage: SPARK_GRAFT_PF=false python tools/probe_aqe_coalesce.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

PF = os.environ.get("SPARK_GRAFT_PF", "false")
ENTRIES = os.environ.get(
    "SPARK_GRAFT_PROBE_ENTRIES",
    "kcore,triangles,text_lm,wsample_select,text_qfilter,pagerank,"
    "minhash_dedup,text_search,sketches",
).split(",")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", PF)
    .config("spark.driver.memory", "24g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

SF = "/root/testdata/sf0.1"
print(f"parallelismFirst={PF}", flush=True)
for name in ENTRIES:
    fn = getattr(e, "q_" + name)
    ts = []
    for i in range(3):
        t0 = time.time()
        fn(spark, SF).count()
        ts.append(round(time.time() - t0, 2))
    print(f"{name}: {sorted(ts)}", flush=True)
