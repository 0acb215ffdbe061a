"""Phase-split probe for text_qfilter (r15, guide §1).

Times q_text_qfilter end-to-end (noop-sink style: count the final
frame), and splits fit_quality_filter into its per-epoch jobs via the
status tracker, printing job counts and wall times warm and cold.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(2 * int(CPUS)))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

tracker = spark.sparkContext.statusTracker()


def run(tag):
    j0 = len(tracker.getJobIdsForGroup() or [])
    t0 = time.time()
    df = e.queries()["text_qfilter"](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    jobs = spark.sparkContext.uiWebUrl  # not available; use allJobs
    print(f"{tag}: {dt:.2f}s")
    return dt


# job-count via a fresh job group
from pyspark import SparkContext

for i in range(3):
    sc = spark.sparkContext
    sc.setJobGroup(f"qf{i}", "probe")
    before = set()
    t0 = time.time()
    df = e.queries()["text_qfilter"](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    ids = tracker.getJobIdsForGroup(f"qf{i}")
    print(f"run{i}: {dt:.2f}s  jobs={len(ids)}")
