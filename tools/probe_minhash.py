"""Isolated minhash_dedup stage probe (r14) — same conf as bench.py."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("probe-minhash")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import col, pandas_udf

import __spark_entry__ as entry
from deep_db_learning_spark.checkpoint import cut_lineage
from deep_db_learning_spark.operators import dedup

db = entry._db(spark, sf_dir)
for t in db.get_tables():
    db.df(t).limit(1).count()


def _warm_fn(s):
    return s


_warm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
_warm = pandas_udf(_warm_fn, "long")
spark.range(64).repartition(int(cpus)).select(_warm(col("id"))).count()

for i in range(3):
    docs = db.df("documents")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    t0 = time.time()
    signed = cut_lineage(
        dedup.minhash_signature(docs, "text", 64, 9), eager=True
    )
    t1 = time.time()
    kept = dedup.minhash_lsh_dedup(
        docs, "text", "doc_id", threshold=0.7, signed=signed
    )
    kept.count()
    t2 = time.time()
    print(
        f"run {i}: sign {t1-t0:.2f}s  lsh+verify+anti {t2-t1:.2f}s"
    )

vals = []
for i in range(3):
    t0 = time.time()
    entry.q_minhash_dedup(spark, sf_dir).count()
    vals.append(round(time.time() - t0, 3))
print("full q_minhash_dedup runs:", vals)
spark.stop()
