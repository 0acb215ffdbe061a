"""Phase-split probe for ivf_append and clean_corpus (r15, guide §1).

Times each entry end-to-end with the bench's own action (.count()),
reports per-run job counts via job groups, and splits ivf_append into
its phases (fit / append / topk+drift) so the job floor is visible.
Run on a quiet host: python tools/probe_ivf_clean.py
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
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

sc = spark.sparkContext
tracker = sc.statusTracker()

# warm like the bench
db = e._db(spark, SF)
for t in db.get_tables():
    db.df(t).limit(1).count()
import pandas as pd
from pyspark.sql.functions import col, pandas_udf


def _warm_fn(s):
    return s


_warm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
_warm = pandas_udf(_warm_fn, "long")
spark.range(64).repartition(int(CPUS)).select(_warm(col("id"))).count()


def timed(tag, fn, runs=3):
    for i in range(runs):
        g = f"{tag}-{i}"
        sc.setJobGroup(g, tag)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        ids = tracker.getJobIdsForGroup(g)
        print(f"{tag} run{i}: {dt:.2f}s  jobs={len(ids)}", flush=True)


timed("ivf_append", lambda: e.q_ivf_append(spark, SF).count())
timed("clean_corpus", lambda: e.q_clean_corpus(spark, SF).count())

# ---- ivf_append phase split ----
from pyspark.sql import functions as F

from deep_db_learning_spark.operators import similarity


def phases():
    emb = db.df("embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    t0 = time.time()
    assigned, model = similarity.ivf_index_deterministic(old, n_lists=8, n_iters=3)
    t1 = time.time()
    store, drift = similarity.ivf_append(assigned, model, new)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = similarity.ivf_topk(store, model, queries_df, k=5, n_probes=3, query_count=5)
    flagged = drift.agg(F.sum(F.col("refit").cast("int")).alias("n_refit_lists"))
    topk.crossJoin(flagged).count()
    t2 = time.time()
    print(f"  fit={t1 - t0:.2f}s  append+topk+drift={t2 - t1:.2f}s", flush=True)


for i in range(3):
    g = f"ivf-phase-{i}"
    sc.setJobGroup(g, "ivf phases")
    phases()
    print(f"  jobs={len(tracker.getJobIdsForGroup(g))}", flush=True)

# ---- clean_corpus plan ----
out = e.q_clean_corpus(spark, SF)
out.explain("formatted")
