"""Capture the r14 plan pins for the minhash cross-corpus candidates.

BEFORE shape (plans/r14/minhash_cand_before.txt): the banding-based
cross-corpus candidate construction ``q_minhash_dedup`` paid through
d8394e6 — ``_banded_buckets`` over EACH signature half (explode x16 +
md5 bucket), a band/bucket join, distinct. This is still
``minhash_dedup_against``'s fallback when no ``candidates=`` frame is
passed, so the pin is captured from the live module functions with the
exact arguments the old call site used.

AFTER shape (plans/r14/minhash_cand_after.txt): the parity slice the
entry passes since 30815e2 — a filter + projection over the ALREADY
materialized intra-corpus candidate frame (a checkpoint scan; zero new
banding, zero new exchange).

    python tools/pin_minhash_cand.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
from deep_db_learning_spark.checkpoint import cut_lineage
from deep_db_learning_spark.operators import dedup
from tools.explain import explain_string

db = entry._db(spark, sf_dir)
docs = db.df("documents")
signed = cut_lineage(dedup.minhash_signature(docs, "text", 64, 9), eager=True)

# --- BEFORE: band both halves again, bucket-join, distinct ---------------
sig_new = signed.filter(F.col("doc_id") % 2 == 1).select(
    F.col("doc_id"), F.col("signature")
)
sig_ref = signed.filter(F.col("doc_id") % 2 == 0).select(
    F.col("doc_id").alias("__ref_id"), F.col("signature")
)
b_new = dedup._banded_buckets(sig_new, "doc_id", "signature", 16).withColumnRenamed(
    "doc", "__new_id"
)
b_ref = dedup._banded_buckets(
    sig_ref, "__ref_id", "signature", 16
).withColumnRenamed("doc", "__ref_id")
before = (
    b_new.join(b_ref, ["band", "bucket"])
    .select("__new_id", "__ref_id")
    .distinct()
)

# --- AFTER: parity slice of the shared intra candidate frame -------------
cand_all = cut_lineage(
    dedup.lsh_candidate_pairs(signed, "doc_id", bands=16), eager=True
)
odd_a = F.col("id_a") % 2 == 1
after = cand_all.filter((F.col("id_a") % 2) != (F.col("id_b") % 2)).select(
    F.when(odd_a, F.col("id_a")).otherwise(F.col("id_b")).alias("__new_id"),
    F.when(odd_a, F.col("id_b")).otherwise(F.col("id_a")).alias("__ref_id"),
)

out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
for name, df in (("minhash_cand_before", before), ("minhash_cand_after", after)):
    plan = explain_string(df)
    with open(os.path.join(out_dir, name + ".txt"), "w") as fh:
        fh.write(plan)
    n_ex = plan.count("Exchange ")
    print(f"{name}: exchanges={n_ex} bytes={len(plan)}")

spark.stop()
