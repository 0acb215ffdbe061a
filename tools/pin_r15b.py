"""Capture r15 plan evidence for the minhash mixing fusion and the
quality-filter lazy cuts (plans/r15/*_before/after.txt).

The "before" shapes are reconstructed from the still-present unfused
code paths (temperature_fractions / domain_weights DataFrame paths;
an eager cut of the epoch gradient frame), so both sides come from
the same tree and the same data.
"""

import io
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
from __spark_entry__ import _db

SF = "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r15"


def fmt(df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def write(name, header, body):
    with open(f"{OUT}/{name}", "w") as f:
        f.write(header.rstrip() + "\n\n" + body)
    print("wrote", name)


db = _db(spark, SF)
docs = db.df("documents")

# ---- minhash mixing tail ----
# BEFORE: three separate driver jobs — docs.count(), the
# temperature-fractions groupBy, the domain-weights groupBy (plans of
# the two aggregates; the count is a third full-scan job).
frac_before = docs.groupBy("source").count()
from deep_db_learning_spark.functions.exact_agg import exact_sum

dw_before = (
    docs.select("source", F.col("n_chars").cast("double").alias("score"))
    .where(F.col("score").isNotNull() & ~F.isnan("score"))
    .groupBy("source")
    .agg(exact_sum(F.col("score")).alias("s"), F.count("score").alias("n"))
)
write(
    "minhash_mixing_before.txt",
    "# r14 shape: THREE full-corpus driver jobs — docs.count() (plan\n"
    "# omitted: a bare count aggregate over the same scan), plus the\n"
    "# two grouped aggregates below, each its own collect job.\n"
    "# -- job 2: temperature_fractions' groupBy --",
    fmt(frac_before)
    + "\n# -- job 3: domain_weights' filtered groupBy --\n"
    + fmt(dw_before),
)

# AFTER: ONE unfiltered per-source aggregate carrying counts + the
# decimal fold (q_minhash_dedup's srows job); driver arithmetic via
# the shared _py twins.
srows_after = docs.groupBy("source").agg(
    F.count(F.lit(1)).alias("n_rows"),
    exact_sum(F.col("n_chars").cast("double")).alias("s"),
    F.count("n_chars").alias("n_score"),
)
write(
    "minhash_mixing_after.txt",
    "# r15 shape: ONE per-source aggregate job replaces all three —\n"
    "# row counts (sum to docs.count() exactly), the NULL-skipping\n"
    "# decimal n_chars fold, and the non-NULL score count, consumed by\n"
    "# temperature_fractions_py / domain_weights_from_stats on the\n"
    "# driver (bit-identical arithmetic, tests/test_r15_opt.py).",
    fmt(srows_after),
)

# ---- quality-filter epoch ----
from decimal import Decimal

import pandas as pd
from pyspark.sql.functions import pandas_udf

from deep_db_learning_spark.checkpoint import cut_lineage
from deep_db_learning_spark.functions.exact_agg import DECIMAL_TYPE
from deep_db_learning_spark.operators.quality_filter import (
    _grad_loss_np,
    doc_features,
)

lab = cut_lineage(
    docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        (F.col("source") == "src0").cast("double").alias("__y"),
    ),
    eager=True,
)
feats = cut_lineage(doc_features(docs, "text", "doc_id", 512), eager=True)


def gl_fn(z, y):
    g, loss = _grad_loss_np(z.to_numpy(), y.to_numpy())
    return pd.Series([[float(a), float(b)] for a, b in zip(g, loss)])


gl_fn.__annotations__ = {"z": pd.Series, "y": pd.Series, "return": pd.Series}
gl_kernel = pandas_udf(gl_fn, "array<double>")

wdf = spark.createDataFrame(
    [(b, Decimal(0)) for b in range(512)], "bucket bigint, w decimal(20,9)"
)
c_dec = F.col("c").cast("decimal(17,0)")
zfold = (
    feats.join(F.broadcast(wdf), "bucket")
    .groupBy("doc_id")
    .agg(F.sum(c_dec * F.col("w")).alias("__zf"))
)
zl = lab.join(zfold, "doc_id", "left").select(
    "doc_id",
    "__y",
    (
        F.lit(Decimal(0)).cast(DECIMAL_TYPE)
        + F.coalesce(
            F.col("__zf").cast(DECIMAL_TYPE), F.lit(0).cast(DECIMAL_TYPE)
        )
    ).cast("double").alias("__z"),
)
gl_plan = zl.withColumn("__gl", gl_kernel("__z", "__y")).select(
    "doc_id",
    F.get("__gl", 0).cast("decimal(20,9)").alias("__g"),
    F.get("__gl", 1).cast(DECIMAL_TYPE).alias("__l"),
)

# BEFORE: eager per-epoch checkpoint, then the total fold reads the
# materialized RDD — TWO jobs before the gradient collect.
gldf_eager = cut_lineage(gl_plan, eager=True)
tot_before = gldf_eager.agg(F.sum("__l").alias("loss"), F.sum("__g").alias("g0"))
write(
    "qfilter_epoch_before.txt",
    "# r14 shape, per epoch: job 1 = eager checkpoint of the gradient\n"
    "# frame (the full z-fold + Arrow kernel pipeline, plan as the\n"
    "# lazy-side file shows), THEN job 2 below — the total fold over\n"
    "# the already-materialized checkpoint scan (note: Scan\n"
    "# ExistingRDD, the work already spent).",
    fmt(tot_before),
)

# AFTER: the cut is LAZY — the same total fold's plan carries the
# whole pipeline and its single job materializes the checkpoint.
gldf_lazy = cut_lineage(gl_plan, eager=False)
tot_after = gldf_lazy.agg(F.sum("__l").alias("loss"), F.sum("__g").alias("g0"))
write(
    "qfilter_epoch_after.txt",
    "# r15 shape, per epoch: the cut is LAZY, so THIS single job is\n"
    "# both the materialization and the total fold — the z-fold join,\n"
    "# ArrowEvalPython kernel and decimal sums all visible in one\n"
    "# plan; the standalone checkpoint job is gone (jobs/epoch 3 -> 2;\n"
    "# fit-wide 39 -> 34). The gradient collect then reads the\n"
    "# persisted blocks exactly as before.",
    fmt(tot_after),
)
