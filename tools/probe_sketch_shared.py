"""A/B at 10× (VERDICT r14 item 5): q_sketches as-is vs a variant
where kmv and hll share ONE md5 pass + ONE distinct-hash frame.

The kmv synopsis is the bottom-k of the DISTINCT hashes and the HLL
register max is duplicate-invariant, so both estimators are exact
functions of the distinct-hash set — a shared cut computes md5 once
and dedups once instead of twice. At sf0.1 the extra materialization
job measured as a loss (r14 probe); this re-asks at 10× lineitem,
where two full scans + two dedup shuffles cost real bytes.

Usage: python tools/probe_sketch_shared.py   (generates 10x if absent)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/spark_graft_scale10x")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(f"{DST}/lineitem.parquet"):
    # scaleprobe runs main() under an import guard; reuse generate()
    src = open("/root/repo/tools/scaleprobe.py").read()
    ns = {
        "__name__": "scaleprobe_mod",
        "__file__": "/root/repo/tools/scaleprobe.py",
    }
    exec(compile(src, "scaleprobe.py", "exec"), ns)
    ns["generate"](spark)
    print("generated 10x", flush=True)

import __spark_entry__ as e
from deep_db_learning_spark.checkpoint import cut_lineage
from deep_db_learning_spark.functions.hashing import md5_hash60
from deep_db_learning_spark.operators import sketch
from deep_db_learning_spark.operators.sketch import SKETCH_CONFIG, dlit


def sketches_shared(spark, sf_dir):
    """q_sketches with kmv+hll over one shared distinct-hash cut."""
    db = e._db(spark, sf_dir)
    li = db.df("lineitem")
    ev = db.df("events")
    k = SKETCH_CONFIG["kmv_k"]
    m = SKETCH_CONFIG["hll_m"]
    cap = SKETCH_CONFIG["hll_rho_cap"]
    width = SKETCH_CONFIG["hll_rest_bits"]
    hs = cut_lineage(
        li.where(F.col("l_orderkey").isNotNull())
        .select(md5_hash60(F.col("l_orderkey").cast("string")).alias("h"))
        .groupBy("h")
        .agg(F.lit(1))
        .select("h"),
        eager=True,
    )
    numer = float((k - 1) * 2**60)
    kmv = (
        hs.orderBy("h").limit(k)
        .agg(F.count("*").alias("k_used"), F.max("h").alias("kth"))
        .select(
            F.lit("kmv").alias("mode"),
            F.lit("l_orderkey").alias("key"),
            F.col("kth").alias("ival"),
            F.col("k_used").alias("ival2"),
            F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
            .otherwise(F.expr(dlit(numer)) / F.col("kth").cast("double"))
            .alias("dval"),
        )
    )
    bits = sketch._bits_ladder_sql("rest", width)
    hnumer = sketch._hll_alpha(m) * m * m * float(2**cap)
    regs = (
        hs.select((F.col("h") % m).alias("b"), F.expr(f"h div {m}").alias("rest"))
        .select(
            "b",
            F.least(F.lit(width + 1) - F.expr(bits), F.lit(cap)).alias("rho"),
        )
        .groupBy("b")
        .agg(F.max("rho").alias("rho"))
    )
    full = spark.range(m).select(F.col("id").alias("b"))
    hll = (
        full.join(regs, "b", "left")
        .select("b", F.coalesce("rho", F.lit(0)).cast("int").alias("rho"))
        .agg(
            F.sum(
                F.expr(
                    f"CAST(shiftleft(CAST(1 AS BIGINT), {cap} - rho) AS BIGINT)"
                )
            ).alias("intsum"),
            F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("zero_regs"),
        )
        .select(
            F.lit("hll").alias("mode"),
            F.lit("l_orderkey").alias("key"),
            F.col("intsum").alias("ival"),
            F.col("zero_regs").alias("ival2"),
            (F.expr(dlit(hnumer)) / F.col("intsum").cast("double")).alias("dval"),
        )
    )
    cms = sketch.cms_heavy_hitters(ev, "user_id", threshold=10).select(
        F.lit("cms").alias("mode"), F.col("item").alias("key"),
        F.col("est").alias("ival"), F.col("exact").alias("ival2"),
        F.lit(None).cast("double").alias("dval"),
    )
    qt = sketch.exact_quantiles(
        li, "l_extendedprice", [0.25, 0.5, 0.75, 0.95, 0.99]
    ).select(
        F.lit("quantile").alias("mode"),
        F.concat(F.lit("p="), F.col("p").cast("string")).alias("key"),
        F.col("rank").alias("ival"),
        F.lit(None).cast("bigint").alias("ival2"),
        F.col("value").alias("dval"),
    )
    ks = cut_lineage(
        sketch.kmv_set_estimates(db.df("orders"), "o_custkey", ev, "user_id", k=256),
        eager=True,
    )
    kset = (
        ks.select(F.lit("kmv_set").alias("mode"), F.lit("union").alias("key"),
                  F.col("kth").alias("ival"), F.col("k_used").alias("ival2"),
                  F.col("union_est").alias("dval"))
        .unionByName(ks.select(F.lit("kmv_set").alias("mode"), F.lit("jaccard").alias("key"),
                               F.col("n_common").alias("ival"), F.col("k_used").alias("ival2"),
                               F.col("jaccard_est").alias("dval")))
        .unionByName(ks.select(F.lit("kmv_set").alias("mode"), F.lit("intersect").alias("key"),
                               F.col("n_common").alias("ival"), F.col("k_used").alias("ival2"),
                               F.col("intersect_est").alias("dval")))
    )
    gq = sketch.grouped_quantiles(li, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.9]).select(
        F.lit("gquantile").alias("mode"),
        F.concat(F.col("l_returnflag"), F.lit(":p="), F.col("p").cast("string")).alias("key"),
        F.col("rank").alias("ival"),
        F.lit(None).cast("bigint").alias("ival2"),
        F.col("value").alias("dval"),
    )
    hb = sketch.hll_distinct_by(li, "l_returnflag", "l_orderkey").select(
        F.lit("hll_by").alias("mode"), F.col("l_returnflag").alias("key"),
        F.col("intsum").alias("ival"), F.col("zero_regs").alias("ival2"),
        F.col("est").alias("dval"),
    )
    return (
        kmv.unionByName(hll).unionByName(cms).unionByName(qt)
        .unionByName(kset).unionByName(gq).unionByName(hb)
    )


def timed(tag, fn, runs=3):
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 2))
    print(f"{tag}: {sorted(ts)}", flush=True)


# result parity first (cheap, at sf0.1)
cur = sorted(map(tuple, e.q_sketches(spark, SRC).collect()))
shr = sorted(map(tuple, sketches_shared(spark, SRC).collect()))
print("parity at sf0.1:", cur == shr, flush=True)

for sf_dir, tag in ((SRC, "sf0.1"), (DST, "x10")):
    timed(f"current@{tag}", lambda: e.q_sketches(spark, sf_dir).count())
    timed(f"shared @{tag}", lambda: sketches_shared(spark, sf_dir).count())
