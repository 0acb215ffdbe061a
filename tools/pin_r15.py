"""Capture r15 plan pins: the REAL iteration-body plans of the
iterative graph operators (VERDICT r14 asked for exactly this — the
checkpoint cadence otherwise hides the loop behind an RDD scan).

Wraps the operator modules' cut_lineage/cut_count so every
pre-checkpoint frame is captured as it is cut, then pins:

  pagerank_iter  — the 2nd checkpointed update frame (a steady-state
                   iteration chain built on checkpointed state)
  kcore_peel     — the 2nd peel round's pre-cut frame
  cooc_edges     — the co-occurrence pair build (pre canonical_cut)
  triangles_wedge_probe — the wedge join + closing probe frame

Usage: python tools/pin_r15.py <import_root> <outdir> <suffix>
e.g.   python tools/pin_r15.py /root/repo plans/r15 _after
"""
from __future__ import annotations

import os
import sys

root, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, root)
os.makedirs(outdir, exist_ok=True)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("pin-r15")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def explain_string(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pin(name: str, df) -> None:
    path = os.path.join(outdir, f"{name}{suffix}.txt")
    with open(path, "w") as f:
        f.write(explain_string(df))
    print(f"pinned {path}")


import __spark_entry__ as entry  # noqa: E402
from deep_db_learning_spark.operators import kcore as kcore_mod  # noqa: E402
from deep_db_learning_spark.operators import pagerank as pr_mod  # noqa: E402
from deep_db_learning_spark.operators.triangles import (  # noqa: E402
    _triangles_from_und,
    canonical_cut,
    cooccurrence_edges,
)

sf_dir = "/root/testdata/sf0.1"
db = entry._db(spark, sf_dir)
for t in db.get_tables():
    db.df(t).limit(1).count()


def wrap_cuts(mod, captured: list):
    """Record every frame the module cuts, pre-cut."""
    orig_cl = mod.cut_lineage

    def cl(df, **kw):
        captured.append(df)
        return orig_cl(df, **kw)

    mod.cut_lineage = cl
    orig_cc = getattr(mod, "cut_count", None)
    if orig_cc is not None:
        def cc(df):
            captured.append(df)
            return orig_cc(df)

        mod.cut_count = cc
    return orig_cl, orig_cc


# --- pagerank iteration body ---
cap: list = []
wrap_cuts(pr_mod, cap)
entry.q_pagerank(spark, sf_dir)
# cap holds the frames pagerank cut, in order: static frames first,
# then the checkpointed update frames; take the LAST (the final
# iteration's pre-cut chain, built on checkpointed state)
pin("pagerank_iter", cap[-1])

# --- kcore peel round ---
cap2: list = []
wrap_cuts(kcore_mod, cap2)
entry.q_kcore(spark, sf_dir)
pin("kcore_peel", cap2[-1])

# --- co-occurrence pair build + wedge probe ---
edges, _hot = cooccurrence_edges(db.df("lineitem"), "l_orderkey", "l_partkey")
pin("cooc_edges", edges)
und = canonical_cut(edges)
pin("triangles_wedge_probe", _triangles_from_und(und))

spark.stop()
