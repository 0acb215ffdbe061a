"""Graph-insight pipeline — the r8 analytics surfaces composed the way
a warehouse team actually runs them, fact table → co-occurrence graph
→ structure → actionable rules:

    lineitem ──► part co-purchase graph (triangles.cooccurrence_edges;
                 too-wide baskets EXCLUDED-AND-REPORTED, never joined
                 quadratically)
       graph ──► exact triangle counts + clustering coefficients
                 (degree-oriented wedge join, O(m^1.5))
             ──► k-core backbone at the median degree (fixed-round
                 peeling — monotone, so extra rounds are free)
       rules ──► pairwise association rules (support/confidence/lift)
                 restricted to backbone items — rules between
                 well-connected products, not one-off baskets
        plan ──► join-key skew report on l_partkey (the heaviest keys
                 + skew factor that decide plain-join vs AQE-skew vs
                 salting for the NEXT pipeline that joins on it)

    python examples/graph_insights.py --data /root/testdata/sf0.001

Prints one JSON summary line; returns the dict from ``run`` for tests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/root/testdata/sf0.001")
    p.add_argument("--k-core", type=int, default=None,
                   help="core threshold (default: half the median "
                        "degree — dense co-purchase graphs collapse "
                        "entirely at the median itself)")
    p.add_argument("--min-pair-groups", type=int, default=2)
    return p


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators.basket import (
        pair_association_rules,
    )
    from deep_db_learning_spark.operators.kcore import k_core
    from deep_db_learning_spark.operators.triangles import (
        cooccurrence_edges,
        triangle_stats,
    )
    from deep_db_learning_spark.profiling.profiler import key_skew_report
    from deep_db_learning_spark.sources import load_testdata

    db = load_testdata(spark, args.data)
    li = db.df("lineitem")

    edges, hot = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    n_hot = hot.count()

    stats = triangle_stats(edges)
    top_clustered = [
        (r["node"], r["n_triangles"], r["clustering"])
        for r in stats.orderBy(
            F.desc("n_triangles"), F.asc("node")
        ).limit(3).collect()
    ]
    n_triangles = stats.agg(F.sum("n_triangles")).first()[0] // 3

    if args.k_core is None:
        # half the median degree via the exact no-sort order statistic
        # (co-purchase graphs are dense: peeling at the median itself
        # cascades to an empty core)
        from deep_db_learning_spark.operators.sketch import exact_quantiles

        args.k_core = int(
            exact_quantiles(stats, "degree", [0.5]).first()["value"] / 2
        )
    core = k_core(edges, args.k_core, iters=8)
    core_ids = core.select(F.col("node").alias("__c"))
    n_core = core.count()

    rules, _ = pair_association_rules(
        li, "l_orderkey", "l_partkey",
        min_pair_groups=args.min_pair_groups,
    )
    backbone_rules = (
        rules.join(
            F.broadcast(core_ids), rules.antecedent == F.col("__c"), "leftsemi"
        ).join(
            F.broadcast(core_ids), rules.consequent == F.col("__c"), "leftsemi"
        )
    )
    top_rule = (
        backbone_rules.orderBy(
            F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
        ).limit(1).collect()
    )

    skew = key_skew_report(li, "l_partkey", k=5).collect()
    max_skew = max(r["skew_factor"] for r in skew)

    return {
        "n_edges": edges.count(),
        "n_hot_baskets": n_hot,
        "n_triangles": int(n_triangles),
        "top_clustered": top_clustered,
        "k_core": args.k_core,
        "core_size": n_core,
        "n_backbone_rules": backbone_rules.count(),
        "top_rule": (
            {
                "antecedent": top_rule[0]["antecedent"],
                "consequent": top_rule[0]["consequent"],
                "confidence": top_rule[0]["confidence"],
                "lift": top_rule[0]["lift"],
            }
            if top_rule
            else None
        ),
        "l_partkey_max_skew_factor": max_skew,
    }


def main() -> None:
    from deep_db_learning_spark.session import make_session

    args = build_parser().parse_args()
    spark = make_session("graph-insights")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, args), default=str))


if __name__ == "__main__":
    main()
