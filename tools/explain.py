"""Dump the formatted physical plan of any driver-contract query.

    python tools/explain.py tpch_q6 [sf_dir]
    python tools/explain.py --all          # one-line plan summary each

The summary flags the scale-posture signals tests/test_plans.py pins:
pushed filters, read-schema width, broadcast joins, partial
aggregation, and Python (Arrow) evaluation nodes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_string(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def summarize(plan: str) -> str:
    flags = []
    if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
        flags.append("pushdown")
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    if reads:
        width = max(l.count(":") for l in reads)
        flags.append(f"read<={width}cols")
    if "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan:
        flags.append("broadcast-join")
    if "partial_" in plan:
        flags.append("partial-agg")
    if "SortMergeJoin" in plan:
        flags.append("smj")
    if "ArrowEvalPython" in plan or "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan:
        flags.append("arrow-udf")
    if "Exchange" in plan:
        flags.append(f"exchanges={plan.count('Exchange ')}")
    return ", ".join(flags) or "trivial"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    show_all = "--all" in sys.argv
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    if show_all:
        for name, fn in qs.items():
            try:
                print(f"{name:32s} {summarize(explain_string(fn(spark, sf_dir)))}")
            except Exception as exc:  # noqa: BLE001 - diagnostic tool
                print(f"{name:32s} ERROR {type(exc).__name__}")
        return
    if not args:
        print(__doc__)
        print("available:", ", ".join(qs))
        return
    print(explain_string(qs[args[0]](spark, sf_dir)))


if __name__ == "__main__":
    main()
