"""Targeted 5-run re-measure of the three r12-drifted bench entries
(minhash_dedup, data_mixing, triangles) under the bench.py protocol
(same session conf, same warmup), with load provenance per entry."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("RUNS", "5"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("reband-r13")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    db = entry._db(spark, sf_dir)
    for t in db.get_tables():
        db.df(t).limit(1).count()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    def _w(s):
        return s

    _w.__annotations__ = {"s": pd.Series, "return": pd.Series}
    wf = pandas_udf(_w, "long")
    spark.range(64).repartition(int(cpus)).select(wf(col("id"))).count()

    names = sys.argv[1:] or ["minhash_dedup", "data_mixing", "triangles"]
    out = {}
    for name in names:
        fn = getattr(entry, "q_" + name)
        vals = []
        for _ in range(runs):
            l0 = os.getloadavg()[0]
            t0 = time.time()
            fn(spark, sf_dir).count()
            vals.append((round(time.time() - t0, 3), round(l0, 2)))
        ts = sorted(v[0] for v in vals)
        out[name] = {
            "min": ts[0], "median": ts[len(ts) // 2], "max": ts[-1],
            "runs": vals,
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
