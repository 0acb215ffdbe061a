"""Self-check mirroring the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares
row-count, column names, and a canonical value hash (columns sorted by
name, rows sorted, floats rounded to 6 significant-ish decimals).

Both results are ALSO materialized through pandas (Spark
``toPandas()``, DuckDB ``fetchdf()``) to reproduce the driver's hash
path: DuckDB coerces HUGEINT (integer window/group sums) to float64
there, so an uncast ``sum()`` hashes as "7.0" against Spark's "7" at
the driver even when ``fetchall()`` values are bit-identical (the r3
``events_sessions`` false-green). An int-vs-float pandas dtype-kind
mismatch between the two frames is a FAIL here; symmetric NULL
promotion (both sides float64) is not.

Usage: python tools/selfcheck.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def dtype_coercion_problems(spark_pdf, oracle_pdf):
    """Integer<->float dtype-KIND mismatches between the two pandas
    frames the driver's hasher actually compares (Spark ``toPandas()``
    vs DuckDB ``fetchdf()``): an asymmetric promotion means "7" vs
    "7.0" and a red hash even when raw values are identical.

    NULL-promotion (nullable int -> float64 + NaN) is symmetric — both
    engines promote the same column for the same data — so it never
    trips this (r3 evidence: ``events_temporal_join.conversions``,
    nullable BIGINT, driver-green). DuckDB HUGEINT (any uncast integer
    sum) promotes to float64 on the oracle side ONLY — that is the
    class that made ``events_sessions`` driver-red while ``fetchall()``
    values matched bit-for-bit. Decimal is also benign: Spark lands it
    as object(Decimal), DuckDB as float64, and every decimal query is
    driver-green, so only {int,float} kind pairs are flagged.
    """
    problems = []
    for col in oracle_pdf.columns:
        if col not in spark_pdf.columns:
            continue
        sk = spark_pdf[col].dtype.kind  # i/u int, f float, O object, M datetime
        ok_ = oracle_pdf[col].dtype.kind
        if (sk in "iu" and ok_ == "f") or (sk == "f" and ok_ in "iu"):
            problems.append(
                f"dtype coercion on '{col}': spark pandas {spark_pdf[col].dtype}"
                f" vs oracle pandas {oracle_pdf[col].dtype}"
                " (uncast HUGEINT sum? wrap the oracle in CAST(... AS BIGINT))"
            )
    return problems


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # recomputed oracles (train_relational's GD twin) read parquet
    # directly; point them at the SF under check
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # second materialization through pandas — one half of the
            # driver's hash path (costs a re-execution; audit tool)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{el:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # second fetch through pandas — the driver's hash path
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = dtype_coercion_problems(spdf, odf)
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sh, sl = canon_rows(scols, srows)
            oh, ol = canon_rows(ocols, orows)
            if sh != oh:
                diff = [
                    (a, b) for a, b in zip(sl, ol) if a != b
                ][:3]
                problems.append(f"hash mismatch; first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows [{el:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAILED")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
