"""Feature engineering (functions/feature_eng.py): out-of-fold target
encoding against a decimal-exact python twin (bitwise), leakage
structure, NULL semantics, and exact-quantile binning."""

from collections import defaultdict
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from deep_db_learning_spark.functions.feature_eng import (
    bin_by_quantiles,
    target_encode_oof,
)
from deep_db_learning_spark.functions.hashing import knuth_hash_py
from deep_db_learning_spark.plans.train_oracle import _dec9

K, SMOOTH, SEED = 3, 10.0, 42


def _twin(rows, cat_key, target_key, id_key):
    s = defaultdict(lambda: Decimal(0))
    n = defaultdict(int)
    folds = {}
    for r in rows:
        f = knuth_hash_py(r[id_key], SEED) % K
        folds[r[id_key]] = f
        if r[target_key] is not None:
            s[(r[cat_key], f)] += _dec9(r[target_key])
            n[(r[cat_key], f)] += 1
    s_all, n_all = sum(s.values()), sum(n.values())
    want = {}
    for r in rows:
        c, f = r[cat_key], folds[r[id_key]]
        s_cat = sum((v for (cc, _), v in s.items() if cc == c), Decimal(0))
        n_cat = sum(v for (cc, _), v in n.items() if cc == c)
        s_fold = sum((v for (_, ff), v in s.items() if ff == f), Decimal(0))
        n_fold = sum(v for (_, ff), v in n.items() if ff == f)
        oof_s = float(s_cat - s[(c, f)])
        oof_n = float(n_cat - n[(c, f)])
        if n_all > n_fold:
            prior = float(s_all - s_fold) / float(n_all - n_fold)
        else:  # degenerate: this fold holds every non-null target
            prior = float(s_all) / float(n_all)
        want[r[id_key]] = (oof_s + SMOOTH * prior) / (oof_n + SMOOTH)
    return want


def test_target_encode_matches_python_twin_bitwise(db):
    cust = db.df("customer")
    enc = target_encode_oof(
        cust, "c_mktsegment", "c_acctbal", "c_custkey", k=K,
        smoothing=SMOOTH, seed=SEED,
    )
    got = {r["c_custkey"]: r["c_mktsegment_te"] for r in enc.collect()}
    rows = [
        r.asDict()
        for r in cust.select("c_custkey", "c_mktsegment", "c_acctbal").collect()
    ]
    want = _twin(rows, "c_mktsegment", "c_acctbal", "c_custkey")
    assert got == want  # bitwise: decimal folds + identical double math
    # schema: original columns preserved + one new column
    assert set(enc.columns) == set(cust.columns) | {"c_mktsegment_te"}
    assert enc.count() == cust.count()


def test_target_encode_is_leakage_free(spark):
    # a category whose folds have wildly different targets: each row's
    # encoding must exclude its OWN fold's contribution
    rows = [Row(id=i, c="x", y=float(knuth_hash_py(i, SEED) % K == 0) * 100.0)
            for i in range(60)]
    df = spark.createDataFrame(rows)
    enc = {r["id"]: r["c_te"]
           for r in target_encode_oof(df, "c", "y", "id", k=K).collect()}
    want = _twin([r.asDict() for r in rows], "c", "y", "id")
    assert enc == want
    # fold-0 rows (y=100) see a LOWER encoding than others: their own
    # high fold is excluded
    f0 = [v for i, v in enc.items() if knuth_hash_py(i, SEED) % K == 0]
    f1 = [v for i, v in enc.items() if knuth_hash_py(i, SEED) % K != 0]
    assert max(f0) < min(f1)


def test_target_encode_null_category_and_null_target(spark):
    rows = [
        Row(id=1, c=None, y=1.0),
        Row(id=2, c=None, y=3.0),
        Row(id=3, c="a", y=None),   # contributes nothing, still encoded
        Row(id=4, c="a", y=5.0),
    ]
    enc = {r["id"]: r["c_te"]
           for r in target_encode_oof(spark.createDataFrame(rows), "c", "y", "id", k=K).collect()}
    assert len(enc) == 4 and all(v is not None for v in enc.values())
    want = _twin([r.asDict() for r in rows], "c", "y", "id")
    assert enc == want


def test_bin_by_quantiles_equal_frequency(db):
    li = db.df("lineitem")
    out = bin_by_quantiles(li, "l_extendedprice", n_bins=4)
    counts = {r["l_extendedprice_bin"]: r["cnt"]
              for r in out.groupBy("l_extendedprice_bin")
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n = li.count()
    assert set(counts) == {0, 1, 2, 3}
    for b, c in counts.items():
        assert abs(c - n / 4) <= n * 0.02 + 4, (b, c)
    # python twin: rank formula floor(p*(N-1))+1 over the sorted values
    vals = sorted(r[0] for r in li.select("l_extendedprice").collect())
    cuts = [vals[int(p * (len(vals) - 1))] for p in (0.25, 0.5, 0.75)]
    got = {r["l_extendedprice"]: r["l_extendedprice_bin"]
           for r in out.select("l_extendedprice", "l_extendedprice_bin")
           .distinct().collect()}
    for v, b in got.items():
        assert b == sum(v > c for c in cuts), (v, b)


def test_bin_nulls_stay_null(spark):
    df = spark.createDataFrame(
        [Row(x=float(i)) for i in range(20)] + [Row(x=None)]
    )
    out = bin_by_quantiles(df, "x", n_bins=2)
    assert out.filter(F.col("x").isNull()).first()["x_bin"] is None


def test_winsorize_matches_duckdb_twin(db, duck):
    from deep_db_learning_spark.functions.feature_eng import winsorize

    out = winsorize(
        db.df("lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_extendedprice", 0.05, 0.95,
    )
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["l_extendedprice_wins"])
        for r in out.collect()
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                """
        WITH vals AS (
          SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
          WHERE l_extendedprice IS NOT NULL
        ), ranked AS (
          SELECT v, row_number() OVER (ORDER BY v) AS rn FROM vals
        ), n AS (SELECT count(*) AS n FROM vals),
        cuts AS (
          SELECT
            (SELECT v FROM ranked, n
             WHERE rn = CAST(floor(0.05 * (n.n - 1)) AS BIGINT) + 1) AS lo,
            (SELECT v FROM ranked, n
             WHERE rn = CAST(floor(0.95 * (n.n - 1)) AS BIGINT) + 1) AS hi
        )
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_extendedprice IS NULL THEN NULL
                    ELSE least(greatest(l_extendedprice, lo), hi) END
        FROM lineitem, cuts
        """
            ).fetchall(),
        )
    )
    assert got == want
    # tails actually clamped
    hi = max(g[2] for g in got)
    assert hi < db.df("lineitem").agg({"l_extendedprice": "max"}).first()[0]


def test_robust_scale_semantics(spark):
    from deep_db_learning_spark.functions.feature_eng import robust_scale

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)] + [(10_000.0,)], "x double"
    )
    out = {r["x"]: r["x_rs"] for r in robust_scale(df, "x").collect()}
    # median of 1..100 + outlier = 51 (rank floor(.5*100)+1), IQR = 76-26
    assert out[51.0] == 0.0
    assert abs(out[10_000.0]) > 100  # outlier scales far out
    # constant column -> NULL, not a crash
    const = spark.createDataFrame([(5.0,)] * 10, "x double")
    assert all(
        r["x_rs"] is None for r in robust_scale(const, "x").collect()
    )
