from pyspark.sql import functions as F

from deep_db_learning_spark.plans import minimum_slice
from deep_db_learning_spark.plans.metrics import regression_metrics


def test_minimum_slice_classification(db):
    res = minimum_slice(
        db.tables,
        db.primary_keys,
        db.foreign_keys,
        target=("customer", "c_mktsegment"),
        depth=1,
    )
    # target typed cat by force, features exist for every customer
    assert res.schema["customer"].columns["c_mktsegment"].type == "cat"
    assert res.features.count() == 150
    assert "label" in res.features.columns and "split" in res.features.columns
    # a fitted model produced an accuracy on the held-out split
    assert 0.0 <= res.metrics["accuracy"] <= 1.0
    assert res.metrics["n"] > 0


def test_two_hop_features_widen(db):
    res1 = minimum_slice(
        db.tables, db.primary_keys, db.foreign_keys,
        target=("customer", "c_mktsegment"), depth=1, fit_model=False,
    )
    res2 = minimum_slice(
        db.tables, db.primary_keys, db.foreign_keys,
        target=("customer", "c_mktsegment"), depth=2, fit_model=False,
    )
    # 2-hop receptive field yields strictly more feature columns
    assert len(res2.features.columns) > len(res1.features.columns)


def test_regression_metrics(spark):
    df = spark.createDataFrame(
        [(1.0, 1.5), (2.0, 2.0), (3.0, 2.5)], "label double, prediction double"
    )
    m = regression_metrics(df)
    assert abs(m["mse"] - ((0.5 ** 2 + 0 + 0.5 ** 2) / 3)) < 1e-9
    assert abs(m["mae"] - (1.0 / 3)) < 1e-9
    assert m["n"] == 3


def test_database_set_filters(db):
    sub = db.filter_tables(include=["customer", "orders", "nation"], exclude=["nation"])
    assert sub.get_tables() == {"customer", "orders"}
    assert sub.get_primary_key("customer") == {"c_custkey"}
    nocol = db.filter_columns([("customer", "c_name")])
    assert "c_name" not in nocol.df("customer").columns
    assert "c_name" in db.df("customer").columns


def test_minimum_slice_mlp_decoder(db):
    res = minimum_slice(
        db.tables,
        db.primary_keys,
        db.foreign_keys,
        target=("customer", "c_mktsegment"),
        depth=1,
        decoder="mlp",
    )
    assert 0.0 <= res.metrics["accuracy"] <= 1.0


def test_bucketed_checkpoint_joins_without_shuffle(spark, db, tmp_path):
    from deep_db_learning_spark.sources.catalog import bucketed_checkpoint

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = bucketed_checkpoint(
            db.df("orders").select("o_orderkey", "o_custkey", "o_totalprice"),
            "bt_orders",
            ["o_custkey"],
            n_buckets=4,
        )
        cust = bucketed_checkpoint(
            db.df("customer").select("c_custkey", "c_mktsegment"),
            "bt_customer",
            ["c_custkey"],
            n_buckets=4,
        )
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located buckets: no shuffle
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_customer")


def test_minimum_slice_logs_to_tracker(db, tmp_path):
    from deep_db_learning_spark.plans import minimum_slice
    from deep_db_learning_spark.plans.tracking import ExperimentTracker, load_runs

    path = str(tmp_path / "slice.jsonl")
    with ExperimentTracker(path, "slice", modes={"accuracy": "max"}) as tr:
        minimum_slice(
            db.tables, db.primary_keys, db.foreign_keys,
            target=("customer", "c_mktsegment"), depth=1, tracker=tr,
        )
    events = load_runs(path)
    kinds = [e["kind"] for e in events]
    assert kinds == ["params", "metrics", "best"]
    assert events[0]["params"]["target"] == "customer.c_mktsegment"
    assert 0.0 <= events[-1]["metrics"]["accuracy"] <= 1.0


def test_minimum_slice_regression(db):
    from deep_db_learning_spark.plans import minimum_slice

    res = minimum_slice(
        db.tables,
        db.primary_keys,
        db.foreign_keys,
        target=("customer", "c_acctbal"),
        depth=1,
        task="regression",
    )
    m = res.metrics
    assert set(m) >= {"mse", "mae", "nrmse"}
    assert m["mse"] >= 0 and m["mae"] >= 0
    # the schema analyzer honored the forced num target type
    assert res.schema["customer"].columns["c_acctbal"].type == "num"


def test_minimum_slice_regression_depth2_no_label_leak(db):
    """At depth 2 with reverse edges the target column would round-trip
    into the features (target -> neighbor -> target) without the
    exclude guard; a leak shows up as implausibly-perfect test MSE."""
    from deep_db_learning_spark.plans import minimum_slice

    res = minimum_slice(
        db.tables,
        db.primary_keys,
        db.foreign_keys,
        target=("customer", "c_acctbal"),
        depth=2,
        task="regression",
    )
    # c_acctbal is ~uniform noise w.r.t. the relational neighborhood:
    # genuine features cannot explain it; the label itself could
    label_var = (
        db.df("customer")
        .agg(F.var_pop("c_acctbal").alias("v"))
        .first()["v"]
    )
    assert res.metrics["mse"] > 0.5 * label_var


def test_cut_lineage_warns_on_uncleaned_checkpoint_dir(spark, tmp_path):
    """Cluster posture without cleanCheckpoints: reliable checkpoint
    files outlive frame GC (ADVICE r4) — cut_lineage must say so once
    instead of silently leaking the checkpoint dir."""
    import warnings

    from deep_db_learning_spark import checkpoint as cp

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # test session has no dir
    assert (
        sc.getConf().get("spark.cleaner.referenceTracking.cleanCheckpoints", "false")
        != "true"
    )
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    old_flag = cp._WARNED_UNCLEANED
    try:
        cp._WARNED_UNCLEANED = False
        df = spark.range(10)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = cp.cut_lineage(df, eager=True)
            assert out.count() == 10
            msgs = [x for x in w if "cleanCheckpoints" in str(x.message)]
            assert len(msgs) == 1
            # one-time: a second call stays quiet
            cp.cut_lineage(spark.range(5), eager=True).count()
            msgs = [x for x in w if "cleanCheckpoints" in str(x.message)]
            assert len(msgs) == 1
    finally:
        cp._WARNED_UNCLEANED = old_flag
        # restore the local posture for the rest of the session-scoped
        # fixture (a lingering dir would flip every later cut_lineage
        # to reliable checkpoints)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
        assert sc.getCheckpointDir() is None
