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
