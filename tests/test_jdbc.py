"""JDBC plumbing (sources/catalog.py load_jdbc) — no driver jar ships
in this container, so the live path cannot run; these tests assert the
exact reader configuration through a recording fake injected via
``reader_factory`` (the same seam production uses for pre-configured
readers)."""

from deep_db_learning_spark.sources import load_jdbc


class FakeReader:
    def __init__(self, spark, calls):
        self.spark = spark
        self.calls = calls
        self.fmt = None
        self.opts = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.calls.append((self.fmt, dict(self.opts)))
        return self.spark.createDataFrame([], "id bigint")


def test_load_jdbc_reader_options(spark):
    calls = []
    db = load_jdbc(
        spark,
        url="jdbc:mysql://db.example.com:3306/ctu",
        tables=["customer", "orders"],
        properties={"user": "reader", "fetchsize": "10000"},
        custom_schemas={"customer": "c_custkey BIGINT, c_acctbal DECIMAL(12,2)"},
        partition_options={
            "orders": {
                "partitionColumn": "o_orderkey",
                "lowerBound": "0",
                "upperBound": "1500000",
                "numPartitions": "32",
            }
        },
        reader_factory=lambda: FakeReader(spark, calls),
    )
    assert set(db.get_tables()) == {"customer", "orders"}
    by_table = {opts["dbtable"]: (fmt, opts) for fmt, opts in calls}

    fmt, cust = by_table["customer"]
    assert fmt == "jdbc"
    assert cust["url"] == "jdbc:mysql://db.example.com:3306/ctu"
    assert cust["user"] == "reader" and cust["fetchsize"] == "10000"
    # the reference's explicit dtype mapping rides customSchema
    assert cust["customSchema"] == "c_custkey BIGINT, c_acctbal DECIMAL(12,2)"
    assert "partitionColumn" not in cust

    _, orders = by_table["orders"]
    assert "customSchema" not in orders
    # the parallel range-scan shape for big tables
    assert orders["partitionColumn"] == "o_orderkey"
    assert orders["numPartitions"] == "32"
    assert orders["lowerBound"] == "0" and orders["upperBound"] == "1500000"


def test_load_jdbc_default_factory_is_spark_read(spark):
    # without an injected factory the path goes through spark.read and
    # fails only at load() for want of a driver jar — the option
    # plumbing above is exactly what a real cluster would send
    import pytest

    with pytest.raises(Exception):
        load_jdbc(spark, "jdbc:mysql://nope/db", ["t"]).df("t").count()
