"""Write-side layout (sources/layout.py): round-trip fidelity, range
clustering tightening row-group min/max spans, z-order serving BOTH
interleaved columns, and footer-level pruning evidence."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.sources import layout


@pytest.fixture(scope="module")
def lineitem(db):
    return db.df("lineitem")


def _span(path, col):
    return layout.clustering_span(path, col)


def test_roundtrip_and_range_clustering(lineitem, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    shuffled = str(base / "shuffled")
    clustered = str(base / "clustered")
    # adversarial baseline: shuffle rows so row-group stats are useless
    lineitem.orderBy(F.xxhash64("l_orderkey", "l_linenumber")).write.mode(
        "overwrite"
    ).parquet(shuffled)
    layout.write_clustered(
        lineitem, clustered, cluster_by=["l_extendedprice"], n_files=8
    )

    spark = lineitem.sparkSession
    a = spark.read.parquet(clustered)
    # layout changes order only, never the row multiset
    assert a.count() == lineitem.count()
    assert (
        a.exceptAll(lineitem).count() == 0
        and lineitem.exceptAll(a).count() == 0
    )

    tight = _span(clustered, "l_extendedprice")
    loose = _span(shuffled, "l_extendedprice")
    assert tight < 0.2  # each row group covers a narrow domain slice
    assert tight < loose / 3


def test_range_cluster_prunes_row_groups(lineitem, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout_prune")
    clustered = str(base / "c")
    layout.write_clustered(
        lineitem, clustered, cluster_by=["l_extendedprice"], n_files=8
    )
    lo, hi = 30000.0, 40000.0
    touched, total = layout.row_groups_touched(
        clustered, "l_extendedprice", lo, hi
    )
    assert total >= 8
    assert touched <= max(2, total // 4)  # a range hits ~its share
    # the skipped groups hide no matching rows
    n = (
        lineitem.sparkSession.read.parquet(clustered)
        .filter(F.col("l_extendedprice").between(lo, hi))
        .count()
    )
    assert n == lineitem.filter(
        F.col("l_extendedprice").between(lo, hi)
    ).count()


def test_zorder_serves_both_columns(lineitem, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout_z")
    zpath = str(base / "z")
    rpath = str(base / "r")
    cols = ["l_orderkey", "l_partkey"]
    layout.write_clustered(
        lineitem, zpath, cluster_by=cols, zorder=True, n_files=16
    )
    # single-column range clustering on l_orderkey as the contrast
    layout.write_clustered(
        lineitem, rpath, cluster_by=["l_orderkey"], n_files=16
    )
    # round trip
    spark = lineitem.sparkSession
    assert spark.read.parquet(zpath).exceptAll(lineitem).count() == 0

    # z-order: BOTH dimensions get sub-unit spans; range clustering
    # leaves the non-leading column at ~full span per row group
    z_a, z_b = _span(zpath, cols[0]), _span(zpath, cols[1])
    r_b = _span(rpath, cols[1])
    assert z_a < 0.6 and z_b < 0.6
    assert r_b > 0.8
    assert z_b < r_b / 2


def test_partition_by_composes(lineitem, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout_part")
    p = str(base / "p")
    layout.write_clustered(
        lineitem.withColumn("rf", F.col("l_returnflag")),
        p,
        cluster_by=["l_extendedprice"],
        partition_by=["rf"],
        n_files=4,
    )
    spark = lineitem.sparkSession
    df = spark.read.parquet(p).filter(F.col("rf") == "R")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    assert df.count() == lineitem.filter(F.col("l_returnflag") == "R").count()


def test_morton_key_validation():
    with pytest.raises(ValueError):
        layout.morton_key(["a"], [(0, 1)])
    with pytest.raises(ValueError):
        layout.morton_key(["a", "b"], [(0, 1)])
