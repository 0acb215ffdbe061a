"""Extended TPC-H shapes (plans/tpch_suite.py) vs their DuckDB twins —
the same canonical hash the driver uses (sorted columns, sorted rows,
repr-level floats via tools/selfcheck.canon_rows)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
from tools.selfcheck import canon_rows  # noqa: E402

from deep_db_learning_spark.plans import tpch_suite  # noqa: E402


@pytest.mark.parametrize("name", sorted(tpch_suite.QUERIES))
def test_matches_duckdb_twin(name, db, duck):
    sdf = tpch_suite.QUERIES[name](db)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(tpch_suite.ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    sh, slines = canon_rows(scols, srows)
    oh, olines = canon_rows(ocols, orows)
    bad = [(a, b) for a, b in zip(slines, olines) if a != b][:3]
    assert sh == oh, (name, bad)


def test_every_query_returns_rows(db):
    # smoke: none of the predicate adaptations filtered to empty at
    # sf0.001 (an empty result would make the twin comparison vacuous)
    for name, fn in tpch_suite.QUERIES.items():
        n = fn(db).count()
        assert n > 0, name


@pytest.fixture(scope="module")
def db01(spark):
    from deep_db_learning_spark.sources import load_testdata

    return load_testdata(spark, "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(tpch_suite.QUERIES))
def test_matches_duckdb_twin_sf001(name, db01, duck01):
    """Second-SF pin: the same hash match at 10x the smoke data — a
    predicate that only passes because a small-SF edge case is absent
    (empty band, single supplier, all-ties) fails here."""
    sdf = tpch_suite.QUERIES[name](db01)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck01.execute(tpch_suite.ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows) > 0, (name, len(srows), len(orows))
    sh, _ = canon_rows(scols, srows)
    oh, _ = canon_rows(ocols, orows)
    assert sh == oh, name
