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
