from deep_db_learning_spark.schema import (
    ColumnSpec,
    DBSchema,
    ForeignKey,
    TableSpec,
    tpch_primary_keys,
    tpch_star_schema_fks,
)


def test_json_round_trip():
    schema = DBSchema(
        tables={
            "customer": TableSpec(
                columns={
                    "c_custkey": ColumnSpec("omit", key=True),
                    "c_mktsegment": ColumnSpec("cat", card=5),
                    "c_acctbal": ColumnSpec("num"),
                },
                foreign_keys=[ForeignKey(["c_nationkey"], "nation", ["n_nationkey"])],
            )
        }
    )
    back = DBSchema.from_json(schema.to_json())
    assert back["customer"].columns["c_mktsegment"].card == 5
    assert back["customer"].columns["c_custkey"].key
    assert back["customer"].foreign_keys[0].ref_table == "nation"
    assert back["customer"].primary_key() == ["c_custkey"]
    assert back["customer"].feature_columns() == ["c_mktsegment", "c_acctbal"]


def test_cat_requires_card():
    import pytest

    with pytest.raises(ValueError):
        ColumnSpec("cat")
    with pytest.raises(ValueError):
        ColumnSpec("bogus")


def test_tpch_sidecar_consistency():
    fks = tpch_star_schema_fks()
    pks = tpch_primary_keys()
    for table, fk_list in fks.items():
        for fk in fk_list:
            assert fk.ref_columns == pks[fk.ref_table][: len(fk.ref_columns)]


def test_dataset_defaults_registry_fixes_schema(db):
    from deep_db_learning_spark.profiling import (
        DATASET_DEFAULTS,
        DatasetDefault,
        analyzer_for_dataset,
        register_dataset,
    )

    # the worked example: tpch defaults wire target + fixer
    d = DATASET_DEFAULTS["tpch"]
    assert d.target == ("customer", "c_mktsegment")

    # drop the lineitem part/supplier FKs so the fixer has work to do
    fks = {t: list(v) for t, v in db.foreign_keys.items()}
    fks["lineitem"] = [fk for fk in fks["lineitem"] if fk.columns == ["l_orderkey"]]
    analyzer = analyzer_for_dataset("tpch", db.tables, db.primary_keys, fks)
    schema = analyzer.guess_schema()
    li_fks = {tuple(fk.columns): fk.ref_table for fk in schema["lineitem"].foreign_keys}
    assert li_fks[("l_partkey",)] == "part"
    assert li_fks[("l_suppkey",)] == "supplier"
    assert schema["events"].columns["props"].type == "text"
    # the target column was forced categorical by the default's task
    assert schema["customer"].columns["c_mktsegment"].type == "cat"

    # user registration API
    register_dataset(
        "mini", DatasetDefault("customer", "c_acctbal", "c_custkey", "regression")
    )
    assert DATASET_DEFAULTS["mini"].task == "regression"
    del DATASET_DEFAULTS["mini"]
