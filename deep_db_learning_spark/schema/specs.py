"""Semantic-type schema IR (pure Python, no Spark dependency).

This is the engine's logical type system, mirroring the reference's
``ColumnDef`` registry (``/root/reference/db_transformer/schema/columns.py:21-92``)
and ``Schema``/``TableSchema``/``ForeignKeyDef``
(``/root/reference/db_transformer/schema/schema.py:163-229``).

Spark has no PK/FK constraint objects and no "ML-semantic" column types,
so this sidecar IR carries them next to the physical ``StructType``:

- a :class:`ColumnSpec` per column with semantic ``type`` in
  {cat, num, date, datetime, duration, time, text, omit}, a ``key``
  flag (is part of the primary key) and ``card`` for categoricals;
- a :class:`ForeignKey` per FK (multi-column capable);
- JSON round-trip (the reference serializes schemas to ``schema.json``,
  ``data/ctu_dataset.py:345-351``) so an inferred schema can be
  persisted beside the Parquet tables and patched by user hooks.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Iterator, Mapping

SEMANTIC_TYPES = (
    "cat",
    "num",
    "date",
    "datetime",
    "duration",
    "time",
    "text",
    "omit",
)


@dataclass
class ColumnSpec:
    """Semantic definition of one column (reference ``ColumnDef``).

    ``type`` is the ML-semantic type, independent of storage type.
    ``key`` marks primary-key membership. ``card`` is the exact
    null-inclusive cardinality for ``cat`` columns (reference
    ``CategoricalColumnDef.card``, ``schema/columns.py:38-47``).
    """

    type: str
    key: bool = False
    card: int | None = None

    def __post_init__(self) -> None:
        if self.type not in SEMANTIC_TYPES:
            raise ValueError(
                f"unknown semantic type {self.type!r}; expected one of {SEMANTIC_TYPES}"
            )
        if self.type == "cat" and self.card is None:
            raise ValueError("cat columns require an exact cardinality `card`")

    def to_dict(self) -> dict:
        d: dict = {"type": self.type, "key": self.key}
        if self.card is not None:
            d["card"] = self.card
        return d

    @classmethod
    def from_dict(cls, d: Mapping) -> "ColumnSpec":
        return cls(type=d["type"], key=bool(d.get("key", False)), card=d.get("card"))


@dataclass
class ForeignKey:
    """Multi-column-capable FK (reference ``ForeignKeyDef``,
    ``schema/schema.py:163-182``). Realized at runtime as equi-join keys.
    """

    columns: list[str]
    ref_table: str
    ref_columns: list[str]

    def __post_init__(self) -> None:
        if len(self.columns) != len(self.ref_columns):
            raise ValueError("columns / ref_columns length mismatch")

    @property
    def name(self) -> str:
        """Stable edge-type name for this FK."""
        return "__".join(self.columns) + "->" + self.ref_table

    def to_dict(self) -> dict:
        return {
            "columns": list(self.columns),
            "ref_table": self.ref_table,
            "ref_columns": list(self.ref_columns),
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "ForeignKey":
        return cls(
            columns=list(d["columns"]),
            ref_table=d["ref_table"],
            ref_columns=list(d["ref_columns"]),
        )


@dataclass
class TableSpec:
    """Reference ``TableSchema`` = ordered column defs + FK list
    (``schema/schema.py:185-206``)."""

    columns: dict[str, ColumnSpec] = field(default_factory=dict)
    foreign_keys: list[ForeignKey] = field(default_factory=list)

    def primary_key(self) -> list[str]:
        """Columns flagged ``key`` (reference ``get_primary_key()``,
        ``schema/schema.py:202-206``)."""
        return [name for name, spec in self.columns.items() if spec.key]

    def feature_columns(self) -> list[str]:
        """Non-omitted columns — the projection the converters consume."""
        return [n for n, s in self.columns.items() if s.type != "omit"]

    def to_dict(self) -> dict:
        return {
            "columns": {n: s.to_dict() for n, s in self.columns.items()},
            "foreign_keys": [fk.to_dict() for fk in self.foreign_keys],
        }

    @classmethod
    def from_dict(cls, d: Mapping) -> "TableSpec":
        return cls(
            columns={n: ColumnSpec.from_dict(s) for n, s in d["columns"].items()},
            foreign_keys=[ForeignKey.from_dict(f) for f in d.get("foreign_keys", [])],
        )


@dataclass
class DBSchema:
    """Ordered dict of table specs (reference ``Schema``,
    ``schema/schema.py:209-229``). Iteration order == insertion order,
    matching the reference's ``OrderedDotDict`` semantics."""

    tables: dict[str, TableSpec] = field(default_factory=dict)

    def __getitem__(self, name: str) -> TableSpec:
        return self.tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.tables

    def __iter__(self) -> Iterator[str]:
        return iter(self.tables)

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(
            {n: t.to_dict() for n, t in self.tables.items()}, indent=indent
        )

    @classmethod
    def from_json(cls, s: str) -> "DBSchema":
        raw = json.loads(s)
        return cls(tables={n: TableSpec.from_dict(t) for n, t in raw.items()})

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "DBSchema":
        with open(path) as f:
            return cls.from_json(f.read())


def tpch_star_schema_fks() -> dict[str, list[ForeignKey]]:
    """FK metadata for the driver's TPC-H-ish star schema (TESTDATA.md).

    The reference patches the same shape into its `tpcd` dataset defaults
    (``data/dataset_defaults/ctu_repository_defauts.py:528-533``); Spark
    carries no FK constraints, so this is the canonical sidecar.
    """
    fk = ForeignKey
    return {
        "region": [],
        "nation": [fk(["n_regionkey"], "region", ["r_regionkey"])],
        "customer": [fk(["c_nationkey"], "nation", ["n_nationkey"])],
        "supplier": [fk(["s_nationkey"], "nation", ["n_nationkey"])],
        "part": [],
        "orders": [fk(["o_custkey"], "customer", ["c_custkey"])],
        "lineitem": [
            fk(["l_orderkey"], "orders", ["o_orderkey"]),
            fk(["l_partkey"], "part", ["p_partkey"]),
            fk(["l_suppkey"], "supplier", ["s_suppkey"]),
        ],
        "events": [fk(["user_id"], "customer", ["c_custkey"])],
        "documents": [],
        "embeddings": [],
    }


def tpch_primary_keys() -> dict[str, list[str]]:
    """PK sidecar for the driver's star schema (FIXTURES.md)."""
    return {
        "region": ["r_regionkey"],
        "nation": ["n_nationkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey", "l_linenumber"],
        "events": ["event_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
