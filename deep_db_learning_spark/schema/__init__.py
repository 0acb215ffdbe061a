from .specs import (
    SEMANTIC_TYPES,
    ColumnSpec,
    DBSchema,
    ForeignKey,
    TableSpec,
    tpch_primary_keys,
    tpch_star_schema_fks,
)

__all__ = [
    "SEMANTIC_TYPES",
    "ColumnSpec",
    "DBSchema",
    "ForeignKey",
    "TableSpec",
    "tpch_primary_keys",
    "tpch_star_schema_fks",
]
