from . import layout, scd
from .catalog import (
    TESTDATA_TABLES,
    Database,
    discover_constraints_jdbc_metadata,
    load_files,
    load_jdbc,
    load_testdata,
)

__all__ = [
    "layout",
    "scd",
    "TESTDATA_TABLES",
    "Database",
    "discover_constraints_jdbc_metadata",
    "load_files",
    "load_jdbc",
    "load_testdata",
]
