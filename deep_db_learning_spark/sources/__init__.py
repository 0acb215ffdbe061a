from .catalog import (
    TESTDATA_TABLES,
    Database,
    load_files,
    load_jdbc,
    load_testdata,
)

__all__ = [
    "TESTDATA_TABLES",
    "Database",
    "load_files",
    "load_jdbc",
    "load_testdata",
]
