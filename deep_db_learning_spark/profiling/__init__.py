from .analyzer import SchemaAnalyzer
from .profiler import (
    ColumnStats,
    distinct_count_including_null,
    profilable_columns,
    profile_database,
    profile_table,
)

__all__ = [
    "ColumnStats",
    "SchemaAnalyzer",
    "distinct_count_including_null",
    "profilable_columns",
    "profile_database",
    "profile_table",
]
