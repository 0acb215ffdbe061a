from . import validate
from .analyzer import SchemaAnalyzer
from .defaults import (
    DATASET_DEFAULTS,
    DatasetDefault,
    analyzer_for_dataset,
    register_dataset,
)
from .profiler import (
    ColumnStats,
    distinct_count_including_null,
    profilable_columns,
    profile_database,
    profile_table,
)

__all__ = [
    "validate",
    "DATASET_DEFAULTS",
    "DatasetDefault",
    "analyzer_for_dataset",
    "register_dataset",
    "ColumnStats",
    "SchemaAnalyzer",
    "distinct_count_including_null",
    "profilable_columns",
    "profile_database",
    "profile_table",
]
