"""Per-dataset defaults registry (SURVEY §2 "minor" gap — reference
``data/dataset_defaults/ctu_repository_defauts.py:10-41``): each known
dataset carries its target, task type, optional timestamp column, and a
``schema_fixer`` hook that patches what automatic inference cannot know
(missing FK declarations, wrong semantic types).

The reference keys ~80 CTU datasets; this engine ships the driver's
star schema ("tpch") as the worked example plus the registration API a
user extends for their own catalogs. The fixer plugs into
:class:`~.analyzer.SchemaAnalyzer`'s ``post_guess_schema_hook`` — it
runs AFTER inference, so it only overrides, never replaces, the
profiling decisions (exactly the reference's ``schema_fixer`` contract,
``data/dataset_defaults/utils.py:19-23``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

from ..schema import DBSchema, ForeignKey


@dataclass
class DatasetDefault:
    """Reference ``CTUDatasetDefault`` (``ctu_repository_defauts.py:10-28``)."""

    target_table: str
    target_column: str
    target_id: str
    task: str  # "classification" | "regression"
    timestamp_column: Optional[str] = None
    schema_fixer: Optional[Callable[[DBSchema], None]] = None

    @property
    def target(self) -> Tuple[str, str]:
        return self.target_table, self.target_column


def _fix_tpch(schema: DBSchema) -> None:
    """The star-schema patches inference can't derive (parity with the
    reference's tpcd fixer, ``ctu_repository_defauts.py:528-533``, which
    adds the lineitem→part / lineitem→supplier FKs the source DB never
    declared): make sure the fact-table FK fan is complete, and force
    the free-text events payload to ``text`` (its cardinality is high
    enough that the cardinality tree could still call it ``cat`` at
    small scale factors)."""
    li = schema["lineitem"]
    declared = {tuple(fk.columns) for fk in li.foreign_keys}
    for fk in (
        ForeignKey(["l_partkey"], "part", ["p_partkey"]),
        ForeignKey(["l_suppkey"], "supplier", ["s_suppkey"]),
    ):
        if tuple(fk.columns) not in declared:
            li.foreign_keys.append(fk)
    if "events" in schema and "props" in schema["events"].columns:
        schema["events"].columns["props"].type = "text"


DATASET_DEFAULTS: dict[str, DatasetDefault] = {
    "tpch": DatasetDefault(
        target_table="customer",
        target_column="c_mktsegment",
        target_id="c_custkey",
        task="classification",
        timestamp_column=None,
        schema_fixer=_fix_tpch,
    ),
}


def register_dataset(name: str, default: DatasetDefault) -> None:
    """User extension point — the analog of adding a registry entry in
    the reference's defaults module."""
    DATASET_DEFAULTS[name] = default


def analyzer_for_dataset(
    name: str,
    tables,
    primary_keys=None,
    foreign_keys=None,
    **kwargs,
):
    """A :class:`~.analyzer.SchemaAnalyzer` pre-configured from the
    registry: target + target type from the default, schema_fixer wired
    as the post-guess hook."""
    from .analyzer import SchemaAnalyzer

    d = DATASET_DEFAULTS[name]
    return SchemaAnalyzer(
        tables,
        primary_keys,
        foreign_keys,
        target=d.target,
        target_type="cat" if d.task == "classification" else "num",
        post_guess_schema_hook=d.schema_fixer,
        **kwargs,
    )
