"""Schema-driven column conversion — the reference's converter stack as
a Column-expression registry (SURVEY §2.8 extension surface, §7.4).

Mirrored contracts (re-expressed, not ported):

- **1→N expansion** (``data/converter/column/series_converter.py:16-21``):
  a converter maps one input column to zero or more output columns.
  Here a converter is ``(ColumnSpec, Column, name) -> dict[out_name,
  Column]`` — pure expression factories, so the whole table conversion
  is ONE ``select`` that Catalyst fuses into the scan (column pruning +
  whole-stage codegen; no per-column passes, no Python in the row path).
- **per-type dispatch** (``per_type_converter.py:16-40``,
  ``data/utils/column_def_matching.py:12-37``): a registry keyed by
  semantic type with user override.
- **omit pruning** (P1/P2, ``omit_converter.py:12-16``): omit/key
  columns contribute nothing.
- **constant-column elimination** (P3, ``pandas_converter.py:34-40``
  ``skip_if_allsame``): derived columns whose non-null values have ≤1
  distinct are dropped — a data-dependent decision, so it takes one
  profiling pass over the *converted* frame when enabled.

Dict-encoding (``cat``) is the one conversion that cannot be a pure
per-row expression (it needs the value→code table); it stays a
DataFrame-level join (broadcast — code tables are below the broadcast
threshold by the cat-cardinality bound) applied after the expression
pass.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import ColumnSpec, TableSpec
from .datetime_funcs import (
    date_features,
    datetime_features,
    duration_seconds,
    time_features,
)
from .encode import cast_num, dict_encode

# converter: (spec, column expression, column name) -> {out_name: expr}
Converter = Callable[[ColumnSpec, Column, str], dict[str, Column]]


def _convert_num(spec: ColumnSpec, c: Column, name: str) -> dict[str, Column]:
    # F10: float cast, None→0 (num_convertor.py:18-22)
    return {name: cast_num(c, fill=0.0)}


def _convert_date(spec: ColumnSpec, c: Column, name: str) -> dict[str, Column]:
    # F3 (default_datetime_converters.py:13-21)
    return {f"{name}{suffix}": e for suffix, e in date_features(c).items()}


def _convert_datetime(spec: ColumnSpec, c: Column, name: str) -> dict[str, Column]:
    # F4/F6 (default_datetime_converters.py:24-47)
    return {f"{name}{suffix}": e for suffix, e in datetime_features(c).items()}


def _convert_time(spec: ColumnSpec, c: Column, name: str) -> dict[str, Column]:
    # F5 (default_datetime_converters.py:28-63)
    return {f"{name}{suffix}": e for suffix, e in time_features(c).items()}


def _convert_duration(spec: ColumnSpec, c: Column, name: str) -> dict[str, Column]:
    # F8: duration → seconds (ctu_dataset.py:153-154 uses ns; seconds
    # here, a scale factor — documented deviation)
    return {f"{name}_seconds": duration_seconds(c)}


def _convert_omit(spec: ColumnSpec, c: Column, name: str) -> dict[str, Column]:
    # P2 (omit_converter.py:12-16)
    return {}


def _convert_text_passthrough(spec: ColumnSpec, c: Column, name: str) -> dict[str, Column]:
    # text columns pass through for a downstream embedder stage (N6)
    return {name: c}


DEFAULT_CONVERTERS: dict[str, Converter] = {
    "num": _convert_num,
    "date": _convert_date,
    "datetime": _convert_datetime,
    "time": _convert_time,
    "duration": _convert_duration,
    "text": _convert_text_passthrough,
    "omit": _convert_omit,
    # "cat" handled by the join-based pass below
}


def convert_table(
    df: DataFrame,
    table_spec: TableSpec,
    converters: dict[str, Converter] | None = None,
    keep: list[str] | None = None,
    skip_if_allsame: bool = False,
) -> DataFrame:
    """Convert every schema column of ``df`` per its semantic type.

    ``keep``: passthrough columns (ids/keys a caller wants to retain).
    ``converters``: per-type overrides merged over the defaults — the
    user extension point (reference ``schema_fixer``-adjacent hook,
    ``per_type_converter.py:16-40``).

    Returns a frame with ``keep`` + all converted outputs. Cat columns
    are dict-encoded (NULL→0, F12) via broadcast code-table joins.
    """
    reg = {**DEFAULT_CONVERTERS, **(converters or {})}
    keep = keep or []
    exprs: list[Column] = [F.col(k) for k in keep]
    cat_cols: list[str] = []
    for name, spec in table_spec.columns.items():
        if name in keep or name not in df.columns:
            continue
        if spec.key:
            continue  # P2: key columns are omitted from features
        if spec.type == "cat":
            cat_cols.append(name)
            continue
        conv = reg.get(spec.type)
        if conv is None:
            continue
        for out_name, e in conv(spec, F.col(name), name).items():
            exprs.append(e.alias(out_name))
    out = df.select(*exprs, *[F.col(c) for c in cat_cols])
    for name in cat_cols:
        out = dict_encode(out, name, out=f"{name}_code").drop(name)
    if skip_if_allsame:
        out = drop_constant_columns(out, protected=keep)
    return out


def drop_constant_columns(df: DataFrame, protected: list[str] | None = None) -> DataFrame:
    """P3 ``skip_if_allsame`` (``pandas_converter.py:34-40``): drop
    columns whose non-null values have ≤1 distinct. One profiling agg
    (approx first — exact only where the approximate count is ≤2, the
    ambiguous band) keeps this a single cheap pass at scale."""
    protected = set(protected or [])
    cols = [c for c in df.columns if c not in protected]
    if not cols:
        return df
    approx = df.agg(
        *[F.approx_count_distinct(c).alias(c) for c in cols]
    ).collect()[0]
    maybe_const = [c for c in cols if (approx[c] or 0) <= 2]
    if maybe_const:
        exact = df.agg(
            *[F.count_distinct(F.col(c)).alias(c) for c in maybe_const]
        ).collect()[0]
        drop = [c for c in maybe_const if (exact[c] or 0) <= 1]
        if drop:
            df = df.drop(*drop)
    return df


def convert_database(
    tables: dict[str, DataFrame],
    schema,
    converters: dict[str, Converter] | None = None,
    keep: dict[str, list[str]] | None = None,
    skip_if_allsame: bool = False,
) -> dict[str, DataFrame]:
    """Apply :func:`convert_table` across a whole database
    (``SimpleDataFrameConverter.convert_table`` loop,
    ``data/converter/dataframe_converter.py:56-102``)."""
    keep = keep or {}
    return {
        t: convert_table(
            df,
            schema[t],
            converters=converters,
            keep=keep.get(t, []),
            skip_if_allsame=skip_if_allsame,
        )
        for t, df in tables.items()
        if t in schema
    }
