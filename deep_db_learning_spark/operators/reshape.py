"""Wide/long reshaping: pivot and unpivot.

The reference's converters expand columns 1→N (``functions/convert``)
but have no row→column reshaping; a feature pipeline needs both
directions constantly (per-category measures as model features; wide
metric tables back to long for storage).

Scale rules baked in:

- :func:`pivot_agg` REQUIRES the pivot domain. Spark's
  ``pivot(col)`` without values runs a hidden driver-side distinct —
  unbounded on a high-cardinality column. Pass ``values`` explicitly,
  or :func:`pivot_domain` discovers it with a HARD CAP and fails loudly
  past it (a silent 10⁶-column pivot is a driver OOM at 100 TB).
- with values known, the pivot compiles to one partial+final hash
  aggregate over codegen'd conditional aggregates — exactly the
  ``sum(CASE WHEN …)`` plan, ONE shuffle on the group keys, no extra
  pass per category. (Spark's built-in ``.pivot()`` plans TWO
  aggregates — a (keys, pivot) pre-aggregate plus a ``pivotfirst``
  re-aggregate, two shuffles — so this module compiles the conditional
  form itself; the plan test pins the single Exchange.)
- :func:`unpivot` uses Spark's native ``unpivot`` (``stack``) — a
  row-local 1→N expansion, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PIVOT_DOMAIN_CAP = 1000


def pivot_domain(
    df: DataFrame, pivot_col: str, cap: int = PIVOT_DOMAIN_CAP
) -> list[str]:
    """The sorted distinct non-null values of ``pivot_col`` — bounded:
    raises past ``cap`` instead of silently building a huge pivot (take
    cap+1 so the failure costs one limit-scan, never a full distinct
    materialization on the driver)."""
    vals = [
        r[0]
        for r in df.select(pivot_col)
        .filter(F.col(pivot_col).isNotNull())
        .distinct()
        .limit(cap + 1)
        .collect()
    ]
    if len(vals) > cap:
        raise ValueError(
            f"pivot domain of {pivot_col!r} exceeds cap={cap}; pass an"
            " explicit values list or aggregate before pivoting"
        )
    return sorted(vals)


def pivot_agg(
    df: DataFrame,
    group_by: list[str] | str,
    pivot_col: str,
    values: list[str],
    agg_fn,
    measure: Column | str,
    prefix: str = "",
    fill=None,
) -> DataFrame:
    """Wide conditional aggregation: one output column per entry of
    ``values`` named ``{prefix}{value}``, computed as
    ``agg_fn(CASE WHEN pivot_col = value THEN measure END)`` —
    ``agg_fn`` is an aggregate constructor (``exact_sum``, ``F.count``,
    ``F.max``, …; aggregates skip the NULLs the CASE produces, which is
    what scopes each column to its category). ``fill`` replaces the
    NULL an all-absent category yields. Single shuffle on
    ``group_by``."""
    group_by = [group_by] if isinstance(group_by, str) else list(group_by)
    m = F.col(measure) if isinstance(measure, str) else measure
    aggs = []
    for v in values:
        c = agg_fn(F.when(F.col(pivot_col) == v, m))
        if fill is not None:
            c = F.coalesce(c, F.lit(fill))
        aggs.append(c.alias(f"{prefix}{v}"))
    return df.groupBy(*group_by).agg(*aggs)


def unpivot(
    df: DataFrame,
    ids: list[str] | str,
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Long-format inverse of :func:`pivot_agg` (column name → the
    ``var_name`` column). Row-local ``stack`` expansion — zero
    shuffles; value columns are cast to a common type by Spark's native
    unpivot."""
    ids = [ids] if isinstance(ids, str) else list(ids)
    return df.unpivot(ids, value_cols, var_name, value_name)
