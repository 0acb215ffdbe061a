"""Date/time feature decomposition (SURVEY F3-F9).

Semantics ported from the reference's converters
(``/root/reference/db_transformer/data/converter/column/default_datetime_converters.py``):

- date → ``_year``, ``_dayofyear``
- datetime → ``_year``, ``_dayofyear``, ``_seconds_since_midnight``
- time → seconds since midnight
- timestamp → epoch seconds
- duration/timedelta → (nano)seconds (``ctu_dataset.py:153-154``)

All are native Column expressions — whole-stage codegen, no UDFs, no
shuffle. Each helper returns ``{suffix: Column}`` implementing the
reference's 1→N column-expansion contract
(``series_converter.py:16-21``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seconds_since_midnight(ts: Column) -> Column:
    """F4/F5 (``default_datetime_converters.py:24-47``). The reference
    fills NULL with 0 for datetimes; we preserve that at fillna time,
    not here, so the expression stays reusable."""
    return (
        F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)
    ).cast("int")


def date_features(c: Column) -> dict[str, Column]:
    """F3: date → year + dayofyear."""
    return {
        "_year": F.year(c).cast("int"),
        "_dayofyear": F.dayofyear(c).cast("int"),
    }


def datetime_features(c: Column) -> dict[str, Column]:
    """F3+F4: datetime → year, dayofyear, seconds-since-midnight."""
    return {
        "_year": F.year(c).cast("int"),
        "_dayofyear": F.dayofyear(c).cast("int"),
        "_seconds_since_midnight": seconds_since_midnight(c),
    }


def time_features(c: Column) -> dict[str, Column]:
    """F5: time-like (string 'HH:mm:ss' or timestamp) → seconds."""
    return {"": seconds_since_midnight(F.to_timestamp(c))}


def epoch_seconds(c: Column) -> Column:
    """F6: timestamp → seconds since epoch
    (``default_datetime_converters.py:66-73``)."""
    return F.unix_timestamp(c).cast("bigint")


def duration_seconds(c: Column) -> Column:
    """F8: day-time interval → fractional seconds. The reference stores
    nanoseconds (``ctu_dataset.py:153-154``); seconds avoid overflow and
    are numerically equivalent features (scale factor). Spark forbids a
    direct interval→double cast; the decimal hop keeps sub-second
    precision."""
    return c.cast("decimal(30,9)").cast("double")


def legacy_date_segments(c: Column) -> dict[str, Column]:
    """F7: the legacy convertor's 5-way decomposition
    (``data/convertor/columns/datetime_convertors.py:75-99``)."""
    return {
        "_year": F.year(c).cast("int"),
        "_month": F.month(c).cast("int"),
        "_day": F.dayofmonth(c).cast("int"),
        "_ordinal": F.datediff(F.to_date(c), F.to_date(F.lit("0001-01-01"))) + 1,
        "_timestamp": F.unix_timestamp(c).cast("bigint"),
    }


def clamp_to_pandas_bounds(c: Column) -> Column:
    """F9 parity option: the reference clamps timestamps to pandas'
    ns-epoch bounds (``ctu_dataset.py:206-213,354-355``). Spark has no
    such limit — documented divergence; apply only in parity mode."""
    lo = F.to_timestamp(F.lit("1677-09-22 00:12:43"))
    hi = F.to_timestamp(F.lit("2262-04-11 23:47:16"))
    return F.least(F.greatest(c, lo), hi)
