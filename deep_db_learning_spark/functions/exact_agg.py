"""Order-independent floating-point aggregation.

Double summation is not associative: ``sum`` / ``avg`` over a shuffled
DataFrame can differ in the last ulp between runs, partitionings, and
engines — which breaks run-to-run reproducibility on a cluster and
oracle parity checks. The reference never hits this because pandas sums
single-threaded in one fixed order.

The cure is to sum in decimal: each double is rounded once to a fixed
scale (deterministic — binary doubles essentially never land on decimal
ties), and decimal addition is exact and associative, so partial
aggregates combine to the same result no matter how Spark splits the
data. The final value is cast back to double. Stays entirely inside
whole-stage codegen (Spark's Decimal sum is JVM-side).

Scale 9 keeps ~9 fractional digits of the input, far inside double's
~15-17 significant digits for the magnitudes these pipelines see.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_TYPE = "decimal(30,9)"


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(c: Column | str) -> Column:
    """Deterministic ``sum`` of a double column (exact decimal fold)."""
    return F.sum(_as_col(c).cast(DECIMAL_TYPE)).cast("double")


def exact_avg(c: Column | str) -> Column:
    """Deterministic ``avg``: exact decimal sum, double division by the
    non-null count."""
    col = _as_col(c)
    return F.sum(col.cast(DECIMAL_TYPE)).cast("double") / F.count(col)


def exact_sum_sql(expr: str) -> str:
    """ANSI-SQL twin of :func:`exact_sum` (DuckDB-compatible).

    The decimal→double conversion goes through VARCHAR: DuckDB's direct
    decimal→double cast is not correctly rounded (off by one ulp for
    e.g. 289482819.750300000), while strtod — like Java's
    ``BigDecimal.doubleValue()`` on the Spark side — is.
    """
    return f"CAST(CAST(sum(CAST(({expr}) AS DECIMAL(30,9))) AS VARCHAR) AS DOUBLE)"


# NOTE on rounding: do NOT wrap these in a final ``round(x, n)`` when
# cross-engine parity matters. Spark's round() on doubles rounds the
# *shortest decimal representation* (BigDecimal.valueOf) while DuckDB
# rounds the true binary value; 2-decimal money divided by power-of-two
# counts lands exactly on decimal ties (e.g. 2250795.51/8 =
# 281349.43875) where the two engines systematically disagree. The
# decimal fold already makes the unrounded doubles bitwise-identical —
# emit them as-is.


def exact_avg_sql(expr: str) -> str:
    """ANSI-SQL twin of :func:`exact_avg` (see :func:`exact_sum_sql`
    for the VARCHAR hop)."""
    return (
        f"(CAST(CAST(sum(CAST(({expr}) AS DECIMAL(30,9))) AS VARCHAR) AS DOUBLE)"
        f" / count({expr}))"
    )


_MAX_LONG = (1 << 63) - 1


def guarded_bigint(s: Column, context: str) -> Column:
    """DECIMAL aggregate → BIGINT with an in-plan range check: an
    out-of-range fold raises with ``context`` in the message instead
    of silently casting to NULL under the default non-ANSI mode (the
    ``hits._guarded_bigint`` lesson, shared). Use on any decimal fold
    whose value is *supposed* to be bounded (e.g. by a conservation
    law) — the guard converts a violated assumption into a loud
    failure that does not depend on ``spark.sql.ansi.enabled``."""
    dec = "decimal(38,0)"
    return (
        F.when(
            (s > F.lit(_MAX_LONG).cast(dec))
            | (s < F.lit(-_MAX_LONG - 1).cast(dec)),
            F.raise_error(F.lit(
                f"{context}: decimal fold exceeds BIGINT range — a "
                "bounded-by-construction value overflowed; check the "
                "operator's scale constants"
            )),
        )
        .otherwise(s)
        .cast("bigint")
    )
