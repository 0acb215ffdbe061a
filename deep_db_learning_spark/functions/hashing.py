"""Portable deterministic hashing for splits / sampling / sketches.

Spark's ``hash()`` (Murmur3) and ``rand(seed)`` are engine-specific:
an oracle engine (DuckDB) cannot reproduce them, and the reference pins
determinism via fixed seeds (``main.py:32-34``). We therefore use
arithmetic hashes that any ANSI-SQL engine evaluates identically:

- :func:`knuth_hash` — Knuth multiplicative hashing over BIGINT
  arithmetic, for keyed pseudo-random ordering (neighbor sampling,
  N27) and bucketed splits (N26).
- :func:`md5_prefix_hash` — first 8 hex chars of ``md5`` as a BIGINT,
  for string-keyed sketches (MinHash); ``md5`` is bit-identical across
  engines.

Scale note: both are pure JVM expressions (whole-stage codegen); no
Python UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 * golden ratio conjugate
MERSENNE_31 = 2147483647  # 2^31 - 1


def knuth_hash(key: Column, seed: int = 42) -> Column:
    """``((key mod p + seed) * K) mod p`` — the seed mixes BEFORE the
    multiply so different seeds yield different *orderings*, not just a
    constant shift. Stays within BIGINT range ((p+seed)*K < 2^63 for
    seed < ~1e9); identical in Spark and DuckDB."""
    return (
        ((F.pmod(key.cast("bigint"), F.lit(MERSENNE_31)) + F.lit(seed)) * F.lit(KNUTH))
        % F.lit(MERSENNE_31)
    )


def knuth_hash_sql(expr: str, seed: int = 42) -> str:
    """The DuckDB/ANSI twin of :func:`knuth_hash` (for oracle SQL)."""
    e = f"CAST(({expr}) AS BIGINT)"
    return (
        f"(((({e} % {MERSENNE_31} + {MERSENNE_31}) % {MERSENNE_31}) + {seed})"
        f" * CAST({KNUTH} AS BIGINT)) % {MERSENNE_31}"
    )


def md5_prefix_hash(s: Column) -> Column:
    """First 32 bits of md5(s) as a non-negative BIGINT. Portable:
    DuckDB twin is ``('0x' || substr(md5(s), 1, 8))::BIGINT`` (verified)
    or ``strtol``-style conv."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def md5_prefix_hash_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def md5_hash60(s: Column) -> Column:
    """First 60 bits (15 hex chars) of md5(s) as a non-negative BIGINT.

    The sketch family (KMV / HLL, ``operators/sketch.py``) needs more
    than 32 bits: a 32-bit hash space saturates around ~2^16 distinct
    values (birthday bound), while 60 bits keeps collision probability
    negligible past 10^9 keys yet still fits BIGINT with headroom
    (2^60 < 2^63). Portable: DuckDB twin below, verified bit-equal."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def md5_hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def bucket(key: Column, n_buckets: int, seed: int = 42) -> Column:
    """Deterministic pseudo-random bucket in [0, n_buckets)."""
    return knuth_hash(key, seed) % F.lit(n_buckets)


def split_label(
    key: Column,
    fractions: tuple[float, float, float] = (0.7, 0.1, 0.2),
    seed: int = 42,
) -> Column:
    """N26 ``RandomNodeSplit`` analog (reference uses PyG's random masks,
    ``main.py:221``): deterministic hash-based train/val/test assignment.
    Unlike ``rand(seed)`` this is reproducible across engines AND stable
    under repartitioning — at 100 TB a re-shuffled ``rand`` would
    silently reassign rows; a key-hash split never does."""
    b = bucket(key, 10_000, seed)
    train_hi = int(fractions[0] * 10_000)
    val_hi = train_hi + int(fractions[1] * 10_000)
    return (
        F.when(b < train_hi, F.lit("train"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_label_sql(
    expr: str,
    fractions: tuple[float, float, float] = (0.7, 0.1, 0.2),
    seed: int = 42,
) -> str:
    h = knuth_hash_sql(expr, seed)
    train_hi = int(fractions[0] * 10_000)
    val_hi = train_hi + int(fractions[1] * 10_000)
    return (
        f"CASE WHEN ({h}) % 10000 < {train_hi} THEN 'train' "
        f"WHEN ({h}) % 10000 < {val_hi} THEN 'val' ELSE 'test' END"
    )


def knuth_hash_py(key: int, seed: int = 42) -> int:
    """Scalar Python twin of :func:`knuth_hash` — for driver-side batch
    assignment over a collected root set (the minibatch trainers). One
    definition per side: engine code calls THIS, the oracle twin keeps
    its own independent ``_knuth`` (plans/train_oracle.py)."""
    return ((key % MERSENNE_31 + MERSENNE_31) % MERSENNE_31 + seed) * KNUTH % MERSENNE_31
