"""Portable Bloom-filter semi-join pruning — the scale technique for
joins whose build side is too big to broadcast as rows but whose KEY
SET compresses into a few kilobytes of bitmap: probe rows that cannot
match are dropped AT THE SCAN, before they ever reach the join's
shuffle. (Spark's AQE injects runtime bloom filters for some shapes;
this operator is the explicit, engine-portable form — deterministic
md5 bit positions, so a DuckDB twin reproduces the bitmap AND the
filter decision bit-for-bit, and the pruned semi-join is provably
equal to the plain one: Bloom filters have no false negatives.)

Layout: ``m_bits`` bits packed into ``m_bits/64`` BIGINT words;
``k_hashes`` positions per key, each the md5-prefix hash of
``"bloom:<i>:"||key`` mod ``m_bits`` (the repo's portable-hash
convention — never an engine-native hash). The build is one
map-side-combinable aggregate: per row compute the k set-bit masks,
``bit_or`` them per word — ``m_bits/64`` grouped rows, collected as a
BOUNDED driver literal (64 Kbit default = 1024 words). The probe is a
pure-codegen filter over the literal array: every one of the k bits
must be set.

Sizing: false-positive rate ≈ (1 − e^{−kn/m})^k — at the default
m=65536, k=4, a 2 000-key build side gives ~2e-4; the filter never
drops a real match regardless, so a mis-sized filter costs shuffle
bytes, not correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_prefix_hash, md5_prefix_hash_sql

DEFAULT_M_BITS = 65536
DEFAULT_K = 4


def _bit_pos(key: Column, i: int, m_bits: int) -> Column:
    return md5_prefix_hash(
        F.concat(F.lit(f"bloom:{i}:"), key.cast("string"))
    ) % F.lit(m_bits)


def _bit_pos_sql(key: str, i: int, m_bits: int) -> str:
    return (
        md5_prefix_hash_sql(f"'bloom:{i}:' || CAST({key} AS VARCHAR)")
        + f" % {m_bits}"
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> list[int]:
    """The bitmap as a dense ``m_bits/64``-long list of signed BIGINT
    words — ONE aggregate job (explode k positions per key, bit_or
    masks per word), a bounded collect."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(key_col)
    positions = F.array(
        *[_bit_pos(key, i, m_bits) for i in range(k_hashes)]
    )
    rows = (
        df.where(key.isNotNull())
        .select(F.explode(positions).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # F.shiftleft only takes a literal shift; the SQL function
            # accepts a column
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                (F.col("p") % 64).cast("int"),
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_build_sql(
    table: str,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> str:
    """DuckDB twin of :func:`bloom_build` — identical positions,
    identical word packing. Yields (w, bits) rows for set words."""
    pos = ", ".join(
        f"({_bit_pos_sql(key_col, i, m_bits)})" for i in range(k_hashes)
    )
    # bit 63 is the sign bit: DuckDB raises on 1<<63 where Spark's
    # shiftleft wraps to MIN_LONG — construct that word explicitly so
    # the signed values match bit-for-bit
    mask = (
        "CASE WHEN p % 64 = 63 THEN (CAST(1 AS BIGINT) << 62) * (-2) "
        "ELSE CAST(1 AS BIGINT) << CAST(p % 64 AS INT) END"
    )
    return f"""
        SELECT CAST(p // 64 AS INT) AS w,
               bit_or({mask}) AS bits
        FROM (
          SELECT unnest([{pos}]) AS p
          FROM {table} WHERE {key_col} IS NOT NULL
        ) GROUP BY 1
    """


def bloom_might_contain(
    key: Column, words: list[int], k_hashes: int = DEFAULT_K
) -> Column:
    """Pure-codegen membership test against the literal bitmap: every
    one of the k bits set. NULL keys test false."""
    m_bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    cond = key.isNotNull()
    for i in range(k_hashes):
        p = _bit_pos(key, i, m_bits)
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (p % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> DataFrame:
    """``probe ⋉ build`` on ``key`` with Bloom pre-pruning: the probe
    side filters against the bitmap INSIDE its scan stage (codegen, no
    shuffle), then the surviving sliver runs the real semi-join for
    exactness (false positives die here; false negatives cannot
    exist). Result rows are EXACTLY the plain semi-join's — the filter
    only moves bytes out of the exchange."""
    words = bloom_build(build, key, m_bits, k_hashes)
    pruned = probe.where(bloom_might_contain(F.col(key), words, k_hashes))
    return pruned.join(build.select(key).distinct(), key, "leftsemi")
