"""Distributed cardinality / frequency / quantile sketches.

The reference profiles tables with EXACT distinct counts and value
frequencies (``db_transformer/db/distinct_cnt_retrieval.py:55-155``,
``db/db_inspector.py`` — every count is a full scan + hash set).  That
is the right call at CTU-dataset scale and hopeless at 100 TB: a
distinct count over a high-cardinality column would shuffle the whole
column.  This module is the at-scale replacement — one-pass, bounded
state, portable arithmetic:

- :func:`kmv_distinct` — K-Minimum-Values estimator (Bar-Yossef et al.
  2002): keep the ``k`` smallest 60-bit hash values; the k-th smallest
  order statistic estimates the cardinality as ``(k-1) / U_(k)``.
  State: ``k`` BIGINTs.  Exact below ``k`` distinct values.
- :func:`hll_distinct` — HyperLogLog-shaped register sketch (Flajolet
  et al. 2007): ``m`` registers of "position of first 1-bit", harmonic
  estimator.  State: ``m`` small ints.  The register fold here is
  INTEGER-exact (weights ``2^(cap-rho)`` summed as BIGINT, the final
  estimate is a single double division), so a DuckDB oracle reproduces
  the estimate bit-for-bit — no float-sum ordering hazard.  The
  small-range bias correction (``m·ln(m/V)``) is deliberately omitted
  (``ln`` is transcendental → not portably bit-stable); use
  :func:`kmv_distinct` when the cardinality may be small — it is exact
  there.
- :func:`cms_heavy_hitters` — Count-Min sketch (Cormode & Muthu 2005):
  ``depth × width`` counter matrix under ``depth`` salted hashes;
  point estimate = min over rows; overestimates only.  The sketch
  build is one explode + one groupBy (state ``depth·width`` rows,
  broadcastable).  Candidate probing here enumerates distinct values
  (exact at test scale — and the honest framing: the sketch's value at
  100 TB is that the COUNTER state is bounded while candidates stream
  from a sample or a prior top-k, see docstring).
- :func:`exact_quantiles` — EXACT order statistics with no global
  sort: histogram pass (``n_buckets`` counts) → driver locates the
  bucket + offset holding each requested rank (≤ ``n_buckets`` rows
  collected) → second pass sorts ONLY the hit buckets (~N/B rows
  each) under a per-bucket window.  Two scans, no full-data shuffle
  by a total order — the 100 TB answer to ``ORDER BY x LIMIT 1
  OFFSET r``.

Every hash is the portable md5 family (``functions/hashing.py``) and
every cross-row fold is integer/BIGINT, so the paired ``*_oracle_sql``
builders emit DuckDB SQL that matches the engine bit-for-bit — the
driver's value-hash gate checks these estimators EXACTLY, not "within
epsilon".
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    md5_hash60,
    md5_hash60_sql,
    md5_prefix_hash,
    md5_prefix_hash_sql,
)

# One config shared by engine and oracle builders — the constants can't
# drift between the two sides (the bm25 CONFIG pattern, search.py).
SKETCH_CONFIG = {
    "kmv_k": 256,
    "hll_m": 256,
    "hll_rho_cap": 40,  # max register value; 2^-40 tail is negligible
    "hll_rest_bits": 52,  # 60-bit hash minus 8 bucket bits
    "cms_depth": 4,
    "cms_width": 1024,
    "quantile_buckets": 512,
}

_H60_SPAN = float(2**60)


def dlit(x: float) -> str:
    """Double literal both engines parse to the same IEEE value."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def kmv_bottom_hashes(df: DataFrame, col: str, k: int) -> DataFrame:
    """The ``k`` smallest DISTINCT 60-bit hashes of ``col`` (the KMV
    synopsis itself — unionable across partitions/corpora by re-taking
    the bottom k, which is how KMV merges).

    Plan shape: partial (map-side) dedup inside the groupBy, then a
    ``TakeOrderedAndProject`` — Spark keeps a per-partition top-k and
    merges on the driver; no full sort of the hash column."""
    return (
        df.where(F.col(col).isNotNull())
        .select(md5_hash60(F.col(col).cast("string")).alias("h"))
        .groupBy("h")
        .agg(F.lit(1))
        .select("h")
        .orderBy("h")
        .limit(k)
    )


def kmv_distinct(df: DataFrame, col: str, k: int | None = None) -> DataFrame:
    """One row ``(k_used, kth, est)``: the KMV cardinality estimate.

    ``est = (k-1) * 2^60 / kth`` when the synopsis is full (a single
    double division over two exact integers — deterministic), or the
    EXACT distinct count when fewer than ``k`` values exist (KMV
    degrades to exact below its state budget)."""
    k = k or SKETCH_CONFIG["kmv_k"]
    numer = float((k - 1) * 2**60)
    return kmv_bottom_hashes(df, col, k).agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth"),
    ).select(
        "k_used",
        "kth",
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(F.expr(dlit(numer)) / F.col("kth").cast("double"))
        .alias("est"),
    )


def kmv_distinct_oracle_sql(table: str, col: str, k: int | None = None) -> str:
    k = k or SKETCH_CONFIG["kmv_k"]
    numer = float((k - 1) * 2**60)
    h = md5_hash60_sql(f"CAST({col} AS VARCHAR)")
    return f"""
        WITH hs AS (
          SELECT DISTINCT {h} AS h FROM {table} WHERE {col} IS NOT NULL
        ), tk AS (
          SELECT h FROM hs ORDER BY h LIMIT {k}
        )
        SELECT count(*) AS k_used, max(h) AS kth,
               CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                    ELSE {dlit(numer)} / CAST(max(h) AS DOUBLE) END AS est
        FROM tk
    """


def kmv_set_estimates(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int | None = None,
) -> DataFrame:
    """KMV set algebra (Beyer et al., SIGMOD 2007): estimate
    ``|A ∪ B|``, the Jaccard ``|A ∩ B| / |A ∪ B|`` and ``|A ∩ B|`` of
    two key populations from their bottom-k synopses ALONE — the
    mergeability that makes KMV a distributed sketch (sketch each
    corpus independently, combine k-row frames; no re-scan of either
    side). One row: ``(k_used, kth, n_common, union_est, jaccard_est,
    intersect_est)``.

    Math: ``K = bottom-k(H(A) ∪ H(B))`` estimates the union like any
    KMV; within K, the fraction ``ρ`` of hashes present in BOTH
    synopses is an unbiased Jaccard estimator (K is a uniform sample
    of the union); ``|A ∩ B| ≈ ρ · |A ∪ B|``. Below the state budget
    (``k_used < k``) everything degrades to exact set arithmetic.

    Plan shape: two independent bottom-k jobs (partial dedup +
    TakeOrderedAndProject), then all combination work happens on three
    ≤ k-row frames — the union re-take is a sort-limit of ≤ 2k rows
    and the membership joins broadcast. Determinism: counts are exact
    integers; the three estimates are single double divisions /
    products over exact integers, bit-reproducible cross-engine."""
    k = k or SKETCH_CONFIG["kmv_k"]
    numer = float((k - 1) * 2**60)
    sa = kmv_bottom_hashes(df_a, col_a, k)
    sb = kmv_bottom_hashes(df_b, col_b, k)
    ku = (
        sa.unionByName(sb).distinct().orderBy("h").limit(k)
    )
    common = ku.join(F.broadcast(sa), "h", "leftsemi").join(
        F.broadcast(sb), "h", "leftsemi"
    )
    agg = ku.agg(
        F.count("*").alias("k_used"), F.max("h").alias("kth")
    ).crossJoin(
        F.broadcast(common.agg(F.count("*").alias("n_common")))
    )
    union_est = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(F.expr(dlit(numer)) / F.col("kth").cast("double"))
    )
    jacc = F.col("n_common").cast("double") / F.col("k_used").cast("double")
    return agg.select(
        "k_used",
        "kth",
        "n_common",
        union_est.alias("union_est"),
        jacc.alias("jaccard_est"),
        (jacc * union_est).alias("intersect_est"),
    )


def kmv_set_estimates_oracle_sql(
    table_a: str, col_a: str, table_b: str, col_b: str, k: int | None = None
) -> str:
    """DuckDB twin of :func:`kmv_set_estimates` — identical synopsis
    construction and estimate arithmetic."""
    k = k or SKETCH_CONFIG["kmv_k"]
    numer = float((k - 1) * 2**60)
    ha = md5_hash60_sql(f"CAST({col_a} AS VARCHAR)")
    hb = md5_hash60_sql(f"CAST({col_b} AS VARCHAR)")
    return f"""
        WITH sa AS MATERIALIZED (
          SELECT h FROM (
            SELECT DISTINCT {ha} AS h FROM {table_a}
            WHERE {col_a} IS NOT NULL)
          ORDER BY h LIMIT {k}
        ), sb AS MATERIALIZED (
          SELECT h FROM (
            SELECT DISTINCT {hb} AS h FROM {table_b}
            WHERE {col_b} IS NOT NULL)
          ORDER BY h LIMIT {k}
        ), ku AS MATERIALIZED (
          SELECT h FROM (
            SELECT h FROM sa UNION SELECT h FROM sb)
          ORDER BY h LIMIT {k}
        ), stats AS (
          SELECT count(*) AS k_used, max(h) AS kth,
                 (SELECT count(*) FROM ku
                  WHERE ku.h IN (SELECT h FROM sa)
                    AND ku.h IN (SELECT h FROM sb)) AS n_common
          FROM ku
        )
        SELECT k_used, kth, n_common,
               CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                    ELSE {dlit(numer)} / CAST(kth AS DOUBLE) END AS union_est,
               CAST(n_common AS DOUBLE) / CAST(k_used AS DOUBLE)
                 AS jaccard_est,
               (CAST(n_common AS DOUBLE) / CAST(k_used AS DOUBLE))
                 * (CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                         ELSE {dlit(numer)} / CAST(kth AS DOUBLE) END)
                 AS intersect_est
        FROM stats
    """


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def _bits_ladder_sql(rest_expr: str, width: int) -> str:
    """``bit_length(rest)`` as a pure comparison ladder — identical text
    in Spark SQL and DuckDB (no engine bit intrinsics), integer-exact."""
    terms = " + ".join(
        f"(CASE WHEN {rest_expr} >= {1 << j} THEN 1 ELSE 0 END)"
        for j in range(width)
    )
    return f"({terms})"


def hll_registers(df: DataFrame, col: str, m: int | None = None) -> DataFrame:
    """``(b, rho)`` register frame: bucket = low 8 bits of the hash,
    rho = 1 + leading zeros of the remaining 52 bits, capped.  All
    ``m`` registers present (empty → rho 0).  State: ``m`` rows."""
    m = m or SKETCH_CONFIG["hll_m"]
    cap = SKETCH_CONFIG["hll_rho_cap"]
    width = SKETCH_CONFIG["hll_rest_bits"]
    spark = df.sparkSession
    bits = _bits_ladder_sql("rest", width)
    regs = (
        df.where(F.col(col).isNotNull())
        .select(md5_hash60(F.col(col).cast("string")).alias("h"))
        .select(
            (F.col("h") % m).alias("b"),
            F.expr(f"h div {m}").alias("rest"),
        )
        .select(
            "b",
            F.least(F.lit(width + 1) - F.expr(bits), F.lit(cap)).alias("rho"),
        )
        .groupBy("b")
        .agg(F.max("rho").alias("rho"))
    )
    full = spark.range(m).select(F.col("id").alias("b"))
    return full.join(regs, "b", "left").select(
        "b", F.coalesce("rho", F.lit(0)).cast("int").alias("rho")
    )


def hll_distinct(df: DataFrame, col: str, m: int | None = None) -> DataFrame:
    """One row ``(intsum, zero_regs, est)``.  ``intsum`` is the exact
    BIGINT ``Σ 2^(cap - rho_j)`` (empty register ⇒ ``2^cap``), so the
    harmonic estimate is ``alpha·m²·2^cap / intsum`` — one double
    division, bit-stable across engines."""
    m = m or SKETCH_CONFIG["hll_m"]
    cap = SKETCH_CONFIG["hll_rho_cap"]
    numer = _hll_alpha(m) * m * m * float(2**cap)
    return (
        hll_registers(df, col, m)
        .agg(
            F.sum(
                F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {cap} - rho) AS BIGINT)")
            ).alias("intsum"),
            F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("zero_regs"),
        )
        .select(
            "intsum",
            "zero_regs",
            (F.expr(dlit(numer)) / F.col("intsum").cast("double")).alias("est"),
        )
    )


def hll_distinct_by(
    df: DataFrame, group_col: str, col: str, m: int | None = None
) -> DataFrame:
    """PER-GROUP HLL distinct estimate — the at-scale replacement for
    ``count(DISTINCT x) GROUP BY g`` (which shuffles every (g, x)
    pair): one ``(g, bucket) → max rho`` fold, O(m) state per group.
    Returns ``(group_col, intsum, zero_regs, est)`` with the SAME
    integer-exact estimate arithmetic as the global
    :func:`hll_distinct` — instead of materializing the m-row register
    frame per group, the empty registers enter algebraically:
    ``intsum = Σ_present 2^(cap−rho) + (m − present)·2^cap`` (present
    registers always have rho ≥ 1, so ``zero_regs = m − present``)."""
    m = m or SKETCH_CONFIG["hll_m"]
    cap = SKETCH_CONFIG["hll_rho_cap"]
    width = SKETCH_CONFIG["hll_rest_bits"]
    numer = _hll_alpha(m) * m * m * float(2**cap)
    bits = _bits_ladder_sql("rest", width)
    regs = (
        df.where(F.col(col).isNotNull())
        .select(
            F.col(group_col).alias("__g"),
            md5_hash60(F.col(col).cast("string")).alias("h"),
        )
        .select(
            "__g",
            (F.col("h") % m).alias("b"),
            F.expr(f"h div {m}").alias("rest"),
        )
        .select(
            "__g",
            "b",
            F.least(F.lit(width + 1) - F.expr(bits), F.lit(cap)).alias("rho"),
        )
        .groupBy("__g", "b")
        .agg(F.max("rho").alias("rho"))
    )
    agg = regs.groupBy("__g").agg(
        F.sum(
            F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {cap} - rho) AS BIGINT)")
        ).alias("__sp"),
        F.count(F.lit(1)).alias("__present"),
    )
    intsum = (
        F.col("__sp")
        + (F.lit(m) - F.col("__present")) * F.lit(int(2**cap))
    ).cast("bigint")
    return agg.select(
        F.col("__g").alias(group_col),
        intsum.alias("intsum"),
        (F.lit(m) - F.col("__present")).cast("bigint").alias("zero_regs"),
        (F.expr(dlit(numer)) / intsum.cast("double")).alias("est"),
    )


def hll_distinct_by_oracle_sql(
    table: str, group_col: str, col: str, m: int | None = None
) -> str:
    """DuckDB twin of :func:`hll_distinct_by` — identical register and
    estimate arithmetic."""
    m = m or SKETCH_CONFIG["hll_m"]
    cap = SKETCH_CONFIG["hll_rho_cap"]
    width = SKETCH_CONFIG["hll_rest_bits"]
    numer = _hll_alpha(m) * m * m * float(2**cap)
    h = md5_hash60_sql(f"CAST({col} AS VARCHAR)")
    bits = _bits_ladder_sql("rest", width)
    return f"""
        WITH hs AS (
          SELECT {group_col} AS g, {h} AS h
          FROM {table} WHERE {col} IS NOT NULL
        ), reg AS (
          SELECT g, b, max(rho) AS rho FROM (
            SELECT g, h % {m} AS b,
                   least({width + 1} - {bits.replace('rest', f'(h // {m})')},
                         {cap}) AS rho
            FROM hs
          ) GROUP BY g, b
        ), agg AS (
          SELECT g, sum((CAST(1 AS BIGINT) << ({cap} - rho))) AS sp,
                 count(*) AS present
          FROM reg GROUP BY g
        )
        SELECT g AS {group_col},
               CAST(sp + ({m} - present) * (CAST(1 AS BIGINT) << {cap})
                    AS BIGINT) AS intsum,
               CAST({m} - present AS BIGINT) AS zero_regs,
               {dlit(numer)} / CAST(sp + ({m} - present)
                   * (CAST(1 AS BIGINT) << {cap}) AS DOUBLE) AS est
        FROM agg
    """


def hll_distinct_oracle_sql(table: str, col: str, m: int | None = None) -> str:
    m = m or SKETCH_CONFIG["hll_m"]
    cap = SKETCH_CONFIG["hll_rho_cap"]
    width = SKETCH_CONFIG["hll_rest_bits"]
    numer = _hll_alpha(m) * m * m * float(2**cap)
    h = md5_hash60_sql(f"CAST({col} AS VARCHAR)")
    bits = _bits_ladder_sql("rest", width)
    return f"""
        WITH hs AS (
          SELECT {h} AS h FROM {table} WHERE {col} IS NOT NULL
        ), br AS (
          SELECT h % {m} AS b,
                 LEAST({width + 1} - {bits.replace('rest', f'(h // {m})')}, {cap}) AS rho
          FROM hs
        ), regs AS (
          SELECT r.i AS b, COALESCE(mx.rho, 0) AS rho
          FROM range(0, {m}) r(i) LEFT JOIN (
            SELECT b, max(rho) AS rho FROM br GROUP BY b
          ) mx ON mx.b = r.i
        ), agg AS (
          SELECT CAST(sum(CAST(1 AS BIGINT) << CAST({cap} - rho AS INT)) AS BIGINT) AS intsum,
                 CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_regs
          FROM regs
        )
        SELECT intsum, zero_regs,
               {dlit(numer)} / CAST(intsum AS DOUBLE) AS est
        FROM agg
    """


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def _cms_bucket(item: Column, d: int, width: int) -> Column:
    return md5_prefix_hash(F.concat(F.lit(f"cms{d}:"), item.cast("string"))) % width


def cms_table(
    df: DataFrame, col: str, depth: int | None = None, width: int | None = None
) -> DataFrame:
    """The ``depth × width`` counter matrix as ``(d, bkt, cnt)`` rows.
    One explode (×depth) + one groupBy; ≤ ``depth·width`` result rows
    regardless of input size — the whole point of the sketch.  Counter
    frames from disjoint corpora ADD (sum on (d, bkt)), which is the
    incremental/streaming merge path."""
    depth = depth or SKETCH_CONFIG["cms_depth"]
    width = width or SKETCH_CONFIG["cms_width"]
    arr = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _cms_bucket(F.col(col), d, width).alias("bkt"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(arr).alias("e"))
        .groupBy(F.col("e.d").alias("d"), F.col("e.bkt").alias("bkt"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    depth: int | None = None,
    width: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Items whose Count-Min estimate ≥ ``threshold``, as
    ``(item, est, exact)`` — ``est ≥ exact`` always (CMS overestimates
    only), so recall is 1.0 by construction and the ``exact`` column
    makes the overestimate auditable.

    ``candidates`` defaults to the distinct values of ``col`` (with
    their exact counts — fine at probe scale).  At 100 TB you pass the
    candidate stream yourself — a bottom-k hash sample or yesterday's
    heavy-hitter list — and drop the exact column; the sketch's
    guarantee (bounded counter state, no-false-negative filter) does
    not depend on how candidates are produced."""
    depth = depth or SKETCH_CONFIG["cms_depth"]
    width = width or SKETCH_CONFIG["cms_width"]
    cms = cms_table(df, col, depth, width)
    if candidates is None:
        candidates = (
            df.where(F.col(col).isNotNull())
            .groupBy(F.col(col).cast("string").alias("item"))
            .agg(F.count("*").alias("exact"))
        )
    probes = candidates.select(
        "item",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("item"), d, width).alias("bkt"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("e"),
    )
    return (
        probes.join(
            F.broadcast(cms),
            (probes["e.d"] == cms["d"]) & (probes["e.bkt"] == cms["bkt"]),
        )
        .groupBy("item", "exact")
        .agg(F.min("cnt").alias("est"))
        .where(F.col("est") >= threshold)
        .select("item", "est", "exact")
    )


def cms_heavy_hitters_oracle_sql(
    table: str,
    col: str,
    threshold: int,
    depth: int | None = None,
    width: int | None = None,
) -> str:
    depth = depth or SKETCH_CONFIG["cms_depth"]
    width = width or SKETCH_CONFIG["cms_width"]
    bkt = md5_prefix_hash_sql("'cms' || CAST(d.i AS VARCHAR) || ':' || item")
    return f"""
        WITH vals AS (
          SELECT CAST({col} AS VARCHAR) AS item FROM {table}
          WHERE {col} IS NOT NULL
        ), cms AS (
          SELECT d.i AS d, {bkt} % {width} AS bkt, count(*) AS cnt
          FROM vals, range(0, {depth}) d(i)
          GROUP BY 1, 2
        ), cand AS (
          SELECT item, count(*) AS exact FROM vals GROUP BY item
        ), probe AS (
          SELECT c.item, c.exact, cms.cnt
          FROM cand c, range(0, {depth}) d(i)
          JOIN cms ON cms.d = d.i AND cms.bkt = {bkt.replace('item', 'c.item')} % {width}
        )
        SELECT item, min(cnt) AS est, exact
        FROM probe GROUP BY item, exact
        HAVING min(cnt) >= {threshold}
    """


# ---------------------------------------------------------------------------
# Exact quantiles without a global sort
# ---------------------------------------------------------------------------


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    n_buckets: int | None = None,
) -> DataFrame:
    """EXACT ``quantile_disc``-style order statistics: for each ``p``
    return ``(p, rank, value)`` with ``rank = floor(p·(N-1)) + 1``
    (1-indexed) and ``value`` the rank-th smallest non-null ``col``.

    No global sort: job 1 is a histogram groupBy (``n_buckets``
    counts, collected — bounded driver state); the driver walks the
    cumulative counts to find, for each rank, its bucket and offset;
    job 2 row-numbers ONLY the hit buckets (window partitioned by
    bucket ⇒ each window holds ~N/B rows, never N).  The bucket
    boundary arithmetic is internal only — correctness does not depend
    on it (any bucketing yields the same order statistic), which is
    why the oracle can use a plain full sort.
    """
    n_buckets = n_buckets or SKETCH_CONFIG["quantile_buckets"]
    spark = df.sparkSession
    vals = df.where(F.col(col).isNotNull()).select(F.col(col).cast("double").alias("v"))
    stats = vals.agg(
        F.count("*").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    out_schema = "p double, rank bigint, value double"
    if not n:
        return spark.createDataFrame([], out_schema)
    ranks = {float(p): int(math.floor(p * (n - 1))) + 1 for p in probs}
    if lo == hi:
        return spark.createDataFrame(
            [(p, r, float(lo)) for p, r in sorted(ranks.items())], out_schema
        )
    span = hi - lo
    b = F.least(
        F.floor(((F.col("v") - lo) * n_buckets) / span), F.lit(n_buckets - 1)
    ).cast("int")
    hist = {
        r["b"]: r["cnt"]
        for r in vals.select(b.alias("b")).groupBy("b").agg(F.count("*").alias("cnt")).collect()
    }
    targets = []  # (bucket, offset_within_bucket, rank, p)
    for p, r in sorted(ranks.items()):
        cum = 0
        for bi in sorted(hist):
            if cum + hist[bi] >= r:
                targets.append((bi, r - cum, r, p))
                break
            cum += hist[bi]
    hit_buckets = sorted({t[0] for t in targets})
    tgt = spark.createDataFrame(
        [(bi, off, r, p) for bi, off, r, p in targets],
        "b int, off bigint, rank bigint, p double",
    )
    w = Window.partitionBy("b").orderBy("v")
    ranked = (
        vals.select("v", b.alias("b"))
        .where(F.col("b").isin(hit_buckets))
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.join(
            F.broadcast(tgt), (ranked["b"] == tgt["b"]) & (ranked["rn"] == tgt["off"])
        )
        .select("p", "rank", F.col("v").alias("value"))
        .orderBy("p")
    )


def exact_quantiles_oracle_sql(table: str, col: str, probs: list[float]) -> str:
    """Full-sort oracle: rank every non-null value once, join the rank
    targets.  The rank formula text mirrors the engine's driver-side
    ``floor(p·(N-1)) + 1`` exactly (double multiply then floor)."""
    plist = ", ".join(f"({dlit(float(p))})" for p in sorted(float(p) for p in probs))
    return f"""
        WITH vals AS (
          SELECT CAST({col} AS DOUBLE) AS v FROM {table} WHERE {col} IS NOT NULL
        ), ranked AS (
          SELECT v, row_number() OVER (ORDER BY v) AS rn FROM vals
        ), n AS (
          SELECT count(*) AS n FROM vals
        ), pr AS (
          SELECT p, CAST(floor(p * (n.n - 1)) AS BIGINT) + 1 AS rank
          FROM (VALUES {plist}) pv(p), n
        )
        SELECT pr.p AS p, pr.rank AS rank, ranked.v AS value
        FROM pr JOIN ranked ON ranked.rn = pr.rank
        ORDER BY pr.p
    """


def _grouped_quantiles_window(
    vals: DataFrame, group_col: str, probs: list[float]
) -> DataFrame:
    """Window path over ``(group_col, v)``: one shuffle on the group
    key, each window holds ONE group's rows; rank targets computed per
    group in-plan from the window count (no driver collect)."""
    w = Window.partitionBy(group_col).orderBy(F.col("v"))
    wc = Window.partitionBy(group_col)
    ranked = (
        vals.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("p"),
                (
                    F.floor(F.lit(float(p)) * (F.col("n") - 1).cast("double"))
                    .cast("bigint")
                    + 1
                ).alias("rank"),
            )
            for p in probs
        ]
    )
    hit = ranked.select(
        group_col, "v", "rn", F.explode(targets).alias("t")
    ).filter(F.col("rn") == F.col("t.rank"))
    return hit.select(
        group_col,
        F.col("t.p").alias("p"),
        F.col("t.rank").alias("rank"),
        F.col("v").alias("value"),
    )


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    col: str,
    probs: list[float],
    hot_group_threshold: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """PER-GROUP exact order statistics: for each group and each ``p``,
    ``(group_col, p, rank, value)`` with the same
    ``rank = floor(p·(n−1)) + 1`` definition as :func:`exact_quantiles`
    (``quantile_disc``; ties share values, so the rank-th smallest is
    well-defined even though row_number over ties is not — only the
    VALUE is emitted).

    Shape: ONE shuffle on the group key; each window holds one group's
    rows — fine while every group fits an executor. Past that, set
    ``hot_group_threshold`` (r9): groups with more rows than the
    threshold leave the window path and take the per-group HISTOGRAM
    route instead — the :func:`exact_quantiles` no-sort trick applied
    per hot group: one (group, bucket) count aggregate, a bounded
    driver walk of the cumulative counts (``n_hot × n_buckets``
    integers — n_hot is at most N/threshold by construction), then
    row_number over windows partitioned by ``(group, bucket)`` for the
    HIT buckets only, so no single window ever holds a whole hot
    group (~n/n_buckets rows each instead of n). The bucket arithmetic
    is internal — any bucketing yields the same order statistic — so
    results are IDENTICAL to the window path and the full-sort oracle
    regardless of the threshold."""
    probs = sorted(float(p) for p in probs)
    spark = df.sparkSession
    gtype = df.select(group_col).schema[0].dataType
    vals = (
        df.where(F.col(col).isNotNull())
        .select(F.col(group_col), F.col(col).cast("double").alias("v"))
    )
    if hot_group_threshold is None:
        return _grouped_quantiles_window(vals, group_col, probs)
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    n_buckets = n_buckets or SKETCH_CONFIG["quantile_buckets"]
    hot = (
        vals.groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .where(F.col("n") > int(hot_group_threshold))
        .collect()  # bounded: at most N/threshold groups
    )
    if not hot:
        return _grouped_quantiles_window(vals, group_col, probs)
    hot_keys = spark.createDataFrame(
        [(r[group_col],) for r in hot],
        StructType([StructField(group_col, gtype)]),
    )
    outs = [
        _grouped_quantiles_window(
            vals.join(F.broadcast(hot_keys), group_col, "left_anti"),
            group_col,
            probs,
        )
    ]
    out_schema = StructType(
        [
            StructField(group_col, gtype),
            StructField("p", DoubleType()),
            StructField("rank", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    ranks = {
        r[group_col]: [
            (p, int(math.floor(p * (r["n"] - 1))) + 1) for p in probs
        ]
        for r in hot
    }
    const_rows = [
        (r[group_col], p, rank, float(r["lo"]))
        for r in hot
        if r["lo"] == r["hi"]
        for p, rank in ranks[r[group_col]]
    ]
    if const_rows:
        outs.append(spark.createDataFrame(const_rows, out_schema))
    spread = [r for r in hot if r["lo"] != r["hi"]]
    if spread:
        hstats = spark.createDataFrame(
            [(r[group_col], float(r["lo"]), float(r["hi"])) for r in spread],
            StructType(
                [
                    StructField(group_col, gtype),
                    StructField("lo", DoubleType()),
                    StructField("hi", DoubleType()),
                ]
            ),
        )
        b = F.least(
            F.floor(
                ((F.col("v") - F.col("lo")) * n_buckets)
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(n_buckets - 1),
        ).cast("int")
        hv = (
            vals.join(F.broadcast(hstats), group_col)
            .select(group_col, "v", b.alias("b"))
        )
        hist: dict = {}
        for r in hv.groupBy(group_col, "b").agg(
            F.count("*").alias("cnt")
        ).collect():  # bounded: n_hot × n_buckets counts
            hist.setdefault(r[group_col], {})[r["b"]] = r["cnt"]
        targets = []  # (g, bucket, offset_within_bucket, rank, p)
        for r in spread:
            g = r[group_col]
            for p, rank in ranks[g]:
                cum = 0
                for bi in sorted(hist[g]):
                    if cum + hist[g][bi] >= rank:
                        targets.append((g, bi, rank - cum, rank, p))
                        break
                    cum += hist[g][bi]
        from pyspark.sql.types import IntegerType

        tgt = spark.createDataFrame(
            targets,
            StructType(
                [
                    StructField(group_col, gtype),
                    StructField("b", IntegerType()),
                    StructField("off", LongType()),
                    StructField("rank", LongType()),
                    StructField("p", DoubleType()),
                ]
            ),
        )
        w = Window.partitionBy(group_col, "b").orderBy("v")
        ranked = hv.join(
            F.broadcast(tgt.select(group_col, "b").distinct()),
            [group_col, "b"],
            "leftsemi",
        ).withColumn("rn", F.row_number().over(w))
        outs.append(
            ranked.join(
                F.broadcast(tgt),
                on=[group_col, "b"],
            )
            .where(F.col("rn") == F.col("off"))
            .select(group_col, "p", "rank", F.col("v").alias("value"))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def grouped_quantiles_oracle_sql(
    table: str, group_col: str, col: str, probs: list[float]
) -> str:
    """DuckDB twin of :func:`grouped_quantiles` — identical rank
    formula text (double multiply then floor)."""
    plist = ", ".join(
        f"({dlit(float(p))})" for p in sorted(float(p) for p in probs)
    )
    return f"""
        WITH vals AS (
          SELECT {group_col} AS g, CAST({col} AS DOUBLE) AS v,
                 row_number() OVER (
                   PARTITION BY {group_col} ORDER BY CAST({col} AS DOUBLE)
                 ) AS rn,
                 count(*) OVER (PARTITION BY {group_col}) AS n
          FROM {table} WHERE {col} IS NOT NULL
        )
        SELECT g AS {group_col}, pv.p AS p,
               CAST(floor(pv.p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
                 AS rank,
               v AS value
        FROM vals, (VALUES {plist}) pv(p)
        WHERE rn = CAST(floor(pv.p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
    """
