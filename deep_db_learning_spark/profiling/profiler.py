"""Statistical column profiler — the engine's answer to the reference's
per-column profiling SQL.

The reference issues one network round-trip per column per statistic
(`SELECT count(col) ...` ``db/schema_autodetect.py:295-310``;
``SELECT count(*) FROM (SELECT DISTINCT col ...)``
``db/distinct_cnt_retrieval.py:32-52``). At 100 TB that access pattern
is a non-starter: this profiler computes ALL column statistics for a
table in a **single aggregation job** over one scan.

Semantics preserved exactly:

- distinct counts are **null-inclusive** (the reference's subquery
  deliberately counts NULL as a category, SURVEY A1). Spark's
  ``count_distinct`` drops nulls, so we add ``max(isnull(c))``.
- non-null count = ``count(c)`` (Spark's count already skips nulls).

Scale posture: exact multi-column ``count_distinct`` in one agg uses
Catalyst's Expand (row-multiplication by #columns) — fine up to wide
tables at moderate size, but at 100 TB use ``mode="approx"`` (single
pass of HLL sketches, no Expand) or ``mode="auto"`` which refines with
exact counts only the columns whose approximate ratio lands near a
decision threshold of the schema analyzer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class ColumnStats:
    """Profile of one column (inputs to the analyzer decision tree)."""

    n_rows: int
    n_nonnull: int
    n_distinct: int  # null-inclusive, like the reference's A1
    has_null: bool
    approximate: bool = False

    @property
    def distinct_to_nonnull(self) -> float:
        """Ratio driving the categorical decision
        (``schema_autodetect.py:344-380``). Distinct count here includes
        NULL, like the reference (it divides its null-inclusive distinct
        count by the non-null count)."""
        if self.n_nonnull == 0:
            return float("inf")
        return self.n_distinct / self.n_nonnull


def _exact_aggs(columns: list[str]) -> list[Column]:
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn__{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd__{c}"))
        aggs.append(F.max(F.isnull(F.col(c)).cast("int")).alias(f"__hn__{c}"))
    return aggs


def _approx_aggs(columns: list[str], rsd: float) -> list[Column]:
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn__{c}"))
        aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"__nd__{c}"))
        aggs.append(F.max(F.isnull(F.col(c)).cast("int")).alias(f"__hn__{c}"))
    return aggs


def _row_to_stats(row, columns: list[str], approximate: bool) -> dict[str, ColumnStats]:
    n_rows = row["__n_rows"]
    out: dict[str, ColumnStats] = {}
    for c in columns:
        has_null = bool(row[f"__hn__{c}"]) if row[f"__hn__{c}"] is not None else False
        out[c] = ColumnStats(
            n_rows=n_rows,
            n_nonnull=row[f"__nn__{c}"],
            # null-inclusive distinct: count_distinct drops NULL, add it back
            n_distinct=row[f"__nd__{c}"] + (1 if has_null else 0),
            has_null=has_null,
            approximate=approximate,
        )
    return out


# complex types cannot go through count_distinct; profile only atomics
_ATOMIC_PREFIXES = (
    "int", "bigint", "smallint", "tinyint", "float", "double", "decimal",
    "string", "boolean", "date", "timestamp", "interval",
)


def profilable_columns(df: DataFrame) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString().startswith(_ATOMIC_PREFIXES)
    ]


def _input_size_bytes(df: DataFrame) -> int | None:
    """Total bytes of the scan's input files, or None when unknown
    (non-local scheme, no file source). Used to decide whether spreading
    the scan is worth a shuffle — a driver-side stat call, no job."""
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(p.path)
        except OSError:
            return None
    return total


# below this input size the Expand agg is cheaper than the repartition
# shuffle it would take to spread it (single-digit MB = well under one
# task's comfortable workload)
_REPARTITION_MIN_BYTES = 16 << 20


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    mode: str = "exact",
    rsd: float = 0.02,
    thresholds: tuple[float, ...] = (0.2,),
    max_card: int = 1000,
) -> dict[str, ColumnStats]:
    """Profile all (atomic) columns of ``df`` in one aggregation.

    ``mode``: ``"exact"`` | ``"approx"`` | ``"auto"``. Auto runs the
    cheap HLL pass first and re-profiles exactly only columns whose
    approximate decision is ambiguous: ratio within ±3·rsd of a
    threshold in ``thresholds``, or distinct count within ±3·rsd of
    ``max_card`` — the reference's decision points
    (``schema_autodetect.py:162-180``).
    """
    cols = columns if columns is not None else profilable_columns(df)
    if not cols:
        return {}
    # project first (column pruning), then spread a single-file scan:
    # the Expand behind multi-column count_distinct multiplies rows by
    # #columns, and with one input partition that all lands on one core
    df = df.select(cols)
    size = _input_size_bytes(df)
    if size is None or size > _REPARTITION_MIN_BYTES:
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    if mode == "exact":
        row = df.agg(*_exact_aggs(cols)).collect()[0]
        return _row_to_stats(row, cols, approximate=False)
    row = df.agg(*_approx_aggs(cols, rsd)).collect()[0]
    stats = _row_to_stats(row, cols, approximate=True)
    if mode == "approx":
        return stats
    # mode == "auto": exact refinement near decision boundaries
    tol = 3.0 * rsd
    ambiguous = []
    for c, s in stats.items():
        if s.n_nonnull == 0:
            continue
        ratio = s.distinct_to_nonnull
        near_ratio = any(abs(ratio - t) <= tol * max(ratio, t) for t in thresholds)
        near_card = abs(s.n_distinct - max_card) <= tol * max_card
        if near_ratio or near_card or s.n_distinct <= max_card:
            # any column that might be categorical needs its EXACT
            # cardinality anyway (dict-encode requires it, F12)
            ambiguous.append(c)
    if ambiguous:
        row = df.agg(*_exact_aggs(ambiguous)).collect()[0]
        stats.update(_row_to_stats(row, ambiguous, approximate=False))
    return stats


def distinct_count_including_null(df: DataFrame, column: str) -> int:
    """A1 verbatim: ``SELECT count(*) FROM (SELECT DISTINCT col FROM t)``
    (``db/distinct_cnt_retrieval.py:32-52``). Prefer :func:`profile_table`
    for bulk profiling; this exists for parity and spot checks."""
    return df.select(column).distinct().count()


def profile_database(
    tables: dict[str, DataFrame], mode: str = "exact", **kw
) -> dict[str, dict[str, ColumnStats]]:
    """One profiling job per table. Jobs are independent — on a cluster
    they can be submitted from concurrent driver threads; at local scale
    sequential submission is fine because each job saturates the cores."""
    return {t: profile_table(df, mode=mode, **kw) for t, df in tables.items()}


def numeric_stats(df: DataFrame, num_cols: list[str]) -> DataFrame:
    """A10 extension (torch_frame numeric ``StatType`` analog): per-
    column n / mean / min / max / sample-std for every numeric column
    in ONE scan — long-format output, all JVM-side (``stack`` unpivot,
    no collect).

    Sums and sums-of-squares fold through decimal so mean/std are
    bitwise-reproducible under any partitioning and across engines
    (std = sqrt((Σx² − (Σx)²/n)/(n−1)) evaluated in IEEE double from
    identical decimal-exact inputs)."""
    if not num_cols:
        raise ValueError("num_cols must be non-empty")
    aggs: list[Column] = []
    for c in num_cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__n__{c}"),
            F.sum(col.cast("decimal(30,9)")).cast("double").alias(f"__s__{c}"),
            # (18,6) operands keep the product inside decimal(38,·) on
            # every engine; inputs have ≲6 fractional digits so the
            # fold stays exact
            F.sum(col.cast("decimal(18,6)") * col.cast("decimal(18,6)"))
            .cast("double")
            .alias(f"__s2__{c}"),
            F.min(col).cast("double").alias(f"__mn__{c}"),
            F.max(col).cast("double").alias(f"__mx__{c}"),
        ]
    stack_args = ", ".join(
        f"'{c}', __n__{c}, __s__{c}, __s2__{c}, __mn__{c}, __mx__{c}"
        for c in num_cols
    )
    long = df.agg(*aggs).select(
        F.expr(
            f"stack({len(num_cols)}, {stack_args}) AS "
            "(column_name, n, __s, __s2, min, max)"
        )
    )
    return long.select(
        "column_name",
        "n",
        (F.col("__s") / F.col("n")).alias("mean"),
        "min",
        "max",
        F.when(
            F.col("n") > 1,
            F.sqrt(
                (F.col("__s2") - F.col("__s") * F.col("__s") / F.col("n"))
                / (F.col("n") - 1)
            ),
        ).alias("std"),
    )


def pairwise_correlations(df: DataFrame, num_cols: list[str]) -> DataFrame:
    """Pairwise-complete Pearson correlations of the numeric columns in
    ONE scan: ``(col_a, col_b, n, corr)`` for every unordered pair
    (``col_a < col_b`` lexicographically) — the feature-selection /
    redundancy primitive the profiler feeds. Each pair's statistics are
    restricted to rows where BOTH columns are non-null (pairwise
    deletion), so the per-pair ``n`` differs.

    Determinism: all five sums fold through decimal — plain sums at
    (30,9), cross/square products as (18,6)·(18,6) DECIMAL MULTIPLIES
    (casting each FACTOR is unambiguous cross-engine; casting a double
    product is not — the tpch_q11 lesson) — and the correlation is then
    pure IEEE double arithmetic over those exact inputs, mirrored
    term-for-term by :func:`pairwise_correlations_oracle_sql`. The
    variance terms clamp at 0 (decimal rounding of x vs x·x cancels to
    tiny negatives on constant columns); a zero denominator yields NULL
    (undefined), never 0."""
    pairs = [
        (a, b)
        for i, a in enumerate(sorted(num_cols))
        for b in sorted(num_cols)[i + 1 :]
    ]
    if not pairs:
        raise ValueError("need at least two columns")
    aggs: list[Column] = []
    for i, (a, b) in enumerate(pairs):
        ca, cb = F.col(a), F.col(b)
        both = ca.isNotNull() & cb.isNotNull()
        va = F.when(both, ca)
        vb = F.when(both, cb)
        d6 = "decimal(18,6)"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"__n_{i}"),
            F.sum(va.cast("decimal(30,9)")).cast("double").alias(f"__sa_{i}"),
            F.sum(vb.cast("decimal(30,9)")).cast("double").alias(f"__sb_{i}"),
            F.sum(va.cast(d6) * va.cast(d6)).cast("double").alias(f"__saa_{i}"),
            F.sum(vb.cast(d6) * vb.cast(d6)).cast("double").alias(f"__sbb_{i}"),
            F.sum(va.cast(d6) * vb.cast(d6)).cast("double").alias(f"__sab_{i}"),
        ]
    stack_args = ", ".join(
        f"'{a}', '{b}', __n_{i}, __sa_{i}, __sb_{i}, __saa_{i}, __sbb_{i}, __sab_{i}"
        for i, (a, b) in enumerate(pairs)
    )
    long = df.agg(*aggs).select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS "
            "(col_a, col_b, n, __sa, __sb, __saa, __sbb, __sab)"
        )
    )
    nn = F.col("n").cast("double")
    num = nn * F.col("__sab") - F.col("__sa") * F.col("__sb")
    var_a = F.greatest(nn * F.col("__saa") - F.col("__sa") * F.col("__sa"), F.lit(0.0))
    var_b = F.greatest(nn * F.col("__sbb") - F.col("__sb") * F.col("__sb"), F.lit(0.0))
    den = F.sqrt(var_a) * F.sqrt(var_b)
    return long.select(
        "col_a",
        "col_b",
        "n",
        F.when(den > 0.0, num / den).alias("corr"),
    )


def pairwise_correlations_oracle_sql(table: str, num_cols: list[str]) -> str:
    """DuckDB twin of :func:`pairwise_correlations` — the identical
    expression tree ((19,6) factor casts force int128 storage, see
    ``_sumsq_sql`` in the entry; VARCHAR hop for the correctly-rounded
    doubles)."""

    def d2(x: str) -> str:
        return f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"

    cols = sorted(num_cols)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    selects = []
    for a, b in pairs:
        both = f"{a} IS NOT NULL AND {b} IS NOT NULL"
        va = f"CASE WHEN {both} THEN {a} END"
        vb = f"CASE WHEN {both} THEN {b} END"
        sa = d2(f"sum(CAST({va} AS DECIMAL(30,9)))")
        sb = d2(f"sum(CAST({vb} AS DECIMAL(30,9)))")
        saa = d2(f"sum(CAST({va} AS DECIMAL(19,6)) * CAST({va} AS DECIMAL(19,6)))")
        sbb = d2(f"sum(CAST({vb} AS DECIMAL(19,6)) * CAST({vb} AS DECIMAL(19,6)))")
        sab = d2(f"sum(CAST({va} AS DECIMAL(19,6)) * CAST({vb} AS DECIMAL(19,6)))")
        selects.append(
            f"""
            SELECT '{a}' AS col_a, '{b}' AS col_b,
                   count(CASE WHEN {both} THEN 1 END) AS n,
                   {sa} AS sa, {sb} AS sb, {saa} AS saa,
                   {sbb} AS sbb, {sab} AS sab
            FROM {table}
            """
        )
    base = " UNION ALL ".join(selects)
    return f"""
        SELECT col_a, col_b, n,
               CASE WHEN sqrt(greatest(CAST(n AS DOUBLE) * saa - sa * sa, 0.0))
                       * sqrt(greatest(CAST(n AS DOUBLE) * sbb - sb * sb, 0.0))
                       > 0.0
                    THEN (CAST(n AS DOUBLE) * sab - sa * sb)
                         / (sqrt(greatest(CAST(n AS DOUBLE) * saa - sa * sa, 0.0))
                            * sqrt(greatest(CAST(n AS DOUBLE) * sbb - sb * sb, 0.0)))
               END AS corr
        FROM ({base})
    """


def key_skew_report(
    df: DataFrame, col: str, k: int = 10
) -> DataFrame:
    """Join-key skew diagnostics — the pre-join report that decides
    between a plain shuffle join, AQE skew splitting, and salting at
    scale: the ``k`` heaviest key values with their row share, plus the
    skew factor (heaviest key count / mean rows per key — 1.0 is
    perfectly uniform). One groupBy + a sort-limit (no global sort);
    NULL keys are a real (often the heaviest) group and are reported as
    such. Output: ``(rank, key, cnt, share, skew_factor)`` — ``key``
    stringified so the report is column-type-agnostic; share and
    skew_factor are single divisions of exact counts."""
    counts = df.groupBy(F.col(col).alias("__k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__n_rows"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("__k"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("__k"))
            ),
        )
    )
    return top.crossJoin(F.broadcast(totals)).select(
        "rank",
        F.col("__k").cast("string").alias("key"),
        "cnt",
        (F.col("cnt").cast("double") / F.col("__n_rows").cast("double"))
        .alias("share"),
        (
            F.col("cnt").cast("double")
            / (F.col("__n_rows").cast("double") / F.col("__n_keys").cast("double"))
        ).alias("skew_factor"),
    )


def key_skew_report_oracle_sql(table: str, col: str, k: int = 10) -> str:
    """DuckDB twin of :func:`key_skew_report` (identical tie-break and
    double expressions; NULLS FIRST on the key tiebreak mirrors Spark's
    ascending-null-first default)."""
    return f"""
        WITH counts AS (
          SELECT {col} AS k, count(*) AS cnt FROM {table} GROUP BY 1
        ), tot AS (
          SELECT sum(cnt) AS n_rows, count(*) AS n_keys FROM counts
        ), top AS (
          SELECT k, cnt,
                 row_number() OVER (
                   ORDER BY cnt DESC, k ASC NULLS FIRST) AS rank
          FROM counts
          ORDER BY cnt DESC, k ASC NULLS FIRST LIMIT {int(k)}
        )
        SELECT rank, CAST(k AS VARCHAR) AS key, cnt,
               CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS share,
               CAST(cnt AS DOUBLE)
                 / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
                 AS skew_factor
        FROM top, tot
    """


def imputation_stats(
    df: DataFrame, num_cols: list[str] = (), cat_cols: list[str] = ()
) -> dict[str, tuple[str, object]]:
    """A10 / N5 inputs: per-column imputation values — MEAN for numeric
    columns, MOST_FREQUENT for categoricals (torch_frame ``StatType``
    semantics, ``experiments/blueprint_instances/utils.py:26-33``).

    One aggregation computes every mean AND every mode: modes use
    ``mode()`` (Spark 3.4+), keeping this a single scan at any scale.
    Returns a strategy dict consumable by
    :func:`~..operators.embedder.impute_values`.
    """
    aggs: list[Column] = []
    for c in num_cols:
        aggs.append(F.avg(F.col(c)).alias(f"__mean__{c}"))
    for c in cat_cols:
        aggs.append(F.mode(F.col(c)).alias(f"__mode__{c}"))
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0]
    out: dict[str, tuple[str, object]] = {}
    for c in num_cols:
        out[c] = ("mean", row[f"__mean__{c}"])
    for c in cat_cols:
        out[c] = ("most_frequent", row[f"__mode__{c}"])
    return out
