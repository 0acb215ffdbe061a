"""Declarative data-quality validation (deequ-style expectations).

The reference *discovers* constraints (PK/FK via
``db_transformer/db/schema_autodetect.py`` and live
``information_schema``) but never *verifies* them against the data; on
a 100 TB ingest you must — upstream systems drift, and a silently
violated FK poisons every downstream join and training run. This
module turns the catalog's constraints plus user expectations into
measurable checks:

- :func:`check_primary_keys` — duplicate-key groups per declared PK;
- :func:`check_foreign_keys` — orphaned FK values (left-anti against
  the referenced table; NULL FKs are not orphans, matching the
  null-safe join semantics of ``operators/graph``);
- :func:`expect` / :func:`run_expectations` — per-column expectations
  (``not_null``, ``unique``, ``in_set``, ``between``, ``matches``)
  evaluated for a whole table in ONE conditional-aggregate scan (the
  same single-shuffle shape as ``operators/reshape.pivot_agg``), each
  yielding (violations, total, pass) rows.

Scale posture: every check is an aggregate or an anti-join — no
collects beyond the per-check scalar rows; FK orphan checks broadcast
the referenced key set only when the dimension is provably small
(Spark's own threshold decides — no hint is forced on a fact-fact FK).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_primary_keys(db) -> DataFrame:
    """One row per declared PK: ``(table, pk_cols, n_rows, n_keys,
    n_dup_keys)`` — a healthy PK has ``n_rows == n_keys`` and zero
    ``n_dup_keys`` (count of key VALUES that occur more than once,
    NULL-inclusive: a duplicated NULL key is still a violation)."""
    outs = []
    for t, pk in sorted(db.primary_keys.items()):
        if not pk:
            continue
        df = db.df(t)
        per_key = df.groupBy(*pk).agg(F.count(F.lit(1)).alias("__n"))
        agg = per_key.agg(
            F.sum("__n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("__n") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        ).select(
            F.lit(t).alias("table"),
            F.lit(",".join(pk)).alias("pk_cols"),
            F.col("n_rows").cast("long"),
            "n_keys",
            F.col("n_dup_keys").cast("long"),
        )
        outs.append(agg)
    if not outs:
        raise ValueError("no primary keys declared")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def check_foreign_keys(db) -> DataFrame:
    """One row per declared FK: ``(table, fk_cols, ref_table, n_rows,
    n_orphans)``. An orphan is a row whose FK tuple is fully non-NULL
    yet matches no referenced key (left-anti join); partially/fully
    NULL FK tuples are skipped, as in SQL's MATCH SIMPLE."""
    outs = []
    for t, fks in sorted(db.foreign_keys.items()):
        df = db.df(t)
        for fk in fks:
            ref = db.df(fk.ref_table).select(
                *[F.col(rc).alias(f"__ref_{i}") for i, rc in enumerate(fk.ref_columns)]
            ).distinct()
            nn = df
            for c in fk.columns:
                nn = nn.filter(F.col(c).isNotNull())
            cond = [
                nn[c] == ref[f"__ref_{i}"] for i, c in enumerate(fk.columns)
            ]
            one = (
                nn.join(ref, cond, "left_anti")
                .agg(F.count(F.lit(1)).alias("n_orphans"))
                .crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows")))
                .select(
                    F.lit(t).alias("table"),
                    F.lit(",".join(fk.columns)).alias("fk_cols"),
                    F.lit(fk.ref_table).alias("ref_table"),
                    "n_rows",
                    "n_orphans",
                )
            )
            outs.append(one)
    if not outs:
        raise ValueError("no foreign keys declared")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@dataclass
class Expectation:
    """One column expectation. ``kind`` ∈ {not_null, unique, in_set,
    between, matches}; ``arg`` is the set / (lo, hi) / regex."""

    column: str
    kind: str
    arg: object = None
    name: str = field(default="")

    def __post_init__(self):
        if self.kind not in ("not_null", "unique", "in_set", "between", "matches"):
            raise ValueError(f"unknown expectation kind: {self.kind!r}")
        if not self.name:
            self.name = f"{self.column}:{self.kind}"

    def violation_expr(self):
        """Row-level violation predicate (NULL rows only violate
        not_null — range/set/regex expectations skip NULLs, compose
        with not_null to forbid them)."""
        c = F.col(self.column)
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "in_set":
            return c.isNotNull() & ~c.isin(list(self.arg))
        if self.kind == "between":
            lo, hi = self.arg
            return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
        if self.kind == "matches":
            return c.isNotNull() & ~c.rlike(self.arg)
        raise AssertionError(self.kind)  # unique handled separately


def expect(column: str, kind: str, arg=None, name: str = "") -> Expectation:
    return Expectation(column, kind, arg, name)


def quarantine(
    df: DataFrame,
    expectations: list[Expectation],
    reasons_col: str = "__failed",
) -> tuple[DataFrame, DataFrame]:
    """Row-level ingest gate: split ``df`` into (clean, quarantined)
    on the row-wise expectations (``unique`` is a dataset property, not
    a row property — rejected here; run it via
    :func:`run_expectations`). The quarantined frame carries
    ``reasons_col``, the array of failed expectation names — route it
    to a dead-letter sink instead of dropping it silently. One
    row-local projection, zero shuffles, streaming-safe (usable inside
    ``foreachBatch`` or directly on a streaming frame)."""
    bad = [e for e in expectations if e.kind == "unique"]
    if bad:
        raise ValueError(
            f"unique is not a row-level expectation: {[e.name for e in bad]}"
        )
    reasons = F.array_compact(
        F.array(
            *[
                F.when(e.violation_expr(), F.lit(e.name))
                for e in expectations
            ]
        )
    )
    tagged = df.withColumn(reasons_col, reasons)
    clean = tagged.filter(F.size(reasons_col) == 0).drop(reasons_col)
    dirty = tagged.filter(F.size(reasons_col) > 0)
    return clean, dirty


def run_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """Evaluate all expectations in one pass: row-level kinds fold into
    ONE conditional-aggregate scan; ``unique`` kinds each add one
    distinct-count (grouped into the same job via n_rows −
    countDistinct, NULL-inclusive). Returns ``(name, violations,
    total, pass)`` rows."""
    rowwise = [e for e in expectations if e.kind != "unique"]
    uniques = [e for e in expectations if e.kind == "unique"]
    aggs = [F.count(F.lit(1)).alias("__total")]
    for e in rowwise:
        aggs.append(
            F.sum(e.violation_expr().cast("long")).alias(f"__v_{e.name}")
        )
    for e in uniques:
        # NULL-inclusive distinct: count_distinct skips NULLs, so add
        # one when any NULL exists (two NULLs still collide → counted
        # through n_rows - n_distinct like the profiler's A1)
        aggs.append(
            (
                F.count_distinct(F.col(e.column))
                + F.max(F.col(e.column).isNull().cast("long"))
            ).alias(f"__d_{e.name}")
        )
    row = df.agg(*aggs)
    parts = []
    for e in rowwise:
        parts.append(
            row.select(
                F.lit(e.name).alias("name"),
                F.col(f"__v_{e.name}").alias("violations"),
                F.col("__total").alias("total"),
            )
        )
    for e in uniques:
        parts.append(
            row.select(
                F.lit(e.name).alias("name"),
                (F.col("__total") - F.col(f"__d_{e.name}"))
                .cast("long")
                .alias("violations"),
                F.col("__total").alias("total"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "name",
        F.coalesce("violations", F.lit(0)).alias("violations"),
        "total",
        (F.coalesce("violations", F.lit(0)) == 0).alias("pass"),
    )


def population_stability(
    df_ref: DataFrame,
    df_cur: DataFrame,
    col: str,
    n_bins: int = 10,
    epsilon: float = 1e-6,
):
    """Population Stability Index between a reference and a current
    snapshot of a numeric column — the standard drift monitor for
    features and scores (rule of thumb: < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted). Bins are the REFERENCE's exact equal-frequency
    quantile cuts (``operators/sketch.exact_quantiles`` — no global
    sort), so the reference distribution is uniform over bins by
    construction and drift shows up as current-side mass imbalance.

    Returns ``(per_bin, psi)``: a DataFrame with one row per bin
    (``bin, n_ref, n_cur, p_ref, p_cur, contrib``) and the total PSI as
    a float. The two scans produce exact integer counts; fractions are
    ``epsilon``-floored (a PSI convention — an empty bin would make the
    log ratio infinite) and the log arithmetic runs DRIVER-SIDE in
    python over those exact counts, so the number is engine-independent
    (the same recipe as the BM25 idf literals). Bounded driver state:
    2·n_bins counts."""
    import math

    from ..operators.sketch import exact_quantiles

    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = [
        r["value"]
        for r in sorted(
            exact_quantiles(df_ref, col, probs).collect(),
            key=lambda r: r["p"],
        )
    ]
    c = F.col(col)
    expr = F.lit(0)
    for cut in cuts:
        expr = expr + (c > F.lit(cut)).cast("int")
    bin_col = F.when(c.isNull(), None).otherwise(expr)

    def counts(df):
        rows = (
            df.select(bin_col.alias("__b"))
            .where(F.col("__b").isNotNull())
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {r["__b"]: r["n"] for r in rows}

    ref, cur = counts(df_ref), counts(df_cur)
    n_ref = sum(ref.values())
    n_cur = sum(cur.values())
    if not n_ref or not n_cur:
        raise ValueError("population_stability: empty side")
    out = []
    psi = 0.0
    for b in range(n_bins):
        nr, nc = ref.get(b, 0), cur.get(b, 0)
        pr = max(nr / n_ref, epsilon)
        pc = max(nc / n_cur, epsilon)
        contrib = (pc - pr) * math.log(pc / pr)
        psi += contrib
        out.append((b, nr, nc, pr, pc, contrib))
    spark = df_ref.sparkSession
    per_bin = spark.createDataFrame(
        out,
        "bin int, n_ref bigint, n_cur bigint, p_ref double, "
        "p_cur double, contrib double",
    )
    return per_bin, psi


def stream_population_stability(
    stream: DataFrame,
    df_ref: DataFrame,
    col: str,
    out_path: str,
    checkpoint: str,
    n_bins: int = 10,
    epsilon: float = 1e-6,
    query_name: str = "psi_monitor",
):
    """Per-micro-batch PSI monitoring: the reference's exact quantile
    cuts are computed ONCE driver-side, then each arriving batch costs
    one bounded count aggregate; the batch's PSI row
    ``(batch_id, n_cur, psi)`` plus its per-bin frame land in a
    ``batch=<id>`` overwrite partition (``streaming/partdir`` layout —
    a replayed batch rewrites the same rows, so the monitor is
    replay-idempotent without a cursor). Read the monitor with
    ``streaming.partdir.read_parts`` and alert on the 0.1/0.25
    thresholds downstream."""
    import math
    import os

    from ..operators.sketch import exact_quantiles

    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = [
        r["value"]
        for r in sorted(
            exact_quantiles(df_ref, col, probs).collect(),
            key=lambda r: r["p"],
        )
    ]
    c = F.col(col)
    expr = F.lit(0)
    for cut in cuts:
        expr = expr + (c > F.lit(cut)).cast("int")
    bin_col = F.when(c.isNull(), None).otherwise(expr)
    ref_rows = (
        df_ref.select(bin_col.alias("__b"))
        .where(F.col("__b").isNotNull())
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ref = {r["__b"]: r["n"] for r in ref_rows}
    n_ref = sum(ref.values())
    spark = stream.sparkSession

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.select(bin_col.alias("__b"))
            .where(F.col("__b").isNotNull())
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        cur = {r["__b"]: r["n"] for r in rows}
        n_cur = sum(cur.values())
        bins = []
        psi = 0.0
        for b in range(n_bins):
            nr, nc = ref.get(b, 0), cur.get(b, 0)
            pr = max(nr / n_ref, epsilon)
            pc = max(nc / n_cur, epsilon) if n_cur else epsilon
            contrib = (pc - pr) * math.log(pc / pr)
            psi += contrib
            bins.append((batch_id, b, nr, nc, pr, pc, contrib))
        out = [row + (psi, n_cur) for row in bins]
        frame = spark.createDataFrame(
            out,
            "batch_id bigint, bin int, n_ref bigint, n_cur bigint, "
            "p_ref double, p_cur double, contrib double, psi double, "
            "n_batch bigint",
        )
        frame.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(monitor)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
