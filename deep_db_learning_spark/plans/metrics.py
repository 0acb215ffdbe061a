"""Evaluation metrics as aggregations (SURVEY N24).

The reference computes CrossEntropy/MSE/MAE/NRMSE/accuracy in its
Lightning wrapper (``nn/lightning/lightning_wrapper.py:36-96``). Each
is a one-pass distributed aggregation here — no collect, no MLlib
evaluator object needed (though MLlib evaluators work on the same
DataFrames).

Determinism: every float reduction goes through the exact decimal fold
(``functions/exact_agg``), so a metric is bit-identical across runs,
partitionings, and engines — metrics gate model promotion decisions,
which makes run-to-run jitter a correctness bug, not a rounding nit.
The ``*_df`` forms return one-row DataFrames (composable / driver-
checkable); the dict forms collect them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact_agg import DECIMAL_TYPE


def _exact_mean(c) -> F.Column:
    # divide by the NON-NULL count — avg() semantics: rows whose term is
    # NULL (e.g. predictions attached by a left join) stay out of both
    # numerator and denominator, instead of silently deflating the mean
    return F.sum(c.cast(DECIMAL_TYPE)).cast("double") / F.count(c)


def classification_metrics_df(
    df: DataFrame, label: str = "label", pred: str = "prediction"
) -> DataFrame:
    """(accuracy, n) — exact: a ratio of two counts. NULL comparisons
    (missing pred or label) are excluded from both counts, matching
    ``avg((pred = label)::double)``."""
    cmp = F.col(pred) == F.col(label)
    return df.agg(
        (F.count(F.when(cmp, 1)) / F.count(cmp)).alias("accuracy"),
        F.count(cmp).alias("n"),
    )


def classification_metrics(
    df: DataFrame, label: str = "label", pred: str = "prediction"
) -> dict[str, float]:
    row = classification_metrics_df(df, label, pred).collect()[0]
    return {"accuracy": row["accuracy"], "n": row["n"]}


def regression_metrics_df(
    df: DataFrame, label: str = "label", pred: str = "prediction"
) -> DataFrame:
    """(mse, mae, nrmse, n) via exact decimal folds (err² for the
    magnitudes these pipelines see fits decimal(30,9)'s 21 integer
    digits)."""
    err = F.col(pred) - F.col(label)
    agg = df.agg(
        _exact_mean(err * err).alias("mse"),
        _exact_mean(F.abs(err)).alias("mae"),
        _exact_mean(F.col(label)).alias("mean_y"),
        F.count(err).alias("n"),
    )
    return agg.select(
        "mse",
        "mae",
        F.when(F.col("mean_y") != 0, F.sqrt(F.col("mse")) / F.col("mean_y")).alias(
            "nrmse"
        ),
        "n",
    )


def regression_metrics(
    df: DataFrame, label: str = "label", pred: str = "prediction"
) -> dict[str, float]:
    row = regression_metrics_df(df, label, pred).collect()[0]
    nrmse = row["nrmse"]
    return {
        "mse": row["mse"],
        "mae": row["mae"],
        "nrmse": float("nan") if nrmse is None else nrmse,
        "n": row["n"],
    }


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> float:
    """EXACT ROC-AUC of a score column against a 0/1 label, distributed
    with NO global-rank window — the metric that evaluates the r10
    quality filter (and any ranker) at corpus scale.

    AUC is the Mann-Whitney U statistic normalized by n_pos·n_neg;
    with ties it needs MIDRANKS. Two facts keep everything integer:

    - ranks come from the classic two-phase distributed rank
      (range-partition on the score, per-partition ``row_number``,
      cumulative per-partition-count offsets — the suffix-array
      recipe; the only single-partition work is the cumsum over ≤
      ``shuffle.partitions`` counts);
    - within a tie group the row numbers are CONSECUTIVE (the sort key
      is the score alone), so twice the group's midrank is the exact
      integer ``min_rank + max_rank`` — no division until the end, and
      the intra-group row order (arbitrary under ties) cancels out.

    ``AUC = (Σ_g n_pos_g·(min_g+max_g)/2 − n_pos(n_pos+1)/2)
            / (n_pos·n_neg)``

    computed from exact BIGINT aggregates; the single float division
    happens driver-side in python, so the value is engine-independent
    (pytest pins a pair-counting python replay bit-for-bit and the
    DuckDB rank-window twin). NULL scores/labels are excluded; raises
    if either class is absent (AUC undefined)."""
    from pyspark.sql.window import Window

    rows = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    )
    parts = rows.repartitionByRange(F.col("__s"))
    local = parts.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__lr",
        F.row_number().over(Window.partitionBy("__pid").orderBy("__s")),
    )
    counts = local.groupBy("__pid").agg(F.max("__lr").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    ranked = local.join(F.broadcast(offs), "__pid").select(
        "__s", "__y", (F.col("__lr") + F.col("__off")).alias("__rn")
    )
    grp = ranked.groupBy("__s").agg(
        F.min("__rn").alias("__lo"),
        F.max("__rn").alias("__hi"),
        F.sum("__y").alias("__np"),
    )
    agg = grp.agg(
        F.sum(F.col("__np") * (F.col("__lo") + F.col("__hi"))).alias("s2"),
        F.sum("__np").alias("npos"),
        F.sum(F.col("__hi") - F.col("__lo") + 1).alias("n"),
    ).first()
    n_pos = int(agg["npos"] or 0)
    n = int(agg["n"] or 0)
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("binary_auc: needs both classes present")
    # Σ midrank over positives = s2/2 (s2 is always even per group? no —
    # n_pos_g·(lo+hi) can be odd; keep the /2 in exact python rationals)
    num2 = int(agg["s2"]) - n_pos * (n_pos + 1)  # 2·(U statistic)
    return num2 / (2.0 * n_pos * n_neg)


def binary_auc_sql(table: str, score_col: str, label_col: str) -> str:
    """DuckDB twin of :func:`binary_auc` — midranks via the identical
    per-score-group (min_rank + max_rank) integer arithmetic over a
    rank window; returns one row ``(num2, npos, n)`` so the python
    caller applies the IDENTICAL final division."""
    return f"""
        WITH r AS (
          SELECT {score_col} AS s, CAST({label_col} AS INT) AS y,
                 row_number() OVER (ORDER BY {score_col}) AS rn
          FROM {table}
          WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
        ), g AS (
          SELECT s, min(rn) AS lo, max(rn) AS hi, sum(y) AS np
          FROM r GROUP BY s
        )
        SELECT CAST(sum(np * (lo + hi)) AS BIGINT) AS s2,
               CAST(sum(np) AS BIGINT) AS npos,
               CAST(sum(hi - lo + 1) AS BIGINT) AS n
        FROM g
    """


def threshold_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    probs: list[float] | None = None,
) -> DataFrame:
    """Precision/recall/F1 at score-quantile thresholds — the PR-curve
    points that pick a quality filter's operating cutoff. Thresholds
    are the EXACT score order statistics at ``probs``
    (``operators/sketch.exact_quantiles`` — no global sort), then ONE
    conditional-aggregate scan computes every threshold's confusion
    counts (4·n_thresholds integer sums — the compiled-pivot shape,
    one shuffle); the ratio columns are plain double divisions of
    exact BIGINTs, identical in any engine. Returns
    ``(p, threshold, tp, fp, fn, tn, precision, recall, f1)``
    (NULL ratios where a denominator is 0); positives = ``score ≥
    threshold``."""
    from ..operators.sketch import exact_quantiles

    probs = probs or [i / 10 for i in range(1, 10)]
    rows = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    )
    cuts = sorted(
        (r["p"], r["value"])
        for r in exact_quantiles(rows, "__s", sorted(set(probs))).collect()
    )
    aggs = []
    for i, (_p, t) in enumerate(cuts):
        pos = F.col("__s") >= F.lit(float(t))
        y = F.col("__y") == 1
        aggs += [
            F.sum((pos & y).cast("long")).alias(f"tp{i}"),
            F.sum((pos & ~y).cast("long")).alias(f"fp{i}"),
            F.sum((~pos & y).cast("long")).alias(f"fn{i}"),
            F.sum((~pos & ~y).cast("long")).alias(f"tn{i}"),
        ]
    wide = rows.agg(*aggs)
    out = None
    for i, (p, t) in enumerate(cuts):
        tp, fp, fn = F.col(f"tp{i}"), F.col(f"fp{i}"), F.col(f"fn{i}")
        prec = F.when(tp + fp > 0, tp.cast("double") / (tp + fp))
        rec = F.when(tp + fn > 0, tp.cast("double") / (tp + fn))
        f1 = F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tp > 0),
            2.0 * (prec * rec) / (prec + rec),
        )
        row = wide.select(
            F.lit(float(p)).alias("p"),
            F.lit(float(t)).alias("threshold"),
            tp.alias("tp"), fp.alias("fp"),
            fn.alias("fn"), F.col(f"tn{i}").alias("tn"),
            prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def grouped_binary_auc(
    df: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Per-group exact ROC-AUC — :func:`binary_auc`'s integer-midrank
    arithmetic with the ranks from a GROUP-PARTITIONED window
    (per-group ranks scale; the single-reducer problem is specific to
    global ranks). Returns ``(group_col, n_pos, n_neg, auc)`` with
    ``auc`` NULL where a group lacks one class (the scalar form raises
    — a per-group report should survive degenerate groups). The
    division runs in-plan over exact BIGINTs — deterministic IEEE on
    identical operands."""
    from pyspark.sql.window import Window

    rows = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    )
    w = Window.partitionBy("__g").orderBy("__s")
    ranked = rows.withColumn("__rn", F.row_number().over(w))
    grp = ranked.groupBy("__g", "__s").agg(
        F.min("__rn").alias("__lo"),
        F.max("__rn").alias("__hi"),
        F.sum("__y").alias("__np"),
    )
    agg = grp.groupBy("__g").agg(
        F.sum(F.col("__np") * (F.col("__lo") + F.col("__hi"))).alias("__s2"),
        F.sum("__np").alias("__npos"),
        F.sum(F.col("__hi") - F.col("__lo") + 1).alias("__n"),
    )
    npos = F.col("__npos")
    nneg = F.col("__n") - npos
    num2 = F.col("__s2") - npos * (npos + 1)
    return agg.select(
        F.col("__g").alias(group_col),
        npos.alias("n_pos"),
        nneg.alias("n_neg"),
        F.when(
            (npos > 0) & (nneg > 0),
            num2.cast("double") / (2.0 * npos * nneg),
        ).alias("auc"),
    )


def calibration_table(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability table — the calibration read of a scorer: bin the
    scores into ``n_bins`` EQUAL-FREQUENCY bins (exact score order
    statistics via ``operators/sketch.exact_quantiles`` — no global
    sort), and per bin report ``(bin, n, n_pos, mean_score, pos_rate,
    gap)`` with ``mean_score`` an exact decimal fold, ``pos_rate`` a
    single division of exact BIGINTs, and ``gap = pos_rate −
    mean_score`` (meaningful as a calibration error when the score IS
    a probability; for a raw logit the table is still the empirical
    response curve). One grouped aggregate over the corpus; bin
    boundaries use the half-open ``score > cut`` rule (ties fall to
    the lower bin — the ``quantile_hist`` convention), so with heavy
    score ties some bins may be empty and others hold more than N/n
    rows — exactness over prettiness. Every emitted double is
    engine-independent (pytest pins the DuckDB twin bitwise)."""
    from ..operators.sketch import exact_quantiles

    if n_bins < 2:
        raise ValueError("calibration_table: n_bins must be >= 2")
    rows = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    )
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = [
        r["value"]
        for r in sorted(
            exact_quantiles(rows, "__s", probs).collect(),
            key=lambda r: r["p"],
        )
    ]
    b = F.lit(0)
    for c in cuts:
        b = b + (F.col("__s") > F.lit(float(c))).cast("int")
    agg = rows.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_pos"),
        _exact_mean(F.col("__s")).alias("mean_score"),
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        "mean_score",
        (F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
        (
            F.col("n_pos").cast("double") / F.col("n")
            - F.col("mean_score")
        ).alias("gap"),
    )


def calibration_table_sql(
    table: str,
    score_col: str,
    label_col: str,
    cuts: list[float],
) -> str:
    """DuckDB twin of :func:`calibration_table` — identical half-open
    binning against the SAME cut literals (recompute them with
    ``exact_quantiles_oracle_sql`` — exact order statistics agree
    across engines), identical exact folds and divisions."""
    from ..functions.exact_agg import exact_sum_sql
    from ..operators.search import dlit

    bexpr = " + ".join(
        [f"CASE WHEN s > {dlit(float(c))} THEN 1 ELSE 0 END" for c in cuts]
    ) or "0"
    return f"""
        WITH r AS (
          SELECT {score_col} AS s, CAST({label_col} AS INT) AS y
          FROM {table}
          WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
        ), g AS (
          SELECT ({bexpr}) AS bin, count(*) AS n, sum(y) AS n_pos,
                 {exact_sum_sql('s')} / count(s) AS mean_score
          FROM r GROUP BY 1
        )
        SELECT bin, n, CAST(n_pos AS BIGINT) AS n_pos, mean_score,
               CAST(n_pos AS DOUBLE) / n AS pos_rate,
               CAST(n_pos AS DOUBLE) / n - mean_score AS gap
        FROM g
    """


def ece_from_bins(bins: list) -> float:
    """Expected calibration error from collected table rows — ONE
    shared float arithmetic (ascending-bin fold of ``n·|gap|``, one
    final division), used by the engine driver-side and by any twin
    over DuckDB-read bins, so the value is engine-independent.
    ``bins`` = [(bin, n, gap)]."""
    total = 0
    num = 0.0
    for _b, n, gap in sorted(bins):
        num += n * abs(gap)
        total += n
    if total == 0:
        raise ValueError("ece_from_bins: empty table")
    return num / total


def expected_calibration_error(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> float:
    """ECE = Σ_b (n_b/N)·|pos_rate_b − mean_score_b| over the
    equal-frequency bins of :func:`calibration_table` — the scalar
    calibration read (the score must be a probability for the value to
    mean "calibration"; see the table's docstring). The per-bin inputs
    are exact; the fold runs driver-side through :func:`ece_from_bins`
    (fixed ascending-bin order), so the double is reproducible across
    engines and partitionings."""
    rows = calibration_table(df, score_col, label_col, n_bins).collect()
    return ece_from_bins([(r["bin"], r["n"], r["gap"]) for r in rows])
