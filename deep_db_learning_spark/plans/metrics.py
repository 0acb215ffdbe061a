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
