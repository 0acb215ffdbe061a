import math

import numpy as np
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.kernels import (
    intersample_attention,
    per_feature_norm,
    positional_encoding,
    residual_norm,
    self_attention,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "node_id bigint, cols array<array<double>>"
    )


def test_positional_encoding_matches_numpy(spark):
    x = [[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]]
    df = _mk(spark, [(1, x)])
    out = df.select(positional_encoding(F.col("cols")).alias("pe")).collect()[0]["pe"]
    m = np.array(x)
    n, d = m.shape
    pos, i = np.arange(n)[:, None], np.arange(d)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / d)
    want = m + np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    assert np.allclose(np.array(out), want)


def test_residual_norm_zero_mean_unit_var(spark):
    x = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    y = [[0.5, 0.5, 0.5], [1.0, 1.0, 1.0]]
    df = spark.createDataFrame(
        [(1, x, y)], "node_id bigint, x array<array<double>>, y array<array<double>>"
    )
    out = df.select(residual_norm(F.col("x"), F.col("y")).alias("rn")).collect()[0]["rn"]
    m = np.array(out)
    assert np.allclose(m.mean(axis=-1), 0.0, atol=1e-6)
    assert np.allclose(m.std(axis=-1), 1.0, atol=1e-3)


def test_per_feature_norm_normalizes_column_axis(spark):
    x = [[1.0, 10.0], [3.0, 30.0], [5.0, 50.0]]
    df = _mk(spark, [(1, x)])
    out = np.array(
        df.select(per_feature_norm(F.col("cols")).alias("n")).collect()[0]["n"]
    )
    assert np.allclose(out.mean(axis=0), 0.0, atol=1e-6)


def test_self_attention_rows_are_convex_combinations(spark):
    x = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    df = _mk(spark, [(1, x)])
    out = np.array(
        df.select(self_attention(F.col("cols")).alias("a")).collect()[0]["a"]
    )
    m = np.array(x)
    scores = m @ m.T / math.sqrt(2)
    scores -= scores.max(axis=1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(axis=1, keepdims=True)
    assert np.allclose(out, w @ m)


def test_intersample_attention_batch_scope(spark):
    rows = [(i, [float(i), float(2 * i)]) for i in range(6)]
    df = spark.createDataFrame(rows, "node_id bigint, fv array<double>").repartition(1)
    out = intersample_attention(df, "fv")
    got = {r["node_id"]: r["intersample"] for r in out.collect()}
    assert len(got) == 6
    m = np.array([r[1] for r in rows])
    scores = m @ m.T / math.sqrt(2)
    scores -= scores.max(axis=1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(axis=1, keepdims=True)
    want = w @ m
    for i in range(6):
        assert np.allclose(np.array(got[i]), want[i], atol=1e-9)
