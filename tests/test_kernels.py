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


def test_sparsemax_projects_onto_simplex():
    from deep_db_learning_spark.operators.kernels import sparsemax

    z = np.array([[3.0, 1.0, 0.2], [1.0, 1.0, 1.0], [10.0, 0.0, -5.0]])
    p = sparsemax(z)
    assert np.allclose(p.sum(axis=1), 1.0)
    assert (p >= 0).all()
    # peaked input -> exact zeros (the sparseness TabNet masks rely on)
    assert p[2, 1] == 0.0 and p[2, 2] == 0.0
    # uniform input stays uniform
    assert np.allclose(p[1], [1 / 3] * 3)
    # agrees with a brute-force simplex projection on random rows
    rng = np.random.default_rng(0)
    for z_row in rng.normal(size=(5, 7)):
        got = sparsemax(z_row[None, :])[0]
        # projection must be the closest simplex point: compare distance
        # against many random simplex points
        cand = rng.dirichlet(np.ones(7), size=2000)
        d_got = ((got - z_row) ** 2).sum()
        d_cand = ((cand - z_row) ** 2).sum(axis=1).min()
        assert d_got <= d_cand + 1e-9


def test_tabnet_encode_shape_and_determinism(spark):
    from deep_db_learning_spark.operators.kernels import tabnet_encode

    df = spark.createDataFrame(
        [(i, [float(i), float(i) * 0.5, 1.0, -2.0]) for i in range(8)],
        "id long, x array<double>",
    )
    out1 = df.select("id", tabnet_encode(F.col("x"), out_channels=5).alias("enc"))
    rows1 = {r["id"]: r["enc"] for r in out1.collect()}
    rows2 = {r["id"]: r["enc"] for r in out1.collect()}
    assert rows1 == rows2  # deterministic across runs/partitionings
    assert all(len(v) == 5 for v in rows1.values())
    # different seeds give different parameters
    alt = df.select("id", tabnet_encode(F.col("x"), out_channels=5, seed=7).alias("enc"))
    assert {r["id"]: r["enc"] for r in alt.collect()} != rows1


def test_trompt_encode_shape(spark):
    from deep_db_learning_spark.operators.kernels import trompt_encode

    df = spark.createDataFrame(
        [(0, [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])],
        "id long, cols array<array<double>>",
    )
    out = df.select(
        trompt_encode(F.col("cols"), num_prompts=4, num_layers=2).alias("enc")
    ).collect()[0]["enc"]
    # stacked prompts: num_layers * num_prompts rows of channel dim 2
    assert len(out) == 8 and all(len(p) == 2 for p in out)
