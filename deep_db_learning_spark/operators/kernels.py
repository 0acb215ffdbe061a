"""Per-row / per-batch neural kernels over ``array<float>`` feature
columns (SURVEY §2.7 N15-N19).

In the reference these are small torch modules applied to the
[rows, cols, dim] column-embedding tensor
(``nn/layers/attenttion.py``, ``encoding.py``, ``residual_norm.py``,
``per_feature_norm.py``). Torch is not in this container; each kernel
here is the same math as a numpy Arrow-batched pandas UDF over a
column-major feature layout:

    one row = one entity; ``cols`` = array of per-column embedding
    vectors, i.e. ``array<array<float>>`` of shape [n_cols, dim].

Per-ROW kernels (N15, N17, N18, N19) are embarrassingly parallel — no
shuffle, the UDF runs inside the scan stage at any scale. The
cross-ROW kernel (N16 intersample attention) attends across the rows
*of one Arrow batch* — exactly SAINT's batch semantics; batch
composition is the partitioning, which a trainer controls by
repartitioning/sorting upstream.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pandas_udf(fn, returns: str, struct_input: bool = False):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # struct columns are delivered as a pandas DataFrame; the eval type
    # is inferred from these (real, non-stringized) annotations
    fn.__annotations__ = {
        "v": pd.DataFrame if struct_input else pd.Series,
        "return": pd.Series,
    }
    return pandas_udf(fn, returns)


def _stack(series):
    import numpy as np

    return np.array([np.asarray(x, dtype=np.float64) for x in series])


def positional_encoding(col: Column, dim: int | None = None) -> Column:
    """N17 (``nn/layers/encoding.py:7-24``): add the sin/cos positional
    code over the column axis of a [n_cols, dim] embedding array.
    Dropout is a training-time concern and lives with the trainer."""

    def fn(v):
        import numpy as np
        import pandas as pd

        out = []
        for x in v:
            m = _stack([x])[0] if isinstance(x[0], (list, tuple)) else _stack(x)
            n_cols, d = m.shape
            pos = np.arange(n_cols)[:, None]
            i = np.arange(d)[None, :]
            angle = pos / np.power(10000.0, (2 * (i // 2)) / d)
            pe = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
            out.append((m + pe).tolist())
        return pd.Series(out)

    return _pandas_udf(fn, "array<array<double>>")(col)


def residual_norm(col_x: Column, col_x_next: Column) -> Column:
    """N18 ``ResidualNorm`` (``nn/layers/residual_norm.py:4-11``):
    ``LayerNorm(x + x_next)`` over the last axis, per column vector."""

    def fn(v):
        # a struct column arrives as a pandas DataFrame (one column per
        # struct field), not a Series of dicts
        import pandas as pd

        out = []
        for xs, ys in zip(v["x"], v["y"]):
            z = _stack(xs) + _stack(ys)
            mu = z.mean(axis=-1, keepdims=True)
            sd = z.std(axis=-1, keepdims=True)
            out.append(((z - mu) / (sd + 1e-5)).tolist())
        return pd.Series(out)

    return _pandas_udf(fn, "array<array<double>>", struct_input=True)(
        F.struct(col_x.alias("x"), col_x_next.alias("y"))
    )


def per_feature_norm(col: Column) -> Column:
    """N19 ``PerFeatureNorm`` (``nn/layers/per_feature_norm.py:4-15``):
    LayerNorm across the COLUMN axis (normalize each embedding dim over
    the row's columns — the transposed-axis norm)."""

    def fn(v):
        import pandas as pd

        out = []
        for x in v:
            m = _stack(x)
            mu = m.mean(axis=0, keepdims=True)
            sd = m.std(axis=0, keepdims=True)
            out.append(((m - mu) / (sd + 1e-5)).tolist())
        return pd.Series(out)

    return _pandas_udf(fn, "array<array<double>>")(col)


def self_attention(col: Column) -> Column:
    """N15 ``SelfAttention`` (``nn/layers/attenttion.py:4-15``) with
    identity Q/K/V projections: softmax(x xᵀ/√d)·x over a row's column
    vectors. Learned projections belong to the trainer; the relational
    engine supplies the kernel shape."""

    def fn(v):
        import numpy as np
        import pandas as pd

        out = []
        for x in v:
            m = _stack(x)
            d = m.shape[1]
            scores = m @ m.T / math.sqrt(d)
            scores -= scores.max(axis=1, keepdims=True)
            w = np.exp(scores)
            w /= w.sum(axis=1, keepdims=True)
            out.append((w @ m).tolist())
        return pd.Series(out)

    return _pandas_udf(fn, "array<array<double>>")(col)


def intersample_attention(
    df: DataFrame, features: str, out: str = "intersample", id_col: str = "node_id"
) -> DataFrame:
    """N16 ``IntersampleAttention`` (``nn/layers/attenttion.py:17-36``,
    SAINT): attention ACROSS the rows of a batch, each row's flattened
    feature vector attending to every other row in its Arrow batch /
    partition group. Implemented with ``mapInPandas`` so the batch is
    the attention scope — repartition upstream to choose batch makeup.
    """

    def fn(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.array([np.asarray(x, dtype=np.float64) for x in pdf[features]])
            d = m.shape[1]
            scores = m @ m.T / math.sqrt(d)
            scores -= scores.max(axis=1, keepdims=True)
            w = np.exp(scores)
            w /= w.sum(axis=1, keepdims=True)
            res = w @ m
            yield pd.DataFrame({id_col: pdf[id_col], out: list(map(list, res))})

    schema = f"{id_col} bigint, {out} array<double>"
    return df.select(id_col, features).mapInPandas(fn, schema)
