"""Embedding stage (SURVEY N1-N5): semantic-typed columns → feature vectors.

The reference embeds per column by ML-semantic type
(``nn/embedder/embedders.py:19-114``, ``nn/embedder/db_embedder.py``):
``nn.Embedding(card, dim)`` for categoricals, ``Linear(1, dim)`` for
numerics, NA imputation, then concat to a per-row tensor.

Spark-first realization — **embedding lookup is a relational join**:

- N1 cat: a ``(code → array<double>)`` table of ``card`` rows,
  deterministically initialized (seeded hash → uniform), broadcast-
  joined onto the fact table. Updating embeddings during training is a
  join-apply-update on this small table; the fact table never moves.
- N2 num: ``x·w + b`` per dimension — a pure array ``transform`` expr.
- N3 identity: pass-through.
- N5 imputation: mean (num) / most-frequent (cat) from the profiling
  stats, applied with ``coalesce`` before embedding.
- assembly: per-column vectors concatenated with ``concat(arrays)``
  into one flat ``array<double>`` per row
  (``heterodata_builder.py:284-291`` flattens to a float32 matrix).

Everything is JVM expressions + one broadcast join per cat column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.hashing import KNUTH, MERSENNE_31
from ..schema import ColumnSpec


def deterministic_embedding_table(
    spark: SparkSession, card: int, dim: int, seed: int = 42
) -> DataFrame:
    """N1 parameter init: (code, vec) for codes 0..card (0 = NULL).
    Seeded-hash uniform in [-0.5, 0.5) — deterministic across runs and
    engines; the training loop may later overwrite this table."""
    codes = spark.range(0, card + 1).select(F.col("id").cast("int").alias("code"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(
                (F.col("code").cast("bigint") * dim + i + F.lit(seed)) * F.lit(KNUTH),
                F.lit(MERSENNE_31),
            ).cast("double")
            / F.lit(float(MERSENNE_31))
            - 0.5
        ),
    )
    return codes.withColumn("vec", vec)


def embed_categorical(
    df: DataFrame,
    code_col: str,
    card: int,
    dim: int,
    out: str | None = None,
    seed: int = 42,
    table: DataFrame | None = None,
) -> DataFrame:
    """N1 ``CatEmbedder``: broadcast-join the embedding table. The
    reference's ``nn.Embedding`` lookup IS this join."""
    out = out or f"{code_col}_emb"
    emb = table if table is not None else deterministic_embedding_table(
        df.sparkSession, card, dim, seed
    )
    emb = emb.select(F.col("code").alias(code_col), F.col("vec").alias(out))
    return df.join(broadcast(emb), code_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.array_repeat(F.lit(0.0), dim))
    )


def embed_numeric(
    x: Column, dim: int, seed: int = 42, impute: float | None = None
) -> Column:
    """N2 ``NumEmbedder`` ``Linear(1, dim)``: vec[i] = x*w_i + b_i with
    deterministic seeded weights; optional mean-imputation first (N5)."""
    v = x.cast("double")
    if impute is not None:
        v = F.coalesce(v, F.lit(float(impute)))

    def wb(i: Column, salt: int) -> Column:
        return (
            F.pmod((i + F.lit(seed + salt)) * F.lit(KNUTH), F.lit(MERSENNE_31)).cast(
                "double"
            )
            / F.lit(float(MERSENNE_31))
            - 0.5
        )

    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: v * wb(i, 1) + wb(i, 7)
    )


def assemble_features(df: DataFrame, vector_cols: list[str], out: str = "features") -> DataFrame:
    """N4 concat: per-column vectors → one flat array<double> per row."""
    return df.withColumn(out, F.concat(*[F.col(c) for c in vector_cols]))


def impute_values(
    df: DataFrame, strategy: dict[str, tuple[str, object]]
) -> DataFrame:
    """N5 NA imputation: {col: ("mean"|"most_frequent"|"constant", value)}.
    Values come from the profiling job (A10); this just applies them —
    a single ``coalesce`` pass, no extra scan."""
    exprs = []
    for c, (kind, value) in strategy.items():
        exprs.append(F.coalesce(F.col(c), F.lit(value)).alias(c))
    keep = [F.col(c) for c in df.columns if c not in strategy]
    return df.select(*keep, *exprs)


def text_embedding(
    df: DataFrame,
    text_col: str,
    dim: int = 32,
    out: str = "text_emb",
    model_fn=None,
    records_per_batch: int = 256,
) -> DataFrame:
    """N6 ``GloveTextEmbedding`` (``data/ctu_dataset.py:43-52``):
    text → dense vector via an Arrow-batched pandas UDF.

    ``model_fn(list[str]) -> ndarray[n, dim]`` plugs in a neural
    sentence encoder (broadcast the model once per executor in a
    closure; the sentence-transformer libs are not in this container).
    The default is a REAL lightweight encoder — random indexing / the
    feature-hashing trick: each token maps deterministically (md5) to a
    pseudo-random ``dim``-vector, the bag sum is L2-normalized. No
    trained weights, but genuinely a bag-of-words embedding: token
    overlap ⇒ cosine similarity, so every downstream consumer
    (similarity search, near-dup, ANN) runs on meaningful geometry.
    The token loop is vectorized numpy (one outer-product-style batch
    per document).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(records_per_batch)
    )

    def hash_token(tok: str) -> int:
        import hashlib

        return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)

    # pre-reduce both factors mod p: each is < 2^31, the product fits
    # int64 exactly, and by congruence ((h mod p)·((i+1)K mod p)) mod p
    # == (h·(i+1)·K) mod p — bit-identical to the scalar formula
    scale = (np.arange(1, dim + 1, dtype=np.int64) * KNUTH) % MERSENNE_31

    def hashing_encode(texts):
        out_m = np.zeros((len(texts), dim))
        for r, t in enumerate(texts):
            toks = (t or "").lower().split()
            if not toks:
                continue
            H = np.array(
                [hash_token(tok) % MERSENNE_31 for tok in toks], dtype=np.int64
            )
            # token t, component i: ((h_t·(i+1)·KNUTH) mod p)/p − 0.5
            vecs = (H[:, None] * scale[None, :]) % MERSENNE_31
            out_m[r] = (vecs.astype(np.float64) / MERSENNE_31 - 0.5).sum(axis=0)
            n = np.linalg.norm(out_m[r])
            if n > 0:
                out_m[r] /= n
        return out_m

    encode = model_fn or hashing_encode

    def fn(texts):
        m = encode(list(texts))
        return pd.Series([list(map(float, row)) for row in m])

    import pandas as _pd

    fn.__annotations__ = {"texts": _pd.Series, "return": _pd.Series}
    udf = pandas_udf(fn, "array<double>")
    return df.withColumn(out, udf(F.col(text_col)))
