"""Trainable end-to-end relational classifier (SURVEY N1/N20/N21/N24 —
the reference's raison d'être: ``nn/lightning/lightning_wrapper.py:36-96``
runs torch-Lightning epochs over the blueprint model;
``experiments/blueprint_mlflow.py:196-216`` wires trainer + MLflow).

Spark-first training story
--------------------------

The learnable state is TINY (a categorical embedding table of
``card × dim`` doubles and a linear decoder ``(dim + m) × k``); the DATA
is huge. So the split is:

- **parameters on the driver** (numpy; seeded, deterministic),
- **every data-parallel pass on Spark**: the design matrix is assembled
  once (graph build → neighbor aggregation → standardization — all
  DataFrame ops) and persisted; each epoch is ONE Spark job over it — a
  vectorized Arrow UDF computes per-row loss / residual / flattened
  gradient outer-product, and a single ``groupBy(code)`` aggregates
  everything with exact decimal folds.

The decimal folds make each epoch's gradients **bit-deterministic**
under any partitioning (decimal addition is associative — the
``exact_agg`` argument), so the whole training trajectory — losses,
parameters, predictions — is reproducible run-to-run and
oracle-checkable against pinned goldens. Full-batch gradient descent on
a convex objective (softmax cross-entropy, fixed lr, optional L2)
guarantees the train loss decreases monotonically at a small enough lr.

This is exactly the reference's join-apply-update shape expressed
relationally: *join* the embedding table onto the fact rows (the code
column indexes the driver-side table inside the kernel — an in-memory
broadcast join), *apply* the forward/backward math batch-vectorized,
*update* the small parameter tables on the driver.

Scale seam (documented, not stubbed): at cluster scale with LARGE
parameter state (deep message passing, text encoders), replace the
driver update with a data-parallel trainer — materialize the assembled
feature frame to Parquet (``HeteroGraph.save`` checkpoint), then hand
off to ``pyspark.ml.torch.distributor.TorchDistributor`` running DDP
over those shards; the assembly plan here is unchanged. The
``fit_fn`` hook receives ``(frame, meta)`` for exactly that hand-off.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.encode import factorize_target
from ..functions.exact_agg import DECIMAL_TYPE
from ..operators.graph import build_hetero_graph
from ..operators.sampling import random_node_split
from ..checkpoint import cut_lineage


_DEC9_EXP = None


def _dec9_py(Decimal, x):
    """Round a float to the fold scale exactly like the oracle twin:
    ``Decimal(repr(x))`` (shortest round-trip string) quantized HALF_UP
    to 9 fractional digits."""
    global _DEC9_EXP
    from decimal import ROUND_HALF_UP

    if _DEC9_EXP is None:
        _DEC9_EXP = Decimal("1.000000000")
    return Decimal(repr(float(x))).quantize(_DEC9_EXP, rounding=ROUND_HALF_UP)


def row_logits(X, W, b):
    """``X @ W + b`` as a FIXED-ORDER accumulation: start from the bias
    and add one rank-1 term per input dimension. A BLAS GEMM may change
    blocking/FMA strategy with the batch row count, making per-row
    results differ by ulps between Arrow batch sizes — which would break
    the bit-reproducibility contract under repartitioning (and the
    numpy oracle twin, which sees all rows in one batch). Elementwise
    ops are batch-size-independent; the input dimension is small
    (dim + m ≈ 11), so the Python-level loop costs nothing."""
    import numpy as np

    logits = np.broadcast_to(b, (X.shape[0], b.shape[0])).copy()
    for j in range(X.shape[1]):
        logits += X[:, j : j + 1] * W[j]
    return logits


def _gradient_pass(df, E, Wc, bc, dim, m, k, card, task="classification"):
    """ONE Spark job: per-row loss/residual/gradient via a vectorized
    Arrow UDF over ``df(code, nums array<double>, label)``, folded with
    exact decimal sums per code group and accumulated on the driver.
    Returns ``(loss_sum, resid_tot, GW, resid_by_code)`` — the raw
    (unnormalized, unregularized) sums, bit-deterministic under any
    partitioning. Shared by the full-batch and minibatch trainers.

    ``task``: ``"classification"`` (softmax cross-entropy over k
    classes, int labels) or ``"regression"`` (k=1 linear output,
    half-squared error ``0.5·r²``, double labels — the task of the
    reference's ``MSELoss`` branch,
    ``nn/lightning/lightning_wrapper.py:40,50-55``; note torch MSELoss
    is mean ``r²``, so loss values and gradient scale here are exactly
    HALF the reference's — absorbed into the learning rate, but the
    trajectories are not numerically comparable at equal lr). Both emit
    the same ``[loss, resid(k), grad_W(dim+m × k)]`` row layout, so the
    fold, accumulation, and update algebra are shared."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    glen = 1 + k + (dim + m) * k

    def grad_fn(code, nums, label):
        # closure over THIS step's parameter copies (fresh function
        # object per step — the udf ships the current values)
        codes = code.to_numpy(dtype=np.int64)
        X = np.concatenate([E[codes], np.vstack(nums.to_list())], axis=1)
        nrows = len(codes)
        if task == "regression":
            y = label.to_numpy(dtype=np.float64)
            pred = row_logits(X, Wc, bc)[:, 0]
            r = pred - y
            loss = 0.5 * r * r
            resid = r[:, None]
        else:
            y = label.to_numpy(dtype=np.int64)
            logits = row_logits(X, Wc, bc)
            logits -= logits.max(axis=1, keepdims=True)
            ex = np.exp(logits)
            P = ex / ex.sum(axis=1, keepdims=True)
            loss = -np.log(P[np.arange(nrows), y])
            resid = P.copy()
            resid[np.arange(nrows), y] -= 1.0
        gw = (X[:, :, None] * resid[:, None, :]).reshape(nrows, -1)
        out = np.concatenate([loss[:, None], resid, gw], axis=1)
        # round to the decimal fold's scale HERE, in Python — the
        # JVM's double→decimal cast goes through Double.toString,
        # which (pre-Ryu JDKs) occasionally emits a non-shortest
        # string that quantizes differently from Python's repr at a
        # scale-9 tie; emitting DECIMAL from the UDF keeps one
        # rounding rule on both the engine and the oracle twin
        from decimal import Decimal

        return pd.Series([[_dec9_py(Decimal, v) for v in row] for row in out])

    grad_fn.__annotations__ = {
        "code": pd.Series,
        "nums": pd.Series,
        "label": pd.Series,
        "return": pd.Series,
    }
    udf = pandas_udf(grad_fn, f"array<{DECIMAL_TYPE}>")
    g = df.select("code", udf("code", "nums", "label").alias("g"))
    sums = g.groupBy("code").agg(
        *[F.sum(F.element_at("g", i + 1)).alias(f"v{i}") for i in range(glen)]
    )
    rows = sums.collect()
    # exact decimal accumulation across code groups on the driver
    from decimal import Decimal

    tot = [Decimal(0)] * glen
    resid_by_code = np.zeros((card, k))
    for r in rows:
        c = r["code"]
        for i in range(glen):
            v = r[f"v{i}"]
            if v is not None:
                tot[i] += v
        for j in range(k):
            v = r[f"v{1 + j}"]
            if v is not None:
                resid_by_code[c, j] = float(v)
    loss_sum = float(tot[0])
    resid_tot = np.array([float(tot[1 + j]) for j in range(k)])
    GW = np.array(
        [float(tot[1 + k + i]) for i in range((dim + m) * k)]
    ).reshape(dim + m, k)
    return loss_sum, resid_tot, GW, resid_by_code


# The minibatch/regression hyperparameters the driver query AND its
# oracle twin share — one definition so the pinned VALUES trajectory
# can never drift from what q_train_relational actually runs.
MINIBATCH_BENCH_CONFIG = {"epochs": 4, "n_batches": 2, "neighbor_budget": 5}
REGRESSION_BENCH_CONFIG = {"epochs": 6, "lr": 0.2}


@dataclass
class TrainResult:
    losses: list[float]  # per-epoch TRAIN loss (mean cross-entropy)
    accuracy: dict[str, float] = field(default_factory=dict)  # split → acc
    params: dict = field(default_factory=dict)  # "emb", "W", "b" (numpy)


def assemble_training_frame(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list],
    target: tuple[str, str] = ("customer", "c_mktsegment"),
    cat_col: str = "c_nationkey",
    num_cols: tuple[str, ...] = ("c_acctbal",),
    seed: int = 42,
    neighbor_budget: int | None = None,
    task: str = "classification",
) -> tuple[DataFrame, dict]:
    """One declarative plan: graph build → neighbor aggregation onto the
    target table → train-split standardization → factorized label +
    split. Returns ``(frame, meta)`` where frame has
    ``(node_id, code, nums array<double>, label, split)`` and meta
    carries cardinalities and feature names.

    ``task="regression"``: the label is the target column cast to
    double and standardized with TRAIN-split mean/std (recorded in
    ``meta["y_mean"]/["y_std"]`` for de-normalizing predictions), NULL
    labels dropped; the target column is excluded from the features
    (leakage guard).

    Standardization stats come from exact decimal folds over the TRAIN
    split only (no test leakage) — deterministic under partitioning, so
    the whole downstream trajectory is too.

    ``neighbor_budget``: cap each root's receptive field at ≤k sampled
    src rows per edge type — the reference ``HGTLoader`` fan-out budget
    (``experiments/blueprint_mlflow.py:119-133``). The per-root
    subgraphs the reference materializes one sample at a time
    (``data/dataset.py:249-258`` re-runs BFS per row;
    :func:`~..operators.bfs.bfs_expand_per_root` is this engine's
    row-level twin) are computed here for EVERY root in one fused
    scan-sample-aggregate plan — the Spark-first form of the loader."""
    target_table, target_col = target
    if task == "regression":
        num_cols = tuple(c for c in num_cols if c != target_col)
    g = build_hetero_graph(tables, primary_keys, foreign_keys, add_reverse=False)

    nodes = g.nodes[target_table]
    feats = nodes.select("node_id", F.col(cat_col).cast("int").alias("code"), *num_cols)
    feat_names = list(num_cols)
    for et, edges in g.edges.items():
        src_t, dst_t = g.edge_meta[et]
        if dst_t != target_table or et.startswith(("self_", "rev_")):
            continue
        numeric = [
            c
            for c, t in g.nodes[src_t].dtypes
            if t in ("double", "float") and c != "node_id"
        ]
        if not numeric:
            continue
        agg = g.aggregate_along_edge(
            et,
            numeric[:1],
            ["mean", "sum"],
            prefix=f"{et}__",
            neighbor_budget=neighbor_budget,
            budget_seed=seed,
        )
        agg_cols = [c for c in agg.columns if c != "dst"]
        feats = feats.join(
            agg.withColumnRenamed("dst", "node_id"), "node_id", "left"
        ).na.fill(0.0, subset=agg_cols)
        feat_names += agg_cols

    if task == "regression":
        labeled = (
            nodes.select("node_id", F.col(target_col).cast("double").alias("label"))
            .filter(F.col("label").isNotNull())
        )
    else:
        labeled = factorize_target(
            nodes.select("node_id", target_col), target_col
        ).select("node_id", "label")
    frame = feats.join(labeled, "node_id", "inner")
    frame = random_node_split(frame, fractions=(0.7, 0.0, 0.3), seed=seed)
    # the assembly join chain (graph build + per-edge aggregations) is
    # consumed by the stats pass, every epoch, and the final accuracy
    # pass — materialize it ONCE; checkpoint blocks are GC-reclaimed
    frame = cut_lineage(frame, eager=True)

    # ONE driver action: train-split standardization sums (exact
    # decimal) + the code/label cardinalities
    train_only = F.col("split") == "train"
    aggs = [
        F.count(F.when(train_only, 1)).alias("n"),
        F.max("code").alias("max_code"),
        F.max("label").alias("max_label"),
    ]
    if task == "regression":
        aggs.append(
            F.sum(F.when(train_only, F.col("label")).cast(DECIMAL_TYPE)).alias("s_y")
        )
        aggs.append(
            F.sum(
                F.when(train_only, F.col("label") * F.col("label")).cast(DECIMAL_TYPE)
            ).alias("q_y")
        )
    for c in feat_names:
        aggs.append(
            F.sum(F.when(train_only, F.col(c)).cast(DECIMAL_TYPE)).alias(f"s_{c}")
        )
        aggs.append(
            F.sum(F.when(train_only, F.col(c) * F.col(c)).cast(DECIMAL_TYPE)).alias(
                f"q_{c}"
            )
        )
    st = frame.agg(*aggs).first()
    n = st["n"]
    if not n:
        raise ValueError(
            "assemble_training_frame: the train split is empty "
            "(check split fractions / input size) — cannot standardize"
        )
    means, stds = {}, {}
    for c in feat_names:
        mu = float(st[f"s_{c}"]) / n
        var = max(float(st[f"q_{c}"]) / n - mu * mu, 1e-12)
        means[c], stds[c] = mu, var**0.5
    nums = F.array(
        *[(F.col(c) - F.lit(means[c])) / F.lit(stds[c]) for c in feat_names]
    )
    label_col = F.col("label")
    y_mean = y_std = None
    if task == "regression":
        y_mean = float(st["s_y"]) / n
        y_std = max(float(st["q_y"]) / n - y_mean * y_mean, 1e-12) ** 0.5
        label_col = (F.col("label") - F.lit(y_mean)) / F.lit(y_std)
    frame = frame.select(
        "node_id", "code", nums.alias("nums"), label_col.alias("label"), "split"
    )

    n_codes = st["max_code"] + 1
    n_classes = 1 if task == "regression" else int(st["max_label"]) + 1
    meta = {
        "n_codes": int(n_codes),
        "n_classes": int(n_classes),
        "n_num": len(feat_names),
        "feat_names": feat_names,
        "means": means,
        "stds": stds,
        "y_mean": y_mean,
        "y_std": y_std,
    }
    return frame, meta


def train_relational_classifier(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list],
    target: tuple[str, str] = ("customer", "c_mktsegment"),
    cat_col: str = "c_nationkey",
    num_cols: tuple[str, ...] = ("c_acctbal",),
    dim: int = 4,
    epochs: int = 10,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 42,
    fit_fn=None,
) -> TrainResult:
    """N20/N21/N24 trainable path: full-batch gradient descent on
    softmax cross-entropy over [cat-embedding ++ standardized numeric
    aggregates], with the embedding table AND the linear decoder both
    learned. See the module docstring for the driver/Spark split and
    the :class:`~pyspark.ml.torch.distributor.TorchDistributor` seam
    (``fit_fn`` receives ``(frame, meta)`` and may take over training
    entirely — e.g. DDP over the materialized Parquet shards).

    Determinism contract: parameter init is seeded numpy; per-epoch
    gradient sums are exact decimal folds (partitioning-independent);
    updates are float64 on the driver — the loss trajectory is
    bit-reproducible, strictly decreasing at this lr on the bench data.
    """
    import numpy as np

    frame, meta = assemble_training_frame(
        tables, primary_keys, foreign_keys, target, cat_col, num_cols, seed=seed
    )
    if fit_fn is not None:
        return fit_fn(frame, meta)

    k = meta["n_classes"]
    m = meta["n_num"]
    card = meta["n_codes"]
    rng = np.random.default_rng(seed)
    emb = rng.uniform(-0.5, 0.5, size=(card, dim))
    W = rng.uniform(-0.5, 0.5, size=(dim + m, k)) * 0.1
    b = np.zeros(k)

    train = frame.filter(F.col("split") == "train").select("code", "nums", "label")
    sc = train.sparkSession.sparkContext
    parts = max(1, min(sc.defaultParallelism, 8))
    train = train.repartition(parts).persist()
    try:
        n_train = train.count()

        losses: list[float] = []
        for _ in range(epochs):
            E, Wc, bc = emb.copy(), W.copy(), b.copy()
            loss_sum, resid_tot, GW, resid_by_code = _gradient_pass(
                train, E, Wc, bc, dim, m, k, card
            )
            loss = loss_sum / n_train + 0.5 * l2 * (
                float((W * W).sum()) + float((emb * emb).sum())
            )
            losses.append(loss)
            # update: decoder, bias, and the embedding code table
            # (join-apply-update: dE[c] = Σ_{rows with code c} resid · Wᵀ).
            # All three gradients use the EPOCH-START weights (Wc — the
            # same copy the forward pass saw): mixing the already-updated
            # W into dE would make the step not-the-gradient of the
            # stated objective and can break monotone descent.
            emb -= lr * (resid_by_code @ Wc[:dim].T / n_train + l2 * emb)
            W -= lr * (GW / n_train + l2 * W)
            b -= lr * resid_tot / n_train

        accuracy = _split_accuracy(frame, emb, W, b)
    finally:
        # a failed epoch must not leak the pinned frame
        train.unpersist()
    return TrainResult(
        losses=losses,
        accuracy=accuracy,
        params={"emb": emb, "W": W, "b": b},
    )


def _split_eval(frame, emb, W, b, kind: str) -> dict[str, float]:
    """Per-split metric with the trained parameters — one Spark job.
    ``kind``: ``"accuracy"`` (argmax prediction) or ``"mse"``
    (linear-head prediction, standardized-label space)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Ef, Wf, bf = emb.copy(), W.copy(), b.copy()

    def pred_fn(code, nums):
        codes = code.to_numpy(dtype=np.int64)
        X = np.concatenate([Ef[codes], np.vstack(nums.to_list())], axis=1)
        out = row_logits(X, Wf, bf)
        if kind == "mse":
            return pd.Series(out[:, 0])
        return pd.Series(np.argmax(out, axis=1).astype(np.int64))

    pred_fn.__annotations__ = {"code": pd.Series, "nums": pd.Series, "return": pd.Series}
    pudf = pandas_udf(pred_fn, "double" if kind == "mse" else "bigint")
    err = F.col("pred") - F.col("label")
    metric = (
        F.avg(err * err) if kind == "mse"
        else F.avg((F.col("pred") == F.col("label")).cast("double"))
    )
    rows = (
        frame.select("split", "label", pudf("code", "nums").alias("pred"))
        .groupBy("split")
        .agg(metric.alias("m"))
        .collect()
    )
    return {r["split"]: r["m"] for r in rows}


def _split_accuracy(frame, emb, W, b) -> dict[str, float]:
    return _split_eval(frame, emb, W, b, "accuracy")


def train_relational_minibatch(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list],
    target: tuple[str, str] = ("customer", "c_mktsegment"),
    cat_col: str = "c_nationkey",
    num_cols: tuple[str, ...] = ("c_acctbal",),
    dim: int = 4,
    epochs: int = 4,
    n_batches: int = 2,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 42,
    neighbor_budget: int | None = None,
) -> TrainResult:
    """The reference's actual training loop shape: minibatch SGD over
    per-root sampled subgraphs (``HGTLoader(num_samples=[50]*L)`` +
    batched seed nodes, ``experiments/blueprint_mlflow.py:119-133``),
    re-expressed Spark-first.

    - **Per-root subgraphs**: ``neighbor_budget`` caps each root's
      receptive field with the deterministic per-dst sample inside the
      fused assembly plan — every root's bounded subgraph aggregate is
      computed in ONE scan-sample-aggregate job, where the reference
      re-runs BFS per sample row (``data/dataset.py:249-258``;
      :func:`~..operators.bfs.bfs_expand_per_root` is the row-level
      twin of the subgraphs this samples features from).
    - **Minibatches**: train roots are assigned to ``n_batches`` by the
      portable Knuth hash of their node id — deterministic on any
      engine and partitioning (a ``rand()`` batcher would reshuffle
      rows between runs). Each step is one Spark job over that batch's
      slice of the persisted frame; gradients are the same exact
      decimal folds as the full-batch path, so the whole SGD trajectory
      (losses at every STEP, final parameters) is bit-reproducible and
      oracle-checkable (``plans/train_oracle.py``).

    Per-step loss = batch mean cross-entropy + the L2 term at the
    step-start parameters (SGD semantics: not monotone per step, but
    descending in trend). Scale note: at cluster scale write the
    assembled frame bucketed by ``batch`` so each step's filter prunes
    to its own files instead of scanning all batches.
    """
    import numpy as np

    from ..functions.hashing import knuth_hash

    frame, meta = assemble_training_frame(
        tables,
        primary_keys,
        foreign_keys,
        target,
        cat_col,
        num_cols,
        seed=seed,
        neighbor_budget=neighbor_budget,
    )
    k = meta["n_classes"]
    m = meta["n_num"]
    card = meta["n_codes"]
    rng = np.random.default_rng(seed)
    emb = rng.uniform(-0.5, 0.5, size=(card, dim))
    W = rng.uniform(-0.5, 0.5, size=(dim + m, k)) * 0.1
    b = np.zeros(k)

    train = (
        frame.filter(F.col("split") == "train")
        .select(
            (knuth_hash(F.col("node_id"), seed + 7) % n_batches).alias("batch"),
            "code",
            "nums",
            "label",
        )
    )
    sc = train.sparkSession.sparkContext
    parts = max(1, min(sc.defaultParallelism, 8))
    train = train.repartition(parts).persist()
    try:
        batch_sizes = {
            r["batch"]: r["count"] for r in train.groupBy("batch").count().collect()
        }
        # an empty batch shows up as a MISSING key (groupBy never emits
        # a 0-count row), so presence of every batch id is the check
        if set(batch_sizes) != set(range(n_batches)):
            raise ValueError(
                f"train_relational_minibatch: a batch is empty "
                f"(sizes={batch_sizes}) — lower n_batches or grow the input"
            )

        losses: list[float] = []
        for _ in range(epochs):
            for bi in range(n_batches):
                n_b = batch_sizes[bi]
                E, Wc, bc = emb.copy(), W.copy(), b.copy()
                loss_sum, resid_tot, GW, resid_by_code = _gradient_pass(
                    train.filter(F.col("batch") == bi).select(
                        "code", "nums", "label"
                    ),
                    E,
                    Wc,
                    bc,
                    dim,
                    m,
                    k,
                    card,
                )
                loss = loss_sum / n_b + 0.5 * l2 * (
                    float((W * W).sum()) + float((emb * emb).sum())
                )
                losses.append(loss)
                # same step rule as the full-batch path, normalized by
                # the BATCH size (the gradient estimates the full one)
                emb -= lr * (resid_by_code @ Wc[:dim].T / n_b + l2 * emb)
                W -= lr * (GW / n_b + l2 * W)
                b -= lr * resid_tot / n_b

        accuracy = _split_accuracy(frame, emb, W, b)
    finally:
        train.unpersist()
    return TrainResult(
        losses=losses,
        accuracy=accuracy,
        params={"emb": emb, "W": W, "b": b},
    )


def _split_mse(frame, emb, W, b) -> dict[str, float]:
    """Per-split MSE (standardized-label space) — see :func:`_split_eval`."""
    return _split_eval(frame, emb, W, b, "mse")


def train_relational_regressor(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list],
    target: tuple[str, str] = ("customer", "c_acctbal"),
    cat_col: str = "c_nationkey",
    num_cols: tuple[str, ...] = (),
    dim: int = 4,
    epochs: int = 8,
    lr: float = 0.2,
    l2: float = 1e-4,
    seed: int = 42,
) -> TrainResult:
    """The reference's REGRESSION task branch
    (``TaskType.REGRESSION`` → ``MSELoss``,
    ``nn/lightning/lightning_wrapper.py:40,50-55``): full-batch
    gradient descent on half-squared error over [cat-embedding ++
    standardized numeric aggregates] with a k=1 linear head, predicting
    a numeric column of the target table from its relational
    neighborhood. The label is train-standardized (``meta["y_mean"]/
    ["y_std"]`` de-normalize). Same determinism contract as the
    classifier: seeded init, exact decimal gradient folds, float64
    driver updates — the per-epoch loss trajectory is bit-reproducible
    and oracle-checked (``plans/train_oracle.py:_regression_losses``).
    ``TrainResult.accuracy`` carries per-split MSE (standardized
    space)."""
    import numpy as np

    frame, meta = assemble_training_frame(
        tables,
        primary_keys,
        foreign_keys,
        target,
        cat_col,
        num_cols,
        seed=seed,
        task="regression",
    )
    k = 1
    m = meta["n_num"]
    card = meta["n_codes"]
    rng = np.random.default_rng(seed)
    emb = rng.uniform(-0.5, 0.5, size=(card, dim))
    W = rng.uniform(-0.5, 0.5, size=(dim + m, k)) * 0.1
    b = np.zeros(k)

    train = frame.filter(F.col("split") == "train").select("code", "nums", "label")
    sc = train.sparkSession.sparkContext
    parts = max(1, min(sc.defaultParallelism, 8))
    train = train.repartition(parts).persist()
    try:
        n_train = train.count()

        losses: list[float] = []
        for _ in range(epochs):
            E, Wc, bc = emb.copy(), W.copy(), b.copy()
            loss_sum, resid_tot, GW, resid_by_code = _gradient_pass(
                train, E, Wc, bc, dim, m, k, card, task="regression"
            )
            loss = loss_sum / n_train + 0.5 * l2 * (
                float((W * W).sum()) + float((emb * emb).sum())
            )
            losses.append(loss)
            emb -= lr * (resid_by_code @ Wc[:dim].T / n_train + l2 * emb)
            W -= lr * (GW / n_train + l2 * W)
            b -= lr * resid_tot / n_train

        mse = _split_mse(frame, emb, W, b)
    finally:
        train.unpersist()
    return TrainResult(
        losses=losses,
        accuracy=mse,
        params={"emb": emb, "W": W, "b": b, "y_mean": meta["y_mean"], "y_std": meta["y_std"]},
    )


# ------------------------------------------------- two-layer training
#
# The reference backprops through L STACKED conv layers + embedders
# (nn/models/blueprint.py:24-214, trained end-to-end by lightning).
# The trainers above optimize a 1-layer head over blueprint-assembled
# features; the stack trainer (plans/stack.py) closes that gap with a
# genuinely deep model whose EVERY weight matrix and embedding table
# is trained in-engine, over ANY FK edges declared as EdgeLayerSpec
# rows. For the default customer←orders spec at depth 2:
#
#   layer 1 (orders):   h_o   = tanh([emb1[code_o] ++ x_o] @ W1 + b1)
#   aggregate (edge):   hbar_c = mean_{o in N(c)} h_o     (decimal fold)
#   layer 2 (head):     logits_c = [emb[code_c] ++ nums_c ++ hbar_c] @ W2 + b2
#
# train_relational_two_layer below is the API-stable wrapper running
# that spec through the stack; two_layer_head_step stays here because
# the engine AND the oracle twin share it (the row_logits precedent).

TWO_LAYER_BENCH_CONFIG = {
    "epochs": 3,
    "n_batches": 2,
    "neighbor_budget": 5,
    "d1": 4,
}


def two_layer_head_step(
    codes, nums, hbar, y, emb, W1, W2, b2, l2, extra_l2=0.0, task="classification"
):
    """Head forward/backward over ONE collected batch (pure numpy;
    shared with the oracle twin like :func:`row_logits`, so both sides
    run the identical IEEE expression sequence). Returns
    ``(loss, GW2, gb2, demb, gH)`` — raw gradient SUMS (unnormalized);
    ``loss`` is the batch-mean loss plus the L2 term at the step-start
    parameters (``extra_l2`` carries squared norms of parameters the
    head does not see, e.g. the layer embedding tables); ``gH`` is
    dL/dhbar per root (row order = input order). ``task``:
    ``"classification"`` (softmax cross-entropy over k classes, int
    labels) or ``"regression"`` (k=1 linear head, half-squared error,
    standardized double labels — the same MSELoss-branch convention as
    :func:`train_relational_regressor`)."""
    import numpy as np

    dim = emb.shape[1]
    m = nums.shape[1]
    X = np.concatenate([emb[codes], nums, hbar], axis=1)
    nrows = len(codes)
    l2_term = 0.5 * l2 * (
        float((emb * emb).sum())
        + float((W1 * W1).sum())
        + float((W2 * W2).sum())
        + float(extra_l2)
    )
    if task == "regression":
        pred = (X @ W2 + b2)[:, 0]
        r = pred - y
        loss = float((0.5 * r * r).sum()) / nrows + l2_term
        resid = r[:, None]
    else:
        logits = X @ W2 + b2
        logits = logits - logits.max(axis=1, keepdims=True)
        ex = np.exp(logits)
        P = ex / ex.sum(axis=1, keepdims=True)
        rows_idx = np.arange(nrows)
        loss = float(-np.log(P[rows_idx, y]).sum()) / nrows + l2_term
        resid = P.copy()
        resid[rows_idx, y] -= 1.0
    GW2 = X.T @ resid
    gb2 = resid.sum(axis=0)
    demb = np.zeros_like(emb)
    np.add.at(demb, codes, resid @ W2[:dim].T)
    gH = resid @ W2[dim + m :].T
    return loss, GW2, gb2, demb, gH


def train_relational_two_layer(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list],
    target: tuple[str, str] = ("customer", "c_mktsegment"),
    cat_col: str = "c_nationkey",
    num_cols: tuple[str, ...] = ("c_acctbal",),
    dim: int = 4,
    d1: int = 4,
    epochs: int = 3,
    n_batches: int = 2,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 42,
    neighbor_budget: int | None = 5,
    task: str = "classification",
) -> TrainResult:
    """Minibatch SGD through TWO stacked layers — the in-engine analog
    of the reference's end-to-end blueprint backprop
    (``nn/models/blueprint.py:24-214``) at depth 2. API-stable wrapper:
    runs :func:`~.stack.train_relational_stack` with the
    customer←orders :data:`~.stack.ORDERS_LAYER_SPEC` (o_orderstatus
    embedder + [o_totalprice, lineitem-quantity decimal-fold mean]
    features — a genuine 2-hop receptive field) and maps the stack's
    parameter dict back to the original ``emb1/W1/b1/W2/b2`` names.

    Determinism contract (the same one the 1-layer trainers hold):
    seeded init; layer-1 forward emits decimal-quantized components so
    ``hbar`` is an exact per-root fold; the head runs driver-side numpy
    over the batch rows in node-id order; the W1 gradient is a global
    decimal fold. Every step's loss — and every parameter — is
    bit-reproducible and recomputed by the independent twin
    (``plans/train_oracle.py:_two_layer_losses``). Scale posture
    (broadcast semi-join batching, joined-hbar eval) is the stack's —
    see ``plans/stack.py``."""
    from dataclasses import replace

    from .stack import ORDERS_LAYER_SPEC, train_relational_stack

    spec = replace(
        ORDERS_LAYER_SPEC, hidden_dim=d1, neighbor_budget=neighbor_budget
    )
    res = train_relational_stack(
        tables,
        primary_keys,
        foreign_keys,
        layers=(spec,),
        target=target,
        cat_col=cat_col,
        num_cols=num_cols,
        dim=dim,
        epochs=epochs,
        n_batches=n_batches,
        lr=lr,
        l2=l2,
        seed=seed,
        neighbor_budget=neighbor_budget,
        task=task,
    )
    layer = res.params["layers"][0]
    return TrainResult(
        losses=res.losses,
        accuracy=res.accuracy,
        params={
            "emb": res.params["emb"],
            "emb1": layer["emb"],
            "W1": layer["W"],
            "b1": layer["b"],
            "W2": res.params["W_head"],
            "b2": res.params["b_head"],
        },
    )
