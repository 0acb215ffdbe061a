"""Spec-driven trained layer stacks — the generalized form of the
two-layer trainer (VERDICT r4 #1/#2/#5).

The reference backprops an arbitrary-depth, arbitrary-schema stack of
per-table embedders + convs (``nn/models/blueprint.py:24-214``, depth
set by ``experiments/blueprint_mlflow.py:53``). Here the stack is
declared as a list of :class:`EdgeLayerSpec` — one per FK edge walking
AWAY from the root — and trained end-to-end with the same
driver/Spark split and bit-determinism contract as the 1-layer
trainers (``plans/training.py``):

    level 0 (root):  logits = [emb0[code] ++ nums ++ hbar_1] @ Wh + bh
    level i (1..L):  h_i = tanh([emb_i[code_i] ++ x_i ++ hbar_{i+1}] @ W_i + b_i)
                     hbar_i = per-parent decimal-fold MEAN of h_i

Every per-row kernel is a fixed-order ``row_logits`` accumulation
(Arrow-batch-size-independent); every cross-row reduction is an exact
decimal fold of dec9-quantized components — so the whole trajectory is
bit-reproducible under any partitioning and recomputed by the
independent twin (``plans/train_oracle.py:_stack_losses``).

Scale posture (the r4/r5 swaps, now the DEFAULT paths):

- **root sharding**: the train-split root set is never collected
  whole — batch assignment is a Spark-side portable knuth hash and
  each step collects only its own batch's root rows (O(batch) driver
  residency; the reference analog is the batched seed nodes of
  ``HGTLoader``, ``experiments/blueprint_mlflow.py:119-133``).
- **batching**: per-step receptive fields are pruned with broadcast
  semi-joins on a batch-key frame (never a driver-side ``isin``
  literal) — level 1 against the batch roots, level i against the kept
  level-(i-1) keys — and materialized ONCE per batch (the
  portable-hash batches never change across epochs).
- **gradients down the stack**: dL/dhbar flows as a JOINED frame
  ``(key, gout, deg)`` — level 1's comes from the driver head step
  (bounded by batch size), deeper levels are produced by a per-row
  Spark job; no driver dict ever holds a non-root level.
- **eval**: the final accuracy pass joins the trained ``hbar`` onto
  the root frame and predicts in an Arrow UDF — the root frame is
  never collected (``_eval_mode="collect"`` retains the driver-side
  path purely so tests can pin bit-equality of the two).
- intermediate hbar frames are ``cut_lineage``'d per step, so each
  backward job reuses the materialized fold instead of recomputing
  the deeper layers.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage
from ..functions.exact_agg import DECIMAL_TYPE
from .training import (
    TrainResult,
    _dec9_py,
    assemble_training_frame,
    row_logits,
    two_layer_head_step,
)


@dataclass(frozen=True)
class EdgeLayerSpec:
    """One trained layer over one FK edge (child table → parent).

    ``key`` is a scalar SQL expression for the child row's identity —
    a plain PK column, or a packing expression for composite PKs
    (e.g. ``"l_orderkey * 8 + l_linenumber"`` — linenumber is 1..7).
    Required when ``neighbor_budget`` is set (the deterministic sample
    orders by ``knuth_hash(key)``) or when a deeper layer hangs off
    this one (its rows join by their fk to these key values).

    ``child_agg = (table, fk, col)`` appends an UNtrained decimal-fold
    mean of ``col`` per child row as an extra input feature (the
    original two-layer trainer's ``li_qty_mean``); when the same edge
    is instead a deeper :class:`EdgeLayerSpec`, the feature is trained
    through — don't use both on one edge.

    ``emb_storage`` picks where this layer's embedding table lives:
    ``"driver"`` (a numpy array, indexed inside the Arrow kernels),
    ``"frame"`` (a distributed ``(code, evec)`` DataFrame joined into
    every pass — the high-cardinality posture, VERDICT r5 #2), or
    ``"auto"`` (frame when the layer's cardinality reaches
    :data:`FRAME_EMB_THRESHOLD`). Both modes walk identical elementwise
    IEEE update sequences, so the parameter trajectories are bitwise
    equal; only the loss's emb-L2 scalar is folded differently
    (decimal fold in frame mode — the twin replays it).
    """

    table: str
    fk: str
    cat_col: str
    num_cols: tuple[str, ...] = ()
    key: str | None = None
    child_agg: tuple[str, str, str] | None = None
    emb_dim: int = 2
    hidden_dim: int = 4
    neighbor_budget: int | None = None
    emb_storage: str = "auto"

    @property
    def n_feats(self) -> int:
        return len(self.num_cols) + (1 if self.child_agg else 0)


# The original hard-coded customer←orders shape, now just a spec —
# the driver query's two_layer mode runs the stack with this.
ORDERS_LAYER_SPEC = EdgeLayerSpec(
    table="orders",
    fk="o_custkey",
    cat_col="o_orderstatus",
    num_cols=("o_totalprice",),
    key="o_orderkey",
    child_agg=("lineitem", "l_orderkey", "l_quantity"),
    emb_dim=2,
    hidden_dim=4,
)

# Depth-3 bench stack: customer ← orders ← lineitem, all three levels'
# embedders and both hidden weight matrices trained through the folds
# (the reference's layers=2 configuration,
# ``experiments/blueprint_mlflow.py:53``). orders drops its untrained
# lineitem mean — lineitem is now a trained layer on the same edge.
THREE_LAYER_SPECS = (
    replace(ORDERS_LAYER_SPEC, child_agg=None, neighbor_budget=5),
    EdgeLayerSpec(
        table="lineitem",
        fk="l_orderkey",
        cat_col="l_returnflag",
        num_cols=("l_quantity", "l_extendedprice"),
        key="l_orderkey * 8 + l_linenumber",
        emb_dim=2,
        hidden_dim=4,
        neighbor_budget=5,
    ),
)

THREE_LAYER_BENCH_CONFIG = {"epochs": 2, "n_batches": 2, "neighbor_budget": 5}

# Past this cardinality an "auto" layer keeps its embedding table as a
# distributed (code, evec) frame instead of a driver numpy array: the
# driver then holds only W/b (card × emb_dim never materializes after
# the pinned init draw).
FRAME_EMB_THRESHOLD = 50_000


def _resolve_frame_emb(spec: EdgeLayerSpec, card: int) -> bool:
    """Shared CONFIG with the oracle twin (like the spec itself): does
    this layer train its embedding as a frame?"""
    storage = getattr(spec, "emb_storage", "auto")
    if storage not in ("auto", "driver", "frame"):
        raise ValueError(f"emb_storage must be auto|driver|frame, got {storage!r}")
    return storage == "frame" or (storage == "auto" and card >= FRAME_EMB_THRESHOLD)


def _is_frame_emb(e) -> bool:
    return isinstance(e, DataFrame)


def _emb_rows(Ec, first):
    """Embedding block of a kernel's per-row input matrix: index the
    driver-held table by code (``Ec`` set), or stack the pre-joined
    ``__evec`` column (frame mode, ``Ec is None``)."""
    if Ec is None:
        return np.vstack(first.to_list())
    return Ec[first.to_numpy(dtype=np.int64)]


def _with_emb(frame: DataFrame, emb) -> DataFrame:
    """Frame mode: join the layer's ``(code, evec)`` embedding frame
    onto its rows; driver mode: no-op (the kernel indexes directly)."""
    if not _is_frame_emb(emb):
        return frame
    return frame.join(
        emb.select("code", F.col("evec").alias("__evec")), "code", "inner"
    )


def _emb_to_frame(spark, E: np.ndarray) -> DataFrame:
    """Ship the pinned init draw to a distributed ``(code, evec)``
    frame — the only O(card) driver touch of frame mode (the draw must
    come from the shared rng stream; swap a counter-based per-code RNG
    if cards ever outgrow a single driver array at init)."""
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(E)],
        "code bigint, evec array<double>",
    )
    return cut_lineage(df, eager=True)


def _emb_sq_norm(e) -> float:
    """This table's contribution to the loss's L2 scalar. Driver mode
    keeps the original numpy float sum; frame mode folds dec9-quantized
    squares as exact decimals (partitioning-independent — replayed by
    the twin's matching Decimal loop)."""
    if not _is_frame_emb(e):
        return float((e * e).sum())
    from decimal import Decimal

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def sq_fn(evec):
        out = []
        for row in evec.to_list():
            t = Decimal(0)
            for v in row:
                t += _dec9_py(Decimal, v * v)
            out.append(t)
        return pd.Series(out)

    sq_fn.__annotations__ = {"evec": pd.Series, "return": pd.Series}
    udf = pandas_udf(sq_fn, DECIMAL_TYPE)
    tot = e.select(udf("evec").alias("q")).agg(F.sum("q")).first()[0]
    return float(tot or 0)


def _update_emb_frame(
    emb_f: DataFrame, demb_f: DataFrame | None, lr: float, l2: float, n_b: int
) -> DataFrame:
    """One SGD step on a frame-resident embedding table — the same
    elementwise IEEE expression the driver path applies
    (``e - lr*(demb/n_b + l2*e)``), one row per code, nothing
    collected. Codes outside the batch's receptive field (left-join
    null) decay exactly like the driver path's zero-gradient rows."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def upd_fn(evec, demb):
        out = []
        for e_row, d_row in zip(evec.to_list(), demb.to_list()):
            e = np.asarray(e_row, dtype=np.float64)
            dm = np.asarray(d_row, dtype=np.float64) if d_row is not None else 0.0
            out.append([float(v) for v in e - lr * (dm / n_b + l2 * e)])
        return pd.Series(out)

    upd_fn.__annotations__ = {
        "evec": pd.Series,
        "demb": pd.Series,
        "return": pd.Series,
    }
    udf = pandas_udf(upd_fn, "array<double>")
    if demb_f is None:
        joined = emb_f.withColumn("__demb", F.lit(None).cast("array<double>"))
    else:
        joined = emb_f.join(
            demb_f.select("code", F.col("demb").alias("__demb")), "code", "left"
        )
    return cut_lineage(
        joined.select("code", udf("evec", "__demb").alias("evec")), eager=True
    )


def _assemble_child_frame(
    tables: dict[str, DataFrame], spec: EdgeLayerSpec, seed: int
) -> tuple[DataFrame, int]:
    """Level-i input frame, built once per training run:
    ``(parent_key, [child_key,] code, x array<double>)`` with x =
    globally standardized ``num_cols`` (+ the optional child_agg mean)
    and code = F12 dict-encoded ``cat_col`` (sorted distinct non-null
    → 1..n, NULL→0, built over the SAMPLED rows so engine and twin see
    one code table). The per-parent ``neighbor_budget`` sample is the
    deterministic knuth-ordered window applied BEFORE standardization
    (the stats describe exactly the rows trained on)."""
    from ..functions.encode import dict_encode
    from ..operators.sampling import sample_neighbors

    df = tables[spec.table].filter(F.col(spec.fk).isNotNull())
    sel = [F.col(spec.fk).cast("bigint").alias("parent_key")]
    has_key = spec.key is not None
    if has_key:
        sel.append(F.expr(spec.key).cast("bigint").alias("child_key"))
    # internal names: a num_col or cat_col named "value"/"code" would
    # collide with dict_encode's code-table columns
    sel += [F.col(c).alias(f"__f{i}") for i, c in enumerate(spec.num_cols)]
    sel.append(F.col(spec.cat_col).alias("__cat"))
    of = df.select(*sel)
    feat_cols = [f"__f{i}" for i in range(len(spec.num_cols))]
    if spec.child_agg is not None:
        if not has_key:
            raise ValueError("child_agg needs spec.key (the referenced column)")
        ct, cfk, cc = spec.child_agg
        agg = tables[ct].groupBy(F.col(cfk).cast("bigint").alias("child_key")).agg(
            (F.sum(F.col(cc).cast(DECIMAL_TYPE)).cast("double") / F.count(cc)).alias(
                "__child_mean"
            )
        )
        of = of.join(agg, "child_key", "left").na.fill(0.0, ["__child_mean"])
        feat_cols.append("__child_mean")
    if spec.neighbor_budget is not None:
        if not has_key:
            raise ValueError("neighbor_budget needs spec.key for the sample order")
        of = sample_neighbors(
            of, spec.neighbor_budget, seed=seed, src="child_key", dst="parent_key"
        )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in feat_cols:
        aggs.append(F.sum(F.col(c).cast(DECIMAL_TYPE)).alias(f"s_{c}"))
        aggs.append(F.sum((F.col(c) * F.col(c)).cast(DECIMAL_TYPE)).alias(f"q_{c}"))
    st = of.agg(*aggs).first()
    n = st["n"]
    if not n:
        raise ValueError(f"_assemble_child_frame: no rows in {spec.table}")
    comps = []
    for c in feat_cols:
        mu = float(st[f"s_{c}"]) / n
        sd = max(float(st[f"q_{c}"]) / n - mu * mu, 1e-12) ** 0.5
        comps.append((F.col(c) - F.lit(mu)) / F.lit(sd))
    of = dict_encode(of, "__cat", out="code")
    card = of.agg(F.max("code")).first()[0] + 1
    out_cols = ["parent_key"] + (["child_key"] if has_key else [])
    return (
        of.select(*out_cols, "code", F.array(*comps).alias("x")),
        int(card),
    )


def _with_child_hbar(frame: DataFrame, child_hb: DataFrame | None, d_child: int):
    """Join the child level's fold ``(parent_key, deg, hbar)`` onto
    this level's rows by ``child_key``; rows without children get a
    zero hbar and deg 0 (the same convention the head applies to
    childless roots)."""
    if child_hb is None:
        return frame
    hb = child_hb.select(
        F.col("parent_key").alias("child_key"),
        F.col("deg").alias("__child_deg"),
        F.col("hbar").alias("__child_hbar"),
    )
    zeros = F.array(*[F.lit(0.0)] * d_child)
    return (
        frame.join(hb, "child_key", "left")
        .withColumn("__child_hbar", F.coalesce("__child_hbar", zeros))
        .withColumn("__child_deg", F.coalesce("__child_deg", F.lit(0)))
    )


def _layer_forward_frame(
    frame: DataFrame,
    E: np.ndarray,
    W: np.ndarray,
    b: np.ndarray,
    d: int,
    child_hb: DataFrame | None = None,
    d_child: int = 0,
) -> DataFrame:
    """Layer forward + per-parent decimal fold — one lazy frame
    ``(parent_key, deg, hbar array<double>)``. The UDF embeds the
    code (in-kernel broadcast join), appends the joined child hbar
    when the spec has a deeper layer, and emits each tanh component
    dec9-quantized (one rounding rule on engine and twin), so
    ``cast(sum AS DOUBLE)/deg`` is partitioning-independent —
    bit-equal to the twin's ``float(Decimal)/deg``."""
    from decimal import Decimal

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Ec = None if _is_frame_emb(E) else E.copy()
    Wc, bc = W.copy(), b.copy()
    frame = _with_emb(_with_child_hbar(frame, child_hb, d_child), E)
    first = "__evec" if Ec is None else "code"

    if child_hb is None:

        def h_fn(code, x):
            X = np.concatenate([_emb_rows(Ec, code), np.vstack(x.to_list())], axis=1)
            H = np.tanh(row_logits(X, Wc, bc))
            return pd.Series([[_dec9_py(Decimal, v) for v in row] for row in H])

        h_fn.__annotations__ = {"code": pd.Series, "x": pd.Series, "return": pd.Series}
        udf = pandas_udf(h_fn, f"array<{DECIMAL_TYPE}>")
        h = frame.select("parent_key", udf(first, "x").alias("h"))
    else:

        def h_fn(code, x, chb):
            X = np.concatenate(
                [
                    _emb_rows(Ec, code),
                    np.vstack(x.to_list()),
                    np.vstack(chb.to_list()),
                ],
                axis=1,
            )
            H = np.tanh(row_logits(X, Wc, bc))
            return pd.Series([[_dec9_py(Decimal, v) for v in row] for row in H])

        h_fn.__annotations__ = {
            "code": pd.Series,
            "x": pd.Series,
            "chb": pd.Series,
            "return": pd.Series,
        }
        udf = pandas_udf(h_fn, f"array<{DECIMAL_TYPE}>")
        h = frame.select("parent_key", udf(first, "x", "__child_hbar").alias("h"))

    sums = h.groupBy("parent_key").agg(
        F.count(F.lit(1)).alias("deg"),
        *[F.sum(F.element_at("h", j + 1)).alias(f"s{j}") for j in range(d)],
    )
    return sums.select(
        "parent_key",
        "deg",
        F.array(
            *[F.col(f"s{j}").cast("double") / F.col("deg") for j in range(d)]
        ).alias("hbar"),
    )


def _join_gradient(frame: DataFrame, g_frame: DataFrame) -> DataFrame:
    """Attach the parent-level gradient ``(key, gout, deg)`` to this
    level's rows (inner: a row without a parent gradient is outside
    the batch's receptive field by construction)."""
    g = g_frame.select(
        F.col("key").alias("parent_key"),
        F.col("gout").alias("__gout"),
        F.col("gdeg").alias("__gdeg"),
    )
    return frame.join(g, "parent_key", "inner")


def _require_nonnull_sums(tot_row, glen: int) -> None:
    """A decimal SUM over a NON-EMPTY frame can only be NULL when the
    accumulator overflowed (non-ANSI Spark nulls instead of raising);
    folding that into ``float(x or 0)`` would silently zero a
    gradient. Empty frames legitimately sum to NULL and pass."""
    if tot_row["__n"] == 0:
        return
    bad = [i for i in range(glen) if tot_row[f"v{i}"] is None]
    if bad:
        raise ArithmeticError(
            "decimal overflow in frame-mode gradient fold: NULL sum for "
            f"components {bad[:8]}{'…' if len(bad) > 8 else ''} over a "
            f"non-empty ({tot_row['__n']}-row) gradient frame"
        )


def _layer_backward_fold(
    joined: DataFrame,
    E: np.ndarray,
    W: np.ndarray,
    b: np.ndarray,
    d_e: int,
    m: int,
    d: int,
    card: int,
    with_child: bool,
):
    """Backprop through the aggregation and tanh — ONE Spark job.
    Per row: ``g = gout/gdeg`` (dL/dh for this row), ``delta = g *
    (1 - h²)``; the per-code decimal fold of ``[X (x) delta ++
    delta]`` yields ``(dW, db, demb)`` exactly as in the original
    two-layer trainer (``demb[c] = (Σ_{code=c} delta) @ W[:d_e].T``).
    Bit-deterministic under any partitioning.

    Frame-emb mode (``E`` a DataFrame — VERDICT r5 #2): nothing
    O(card) ever reaches the driver. ``dW``/``db`` come from ONE
    global decimal agg (exact decimal addition is associative, so the
    global fold bit-equals the driver path's per-code-then-total
    fold), and ``demb`` is returned as a distributed ``(code, demb)``
    frame — each row the same ``dsum @ W[:d_e].T`` gemv the driver
    path runs per code."""
    from decimal import Decimal

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    glen = m * d + d
    frame_mode = _is_frame_emb(E)
    Ec = None if frame_mode else E.copy()
    Wc, bc = W.copy(), b.copy()
    first = "__evec" if frame_mode else "code"

    def make_out(codes, xs, chbs, gouts, gdegs):
        parts = [_emb_rows(Ec, codes), np.vstack(xs.to_list())]
        if chbs is not None:
            parts.append(np.vstack(chbs.to_list()))
        X = np.concatenate(parts, axis=1)
        G = np.vstack(gouts.to_list()) / gdegs.to_numpy(dtype=np.float64)[:, None]
        H = np.tanh(row_logits(X, Wc, bc))
        D = G * (1.0 - H * H)
        out = np.concatenate(
            [(X[:, :, None] * D[:, None, :]).reshape(len(X), -1), D], axis=1
        )
        return pd.Series([[_dec9_py(Decimal, v) for v in row] for row in out])

    if with_child:

        def g_fn(code, x, chb, gout, gdeg):
            return make_out(code, x, chb, gout, gdeg)

        g_fn.__annotations__ = {
            "code": pd.Series,
            "x": pd.Series,
            "chb": pd.Series,
            "gout": pd.Series,
            "gdeg": pd.Series,
            "return": pd.Series,
        }
        udf = pandas_udf(g_fn, f"array<{DECIMAL_TYPE}>")
        g = joined.select(
            "code", udf(first, "x", "__child_hbar", "__gout", "__gdeg").alias("g")
        )
    else:

        def g_fn(code, x, gout, gdeg):
            return make_out(code, x, None, gout, gdeg)

        g_fn.__annotations__ = {
            "code": pd.Series,
            "x": pd.Series,
            "gout": pd.Series,
            "gdeg": pd.Series,
            "return": pd.Series,
        }
        udf = pandas_udf(g_fn, f"array<{DECIMAL_TYPE}>")
        g = joined.select("code", udf(first, "x", "__gout", "__gdeg").alias("g"))

    if not frame_mode:
        rows = (
            g.groupBy("code")
            .agg(
                *[F.sum(F.element_at("g", i + 1)).alias(f"v{i}") for i in range(glen)]
            )
            .collect()
        )
        tot = [Decimal(0)] * glen
        demb = np.zeros((card, d_e))
        for r in rows:
            for i in range(glen):
                v = r[f"v{i}"]
                if v is not None:
                    tot[i] += v
            dsum = np.array([float(r[f"v{m * d + j}"] or 0) for j in range(d)])
            demb[r["code"]] = dsum @ Wc[:d_e].T
        dW = np.array([float(tot[i]) for i in range(m * d)]).reshape(m, d)
        db = np.array([float(tot[m * d + i]) for i in range(d)])
        return dW, db, demb

    # frame mode: materialize the per-row gradient vectors once, then
    # one bounded-global agg (m·d+d scalars to the driver) plus the
    # distributed per-code delta fold → (code, demb) frame
    g = cut_lineage(g, eager=True)
    tot_row = g.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.element_at("g", i + 1)).alias(f"v{i}") for i in range(glen)]
    ).first()
    _require_nonnull_sums(tot_row, glen)
    dW = np.array(
        [float(tot_row[f"v{i}"] or 0) for i in range(m * d)]
    ).reshape(m, d)
    db = np.array([float(tot_row[f"v{m * d + i}"] or 0) for i in range(d)])
    dsums = g.groupBy("code").agg(
        *[
            F.sum(F.element_at("g", m * d + j + 1)).cast("double").alias(f"s{j}")
            for j in range(d)
        ]
    )
    # ship the C-contiguous base and take the .T view inside the UDF,
    # so the per-code gemv sees the exact memory layout (and hence
    # BLAS path) of the driver path's ``dsum @ Wc[:d_e].T``
    Wde = Wc[:d_e].copy()

    def demb_fn(s):
        WT = Wde.T
        A = np.vstack(s.to_list()).astype(np.float64)
        return pd.Series([[float(v) for v in row @ WT] for row in A])

    demb_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    dudf = pandas_udf(demb_fn, "array<double>")
    demb_frame = dsums.select(
        "code",
        dudf(F.array(*[F.col(f"s{j}") for j in range(d)])).alias("demb"),
    )
    return dW, db, demb_frame


def _layer_g_next_frame(
    joined: DataFrame,
    E: np.ndarray,
    W: np.ndarray,
    b: np.ndarray,
    d_e: int,
    nx: int,
    d: int,
    d_child: int,
) -> DataFrame:
    """Produce the NEXT level's gradient frame ``(key, gout, gdeg)``
    from this level's rows — one per-row Spark job, no driver state:
    ``gout = delta @ W[hbar-slice].T`` (fixed-order accumulation) and
    ``gdeg`` = this row's child count (the mean divisor). Rows without
    children carry gdeg 0 and are dropped by the child's inner
    gradient join before any division happens."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Ec = None if _is_frame_emb(E) else E.copy()
    Wc, bc = W.copy(), b.copy()
    first = "__evec" if Ec is None else "code"
    WhT = W[d_e + nx :].T.copy()  # (d, d_child)
    zeros = np.zeros(d_child)

    def gn_fn(code, x, chb, gout, gdeg):
        X = np.concatenate(
            [_emb_rows(Ec, code), np.vstack(x.to_list()), np.vstack(chb.to_list())],
            axis=1,
        )
        G = np.vstack(gout.to_list()) / gdeg.to_numpy(dtype=np.float64)[:, None]
        H = np.tanh(row_logits(X, Wc, bc))
        D = G * (1.0 - H * H)
        out = row_logits(D, WhT, zeros)
        return pd.Series([list(map(float, row)) for row in out])

    gn_fn.__annotations__ = {
        "code": pd.Series,
        "x": pd.Series,
        "chb": pd.Series,
        "gout": pd.Series,
        "gdeg": pd.Series,
        "return": pd.Series,
    }
    udf = pandas_udf(gn_fn, "array<double>")
    return joined.select(
        F.col("child_key").alias("key"),
        udf(first, "x", "__child_hbar", "__gout", "__gdeg").alias("gout"),
        F.col("__child_deg").alias("gdeg"),
    )


def train_relational_stack(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list],
    layers: tuple[EdgeLayerSpec, ...] = (ORDERS_LAYER_SPEC,),
    target: tuple[str, str] = ("customer", "c_mktsegment"),
    cat_col: str = "c_nationkey",
    num_cols: tuple[str, ...] = ("c_acctbal",),
    dim: int = 4,
    epochs: int = 3,
    n_batches: int = 2,
    lr: float = 0.5,
    l2: float = 1e-4,
    seed: int = 42,
    neighbor_budget: int | None = 5,
    task: str = "classification",
    fit_fn=None,
    _batch_mode: str = "semi",
    _eval_mode: str = "join",
    _root_mode: str = "shard",
) -> TrainResult:
    """Minibatch SGD through a depth-(L+1) stack declared by
    ``layers`` — see the module docstring for the model, the
    determinism contract, and the scale posture. ``neighbor_budget``
    caps the ROOT frame's aggregate fan-out (the head's untrained
    neighbor statistics); each layer's fan-out cap lives on its spec.

    ``task="regression"`` swaps the head for the k=1 linear /
    half-squared-error branch (train-standardized double label, the
    reference's ``TaskType.REGRESSION``/``MSELoss`` —
    ``nn/lightning/lightning_wrapper.py:40,50-55``); the deep layers
    are unchanged, and ``TrainResult.accuracy`` carries per-split MSE
    in standardized-label space.

    ``fit_fn`` is the TorchDistributor hand-off seam the 1-layer
    trainer also carries: when set, it receives ``(frame, frames,
    meta)`` — the assembled (and lineage-cut) root frame, the per-layer
    child frames, and the root metadata — and takes over training
    entirely (e.g. materialize to Parquet shards and run DDP); the
    assembly plans are identical either way.

    ``_batch_mode``/``_eval_mode``/``_root_mode`` select the scale
    paths ("semi", "join", "shard" — the defaults) or the driver-side
    reference paths ("isin", "collect", "collect"); both members of
    each pair are bit-identical by construction and pinned so in
    tests. ``_root_mode="shard"`` (VERDICT r5 #1) computes the
    portable-hash batch assignment IN SPARK and collects only the
    current batch's root rows per step, so driver residency in the
    training loop is O(batch), never O(roots); "collect" is the
    original up-front all-train-roots materialization (the reference
    trainer's memory shape, ``experiments/blueprint_mlflow.py:119-133``
    seed-node batches).
    """
    from ..functions.hashing import knuth_hash, knuth_hash_py

    L = len(layers)
    if L == 0:
        raise ValueError("train_relational_stack needs at least one layer spec")
    if _batch_mode == "isin" and _root_mode != "collect":
        raise ValueError(
            "_batch_mode='isin' needs the driver-side root ids — "
            "use _root_mode='collect' with it"
        )
    for i in range(L - 1):
        if layers[i].key is None:
            raise ValueError(
                f"layer {i} ({layers[i].table}) needs a key expression — "
                "the next layer's rows join by their fk to these keys"
            )

    frame, meta = assemble_training_frame(
        tables,
        primary_keys,
        foreign_keys,
        target,
        cat_col,
        num_cols,
        seed=seed,
        neighbor_budget=neighbor_budget,
        task=task,
    )
    spark = frame.sparkSession
    frames: list[DataFrame] = []
    cards: list[int] = []
    for spec in layers:
        f, card = _assemble_child_frame(tables, spec, seed)
        frames.append(cut_lineage(f, eager=True))
        cards.append(card)
    use_frame = [_resolve_frame_emb(layers[i], cards[i]) for i in range(L)]
    if fit_fn is not None:
        return fit_fn(frame, frames, meta)

    # the seed-node set. "shard" computes the batch assignment in
    # Spark with the SAME portable knuth hash and collects only one
    # batch's rows at a time; "collect" materializes all train roots
    # up-front (the reference trainer's memory shape). Both orders are
    # node_id-sorted per batch, so the head-step arrays — and hence
    # the whole trajectory — are bit-identical between the modes.
    train_f = frame.filter(F.col("split") == "train").select(
        "node_id", "code", "nums", "label"
    )
    y_dtype = np.float64 if task == "regression" else np.int64

    def _to_arrays(rows):
        rows.sort(key=lambda r: r["node_id"])
        return (
            np.array([r["node_id"] for r in rows], dtype=np.int64),
            np.array([r["code"] for r in rows], dtype=np.int64),
            np.array([list(r["nums"]) for r in rows], dtype=np.float64),
            np.array([r["label"] for r in rows], dtype=y_dtype),
        )

    if _root_mode == "shard":
        train_f = cut_lineage(
            train_f.withColumn(
                "__batch", knuth_hash(F.col("node_id"), seed + 7) % F.lit(n_batches)
            ),
            eager=True,
        )
        present = {
            int(r["__batch"])
            for r in train_f.select("__batch").distinct().collect()
        }
        if present != set(range(n_batches)):
            raise ValueError(
                "train_relational_stack: a batch is empty — lower n_batches "
                "or grow the input"
            )

        def batch_arrays(bi):
            return _to_arrays(
                train_f.filter(F.col("__batch") == bi).drop("__batch").collect()
            )

        def batch_keys_df(bi):
            return F.broadcast(
                train_f.filter(F.col("__batch") == bi).select(
                    F.col("node_id").alias("parent_key")
                )
            )

    else:
        ids, codes, nums, y = _to_arrays(train_f.collect())
        batch_of = np.array(
            [knuth_hash_py(int(i), seed + 7) % n_batches for i in ids],
            dtype=np.int64,
        )
        if set(np.unique(batch_of)) != set(range(n_batches)):
            raise ValueError(
                "train_relational_stack: a batch is empty — lower n_batches "
                "or grow the input"
            )

        def batch_arrays(bi):
            sel = batch_of == bi
            return ids[sel], codes[sel], nums[sel], y[sel]

        def batch_keys_df(bi):
            return F.broadcast(
                spark.createDataFrame(
                    [(int(i),) for i in ids[batch_of == bi]],
                    "parent_key bigint",
                )
            )

    k = meta["n_classes"]
    m = meta["n_num"]
    card0 = meta["n_codes"]
    # pinned init-draw order: root embedding, then every layer's
    # embedding, then every layer's W, then the head — for L=1 this is
    # the original two-layer order (emb, emb1, W1, W2)
    rng = np.random.default_rng(seed)
    emb = rng.uniform(-0.5, 0.5, size=(card0, dim))
    l_emb = []
    for i in range(L):
        E0 = rng.uniform(-0.5, 0.5, size=(cards[i], layers[i].emb_dim))
        l_emb.append(_emb_to_frame(spark, E0) if use_frame[i] else E0)
    dims = []  # (d_e, nx, d, m_i) per layer
    for i, spec in enumerate(layers):
        d_child = layers[i + 1].hidden_dim if i + 1 < L else 0
        m_i = spec.emb_dim + spec.n_feats + d_child
        dims.append((spec.emb_dim, spec.n_feats, spec.hidden_dim, m_i))
    l_W = [
        rng.uniform(-0.5, 0.5, size=(dims[i][3], dims[i][2])) * 0.1 for i in range(L)
    ]
    l_b = [np.zeros(dims[i][2]) for i in range(L)]
    d1 = dims[0][2]
    W_head = rng.uniform(-0.5, 0.5, size=(dim + m + d1, k)) * 0.1
    b_head = np.zeros(k)

    def forward_chain(level_frames):
        """hbar frames bottom-up; returns (top fold frame keyed by
        root, child_hb_for: per-level child fold frames)."""
        child_hb_for: dict[int, DataFrame | None] = {L - 1: None}
        hb = None
        for i in reversed(range(L)):
            d_child = dims[i + 1][2] if i + 1 < L else 0
            hbf = _layer_forward_frame(
                level_frames[i], l_emb[i], l_W[i], l_b[i], dims[i][2],
                child_hb=hb, d_child=d_child,
            )
            if i > 0:
                hbf = cut_lineage(hbf, eager=True)
                child_hb_for[i - 1] = hbf
            hb = hbf
        return hb, child_hb_for

    # receptive-field pruning, built ONCE per batch (the portable-hash
    # batches never change across epochs): broadcast semi-joins down
    # the stack (or the driver-side isin literal, for the pinned
    # equality test), materialized so every epoch's steps reuse the
    # pruned frames instead of re-running the join chain per action
    batch_frames: list[list[DataFrame]] = []
    for bi in range(n_batches):
        f_b: list[DataFrame] = []
        if _batch_mode == "semi":
            cur = frames[0].join(batch_keys_df(bi), "parent_key", "leftsemi")
        else:
            bids = ids[batch_of == bi]
            cur = frames[0].filter(
                F.col("parent_key").isin([int(i) for i in bids])
            )
        f_b.append(cut_lineage(cur, eager=True))
        for i in range(1, L):
            parent_keys = f_b[i - 1].select(
                F.col("child_key").alias("parent_key")
            )
            f_b.append(
                cut_lineage(
                    frames[i].join(parent_keys, "parent_key", "leftsemi"),
                    eager=True,
                )
            )
        batch_frames.append(f_b)

    losses: list[float] = []
    for _ in range(epochs):
        for bi in range(n_batches):
            bids, codes_b, nums_b, y_b = batch_arrays(bi)
            n_b = len(bids)
            f_b = batch_frames[bi]

            hb1, child_hb_for = forward_chain(f_b)
            hbar = np.zeros((n_b, d1))
            degs = np.zeros(n_b, dtype=np.int64)
            hb_rows = {
                int(r["parent_key"]): (np.array(r["hbar"]), r["deg"])
                for r in hb1.collect()
            }
            for j, i in enumerate(bids):
                if int(i) in hb_rows:
                    hbar[j], degs[j] = hb_rows[int(i)]
            extra_l2 = float(sum(_emb_sq_norm(E) for E in l_emb)) + float(
                sum(float((W * W).sum()) for W in l_W[1:])
            )
            loss, GW2, gb2, demb0, gH = two_layer_head_step(
                codes_b, nums_b, hbar, y_b, emb, l_W[0], W_head, b_head,
                l2, extra_l2=extra_l2, task=task,
            )
            losses.append(loss)

            # level-1 gradient frame from the head (bounded by batch
            # size; broadcast into the join), then fold level by level
            g_rows = [
                (int(i), [float(v) for v in gH[j]], int(degs[j]))
                for j, i in enumerate(bids)
                if degs[j] > 0
            ]
            grads = []
            if g_rows:
                g_frame = F.broadcast(
                    spark.createDataFrame(
                        g_rows, "key bigint, gout array<double>, gdeg bigint"
                    )
                )
                for i in range(L):
                    d_e, nx, d, m_i = dims[i]
                    with_child = i + 1 < L
                    joined = _join_gradient(
                        _with_emb(
                            _with_child_hbar(
                                f_b[i],
                                child_hb_for[i],
                                dims[i + 1][2] if with_child else 0,
                            ),
                            l_emb[i],
                        ),
                        g_frame,
                    )
                    grads.append(
                        _layer_backward_fold(
                            joined, l_emb[i], l_W[i], l_b[i], d_e, m_i, d,
                            cards[i], with_child,
                        )
                    )
                    if with_child:
                        g_frame = _layer_g_next_frame(
                            joined, l_emb[i], l_W[i], l_b[i], d_e, nx, d,
                            dims[i + 1][2],
                        )
            else:  # every batch root is childless — nothing to backprop
                grads = [
                    (
                        np.zeros_like(l_W[i]),
                        np.zeros_like(l_b[i]),
                        None if use_frame[i] else np.zeros_like(l_emb[i]),
                    )
                    for i in range(L)
                ]

            # all folds computed at step-start parameters; update last
            emb -= lr * (demb0 / n_b + l2 * emb)
            W_head -= lr * (GW2 / n_b + l2 * W_head)
            b_head -= lr * (gb2 / n_b)
            for i in range(L):
                dW, db_i, demb_i = grads[i]
                if use_frame[i]:
                    l_emb[i] = _update_emb_frame(l_emb[i], demb_i, lr, l2, n_b)
                else:
                    l_emb[i] -= lr * (demb_i / n_b + l2 * l_emb[i])
                l_W[i] -= lr * (dW / n_b + l2 * l_W[i])
                l_b[i] -= lr * (db_i / n_b)

    accuracy = _stack_eval(
        frame, frames, emb, l_emb, l_W, l_b, W_head, b_head, dims, L,
        mode=_eval_mode, task=task,
    )
    params = {
        "emb": emb,
        "W_head": W_head,
        "b_head": b_head,
        "layers": [
            {"emb": l_emb[i], "W": l_W[i], "b": l_b[i]} for i in range(L)
        ],
    }
    return TrainResult(losses=losses, accuracy=accuracy, params=params)


def _stack_eval(
    frame,
    frames,
    emb,
    l_emb,
    l_W,
    l_b,
    W_head,
    b_head,
    dims,
    L,
    mode="join",
    task="classification",
):
    """Final per-split metric with the trained parameters — accuracy
    (argmax) for classification, MSE in standardized-label space for
    regression. The ``"join"`` path (default — VERDICT r4 #2a) joins
    the full trained hbar onto the root frame and predicts in an Arrow
    UDF (one Spark job, nothing root-sized on the driver);
    ``"collect"`` is the original driver-side loop, kept only so tests
    can pin bit-equality. Both use the same fixed-order ``row_logits``
    accumulation per row."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    d1 = dims[0][2]
    regression = task == "regression"
    hb = None
    for i in reversed(range(L)):
        d_child = dims[i + 1][2] if i + 1 < L else 0
        hb = _layer_forward_frame(
            frames[i], l_emb[i], l_W[i], l_b[i], dims[i][2],
            child_hb=hb, d_child=d_child,
        )
        if i > 0:
            hb = cut_lineage(hb, eager=True)

    if mode == "collect":
        from decimal import Decimal

        hb_all = {
            int(r["parent_key"]): np.array(r["hbar"]) for r in hb.collect()
        }
        acc: dict[str, list] = {}
        for r in frame.select("node_id", "code", "nums", "label", "split").collect():
            hvec = hb_all.get(int(r["node_id"]), np.zeros(d1))
            X = np.concatenate(
                [emb[int(r["code"])], np.array(list(r["nums"])), hvec]
            )
            out = row_logits(X[None, :], W_head, b_head)[0]
            if regression:
                err = out[0] - r["label"]
                # dec9-quantized like the join path's decimal fold, so
                # the two eval modes stay bit-identical
                acc.setdefault(r["split"], []).append(
                    _dec9_py(Decimal, err * err)
                )
            else:
                pred = int(np.argmax(out))
                acc.setdefault(r["split"], []).append(float(pred == r["label"]))
        if regression:
            return {s: float(sum(v)) / len(v) for s, v in acc.items()}
        return {s: sum(v) / len(v) for s, v in acc.items()}

    Ec, Wc, bc = emb.copy(), W_head.copy(), b_head.copy()

    def pred_fn(code, nums, hbar):
        codes = code.to_numpy(dtype=np.int64)
        X = np.concatenate(
            [Ec[codes], np.vstack(nums.to_list()), np.vstack(hbar.to_list())], axis=1
        )
        out = row_logits(X, Wc, bc)
        if regression:
            return pd.Series(out[:, 0])
        return pd.Series(np.argmax(out, axis=1).astype(np.int64))

    pred_fn.__annotations__ = {
        "code": pd.Series,
        "nums": pd.Series,
        "hbar": pd.Series,
        "return": pd.Series,
    }
    pudf = pandas_udf(pred_fn, "double" if regression else "bigint")
    zeros = F.array(*[F.lit(0.0)] * d1)
    joined = (
        frame.join(
            hb.select(F.col("parent_key").alias("node_id"), "hbar"),
            "node_id",
            "left",
        )
        .withColumn("hbar", F.coalesce("hbar", zeros))
    )
    err = F.col("pred") - F.col("label")
    if regression:
        # exact decimal fold: a plain avg of doubles depends on the
        # partition summation order — the fold makes the MSE
        # partitioning-independent and bit-equal to the collect path
        metric = (
            F.sum((err * err).cast(DECIMAL_TYPE)).cast("double")
            / F.count(F.lit(1))
        )
    else:
        metric = F.avg((F.col("pred") == F.col("label")).cast("double"))
    rows = (
        joined.select(
            "split", "label", pudf("code", "nums", "hbar").alias("pred")
        )
        .groupBy("split")
        .agg(metric.alias("m"))
        .collect()
    )
    return {r["split"]: r["m"] for r in rows}


def predict_relational_stack(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list],
    result,
    layers: tuple[EdgeLayerSpec, ...] = (ORDERS_LAYER_SPEC,),
    target: tuple[str, str] = ("customer", "c_mktsegment"),
    cat_col: str = "c_nationkey",
    num_cols: tuple[str, ...] = ("c_acctbal",),
    seed: int = 42,
    neighbor_budget: int | None = 5,
    task: str = "classification",
) -> DataFrame:
    """Batch inference: score every root node with a trained stack's
    parameters (``result`` is the :class:`TrainResult` from
    :func:`train_relational_stack`, or its ``params`` dict) — the
    write-predictions-back surface the metric-only ``_stack_eval``
    doesn't expose. Returns ``(node_id, label, split, pred)`` — and for
    regression also ``pred_raw`` (de-standardized with the train-split
    mean/std the assembly recorded), since ``pred``/``label`` live in
    standardized space.

    Transductive contract (matches the reference experiment's predict
    step): the feature assembly — aggregation stats standardization,
    label factorization, splits — derives from THIS database with THIS
    seed, exactly as at train time, so pass the same arguments the
    trainer got. Per-split accuracy/MSE aggregated from this frame is
    bit-identical to ``result.accuracy`` (pinned in tests).

    Scale shape: the forward folds are the trainer's own
    ``_layer_forward_frame`` chain (per-layer lineage-cut); prediction
    is ONE Arrow pass over the root frame joined to the top fold —
    nothing root-sized on the driver."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    params = result.params if isinstance(result, TrainResult) else result
    L = len(layers)
    frame, meta = assemble_training_frame(
        tables, primary_keys, foreign_keys, target, cat_col, num_cols,
        seed=seed, neighbor_budget=neighbor_budget, task=task,
    )
    frames = [
        cut_lineage(_assemble_child_frame(tables, spec, seed)[0], eager=True)
        for spec in layers
    ]
    dims = []
    for i, spec in enumerate(layers):
        d_child = layers[i + 1].hidden_dim if i + 1 < L else 0
        dims.append(
            (spec.emb_dim, spec.n_feats, spec.hidden_dim,
             spec.emb_dim + spec.n_feats + d_child)
        )
    l_emb = [p["emb"] for p in params["layers"]]
    l_W = [p["W"] for p in params["layers"]]
    l_b = [p["b"] for p in params["layers"]]
    hb = None
    for i in reversed(range(L)):
        d_child = dims[i + 1][2] if i + 1 < L else 0
        hb = _layer_forward_frame(
            frames[i], l_emb[i], l_W[i], l_b[i], dims[i][2],
            child_hb=hb, d_child=d_child,
        )
        if i > 0:
            hb = cut_lineage(hb, eager=True)

    d1 = dims[0][2]
    regression = task == "regression"
    Ec = params["emb"].copy()
    Wc, bc = params["W_head"].copy(), params["b_head"].copy()

    def pred_fn(code, nums, hbar):
        codes = code.to_numpy(dtype=np.int64)
        X = np.concatenate(
            [Ec[codes], np.vstack(nums.to_list()), np.vstack(hbar.to_list())],
            axis=1,
        )
        out = row_logits(X, Wc, bc)
        if regression:
            return pd.Series(out[:, 0])
        return pd.Series(np.argmax(out, axis=1).astype(np.int64))

    pred_fn.__annotations__ = {
        "code": pd.Series, "nums": pd.Series, "hbar": pd.Series,
        "return": pd.Series,
    }
    pudf = pandas_udf(pred_fn, "double" if regression else "bigint")
    zeros = F.array(*[F.lit(0.0)] * d1)
    out = (
        frame.join(
            hb.select(F.col("parent_key").alias("node_id"), "hbar"),
            "node_id",
            "left",
        )
        .withColumn("hbar", F.coalesce("hbar", zeros))
        .select(
            "node_id", "label", "split",
            pudf("code", "nums", "hbar").alias("pred"),
        )
    )
    if regression:
        out = out.withColumn(
            "pred_raw",
            F.col("pred") * F.lit(float(meta["y_std"]))
            + F.lit(float(meta["y_mean"])),
        )
    return out
