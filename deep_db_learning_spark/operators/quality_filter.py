"""Model-based quality filtering — a logistic-regression document
classifier over hashed n-gram features, trained IN-ENGINE and scored
as a pure decimal fold. The canonical "quality classifier" stage of
pretraining-data curation (GPT-3 trained an LR filter against WebText;
CCNet and the Llama corpus reports describe the same shape): label a
small trusted slice positive, the raw crawl negative, train a linear
model, keep documents the model scores target-like. DSIR
(``operators/dsir.py``) is the importance-weighting view of the same
problem; this operator is the discriminative view — together they
close the standard selection toolbox.

Spark-first decomposition (the ``tabnet_full``/DSIR recipes combined):

1. **Features**: per-document hashed unigram+bigram counts —
   ``dsir.doc_ngram_buckets`` (pure codegen flatMap, portable md5)
   grouped to ``(doc, bucket, c)``. Materialized ONCE
   (``cut_lineage``); every epoch reuses the narrow frame.
2. **Forward**: ``z_d = w0 + Σ_b c_db · w_b`` with the weights dec9
   decimals, so the fold is EXACT and partitioning-independent; the
   per-document sigmoid/logloss run in ONE Arrow kernel (numpy
   float64 — the attention-kernel precedent: the python twin calls
   the same numpy, so the nonlinearity is bit-identical without any
   cross-engine libm assumption).
3. **Gradient**: ``∂/∂w_b = Σ_d (σ_d − y_d) · c_db`` — the residual
   crosses back into decimal by the engine's own shortest-repr dec9
   cast (``train_oracle._dec9`` is the shared twin rule), the
   per-bucket fold is exact, and only ``n_buckets`` values ever reach
   the driver.
4. **Update**: driver-side through :func:`_lr_update` — ONE shared
   float arithmetic (used verbatim by the python twin), re-quantized
   dec9 so the next epoch's broadcast weights are exact decimals
   again.
5. **Score**: :func:`quality_logit_scores` emits the LOGIT (monotone
   in the probability — thresholding and ranking are unchanged) as a
   broadcast-join decimal fold, so scoring has NO transcendental and
   the DuckDB oracle reproduces it bit-for-bit (the dsir_scores
   pattern). The probability rendering, when wanted, is one
   deterministic Arrow pass downstream.

Twin regime: :func:`fit_quality_filter_py` replays the whole descent
(decimal folds via python ``Decimal``, the same numpy nonlinearity,
the same ``_lr_update``) from DuckDB-read features — per-epoch losses
and every weight are bit-equal to the engine's (pytest pins both; the
driver slot re-fits through the twin and hashes the scores).

100 TB posture: per epoch the TRAINING SET is touched by exactly two
shuffles (the z fold and the gradient fold — both map-side
combinable) plus one Arrow pass; driver state is ``n_buckets``
decimals; the feature frame is built once. No step ranks, collects,
or windows over the corpus. At corpus scale use ``sample_n`` — the
GPT-3/CCNet practice: a bounded deterministic per-class sample (md5
keys through the scale-safe threshold cut) is featurized and
descended on, and the full corpus is only ever touched by the single
scoring fold of :func:`quality_logit_scores`. Full-batch (the
default) remains the oracle-covered exact path at fixture scale.
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_count, cut_lineage
from ..functions.exact_agg import DECIMAL_TYPE
from ..plans.train_oracle import _dec9

QF_CONFIG = {"n_buckets": 512, "epochs": 3, "lr": 0.05, "l2": 1e-4}


@dataclass
class QFModel:
    """Trained filter: dec9 weights (exact decimals — broadcast
    literals for scoring), per-epoch logloss SUMS (exact decimals —
    the bit-parity pin), and the training row count."""

    w0: Decimal
    w: list
    losses: list
    n_docs: int
    n_buckets: int


def _grad_loss_np(z, y):
    """The per-document nonlinearity, shared by the engine's Arrow
    kernel and the python twin — float64 numpy end to end, so both
    sides compute identical bits. Returns ``(g, loss)`` with
    ``g = σ(z) − y`` and the overflow-stable logloss
    ``log(1+e^{−z}) + (1−y)·z``."""
    import numpy as np

    zz = np.asarray(z, dtype="float64")
    yy = np.asarray(y, dtype="float64")
    g = 1.0 / (1.0 + np.exp(-zz)) - yy
    loss = np.logaddexp(0.0, -zz) + (1.0 - yy) * zz
    return g, loss


def _lr_update(w, grad, n_docs: int, lr: float, l2: float):
    """One GD step in ONE shared float arithmetic (fixed op order),
    re-quantized dec9: ``w ← dec9(w − lr·(g/N + l2·w))``. The
    intercept passes ``l2=0``."""
    out = []
    for wi, gi in zip(w, grad):
        step = lr * (float(gi) / n_docs + l2 * float(wi))
        out.append(_dec9(float(wi) - step))
    return out


def doc_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    spread: bool = True,
) -> DataFrame:
    """``(id_col, bucket, c)`` — per-document hashed-n-gram counts,
    the classifier's sparse feature rows (integer counts: exact
    decimal factors)."""
    from .dsir import doc_ngram_buckets

    n_buckets = QF_CONFIG["n_buckets"] if n_buckets is None else n_buckets
    return (
        doc_ngram_buckets(df, text_col, id_col, n_buckets, spread=spread)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def doc_features_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> str:
    """DuckDB twin of :func:`doc_features` (over the shared
    ``doc_ngram_buckets_sql`` featurizer)."""
    from .dsir import doc_ngram_buckets_sql

    n_buckets = QF_CONFIG["n_buckets"] if n_buckets is None else n_buckets
    inner = doc_ngram_buckets_sql(table, text_col, id_col, n_buckets)
    return f"""
        SELECT {id_col}, bucket, count(*) AS c
        FROM ({inner}) GROUP BY {id_col}, bucket
    """


def _qfs_key_py(seed: int, doc_id) -> int:
    """Python twin of the engine's training-sample key — first 32 bits
    of ``md5("qfs:<seed>:<id>")`` (the :func:`~..functions.hashing.
    md5_prefix_hash` arithmetic; Spark's string cast of a BIGINT id and
    python's ``str()`` render identically)."""
    import hashlib

    return int(
        hashlib.md5(f"qfs:{seed}:{doc_id}".encode()).hexdigest()[:8], 16
    )


def qf_training_sample_py(labels: dict, sample_n: int, seed: int = 42) -> dict:
    """Python twin of the engine's per-class training sample: from each
    label class, the ``sample_n`` docs with the smallest
    ``(md5 key, id)`` — exactly the set ``ORDER BY key ASC, id ASC
    LIMIT sample_n`` keeps (the :func:`~.selection.topk_threshold_cut`
    contract). Returns the sampled ``{doc: y}``."""
    chosen = {}
    for side in (0.0, 1.0):
        cls = sorted(
            (d for d, y in labels.items() if float(y) == side),
            key=lambda d: (_qfs_key_py(seed, d), d),
        )
        for d in cls[:sample_n]:
            chosen[d] = labels[d]
    return chosen


def _fit_label_guards(
    lab: DataFrame, id_col: str, label_col: str, check_binary: bool
) -> int:
    """All the loud fit-time failures in ONE aggregate scan (VERDICT
    r11 task 3 — these were three separate jobs over the same
    checkpointed label frame): row count, NULL/NaN-label count (a
    NULL/NaN label becomes NaN in the Arrow gradient kernel and the
    NaN→decimal(20,9) cast silently NULLs — the row would vanish from
    the gradient/loss folds while still counted in ``n_docs``, a
    silent mis-train), distinct-id count (duplicate ids would merge
    two documents' features under one z while the label side keeps
    both rows), and — sampled mode only — the non-binary-label count
    (a third class would silently vanish from the per-class cuts).
    ``count_distinct`` ignores NULL ids, so the any-NULL max adds the
    NULL group back — identical to ``.distinct().count()`` semantics.
    Exactly ONE action (pinned in pytest); error messages unchanged
    from the three-job form."""
    y = F.col("__y")
    bad_y = y.isNull() | F.isnan(y)
    row = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(bad_y, 1)).alias("bad"),
        (
            F.count_distinct(F.col(id_col))
            + F.max(F.col(id_col).isNull().cast("long"))
        ).alias("ids"),
        F.count(F.when(~bad_y & ~y.isin(0.0, 1.0), 1)).alias("nonbin"),
    ).first()
    if row["n"] == 0:
        raise ValueError("fit_quality_filter: empty training set")
    if row["bad"]:
        raise ValueError(
            f"fit_quality_filter: {row['bad']} training rows have a "
            f"NULL/NaN {label_col} — labels must be numeric 0/1"
        )
    if row["ids"] != row["n"]:
        raise ValueError(
            f"fit_quality_filter: {id_col} not unique "
            f"({row['n']} rows, {row['ids']} ids)"
        )
    if check_binary and row["nonbin"]:
        raise ValueError(
            f"fit_quality_filter: sampled fit requires labels in "
            f"{{0, 1}} exactly — {row['nonbin']} rows are neither (they "
            "would silently vanish from the per-class sample)"
        )
    return row["n"]


def fit_quality_filter(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    epochs: int | None = None,
    lr: float | None = None,
    l2: float | None = None,
    init: QFModel | None = None,
    sample_n: int | None = None,
    seed: int = 42,
) -> QFModel:
    """Full-batch gradient descent, distributed: two exact-decimal
    fold shuffles + one Arrow pass per epoch, ``n_buckets`` decimals
    of driver state. ``label_col`` must be numeric 0/1; the training
    set is every row with non-NULL ``text_col`` (zero-gram documents
    train at ``z = w0``). Weights start at zero — no seed anywhere —
    or, with ``init``, continue from a saved model (the
    retrain-on-drift step of the router lifecycle: same bucket space
    required, fresh loss trajectory).

    ``sample_n`` is the 100 TB fit mode — the GPT-3/CCNet practice the
    module docstring cites fits the classifier on a BOUNDED sample and
    scores everything: from each label class, the ``sample_n`` rows
    with the smallest portable md5 key (``md5("qfs:<seed>:<id>")`` —
    a deterministic uniform sample without replacement per class,
    reproducible across runs, engines, and partitionings; no RNG state
    anywhere) are selected through the scale-safe
    :func:`~.selection.topk_threshold_cut` (bounded driver state, pure
    codegen filter, zero windows), and ONLY those 2·sample_n documents
    are ever featurized — the full corpus is touched once by the label
    guards and the per-class cut probes, never by the per-epoch folds.
    :func:`qf_training_sample_py` replays the identical selection so
    the twin descent stays bit-equal. Sampled mode requires labels in
    {0, 1} exactly (a third class would silently vanish from the
    per-class cuts — checked loudly)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if init is not None:
        if n_buckets is not None and n_buckets != init.n_buckets:
            raise ValueError(
                "fit_quality_filter: init model has a different bucket "
                "space — hashed features are not transferable across "
                "n_buckets"
            )
        n_buckets = init.n_buckets
    n_buckets = QF_CONFIG["n_buckets"] if n_buckets is None else n_buckets
    epochs = QF_CONFIG["epochs"] if epochs is None else epochs
    lr = QF_CONFIG["lr"] if lr is None else lr
    l2 = QF_CONFIG["l2"] if l2 is None else l2
    spark = df.sparkSession

    docs = df.where(F.col(text_col).isNotNull())
    # lazy cuts throughout the fit (r15, guide §2.1): every frame cut
    # here has a full-scan aggregate as its first consumer, so a LAZY
    # checkpoint deferred to that action materializes in the consumer's
    # own job — the label guard doubles as lab's materialization, the
    # first epoch's z-fold as feats', and each epoch's total fold as
    # the gradient frame's. Identical blocks end up persisted; only
    # the standalone materialization jobs disappear (3 + epochs jobs).
    lab = cut_lineage(
        docs.select(
            F.col(id_col), F.col(label_col).cast("double").alias("__y")
        ),
        eager=False,
    )
    if sample_n is not None and sample_n <= 0:
        raise ValueError("fit_quality_filter: sample_n must be > 0")
    n_docs = _fit_label_guards(
        lab, id_col, label_col, check_binary=sample_n is not None
    )
    if sample_n is not None:
        from ..functions.hashing import md5_prefix_hash
        from .selection import topk_threshold_cut

        keyed = docs.withColumn(
            "__qfs_key",
            md5_prefix_hash(
                F.concat(
                    F.lit(f"qfs:{seed}:"), F.col(id_col).cast("string")
                )
            ).cast("double"),
        )
        parts = [
            topk_threshold_cut(
                keyed.where(F.col(label_col).cast("double") == float(v)),
                "__qfs_key", sample_n, id_col, descending=False,
            )
            for v in (0, 1)
        ]
        docs = parts[0].unionByName(parts[1]).drop("__qfs_key")
        lab, n_docs = cut_count(
            docs.select(
                F.col(id_col), F.col(label_col).cast("double").alias("__y")
            )
        )
    # NOT coalesced (r15, probed and rejected): count-derived widths on
    # the feature/gradient frames (the kcore §2.1 pattern, 4M rows/
    # partition) measured 5.2 → 8.9-10.3 s warm — the per-epoch decimal
    # folds are COMPUTE-heavy per row, so byte-sized partitions
    # serialize them; the session width is right here.
    feats = cut_lineage(
        doc_features(docs, text_col, id_col, n_buckets), eager=False
    )

    def gl_fn(z, y):
        g, loss = _grad_loss_np(z.to_numpy(), y.to_numpy())
        return pd.Series([[float(a), float(b)] for a, b in zip(g, loss)])

    # runtime annotations (the stack.py pattern): `from __future__
    # import annotations` stringifies inline hints, which the
    # pandas_udf type-hint inference can't resolve
    gl_fn.__annotations__ = {"z": pd.Series, "y": pd.Series,
                             "return": pd.Series}
    gl_kernel = pandas_udf(gl_fn, "array<double>")

    # Decimal-type discipline (the exactness load-bearing part): Spark
    # ADJUSTS oversized decimal result types by DROPPING SCALE
    # (decimalOperations.allowPrecisionLoss) — bigint×decimal(30,9)
    # lands on (38,6), and (30,9)+(38,9) on (38,8) — which silently
    # rounds the folds and breaks twin bit-parity at the 9th decimal.
    # Every product here is decimal(17,0)×decimal(20,9) → (38,9) EXACT,
    # and the w0 addition runs at (30,9)+(30,9) → (31,9) EXACT.
    c_dec = F.col("c").cast("decimal(17,0)")
    w = list(init.w) if init is not None else [Decimal(0)] * n_buckets
    w0 = init.w0 if init is not None else Decimal(0)
    losses = []
    for _epoch in range(epochs):
        wdf = spark.createDataFrame(
            [(b, w[b]) for b in range(n_buckets)],
            "bucket bigint, w decimal(20,9)",
        )
        zfold = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(F.sum(c_dec * F.col("w")).alias("__zf"))
        )
        zl = lab.join(zfold, id_col, "left").select(
            id_col,
            "__y",
            (
                F.lit(w0).cast(DECIMAL_TYPE)
                + F.coalesce(
                    F.col("__zf").cast(DECIMAL_TYPE),
                    F.lit(0).cast(DECIMAL_TYPE),
                )
            ).cast("double").alias("__z"),
        )
        gldf = cut_lineage(
            zl.withColumn("__gl", gl_kernel("__z", "__y")).select(
                id_col,
                F.get("__gl", 0).cast("decimal(20,9)").alias("__g"),
                F.get("__gl", 1).cast(DECIMAL_TYPE).alias("__l"),
            ),
            eager=False,
        )
        tot = gldf.agg(
            F.sum("__l").alias("loss"), F.sum("__g").alias("g0")
        ).first()
        losses.append(tot["loss"])
        grows = (
            feats.join(gldf.select(id_col, "__g"), id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("__g") * c_dec).alias("g"))
            .collect()
        )
        gmap = {r["bucket"]: r["g"] for r in grows}
        w = _lr_update(
            w, [gmap.get(b, Decimal(0)) for b in range(n_buckets)],
            n_docs, lr, l2,
        )
        w0 = _lr_update([w0], [tot["g0"]], n_docs, lr, 0.0)[0]
    return QFModel(w0=w0, w=w, losses=losses, n_docs=n_docs,
                   n_buckets=n_buckets)


def fit_quality_filter_py(
    feats: list,
    labels: dict,
    n_buckets: int | None = None,
    epochs: int | None = None,
    lr: float | None = None,
    l2: float | None = None,
    init: QFModel | None = None,
    sample_n: int | None = None,
    seed: int = 42,
) -> QFModel:
    """Independent python replay of :func:`fit_quality_filter` —
    ``feats`` = [(doc, bucket, c)] (e.g. DuckDB-read through
    :func:`doc_features_sql`), ``labels`` = {doc: y}. Decimal folds,
    the SAME numpy nonlinearity, the SAME ``_lr_update`` — per-epoch
    losses and every weight land bit-equal to the engine's (warm
    starts included). With ``sample_n``, the FULL corpus's feats/labels
    go in and the twin replays the identical per-class md5 selection
    (:func:`qf_training_sample_py`) before descending."""
    if init is not None:
        n_buckets = init.n_buckets
    n_buckets = QF_CONFIG["n_buckets"] if n_buckets is None else n_buckets
    epochs = QF_CONFIG["epochs"] if epochs is None else epochs
    lr = QF_CONFIG["lr"] if lr is None else lr
    l2 = QF_CONFIG["l2"] if l2 is None else l2
    n_docs = len(labels)
    if n_docs == 0:
        raise ValueError("fit_quality_filter_py: empty training set")
    bad = [
        d for d, y in labels.items()
        if y is None or (isinstance(y, float) and y != y)
    ]
    if bad:
        raise ValueError(
            f"fit_quality_filter_py: {len(bad)} training rows have a "
            "NULL/NaN label — labels must be numeric 0/1"
        )
    if sample_n is not None:
        nonbin = [d for d, y in labels.items() if float(y) not in (0.0, 1.0)]
        if nonbin:
            raise ValueError(
                f"fit_quality_filter_py: sampled fit requires labels in "
                f"{{0, 1}} exactly — {len(nonbin)} rows are neither"
            )
        labels = qf_training_sample_py(labels, sample_n, seed)
        feats = [t for t in feats if t[0] in labels]
        n_docs = len(labels)
    docs = sorted(labels)
    w = list(init.w) if init is not None else [Decimal(0)] * n_buckets
    w0 = init.w0 if init is not None else Decimal(0)
    losses = []
    for _epoch in range(epochs):
        zf = {}
        for d, b, c in feats:
            zf[d] = zf.get(d, Decimal(0)) + Decimal(int(c)) * w[b]
        z = [float(w0 + zf.get(d, Decimal(0))) for d in docs]
        y = [float(labels[d]) for d in docs]
        g, loss = _grad_loss_np(z, y)
        gdec = {d: _dec9(float(gv)) for d, gv in zip(docs, g)}
        losses.append(sum((_dec9(float(lv)) for lv in loss), Decimal(0)))
        grad = [Decimal(0)] * n_buckets
        for d, b, c in feats:
            grad[b] += gdec[d] * Decimal(int(c))
        g0 = sum(gdec.values(), Decimal(0))
        w = _lr_update(w, grad, n_docs, lr, l2)
        w0 = _lr_update([w0], [g0], n_docs, lr, 0.0)[0]
    return QFModel(w0=w0, w=w, losses=losses, n_docs=n_docs,
                   n_buckets=n_buckets)


def quality_logit_scores(
    df: DataFrame,
    model: QFModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    spread: bool = True,
) -> DataFrame:
    """``(id_col, qf_logit, n_grams)`` — the trained filter's logit
    per document as an exact decimal fold over the dec9 weights
    (monotone in the probability; zero-gram documents score
    ``w0``). No transcendental anywhere, so the SQL twin reproduces
    it bit-for-bit."""
    from .dsir import doc_ngram_buckets, spread_input

    spark = df.sparkSession
    src = spread_input(df) if spread else df
    wdf = spark.createDataFrame(
        [(b, model.w[b]) for b in range(model.n_buckets)],
        f"bucket bigint, w {DECIMAL_TYPE}",
    )
    scored = (
        doc_ngram_buckets(src, text_col, id_col, model.n_buckets,
                          spread=False)
        .join(F.broadcast(wdf), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("w").alias("__s"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            # cast the (38,9) sum back to (30,9) BEFORE the add — the
            # fit-loop's scale-preservation rule
            (
                F.lit(model.w0).cast(DECIMAL_TYPE)
                + F.coalesce(
                    F.col("__s").cast(DECIMAL_TYPE),
                    F.lit(0).cast(DECIMAL_TYPE),
                )
            ).cast("double").alias("qf_logit"),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        )
    )


def quality_logit_scores_sql(
    table: str,
    model: QFModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`quality_logit_scores`: identical dec9
    weight literals, identical exact fold, identical decimal→double
    rendering (direct cast — exact here because every sum is a
    multiple of 1e-9 well inside double's integer range ≤ ~9e15
    nanounits; the generic VARCHAR hop is unnecessary but harmless,
    kept for uniformity)."""
    from .dsir import doc_ngram_buckets_sql

    vals = ", ".join(
        f"({b}, CAST('{model.w[b]}' AS DECIMAL(30,9)))"
        for b in range(model.n_buckets)
    )
    buckets = doc_ngram_buckets_sql(table, text_col, id_col, model.n_buckets)
    return f"""
        SELECT d.{id_col},
               CAST(CAST(CAST('{model.w0}' AS DECIMAL(30,9))
                    + COALESCE(s.sw, CAST(0 AS DECIMAL(30,9)))
                    AS VARCHAR) AS DOUBLE) AS qf_logit,
               COALESCE(s.n_grams, 0) AS n_grams
        FROM (SELECT {id_col} FROM {table} WHERE {text_col} IS NOT NULL) d
        LEFT JOIN (
          SELECT {id_col}, sum(w) AS sw, count(*) AS n_grams
          FROM ({buckets}) b
          JOIN (VALUES {vals}) AS wt(bucket, w) USING (bucket)
          GROUP BY {id_col}
        ) s USING ({id_col})
    """


def save_quality_filter(model: QFModel, path: str) -> None:
    """Persist a trained filter EXACTLY — weights and losses are dec9
    decimals, serialized as strings (json floats would re-round): the
    load side reconstructs bit-identical state, so a router restarted
    from disk scores identically to the session that trained it."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "model.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "w0": str(model.w0),
                "w": [str(x) for x in model.w],
                "losses": [str(x) for x in model.losses],
                "n_docs": model.n_docs,
                "n_buckets": model.n_buckets,
            },
            f,
        )
    os.replace(tmp, os.path.join(path, "model.json"))


def load_quality_filter(path: str) -> QFModel:
    """Inverse of :func:`save_quality_filter` (bit-exact round trip,
    pytest-pinned)."""
    import json
    import os

    with open(os.path.join(path, "model.json")) as f:
        d = json.load(f)
    return QFModel(
        w0=Decimal(d["w0"]),
        w=[Decimal(x) for x in d["w"]],
        losses=[Decimal(x) for x in d["losses"]],
        n_docs=int(d["n_docs"]),
        n_buckets=int(d["n_buckets"]),
    )
