"""Independent oracle twin of :mod:`.training` — numpy + Python
``decimal`` over DuckDB-read parquet, no Spark.

The driver's correctness gate wants a DuckDB-checkable answer for
``train_relational``, but gradient descent is iterative — not
expressible as one SQL query. The trajectory IS bit-deterministic by
construction (seeded init, per-row float64 kernels, exact decimal
gradient folds — see ``training.py``'s determinism contract), so the
oracle RECOMPUTES it from the raw parquet with an independent
implementation (DuckDB SQL for the relational assembly, numpy for the
per-row math, ``decimal.Decimal`` for the folds) and pins the result as
a ``VALUES`` literal. Run at oracle-build time, it tracks whatever data
the driver regenerates; nothing is copied from the Spark run.

Engine-parity notes (why bit-equality holds):

- Spark's ``cast(double AS DECIMAL(30,9))`` rounds the double's
  shortest decimal representation (``BigDecimal.valueOf`` =
  ``Double.toString``) HALF_UP to scale 9. Python's ``repr`` produces
  the same shortest round-trip string, so
  ``Decimal(repr(x)).quantize(1e-9, ROUND_HALF_UP)`` is the exact twin
  (:func:`_dec9`).
- Decimal addition is exact and associative → any grouping/order gives
  the same sums (the whole point of ``functions/exact_agg``).
- ``float(Decimal)`` and BigDecimal→double are both correctly rounded.
- Every float64 step (standardization, forward/backward kernel,
  parameter updates) is per-row/per-element IEEE arithmetic with no
  order-dependent reduction — identical in the JVM, the Arrow UDF's
  numpy, and this twin's numpy.
"""

from __future__ import annotations

import os
from decimal import ROUND_HALF_UP, Decimal

DEFAULT_SF_DIR = "/root/testdata/sf0.01"
_Q9 = Decimal("1.000000000")


def _dec9(x: float) -> Decimal:
    """Twin of Spark's ``cast(double AS DECIMAL(30,9))`` (HALF_UP on the
    shortest decimal representation)."""
    return Decimal(repr(float(x))).quantize(_Q9, rounding=ROUND_HALF_UP)


def _knuth_bucket(key: int, seed: int = 42, p: int = 2147483647, k: int = 2654435761) -> int:
    """Twin of ``functions.hashing.bucket`` (mod 10_000)."""
    return ((key % p + p) % p + seed) * k % p % 10_000


def _train_losses(sf_dir: str, epochs: int = 8, seed: int = 42) -> list[float]:
    """Replays ``plans.training.train_relational_classifier`` (default
    target/feature config, as called by ``q_train_relational``) from the
    parquet tables. Returns the per-epoch train losses."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    cust = con.execute(
        f"SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment "
        f"FROM read_parquet('{sf_dir}/customer.parquet') ORDER BY c_custkey"
    ).fetchall()
    # per-customer edge aggregates, exact decimal folds like
    # HeteroGraph.aggregate_along_edge's fused plan (mean = decimal sum
    # cast to double / count; degree = group size); customers without
    # edges get the frame's na.fill(0.0)
    def edge_aggs(table: str, fk: str, col: str) -> dict[int, tuple[float, float, int]]:
        rows = con.execute(
            f"SELECT {fk}, {col} FROM read_parquet('{sf_dir}/{table}.parquet') "
            f"WHERE {fk} IS NOT NULL"
        ).fetchall()
        sums: dict[int, Decimal] = {}
        cnts: dict[int, int] = {}
        for kkey, v in rows:
            sums[kkey] = sums.get(kkey, Decimal(0)) + _dec9(v)
            cnts[kkey] = cnts.get(kkey, 0) + 1
        return {
            kkey: (float(sums[kkey]) / cnts[kkey], float(sums[kkey]), cnts[kkey])
            for kkey in sums
        }

    ords = edge_aggs("orders", "o_custkey", "o_totalprice")
    evs = edge_aggs("events", "user_id", "value")

    labels_sorted = sorted({r[3] for r in cust if r[3] is not None})
    label_code = {v: i for i, v in enumerate(labels_sorted)}

    # raw feature matrix in assemble_training_frame's feat_names order:
    # [c_acctbal, orders mean/sum/degree, events mean/sum/degree]
    node_ids, codes, labels, raw = [], [], [], []
    for ck, nk, bal, seg in cust:
        if seg is None:
            continue
        o = ords.get(ck, (0.0, 0.0, 0))
        e = evs.get(ck, (0.0, 0.0, 0))
        node_ids.append(ck)
        codes.append(nk)
        labels.append(label_code[seg])
        raw.append([bal, o[0], o[1], float(o[2]), e[0], e[1], float(e[2])])

    split_train = [(_knuth_bucket(i, seed) < 7000) for i in node_ids]
    n = sum(split_train)
    if n == 0:
        raise ValueError("empty train split")

    m = len(raw[0])
    means, stds = [], []
    for j in range(m):
        s = Decimal(0)
        q = Decimal(0)
        for i, r in enumerate(raw):
            if split_train[i]:
                s += _dec9(r[j])
                q += _dec9(r[j] * r[j])
        mu = float(s) / n
        var = max(float(q) / n - mu * mu, 1e-12)
        means.append(mu)
        stds.append(var**0.5)

    X_num = np.array(raw, dtype=np.float64)
    for j in range(m):
        X_num[:, j] = (X_num[:, j] - means[j]) / stds[j]

    codes_a = np.array(codes, dtype=np.int64)
    y_a = np.array(labels, dtype=np.int64)
    train_mask = np.array(split_train)
    tr_codes = codes_a[train_mask]
    tr_nums = X_num[train_mask]
    tr_y = y_a[train_mask]
    n_train = int(train_mask.sum())

    card = int(codes_a.max()) + 1
    k = int(y_a.max()) + 1
    dim, lr, l2 = 4, 0.5, 1e-4
    rng = np.random.default_rng(seed)
    emb = rng.uniform(-0.5, 0.5, size=(card, dim))
    W = rng.uniform(-0.5, 0.5, size=(dim + m, k)) * 0.1
    b = np.zeros(k)

    glen = 1 + k + (dim + m) * k
    losses: list[float] = []
    for _ in range(epochs):
        from .training import row_logits

        E, Wc, bc = emb.copy(), W.copy(), b.copy()
        X = np.concatenate([E[tr_codes], tr_nums], axis=1)
        logits = row_logits(X, Wc, bc)
        logits -= logits.max(axis=1, keepdims=True)
        ex = np.exp(logits)
        P = ex / ex.sum(axis=1, keepdims=True)
        rows_idx = np.arange(n_train)
        loss_rows = -np.log(P[rows_idx, tr_y])
        resid = P.copy()
        resid[rows_idx, tr_y] -= 1.0
        gw = (X[:, :, None] * resid[:, None, :]).reshape(n_train, -1)
        g = np.concatenate([loss_rows[:, None], resid, gw], axis=1)

        # per-code decimal folds, then exact driver accumulation —
        # mirrors groupBy(code).agg(sum(decimal)) + the Decimal loop
        tot = [Decimal(0)] * glen
        resid_by_code = np.zeros((card, k))
        for c in np.unique(tr_codes):
            sel = g[tr_codes == c]
            for i in range(glen):
                v = Decimal(0)
                for x in sel[:, i]:
                    v += _dec9(x)
                tot[i] += v
                if 1 <= i <= k:
                    resid_by_code[int(c), i - 1] = float(v)
        loss = float(tot[0]) / n_train + 0.5 * l2 * (
            float((W * W).sum()) + float((emb * emb).sum())
        )
        losses.append(loss)
        resid_tot = np.array([float(tot[1 + j]) for j in range(k)])
        GW = np.array(
            [float(tot[1 + k + i]) for i in range((dim + m) * k)]
        ).reshape(dim + m, k)
        emb -= lr * (resid_by_code @ Wc[:dim].T / n_train + l2 * emb)
        W -= lr * (GW / n_train + l2 * W)
        b -= lr * resid_tot / n_train
    return losses


def train_loss_oracle_sql(epochs: int = 8, seed: int = 42) -> str:
    """The ``train_relational`` oracle: recompute the loss trajectory
    with the independent twin above and pin it as a VALUES literal
    (``repr`` doubles round-trip exactly through DuckDB's strtod). The
    data directory defaults to the driver's correctness SF; selfcheck
    overrides via ``SPARK_GRAFT_ORACLE_SF`` when run at another SF."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", DEFAULT_SF_DIR)
    losses = _train_losses(sf_dir, epochs=epochs, seed=seed)
    # the double literal goes through VARCHAR: DuckDB parses a bare
    # 17-digit numeric literal as DECIMAL and its decimal→double cast is
    # not correctly rounded (same reason as exact_sum_sql's hop);
    # string→double is strtod, which round-trips repr exactly
    values = ",\n              ".join(
        f"(CAST({i} AS INT), CAST('{loss!r}' AS DOUBLE))" for i, loss in enumerate(losses)
    )
    return f"""
        SELECT * FROM (VALUES
              {values}
        ) AS t(epoch, train_loss)
    """
