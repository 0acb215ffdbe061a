"""Independent oracle twin of :func:`similarity.ivf_index_deterministic`
— numpy + Python ``decimal`` over DuckDB-read parquet, no Spark.

Same pattern as ``plans/train_oracle.py``: the IVF fit is iterative
(not one SQL query), but every step is bit-deterministic by
construction — assignment is per-row float64 numpy (the exact kernel
the Spark path runs inside its Arrow UDF), centroid updates are exact
decimal(30,9) folds (associative ⇒ partitioning-independent), and the
seed is the data itself (``n_lists`` lowest vec_ids). So the oracle
RECOMPUTES the integer outcomes — (vec_id → list_id) assignments and
(query → probe lists) — with an independent implementation and pins
them as ``VALUES``; the float similarity/recall math on top is left to
DuckDB SQL (``list_cosine_similarity``, the ``ann_lsh`` pattern, which
already matches Spark's HOF fold at round-6).

Engine-parity notes (why the integers match bit-for-bit):

- parquet FLOAT → float64 widening is exact in both Arrow/numpy and
  DuckDB's fetch.
- ``((V[:,None,:]-C[None,:,:])**2).sum(axis=2)`` reduces each length-d
  lane independently — numpy's pairwise reduction over a fixed-length
  contiguous axis is identical regardless of batch size, so the twin's
  one-shot matrix equals the UDF's per-batch results.
- ``np.argsort(kind="stable")`` breaks distance ties toward the lower
  list id in both.
- Spark's ``cast(double AS DECIMAL(30,9))`` ≡
  ``Decimal(repr(x)).quantize(1e-9, HALF_UP)`` (see train_oracle);
  decimal sums are exact, and ``float(Decimal)/int`` is the same
  correctly-rounded double as BigDecimal→double ÷ long.
"""

from __future__ import annotations

import os
from decimal import Decimal

# one shared rounding rule + SF-dir override for BOTH oracle twins —
# a drifting duplicate here once pointed the two twins at different
# env var names (review r3)
from ..plans.train_oracle import DEFAULT_SF_DIR as _TRAIN_DEFAULT
from ..plans.train_oracle import _dec9  # noqa: F401 (re-exported twin rule)


def _sf_dir() -> str:
    """Same override the selfcheck/train twin honors (set per-run by
    tools/selfcheck.py) — read at call time, never pinned at import."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF", _TRAIN_DEFAULT)


def ivf_fit_assign(
    sf_dir: str | None = None,
    n_lists: int = 8,
    n_iters: int = 5,
    n_queries: int = 5,
    n_probes: int = 3,
):
    """Replays the deterministic IVF fit from the parquet. Returns
    ``(assignments, probes)``: ``[(vec_id, list_id)]`` for the whole
    corpus and ``[(query_id, list_id)]`` for queries ``vec_id <
    n_queries`` (each query's ``n_probes`` nearest lists)."""
    import duckdb
    import numpy as np

    if sf_dir is None:
        sf_dir = _sf_dir()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    V = np.array([[float(x) for x in r[1]] for r in rows], dtype=float)
    C = V[:n_lists].copy()

    def assign(vectors, centers, n):
        d2 = ((vectors[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        return np.argsort(d2, axis=1, kind="stable")[:, :n]

    for _ in range(n_iters):
        lists = assign(V, C, 1)[:, 0]
        newC = C.copy()
        for l in range(n_lists):
            members = V[lists == l]
            if len(members):
                for p in range(V.shape[1]):
                    s = Decimal(0)
                    for val in members[:, p]:
                        s += _dec9(val)
                    newC[l, p] = float(s) / len(members)
        C = newC

    final = assign(V, C, 1)[:, 0]
    assignments = [(int(i), int(l)) for i, l in zip(ids, final)]
    q_mask = [j for j, i in enumerate(ids) if i < n_queries]
    probes = []
    probe_rows = assign(V[q_mask], C, n_probes)
    for j, row in zip(q_mask, probe_rows):
        probes.extend((int(ids[j]), int(l)) for l in row)
    return assignments, probes


def ivf_oracle_sql(
    sf_dir: str | None = None,
    n_lists: int = 8,
    n_iters: int = 5,
    n_queries: int = 5,
    n_probes: int = 3,
    k: int = 5,
) -> str:
    """The ``ann_ivf`` oracle: twin-computed integer assignments as
    VALUES + the ``ann_lsh``-shaped SQL for sims, ranking, and
    recall@k (floats computed by DuckDB, matching Spark at round-6)."""
    assignments, probes = ivf_fit_assign(sf_dir, n_lists, n_iters, n_queries, n_probes)
    assign_vals = ", ".join(f"({i}, {l})" for i, l in assignments)
    probe_vals = ", ".join(f"({q}, {l})" for q, l in probes)
    return f"""
        WITH assign(vec_id, list_id) AS (VALUES {assign_vals}),
        probes(query_id, list_id) AS (VALUES {probe_vals}),
        emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), cand AS (
          SELECT DISTINCT p.query_id, a.vec_id
          FROM probes p JOIN assign a USING (list_id)
        ), scored AS (
          SELECT c.query_id, c.vec_id,
                 list_cosine_similarity(q.v, e.v) AS sim
          FROM cand c
          JOIN emb q ON q.vec_id = c.query_id
          JOIN emb e ON e.vec_id = c.vec_id
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id) AS rank
          FROM scored
        ), approx AS (
          SELECT query_id, vec_id, CAST(rank AS INT) AS rank,
                 round(sim, 6) AS sim
          FROM ranked WHERE rank <= {k}
        ), exact AS (
          SELECT q.vec_id AS query_id, e.vec_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.v, e.v) DESC, e.vec_id) AS rank
          FROM emb q CROSS JOIN emb e
          WHERE q.vec_id < {n_queries}
        ), rec AS (
          SELECT e.query_id,
                 round(count(a.vec_id) / count(*), 6) AS recall
          FROM (SELECT query_id, vec_id FROM exact WHERE rank <= {k}) e
          LEFT JOIN approx a USING (query_id, vec_id)
          GROUP BY e.query_id
        )
        SELECT approx.query_id, vec_id, rank, sim, recall
        FROM approx JOIN rec ON approx.query_id = rec.query_id
    """
