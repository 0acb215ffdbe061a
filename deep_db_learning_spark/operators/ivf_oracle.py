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


def _load_vectors(sf_dir: str | None):
    import duckdb
    import numpy as np

    if sf_dir is None:
        sf_dir = _sf_dir()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id"
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    V = np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    return ids, V


def _assign_np(vectors, centers, n):
    import numpy as np

    d2 = ((vectors[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    return np.argsort(d2, axis=1, kind="stable")[:, :n]


def _ivf_centroids(V, n_lists: int, n_iters: int):
    """The deterministic IVF fit itself (per-row numpy assignment +
    exact decimal centroid folds), shared by the assignment twin and
    the residual-PQ twin — both need the centroid VALUES, which are
    bit-equal to the engine's (decimal-fold means)."""
    C = V[:n_lists].copy()
    for _ in range(n_iters):
        lists = _assign_np(V, C, 1)[:, 0]
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
    return C


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
    ids, V = _load_vectors(sf_dir)
    C = _ivf_centroids(V, n_lists, n_iters)
    final = _assign_np(V, C, 1)[:, 0]
    assignments = [(int(i), int(l)) for i, l in zip(ids, final)]
    q_mask = [j for j, i in enumerate(ids) if i < n_queries]
    probes = []
    probe_rows = _assign_np(V[q_mask], C, n_probes)
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


def _lloyd_codebooks(X, m: int, k_codes: int, n_iters: int, dsub: int):
    """Seeded per-subspace Lloyd loop — one-shot numpy on the
    deterministic sample, the twin of ``similarity.pq_train``'s core
    (identical expressions, so identical floats)."""
    import numpy as np

    codebooks = np.zeros((m, k_codes, dsub))
    for mm in range(m):
        sub = X[:, mm * dsub : (mm + 1) * dsub]
        cent = sub[:k_codes].copy()
        for _ in range(n_iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k_codes):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        codebooks[mm] = cent
    return codebooks


def _pq_codes(V, codebooks):
    """Per-row argmin encoding (ties → lowest code, both sides)."""
    import numpy as np

    m, _, dsub = codebooks.shape
    codes = np.empty((len(V), m), dtype=np.int64)
    for mm in range(m):
        sub = V[:, mm * dsub : (mm + 1) * dsub]
        d2 = ((sub[:, None, :] - codebooks[mm][None, :, :]) ** 2).sum(axis=2)
        codes[:, mm] = np.argmin(d2, axis=1)
    return codes


def pq_oracle_rows(
    sf_dir: str | None = None,
    m: int = 16,
    k_codes: int = 16,
    sample: int = 500,
    seed: int = 42,
    n_queries: int = 5,
    k: int = 5,
    rerank_factor: int = 4,
    n_iters: int = 10,
):
    """Independent twin of the PQ + exact-rerank pipeline
    (``similarity.pq_train/pq_encode/pq_topk(rerank=...)``) — pure
    numpy/python over DuckDB-read parquet. Every stage is
    bit-deterministic on both sides: the knuth-ordered sample, the
    seeded Lloyd iterations (one-shot numpy on identical row order),
    per-row argmin encoding, ADC adds in subspace order, shortlist and
    final ranking by (dist, id), and the strictly-sequential left-fold
    L2 of the rerank (the ``zip_with``/``aggregate`` twin). Returns
    ``[(query_id, vec_id, rank, score_raw, hits)]`` — floats UNROUNDED
    (the oracle SQL rounds them with DuckDB's ``round``, the same rule
    Spark's ``F.round`` follows; python's ``round`` is banker's and
    may differ at decimal ties) and the recall numerator as an int."""
    import numpy as np

    from ..plans.train_oracle import _knuth

    ids, V = _load_vectors(sf_dir)
    d = V.shape[1]
    dsub = d // m

    order = sorted(range(len(ids)), key=lambda j: (_knuth(ids[j], seed), ids[j]))
    X = V[order[:sample]]
    codebooks = _lloyd_codebooks(X, m, k_codes, n_iters, dsub)
    codes = _pq_codes(V, codebooks)

    def left_fold_l2(a, b):
        acc = 0.0
        for j in range(d):
            diff = a[j] - b[j]
            acc += diff * diff
        return acc

    out = []
    qidx = [j for j, i in enumerate(ids) if i < n_queries]
    for j in qidx:
        qv = V[j]
        lut = np.empty((m, k_codes))
        for mm in range(m):
            qs = qv[mm * dsub : (mm + 1) * dsub]
            lut[mm] = ((codebooks[mm] - qs[None, :]) ** 2).sum(axis=1)
        adc = np.zeros(len(ids))
        for mm in range(m):
            adc += lut[mm, codes[:, mm]]
        shortlist = sorted(range(len(ids)), key=lambda v_: (adc[v_], ids[v_]))[
            : k * rerank_factor
        ]
        exact_d = {ids[v_]: left_fold_l2(qv, V[v_]) for v_ in shortlist}
        final = sorted(exact_d, key=lambda i_: (exact_d[i_], i_))[:k]
        # exact L2 top-k over the WHOLE corpus for the recall column
        all_d = [(left_fold_l2(qv, V[v_]), ids[v_]) for v_ in range(len(ids))]
        truth = {i_ for _, i_ in sorted(all_d)[:k]}
        hits = len(set(final) & truth)
        for rank, i_ in enumerate(final, start=1):
            out.append((ids[j], i_, rank, exact_d[i_], hits))
    return out


def pq_oracle_sql(
    sf_dir: str | None = None,
    m: int = 16,
    k_codes: int = 16,
    sample: int = 500,
    seed: int = 42,
    n_queries: int = 5,
    k: int = 5,
    rerank_factor: int = 4,
) -> str:
    """The PQ half of the ``ann_ivf`` oracle: twin-recomputed rows as a
    VALUES literal, float scores passed through VARCHAR (strtod
    round-trips ``repr`` exactly) and rounded by DuckDB."""
    rows = pq_oracle_rows(
        sf_dir, m=m, k_codes=k_codes, sample=sample, seed=seed,
        n_queries=n_queries, k=k, rerank_factor=rerank_factor,
    )
    return _pq_rows_to_sql(rows, k)


def _pq_rows_to_sql(rows, k: int) -> str:
    values = ",\n              ".join(
        f"({q}, {v}, CAST({r} AS INT), round(CAST('{s!r}' AS DOUBLE), 6), "
        f"round(CAST({h} AS DOUBLE) / {k}, 6))"
        for q, v, r, s, h in rows
    )
    return f"""
        SELECT * FROM (VALUES
              {values}
        ) AS t(query_id, vec_id, rank, sim, recall)
    """


def pq_residual_oracle_rows(
    sf_dir: str | None = None,
    m: int = 16,
    k_codes: int = 16,
    sample: int = 500,
    seed: int = 42,
    n_queries: int = 5,
    k: int = 5,
    rerank_factor: int = 4,
    n_iters: int = 10,
    n_lists: int = 8,
    n_iters_ivf: int = 5,
    n_probes: int = 3,
):
    """Independent twin of the RESIDUAL IVF-PQ pipeline (VERDICT r5
    #3): ``ivf_index_deterministic`` → ``pq_train(residual_model=...)``
    → ``pq_encode(residual_model=...)`` → ``ivf_pq_topk(residual=True,
    rerank=...)``. Replays the decimal-fold IVF centroids, subtracts
    each row's coarse centroid before the Lloyd fit and the encoding,
    probes each query's ``n_probes`` nearest lists, ADC-scans only
    those lists' codes with per-(query, list) LUTs built from
    ``q - centroid[list]`` (the engine's exact expressions, including
    ``lut[arange(m), codes].sum()``), then exact-L2 reranks the
    shortlist. Row shape matches :func:`pq_oracle_rows`."""
    import numpy as np

    from ..plans.train_oracle import _knuth

    ids, V = _load_vectors(sf_dir)
    d = V.shape[1]
    dsub = d // m

    C = _ivf_centroids(V, n_lists, n_iters_ivf)
    lists = _assign_np(V, C, 1)[:, 0]
    R = V - C[lists]
    order = sorted(range(len(ids)), key=lambda j: (_knuth(ids[j], seed), ids[j]))
    codebooks = _lloyd_codebooks(R[order[:sample]], m, k_codes, n_iters, dsub)
    codes = _pq_codes(R, codebooks)

    def left_fold_l2(a, b):
        acc = 0.0
        for j in range(d):
            diff = a[j] - b[j]
            acc += diff * diff
        return acc

    out = []
    qidx = [j for j, i in enumerate(ids) if i < n_queries]
    for j in qidx:
        qv = V[j]
        probe = [int(l) for l in _assign_np(qv[None, :], C, n_probes)[0]]
        luts = {}
        for l in probe:
            qr = qv - C[l]
            lut = np.empty((m, k_codes))
            for mm in range(m):
                qs = qr[mm * dsub : (mm + 1) * dsub]
                lut[mm] = ((codebooks[mm] - qs[None, :]) ** 2).sum(axis=1)
            luts[l] = lut
        probe_set = set(probe)
        cand = [v_ for v_ in range(len(ids)) if int(lists[v_]) in probe_set]
        marange = np.arange(m)
        adc = {v_: float(luts[int(lists[v_])][marange, codes[v_]].sum()) for v_ in cand}
        shortlist = sorted(cand, key=lambda v_: (adc[v_], ids[v_]))[
            : k * rerank_factor
        ]
        exact_d = {ids[v_]: left_fold_l2(qv, V[v_]) for v_ in shortlist}
        final = sorted(exact_d, key=lambda i_: (exact_d[i_], i_))[:k]
        all_d = [(left_fold_l2(qv, V[v_]), ids[v_]) for v_ in range(len(ids))]
        truth = {i_ for _, i_ in sorted(all_d)[:k]}
        hits = len(set(final) & truth)
        for rank, i_ in enumerate(final, start=1):
            out.append((ids[j], i_, rank, exact_d[i_], hits))
    return out


def pq_residual_oracle_sql(
    sf_dir: str | None = None,
    k: int = 5,
    **kw,
) -> str:
    """The residual-PQ (``pqr``) third of the ``ann_ivf`` oracle —
    same VALUES shape as :func:`pq_oracle_sql`."""
    return _pq_rows_to_sql(pq_residual_oracle_rows(sf_dir, k=k, **kw), k)
