"""SemDeDup — semantic deduplication in embedding space (Abbas et al.
2023, arXiv:2303.09540): cluster the corpus, then inside each cluster
greedily drop every example whose cosine similarity to an
earlier-ordered cluster member reaches a threshold. The
embedding-space counterpart of the MinHash/SimHash families — catches
paraphrases and re-renderings exact n-gram methods miss.

Spark-first decomposition:

1. **Cluster** with the deterministic Lloyd's quantizer
   (``similarity.ivf_index_deterministic`` — per-row float64
   assignment kernel + exact decimal centroid folds, the fit the
   ``ann_ivf`` oracle already bit-replays via
   ``operators/ivf_oracle.ivf_fit_assign``).
2. **Pair within clusters**: a self-join ON ``list_id`` — the paper's
   own cost model (pairwise work is O(Σ|cluster|²), bounded by the
   cluster granularity k, never all-pairs across the corpus).
3. **Greedy mark**: drop ``id_b`` iff ANY ``id_a < id_b`` in its
   cluster has ``cos(a,b) ≥ τ`` — the paper's upper-triangular scan
   with id order as the deterministic traversal (the paper ranks by
   centroid distance; the marking semantics — compare against ALL
   earlier examples, kept or not — is identical, and id order makes
   the result engine-portable). One ``groupBy(id_b)`` fold emits the
   earliest duplicate source and the strongest similarity.

Scale posture: the only corpus-wide shuffles are the cluster
assignment (Arrow pass, no shuffle), the list_id self-join (shuffle on
list_id; cluster sizes are the skew knob — raise ``n_lists`` so
|cluster| ≈ n/k stays executor-sized, exactly the paper's k ∝ n
guidance), and the per-id fold. Cosines run in codegen
(``F.zip_with``-free: the shared ``cosine_similarity`` expression),
round-6 like the rest of the similarity family so DuckDB reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    n_lists: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id_col, list_id, dup_of, sim)`` for every corpus vector:
    ``dup_of`` = the LOWEST-id same-cluster member with round-6 cosine
    ≥ ``threshold`` (NULL ⇒ the vector is kept), ``sim`` = the
    STRONGEST such similarity (the paper's dedup score). Keep set =
    ``dup_of IS NULL``."""
    from ..functions.vectors import cosine_similarity
    from .similarity import ivf_index_deterministic

    assigned, _model = ivf_index_deterministic(
        df, n_lists=n_lists, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    a = assigned.select(
        "list_id", F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = assigned.select(
        "list_id", F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    dup = (
        a.join(b, "list_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_b",
            "id_a",
            F.round(
                cosine_similarity(F.col("__va"), F.col("__vb")), 6
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"), F.max("sim").alias("sim"))
    )
    return assigned.select(id_col, "list_id").join(
        dup, assigned[id_col] == dup["id_b"], "left"
    ).select(
        id_col,
        F.col("list_id").cast("int").alias("list_id"),
        "dup_of",
        "sim",
    )


def semantic_dedup_oracle_sql(
    threshold: float,
    n_lists: int = 8,
    n_iters: int = 5,
    sf_dir: str | None = None,
) -> str:
    """DuckDB twin: the clustering replayed bit-for-bit by the shared
    ``ivf_fit_assign`` twin (integer assignments inlined as VALUES),
    then the identical in-cluster upper-triangular scan in SQL."""
    from .ivf_oracle import ivf_fit_assign

    assignments, _probes = ivf_fit_assign(
        sf_dir, n_lists=n_lists, n_iters=n_iters, n_queries=0, n_probes=1
    )
    vals = ", ".join(f"({i}, {l})" for i, l in assignments)
    return f"""
        WITH assign(vec_id, list_id) AS (VALUES {vals}),
        emb AS (
          SELECT a.vec_id, a.list_id, e.embedding::DOUBLE[] AS v
          FROM assign a JOIN embeddings e USING (vec_id)
        ),
        dup AS (
          SELECT b.vec_id AS id_b,
                 min(a.vec_id) AS dup_of,
                 max(round(list_cosine_similarity(a.v, b.v), 6)) AS sim
          FROM emb a JOIN emb b
            ON a.list_id = b.list_id AND a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
          GROUP BY b.vec_id
        )
        SELECT e.vec_id, CAST(e.list_id AS INT) AS list_id,
               d.dup_of, d.sim
        FROM emb e LEFT JOIN dup d ON e.vec_id = d.id_b
    """
