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
list_id), and the per-id fold. Cluster size is the skew knob and is
managed on BOTH axes:

- **Auto-sizing** (the paper's k ∝ n guidance): ``n_lists=None``
  derives ``max(8, ⌈n / target_cluster_rows⌉)`` from one cheap count
  (:func:`auto_n_lists` — shared with the oracle builder so both
  engines size identically at any SF), keeping the EXPECTED cluster
  executor-sized as the corpus grows.
- **Hot-cluster cap** (the linkage recipe — excluded AND returned,
  never silent): Lloyd's gives no per-cluster size bound, so one
  degenerate cluster (a near-duplicate flood, a zero-vector mass)
  could still go quadratic. With ``hot_cluster_cap`` set, clusters
  past the cap leave the pairwise path entirely and come back as a
  ``(list_id, n_vectors)`` frame for the caller to re-cluster finer
  or route to a banded method — their members do NOT appear in the
  verdict frame, so nothing is silently marked "kept".

Cosines run in codegen (the shared ``cosine_similarity`` expression),
round-6 like the rest of the similarity family so DuckDB reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_n_lists(n: int, target_cluster_rows: int = 4096, floor: int = 8) -> int:
    """The paper's k ∝ n sizing: enough lists that the EXPECTED
    cluster holds ~``target_cluster_rows`` vectors, floored at 8 so
    tiny fixtures keep a stable clustering. Shared by the engine and
    the oracle builder — both must derive the identical k from the
    identical count or the cluster assignments (and every downstream
    verdict) diverge."""
    return max(floor, -(-int(n) // int(target_cluster_rows)))


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    n_lists: int | None = None,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_rows: int = 4096,
    hot_cluster_cap: int | None = None,
):
    """``(id_col, list_id, dup_of, sim)`` for every corpus vector:
    ``dup_of`` = the LOWEST-id same-cluster member with round-6 cosine
    ≥ ``threshold`` (NULL ⇒ the vector is kept), ``sim`` = the
    STRONGEST such similarity (the paper's dedup score). Keep set =
    ``dup_of IS NULL``.

    ``n_lists=None`` auto-sizes via :func:`auto_n_lists`. With
    ``hot_cluster_cap`` set, returns ``(verdicts, hot)`` instead:
    clusters larger than the cap are excluded from the quadratic
    in-cluster scan and returned as ``hot`` (``list_id, n_vectors``)
    for a finer pass — their members are absent from ``verdicts``."""
    from ..functions.vectors import cosine_similarity
    from .similarity import ivf_index_deterministic

    if n_lists is None:
        n_lists = auto_n_lists(df.count(), target_cluster_rows)
    assigned, _model = ivf_index_deterministic(
        df, n_lists=n_lists, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    hot = None
    if hot_cluster_cap is not None:
        sizes = assigned.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n_vectors")
        )
        hot = sizes.where(F.col("n_vectors") > hot_cluster_cap)
        assigned = assigned.join(
            F.broadcast(hot.select("list_id")), "list_id", "leftanti"
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
    verdicts = assigned.select(id_col, "list_id").join(
        dup, assigned[id_col] == dup["id_b"], "left"
    ).select(
        id_col,
        F.col("list_id").cast("int").alias("list_id"),
        "dup_of",
        "sim",
    )
    if hot_cluster_cap is not None:
        return verdicts, hot
    return verdicts


def semantic_dedup_oracle_sql(
    threshold: float,
    n_lists: int | None = None,
    n_iters: int = 5,
    sf_dir: str | None = None,
    target_cluster_rows: int = 4096,
) -> str:
    """DuckDB twin: the clustering replayed bit-for-bit by the shared
    ``ivf_fit_assign`` twin (integer assignments inlined as VALUES),
    then the identical in-cluster upper-triangular scan in SQL.
    ``n_lists=None`` auto-sizes from the DuckDB-side corpus count
    through the SAME :func:`auto_n_lists` arithmetic as the engine."""
    from .ivf_oracle import ivf_fit_assign

    if n_lists is None:
        import duckdb

        from .ivf_oracle import _sf_dir

        sf = sf_dir if sf_dir is not None else _sf_dir()
        con = duckdb.connect()
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf}/embeddings.parquet')"
        ).fetchone()[0]
        con.close()
        n_lists = auto_n_lists(n, target_cluster_rows)
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
