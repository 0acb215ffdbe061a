"""Record linkage / entity resolution.

The reference's schema autodetection reconciles columns by exact value
overlap (``db_transformer/db/schema_autodetect.py``); it has no fuzzy
matching. A 100 TB training-data pipeline needs it constantly — the
same product/author/site appears with typos and formatting drift — so
this family is a first-class extension: blocking → bounded candidate
pairs → JVM-side pairwise scores → top-k match / transitive entity
clusters.

Scale posture:
- **never all-pairs**: candidates come only from shared blocking keys;
  :func:`candidate_pairs` hard-caps block width and returns the dropped
  blocks as data (no silent truncation — route hot blocks to a finer
  strategy instead).
- **row-local scoring**: ``levenshtein`` and token-Jaccard are Spark
  built-ins inside whole-stage codegen — no UDF anywhere.
- **clustering** reuses the O(log n) large-star/small-star components
  operator (``operators/components.py``).

Every op has an exact DuckDB twin in the tests (same tokenizer, same
scores, same clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"\s+"


def _tokens(text_col):
    """Lowercased whitespace tokens with empties removed — the shared
    tokenizer (DuckDB twin: ``list_filter(string_split(lower(trim(s)),
    ' '), t -> t <> '')``). ``array_remove`` instead of a higher-order
    ``filter`` lambda: HOF lambdas run interpreted (the r5
    ``clean_corpus`` drift), ``array_remove`` stays in codegen."""
    return F.array_remove(
        F.split(F.lower(F.trim(text_col)), _TOKEN_SPLIT), ""
    )


def blocking_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    strategy: str = "sorted_prefix",
    n: int = 1,
    out: str = "block_key",
) -> DataFrame:
    """One ``(id, block_key)`` row per record (records may emit the
    same key; empty/NULL texts emit none).

    Strategies: ``first_token`` (as written), ``sorted_prefix`` (first
    ``n`` of the sorted distinct tokens, joined — robust to word
    order), ``fingerprint`` (ALL sorted distinct tokens — exact-match
    blocking after normalization)."""
    toks = _tokens(F.col(text_col))
    if strategy == "first_token":
        # F.get is NULL on out-of-bounds (ANSI element_at throws on the
        # empty token array a blank text produces)
        key = F.get(toks, 0)
    elif strategy == "sorted_prefix":
        key = F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, n), " "
        )
    elif strategy == "fingerprint":
        key = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    else:
        raise ValueError(f"unknown blocking strategy: {strategy!r}")
    return (
        df.select(F.col(id_col), key.alias(out))
        .filter(F.col(out).isNotNull() & (F.col(out) != ""))
        .distinct()
    )


def candidate_pairs(
    keys: DataFrame,
    id_col: str,
    key_col: str = "block_key",
    max_block: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Within-block candidate pairs ``(id_a < id_b)``, deduplicated
    across blocks.

    Blocks wider than ``max_block`` records would contribute
    O(width²) pairs — they are EXCLUDED and returned as the second
    frame ``(block_key, n_records)`` so the caller can re-block them
    with a finer strategy (a stopword token like 'the' as a key is the
    classic 100 TB failure mode)."""
    width = keys.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_records")
    )
    hot = width.filter(F.col("n_records") > max_block)
    ok = keys.join(F.broadcast(hot.select(key_col)), key_col, "leftanti")
    a = ok.select(F.col(key_col), F.col(id_col).alias("id_a"))
    b = ok.select(F.col(key_col), F.col(id_col).alias("id_b"))
    pairs = (
        a.join(b, key_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs, hot


def pair_scores(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Join the record texts onto the pairs and score them row-locally:
    ``lev`` (edit distance), ``lev_sim`` (1 − lev/max length), and
    ``token_jaccard`` over distinct tokens. All codegen, no UDF."""
    ra = records.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a")
    )
    rb = records.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b")
    )
    ta = F.array_distinct(_tokens(F.col("text_a")))
    tb = F.array_distinct(_tokens(F.col("text_b")))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    maxlen = F.greatest(F.length("text_a"), F.length("text_b"))
    lev = F.levenshtein("text_a", "text_b")
    return (
        pairs.join(ra, "id_a")
        .join(rb, "id_b")
        .select(
            "id_a", "id_b", "text_a", "text_b",
            lev.alias("lev"),
            F.when(maxlen == 0, F.lit(1.0))
            .otherwise(1.0 - lev.cast("double") / maxlen)
            .alias("lev_sim"),
            F.when(union == 0, F.lit(0.0))
            .otherwise(inter.cast("double") / union)
            .alias("token_jaccard"),
        )
    )


def best_match(
    scores: DataFrame,
    left_id: str = "id_a",
    score_col: str = "lev_sim",
    k: int = 1,
    tiebreak: str = "id_b",
) -> DataFrame:
    """Deterministic top-``k`` matches per left record (score desc,
    tiebreak asc) — one window on the already-blocked pairs, no global
    sort."""
    w = Window.partitionBy(left_id).orderBy(
        F.desc(score_col), F.asc(tiebreak)
    )
    return (
        scores.withColumn("match_rank", F.row_number().over(w))
        .filter(F.col("match_rank") <= k)
    )


def entity_clusters(
    scores: DataFrame,
    threshold: float,
    score_col: str = "lev_sim",
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Transitive closure of pairs scoring ``>= threshold`` →
    ``(id, entity_id)`` with ``entity_id`` the minimum member id
    (min-label convention shared with the dedup clusters). Singletons
    (ids appearing in ``scores`` but matching nothing) keep themselves
    as their entity."""
    from .components import connected_components_star

    ida, idb = id_cols
    edges = scores.filter(F.col(score_col) >= threshold).select(
        F.col(ida).alias("src"), F.col(idb).alias("dst")
    )
    nodes = (
        scores.select(F.col(ida).alias("id"))
        .unionByName(scores.select(F.col(idb).alias("id")))
        .distinct()
    )
    comp = connected_components_star(edges, src="src", dst="dst")
    # components returns only ids that appear in edges; singletons map
    # to themselves via the left join fallback
    return (
        nodes.join(
            comp.withColumnRenamed("node", "id").withColumnRenamed(
                "component", "entity_id"
            ),
            "id",
            "left",
        )
        .select(
            "id", F.coalesce("entity_id", F.col("id")).alias("entity_id")
        )
    )


def mutual_best_matches(
    scores: DataFrame,
    score_col: str = "lev_sim",
    id_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """1:1 assignment from the scored pairs: keep exactly the pairs
    where each side is the OTHER side's best match (score desc, id asc
    tiebreak — a total order, so the result is deterministic). The
    standard reciprocal-best-hit rule — greedy per-record top-1 alone
    produces chains (a→b while b→c); mutuality guarantees a matching
    (every id appears in at most one output pair).

    Shape: one window over the symmetrized pairs (shuffle on the node
    id — already-blocked pair counts, not n²) and one self-join of the
    per-node best rows. Returns canonical ``(id_a < id_b, score)``."""
    ida, idb = id_cols
    sym = scores.select(
        F.col(ida).alias("src"), F.col(idb).alias("dst"),
        F.col(score_col).alias("s"),
    ).unionByName(
        scores.select(
            F.col(idb).alias("src"), F.col(ida).alias("dst"),
            F.col(score_col).alias("s"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    best = (
        sym.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("src", "dst", "s")
    )
    other = best.select(
        F.col("src").alias("__bsrc"), F.col("dst").alias("__bdst")
    )
    return (
        best.join(
            other,
            (F.col("src") == F.col("__bdst"))
            & (F.col("dst") == F.col("__bsrc")),
            "leftsemi",
        )
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias(ida),
            F.col("dst").alias(idb),
            F.col("s").alias(score_col),
        )
    )
