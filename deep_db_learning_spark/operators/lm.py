"""N-gram language-model perplexity scoring (stupid backoff).

The CCNet recipe (Wenzek et al. 2020) ranks crawl documents by the
perplexity of a small n-gram LM and keeps the low-perplexity head —
one of the two canonical quality filters of every LLM data pipeline
(the other, Gopher-style heuristics, lives in ``functions/text.py``).
The reference has no LM surface at all; its closest signal is the
per-column distinct profiling (`db_transformer/db/
distinct_cnt_retrieval.py:55-155`), so this module is a pure
extension, shaped for the 100 TB pipeline:

- **Fit is distributed, the model is bounded.** Unigram and mapped
  bigram counts are Spark ``groupBy`` aggregations (two shuffles over
  the corpus); only the top-``vocab_size`` unigrams and
  top-``bigram_k`` bigrams ever reach the driver — the same bounded-
  collect discipline as the IVF centroids and PQ codebooks
  (`operators/similarity.py`).
- **Scoring never evaluates a transcendental in either engine.** All
  log-probabilities are computed ONCE on the driver with python
  ``math.log`` over exact integer counts and shipped as double
  literals (broadcast model frame on the Spark side, inline VALUES on
  the DuckDB oracle side) — the BM25-idf coupling trick from
  ``operators/search.py``. Per-document folds go through the
  decimal-exact ``exact_sum`` so the scores are bitwise identical
  across partitionings and engines.
- **Stupid backoff, not Katz/KN.** Brants et al. 2007 ("Large
  Language Models in Machine Translation") showed the unnormalized
  score ``S(w2|w1) = c12/c1 if c12 > 0 else 0.4 * p(w2)`` matches
  smoothed LMs at web scale while needing only raw counts — exactly
  the arithmetic an exact cross-engine oracle can reproduce.

Per document: ``logp_sum = log S(t1) + Σ_i log S(t_i | t_{i-1})`` and
``avg_nll = -logp_sum / n_tokens`` (nats/token). True perplexity is
``exp(avg_nll)`` — monotone in ``avg_nll``, so filtering on a
``max_avg_nll`` threshold is equivalent to a perplexity cutoff
without either engine calling ``exp``.

Tokenization is the shared search tokenizer (``[a-z0-9]+`` over
``lower(text)``, `operators/search.py`) so the LM composes with the
retrieval index over the same token stream.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact_agg import exact_sum, exact_sum_sql
from .search import (
    SEARCH_TOKEN_PATTERN,
    _spread,
    dlit,
    search_tokens as tokenize,
)

UNK = "<unk>"
DEFAULT_LAMBDA = 0.4  # Brants et al. 2007 backoff constant

_TOK_SQL = f"regexp_extract_all(lower({{col}}), '{SEARCH_TOKEN_PATTERN}')"


@dataclass(frozen=True)
class StupidBackoffLM:
    """Bounded, driver-resident LM: integer counts + the python-log
    score tables derived from them. ``uni_logp`` covers every vocab
    term AND :data:`UNK`; ``bi_logp`` only pairs with ``c12 > 0``."""

    vocab: tuple[str, ...]  # top terms, count-desc / term-asc order
    uni_counts: dict[str, int]  # mapped counts, incl. UNK
    bi_counts: dict[tuple[str, str], int]
    n_tokens: int
    lam: float = DEFAULT_LAMBDA
    uni_logp: dict[str, float] = field(default_factory=dict)
    bi_logp: dict[tuple[str, str], float] = field(default_factory=dict)

    @property
    def lam_log(self) -> float:
        return math.log(self.lam)


def _logp_tables(
    vocab: list[str],
    uni_counts: dict[str, int],
    bi_counts: dict[tuple[str, str], int],
    n_tokens: int,
    lam: float,
) -> StupidBackoffLM:
    """The ONE float path: exact integer counts → python ``math.log``
    ratios. Both the Spark fit and the DuckDB oracle builder feed
    their independently-computed counts through this same function, so
    the literals that reach the two engines cannot drift."""
    uni_logp = {
        t: math.log(c / n_tokens) for t, c in uni_counts.items() if c > 0
    }
    bi_logp = {
        (w1, w2): math.log(c12 / uni_counts[w1])
        for (w1, w2), c12 in bi_counts.items()
        if c12 > 0 and uni_counts.get(w1, 0) > 0
    }
    return StupidBackoffLM(
        vocab=tuple(vocab),
        uni_counts=dict(uni_counts),
        bi_counts=dict(bi_counts),
        n_tokens=n_tokens,
        lam=lam,
        uni_logp=uni_logp,
        bi_logp=bi_logp,
    )


def map_tokens(toks, vocab: list[str]):
    """Row-local vocab mapping: tokens outside ``vocab`` become
    :data:`UNK`. A constant-folded literal map + ``try_element_at``
    (ANSI-safe NULL on miss) keeps the whole mapping inside
    whole-stage codegen — no join, no shuffle."""
    vmap = F.map_from_arrays(F.lit(list(vocab)), F.lit(list(vocab)))
    return F.transform(
        toks, lambda t: F.coalesce(F.try_element_at(vmap, t), F.lit(UNK))
    )


def fit_stupid_backoff(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    bigram_k: int = 2048,
    lam: float = DEFAULT_LAMBDA,
) -> StupidBackoffLM:
    """Fit on a corpus: distributed counting, bounded collects.

    Vocabulary = top-``vocab_size`` unigrams (count desc, term asc —
    the deterministic tie-break every top-k in this repo uses); kept
    bigrams = top-``bigram_k`` pairs of the UNK-mapped token stream.
    Driver residency is O(vocab_size + bigram_k), never O(corpus).
    """
    toks = F.coalesce(
        tokenize(F.col(text_col)), F.array().cast("array<string>")
    )
    # tokenize ONCE, on ALL cores (a single-file scan is one
    # partition — `_spread` as in build_postings): both count
    # passes read the cached token arrays
    tokdf = _spread(df).select(toks.alias("__t")).persist()
    ucnt = (
        tokdf.select(F.explode("__t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    total = ucnt.agg(F.sum("c")).collect()[0][0] or 0
    top = ucnt.orderBy(F.desc("c"), F.asc("term")).limit(vocab_size).collect()
    ucnt.unpersist()
    vocab = [r["term"] for r in top]
    uni_counts = {r["term"]: r["c"] for r in top}
    uni_counts[UNK] = total - sum(uni_counts.values())

    # projection barrier: see perplexity_scores — the mapped-token
    # expression is referenced four times below
    base = tokdf.select(map_tokens(F.col("__t"), vocab).alias("__mt"))
    c = F.col("__mt")
    n = F.size(c)
    pairs = base.select(
        F.explode(
            F.arrays_zip(
                F.slice(c, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
                F.slice(c, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(bigram_k)
        .collect()
    )
    bi_counts = {(r["w1"], r["w2"]): r["c"] for r in bi}
    tokdf.unpersist()
    return _logp_tables(vocab, uni_counts, bi_counts, total, lam)


def _model_frames(
    spark: SparkSession, lm: StupidBackoffLM
) -> tuple[DataFrame, DataFrame]:
    uni = spark.createDataFrame(
        [(t, p) for t, p in sorted(lm.uni_logp.items())],
        "term string, u_logp double",
    )
    bi_rows = [(a, b, p) for (a, b), p in sorted(lm.bi_logp.items())]
    bi = spark.createDataFrame(
        bi_rows or [(None, None, None)], "w1 string, w2 string, b_logp double"
    )
    if not bi_rows:
        bi = bi.filter(F.col("w1").isNotNull())
    return uni, bi


def perplexity_scores(
    df: DataFrame,
    lm: StupidBackoffLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, logp_sum, avg_nll) per document.

    One corpus scan, zero UDFs: tokenize + vocab-map row-locally,
    explode (prev, cur) adjacency pairs built with 0-based ``F.get``
    (prev of the first token is NULL → unigram score), two broadcast
    joins against the bounded model frames, one decimal-exact groupBy
    fold — a single shuffle end to end. Empty/NULL documents survive
    with ``n_tokens = 0`` and NULL scores (``explode_outer``).
    """
    spark = df.sparkSession
    uni, bi = _model_frames(spark, lm)
    mtoks = map_tokens(
        F.coalesce(tokenize(F.col(text_col)), F.array().cast("array<string>")),
        list(lm.vocab),
    )
    # two-step projection on purpose: the tokenize+map expression is
    # non-cheap and referenced three times below (size, transform, the
    # F.get inside the lambda) — materializing it as a column first
    # keeps CollapseProject from re-inlining it per reference (a ~10×
    # scan blowup measured at sf0.1)
    base = _spread(df).select(
        F.col(id_col).alias("__id"), mtoks.alias("__mt")
    )
    c = F.col("__mt")
    pairs = base.select(
        "__id",
        F.size(c).alias("__n"),
        F.explode_outer(
            F.transform(
                c,
                lambda x, i: F.struct(
                    F.get(c, i - 1).alias("prev"), x.alias("cur")
                ),
            )
        ).alias("p"),
    ).select("__id", "__n", "p.prev", "p.cur")
    scored = (
        pairs.join(
            F.broadcast(bi),
            (pairs["prev"] == bi["w1"]) & (pairs["cur"] == bi["w2"]),
            "left",
        )
        .join(F.broadcast(uni), pairs["cur"] == uni["term"], "left")
        .select(
            "__id",
            "__n",
            F.when(F.col("cur").isNull(), F.lit(None).cast("double"))
            .when(F.col("prev").isNull(), F.col("u_logp"))
            .otherwise(
                F.coalesce(
                    F.col("b_logp"), F.lit(lm.lam_log) + F.col("u_logp")
                )
            )
            .alias("score"),
        )
    )
    agg = scored.groupBy("__id").agg(
        F.max("__n").alias("n_tokens"),
        exact_sum("score").alias("logp_sum"),
    )
    return agg.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "logp_sum",
        F.when(
            F.col("n_tokens") > 0, -F.col("logp_sum") / F.col("n_tokens")
        ).alias("avg_nll"),
    )


def perplexity_filter(
    df: DataFrame,
    lm: StupidBackoffLM,
    max_avg_nll: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head-selection: keep documents with
    ``avg_nll <= max_avg_nll`` (⇔ perplexity ≤ e^threshold). Returns
    the original rows (semi-join on the bounded score frame keys, so
    the text column is preserved untouched)."""
    keep = perplexity_scores(df, lm, text_col, id_col).filter(
        F.col("avg_nll") <= F.lit(max_avg_nll)
    )
    return df.join(keep.select(id_col), id_col, "left_semi")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def perplexity_oracle_sql(
    lm: StupidBackoffLM,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`perplexity_scores` for a model whose
    count tables were recomputed independently (see
    :func:`fit_counts_duckdb_sql`): inline VALUES model tables holding
    the SAME python-log literals, the positional-unnest adjacency, the
    same CASE score tree, the same decimal fold."""
    uvals = ", ".join(
        f"({_sql_str(t)}, {dlit(p)})" for t, p in sorted(lm.uni_logp.items())
    )
    bvals = ", ".join(
        f"({_sql_str(a)}, {_sql_str(b)}, {dlit(p)})"
        for (a, b), p in sorted(lm.bi_logp.items())
    )
    bi_cte = (
        f"bi(w1, w2, b_logp) AS (VALUES {bvals})"
        if bvals
        else "bi(w1, w2, b_logp) AS (SELECT '', '', 0.0 WHERE 1=0)"
    )
    vocab_in = ", ".join(_sql_str(t) for t in lm.vocab)
    mapped = (
        f"list_transform(coalesce({_TOK_SQL.format(col=text_col)}, []), "
        f"t -> CASE WHEN t IN ({vocab_in}) THEN t ELSE {_sql_str(UNK)} END)"
        if lm.vocab
        else f"list_transform(coalesce({_TOK_SQL.format(col=text_col)}, []),"
        f" t -> {_sql_str(UNK)})"
    )
    score = (
        f"CASE WHEN p.prev IS NULL THEN u.u_logp "
        f"ELSE coalesce(b.b_logp, {dlit(lm.lam_log)} + u.u_logp) END"
    )
    return f"""
        WITH uni(term, u_logp) AS (VALUES {uvals}),
        {bi_cte},
        m AS (
          SELECT {id_col}, {mapped} AS mtoks FROM {table}
        ),
        p AS (
          SELECT {id_col}, len(mtoks) AS n,
                 mtoks[CAST(i AS INT)] AS cur,
                 CASE WHEN i > 1 THEN mtoks[CAST(i - 1 AS INT)] END AS prev
          FROM m, unnest(generate_series(1, len(mtoks))) AS s(i)
        ),
        agg AS (
          SELECT p.{id_col}, max(p.n) AS n_tokens,
                 {exact_sum_sql(score)} AS logp_sum
          FROM p
          JOIN uni u ON u.term = p.cur
          LEFT JOIN bi b ON b.w1 = p.prev AND b.w2 = p.cur
          GROUP BY p.{id_col}
        )
        SELECT d.{id_col},
               CAST(coalesce(agg.n_tokens, 0) AS INT) AS n_tokens,
               agg.logp_sum,
               CASE WHEN agg.n_tokens > 0
                    THEN -agg.logp_sum / agg.n_tokens END AS avg_nll
        FROM {table} d
        LEFT JOIN agg ON d.{id_col} = agg.{id_col}
    """


def fit_counts_duckdb(
    con,
    table: str = "documents",
    text_col: str = "text",
    vocab_size: int = 256,
    bigram_k: int = 2048,
    lam: float = DEFAULT_LAMBDA,
) -> StupidBackoffLM:
    """Independent DuckDB re-fit with the identical spec (same
    tokenizer, same count-desc/lexicographic tie-breaks) — the oracle
    builder's half of the coupling. If the Spark fit ever counted or
    tie-broke differently, the literals (and so every value hash)
    would diverge."""
    tok = _TOK_SQL.format(col=text_col)
    total = con.execute(
        f"SELECT coalesce(sum(len(coalesce({tok}, []))), 0) FROM {table}"
    ).fetchone()[0]
    top = con.execute(
        f"""
        SELECT t.term, count(*) AS c
        FROM {table}, unnest(coalesce({tok}, [])) AS t(term)
        GROUP BY t.term ORDER BY c DESC, t.term ASC LIMIT {vocab_size}
        """
    ).fetchall()
    vocab = [t for t, _ in top]
    uni_counts = {t: c for t, c in top}
    uni_counts[UNK] = int(total) - sum(uni_counts.values())
    if vocab:
        vocab_in = ", ".join(_sql_str(t) for t in vocab)
        map_case = (
            f"CASE WHEN t IN ({vocab_in}) THEN t ELSE {_sql_str(UNK)} END"
        )
    else:
        map_case = _sql_str(UNK)
    bi = con.execute(
        f"""
        WITH m AS (
          SELECT list_transform(coalesce({tok}, []), t -> {map_case}) AS mt
          FROM {table}
        )
        SELECT mt[CAST(i AS INT)] AS w1, mt[CAST(i + 1 AS INT)] AS w2,
               count(*) AS c
        FROM m, unnest(generate_series(1, len(mt) - 1)) AS s(i)
        GROUP BY w1, w2 ORDER BY c DESC, w1 ASC, w2 ASC LIMIT {bigram_k}
        """
    ).fetchall()
    bi_counts = {(a, b): c for a, b, c in bi}
    return _logp_tables(vocab, uni_counts, dict(bi_counts), int(total), lam)
