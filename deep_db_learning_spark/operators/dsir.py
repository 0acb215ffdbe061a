"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169) — pick raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus. The standard pretraining
data-selection pass the reference pipeline family lacks; a first-class
LLM-data operator here.

The algorithm, re-expressed Spark-first:

1. **Featurize** every document into hashed n-gram buckets (unigrams +
   bigrams of lowercased whitespace tokens → portable 32-bit md5
   bucket mod ``n_buckets``). Pure codegen: split / sequence /
   transform / explode — a row-local 1→N flatMap at scan speed.
2. **Fit** two bag-of-hashed-ngrams models: bucket counts over the
   target corpus and over the raw corpus — two map-side-combinable
   ``groupBy(bucket)`` jobs whose results are BOUNDED driver state
   (``n_buckets`` integers each, the PSI/BM25 recipe).
3. **Weight**: per-bucket log-likelihood ratio
   ``λ_b = log((t_b+α)/(T+αB)) − log((r_b+α)/(R+αB))`` computed
   DRIVER-SIDE in python over the exact integer counts (Laplace-α
   smoothing), so the transcendentals are engine-independent literals
   — the BM25-idf/PSI coupling trick.
4. **Score**: each document's importance ``log w = Σ_grams λ_bucket``.
   The λ values cross into the plan dec9-QUANTIZED (decimal(30,9));
   the per-document sum is an exact decimal fold — associative, so the
   score is partitioning- and engine-independent bit-for-bit. One
   explode + one broadcast join (λ is n_buckets rows) + one
   map-side-combinable groupBy: a single narrow shuffle over the
   corpus.
5. **Select**: deterministic top-k by ``(score DESC, doc_id)`` (the
   paper's importance-resampling step uses Gumbel noise; the
   deterministic top-k variant is what ships as the oracle-coupled
   default — :func:`gumbel_select` provides the randomized form with a
   portable hash-seeded Gumbel, pytest-twinned).

100 TB posture: no step holds more than ``n_buckets`` values on the
driver; the corpus is touched by exactly two count shuffles (fit) and
one score shuffle; the λ join is broadcast; selection runs through
:func:`~.selection.topk_threshold_cut` — histogram refinement locates
the exact k-th score with bounded driver state and the kept set is a
pure codegen filter, so NOTHING ranks through a single reducer (the
``exact_window=True`` forms retain the global-rank reference
semantics for the pytest equality pins).
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact_agg import DECIMAL_TYPE
from ..functions.hashing import md5_prefix_hash, md5_prefix_hash_sql

DEFAULT_BUCKETS = 10_000


def spread_input(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Repartition a narrower-than-the-cluster input once (a
    single-file parquet scan otherwise runs the whole md5 flatMap on
    ONE core — the ``search._spread`` lesson). The partition-count
    probe (``df.rdd``) forces a plan materialization, so its result is
    MEMOIZED on the frame object: an external caller composing
    :func:`fit_dsir_weights` + :func:`dsir_scores` on the same raw
    frame pays the probe once, and re-spreading an already-spread
    frame is a pure dict lookup (pytest spies ``.rdd`` to pin zero
    accesses on the second call). ``num_partitions``, when the caller
    already knows the frame's partition count, skips the probe
    entirely. The memo read is isinstance-guarded: PySpark's
    ``DataFrame.__getattr__`` resolves unknown attributes to COLUMNS,
    so a frame that happens to carry a column literally named
    ``_ddl_spread`` would otherwise hand back a truthy ``Column``. An
    explicit ``num_partitions`` bypasses the cache (the caller is
    asserting fresh knowledge of the frame's layout) and its result is
    scoped to THAT call: the input frame's memo is left untouched, so
    a wrong caller assertion can't poison later probe-based calls on
    the same frame (only ``out``, which IS spread under either story,
    gets the self-memo)."""
    cached = df.__dict__.get("_ddl_spread")
    if isinstance(cached, DataFrame) and num_partitions is None:
        return cached
    par = df.sparkSession.sparkContext.defaultParallelism
    n = (
        num_partitions
        if num_partitions is not None
        else df.rdd.getNumPartitions()
    )
    out = df.repartition(par) if n < par else df
    # memoize on both the input and the output (spread(spread(df)) is
    # the identity); a plain attribute — the frames' lifetimes bound
    # it. The input memo is ONLY written on the probed path: a
    # caller-asserted num_partitions must not speak for future
    # probe-based callers of the same raw frame.
    if num_partitions is None:
        df._ddl_spread = out
        out._ddl_spread = out
    elif out is not df:
        # asserted path: the repartitioned OUTPUT is spread under
        # either story, but a pass-through (out is df) must not be
        # self-memoized off an unverified assertion
        out._ddl_spread = out
    return out


def _grams(text_col: str) -> Column:
    """Unigrams + bigrams of the lowercased whitespace tokens, with
    NO higher-order functions: interpreted per-element lambdas
    dominate composite text plans (the ``stopword_ratio`` lesson), so
    tokens come from one ``regexp_extract_all`` and bigrams from two
    non-overlapping ``\\S+ \\S+`` passes over the space-normalized
    text (pass 2 drops the leading token, so between them every
    consecutive pair appears exactly once). Gram MULTISET identical to
    the transform-lambda formulation — bucket counts don't see
    order.

    Normalization is ``word_embedding._norm_col`` — the ONE spelling in
    the tree (r14 rotation, VERDICT r13 task 4): ``trim`` runs AFTER
    the ``\\s+ → ' '`` collapse, so a document starting with a
    tab/newline cannot keep a leading space that would defeat pass 2's
    ``^\\S+ `` anchor (the r13 edge where the first pair double-counted
    instead of sliding). :func:`doc_ngram_buckets_sql` rotated in the
    same commit — cross-engine parity holds on the FIXED multiset."""
    from .word_embedding import _norm_col

    norm = _norm_col(text_col)
    uni = F.regexp_extract_all(norm, F.lit(r"\S+"), 0)
    b1 = F.regexp_extract_all(norm, F.lit(r"\S+ \S+"), 0)
    b2 = F.regexp_extract_all(
        F.regexp_replace(norm, r"^\S+ ", ""), F.lit(r"\S+ \S+"), 0
    )
    return F.concat(uni, b1, b2)


def doc_ngram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    spread: bool = True,
) -> DataFrame:
    """``(id_col, bucket)`` — one row per n-gram OCCURRENCE (unigrams +
    bigrams), hashed into ``n_buckets`` portable buckets. Row-local
    codegen flatMap, no UDF. ``spread`` repartitions a
    narrower-than-the-cluster input first (a single-file parquet scan
    otherwise runs the whole md5 flatMap on ONE core — the
    ``search._spread`` lesson); the one small pre-explode exchange
    buys corpus-wide parallelism for the hash work."""
    if spread:
        df = spread_input(df)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(_grams(text_col)).alias("gram"))
        .select(
            id_col,
            (md5_prefix_hash(F.col("gram")) % F.lit(n_buckets)).alias("bucket"),
        )
    )


def doc_ngram_buckets_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB twin of :func:`doc_ngram_buckets` — the identical
    normalized-text regex passes (unigrams + the two offset bigram
    sweeps), identical md5-prefix bucket; gram multiset equal by the
    same argument as the engine's. Normalization trims AFTER the
    whitespace collapse (the r14 rotation — matches
    ``word_embedding._norm_col`` exactly)."""
    return f"""
        SELECT {id_col},
               ({md5_prefix_hash_sql('gram')}) % {n_buckets} AS bucket
        FROM (
          SELECT {id_col},
                 list_concat(list_concat(
                   regexp_extract_all(norm, '\\S+'),
                   regexp_extract_all(norm, '\\S+ \\S+')),
                   regexp_extract_all(
                     regexp_replace(norm, '^\\S+ ', ''), '\\S+ \\S+')
                 ) AS grams
          FROM (SELECT {id_col},
                       trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))
                         AS norm
                FROM {table} WHERE {text_col} IS NOT NULL)
        ), unnest(grams) AS g(gram)
    """


def fit_dsir_weights(
    df_target: DataFrame,
    df_raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    spread: bool = True,
) -> list[float]:
    """Per-bucket log-likelihood-ratio weights ``λ_b`` from the target
    and raw corpora — two count jobs, then driver-side python ``log``
    over the exact integer counts (engine-independent by the BM25-idf
    precedent). Returns a dense length-``n_buckets`` list. Each input
    is spread ONCE here (pass ``spread=False`` for pre-spread
    frames)."""
    if spread:
        df_target = spread_input(df_target)
        df_raw = spread_input(df_raw)

    def counts(df):
        rows = (
            doc_ngram_buckets(df, text_col, id_col, n_buckets, spread=False)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        out = [0] * n_buckets
        for r in rows:
            out[r["bucket"]] = r["c"]
        return out

    t = counts(df_target)
    r = counts(df_raw)
    return dsir_lambda_py(t, r, alpha)


def dsir_lambda_py(t_counts, r_counts, alpha: float = 1.0) -> list[float]:
    """The shared λ arithmetic over exact integer counts — python
    floats, used identically by the engine fit and the oracle builder
    (any drift breaks the driver hash)."""
    B = len(t_counts)
    T = sum(t_counts)
    R = sum(r_counts)
    return [
        math.log((t_counts[b] + alpha) / (T + alpha * B))
        - math.log((r_counts[b] + alpha) / (R + alpha * B))
        for b in range(B)
    ]


def _dec9_str(x: float) -> str:
    """dec9 quantization of a λ literal — the exact value that crosses
    into BOTH plans (Spark decimal literal, DuckDB CAST text)."""
    from decimal import ROUND_HALF_UP

    return str(
        Decimal(repr(float(x))).quantize(
            Decimal("1.000000000"), rounding=ROUND_HALF_UP
        )
    )


def dsir_scores(
    df: DataFrame,
    lambdas: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    spread: bool = True,
) -> DataFrame:
    """``(id_col, score, n_grams)`` — per-document importance
    ``log w = Σ λ_bucket`` as an exact decimal fold over dec9-quantized
    λ (bit-identical under any partitioning), cast to double at the
    end. Documents whose text yields no grams score 0 with
    ``n_grams = 0`` (left join back to the corpus). One explode
    shuffle + a broadcast λ join. ``spread`` widens ONLY the bucket
    path (the md5 flatMap) — the id-projection left side never needs
    it; pass ``spread=False`` for a frame already through
    :func:`spread_input`."""
    src = spread_input(df) if spread else df
    n_buckets = len(lambdas)
    spark = df.sparkSession
    lam = spark.createDataFrame(
        [(b, Decimal(_dec9_str(lambdas[b]))) for b in range(n_buckets)],
        f"bucket bigint, lam {DECIMAL_TYPE}",
    )
    scored = (
        doc_ngram_buckets(src, text_col, id_col, n_buckets, spread=False)
        .join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("lam").cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("score", F.lit(0.0)).alias("score"),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        )
    )


def dsir_scores_sql(
    table: str,
    lambdas: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`dsir_scores`: the identical dec9 λ
    literals, the identical exact decimal fold."""
    vals = ", ".join(
        f"({b}, CAST('{_dec9_str(lambdas[b])}' AS DECIMAL(30,9)))"
        for b in range(len(lambdas))
    )
    buckets = doc_ngram_buckets_sql(table, text_col, id_col, len(lambdas))
    return f"""
        SELECT d.{id_col},
               COALESCE(s.score, 0.0) AS score,
               COALESCE(s.n_grams, 0) AS n_grams
        FROM (SELECT {id_col} FROM {table} WHERE {text_col} IS NOT NULL) d
        LEFT JOIN (
          SELECT {id_col},
                 CAST(sum(lam) AS DOUBLE) AS score,
                 count(*) AS n_grams
          FROM ({buckets}) b
          JOIN (VALUES {vals}) AS lamt(bucket, lam) USING (bucket)
          GROUP BY {id_col}
        ) s USING ({id_col})
    """


def select_top_k(
    scores: DataFrame,
    k: int,
    id_col: str = "doc_id",
    exact_window: bool = False,
    n_bins: int | None = None,
    collect_cap: int | None = None,
) -> DataFrame:
    """The deterministic resampling step: keep the ``k`` highest-scored
    documents, ties broken by ``id_col``. Default path is the
    threshold cut (:func:`~.selection.topk_threshold_cut` — histogram
    refinement locates the exact k-th score with bounded driver state,
    the returned plan is a pure codegen filter, NO single-partition
    rank anywhere — the 100 TB shape). ``exact_window=True`` keeps the
    global-rank window form — the reference semantics pytest pins the
    cut against; never the production path."""
    if exact_window:
        from pyspark.sql.window import Window

        w = Window.orderBy(F.desc("score"), F.col(id_col))
        return (
            scores.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .drop("__rk")
        )
    from .selection import COLLECT_CAP, N_BINS, topk_threshold_cut

    return topk_threshold_cut(
        scores, "score", k, id_col, descending=True,
        n_bins=n_bins or N_BINS, collect_cap=collect_cap or COLLECT_CAP,
    )


def _gumbel_key(id_col: str, seed: int) -> Column:
    """``score + Gumbel(0,1)`` with hash-seeded portable noise."""
    u = (
        md5_prefix_hash(
            F.concat(F.lit(f"dsir-gumbel:{seed}:"), F.col(id_col).cast("string"))
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    return F.col("score") + -F.log(-F.log(u))


def gumbel_select(
    scores: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
    exact_window: bool = False,
    n_bins: int | None = None,
    collect_cap: int | None = None,
) -> DataFrame:
    """The paper's randomized importance resampling: top-k by
    ``score + Gumbel(0,1)`` with the noise derived from a PORTABLE
    per-document hash (md5 of ``seed:id`` → uniform in (0,1) →
    ``−log(−log u)``), so the sample is reproducible across engines
    and runs. The transcendental is per-row float64 libm — pytest pins
    it against a python replay (not a SQL oracle; the deterministic
    :func:`select_top_k` is the driver-hashed form). Selection runs
    through the same threshold cut as :func:`select_top_k`
    (``exact_window=True`` retains the global-rank reference form)."""
    key = _gumbel_key(id_col, seed)
    if exact_window:
        from pyspark.sql.window import Window

        w = Window.orderBy(F.desc(key), F.col(id_col))
        return (
            scores.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .drop("__rk")
        )
    from .selection import COLLECT_CAP, N_BINS, topk_threshold_cut

    keyed = scores.withColumn("__gk", key)
    return topk_threshold_cut(
        keyed, "__gk", k, id_col, descending=True,
        n_bins=n_bins or N_BINS, collect_cap=collect_cap or COLLECT_CAP,
    ).drop("__gk")
