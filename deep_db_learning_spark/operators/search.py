"""Full-text retrieval for the LLM-data-pipeline extension: inverted
postings, BM25 ranking, a distinct-token Jaccard retriever, and
reciprocal-rank-fusion (RRF) hybrid search.

No reference counterpart (the reference's only text handling is the
embedding hook, ``data/ctu_dataset.py:43-52``); this is the retrieval
half a training-data pipeline needs next to the dedup/ANN family —
sparse lexical search over the corpus (targeted eval-set mining,
topic filtering, "find documents like this query") with BM25
(Robertson et al., TREC-3) as the lexical voice, set-overlap Jaccard
as a second independent voice, and RRF (Cormack et al., SIGIR 2009)
to fuse any number of rankings without score calibration.

Scale posture (100 TB):
- The postings build is one explode + one ``(id, term)`` shuffle; the
  resulting ``(id, term, tf, dl)`` frame IS the persistable inverted
  index — write it partitioned/bucketed by term so query-time scans
  prune to the query vocabulary's buckets.
- Queries are DRIVER-SIDE by design: a query set is human-sized. The
  per-term document frequencies needed for idf are a bounded collect
  (|query vocabulary| rows), and the query-term frame broadcasts into
  the postings join — scoring touches ONLY postings rows whose term
  appears in some query, never the full corpus per query.
- ``max_df_frac`` drops terms whose postings list exceeds a corpus
  fraction (stopword degree) — the standard guard against a single
  term fanning out to a large share of all documents.
- All cross-row score sums go through the exact decimal fold
  (``functions/exact_agg``), so the ranking is partitioning- and
  engine-independent: the DuckDB oracle, a re-run, and a 1000-executor
  cluster produce bit-identical scores.

Determinism contract (the oracle-coupling rules, COVERAGE.md):
- idf needs ``ln`` — a transcendental whose last ulp is NOT guaranteed
  equal across math libraries. Both the engine and any SQL twin
  therefore compute idf in PYTHON (``math.log``) from exact integer
  (N, df) counts and inline the resulting doubles as literals; the
  engines only ever do IEEE +,-,*,/ on identical literals.
- Every float literal crosses into SQL as ``CAST('<repr>' AS DOUBLE)``
  (:func:`dlit`): both Spark and DuckDB parse the decimal string and
  round correctly to the same double, whereas bare ``2.2`` literals
  parse as DECIMAL with engine-specific downstream promotion.
- The score expressions are built by shared helpers
  (:func:`bm25_score_expr`, :func:`jaccard_score_expr`,
  :func:`rrf_score_expr`) so the engine and the oracle evaluate the
  character-identical arithmetic tree.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact_agg import exact_sum

# lowercase word tokens; RE2-compatible so DuckDB evaluates the same
# pattern, and python's re tokenizes queries identically driver-side
SEARCH_TOKEN_PATTERN = "[a-z0-9]+"


def dlit(x: float) -> str:
    """A double literal both Spark SQL and DuckDB parse to the exact
    same IEEE value (repr round-trips; CAST-from-string is correctly
    rounded in both engines, bare decimal literals are not)."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def search_tokens(text: Column | str) -> Column:
    """``array<string>`` of lowercase word tokens (codegen, no UDF)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(SEARCH_TOKEN_PATTERN), 0)


def tokenize_query(q: str) -> list[str]:
    """Driver-side twin of :func:`search_tokens`, distinct + sorted
    (BM25 sums each query term once; order fixes the literal layout)."""
    return sorted(set(re.findall(SEARCH_TOKEN_PATTERN, q.lower())))


def tokenize_phrase(q: str) -> list[str]:
    """Driver-side tokenization that KEEPS order and duplicates — the
    phrase-search form of :func:`tokenize_query`."""
    return re.findall(SEARCH_TOKEN_PATTERN, q.lower())


def _spread(df: DataFrame) -> DataFrame:
    """A single input file = a single partition = one core running all
    the tokenization; spread it (at scale the scan is already split —
    the minhash_lsh_dedup posture)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def build_postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The inverted index: ``(id, dl, dt, term, tf)`` — term frequency
    per document plus the document's token length (``dl``, with
    multiplicity) and distinct-token count (``dt``). One explode + one
    shuffle on ``(id, term)``; persist this (bucketed by term) as the
    standing index at scale — ONE index serves both the BM25 and the
    Jaccard retriever (``dt`` is what lets Jaccard skip its own scan)."""
    toks = _spread(df).select(
        F.col(id_col), search_tokens(text_col).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        F.size(F.array_distinct("__toks")).alias("dt"),
        F.explode("__toks").alias("term"),
    )
    return toks.groupBy(id_col, "dl", "dt", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def corpus_token_stats(df: DataFrame, text_col: str) -> tuple[int, int]:
    """``(n_docs, total_tokens)`` — exact integers (one scan)."""
    row = _spread(df).select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.size(search_tokens(text_col))), F.lit(0)
        ).alias("s"),
    ).first()
    return int(row["n"]), int(row["s"])


def bm25_idf(n_docs: int, doc_freq: int) -> float:
    """Lucene's non-negative BM25 idf: ``ln(1 + (N - df + .5)/(df + .5))``.
    Python ``math.log`` on exact integers — the ONLY transcendental in
    the pipeline, evaluated once driver-side (see module docstring)."""
    return math.log(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def bm25_score_expr(k1: float, b: float, avgdl: float) -> str:
    """The per-posting BM25 contribution over columns ``idf``, ``tf``,
    ``dl`` — shared verbatim by the engine and any SQL oracle so both
    evaluate the identical IEEE expression tree."""
    return (
        f"(idf * (tf * {dlit(k1 + 1.0)})) / "
        f"(tf + {dlit(k1)} * ({dlit(1.0 - b)} + {dlit(b)} * (dl / {dlit(avgdl)})))"
    )


def jaccard_score_expr() -> str:
    """Distinct-token Jaccard over integer columns ``ov`` (overlap),
    ``da`` (doc set size), ``db`` (query set size) — one IEEE division."""
    return "CAST(ov AS DOUBLE) / (da + db - ov)"


def rrf_score_expr(rank_cols: list[str], rrf_k: float = 60.0) -> str:
    """Reciprocal-rank-fusion score over nullable integer rank columns:
    a FIXED left-to-right fold of ``1/(k + rank)`` terms (float addition
    is not associative; pinning the tree makes the value portable)."""
    terms = [
        f"coalesce({dlit(1.0)} / ({dlit(rrf_k)} + {c}), {dlit(0.0)})"
        for c in rank_cols
    ]
    expr = terms[0]
    for t in terms[1:]:
        expr = f"({expr} + {t})"
    return expr


def _rank_topk(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Deterministic top-k per query: score desc, id asc tiebreak."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "score")
    )


def bm25_topk_from_index(
    postings: DataFrame,
    id_col: str,
    queries: list[tuple[int, str]],
    n_docs: int,
    total_tokens: int,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
    df_counts: dict | None = None,
) -> DataFrame:
    """BM25 over a standing :func:`build_postings` index with KNOWN
    corpus stats — the query-time entry point when the index and its
    ``(n_docs, total_tokens)`` counters are maintained incrementally
    (``streaming.stream_docs_into_index``): no corpus scan runs at
    all, only the bounded df-count collect and the scoring join.
    ``df_counts``: the per-query-term document frequencies when the
    caller already collected them (r14 — :func:`bm25_topk` fuses them
    into its total-tokens pass, one index job instead of two)."""
    spark = postings.sparkSession
    qterms = {qid: tokenize_query(q) for qid, q in queries}
    vocab = sorted({t for ts in qterms.values() for t in ts})
    # bounded collect: one (term, df) row per query-vocabulary term
    dfc = (
        df_counts
        if df_counts is not None
        else {
            r["term"]: r["df"]
            for r in postings.filter(F.col("term").isin(vocab))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect()
        }
    )
    avgdl = total_tokens / n_docs if n_docs else 1.0
    if max_df_frac is not None:
        vocab = [t for t in vocab if dfc.get(t, 0) <= max_df_frac * n_docs]
    keep = set(vocab)
    idf = {t: bm25_idf(n_docs, dfc.get(t, 0)) for t in vocab}
    qrows = [
        (qid, t, idf[t]) for qid, ts in qterms.items() for t in ts if t in keep
    ]
    qframe = spark.createDataFrame(
        qrows, "query_id bigint, term string, idf double"
    )
    scored = (
        postings.join(F.broadcast(qframe), "term")
        .withColumn("__c", F.expr(bm25_score_expr(k1, b, avgdl)))
        .groupBy("query_id", id_col)
        .agg(exact_sum("__c").alias("score"))
    )
    return _rank_topk(scored, id_col, k)


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """BM25 top-k per query → ``(query_id, <id_col>, rank, score)``.

    ``queries``: driver-side ``(query_id, query_text)`` pairs (a query
    set is human-sized). ``postings``: a precomputed
    :func:`build_postings` frame — pass the persisted index at scale so
    only the tiny df-count job and the scoring join run per query set.
    ``max_df_frac``: drop query terms whose document frequency exceeds
    this corpus fraction (stopword-degree guard)."""
    if postings is not None:
        # the index already holds the corpus totals exactly:
        # Σtf = total tokens; only the doc count needs the (cheap,
        # tokenization-free) base scan. ONE grouped pass over the
        # index computes the global token total AND the per-query-term
        # document frequencies together (r14 — previously two separate
        # index jobs): grouping by "query term or NULL" partitions the
        # rows, so Σ of the per-group tf sums is exactly the global
        # sum, and each non-NULL group's row count is that term's df.
        n_docs = df.count()
        qvocab = sorted(
            {t for _, q in queries for t in tokenize_query(q)}
        )
        stat_rows = (
            postings.groupBy(
                F.when(F.col("term").isin(qvocab), F.col("term")).alias(
                    "__qt"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.coalesce(F.sum("tf"), F.lit(0)).alias("stf"),
            )
            .collect()
        )
        total_tokens = int(sum(r["stf"] for r in stat_rows))
        dfc = {
            r["__qt"]: r["df"] for r in stat_rows if r["__qt"] is not None
        }
        return bm25_topk_from_index(
            postings, id_col, queries, n_docs, total_tokens,
            k=k, k1=k1, b=b, max_df_frac=max_df_frac, df_counts=dfc,
        )
    postings = build_postings(df, text_col, id_col)
    n_docs, total_tokens = corpus_token_stats(df, text_col)
    return bm25_topk_from_index(
        postings, id_col, queries, n_docs, total_tokens,
        k=k, k1=k1, b=b, max_df_frac=max_df_frac,
    )


def jaccard_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Distinct-token Jaccard top-k per query — the cheap second
    retrieval voice for RRF. Integer set arithmetic end to end
    (overlap via the inverted explode, union as ``da + db − ov``), so
    the only float op is one portable division; docs sharing no term
    with the query are never materialized (no cross join).
    ``postings``: a :func:`build_postings` frame (its ``dt`` column is
    the doc's distinct-token count and its rows are term-distinct per
    doc) — pass the shared/persisted index so no second corpus scan
    runs."""
    spark = df.sparkSession
    qterms = {qid: tokenize_query(q) for qid, q in queries}
    qframe = spark.createDataFrame(
        [(qid, t) for qid, ts in qterms.items() for t in ts],
        "query_id bigint, term string",
    )
    qsize = spark.createDataFrame(
        [(qid, len(ts)) for qid, ts in qterms.items()],
        "query_id bigint, db int",
    )
    if postings is None:
        toks = _spread(df).select(
            F.col(id_col),
            F.array_distinct(search_tokens(text_col)).alias("__t"),
        ).select(
            id_col, F.size("__t").alias("da"), F.explode("__t").alias("term")
        )
    else:
        toks = postings.select(id_col, F.col("dt").alias("da"), "term")
    scored = (
        toks.join(F.broadcast(qframe), "term")
        .groupBy("query_id", id_col, "da")
        .agg(F.count(F.lit(1)).alias("ov"))
        .join(F.broadcast(qsize), "query_id")
        .withColumn("score", F.expr(jaccard_score_expr()))
    )
    return _rank_topk(scored, id_col, k)


def build_positional_postings(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """The positional index: ``(id, term, positions)`` with 1-based,
    sorted, distinct token positions — what phrase queries consume.
    Same single explode + ``(id, term)`` shuffle as
    :func:`build_postings` (persist alongside it, or instead of it —
    ``tf = size(positions)`` and ``dl/dt`` re-derive with one agg)."""
    toks = _spread(df).select(
        F.col(id_col),
        F.posexplode(search_tokens(text_col)).alias("__p", "term"),
    )
    return toks.groupBy(id_col, "term").agg(
        F.array_sort(F.collect_list(F.col("__p") + 1)).alias("positions")
    )


def postings_from_positional(pos: DataFrame, id_col: str) -> DataFrame:
    """Derive the flat ``(id, dl, dt, term, tf)`` index from the
    positional one — ``tf = size(positions)``, per-doc ``dl/dt`` via
    one groupBy + join. At scale this replaces a SECOND full-corpus
    tokenization (regex over every text byte) with arithmetic over the
    already-built index: persist ONLY the positional index and serve
    BM25/Jaccard/keyword/phrase from it. Bit-identical to
    :func:`build_postings` (pinned in tests)."""
    flat = pos.select(
        F.col(id_col),
        "term",
        F.size("positions").cast("bigint").alias("tf"),
    )
    per_doc = flat.groupBy(id_col).agg(
        F.sum("tf").cast("int").alias("dl"),
        F.count(F.lit(1)).cast("int").alias("dt"),
    )
    return flat.join(per_doc, id_col).select(id_col, "dl", "dt", "term", "tf")


def phrase_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    phrases: list[tuple[int, str]],
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact phrase retrieval → ``(query_id, <id_col>,
    n_occurrences)``: a document matches when the phrase's tokens
    occur CONSECUTIVELY. The match is the classic positional-index
    fold — start from the first term's position list and repeatedly
    ``intersect(positions + 1, next term's positions)`` — n−1 narrow
    equi-joins on the doc id per phrase, all-codegen array HOFs, no
    UDF and no re-tokenization per term. ``postings``: a shared
    :func:`build_positional_postings` frame."""
    if postings is None:
        postings = build_positional_postings(df, text_col, id_col)
    # r15 restructure (guide §2.4/§3.2): the former shape ran one
    # filter+join CHAIN per phrase over the index (n−1 equi-joins per
    # phrase, two index scans each, unioned per phrase) — at bench
    # scale that is most of the entry's stage-job tail. All phrases
    # now resolve in ONE broadcast join + ONE (query, doc) groupBy: a
    # doc matches when every phrase slot i is present (the index is
    # term-distinct per doc, so group size == phrase length exactly
    # then), and the match count folds IN-ROW over the collected
    # position lists — start positions = ∩_i (positions_i − i), a
    # bijection (start ↔ end) away from the old chain's end-position
    # fold ∩_i (positions_i shifted forward), so the occurrence COUNT
    # is identical (pinned against a naive scan in tests). All-codegen
    # array HOFs, no UDF, no re-tokenization — unchanged.
    qrows = []
    for qid, phrase in phrases:
        terms = tokenize_phrase(phrase)
        for i, t in enumerate(terms):
            qrows.append((qid, i, t, len(terms)))
    if not qrows:
        raise ValueError("phrase_search needs at least one non-empty phrase")
    spark = postings.sparkSession
    qframe = spark.createDataFrame(
        qrows, "query_id bigint, i int, term string, nt int"
    )
    grp = (
        postings.join(F.broadcast(qframe), "term")
        .groupBy("query_id", F.col(id_col))
        .agg(
            F.collect_list(F.struct("i", "positions")).alias("ps"),
            F.max("nt").alias("nt"),
        )
        .filter(F.size("ps") == F.col("nt"))
    )
    starts = (
        "aggregate("
        "  slice(array_sort(ps), 2, nt - 1),"
        "  element_at(array_sort(ps), 1).positions,"
        "  (acc, s) -> array_intersect("
        "    acc, transform(s.positions, x -> x - s.i)))"
    )
    return (
        grp.select(
            "query_id",
            F.col(id_col),
            F.size(F.expr(starts)).cast("int").alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 0)
    )


def postings_append(
    postings: DataFrame, new: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Incremental maintenance of the standing inverted index (the
    text-retrieval analog of ``similarity.ivf_append`` /
    ``dedup.minhash_band_index``): postings rows are per-document
    independent, so appending a crawl batch is tokenizing ONLY the
    batch and unioning — bit-identical to rebuilding over the grown
    corpus (pinned in tests). No drift state is needed: BM25's corpus
    statistics (df, N, avgdl) are re-derived from the index per query
    set, so they are always current."""
    return postings.unionByName(build_postings(new, text_col, id_col))


def keyword_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str] | str,
    mode: str = "all",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Boolean retrieval: rows of ``df`` whose text contains ALL
    (``mode='all'``) or ANY (``mode='any'``) of the query terms —
    the pre-ranking candidate filter. Via the inverted index: explode
    once, broadcast the term set, count distinct matches per doc, keep
    ``n == len(terms)`` (or ``>= 1``) — a semi-join, never a scan per
    term."""
    if isinstance(terms, str):
        terms = tokenize_query(terms)
    terms = sorted(set(terms))
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    if postings is None:
        toks = _spread(df).select(
            F.col(id_col),
            F.explode(
                F.array_distinct(search_tokens(text_col))
            ).alias("term"),
        )
    else:
        toks = postings.select(id_col, "term")
    need = 1 if mode == "any" else len(terms)
    hits = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= need)
        .select(id_col)
    )
    return df.join(hits, id_col, "leftsemi")


def collocations(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 5,
    terms: list[str] | None = None,
) -> DataFrame:
    """Corpus-level bigram collocation mining → ``(a, b, c_ab, c_a,
    c_b, lift)``: consecutive-token pairs ranked by lift — the
    pointwise-mutual-information ratio ``N·c_ab / (c_a·c_b)`` WITHOUT
    the log (PMI is monotone in it, and skipping the transcendental
    keeps the score a single portable IEEE division over exact integer
    counts — the oracle-coupling rule). The standard query-expansion
    source: filter ``a`` to a query's terms and take the top-lift
    partners. ``terms``: restrict the left token (pushes the filter
    into the bigram scan); ``min_count`` drops noise pairs.

    Scale shape: one tokenize scan → bigram explode → one (a, b)
    groupBy; unigram counts from the same scan; two broadcast-able
    joins of the (small, min_count-filtered) pair frame against the
    unigram frame."""
    toks = _spread(df).select(search_tokens(text_col).alias("__t"))
    uni = (
        toks.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tokens = "__N"  # total tokens, folded in below
    bi = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(__t) < 2 THEN array() ELSE "
                "transform(sequence(1, size(__t) - 1), "
                "i -> struct(__t[i - 1] AS a, __t[i] AS b)) END"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    if terms is not None:
        bi = bi.filter(F.col("a").isin(sorted(set(terms))))
    pairs = (
        bi.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    total = int(
        uni.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("s")).first()["s"]
    )
    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    return (
        pairs.join(ua, "a")
        .join(ub, "b")
        .select(
            "a", "b", "c_ab", "c_a", "c_b",
            F.expr(
                f"CAST(c_ab * CAST({total} AS BIGINT) AS DOUBLE)"
                " / (c_a * c_b)"
            ).alias("lift"),
        )
    )


def best_snippet(
    df: DataFrame,
    text_col: str,
    id_col: str,
    queries: list[tuple[int, str]],
    window: int = 20,
    postings: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Snippet extraction (the RAG context-window step): for each
    (query, doc) with at least one query-term hit, the ``window``-token
    span covering the MOST DISTINCT query terms → ``(query_id,
    <id_col>, snippet_start, n_terms, snippet)``. Exact argmax over
    candidate windows anchored at each matched position (ties: lowest
    start) — a self-join of the per-doc query-term match positions
    (bounded by matches, not tokens), then one tokenize of only the
    matched docs to slice the span text. All integer arithmetic +
    array slicing — DuckDB-twin testable.

    ``pairs``: restrict to these ``(query_id, <id_col>)`` rows — the
    retrieve-then-snippet composition (pass the BM25 top-k frame so
    the window argmax runs over k docs per query, not the corpus)."""
    spark = df.sparkSession
    qterms = {qid: tokenize_query(q) for qid, q in queries}
    qframe = spark.createDataFrame(
        [(qid, t) for qid, ts in qterms.items() for t in ts],
        "query_id bigint, term string",
    )
    if postings is None:
        postings = build_positional_postings(df, text_col, id_col)
    matches = (
        postings.join(F.broadcast(qframe), "term")
        .select("query_id", F.col(id_col), "term",
                F.explode("positions").alias("pos"))
    )
    if pairs is not None:
        matches = matches.join(
            F.broadcast(pairs.select("query_id", F.col(id_col))),
            ["query_id", id_col],
        )
    # r15 restructure (guide §2.4): the window argmax used a self-join
    # of the match positions (one exchange for the join, one groupBy,
    # one rank window — three shuffled stages over a ≤ queries·k·
    # matches frame). The matches per (query, doc) are bounded (the
    # ``pairs`` restriction caps docs at k per query; matches are
    # query-term positions only), so the argmax folds IN-ROW instead:
    # one groupBy collects the (pos, term) matches, a candidate window
    # anchors at every matched position, its distinct-term count is an
    # array HOF, and the (n_terms desc, start asc) argmax is an
    # aggregate fold — same candidates, same count, same tie-break.
    ms = matches.groupBy("query_id", F.col(id_col)).agg(
        F.collect_list(F.struct("pos", "term")).alias("ms")
    )
    cands = (
        "transform(array_sort(ms), c -> struct("
        "  size(array_distinct(transform("
        f"    filter(ms, m -> m.pos >= c.pos AND m.pos <= c.pos + {int(window) - 1}),"
        "    m -> m.term))) AS n,"
        "  c.pos AS s))"
    )
    best_expr = (
        f"aggregate({cands}, struct(-1 AS n, -1 AS s),"
        " (acc, x) -> if(x.n > acc.n OR (x.n = acc.n AND x.s < acc.s), x, acc))"
    )
    best = ms.select(
        "query_id",
        id_col,
        F.expr(best_expr).alias("__best"),
    ).select(
        "query_id",
        id_col,
        F.col("__best.s").cast("int").alias("snippet_start"),
        F.col("__best.n").cast("int").alias("n_terms"),
    )
    toks = df.join(
        best.select(id_col).distinct(), id_col, "leftsemi"
    ).select(F.col(id_col), search_tokens(text_col).alias("__t"))
    return best.join(toks, id_col).select(
        "query_id", id_col, "snippet_start", "n_terms",
        F.concat_ws(
            " ", F.slice("__t", F.col("snippet_start"), window)
        ).alias("snippet"),
    )


def expand_query_terms(
    colloc: DataFrame,
    queries: list[tuple[int, str]],
    top_m: int = 2,
    min_lift: float = 1.0,
) -> list[tuple[int, str]]:
    """Query expansion from :func:`collocations`: append each query
    term's top-``top_m`` collocation partners (lift desc, then
    alphabetical — deterministic) with lift above ``min_lift``.
    Driver-side over a bounded collect (query vocabulary only) —
    returns a new query list for :func:`bm25_topk`."""
    qterms = {qid: tokenize_query(q) for qid, q in queries}
    vocab = sorted({t for ts in qterms.values() for t in ts})
    rows = (
        colloc.filter(F.col("a").isin(vocab))
        .select("a", "b", "lift")
        .collect()
    )
    partners: dict[str, list[tuple[float, str]]] = {}
    for r in rows:
        if r["lift"] > min_lift and r["b"] not in vocab:
            partners.setdefault(r["a"], []).append((-r["lift"], r["b"]))
    out = []
    for qid, q in queries:
        extra: list[str] = []
        for t in qterms[qid]:
            for _, b in sorted(partners.get(t, []))[:top_m]:
                if b not in extra:
                    extra.append(b)
        out.append((qid, q + (" " + " ".join(extra) if extra else "")))
    return out


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    k: int = 10,
    rrf_k: float = 60.0,
) -> DataFrame:
    """Fuse ``(query_id, <id_col>, rank, ...)`` frames by reciprocal
    rank: full-outer join on ``(query_id, id)`` in the GIVEN order
    (the fold order pins the float sum), score with
    :func:`rrf_score_expr`, re-rank deterministically. Retriever
    scores are ignored by construction — RRF needs no calibration."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    frames = [
        r.select(
            "query_id", F.col(id_col), F.col("rank").alias(f"__r{i}")
        )
        for i, r in enumerate(rankings)
    ]
    joined = frames[0]
    for f in frames[1:]:
        joined = joined.join(f, ["query_id", id_col], "full_outer")
    cols = [f"__r{i}" for i in range(len(rankings))]
    scored = joined.withColumn("score", F.expr(rrf_score_expr(cols, rrf_k)))
    return _rank_topk(scored, id_col, k)
