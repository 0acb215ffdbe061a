"""Full-text retrieval (r7): BM25 over inverted postings, the
distinct-token Jaccard retriever, and RRF hybrid fusion — each checked
bit-for-bit against an independent DuckDB twin (the engines share only
the python-computed idf literals and the expression-tree helpers, per
the oracle-coupling contract), plus ranking-semantics properties and
plan-shape pins."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.functions.exact_agg import exact_sum_sql
from deep_db_learning_spark.operators import search

SF = "/root/testdata/sf0.001"
QUERIES = [
    (0, "hash join spark"),
    (1, "window agg stream"),
    (2, "customer filter scan"),
    (3, "vector merge sort batch"),
    (4, "slow query big table"),
]
TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _duck_bm25_cte(con, k1=1.2, b=0.75, k=10):
    """DuckDB BM25 CTE chain (post → q VALUES → exact-decimal score →
    deterministic rank), sharing ONLY the literal-layout helpers with
    the engine."""
    n_docs, total = con.execute(
        f"SELECT count(*), sum(len({TOK})) FROM documents"
    ).fetchone()
    avgdl = total / n_docs
    qterms = {qid: search.tokenize_query(q) for qid, q in QUERIES}
    vocab = sorted({t for ts in qterms.values() for t in ts})
    dfc = dict(
        con.execute(
            f"""
        SELECT term, count(*) FROM (
          SELECT doc_id, t.term FROM documents,
            unnest({TOK}) AS t(term)
          GROUP BY doc_id, t.term)
        WHERE term IN ({','.join("'" + t + "'" for t in vocab)})
        GROUP BY term"""
        ).fetchall()
    )
    idf = {t: search.bm25_idf(n_docs, dfc.get(t, 0)) for t in vocab}
    qvals = ", ".join(
        f"({qid}, '{t}', {search.dlit(idf[t])})"
        for qid, ts in qterms.items()
        for t in ts
    )
    return f"""
    post AS (
      SELECT doc_id, len({TOK}) AS dl, t.term, count(*) AS tf
      FROM documents, unnest({TOK}) AS t(term)
      GROUP BY doc_id, dl, t.term
    ), q(query_id, term, idf) AS (VALUES {qvals}),
    sc AS (
      SELECT q.query_id, p.doc_id,
             {exact_sum_sql(search.bm25_score_expr(k1, b, avgdl))} AS score
      FROM post p JOIN q USING (term) GROUP BY q.query_id, p.doc_id
    ), bm AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS INTEGER) AS rank, score
      FROM sc QUALIFY rank <= {k}
    )"""


def _duck_jacc_cte(k=10):
    qterms = {qid: search.tokenize_query(q) for qid, q in QUERIES}
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in qterms.items() for t in ts
    )
    qsz = ", ".join(f"({qid}, {len(ts)})" for qid, ts in qterms.items())
    return f"""
    dtok AS (
      SELECT doc_id, len(list_distinct({TOK})) AS da, t.term
      FROM documents, unnest(list_distinct({TOK})) AS t(term)
    ), jq(query_id, term) AS (VALUES {qvals}),
    qs(query_id, db) AS (VALUES {qsz}),
    jov AS (
      SELECT jq.query_id, d.doc_id, d.da, count(*) AS ov
      FROM dtok d JOIN jq USING (term) GROUP BY jq.query_id, d.doc_id, d.da
    ), jsc AS (
      SELECT query_id, doc_id, {search.jaccard_score_expr()} AS score
      FROM (SELECT jov.*, qs.db FROM jov JOIN qs USING (query_id))
    ), ja AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS INTEGER) AS rank, score
      FROM jsc QUALIFY rank <= {k}
    )"""


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_bm25_matches_duckdb(spark, duck):
    got = sorted(
        map(tuple, search.bm25_topk(_docs(spark), "text", "doc_id", QUERIES, k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                f"WITH {_duck_bm25_cte(duck)} SELECT * FROM bm"
            ).fetchall(),
        )
    )
    assert got == want  # bitwise, scores included


def test_jaccard_matches_duckdb(spark, duck):
    got = sorted(
        map(tuple, search.jaccard_topk(_docs(spark), "text", "doc_id", QUERIES, k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                f"WITH {_duck_jacc_cte()} SELECT * FROM ja"
            ).fetchall(),
        )
    )
    assert got == want


def test_rrf_matches_duckdb(spark, duck):
    docs = _docs(spark)
    bm = search.bm25_topk(docs, "text", "doc_id", QUERIES, k=10)
    ja = search.jaccard_topk(docs, "text", "doc_id", QUERIES, k=10)
    got = sorted(
        map(tuple, search.rrf_fuse([bm, ja], "doc_id", k=10).collect())
    )
    rrf_expr = search.rrf_score_expr(["a.rank", "b.rank"], 60.0)
    want = sorted(
        map(
            tuple,
            duck.execute(
                f"""
        WITH {_duck_bm25_cte(duck)}, {_duck_jacc_cte()}
        , fused AS (
          SELECT coalesce(a.query_id, b.query_id) AS query_id,
                 coalesce(a.doc_id, b.doc_id) AS doc_id,
                 {rrf_expr} AS score
          FROM bm a FULL OUTER JOIN ja b
            ON a.query_id = b.query_id AND a.doc_id = b.doc_id
        )
        SELECT query_id, doc_id,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, doc_id
               ) AS INTEGER) AS rank, score
        FROM fused QUALIFY rank <= 10"""
            ).fetchall(),
        )
    )
    assert got == want


def test_bm25_ranking_sanity(spark):
    rows = [
        (1, "solar panel efficiency in desert climates"),
        (2, "solar panel installation costs"),
        (3, "medieval bread baking techniques"),
        (4, "panel discussion about nothing solar related panel panel"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = search.bm25_topk(
        docs, "text", "doc_id", [(0, "solar panel efficiency")], k=4
    ).collect()
    ranked = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ranked[0] == 1  # all three terms, once each
    assert 3 not in ranked  # shares no term
    assert all(r["score"] > 0 for r in got)


def test_bm25_max_df_frac_drops_stopword_terms(spark):
    rows = [
        (1, "the quick fox"),
        (2, "the lazy dog"),
        (3, "the busy bee"),
        (4, "the quiet owl"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # "the" is in 4/4 docs; with the guard at 0.5 only "fox" scores
    got = search.bm25_topk(
        docs, "text", "doc_id", [(0, "the fox")], k=4, max_df_frac=0.5
    ).collect()
    assert [r["doc_id"] for r in got] == [1]
    without = search.bm25_topk(
        docs, "text", "doc_id", [(0, "the fox")], k=4
    ).collect()
    assert len(without) == 4  # every doc matches "the" unguarded


def test_rrf_consensus_and_identity(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "query_id bigint, doc_id bigint, rank int, score double"
    )
    a = mk([(0, 10, 1, 9.0), (0, 11, 2, 8.0), (0, 12, 3, 7.0)])
    b = mk([(0, 11, 1, 0.9), (0, 10, 2, 0.8), (0, 13, 3, 0.7)])
    fused = search.rrf_fuse([a, b], "doc_id", k=4).collect()
    order = [r["doc_id"] for r in sorted(fused, key=lambda r: r["rank"])]
    # consensus docs (10, 11 in both) beat single-list docs (12, 13);
    # 10 and 11 tie on 1/61+1/62 — doc_id breaks the tie
    assert order == [10, 11, 12, 13]
    solo = search.rrf_fuse([a], "doc_id", k=3).collect()
    assert [r["doc_id"] for r in sorted(solo, key=lambda r: r["rank"])] == [
        10, 11, 12,
    ]


def test_search_plan_shape(spark):
    """Query frames broadcast into the postings join; the whole
    pipeline is codegen (no python UDF nodes); bm25 stays within the
    postings shuffle + agg shuffle + one window exchange."""
    from tests.test_plans import shuffle_count

    docs = _docs(spark)
    bm = search.bm25_topk(docs, "text", "doc_id", QUERIES, k=10)
    plan = bm._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert shuffle_count(plan) <= 5
    ja = search.jaccard_topk(docs, "text", "doc_id", QUERIES, k=10)
    jplan = ja._jdf.queryExecution().executedPlan().toString()
    assert jplan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in jplan and "ArrowEvalPython" not in jplan


def test_shared_postings_paths_identical(spark):
    """One build_postings index must feed both retrievers bit-identically
    to their direct-scan paths (the q_text_search composition)."""
    docs = _docs(spark)
    post = search.build_postings(docs, "text", "doc_id")
    bm_a = sorted(map(tuple, search.bm25_topk(docs, "text", "doc_id", QUERIES, k=10).collect()))
    bm_b = sorted(map(tuple, search.bm25_topk(docs, "text", "doc_id", QUERIES, k=10, postings=post).collect()))
    assert bm_a == bm_b
    ja_a = sorted(map(tuple, search.jaccard_topk(docs, "text", "doc_id", QUERIES, k=10).collect()))
    ja_b = sorted(map(tuple, search.jaccard_topk(docs, "text", "doc_id", QUERIES, k=10, postings=post).collect()))
    assert ja_a == ja_b


def test_postings_append_equals_rebuild(spark):
    """Incremental index maintenance: appending a batch's postings is
    bit-identical to rebuilding over the grown corpus, and BM25 over
    the appended index matches BM25 over the rebuilt one."""
    docs = _docs(spark)
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    appended = search.postings_append(
        search.build_postings(old, "text", "doc_id"), new, "text", "doc_id"
    )
    rebuilt = search.build_postings(docs, "text", "doc_id")
    assert sorted(map(tuple, appended.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    bm_a = sorted(map(tuple, search.bm25_topk(
        docs, "text", "doc_id", QUERIES, k=10, postings=appended).collect()))
    bm_b = sorted(map(tuple, search.bm25_topk(
        docs, "text", "doc_id", QUERIES, k=10, postings=rebuilt).collect()))
    assert bm_a == bm_b


def test_keyword_filter_modes(spark):
    rows = [
        (1, "solar panel efficiency"),
        (2, "solar energy only"),
        (3, "wind turbine blades"),
        (4, "panel panel panel"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got_all = sorted(
        r["doc_id"]
        for r in search.keyword_filter(docs, "text", "doc_id", "solar panel").collect()
    )
    assert got_all == [1]
    got_any = sorted(
        r["doc_id"]
        for r in search.keyword_filter(
            docs, "text", "doc_id", "solar panel", mode="any"
        ).collect()
    )
    assert got_any == [1, 2, 4]
    # via the shared index, identical results
    post = search.build_postings(docs, "text", "doc_id")
    got_idx = sorted(
        r["doc_id"]
        for r in search.keyword_filter(
            docs, "text", "doc_id", "solar panel", postings=post
        ).collect()
    )
    assert got_idx == got_all
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search.keyword_filter(docs, "text", "doc_id", "x", mode="phrase")


PHRASES = [(0, "hash join"), (1, "window agg"), (2, "fast table value"),
           (3, "table table")]


def _duck_phrase_rows(con):
    rows = []
    for qid, phrase in PHRASES:
        terms = search.tokenize_phrase(phrase)
        joins, cur = [], "c0.positions"
        for i, t in enumerate(terms[1:], 1):
            joins.append(
                f"JOIN pp c{i} ON c{i}.doc_id = c0.doc_id AND c{i}.term = '{t}'"
            )
            cur = f"list_intersect(list_transform({cur}, x -> x + 1), c{i}.positions)"
        rows += con.execute(f"""
        WITH pp AS (
          SELECT doc_id, t.term, list_sort(list(t.i)) AS positions
          FROM (SELECT doc_id, {TOK} AS toks FROM documents) d,
               LATERAL (SELECT toks[CAST(i AS INT)] AS term, CAST(i AS INT) AS i
                        FROM unnest(generate_series(1, len(toks))) AS s(i)) t
          GROUP BY doc_id, t.term
        )
        SELECT CAST({qid} AS BIGINT) AS query_id, c0.doc_id,
               CAST(len({cur}) AS INT) AS n
        FROM pp c0 {' '.join(joins)}
        WHERE c0.term = '{terms[0]}' AND len({cur}) > 0
        """).fetchall()
    return sorted(map(tuple, rows))


def test_phrase_search_matches_duckdb(spark, duck):
    """Positional phrase retrieval (r7): the intersect-shifted-
    positions fold matches an independent DuckDB positional twin,
    including repeated-term phrases and occurrence counts."""
    got = sorted(map(tuple, search.phrase_search(
        _docs(spark), "text", "doc_id", PHRASES).collect()))
    assert got == _duck_phrase_rows(duck)
    assert len(got) > 0


def test_phrase_search_semantics(spark):
    rows = [
        (1, "alpha beta gamma alpha beta"),
        (2, "beta alpha"),
        (3, "alpha gamma beta"),
        (4, "echo echo echo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["query_id"], r["doc_id"]): r["n_occurrences"]
        for r in search.phrase_search(
            docs, "text", "doc_id", [(0, "alpha beta"), (1, "echo echo")]
        ).collect()
    }
    # consecutive + ordered: doc 1 twice, docs 2/3 never
    assert got[(0, 1)] == 2 and (0, 2) not in got and (0, 3) not in got
    # repeated-term phrase: "echo echo echo" holds two overlapping hits
    assert got[(1, 4)] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search.phrase_search(docs, "text", "doc_id", [(0, "  ")])
    # shared positional index path is identical
    pp = search.build_positional_postings(docs, "text", "doc_id")
    got_idx = {
        (r["query_id"], r["doc_id"]): r["n_occurrences"]
        for r in search.phrase_search(
            docs, "text", "doc_id", [(0, "alpha beta"), (1, "echo echo")],
            postings=pp,
        ).collect()
    }
    assert got_idx == got


def test_collocations_matches_duckdb(spark, duck):
    """Bigram collocation mining (r7): counts and the transcendental-
    free lift score match an independent DuckDB twin bitwise; the
    terms= restriction equals post-filtering."""
    got = sorted(map(tuple, search.collocations(
        _docs(spark), "text", "doc_id", min_count=5).collect()))
    want = sorted(map(tuple, duck.execute(f"""
    WITH t AS (SELECT {TOK} AS toks FROM documents),
    uni AS (SELECT u.w, count(*) AS c FROM t, unnest(toks) AS u(w) GROUP BY u.w),
    tot AS (SELECT sum(c) AS n FROM uni),
    bi AS (
      SELECT toks[CAST(i AS INT)] AS a, toks[CAST(i AS INT) + 1] AS b
      FROM t, unnest(generate_series(1, len(toks) - 1)) AS s(i)
      WHERE len(toks) >= 2
    ),
    pairs AS (SELECT a, b, count(*) AS c_ab FROM bi GROUP BY a, b
              HAVING count(*) >= 5)
    SELECT p.a, p.b, p.c_ab, ua.c AS c_a, ub.c AS c_b,
           CAST(p.c_ab * CAST((SELECT n FROM tot) AS BIGINT) AS DOUBLE)
             / (ua.c * ub.c) AS lift
    FROM pairs p JOIN uni ua ON ua.w = p.a JOIN uni ub ON ub.w = p.b
    """).fetchall()))
    assert got == want and len(got) > 0
    sub = sorted(map(tuple, search.collocations(
        _docs(spark), "text", "doc_id", min_count=5,
        terms=["hash", "join"]).collect()))
    assert sub == [r for r in got if r[0] in ("hash", "join")]


def test_collocations_rank_planted_pair(spark):
    """A planted always-adjacent pair out-lifts an incidental one."""
    rows = [(i, "alpha beta filler%d common words common" % i) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r["a"], r["b"]): r["lift"] for r in search.collocations(
        docs, "text", "doc_id", min_count=2).collect()}
    assert got[("alpha", "beta")] > got[("words", "common")]


def test_postings_from_positional_equals_build(spark):
    """The flat index derived from the positional one is bit-identical
    (rows AND schema) to build_postings — one corpus tokenization can
    serve every retriever."""
    docs = _docs(spark)
    pos = search.build_positional_postings(docs, "text", "doc_id")
    derived = search.postings_from_positional(pos, "doc_id")
    built = search.build_postings(docs, "text", "doc_id")
    # same names and types (nullability flags differ: count() is
    # non-null, the derived sum is nullable — value-irrelevant)
    assert derived.schema.simpleString() == built.schema.simpleString()
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, built.collect())
    )


def test_best_snippet_matches_duckdb(spark, duck):
    """Snippet extraction (r7): the exact max-distinct-terms window and
    its sliced text match an independent DuckDB twin."""
    W = 12
    got = sorted(map(tuple, search.best_snippet(
        _docs(spark), "text", "doc_id", QUERIES, window=W).collect()))
    qterms = {qid: search.tokenize_query(q) for qid, q in QUERIES}
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in qterms.items() for t in ts
    )
    want = sorted(map(tuple, duck.execute(f"""
    WITH pp AS (
      SELECT doc_id, t.term, CAST(t.i AS INT) AS pos
      FROM (SELECT doc_id, {TOK} AS toks FROM documents) d,
           LATERAL (SELECT toks[CAST(i AS INT)] AS term, i
                    FROM unnest(generate_series(1, len(toks))) AS s(i)) t
    ), q(query_id, term) AS (VALUES {qvals}),
    m AS (SELECT q.query_id, p.doc_id, p.term, p.pos
          FROM pp p JOIN q USING (term)),
    wins AS (
      SELECT a.query_id, a.doc_id, a.pos AS s,
             count(DISTINCT b.term) AS n_terms
      FROM m a JOIN m b
        ON b.query_id = a.query_id AND b.doc_id = a.doc_id
       AND b.pos >= a.pos AND b.pos <= a.pos + {W - 1}
      GROUP BY a.query_id, a.doc_id, a.pos
    ),
    best AS (
      SELECT query_id, doc_id, CAST(s AS INT) AS snippet_start,
             CAST(n_terms AS INT) AS n_terms,
             row_number() OVER (PARTITION BY query_id, doc_id
                                ORDER BY n_terms DESC, s) AS r
      FROM wins QUALIFY r = 1
    )
    SELECT b.query_id, b.doc_id, b.snippet_start, b.n_terms,
           array_to_string(toks[b.snippet_start : b.snippet_start + {W - 1}], ' ')
    FROM best b JOIN (SELECT doc_id, {TOK} AS toks FROM documents) d
      USING (doc_id)
    """).fetchall()))
    assert got == want and len(got) > 0


def test_best_snippet_semantics(spark):
    rows = [(1, "x x x alpha x x beta gamma x x x x x x x x alpha x")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = search.best_snippet(
        docs, "text", "doc_id", [(0, "alpha beta gamma")], window=5
    ).collect()
    (r,) = got
    # the window starting at the first 'alpha' (pos 4) covers all 3
    assert r["snippet_start"] == 4 and r["n_terms"] == 3
    assert r["snippet"] == "alpha x x beta gamma"


def test_expand_query_terms_from_collocations(spark):
    rows = [(i, "solar panel array on roof . solar panel array again") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    colloc = search.collocations(docs, "text", "doc_id", min_count=2)
    out = search.expand_query_terms(colloc, [(0, "solar")], top_m=1)
    assert out == [(0, "solar panel")]  # top-lift right partner
    # expansion terms never duplicate existing query vocabulary
    out2 = search.expand_query_terms(colloc, [(1, "solar panel")], top_m=2)
    qid, text = out2[0]
    toks = text.split()
    assert len(toks) == len(set(toks))
