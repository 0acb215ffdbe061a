"""r14 optimization parity pins.

Each r14 plan change has two physical shapes (below/above a broadcast
gate, with/without a shared token frame, fused/unfused stats). These
pins hold the shapes to IDENTICAL results, so a future gate retune
cannot silently change an answer.
"""

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def edges(spark):
    # a small dense-ish graph with triangles and multiplicity
    raw = [
        (a, b)
        for a in range(1, 30)
        for b in range(1, 30)
        if a != b and (a * 7 + b * 3) % 5 == 0
    ]
    return spark.createDataFrame(raw + raw[:10], "a bigint, b bigint")


def test_triangle_probe_shapes_agree(spark, edges, monkeypatch):
    from deep_db_learning_spark.operators import triangles as T

    monkeypatch.setattr(T, "BROADCAST_MAX_EDGES", 10**9)
    bcast = _rows(T.triangle_stats(edges))
    # force the above-gate fallback: shuffled semi on the packed key
    monkeypatch.setattr(T, "BROADCAST_MAX_EDGES", 0)
    shuffled = _rows(T.triangle_stats(edges))
    assert bcast == shuffled
    assert len(bcast) > 0


def test_kcore_broadcast_gate_agree(spark, edges, monkeypatch):
    from deep_db_learning_spark.operators import kcore as K

    monkeypatch.setattr(K, "BROADCAST_MAX_NODES", 10**9)
    bcast = _rows(K.k_core(edges, 3))
    monkeypatch.setattr(K, "BROADCAST_MAX_NODES", 0)
    shuffled = _rows(K.k_core(edges, 3))
    assert bcast == shuffled
    assert len(bcast) > 0


def test_pagerank_broadcast_gate_bit_equal(spark, monkeypatch):
    from deep_db_learning_spark.operators import pagerank as P

    edges = spark.createDataFrame(
        [(i, (i * 3) % 7) for i in range(20)], "src bigint, dst bigint"
    )
    nodes = spark.range(0, 25).select(F.col("id").alias("node"))
    monkeypatch.setattr(P, "BROADCAST_MAX_NODES", 10**9)
    bcast = _rows(P.pagerank(edges, nodes, iters=3))
    monkeypatch.setattr(P, "BROADCAST_MAX_NODES", 0)
    shuffled = _rows(P.pagerank(edges, nodes, iters=3))
    # integer trajectory: exact equality including the double render
    assert bcast == shuffled


def test_cooccurrence_canonical_tag_identity(spark):
    from deep_db_learning_spark.operators import triangles as T

    facts = spark.createDataFrame(
        [(g, i) for g in range(8) for i in range(g % 5 + 2)]
        + [(0, 1), (0, 1)],  # duplicate fact rows
        "g bigint, i bigint",
    )
    edges, _hot = T.cooccurrence_edges(facts, "g", "i")
    assert edges.__dict__.get("_ddl_canonical_form") is True
    cut = T.canonical_cut(edges)
    # the tag-fast-path must equal the full re-canonicalization
    edges2, _ = T.cooccurrence_edges(facts, "g", "i")
    full = T._canonical_und(edges2)
    assert _rows(cut) == _rows(full)


def test_word_embedding_shared_tokens_bit_equal(spark):
    from deep_db_learning_spark.checkpoint import cut_lineage
    from deep_db_learning_spark.operators import word_embedding as W

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),
            (2, "beta\tgamma  delta\nalpha"),
            (3, "gamma gamma beta alpha delta epsilon"),
            (4, None),
            (5, "   "),
        ],
        "doc_id bigint, text string",
    )
    toks = cut_lineage(
        docs.select("doc_id", W._tokens_col("text").alias("__t")),
        eager=True,
    )
    base = W.fit_word_embedding(docs, "text", window=2)
    shared = W.fit_word_embedding(docs, "text", window=2, tokens=toks)
    assert base.vocab == shared.vocab
    assert base.U == shared.U and base.C == shared.C
    emb_base = _rows(W.embed_documents(docs, base))
    emb_shared = _rows(W.embed_documents(docs, shared, tokens=toks))
    assert emb_base == emb_shared


def test_bm25_fused_stats_bit_equal(spark):
    from deep_db_learning_spark.operators import search as S

    docs = spark.createDataFrame(
        [
            (1, "hash join spark engine"),
            (2, "window agg stream hash"),
            (3, "spark spark hash table scan"),
            (4, "unrelated words entirely here"),
        ],
        "doc_id bigint, text string",
    )
    queries = [(0, "hash join"), (1, "spark table")]
    postings = S.build_postings(docs, "text", "doc_id")
    fused = _rows(
        S.bm25_topk(docs, "text", "doc_id", queries, k=3, postings=postings)
    )
    # the unfused reference path: no standing index passed
    plain = _rows(S.bm25_topk(docs, "text", "doc_id", queries, k=3))
    assert fused == plain
    assert len(fused) > 0


def test_ranked_union_cut_matches_separate_topk(spark):
    # r14 late: q_text_search materializes the bm25+jaccard top-k as
    # ONE mode-tagged union cut; each branch's rank window runs BEFORE
    # the union, so the rows must equal the two separate top-k frames.
    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators import search as S

    docs = spark.createDataFrame(
        [
            (1, "hash join spark engine"),
            (2, "window agg stream hash"),
            (3, "spark spark hash table scan"),
            (4, "unrelated words entirely here"),
            (5, "join join table window"),
        ],
        "doc_id bigint, text string",
    )
    queries = [(0, "hash join"), (1, "spark table"), (2, "window agg")]
    postings = S.build_postings(docs, "text", "doc_id")
    bm = S.bm25_topk(docs, "text", "doc_id", queries, k=3, postings=postings)
    ja = S.jaccard_topk(docs, "text", "doc_id", queries, k=3, postings=postings)
    fused = (
        bm.select(F.lit("bm25").alias("mode"), "query_id", "doc_id", "rank", "score")
        .unionByName(
            ja.select(F.lit("jacc").alias("mode"), "query_id", "doc_id", "rank", "score")
        )
    )
    got_bm = _rows(fused.filter("mode = 'bm25'").drop("mode"))
    got_ja = _rows(fused.filter("mode = 'jacc'").drop("mode"))
    assert got_bm == _rows(bm)
    assert got_ja == _rows(ja)
    assert len(got_bm) > 0 and len(got_ja) > 0


def test_cross_corpus_candidates_are_parity_slice(spark):
    # r14 late: q_minhash_dedup derives the cross-corpus (new=odd,
    # ref=even) candidate set as a parity slice of the intra-corpus
    # lsh_candidate_pairs frame — identical signatures band to
    # identical buckets, so the two sets must be equal, and the
    # dedup-against result must be identical through both paths.
    from pyspark.sql import functions as F

    from deep_db_learning_spark.operators import dedup as D

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long trip",
        "sphinx of black quartz judge my vow said the old teacher",
    ]
    rows = []
    for i in range(24):
        t = base[i % 3]
        if i % 4 == 0:
            t = t + " extra tail words"
        rows.append((i, t))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    signed = D.minhash_signature(docs, "text", 64, 9)
    cand_all = D.lsh_candidate_pairs(signed, "doc_id", bands=16)
    odd_a = F.col("id_a") % 2 == 1
    derived = cand_all.filter(
        (F.col("id_a") % 2) != (F.col("id_b") % 2)
    ).select(
        F.when(odd_a, F.col("id_a")).otherwise(F.col("id_b")).alias("__new_id"),
        F.when(odd_a, F.col("id_b")).otherwise(F.col("id_a")).alias("__ref_id"),
    )
    store = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    sig_new = signed.filter(F.col("doc_id") % 2 == 1)
    sig_ref = signed.filter(F.col("doc_id") % 2 == 0)
    b_new = D._banded_buckets(sig_new, "doc_id", "signature", 16).withColumnRenamed(
        "doc", "__new_id"
    )
    b_ref = D._banded_buckets(
        sig_ref.select(F.col("doc_id").alias("__ref_id"), "signature"),
        "__ref_id",
        "signature",
        16,
    ).withColumnRenamed("doc", "__ref_id")
    direct = (
        b_new.join(b_ref, ["band", "bucket"])
        .select("__new_id", "__ref_id")
        .distinct()
    )
    assert _rows(derived.distinct()) == _rows(direct)
    assert len(_rows(derived)) > 0
    kept_direct = D.minhash_dedup_against(
        new, store, "text", "doc_id", num_perm=64, bands=16, shingle_k=9,
        threshold=0.7, new_signed=sig_new, ref_signed=sig_ref,
    )
    kept_sliced = D.minhash_dedup_against(
        new, store, "text", "doc_id", num_perm=64, bands=16, shingle_k=9,
        threshold=0.7, candidates=derived,
    )
    assert _rows(kept_sliced) == _rows(kept_direct)
