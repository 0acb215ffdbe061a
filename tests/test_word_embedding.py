"""In-engine trained word embeddings (N6's learned half, r13):
engine-fit ≡ DuckDB-twin-fit bit parity, the real-learned-encoder run
through the ``text_embedding(model_fn=)`` seam, the relational
(oracle-hashable) encoder's exact agreement with the seam, and the
learned geometry actually fitting the co-occurrence targets."""

import math
from decimal import Decimal

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.word_embedding import (
    WE_CONFIG,
    embed_documents,
    fit_word_embedding,
    fit_word_embedding_frames,
    fit_word_embedding_twin,
    trained_model_fn,
    word_vectors_df,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return fit_word_embedding(docs, "text")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    yield con
    con.close()


def test_engine_fit_bit_equals_duckdb_twin(model, duck):
    """The cross-engine content of the fit is the co-occurrence
    counts: Spark's two-pass bigram counts and DuckDB's list_zip
    counts feed the SAME _descend, so every loss and every vector
    component must be bit-equal — a single differing count would
    change the trajectory."""
    twin = fit_word_embedding_twin(duck, "documents", "text")
    assert twin.vocab == model.vocab
    assert twin.losses == model.losses
    assert twin.U == model.U and twin.C == model.C


def test_descent_actually_learns(model):
    """Loss must fall ~50x (measured: 10643 -> ~200 at these
    defaults) — i.e. the vectors carry learned structure, not init
    noise."""
    assert model.losses[0] > 50 * model.losses[-1]
    assert all(isinstance(x, Decimal) for x in model.losses)
    # vectors moved away from init and are distinct per token
    mats = {tuple(map(float, v)) for v in model.U.values()}
    assert len(mats) == len(model.vocab)


def test_seam_runs_real_learned_encoder(spark, docs, model):
    """N6 end-to-end: the trained encoder goes through the
    text_embedding(model_fn=) seam (Arrow-batched), and the output is
    bit-equal to the same encoder applied driver-side (the
    attention-kernel precedent: one shared numpy arithmetic)."""
    from deep_db_learning_spark.operators.embedder import text_embedding

    sample = docs.orderBy("doc_id").limit(25)
    out = text_embedding(
        sample, "text", dim=model.dim, model_fn=trained_model_fn(model)
    )
    rows = out.select("doc_id", "text", "text_emb").collect()
    enc = trained_model_fn(model)
    ref = enc([r["text"] for r in rows])
    got = np.array([r["text_emb"] for r in rows])
    assert np.array_equal(ref, got)
    # the embeddings are non-trivial: distinct docs -> distinct vectors
    assert len({tuple(v) for v in got}) == len(rows)


def test_relational_encoder_matches_seam(spark, docs, model):
    """embed_documents (exact-decimal fold, the oracle path) and the
    seam encoder (float64 sum in token order) agree to 1e-9 — same
    vectors, same tokens, different-but-equivalent accumulation."""
    sample = docs.orderBy("doc_id").limit(25)
    rel = {
        r["doc_id"]: np.array(r["embedding"])
        for r in embed_documents(sample, model).collect()
    }
    enc = trained_model_fn(model)
    rows = sample.select("doc_id", "text").collect()
    ref = enc([r["text"] for r in rows])
    for i, r in enumerate(rows):
        assert np.allclose(rel[r["doc_id"]], ref[i], atol=1e-9)


def test_relational_encoder_matches_duckdb_inlined_vectors(
    spark, docs, model, duck
):
    """The driver-slot recipe in miniature: the fit vectors inlined as
    DECIMAL literals, DuckDB re-pools per document with an
    order-independent DECIMAL SUM — every component bit-equal to the
    engine's exact fold after the shared decimal->double cast."""
    vlit = ", ".join(
        f"('{t}', {k}, {model.U[t][k]})"
        for t in model.vocab
        for k in range(model.dim)
    )
    q = f"""
        WITH wv(tok, k, w) AS (
          SELECT tok, k, CAST(w AS DECIMAL(30,9))
          FROM (VALUES {vlit}) AS t(tok, k, w)
        ), toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
          FROM documents WHERE doc_id < 25
        ), comp AS (
          SELECT doc_id, k, CAST(sum(w) AS DOUBLE) AS s
          FROM toks JOIN wv USING (tok)
          GROUP BY doc_id, k
        )
        SELECT doc_id, k, s FROM comp ORDER BY doc_id, k
    """
    duck_rows = {(d, k): s for d, k, s in duck.execute(q).fetchall()}
    rel = embed_documents(docs.filter(F.col("doc_id") < 25), model).collect()
    for r in rel:
        for k, v in enumerate(r["embedding"]):
            assert duck_rows[(r["doc_id"], k)] == v


def test_geometry_reflects_cooccurrence(model):
    """The factorization target is log1p(n_ab): for the most frequent
    pair the learned u·c must land near its target and far above the
    score of a never-co-occurring pair — learned geometry, not
    hashing."""
    # re-derive counts from the model's own fit inputs via the twin
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    pairs = con.execute(
        """
        SELECT p[1] AS a, p[2] AS b, count(*) AS n
        FROM (SELECT unnest(list_zip(l, l[2:])) AS p FROM (
          SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS l
          FROM documents))
        WHERE p[2] IS NOT NULL GROUP BY 1, 2 ORDER BY n DESC
        """
    ).fetchall()
    con.close()
    seen = {(a, b) for a, b, _ in pairs}
    voc = set(model.vocab)
    # most frequent IN-VOCAB pair (the global top pair could straddle
    # the top-V cut when >V tokens share high counts)
    top_a, top_b, top_n = next(
        (a, b, n) for a, b, n in pairs if a in voc and b in voc
    )

    def score(a, b):
        return float(sum(x * y for x, y in zip(model.U[a], model.C[b])))

    target = math.log1p(top_n)
    assert abs(score(top_a, top_b) - target) < 0.5 * target
    # a pair never observed together should score well below the top
    unseen = next(
        (a, b)
        for a in model.vocab
        for b in model.vocab
        if (a, b) not in seen
    )
    assert score(*unseen) < 0.5 * score(top_a, top_b)


def test_word_vectors_df_schema(spark, model):
    wv = word_vectors_df(spark, model)
    assert wv.columns == ["tok", "k", "w"]
    assert wv.count() == len(model.vocab) * model.dim
    assert "decimal(30,9)" in dict(wv.dtypes)["w"]


def test_streamed_counts_refit_bit_equals_batch_fit(spark, docs, model, tmp_path):
    """Streaming half (r13): four RANDOM-split micro-batches of the
    corpus maintain the co-occurrence store incrementally; the refit
    from the merged counts is BIT-EQUAL to the batch fit over the
    whole corpus — counts are a function of the document multiset
    alone, so batch boundaries cannot leak into the model."""
    from pyspark.sql import functions as F

    from deep_db_learning_spark.streaming.embedding_stream import (
        refit_from_store,
        stream_docs_into_cooc_store,
    )

    d = docs.select("doc_id", "text")
    in_dir = str(tmp_path / "in")
    # 4 deterministic pseudo-random batches (md5 of doc_id)
    part = F.abs(F.hash(F.col("doc_id").cast("string"))) % 4
    for i in range(4):
        d.filter(part == i).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_docs_into_cooc_store(
        stream, str(tmp_path / "cooc"), str(tmp_path / "ck")
    )
    q.awaitTermination(180)

    streamed = refit_from_store(spark, str(tmp_path / "cooc"))
    assert streamed.vocab == model.vocab
    assert streamed.losses == model.losses
    assert streamed.U == model.U and streamed.C == model.C
    assert streamed.n_pairs == model.n_pairs


def test_lsm_cooc_store_refit_bit_equals_batch_fit(spark, docs, model, tmp_path):
    """r14 (VERDICT r13 task 7): the LSM maintenance mode —
    delta-per-batch with compaction every K — produces counts (and so
    a refit) BIT-EQUAL to the batch fit, mid-compaction-cycle: with 5
    batches and compact_every=2, the final state is a compacted base
    PLUS one live staged delta, so the merge-on-read path is
    genuinely exercised."""
    import os

    from pyspark.sql import functions as F

    from deep_db_learning_spark.streaming.embedding_stream import (
        _staged_deltas,
        refit_from_store,
        stream_docs_into_cooc_store,
    )
    from deep_db_learning_spark.streaming.node_store import SnapshotStore

    d = docs.select("doc_id", "text")
    in_dir = str(tmp_path / "in")
    part = F.abs(F.hash(F.col("doc_id").cast("string"))) % 5
    for i in range(5):
        d.filter(part == i).coalesce(1).write.mode("append").parquet(in_dir)

    store_path = str(tmp_path / "cooc_lsm")
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_docs_into_cooc_store(
        stream, store_path, str(tmp_path / "ck"), compact_every=2
    )
    q.awaitTermination(180)

    # shape check: base was compacted (batches 0-1, 2-3) and batch 4's
    # delta is still staged — merge-on-read must fold it in
    store = SnapshotStore(store_path)
    cur = store.last_batch_id()
    live = [bid for bid, _ in _staged_deltas(store_path) if bid > cur]
    assert cur == 3 and live == [4]

    streamed = refit_from_store(spark, store_path)
    assert streamed.vocab == model.vocab
    assert streamed.losses == model.losses
    assert streamed.U == model.U and streamed.C == model.C
    assert streamed.n_pairs == model.n_pairs

    # replay with a lost checkpoint: the base cursor swallows old
    # batches and the staged delta's path-identity swallows batch 4 —
    # counts must be unchanged (no double counting)
    import shutil

    shutil.rmtree(str(tmp_path / "ck"))
    stream2 = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q2 = stream_docs_into_cooc_store(
        stream2, store_path, str(tmp_path / "ck2"), compact_every=2
    )
    q2.awaitTermination(180)
    replayed = refit_from_store(spark, store_path)
    assert replayed.U == model.U and replayed.losses == model.losses
    assert os.path.isdir(os.path.join(store_path, "_deltas"))


def test_windowed_streamed_counts_refit_matches_batch(spark, docs, tmp_path):
    """Window-2 maintenance: distance kinds ('pair', 'pair2') stream
    through the store and the windowed refit is bit-equal to the
    window-2 batch fit."""
    from pyspark.sql import functions as F

    from deep_db_learning_spark.streaming.embedding_stream import (
        refit_from_store,
        stream_docs_into_cooc_store,
    )

    d = docs.select("doc_id", "text")
    batch = fit_word_embedding(d, "text", vocab_size=24, epochs=2, window=2)
    in_dir = str(tmp_path / "in")
    part = F.abs(F.hash(F.col("doc_id").cast("string"))) % 3
    for i in range(3):
        d.filter(part == i).coalesce(1).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_docs_into_cooc_store(
        stream,
        str(tmp_path / "cooc_w2"),
        str(tmp_path / "ck"),
        window=2,
        compact_every=2,
    )
    q.awaitTermination(180)
    streamed = refit_from_store(
        spark, str(tmp_path / "cooc_w2"), vocab_size=24, epochs=2, window=2
    )
    assert streamed.vocab == batch.vocab
    assert streamed.losses == batch.losses
    assert streamed.U == batch.U and streamed.C == batch.C


def test_leading_whitespace_pairs_match_twin(spark):
    """r13 review regression: text beginning with a TAB/newline used
    to double-count the first pair and drop alternating ones (Spark
    trim strips only spaces, so the two-pass bigram anchor missed) —
    the engine fit must stay bit-equal to the DuckDB twin on such
    corpora."""
    import duckdb

    rows = [(0, "\ta b c"), (1, "\n\n b c a b"), (2, "  a c  b  ")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    m = fit_word_embedding(docs, "text", dim=4, vocab_size=8, epochs=2)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows).replace("\t", "' || chr(9) || '").replace("\n", "' || chr(10) || '")
        + ") AS t(doc_id, text)"
    )
    t = fit_word_embedding_twin(con, "d", "text", dim=4, vocab_size=8, epochs=2)
    con.close()
    assert t.vocab == m.vocab
    assert t.losses == m.losses and t.U == m.U
    # ground truth pair multiset: (a,b),(b,c) / (b,c),(c,a),(a,b) / (a,c),(c,b)
    assert m.n_pairs == len({("a","b"),("b","c"),("c","a"),("a","c"),("c","b")})


# ---------------------------------------------------------------------------
# r14: frame-resident descent + window-k / 1-over-d weighting
# (VERDICT r13 task 3)
# ---------------------------------------------------------------------------


def test_pairs_d_df_distance1_equals_regex_pairs(spark):
    """The zip-shift pair extractor at d=1 produces the SAME pair
    multiset as the two-pass regex trick — including on tab/newline-
    leading documents (the r13 edge)."""
    from deep_db_learning_spark.operators.word_embedding import (
        _pairs_d_df,
        _pairs_df,
    )

    rows = [
        (0, "\ta b c d"),
        (1, "x y"),
        (2, "solo"),
        (3, ""),
        (4, None),
        (5, "a  b\tc\nd a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    zip_pairs = sorted(
        map(
            tuple,
            _pairs_d_df(docs, "text", 1).select("a", "b").collect(),
        )
    )
    regex_pairs = sorted(map(tuple, _pairs_df(docs, "text").collect()))
    assert zip_pairs == regex_pairs and len(zip_pairs) > 0


def test_pairs_d_df_window3_ground_truth(spark):
    """Distance-tagged pairs of a known sentence: token i pairs with
    token i+d for every d in 1..window, nothing else."""
    from deep_db_learning_spark.operators.word_embedding import _pairs_d_df

    docs = spark.createDataFrame([(0, "a b c d")], "doc_id bigint, text string")
    got = sorted(
        map(tuple, _pairs_d_df(docs, "text", 3).collect())
    )
    want = sorted(
        [
            ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
            ("a", "c", 2), ("b", "d", 2),
            ("a", "d", 3),
        ]
    )
    assert got == want


def test_frames_fit_bit_equals_driver_fit_window1(spark, docs):
    """The frame-resident descent IS the driver descent: identical
    vocab, per-epoch losses, and every U/C component bit-equal, at
    the default window."""
    sub = docs.limit(120)
    m_drv = fit_word_embedding(sub, "text", vocab_size=24, epochs=3)
    m_frm = fit_word_embedding_frames(sub, "text", vocab_size=24, epochs=3)
    assert m_frm.vocab == m_drv.vocab
    assert m_frm.losses == m_drv.losses
    assert m_frm.U == m_drv.U and m_frm.C == m_drv.C
    assert m_frm.n_pairs == m_drv.n_pairs


def test_frames_fit_bit_equals_driver_fit_window3(spark, docs, duck):
    """Window-3 with GloVe 1/d weighting: driver fit, frame fit, and
    DuckDB twin all produce the bit-identical model (the weighted
    targets share one float fold, d ascending)."""
    sub = docs.where(F.col("doc_id") < 120)
    kw = dict(vocab_size=24, epochs=3, window=3)
    m_drv = fit_word_embedding(sub, "text", **kw)
    m_frm = fit_word_embedding_frames(sub, "text", **kw)
    assert m_frm.vocab == m_drv.vocab
    assert m_frm.losses == m_drv.losses
    assert m_frm.U == m_drv.U and m_frm.C == m_drv.C
    twin = fit_word_embedding_twin(
        duck,
        "(SELECT * FROM documents WHERE doc_id < 120)",
        "text",
        **kw,
    )
    assert twin.vocab == m_drv.vocab
    assert twin.losses == m_drv.losses
    assert twin.U == m_drv.U and twin.C == m_drv.C


def test_window_weighting_changes_targets(docs):
    """1/d weighting is real: a window-3 fit differs from window-1
    (same corpus, same vocab) — distance-2/3 pairs contribute."""
    sub = docs.limit(120)
    m1 = fit_word_embedding(sub, "text", vocab_size=24, epochs=2)
    m3 = fit_word_embedding(sub, "text", vocab_size=24, epochs=2, window=3)
    assert m1.vocab == m3.vocab  # vocab is window-independent
    assert m1.U != m3.U  # but the fit sees more co-occurrence
    assert m3.n_pairs >= m1.n_pairs


def test_frame_fit_vocab_cap_is_loud():
    from deep_db_learning_spark.operators.word_embedding import (
        FRAME_MAX_VOCAB,
    )

    with pytest.raises(ValueError, match="FRAME_MAX_VOCAB"):
        fit_word_embedding_frames(
            None, "text", vocab_size=FRAME_MAX_VOCAB + 1
        )


def test_window_validation_is_loud(spark):
    from deep_db_learning_spark.operators.word_embedding import _pairs_d_df

    docs = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="window"):
        _pairs_d_df(docs, "text", 0)
    with pytest.raises(ValueError, match="window"):
        fit_word_embedding_twin(None, "d", "text", window=0)
