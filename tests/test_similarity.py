from pyspark.sql import functions as F

from deep_db_learning_spark.operators import similarity


def _queries(db, n=3):
    return (
        db.df("embeddings")
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_brute_force_topk_matches_duckdb(db, duck):
    out = similarity.brute_force_topk(db.df("embeddings"), _queries(db), k=5)
    got = {(r["query_id"], r["vec_id"], r["rank"]) for r in out.collect()}
    want = set(
        duck.execute(
            """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS sim
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rank
              FROM sims
            )
            SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5
            """
        ).fetchall()
    )
    assert got == want
    # each query's own vector ranks first with sim 1.0
    firsts = {r["query_id"]: (r["vec_id"], r["sim"]) for r in out.collect() if r["rank"] == 1}
    for qid, (vid, sim) in firsts.items():
        assert vid == qid and abs(sim - 1.0) < 1e-6


def test_lsh_topk_recall(db):
    brute = similarity.brute_force_topk(db.df("embeddings"), _queries(db, 10), k=10)
    approx = similarity.lsh_topk(
        db.df("embeddings"), _queries(db, 10), k=10, n_planes=4, multiprobe=2
    )
    b = {(r["query_id"], r["vec_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    # approximate index must hit a reasonable fraction of true neighbors
    assert recall >= 0.3, recall
    # and every returned pair must be a genuine corpus member
    assert all(x[1] >= 0 for x in a)


def test_lsh_buckets_deterministic(db):
    h1 = similarity.random_hyperplane_lsh(db.df("embeddings"), n_planes=6)
    h2 = similarity.random_hyperplane_lsh(db.df("embeddings"), n_planes=6)
    a = {(r["vec_id"], r["bucket"]) for r in h1.select("vec_id", "bucket").collect()}
    b = {(r["vec_id"], r["bucket"]) for r in h2.select("vec_id", "bucket").collect()}
    assert a == b
    n_buckets = len({x[1] for x in a})
    assert 2 <= n_buckets <= 64


def test_embedding_neardup_exact_vs_lsh(spark):
    # construct exact near-dups: v and v scaled (cosine 1.0)
    base = [[0.1 * (i + j) for j in range(8)] for i in range(5)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows.append((100, [x * 2.0 for x in base[0]]))  # same direction as 0
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = similarity.embedding_neardup_pairs(df, threshold=0.9999, exact=True)
    got = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert (0, 100) in got
    lsh = similarity.embedding_neardup_pairs(df, threshold=0.9999, n_planes=4)
    got_lsh = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert (0, 100) in got_lsh  # same direction ⇒ same bucket always
    assert got_lsh <= got  # LSH can only miss, never invent


def test_ivf_topk_recall_vs_brute_force(db):
    from deep_db_learning_spark.operators.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
    )
    from pyspark.sql import functions as F

    emb = db.df("embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assigned, model = ivf_index(emb, n_lists=8)
    approx = ivf_topk(assigned, model, queries, k=5, n_probes=3)
    exact = brute_force_topk(emb, queries, k=5)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.4  # random vectors scatter; probes bound recall
    # the probed candidate set is strictly smaller than the corpus
    assert assigned.select("list_id").distinct().count() == 8


def test_semantic_search_finds_exact_document(db):
    from deep_db_learning_spark.operators.similarity import semantic_search

    docs = db.df("documents")
    sample = docs.limit(2).collect()
    queries = [r["text"] for r in sample]
    out = semantic_search(docs, queries, k=3)
    rows = out.collect()
    # rank 1 for each query is the document itself (identical encoder,
    # cosine 1.0)
    top = {r["query_idx"]: r for r in rows if r["rank"] == 1}
    for i, r in enumerate(sample):
        assert top[i]["doc_id"] == r["doc_id"]
        assert abs(top[i]["score"] - 1.0) < 1e-9
    # k results per query, scores non-increasing
    for qi in (0, 1):
        scores = [r["score"] for r in sorted(
            (r for r in rows if r["query_idx"] == qi), key=lambda r: r["rank"]
        )]
        assert len(scores) == 3 and scores == sorted(scores, reverse=True)


def test_topk_recall_column_and_goldens(db):
    # the recall column the ann_* driver queries emit: LSH recall is
    # fully deterministic (seeded hyperplanes), IVF within tolerance
    # (MLlib KMeans float reductions are partitioning-sensitive)
    import __spark_entry__ as entry

    lsh = entry.q_ann_lsh(db.spark, "/root/testdata/sf0.001")
    rows = {r["query_id"]: r["recall"] for r in lsh.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    # deterministic: same seeds -> bit-identical recall values
    again = {
        r["query_id"]: r["recall"]
        for r in entry.q_ann_lsh(db.spark, "/root/testdata/sf0.001").collect()
    }
    assert rows == again

    ivf = entry.q_ann_ivf(db.spark, "/root/testdata/sf0.001")
    ivf_rows = {r["query_id"]: r["recall"] for r in ivf.collect()}
    assert set(ivf_rows) == {0, 1, 2, 3, 4}
    # 3 of 8 lists probed: mean recall must clear the probe ratio
    assert sum(ivf_rows.values()) / 5 >= 0.4


def test_ivf_topk_distributed_probe_matches_broadcast(db):
    # the shuffle-join path (broadcast_threshold=0 forces it) must give
    # the same rows as the broadcast path — the old driver-side collect
    # is gone entirely
    from deep_db_learning_spark.operators.similarity import ivf_index, ivf_topk
    from pyspark.sql import functions as F

    emb = db.df("embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assigned, model = ivf_index(emb, n_lists=8)
    a = ivf_topk(assigned, model, queries, k=5, n_probes=3)
    b = ivf_topk(assigned, model, queries, k=5, n_probes=3, broadcast_threshold=0)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivf_deterministic_matches_numpy_twin(db):
    """The deterministic IVF fit's integer outcomes — final (vec_id →
    list_id) assignments — are reproduced bit-for-bit by the
    independent numpy/decimal twin (the basis of the ann_ivf oracle)."""
    from deep_db_learning_spark.operators.ivf_oracle import ivf_fit_assign
    from deep_db_learning_spark.operators.similarity import (
        ivf_index_deterministic,
    )

    sf_dir = "/root/testdata/sf0.001"
    assigned, model = ivf_index_deterministic(
        db.spark.read.parquet(f"{sf_dir}/embeddings.parquet"), n_lists=4, n_iters=3
    )
    got = {r["vec_id"]: r["list_id"] for r in assigned.select("vec_id", "list_id").collect()}
    twin, _probes = ivf_fit_assign(sf_dir, n_lists=4, n_iters=3)
    assert got == dict(twin)
    # centroids are genuinely fitted (more than one non-empty list)
    assert len(set(got.values())) > 1


def test_pq_roundtrip_deterministic_and_compresses(db):
    """Product quantization (r5): codebooks are (m, k, d/m), two runs
    produce identical codebooks and codes (seeded driver-side Lloyd,
    per-row argmin, lowest-index ties), and the encoded frame carries
    m ints instead of d floats."""
    import numpy as np

    from deep_db_learning_spark.operators.similarity import pq_encode, pq_train

    emb = db.df("embeddings")
    cb1 = pq_train(emb, m=8, k=16, sample=500, seed=42)
    cb2 = pq_train(emb, m=8, k=16, sample=500, seed=42)
    assert cb1.shape == (8, 16, 8)
    assert np.array_equal(cb1, cb2)

    enc = pq_encode(emb, cb1)
    rows = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert len(rows) == emb.count()
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in rows.values())
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb, cb1).collect()}
    assert rows == again


def test_pq_topk_recall_and_rerank(db):
    """ADC top-k recall against the exact L2 baseline, and the
    shortlist→refine pipeline: rerank re-scores k×factor ADC
    candidates with true vectors and must recover most of the exact
    set even on these near-random synthetic embeddings (PQ's worst
    case — no cluster structure to exploit)."""
    import numpy as np

    from deep_db_learning_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = db.df("embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cb = pq_train(emb, m=16, k=16, sample=500, seed=42)
    enc = pq_encode(emb, cb)

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], float)
    truth = {}
    for qr in queries.collect():
        qv = np.array(list(qr["embedding"]), float)
        d2 = ((X - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        truth[qr["query_id"]] = set(ids[order[:10]])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(got[q] & truth[q]) for q in truth) / (10 * len(truth))

    adc = pq_topk(enc, cb, queries, k=10)
    assert adc.groupBy("query_id").count().agg(F.max("count")).first()[0] == 10
    r_adc = recall(adc)
    assert r_adc >= 0.3  # measured 0.42 on this data
    rr = pq_topk(enc, cb, queries, k=10, rerank=emb, rerank_factor=8)
    r_rr = recall(rr)
    assert r_rr >= 0.8  # measured 0.88
    assert r_rr > r_adc
    # the refine stage's distances are EXACT L2: rank-1 hits must be
    # the true nearest neighbor
    top1 = {r["query_id"]: r["vec_id"] for r in rr.filter(F.col("rank") == 1).collect()}
    for q, t in truth.items():
        qv = np.array(list(X[ids == q][0]), float)
        d2 = ((X - qv) ** 2).sum(axis=1)
        assert top1[q] == ids[np.lexsort((ids, d2))[0]]


def test_ivf_pq_composed_pipeline(db):
    """The composed IVF-PQ path (r5): list pruning via the
    deterministic IVF quantizer, ADC over the probed lists' codes
    only, exact rerank of the shortlist. Recall is necessarily ≤ the
    all-lists PQ scan (probing misses lists) but must stay useful, and
    the candidate count per query must shrink by ~n_lists/n_probes."""
    import numpy as np

    from deep_db_learning_spark.operators.similarity import (
        ivf_index_deterministic,
        ivf_pq_topk,
        pq_encode,
        pq_train,
    )

    emb = db.df("embeddings")
    assigned, model = ivf_index_deterministic(emb, n_lists=8, n_iters=3)
    cb = pq_train(emb, m=16, k=16, sample=500, seed=42)
    enc = pq_encode(assigned, cb, extra_cols=("list_id",))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_pq_topk(
        enc, cb, model, queries, k=10, n_probes=4, rerank=emb, rerank_factor=8
    )
    assert out.groupBy("query_id").count().agg(F.min("count")).first()[0] == 10

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], float)
    truth = {}
    for qr in queries.collect():
        qv = np.array(list(qr["embedding"]), float)
        d2 = ((X - qv) ** 2).sum(axis=1)
        truth[qr["query_id"]] = set(ids[np.lexsort((ids, d2))[:10]])
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(len(got[q] & truth[q]) for q in truth) / (10 * len(truth))
    assert recall >= 0.5  # half the lists probed on near-random data
    # determinism: the whole pipeline reruns bit-identically
    out2 = ivf_pq_topk(
        enc, cb, model, queries, k=10, n_probes=4, rerank=emb, rerank_factor=8
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_ivf_pq_residual_uplift_and_twin(db, spark):
    """Residual IVF-PQ (r6 — the FAISS-IVFPQ formulation): encoding
    ``vec − coarse-centroid`` spends the same m×k codebook budget on
    within-list geometry. (a) On a CLUSTERED corpus (where the coarse
    quantizer captures real structure) ADC-only recall@10 at fixed m
    beats raw-vector IVF-PQ; (b) on the synthetic embeddings the full
    rerank pipeline is recomputed bit-for-bit by the independent
    ``pq_residual_oracle_rows`` twin."""
    import numpy as np

    from deep_db_learning_spark.operators.ivf_oracle import (
        pq_residual_oracle_rows,
    )
    from deep_db_learning_spark.operators.similarity import (
        ivf_index_deterministic,
        ivf_pq_topk,
        pq_encode,
        pq_train,
    )

    # (a) clustered corpus: 8 tight clusters, queries inside them
    rng = np.random.default_rng(7)
    n_clusters, per, d = 8, 250, 32
    centers = rng.uniform(-10, 10, size=(n_clusters, d))
    V = np.concatenate(
        [centers[c] + rng.normal(0, 0.8, size=(per, d)) for c in range(n_clusters)]
    )
    ids = np.arange(len(V))
    cemb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, V)],
        "vec_id bigint, embedding array<double>",
    )
    queries = cemb.filter(F.col("vec_id") % 250 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assigned, model = ivf_index_deterministic(cemb, n_lists=8, n_iters=5)
    cb = pq_train(cemb, m=8, k=16, sample=600, seed=42)
    enc = pq_encode(assigned, cb, extra_cols=("list_id",))
    raw = ivf_pq_topk(enc, cb, model, queries, k=10, n_probes=2)
    cbr = pq_train(assigned, m=8, k=16, sample=600, seed=42, residual_model=model)
    encr = pq_encode(assigned, cbr, extra_cols=("list_id",), residual_model=model)
    res = ivf_pq_topk(encr, cbr, model, queries, k=10, n_probes=2, residual=True)

    truth = {}
    for qr in queries.collect():
        qv = np.array(list(qr["embedding"]))
        d2 = ((V - qv) ** 2).sum(axis=1)
        truth[qr["query_id"]] = set(ids[np.lexsort((ids, d2))[:10]])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(got[q] & truth[q]) for q in truth) / (10 * len(truth))

    r_raw, r_res = recall(raw), recall(res)
    assert r_res > r_raw  # measured 0.2875 vs 0.225 at identical memory
    assert r_res >= 0.26

    # (b) twin parity on the driver-query shape (synthetic embeddings)
    emb = db.df("embeddings")
    q5 = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assigned2, model2 = ivf_index_deterministic(emb, n_lists=8, n_iters=5)
    cbr2 = pq_train(assigned2, m=16, k=16, sample=500, seed=42, residual_model=model2)
    encr2 = pq_encode(
        assigned2, cbr2, extra_cols=("list_id",), residual_model=model2
    )
    pqr = ivf_pq_topk(
        encr2, cbr2, model2, q5, k=5, n_probes=3,
        rerank=emb, rerank_factor=4, residual=True,
    )
    eng = sorted(
        (r["query_id"], r["vec_id"], r["rank"], r["dist"]) for r in pqr.collect()
    )
    twin = pq_residual_oracle_rows(
        "/root/testdata/sf0.001", m=16, k_codes=16, sample=500, seed=42,
        n_queries=5, k=5, rerank_factor=4, n_lists=8, n_iters_ivf=5, n_probes=3,
    )
    assert eng == sorted((q, v, r, s) for q, v, r, s, _h in twin)


def test_sq8_quantization_roundtrip_and_recall(db):
    """int8 scalar quantization (r5): 4x compression with per-dim
    symmetric scales, fully JVM-side (codegen, no UDF). Quantization
    error is bounded by half a step per dim, so cosine survives and
    recall@10 vs the exact baseline stays high; two runs identical."""
    from deep_db_learning_spark.operators.similarity import (
        brute_force_topk,
        sq8_encode,
        sq8_topk,
        sq8_train,
        topk_recall,
    )

    emb = db.df("embeddings")
    scales = sq8_train(emb)
    assert len(scales) == 64 and all(s > 0 for s in scales)
    assert scales == sq8_train(emb)

    enc = sq8_encode(emb, scales)
    assert dict(enc.dtypes)["codes"] == "array<tinyint>"
    row = enc.first()
    assert all(-127 <= c <= 127 for c in row["codes"])

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sq8_topk(enc, scales, queries, k=10)
    exact = brute_force_topk(emb, queries, k=10)
    rec = topk_recall(approx, exact)
    recalls = [r["recall"] for r in rec.collect()]
    assert len(recalls) == 5
    assert sum(recalls) / len(recalls) >= 0.8
    again = sq8_topk(enc, scales, queries, k=10)
    assert sorted(map(tuple, approx.collect())) == sorted(map(tuple, again.collect()))
    # the scan is UDF-free: no Python evaluation node in the plan
    plan = approx._sc._jvm.PythonSQLUtils.explainString(
        approx._jdf.queryExecution(), "simple"
    )
    assert "EvalPython" not in plan


def test_ivf_append_parity_and_drift(db):
    """Incremental IVF maintenance (r6): appending with the frozen
    centroids is BIT-IDENTICAL to re-assigning the grown corpus
    against the same model (the append contract), queries over the
    appended store match, in-distribution appends don't flag a refit,
    and a shifted batch (distribution drift) does."""
    from deep_db_learning_spark.operators.similarity import (
        _assign_lists,
        ivf_append,
        ivf_index_deterministic,
        ivf_topk,
    )

    emb = db.df("embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    assigned_old, model = ivf_index_deterministic(old, n_lists=8, n_iters=3)
    store, drift = ivf_append(assigned_old, model, new)

    full = emb.withColumn(
        "list_id", _assign_lists(model.clusterCenters(), "embedding", 1)[0]
    )
    got = sorted((r["vec_id"], r["list_id"]) for r in store.collect())
    want = sorted((r["vec_id"], r["list_id"]) for r in full.collect())
    assert got == want

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivf_topk(store, model, queries, k=5, n_probes=3, query_count=3)
    b = ivf_topk(full, model, queries, k=5, n_probes=3, query_count=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    rows = drift.collect()
    assert rows and not any(r["refit"] for r in rows)  # in-distribution
    shifted = new.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(50.0))
    )
    _, drift2 = ivf_append(assigned_old, model, shifted)
    assert drift2.filter("refit").count() > 0  # err_ratio fires


def test_sq8_append_parity_and_drift(db):
    """Incremental SQ8 maintenance (r6): appending with frozen scales
    equals encoding the grown corpus, query results match, and the
    saturation drift counter stays quiet in-distribution but fires
    (with a meaningful max_scale_ratio) on out-of-range arrivals."""
    from deep_db_learning_spark.operators.similarity import (
        sq8_append,
        sq8_encode,
        sq8_topk,
        sq8_train,
    )

    emb = db.df("embeddings")
    old = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)
    scales = sq8_train(emb)  # scales fit on the full range: no clip
    store_old = sq8_encode(old, scales)
    store, drift = sq8_append(store_old, scales, new)

    full = sq8_encode(emb, scales)
    got = sorted((r["vec_id"], tuple(r["codes"])) for r in store.collect())
    want = sorted((r["vec_id"], tuple(r["codes"])) for r in full.collect())
    assert got == want

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sq8_topk(store, scales, queries, k=5)
    b = sq8_topk(full, scales, queries, k=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    d = drift.first()
    assert d["n_new"] == new.count()
    assert d["clip_frac"] == 0.0 and not d["refit"]
    big = new.withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(10.0))
    )
    _, drift2 = sq8_append(store_old, scales, big)
    d2 = drift2.first()
    assert d2["refit"] and d2["clip_frac"] > 0.5 and d2["max_scale_ratio"] > 5.0

    # r7 advice fix: an EMPTY batch is a clean no-op append, not an
    # unknown verdict — clip_frac/refit must not be NULL (0/0)
    store3, drift3 = sq8_append(store_old, scales, new.limit(0))
    d3 = drift3.first()
    assert d3["n_new"] == 0
    assert d3["clip_frac"] == 0.0 and d3["max_scale_ratio"] == 0.0
    assert d3["refit"] is False
    assert drift3.filter("refit").count() == 0
    assert store3.count() == store_old.count()


def test_opq_rotation_beats_plain_pq_on_correlated_data(spark):
    """OPQ (r6 — Ge et al. 2013): on dimension-correlated embeddings
    (a low-rank latent mixed across subspace boundaries — the shape
    real embedding models produce) the learned orthonormal rotation
    recovers the codebook resolution plain contiguous-subspace PQ
    wastes: ADC recall@10 at IDENTICAL memory strictly improves, and
    the fit is deterministic."""
    import numpy as np

    from deep_db_learning_spark.operators.similarity import (
        opq_rotate,
        opq_train,
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = np.random.default_rng(5)
    n, d, lat = 1500, 32, 6
    A = rng.normal(size=(lat, d))
    X = rng.normal(size=(n, lat)) @ A + 0.05 * rng.normal(size=(n, d))
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    truth = {}
    ids = np.arange(n)
    for qi in range(8):
        d2 = ((X - X[qi]) ** 2).sum(axis=1)
        truth[qi] = set(ids[np.lexsort((ids, d2))[:10]])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(got[q] & truth[q]) for q in truth) / (10 * len(truth))

    cb = pq_train(emb, m=8, k=16, sample=1500, seed=42)
    plain = pq_topk(pq_encode(emb, cb), cb, queries, k=10)
    r_plain = recall(plain)

    R, cbr = opq_train(emb, m=8, k=16, sample=1500, seed=42)
    rot = opq_rotate(emb, R)
    rot_q = opq_rotate(queries, R)
    opq = pq_topk(pq_encode(rot, cbr), cbr, rot_q, k=10)
    r_opq = recall(opq)
    assert r_opq > r_plain  # measured uplift on this data
    assert r_opq >= r_plain + 0.05
    # deterministic fit: same sample -> identical rotation + codebooks
    R2, cbr2 = opq_train(emb, m=8, k=16, sample=1500, seed=42)
    assert np.array_equal(R, R2) and np.array_equal(cbr, cbr2)
    assert np.allclose(R @ R.T, np.eye(d), atol=1e-8)


def test_ivf_pq_append_parity_and_drift(db):
    """Compressed-store appends (r6): residual-encoding the arriving
    batch with the frozen centroids+codebooks is bit-identical to
    encoding the grown corpus, ivf_pq_topk over the appended store
    matches the full re-encode, and the mass drift counter fires only
    when a list's appended share crosses the threshold."""
    from deep_db_learning_spark.operators.similarity import (
        ivf_index_deterministic,
        ivf_pq_append,
        ivf_pq_topk,
        pq_encode,
        pq_train,
    )

    emb = db.df("embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    assigned_old, model = ivf_index_deterministic(old, n_lists=8, n_iters=3)
    cb = pq_train(assigned_old, m=16, k=16, sample=500, seed=42,
                  residual_model=model)
    store_old = pq_encode(
        assigned_old, cb, extra_cols=("list_id",), residual_model=model
    )
    store, drift = ivf_pq_append(store_old, cb, model, new)

    # parity: the grown corpus, assigned+encoded from scratch with the
    # SAME frozen model/codebooks
    from deep_db_learning_spark.operators.similarity import _assign_lists

    full_assigned = emb.withColumn(
        "list_id", _assign_lists(model.clusterCenters(), "embedding", 1)[0]
    )
    full = pq_encode(
        full_assigned, cb, extra_cols=("list_id",), residual_model=model
    )
    got = sorted(
        (r["vec_id"], tuple(r["codes"]), r["list_id"]) for r in store.collect()
    )
    want = sorted(
        (r["vec_id"], tuple(r["codes"]), r["list_id"]) for r in full.collect()
    )
    assert got == want

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivf_pq_topk(store, cb, model, queries, k=5, n_probes=3, residual=True)
    b = ivf_pq_topk(full, cb, model, queries, k=5, n_probes=3, residual=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    rows = drift.collect()
    assert rows and not any(r["refit"] for r in rows)  # 20% < 0.3 threshold
    _, drift2 = ivf_pq_append(store_old, cb, model, new, mass_threshold=0.1)
    assert drift2.filter("refit").count() > 0


def test_ivf_append_running_stats(db):
    """O(batch) drift state (r6): feeding the running (list_id, n,
    err_sum) frame into ivf_append reproduces the store-scan drift
    verdicts without touching the standing store, and the returned
    stats equal a fresh recompute over the grown corpus (counts exact,
    error sums to float tolerance — they are advisory doubles)."""
    from deep_db_learning_spark.operators.similarity import (
        ivf_append,
        ivf_append_stats,
        ivf_index_deterministic,
    )

    emb = db.df("embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    assigned_old, model = ivf_index_deterministic(old, n_lists=8, n_iters=3)
    stats0 = ivf_append_stats(assigned_old, model)

    store, drift_a, stats1 = ivf_append(
        assigned_old, model, new, old_stats=stats0, with_stats=True
    )
    _, drift_b = ivf_append(assigned_old, model, new)  # store-scan path

    a = {r["list_id"]: r for r in drift_a.collect()}
    b = {r["list_id"]: r for r in drift_b.collect()}
    assert set(a) == set(b)
    for lid in a:
        assert a[lid]["n_old"] == b[lid]["n_old"]
        assert a[lid]["n_new"] == b[lid]["n_new"]
        assert a[lid]["refit"] == b[lid]["refit"]
        assert abs(a[lid]["err_old"] - b[lid]["err_old"]) < 1e-9
        assert abs(a[lid]["err_new"] - b[lid]["err_new"]) < 1e-9

    fresh = {r["list_id"]: r for r in ivf_append_stats(store, model).collect()}
    got = {r["list_id"]: r for r in stats1.collect()}
    assert set(got) == set(fresh)
    for lid in got:
        assert got[lid]["n"] == fresh[lid]["n"]
        assert abs(got[lid]["err_sum"] - fresh[lid]["err_sum"]) < 1e-6


def test_ivf_store_partition_pruning(db, tmp_path):
    """The persisted IVF store layout (r6): partitioned by list_id, a
    probe-shaped filter reaches the scan as a PartitionFilter — the
    plan proves a 2-of-8-list probe reads 2 lists' files, not the
    store — and appends land in-place without rewriting old files."""
    import io
    import os
    from contextlib import redirect_stdout

    from deep_db_learning_spark.operators.similarity import (
        ivf_append,
        ivf_index_deterministic,
        load_ivf_store,
        save_ivf_store,
    )

    emb = db.df("embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    assigned, model = ivf_index_deterministic(old, n_lists=8, n_iters=2)
    path = str(tmp_path / "ivf_store")
    save_ivf_store(assigned, path)
    assert any(d.startswith("list_id=") for d in os.listdir(path))

    store = load_ivf_store(db.spark, path)
    probed = store.filter(F.col("list_id").isin(1, 3))
    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "list_id" in plan.split("PartitionFilters", 1)[1][:200]

    # append composes: only the new batch's rows get written
    before = {
        d: set(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("list_id=")
    }
    appended, _ = ivf_append(store, model, new)
    new_rows = appended.join(store, "vec_id", "left_anti")
    save_ivf_store(new_rows.select(*store.columns), path, mode="append")
    grown = load_ivf_store(db.spark, path)
    assert grown.count() == emb.count()
    for d, files in before.items():
        # the standing files survived the append untouched
        assert files <= set(os.listdir(os.path.join(path, d)))


def test_opq_composes_with_residual_ivfpq(spark):
    """The FAISS index-factory composition "OPQ → IVF → residual PQ"
    (r6): rotate the corpus once, fit the coarse quantizer and the
    residual codebooks in rotated space, query with rotated queries —
    on dimension-correlated data the composed recall@10 at identical
    memory beats the unrotated residual IVF-PQ."""
    import numpy as np

    from deep_db_learning_spark.operators.similarity import (
        ivf_index_deterministic,
        ivf_pq_topk,
        opq_rotate,
        opq_train,
        pq_encode,
        pq_train,
    )

    rng = np.random.default_rng(11)
    n, d, lat = 1600, 32, 6
    A = rng.normal(size=(lat, d))
    V = rng.normal(size=(n, lat)) @ A + 0.05 * rng.normal(size=(n, d))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(V)],
        "vec_id bigint, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ids = np.arange(n)
    truth = {}
    for qi in range(8):
        d2 = ((V - V[qi]) ** 2).sum(axis=1)
        truth[qi] = set(ids[np.lexsort((ids, d2))[:10]])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(got[q] & truth[q]) for q in truth) / (10 * len(truth))

    def residual_ivfpq(corpus, qs):
        assigned, model = ivf_index_deterministic(corpus, n_lists=8, n_iters=3)
        cb = pq_train(
            assigned, m=8, k=16, sample=1600, seed=42, residual_model=model
        )
        enc = pq_encode(
            assigned, cb, extra_cols=("list_id",), residual_model=model
        )
        return ivf_pq_topk(
            enc, cb, model, qs, k=10, n_probes=3, residual=True
        )

    r_plain = recall(residual_ivfpq(emb, queries))
    R, _ = opq_train(emb, m=8, k=16, sample=1600, seed=42)
    r_opq = recall(residual_ivfpq(opq_rotate(emb, R), opq_rotate(queries, R)))
    assert r_opq > r_plain  # rotation helps even under the coarse split


def test_opq_rotation_orthogonal_error_bounded_deterministic(db):
    """OPQ (r7): the learned rotation is orthogonal, the sample
    quantization error is <= plain PQ's BY CONSTRUCTION (best-seen
    tracking includes the R=I iteration), and the fit is
    deterministic."""
    import numpy as np

    from deep_db_learning_spark.functions.hashing import knuth_hash
    from deep_db_learning_spark.operators.similarity import (
        opq_train,
        pq_error,
        pq_train,
    )

    emb = db.df("embeddings")
    R, cb_opq = opq_train(emb, m=8, k=16, sample=500, seed=42)
    d = R.shape[0]
    assert np.allclose(R.T @ R, np.eye(d), atol=1e-9)
    R2, cb2 = opq_train(emb, m=8, k=16, sample=500, seed=42)
    assert np.array_equal(R, R2) and np.array_equal(cb_opq, cb2)

    cb_pq = pq_train(emb, m=8, k=16, sample=500, seed=42)
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(knuth_hash(F.col("vec_id"), 42), F.col("vec_id"))
        .limit(500)
        .collect()
    )
    X = np.array([list(r["embedding"]) for r in rows], float)
    e_opq = pq_error(X, cb_opq, rotation=R)
    e_pq = pq_error(X, cb_pq)
    assert e_opq <= e_pq + 1e-12
    assert e_opq > 0.0


def test_opq_end_to_end_rerank_exact(db):
    """pq_encode/pq_topk with rotation: the ADC path returns full
    top-k per query and the exact rerank (on UN-rotated vectors —
    orthogonal rotations preserve L2) still recovers the true nearest
    neighbor at rank 1."""
    import numpy as np

    from deep_db_learning_spark.operators.similarity import (
        opq_train,
        pq_encode,
        pq_topk,
    )

    emb = db.df("embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    R, cb = opq_train(emb, m=16, k=16, sample=500, seed=42)
    enc = pq_encode(emb, cb, rotation=R)
    out = pq_topk(enc, cb, queries, k=10, rerank=emb, rerank_factor=8, rotation=R)
    assert out.groupBy("query_id").count().agg(F.max("count")).first()[0] == 10

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], float)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rank") == 1).collect()}
    for qr in queries.collect():
        qv = np.array(list(qr["embedding"]), float)
        d2 = ((X - qv) ** 2).sum(axis=1)
        assert top1[qr["query_id"]] == ids[np.lexsort((ids, d2))[0]]
