"""In-engine logistic-regression quality filter
(operators/quality_filter.py): bit-parity of the full distributed
descent against the python twin (losses, weights), bitwise scoring
parity against the DuckDB SQL twin, and the classifier actually
separating the labeled domain."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.quality_filter import (
    QF_CONFIG,
    doc_features_sql,
    fit_quality_filter,
    fit_quality_filter_py,
    quality_logit_scores,
    quality_logit_scores_sql,
)

N_BUCKETS = 128  # fixture-scale; the driver slot uses QF_CONFIG's 512


@pytest.fixture(scope="module")
def labeled(db):
    return db.df("documents").withColumn(
        "y", (F.col("source") == "src0").cast("int")
    )


@pytest.fixture(scope="module")
def model(labeled):
    return fit_quality_filter(labeled, "y", n_buckets=N_BUCKETS)


@pytest.fixture(scope="module")
def twin(duck):
    feats = duck.execute(
        doc_features_sql("documents", n_buckets=N_BUCKETS)
    ).fetchall()
    labels = dict(
        duck.execute(
            "SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END "
            "FROM documents WHERE text IS NOT NULL"
        ).fetchall()
    )
    return fit_quality_filter_py(feats, labels, n_buckets=N_BUCKETS)


def test_descent_bit_equal_to_python_twin(model, twin):
    """Every epoch's logloss sum, every bucket weight, and the
    intercept — identical decimals (the tabnet_full twin regime)."""
    assert model.n_docs == twin.n_docs > 0
    assert [str(a) for a in model.losses] == [str(b) for b in twin.losses]
    assert model.w0 == twin.w0
    assert model.w == twin.w
    # the descent actually descends
    assert float(model.losses[-1]) < float(model.losses[0])


def test_scores_match_duckdb_twin_bitwise(db, duck, model):
    got = sorted(
        map(tuple, quality_logit_scores(db.df("documents"), model).collect())
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                quality_logit_scores_sql("documents", model)
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_classifier_separates_real_signal(spark):
    """The whole point — on a corpus where the label HAS textual
    signal (the driver testdata's lang/source labels are random w.r.t.
    its shared vocabulary, so no classifier can separate them there;
    the slot pins arithmetic, this test pins learning): positives from
    one vocabulary, negatives from another, a few epochs → clean
    separation."""
    import random

    rng = random.Random(7)
    pos_vocab = ["clean", "prose", "article", "well", "written", "cited"]
    neg_vocab = ["spam", "click", "buy", "now", "xxx", "free"]
    shared = ["the", "a", "of", "and"]
    rows = []
    for i in range(200):
        y = i % 2
        vocab = (pos_vocab if y else neg_vocab) + shared
        text = " ".join(rng.choice(vocab) for _ in range(40))
        rows.append((i, text, y))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, y int")
    m = fit_quality_filter(df, "y", n_buckets=64, epochs=6)
    scored = quality_logit_scores(df, m).join(
        df.select("doc_id", "y"), "doc_id"
    )
    agg = {
        r["y"]: (r["lo"], r["hi"])
        for r in scored.groupBy("y")
        .agg(F.min("qf_logit").alias("lo"), F.max("qf_logit").alias("hi"))
        .collect()
    }
    # every positive outscores every negative
    assert agg[1][0] > agg[0][1]
    assert float(m.losses[-1]) < float(m.losses[0])


def test_zero_gram_documents_score_intercept(spark, model):
    df = spark.createDataFrame(
        [(1, "   "), (2, None), (3, "real text here")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in quality_logit_scores(df, model).collect()
    }
    assert 2 not in rows  # NULL text is outside the corpus convention
    assert rows[1]["n_grams"] == 0
    assert rows[1]["qf_logit"] == float(model.w0)


def test_config_is_the_shared_spec():
    assert set(QF_CONFIG) == {"n_buckets", "epochs", "lr", "l2"}


def test_binary_auc_exact(spark, db, duck, model):
    """Exact distributed AUC: bit-equal to a pair-counting python
    replay AND to the DuckDB rank-window twin (identical integer
    midrank arithmetic + identical final division); 1.0 on perfect
    separation; raises on a single-class frame."""
    from deep_db_learning_spark.plans.metrics import (
        binary_auc,
        binary_auc_sql,
    )

    scored = quality_logit_scores(db.df("documents"), model).join(
        db.df("documents").select(
            "doc_id", (F.col("source") == "src0").cast("int").alias("y")
        ),
        "doc_id",
    ).select("qf_logit", "y")
    got = binary_auc(scored, "qf_logit", "y")

    rows = [(r["qf_logit"], r["y"]) for r in scored.collect()]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    # pair counting: a win is 2 half-points, a tie 1 => num2 = 2·U
    num2 = sum(
        2 * (p > q) + 1 * (p == q) for p in pos for q in neg
    )
    want = num2 / (2.0 * len(pos) * len(neg))
    assert got == want
    assert 0.0 <= got <= 1.0

    import pandas as pd

    duck.register("auc_rows", pd.DataFrame(rows, columns=["qf_logit", "y"]))
    s2, npos, n = duck.execute(
        binary_auc_sql("auc_rows", "qf_logit", "y")
    ).fetchone()
    dnum2 = int(s2) - int(npos) * (int(npos) + 1)
    assert dnum2 / (2.0 * npos * (n - npos)) == got

    perfect = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (-1.0, 0), (0.0, 0)], "s double, y int"
    )
    assert binary_auc(perfect, "s", "y") == 1.0
    with pytest.raises(ValueError, match="both classes"):
        binary_auc(
            spark.createDataFrame([(1.0, 1)], "s double, y int"), "s", "y"
        )


def test_stream_quality_route(spark, db, model, tmp_path):
    """Streaming routing ≡ batch scoring by construction: two
    micro-batches of documents routed keep/drop land on EXACTLY the
    batch operator's verdicts; NULL-text rows go to drop with a NULL
    logit; a checkpoint-wiped replay rewrites identical areas."""
    import os

    from deep_db_learning_spark.streaming.quality_stream import (
        read_routed,
        stream_quality_route,
    )

    docs = db.df("documents").select("doc_id", "text")
    src = str(tmp_path / "route_src")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b0")
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b1")

    # threshold at the batch median logit so both areas are non-empty
    batch_scores = quality_logit_scores(docs, model)
    thr = sorted(r["qf_logit"] for r in batch_scores.collect())[250]

    out = str(tmp_path / "routed")

    def run(ck):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = stream_quality_route(
            stream, model, out, os.path.join(str(tmp_path), ck), thr
        )
        q.awaitTermination(180)

    run("ck1")
    keep = read_routed(spark, out, "keep")
    drop = read_routed(spark, out, "drop")
    want_keep = sorted(
        r["doc_id"]
        for r in batch_scores.where(F.col("qf_logit") >= thr).collect()
    )
    got_keep = sorted(r["doc_id"] for r in keep.collect())
    assert got_keep == want_keep
    # every input row routed exactly once; NULL-text rows in drop
    n_null = docs.where(F.col("text").isNull()).count()
    assert keep.count() + drop.count() == docs.count()
    assert drop.where(F.col("qf_logit").isNull()).count() == n_null
    keep_vals = sorted(
        map(tuple, keep.select("doc_id", "qf_logit").collect())
    )

    # replay from scratch: identical areas (overwrite idempotence)
    run("ck2")
    keep2 = read_routed(spark, out, "keep")
    assert sorted(
        map(tuple, keep2.select("doc_id", "qf_logit").collect())
    ) == keep_vals


def test_duplicate_ids_raise(spark):
    df = spark.createDataFrame(
        [(1, "a b c", 1), (1, "d e f", 0)], "doc_id bigint, text string, y int"
    )
    with pytest.raises(ValueError, match="not unique"):
        fit_quality_filter(df, "y", n_buckets=16, epochs=1)


def test_fit_label_guards_single_action(spark, monkeypatch):
    """The four fit guards (row count, NULL/NaN labels, duplicate ids,
    sampled-mode non-binary labels) run as ONE aggregate job over the
    label frame (VERDICT r11 task 3 — formerly three). Pinned by
    counting actions: exactly one `.first()`, zero `.count()`/
    `.collect()`, while every loud failure still fires."""
    from deep_db_learning_spark.operators.quality_filter import (
        _fit_label_guards,
    )

    lab = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, 1.0)], "doc_id bigint, __y double"
    )
    # patch the CONCRETE class (pyspark 4 splits the abstract
    # pyspark.sql.DataFrame from the classic implementation)
    cls = type(lab)
    calls = {"first": 0, "count": 0, "collect": 0}
    for m in calls:
        orig = getattr(cls, m)

        def spy(self, *a, _m=m, _o=orig, **k):
            calls[_m] += 1
            return _o(self, *a, **k)

        monkeypatch.setattr(cls, m, spy)
    assert _fit_label_guards(lab, "doc_id", "y", check_binary=True) == 3
    assert calls["first"] == 1 and calls["count"] == 0
    # (first() may delegate to collect() internally — one action total)
    assert calls["collect"] <= 1

    # the folded scan still fires every loud failure
    def guard(rows, check_binary=False):
        f = spark.createDataFrame(rows, "doc_id bigint, __y double")
        return _fit_label_guards(f, "doc_id", "y", check_binary)

    with pytest.raises(ValueError, match="empty training set"):
        guard([])
    with pytest.raises(ValueError, match="NULL/NaN"):
        guard([(1, 1.0), (2, None)])
    with pytest.raises(ValueError, match="NULL/NaN"):
        guard([(1, 1.0), (2, float("nan"))])
    with pytest.raises(ValueError, match="not unique"):
        guard([(1, 1.0), (1, 0.0)])
    with pytest.raises(ValueError, match="neither"):
        guard([(1, 1.0), (2, 2.0)], check_binary=True)
    # non-binary labels are legal outside sampled mode
    assert guard([(1, 1.0), (2, 2.0)]) == 2
    # a single NULL id keeps .distinct().count() semantics (NULL is
    # one distinct group): one NULL id passes, two collide
    assert guard([(None, 1.0), (2, 0.0)]) == 2
    with pytest.raises(ValueError, match="not unique"):
        guard([(None, 1.0), (None, 0.0)])


def test_threshold_table_counts_exact(spark, db, model, duck):
    """PR points at exact score quantiles: every confusion count
    matches a python recount at the same threshold; monotone recall."""
    from deep_db_learning_spark.plans.metrics import threshold_table

    scored = quality_logit_scores(db.df("documents"), model).join(
        db.df("documents").select(
            "doc_id", (F.col("source") == "src0").cast("int").alias("y")
        ),
        "doc_id",
    )
    tbl = threshold_table(scored, "qf_logit", "y", probs=[0.25, 0.5, 0.75])
    rows = {r["p"]: r for r in tbl.collect()}
    data = [(r["qf_logit"], r["y"]) for r in scored.collect()]
    for p, r in rows.items():
        t = r["threshold"]
        tp = sum(1 for s, y in data if s >= t and y == 1)
        fp = sum(1 for s, y in data if s >= t and y == 0)
        fn = sum(1 for s, y in data if s < t and y == 1)
        tn = sum(1 for s, y in data if s < t and y == 0)
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn), p
        if r["precision"] is not None:
            assert r["precision"] == tp / (tp + fp)
        if r["recall"] is not None:
            assert r["recall"] == tp / (tp + fn)
    # recall shrinks as the threshold climbs
    recalls = [rows[p]["recall"] for p in sorted(rows)]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))


def test_grouped_binary_auc(spark):
    """Per-group AUC equals the scalar operator per group; a
    single-class group yields NULL instead of raising."""
    import random

    from deep_db_learning_spark.plans.metrics import (
        binary_auc,
        grouped_binary_auc,
    )

    rng = random.Random(11)
    rows = []
    for g in ("a", "b"):
        for i in range(80):
            y = rng.randint(0, 1)
            rows.append((g, rng.uniform(0, 1) + 0.3 * y, y))
    rows += [("solo", 0.5, 1), ("solo", 0.7, 1)]  # one-class group
    df = spark.createDataFrame(rows, "g string, s double, y int")
    got = {r["g"]: r for r in grouped_binary_auc(df, "g", "s", "y").collect()}
    for g in ("a", "b"):
        want = binary_auc(df.where(F.col("g") == g), "s", "y")
        assert got[g]["auc"] == want, g
        assert got[g]["n_pos"] + got[g]["n_neg"] == 80
    assert got["solo"]["auc"] is None and got["solo"]["n_neg"] == 0


def test_save_load_and_warm_start(spark, db, duck, model, twin, tmp_path):
    """Model lifecycle: save→load round-trips every decimal bit
    (scores identical); a warm-started continuation from the loaded
    model is bit-equal between engine and twin, and equals training
    the same total epochs in one run (full-batch GD is
    epoch-decomposable)."""
    from deep_db_learning_spark.operators.quality_filter import (
        load_quality_filter,
        save_quality_filter,
    )

    path = str(tmp_path / "qf_model")
    save_quality_filter(model, path)
    back = load_quality_filter(path)
    assert back.w0 == model.w0 and back.w == model.w
    assert back.losses == model.losses and back.n_docs == model.n_docs

    labeled = db.df("documents").withColumn(
        "y", (F.col("source") == "src0").cast("int")
    )
    cont = fit_quality_filter(labeled, "y", epochs=2, init=back)
    feats = duck.execute(
        doc_features_sql("documents", n_buckets=N_BUCKETS)
    ).fetchall()
    labels = dict(
        duck.execute(
            "SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END "
            "FROM documents WHERE text IS NOT NULL"
        ).fetchall()
    )
    cont_twin = fit_quality_filter_py(feats, labels, epochs=2, init=twin)
    assert cont.w == cont_twin.w and cont.w0 == cont_twin.w0
    assert [str(x) for x in cont.losses] == [str(x) for x in cont_twin.losses]
    # 3 + 2 warm epochs == 5 straight epochs (same data, full batch)
    straight = fit_quality_filter(
        labeled, "y", n_buckets=N_BUCKETS, epochs=5
    )
    assert cont.w == straight.w and cont.w0 == straight.w0
    # mismatched bucket space refuses loudly
    with pytest.raises(ValueError, match="bucket space"):
        fit_quality_filter(labeled, "y", n_buckets=64, init=back)


def test_null_label_raises(spark):
    """A NULL label would NaN through the Arrow kernel and silently
    vanish from the decimal gradient fold — fit raises instead."""
    df = spark.createDataFrame(
        [(1, "a b c", 1), (2, "d e f", None)],
        "doc_id bigint, text string, y int",
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        fit_quality_filter(df, "y", n_buckets=16, epochs=1)
    with pytest.raises(ValueError, match="NULL/NaN"):
        fit_quality_filter_py(
            [(1, 0, 1)], {1: 1.0, 2: None}, n_buckets=16, epochs=1
        )
    with pytest.raises(ValueError, match="NULL/NaN"):
        fit_quality_filter_py(
            [(1, 0, 1)], {1: 1.0, 2: float("nan")}, n_buckets=16, epochs=1
        )


def test_sampled_fit_twin_parity_and_bounds(db, duck):
    """sample_n: the engine draws the per-class md5 sample through the
    threshold cut and descends on it; the python twin replays the
    identical selection from FULL DuckDB-read feats/labels — weights,
    losses, and n_docs land bit-equal. The sample is bounded at
    min(sample_n, class size) per class."""
    sample_n = 40
    labeled = db.df("documents").withColumn(
        "y", (F.col("source") == "src0").cast("int")
    )
    m = fit_quality_filter(
        labeled, "y", n_buckets=N_BUCKETS, sample_n=sample_n
    )
    feats = duck.execute(
        doc_features_sql("documents", n_buckets=N_BUCKETS)
    ).fetchall()
    labels = dict(
        duck.execute(
            "SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END "
            "FROM documents WHERE text IS NOT NULL"
        ).fetchall()
    )
    t = fit_quality_filter_py(
        feats, labels, n_buckets=N_BUCKETS, sample_n=sample_n
    )
    n_pos = sum(1 for y in labels.values() if y == 1)
    n_neg = len(labels) - n_pos
    want_n = min(sample_n, n_pos) + min(sample_n, n_neg)
    assert m.n_docs == t.n_docs == want_n
    assert [str(a) for a in m.losses] == [str(b) for b in t.losses]
    assert m.w0 == t.w0
    assert m.w == t.w
    # a different seed draws a different sample -> different weights
    m2 = fit_quality_filter(
        labeled, "y", n_buckets=N_BUCKETS, sample_n=sample_n, seed=7
    )
    assert m2.w != m.w
    # scoring the corpus with the sampled model works end to end
    assert quality_logit_scores(db.df("documents"), m).count() > 0


def test_sampled_fit_rejects_nonbinary_labels(spark):
    df = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 0), (3, "e f", 2)],
        "doc_id bigint, text string, y int",
    )
    with pytest.raises(ValueError, match="0, 1"):
        fit_quality_filter(df, "y", n_buckets=16, epochs=1, sample_n=2)
    with pytest.raises(ValueError, match="0, 1"):
        fit_quality_filter_py(
            [(1, 0, 1)], {1: 1.0, 2: 0.0, 3: 2.0},
            n_buckets=16, epochs=1, sample_n=2,
        )
    # full-batch mode keeps accepting generic numeric labels
    fit_quality_filter(df, "y", n_buckets=16, epochs=1)


def test_calibration_table_matches_duckdb_twin(spark, db, duck, model):
    """Reliability table bitwise vs the SQL twin (cuts recomputed by
    the full-sort oracle quantiles), Σn = N, and ECE replayed through
    the shared fold from DuckDB-read bins."""
    from deep_db_learning_spark.operators.sketch import (
        exact_quantiles_oracle_sql,
    )
    from deep_db_learning_spark.plans.metrics import (
        calibration_table,
        calibration_table_sql,
        ece_from_bins,
        expected_calibration_error,
    )

    scored = quality_logit_scores(db.df("documents"), model).join(
        db.df("documents").select(
            "doc_id", (F.col("source") == "src0").cast("int").alias("y")
        ),
        "doc_id",
    )
    # probability-like score for a meaningful gap: min-max normalize
    lo, hi = scored.agg(F.min("qf_logit"), F.max("qf_logit")).first()
    prob = scored.select(
        ((F.col("qf_logit") - F.lit(float(lo))) / F.lit(float(hi - lo))
         ).alias("p"),
        "y",
    )
    got = sorted(map(tuple, calibration_table(prob, "p", "y", 8).collect()))

    # twin over the SAME rows via a registered arrow table
    pdf = prob.toPandas()
    duck.register("cal_rows", pdf)
    cuts = [
        r[2]
        for r in duck.execute(
            exact_quantiles_oracle_sql(
                "cal_rows", "p", [i / 8 for i in range(1, 8)]
            )
        ).fetchall()
    ]
    want = sorted(
        map(
            tuple,
            duck.execute(
                calibration_table_sql("cal_rows", "p", "y", cuts)
            ).fetchall(),
        )
    )
    duck.unregister("cal_rows")
    assert got == want
    assert sum(r[1] for r in got) == prob.count()
    # ECE: engine scalar == shared fold over the DuckDB-read bins
    ece = expected_calibration_error(prob, "p", "y", 8)
    assert ece == ece_from_bins([(r[0], r[1], r[5]) for r in want])
    assert 0.0 <= ece <= 1.0


def test_calibration_detects_miscalibration(spark):
    """A perfectly calibrated score (score == the true per-group rate)
    lands near-zero ECE; a constant overconfident score does not."""
    import random

    from deep_db_learning_spark.plans.metrics import (
        expected_calibration_error,
    )

    rng = random.Random(3)
    rows = []
    for i in range(4000):
        p = (i % 10) / 10 + 0.05
        rows.append((p, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "p double, y int")
    good = expected_calibration_error(df, "p", "y", 10)
    bad = expected_calibration_error(
        df.select(F.lit(0.95).alias("p"), "y"), "p", "y", 10
    )
    assert good < 0.05 < bad
