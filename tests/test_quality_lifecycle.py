"""The drift→retrain→new-generation loop END TO END — every piece
(warm-start ``init``, ``stream_cut_drift_monitor`` over the logit
column, router generations) exists separately; this module RUNS the
full lifecycle the quality_stream docstring documents:

    gen-0 model deployed, logit cuts frozen at deployment
      → a same-distribution wave scores: monitor says not drifted
      → a shifted wave scores: monitor flags drifted on qf_logit
      → warm-start retrain (init=gen-0) on the shifted wave's labels
      → gen-1 router (new checkpoint, new output) routes the wave
        DIFFERENTLY from gen-0
      → replaying either generation from a wiped checkpoint rewrites
        bit-identical areas (scores across generations never mix).
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.quality_filter import (
    fit_quality_filter,
    quality_logit_scores,
)
from deep_db_learning_spark.streaming.quality_stream import (
    read_routed,
    stream_quality_route,
)
from deep_db_learning_spark.streaming.quantile_hist import (
    cut_drift,
    reference_cuts,
    stream_cut_drift_monitor,
)

POS = ["clean", "prose", "article", "well", "written", "cited"]
NEG = ["spam", "click", "buy", "now", "xxx", "free"]
DRIFT_POS = ["ledger", "archive", "journal", "verified", "record"]
DRIFT_NEG = ["crypto", "moon", "pump", "airdrop", "giveaway"]
SHARED = ["the", "a", "of", "and"]


def _corpus(spark, seed, base_id, pos, neg, n=200):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = i % 2
        vocab = (pos if y else neg) + SHARED
        text = " ".join(rng.choice(vocab) for _ in range(40))
        rows.append((base_id + i, text, y))
    return spark.createDataFrame(rows, "doc_id bigint, text string, y int")


@pytest.fixture(scope="module")
def gen0(spark):
    train = _corpus(spark, seed=7, base_id=0, pos=POS, neg=NEG)
    m0 = fit_quality_filter(train, "y", n_buckets=64, epochs=4)
    cuts = reference_cuts(
        quality_logit_scores(train, m0), "qf_logit", n_bins=8
    )
    return train, m0, cuts


def test_full_drift_retrain_generation_loop(spark, gen0, tmp_path):
    train, m0, cuts = gen0

    # wave A: the SAME text generator (fresh ids) — logit multiset is
    # identical to deployment's, so the frozen cuts see ~uniform mass.
    # wave B: a different domain — gen-0 features barely fire, logits
    # collapse toward the intercept, mass piles into few bins.
    wave_a = _corpus(spark, seed=7, base_id=10_000, pos=POS, neg=NEG)
    wave_b = _corpus(
        spark, seed=11, base_id=20_000, pos=DRIFT_POS, neg=DRIFT_NEG
    )
    scores_a = quality_logit_scores(wave_a, m0)
    scores_b = quality_logit_scores(wave_b, m0)

    # batch-side drift semantics first (what the monitor replays)
    psi_a, _ = cut_drift(scores_a, "qf_logit", cuts)
    psi_b, _ = cut_drift(scores_b, "qf_logit", cuts)
    assert psi_a < 0.25 <= psi_b, (psi_a, psi_b)

    # 1) the streaming monitor watches the router's logit column and
    # flags exactly the drifted wave
    src = str(tmp_path / "score_src")
    scores_a.coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")
    scores_b.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    stream = (
        spark.readStream.schema(scores_a.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    mon_out = str(tmp_path / "monitor")
    q = stream_cut_drift_monitor(
        stream, "qf_logit", cuts, mon_out,
        os.path.join(str(tmp_path), "ck_mon"),
    )
    q.awaitTermination(180)
    mrows = spark.read.option("basePath", mon_out).parquet(
        f"{mon_out}/batch=*"
    ).collect()
    verdicts = {}
    for r in mrows:
        verdicts[r["batch_id"]] = (r["psi"], r["drifted"])
    assert len(verdicts) == 2
    flags = sorted(verdicts.values())
    assert flags[0] == (psi_a, False)
    assert flags[1] == (psi_b, True)

    # 2) drift flagged → warm-start retrain on the drifted wave's
    # labels, continuing from the gen-0 weights (same bucket space)
    m1 = fit_quality_filter(wave_b, "y", init=m0, epochs=4)
    assert m1.n_buckets == m0.n_buckets
    assert m1.w != m0.w

    # 3) gen-0 vs gen-1 routing of the drifted wave: new generation =
    # new output + new checkpoint, and the verdicts actually change
    wave_src = str(tmp_path / "wave_src")
    wave_b.select("doc_id", "text").coalesce(1).write.mode(
        "overwrite"
    ).parquet(wave_src)

    def route(gen_name, model, ck_name):
        st = spark.readStream.schema(
            wave_b.select("doc_id", "text").schema
        ).parquet(wave_src)
        out = str(tmp_path / gen_name)
        q = stream_quality_route(
            st, model, out, os.path.join(str(tmp_path), ck_name),
            threshold=0.0, query_name=gen_name,
        )
        q.awaitTermination(180)
        return out

    out0 = route("router_gen0", m0, "ck_g0")
    out1 = route("router_gen1", m1, "ck_g1")
    keep0 = {r["doc_id"] for r in read_routed(spark, out0, "keep").collect()}
    keep1 = {r["doc_id"] for r in read_routed(spark, out1, "keep").collect()}
    assert keep0 != keep1
    # gen-1 routing equals the batch verdicts of the gen-1 model
    want1 = {
        r["doc_id"]
        for r in quality_logit_scores(wave_b, m1)
        .where(F.col("qf_logit") >= 0.0)
        .collect()
    }
    assert keep1 == want1
    # the retrained generation actually understands the new domain:
    # its keep set is ~the positive class, gen-0's is noise
    pos_ids = {r["doc_id"] for r in wave_b.where("y = 1").collect()}
    agree1 = len(keep1 & pos_ids) + (
        wave_b.count() - len(pos_ids) - len(keep1 - pos_ids)
    )
    agree0 = len(keep0 & pos_ids) + (
        wave_b.count() - len(pos_ids) - len(keep0 - pos_ids)
    )
    assert agree1 > agree0

    # 4) replay identity per generation: wiped checkpoint, same model,
    # same output → bit-identical keep areas
    vals1 = sorted(
        map(
            tuple,
            read_routed(spark, out1, "keep")
            .select("doc_id", "qf_logit")
            .collect(),
        )
    )
    st = spark.readStream.schema(
        wave_b.select("doc_id", "text").schema
    ).parquet(wave_src)
    q = stream_quality_route(
        st, m1, out1, os.path.join(str(tmp_path), "ck_g1_replay"),
        threshold=0.0, query_name="router_gen1_replay",
    )
    q.awaitTermination(180)
    vals1_replay = sorted(
        map(
            tuple,
            read_routed(spark, out1, "keep")
            .select("doc_id", "qf_logit")
            .collect(),
        )
    )
    assert vals1_replay == vals1
