"""Physical-plan assertions — the scale posture must survive in the
plans Catalyst actually emits, not just in docstrings: filters reach
the parquet scan, projections prune the read schema, dimension joins
broadcast, and aggregations keep their map-side partial phase."""

import pytest
from pyspark.sql import functions as F


def explain(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


def test_q6_filters_pushed_and_schema_pruned(spark, entry, db):
    # the pure Q6 core (the driver slot unions it with the Q14/Q17
    # scalars, whose part-join scans would shadow the first ReadSchema)
    plan = explain(entry.q_tpch_q6_core(db))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    # 4 of 11 lineitem columns read - nothing else
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in rs
    for col in ("l_orderkey", "l_partkey", "l_comment", "l_returnflag"):
        assert col not in rs


def test_dimension_edge_join_broadcasts(db):
    from deep_db_learning_spark.operators.graph import build_hetero_graph

    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys, add_reverse=False)
    plan = explain(g.edges["customer__c_nationkey__nation"])
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan


def test_message_aggregate_has_partial_phase(db):
    from deep_db_learning_spark.operators.graph import build_hetero_graph

    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys, add_reverse=False)
    agg = g.aggregate_along_edge(
        "orders__o_custkey__customer", ["o_totalprice"], ["sum", "mean"]
    )
    plan = explain(agg)
    # two-phase hash aggregation: partial (map-side combine) + final
    assert "partial_" in plan
    assert plan.count("HashAggregate") >= 2


def test_profiler_prunes_scan_columns(db):
    from deep_db_learning_spark.profiling import SchemaAnalyzer

    an = SchemaAnalyzer(db.tables, db.primary_keys, db.foreign_keys)
    cols = an._stats_columns("lineitem")
    # determined families (floats, dates) and FK members never profile
    assert "l_extendedprice" not in cols and "l_shipdate" not in cols
    assert "l_orderkey" not in cols  # non-composite FK member
    assert "l_returnflag" in cols and "l_linestatus" in cols


def test_lineitem_node_ids_have_no_global_sort(db):
    """The composite-PK fact table must never mint node ids through a
    partition-less Window (an Exchange SinglePartition = one-task global
    sort at scale): its ids are a packed-bigint row expression plus a
    key-PARTITIONED dup rank, and the table is eligible for the fused
    aggregation path."""
    from deep_db_learning_spark.operators.graph import build_hetero_graph

    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys, add_reverse=False)
    assert "lineitem" in g.expr_node_ids

    assert "SinglePartition" not in explain(g.nodes["lineitem"])
    assert "SinglePartition" not in explain(g.edges["lineitem__l_orderkey__orders"])

    # the 2-hop first layer takes the fused single-scan plan: no node-id
    # mint, no window, exactly one lineitem scan
    agg = g.aggregate_along_edge("lineitem__l_orderkey__orders", ["l_quantity"], ["sum"])
    plan = explain(agg)
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_packed_node_ids_unique_and_expression_only(db):
    from deep_db_learning_spark.operators.graph import mint_node_ids

    nodes, kind = mint_node_ids(db.df("lineitem"), ["l_orderkey", "l_linenumber"], "pk")
    assert kind == "packed"
    n = nodes.count()
    assert nodes.select("node_id").distinct().count() == n


def test_neighbor_budget_adds_no_shuffle(db):
    """aggregate_along_edge(neighbor_budget=k): the per-dst sample
    window partitions on the SAME key the aggregation groups on, so the
    budgeted plan has exactly the shuffles of the unbudgeted one (one
    dst hash exchange, shared; broadcast for the dst-existence semi
    join) — the fan-out cap is free at the shuffle level."""
    from deep_db_learning_spark.operators.graph import build_hetero_graph

    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys, add_reverse=False)
    et = "orders__o_custkey__customer"
    plain = explain(g.aggregate_along_edge(et, ["o_totalprice"], ["mean", "sum"]))
    budgeted = explain(
        g.aggregate_along_edge(
            et, ["o_totalprice"], ["mean", "sum"], neighbor_budget=5
        )
    )
    assert budgeted.count("Exchange") == plain.count("Exchange")
    assert "SinglePartition" not in budgeted


def test_text_metrics_single_scan_no_shuffle(spark, entry):
    """The merged per-document text-analysis query: every PER-DOCUMENT
    signal (token counts, lang ID, fingerprints, quality, repetition)
    is a row-local expression, and the only shuffles are the r6
    corpus-frequency aggregation (a corpus-wide token count needs a
    groupBy by definition) plus its per-doc fold/join — pinned at ≤4
    exchanges with the final doc join broadcast."""
    df = entry.q_text_metrics(spark, "/root/testdata/sf0.001")
    plan = explain(df)
    assert shuffle_count(plan) <= 4
    assert plan.count("BroadcastHashJoin") >= 2
    # the bench-only row-local forms stay exchange-free single scans
    for name in ("text_stats", "quality_scores"):
        p = explain(getattr(entry, "q_" + name)(spark, "/root/testdata/sf0.001"),
                    "simple")
        assert "Exchange" not in p
        assert p.count("Scan parquet") == 1


# --------------------------------------------------- shuffle-count pins
#
# Regression gate for the hot bench queries (VERDICT r3 #5): each row
# pins the static plan's SHUFFLE-exchange count (`<=` — an improvement
# passes, a new shuffle fails) and, where the design depends on it, the
# broadcast-join count (`>=` — un-broadcasting a dimension or the
# decontamination eval grams fails). Counts measured at sf0.001; the
# static count is partition-size-independent (AQE may coalesce at
# runtime, never add exchanges).
#
# Counting (ADVICE r4): a bare `plan.count("Exchange ")` also matches
# inside "BroadcastExchange ", so a new shuffle paired with a dropped
# broadcast would keep the total flat and slip through the gate.
# `\bExchange\b` matches ONLY the shuffle node name ("BroadcastExchange"
# and "ReusedExchange" are single tokens with no word boundary before
# the E). Formatted explain prints each node twice (tree + detail), so
# pinned values are ~2x the node count — consistent across all rows.
import re

_SHUFFLE_EXCHANGE = re.compile(r"\bExchange\b")


def shuffle_count(plan: str) -> int:
    return len(_SHUFFLE_EXCHANGE.findall(plan))


PLAN_PINS = {
    # query: (max_shuffle_exchanges, min_broadcast_joins)
    # r12: the registry q1 slot adds Q12 (conditional-count pair over
    # the late-shipment join — orders side broadcast) and Q13 (LEFT
    # join histogram: one join + two aggregates); r13 adds Q16 (the
    # distinct (part, supplier) pair shuffle + the two-phase
    # count-distinct rollup: 3 more real shuffles, complaints/part
    # sides broadcast); bench times the unmerged 1-exchange q1 core
    # (tpch_q1_core below)
    "tpch_q1": (14, 6),
    # r12: the registry q3 slot adds Q4 (EXISTS as a broadcast semi
    # join over the date-shifted lineitem probe) and Q22 (anti-join
    # under a broadcast global-average scalar) — one real shuffle per
    # added aggregate; r13 adds Q11 (per-part fold + the global-total
    # scalar broadcast back) and Q15 (per-supplier revenue fold + max
    # broadcast back, supplier join broadcast): +5 real shuffles, all
    # scalar/dim sides broadcast; bench times the unmerged 1-exchange
    # q3 core (tpch_q3_core below)
    "tpch_q3": (18, 20),
    # r12: the registry q5 slot adds Q7 (two-role nation+region, both
    # roles broadcast), Q8 (conditional-fold ratio, part/supplier/
    # nation sides broadcast), Q9 (profit rollup, all three dims
    # broadcast) — fact-side joins and group-bys are the only real
    # shuffles; bench times the unmerged q5 core
    "tpch_q5": (12, 44),
    # r7 rotation: q6 carries the Q14/Q17 scalar modes (their part
    # joins broadcast; each mode is one partial+final agg), q18 carries
    # the Q10 top-20 mode (nation + dims broadcast); r13 adds Q19
    # (disjunctive-band revenue: one partial+final agg, part broadcast)
    "tpch_q6": (12, 8),
    # r8: the registry slot adds Q2 (derived-partsupp groupBy + min
    # per part, both broadcast back) and Q21 (two pair distincts +
    # semi/anti chain + count + TakeOrdered) — every dimension/pair
    # frame small enough MUST broadcast; r13 adds Q20 (per-pair +
    # per-part quantity folds + the dominant-pair broadcast semi
    # chain: 3 more real shuffles); bench times the unmerged
    # 4-exchange q18+q10 core (tpch_q18_core below)
    # r14: +2 exchanges for the rotated-in topk mode (one window
    # shuffle on o_custkey + the union's AQE coalesce)
    "tpch_q18": (30, 26),
    "decontamination": (4, 2),  # eval grams MUST broadcast
    "dedup_exact": (2, 0),
    # r6: three pipelines under one mode tag — within-corpus dedup,
    # cross-corpus incr dedup (shared sign-once signature checkpoint,
    # band join + string-shingle verify), and the exchange-free mix
    # filter. Checkpoint scans carry no stats, so several verify joins
    # plan as SMJ at sf0.001 (AQE re-plans them at runtime) — the pin
    # bounds the static shape
    "minhash_dedup": (26, 4),
    "simhash": (0, 2),
    "events_hourly": (4, 0),
    "events_sessions": (2, 0),
    # r8: the registry slot carries the te/bin modes — TE adds the
    # (cat × fold) grid aggregate and its window pass (2 real shuffles
    # over a k·card-row frame), and the per-row code assignment MUST
    # broadcast; bin is row-local against the collected cut array.
    # bench times the unmerged 4-exchange core (q_customer_features).
    "customer_features": (8, 9),
    # r6: exact + sq8 modes — two window top-k pipelines (the sq8 scan
    # stays UDF-free codegen; its scales come from one tiny agg job).
    # r13: the trained mode's learned-encoder chain (token explode +
    # vector join + exact-decimal folds) runs EAGERLY behind a
    # cut_lineage (it is consumed by both the corpus and the query
    # sides), so the STATIC plan is just the three top-k windows over
    # scans — 3 real shuffles; the checkpoint scans are stats-free so
    # the static joins plan SMJ and AQE broadcasts at runtime (the
    # minhash_dedup pattern — broadcast floor 0)
    "embedding_topk": (6, 0),
    "message_2hop": (4, 6),
    "attention_aggregate": (2, 4),
    "data_mixing": (6, 2),
    # post-materialization (cut_lineage) shape: the LSH candidate and
    # shingle frames checkpoint to tiny scans, so the verify joins
    # BROADCAST — a regression to SortMergeJoin or a recomputed LSH
    # chain (dozens of exchanges) fails here
    "lsh_verify_pairs_t07": (0, 4),
    "clean_corpus": (14, 10),
    # r13 (ADVICE r12): the merged registry slots above carry loosened
    # caps for their mode unions, so the UNMERGED cores that bench.py
    # actually times regain their own tight gates here (the
    # pagerank/graph_iter split) — a new shuffle in a bench-timed core
    # must fail even while the merged slot stays under its cap
    "tpch_q1_core": (2, 0),
    "tpch_q3_core": (2, 4),
    "tpch_q5_core": (2, 10),
    "tpch_q18_core": (8, 8),
    # the rest of bench.py's headline list (VERDICT r4 #3): every timed
    # DataFrame entry is pinned
    "top_orders_per_customer": (2, 0),
    # r8: the registry slot adds the one-scan pairwise-correlation
    # aggregate (its own partial+final pair); bench times the 2-exchange
    # stats core (resolution prefers the registry entry here, so the
    # pin covers the merged plan)
    "lineitem_numeric_profile": (4, 0),
    "events_rollup": (2, 0),
    "events_asof_purchase": (2, 0),
    "events_conversion_window": (2, 2),
    "events_sliding": (2, 0),
    "bfs_depth2": (22, 14),
    "text_stats": (0, 0),
    "quality_scores": (0, 0),
    # r7: + the wide per-type pivot — one more hash aggregate on
    # user_id (the three aggregates share the key, joins co-partition)
    "events_user_profile": (8, 4),
    # r7: SCD2 — the visible plan is the LAST apply only (earlier
    # batches sit behind the between-batch store checkpoint): one key
    # shuffle shared by all four windows of the apply
    "scd2_apply": (2, 0),
    # r7: funnel — per-step (agg + join) pairs over the union'd frames
    # (6 real shuffles for 3 steps incl. the final count aggs; the
    # step joins broadcast the shrinking reach frame)
    "event_funnel": (12, 4),
    "message_mean": (2, 2),  # bench b3_message_layer
    # r6: the append path — per-list drift agg + probe/candidate joins
    # over the appended store; the broadcast floor pins the probe and
    # drift-verdict small sides
    "ivf_append": (8, 4),
    # r7: retrieval — the bm25/jaccard topk branches live behind an
    # eager cut (their broadcast query joins are pinned in
    # tests/test_search.py::test_search_plan_shape), the full-outer RRF
    # fusion (full outer cannot broadcast: SMJ + two exchanges) and
    # the phrase mode's rank window contribute 4 real shuffles.
    # r14 CONSCIOUS RE-PIN (8 → 22): the two topk cuts merged into ONE
    # mode-tagged union cut and the snippet leg dropped its own
    # checkpoint round-trip (OPTIMIZATION_r14.md — isolated warm
    # median 6.08 → 4.96 s, rows bit-identical, pinned in
    # test_r14_opt.py). best_snippet's window argmax + its
    # (query, doc)-bounded joins — 7 more real shuffles over
    # ≤ |queries|·k-row frames — moved OUT of a hidden build-time cut
    # job INTO the final action, so the statically visible count rose
    # while the executed shuffle/materialization count fell: 11 real
    # shuffles, doubled by the formatted tree+detail counting
    "text_search": (22, 2),
    # r7 rotation: merged mode-tagged entries — time_convert is two
    # row-local converter scans unioned (zero shuffles by design);
    # fingerprint_dedup = exact-dedup groupBy + broadcast simhash band
    # join
    "time_convert": (0, 0),
    "fingerprint_dedup": (4, 2),
    # r7: four sketch pipelines under one tag (kmv distinct+top-k, hll
    # register fold, cms explode-groupBy + broadcast probe, quantile
    # hit-bucket window) — 7 real shuffles doubled by formatted
    # counting; the cms/quantile probe sides must broadcast. r8: the
    # kmv_set estimate rows read a checkpointed 1-row frame (its two
    # synopsis jobs run eagerly at build time) while gquantile adds a
    # group-key window and hll_by the (group, bucket) register fold —
    # two more real shuffles
    "sketches": (20, 4),
    # pagerank's iterations run eagerly through cut_lineage — the
    # bench entry is a projection over the final checkpoint scan.
    "pagerank": (0, 0),
    # r8: the REGISTRY slot adds triangles + kcore modes — wedge join
    # + closing-edge probe over the checkpointed oriented frame, the
    # final k-core degree join, and the co-purchase edge build (its
    # hot-size frame must broadcast); the per-round peels run eagerly
    # behind cut_lineage so they never stack into the static plan.
    # r9: the hits mode adds 5 real shuffles — the hub/auth join, the
    # max aggregate, and the post-checkpoint tail of the last
    # iteration (earlier iterations run eagerly behind cut_lineage).
    # r12: the triangles input-lineage cut (operators/triangles.py —
    # canonical edges materialized ONCE, shared by the wedge pipeline
    # and the degree table) nearly halved the static plan: 62→34
    # formatted exchanges; the remaining joins read stats-free
    # checkpoint scans, so the static shape is SMJ (AQE re-plans the
    # tiny sides to broadcast at runtime — the minhash_dedup pattern),
    # hence the broadcast floor drops to 0
    "graph_iter": (34, 0),
    # r7: text_metrics + LM perplexity under one tag — metrics'
    # corpus-freq fold + the _spread repartition + the per-doc scoring
    # fold (4 real shuffles, doubled); the bounded LM model frames
    # must broadcast (pin moved here from PIN_FN in r9 — it sat in the
    # wrong dict and never ran). r9: the dsir mode adds 3 real
    # shuffles (per-doc decimal score fold, the zero-fill join back to
    # the corpus, the global resampling-rank window over narrow
    # (id, score) rows) and the λ table must broadcast (+2 bhj with
    # the zero-fill side); +1 more real shuffle for the pre-explode
    # spread (a single-file corpus scan must not run the gram-hash
    # flatMap on one core — the deliberate trade recorded in
    # operators/dsir.py). r10: the qfilter mode adds 3 real shuffles
    # (the scoring leg's spread repartition, the per-doc logit fold,
    # the zero-fill id join) with the dec9 weight table broadcast —
    # the TRAINING epochs run eagerly at build time and never enter
    # this static plan
    "text_quality": (22, 13),
    # r9 first-class bench entries: triangles = co-purchase edge build
    # + degree orientation + wedge join + closing-edge probe + the
    # per-node stats joins; kcore = the final alive∩degree join over
    # checkpointed per-round peels (the rounds themselves run eagerly
    # behind cut_lineage). r12: the triangles input-lineage cut
    # (canonical edges materialized ONCE before orient/stats) moved
    # the edge build behind an eager checkpoint — the static plan is
    # now the stats tail over checkpoint scans (44→4 formatted
    # exchanges; stats-free scans plan SMJ, AQE broadcasts at runtime)
    "triangles": (4, 0),
    "kcore": (22, 0),
    # r12: the text_quality composite decomposed into its four legs,
    # each timed first-class in bench.py (VERDICT r11 task 1) — the
    # registry slot's 4-way union keeps its own (22, 13) pin above.
    # text_metrics: one corpus-freq fold + the per-doc scan joins (2
    # real shuffles; the freq table and mtf join sides broadcast);
    # text_lm: the bounded LM model frames broadcast, per-doc scoring
    # fold (2 real shuffles); text_dsir: spread repartition + per-doc
    # decimal score fold + zero-fill id join + the global resampling
    # rank window (4 real shuffles, λ broadcast); text_qfilter: the
    # scoring leg's spread + per-doc logit fold + zero-fill join (3
    # real shuffles, dec9 weights broadcast — training epochs run
    # eagerly at build time, never in this static plan)
    "text_metrics": (4, 6),
    "text_lm": (4, 4),
    "text_dsir": (8, 2),
    "text_qfilter": (6, 2),
    # r12: five-model multi-touch attribution (VERDICT r11 task 2) —
    # the reworked plan is ONE window pass over (conv, ts, touch_id)
    # + ONE grouped aggregate folding all five models + the stack()
    # unpivot: 2 real shuffles, journey-bounds frame broadcast. The
    # single-Sort property is pinned separately below.
    "attribution": (4, 2),
    # r10: the threshold-cut selection — the RETURNED plan is a pure
    # codegen filter over the scan: ZERO exchanges, zero windows, zero
    # single-partition stages (the probe jobs run eagerly before the
    # plan exists); test_selection.py additionally pins the
    # no-Window/no-SinglePartition property explicitly
    "wsample_select": (0, 0),
}

# pins whose name must resolve to a SPECIFIC module function — the
# default resolution prefers the (possibly mode-merged) registry entry,
# but 'pagerank' the bench entry and 'pagerank' the registry slot are
# different plans (the q_pagerank/q_graph_iter split)
PIN_FN = {
    "pagerank": "q_pagerank",
    "graph_iter": "q_graph_iter",
    # bench times the one-scan stats core (bench.py resolves
    # q_lineitem_numeric_profile); the registry slot is the 3-mode
    # merge (stats+corr+skew) whose extra pipelines aren't the pinned
    # bench plan — same split as pagerank/graph_iter
    "lineitem_numeric_profile": "q_lineitem_numeric_profile",
    # bench-only r9 entries shadowed by no registry slot, but listed
    # for explicitness (default resolution would find them anyway)
    "triangles": "q_triangles",
    "kcore": "q_kcore",
    # r13: the bench-timed unmerged TPC-H cores (see PLAN_PINS note)
    "tpch_q1_core": "q_tpch_q1",
    "tpch_q3_core": "q_tpch_q3",
    "tpch_q5_core": "q_tpch_q5",
    "tpch_q18_core": "q_tpch_q18",
}


@pytest.mark.parametrize("name", sorted(PLAN_PINS))
def test_bench_query_shuffle_pins(spark, entry, name):
    max_ex, min_bhj = PLAN_PINS[name]
    if name in PIN_FN:
        fn = getattr(entry, PIN_FN[name])
    else:
        fn = entry.queries().get(name) or getattr(entry, "q_" + name)
    plan = explain(fn(spark, "/root/testdata/sf0.001"))
    n_ex = shuffle_count(plan)
    n_bhj = plan.count("BroadcastHashJoin")
    assert n_ex <= max_ex, (
        f"{name}: {n_ex} shuffle exchanges in plan, pinned max {max_ex} — "
        "a new shuffle crept in; fix it or consciously re-pin"
    )
    assert n_bhj >= min_bhj, (
        f"{name}: {n_bhj} broadcast joins, pinned min {min_bhj} — a "
        "dimension/broadcast side stopped broadcasting"
    )


def test_attribution_single_sort(spark, entry):
    """The r11 attribution rework computes all five models off ONE
    window sort — the descending rank is `n + 1 − ra` over the single
    ascending (ts, touch_id) order, exact because that pair is a total
    order — and folds them in ONE grouped aggregate + `stack()`
    unpivot (operators/temporal.py:629-700). Pin the single-Sort
    property: a reintroduced descending window or a return to the
    5-branch per-model union would add Sort/aggregate operators here
    (VERDICT r11 task 2)."""
    plan = explain(entry.q_attribution(spark, "/root/testdata/sf0.001"))
    # formatted mode prints tree + detail, doubling operator mentions:
    # 2 == exactly one physical Sort
    assert len(re.findall(r"\bSort\b", plan)) == 2, (
        "attribution must rank through exactly one Sort — the "
        "descending rank is derived (n + 1 - ra), never a second sort"
    )


# Bench entries that are not single DataFrame queries, pinned at their
# dominant component plan (b1_schema_inference is a driver loop of
# single-agg profiling passes — its scan pruning is gated by
# test_profiler_prunes_scan_columns above; b5's MLlib `.fit` is out of
# plan-pin scope, its assembled feature frame is the hot plan).
def test_b2_graph_build_edge_plans(db):
    from deep_db_learning_spark.operators.graph import build_hetero_graph

    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys)
    plan = explain(g.edges["lineitem__l_orderkey__orders"])
    assert shuffle_count(plan) <= 2
    assert plan.count("BroadcastHashJoin") >= 2
    plan = explain(g.edges["orders__o_custkey__customer"])
    assert shuffle_count(plan) == 0
    assert plan.count("BroadcastHashJoin") >= 2


def test_b4_neighbor_sampling_plan(db):
    from deep_db_learning_spark.operators.graph import build_hetero_graph
    from deep_db_learning_spark.operators.sampling import sample_neighbors

    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys, add_reverse=False)
    plan = explain(
        sample_neighbors(g.edges["orders__o_custkey__customer"], k=50, seed=42)
    )
    assert shuffle_count(plan) <= 2
    assert plan.count("BroadcastHashJoin") >= 2


def test_b5_feature_frame_plan(db):
    from deep_db_learning_spark.operators.graph import build_hetero_graph
    from deep_db_learning_spark.plans.pipeline import build_node_features
    from deep_db_learning_spark.profiling import SchemaAnalyzer

    schema = SchemaAnalyzer(
        db.tables,
        db.primary_keys,
        db.foreign_keys,
        target=("customer", "c_mktsegment"),
        target_type="cat",
    ).guess_schema()
    g = build_hetero_graph(db.tables, db.primary_keys, db.foreign_keys)
    feats = build_node_features(
        g, schema, "customer", depth=1, exclude=(("customer", "c_mktsegment"),)
    )
    plan = explain(feats)
    assert shuffle_count(plan) <= 4
    assert plan.count("BroadcastHashJoin") >= 8


def test_stack_batch_pruning_broadcasts(db, spark):
    """The stack trainer's per-step scale posture (VERDICT r4 #2): the
    batch-key semi-join and the gradient-frame join must BROADCAST the
    tiny side (a shuffled semi-join per SGD step would dominate at
    cluster scale), and the forward fold's only shuffle is the
    per-parent aggregation."""
    import numpy as np
    from dataclasses import replace

    from pyspark.sql import functions as F

    from deep_db_learning_spark.plans.stack import (
        ORDERS_LAYER_SPEC,
        _assemble_child_frame,
        _join_gradient,
        _layer_forward_frame,
    )

    from deep_db_learning_spark.checkpoint import cut_lineage

    spec = replace(ORDERS_LAYER_SPEC, neighbor_budget=5)
    of, card1 = _assemble_child_frame(db.tables, spec, seed=42)
    # the trainer materializes the assembled frame once (cut_lineage);
    # per-step plans start from that scan
    of = cut_lineage(of, eager=True)
    keys_df = F.broadcast(
        spark.createDataFrame([(i,) for i in range(10)], "parent_key bigint")
    )
    pruned = of.join(keys_df, "parent_key", "leftsemi")
    plan = explain(pruned)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    rng = np.random.default_rng(0)
    E1 = rng.uniform(-0.5, 0.5, size=(card1, spec.emb_dim))
    W1 = rng.uniform(-0.5, 0.5, size=(spec.emb_dim + spec.n_feats, 4)) * 0.1
    fwd = _layer_forward_frame(pruned, E1, W1, np.zeros(4), 4)
    plan = explain(fwd)
    # exactly one hash aggregate pair over parent_key beyond the semi
    # join — no extra exchange sneaks between the UDF and the fold
    assert shuffle_count(plan) <= 2

    g_frame = F.broadcast(
        spark.createDataFrame(
            [(i, [0.1] * 4, 2) for i in range(10)],
            "key bigint, gout array<double>, gdeg bigint",
        )
    )
    joined = _join_gradient(pruned, g_frame)
    plan = explain(joined)
    assert plan.count("BroadcastHashJoin") >= 2  # semi + gradient joins
