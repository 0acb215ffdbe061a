"""Exact triangle counting + local clustering coefficients.

Graph analytics over FK-derived graphs beyond the iterative pair
(``pagerank.py`` / ``labelprop.py``): triangles are the primitive
behind clustering coefficients, community seeding, and spam/bot
detection on co-occurrence graphs — a training-data pipeline uses them
to score how "clumped" a domain/author/product neighborhood is.

Algorithm (the standard distributed one — Schank & Wagner 2005 degree
orientation; the MapReduce formulation of Suri & Vassilvitskii 2011):

1. canonicalize to undirected simple edges ``a < b``;
2. compute degrees, and ORIENT every edge from its lower-``(degree,
   id)`` endpoint to the higher — a total order, so each triangle
   ``u → v → w`` has exactly ONE orientation with both wedge edges
   leaving ``u``;
3. wedge join: pairs of out-edges ``(u→v, u→w)`` with ``key(v) <
   key(w)``; a triangle exists iff the closing oriented edge ``v→w``
   exists — one equi-join against the edge set.

Why this scales: orientation bounds every out-neighborhood by
O(√m) (a node of degree d only keeps out-edges to HIGHER-degree
nodes, and there are at most 2√m nodes of degree ≥ √m), so the wedge
join materializes O(m^1.5) candidates worst-case instead of
Σ d(v)² — the difference between feasible and not on a power-law
graph at 100 TB. Everything is joins + groupBys on key columns
(co-partitionable, AQE-skew-splittable); the only driver value is the
final count.

The ``(degree, id)`` key packs into ONE BIGINT (``degree·2³² + id``)
so the orientation comparison stays a single integer comparison in
whole-stage codegen — and the DuckDB oracle replays the identical
arithmetic (integer-exact end to end).

Co-purchase graph builder: ``cooccurrence_edges`` turns a fact table
(order → items) into item-item edges. Groups wider than
``max_per_group`` are EXCLUDED-AND-RETURNED rather than silently
joined (the ``linkage.candidate_pairs`` hot-block contract) — one
degenerate 10⁵-item order would otherwise contribute 10¹⁰ pairs.

Reference parity: the reference has no graph analytics (its graphs
feed GNN message passing only) — this extends SURVEY §2's J/A families
the same way pagerank/labelprop do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK = 4294967296  # 2^32 — node ids must be non-negative and below
# this for the packed (degree, id) key to order correctly; FK-derived
# keys in this engine are (see operators/graph.py mint_node_ids).
# r15 (ADVICE r14 #1): the PAIR keys (v·2³² + w in the wedge probe)
# additionally need v < 2³¹ — a signed-int64 product of a ≥ 2³¹ id
# overflows (throws under ANSI mode, wraps otherwise). mint_node_ids
# keeps ids dense from 0, so the bound binds only past ~2.1e9 NODES;
# guarded loudly in _triangles_from_und, piggybacked on the
# broadcast-gate count job (no extra action).

# Scale-adaptive join-strategy gate (r14, guide §3.1): when the
# materialized edge count is at or below this, the edge-sized build
# sides (the packed closing-edge set in the wedge probe, the
# node-sized degree table in the orient stage) are explicitly
# broadcast — the closing probe then never shuffles the O(m^1.5)
# wedge set at all (measured sf0.1: 16.3 s → 2.7 s for the same
# 41M-wedge probe). Above the gate the probe falls back to a shuffled
# semi join on the PACKED single-BIGINT pair key (still ~2× the old
# two-column shuffle: half the key bytes, one comparison). 8M edges
# ≈ 64 MB of packed longs framed — comfortably under Spark's 8 GB /
# 512M-row broadcast cap on production executors; override per
# deployment via the env var.
BROADCAST_MAX_EDGES = int(
    os.environ.get("DDL_GRAPH_BROADCAST_MAX_EDGES", "8000000")
)


def cooccurrence_edges(
    facts: DataFrame,
    group_col: str,
    item_col: str,
    max_per_group: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Item-item co-occurrence edges from a (group → item) fact table:
    one undirected edge ``(a, b), a < b`` per item pair sharing a
    group, deduplicated across groups. Returns ``(edges, hot)`` where
    ``hot`` lists the excluded groups wider than ``max_per_group``
    (returned as data, never silently dropped — a pathological group
    is quadratic in its width)."""
    # ONE group-keyed exchange feeds the whole pre-pair chain (r15,
    # guide §2.4): hash partitioning on __g is a valid clustering for
    # the (__g, __i) dedup, the per-group size aggregate AND the pair
    # self-join, so the former three shuffles (distinct on the pair
    # key, groupBy __g, join re-exchange on __g) collapse into this
    # single repartition — the dedup and size aggregates run
    # partition-local and the self-join needs only local sorts. Group
    # width pre-dedup is bounded by the fact table's per-group row
    # count (items, not pairs — the quadratic blowup is what the hot
    # cap below excludes), so the partitioning skews only if the
    # source does.
    items = (
        facts.select(
            F.col(group_col).alias("__g"), F.col(item_col).alias("__i")
        )
        .repartition("__g")
        .dropDuplicates(["__g", "__i"])
    )
    sizes = items.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    hot = sizes.filter(F.col("__n") > max_per_group)
    ok = items.join(F.broadcast(hot.select("__g")), "__g", "left_anti")
    a = ok.select(F.col("__g"), F.col("__i").alias("a"))
    b = ok.select(F.col("__g"), F.col("__i").alias("b"))
    # explicit-width final dedup (r15, guide §2.5-adjacent): the edge
    # frame feeds CPU-bound superlinear consumers (the O(m^1.5) wedge
    # generation, the per-round peel scans), so its partition count
    # must track the session's compute width, not AQE's byte-targeted
    # coalescing — the ~30 MB sf0.1 frame otherwise lands on ~10
    # partitions and serializes every map-side stage built on it. The
    # session shuffle-partition setting is the deployment's scale knob
    # (make_session: 2-3x cores locally, sized per cluster), so an
    # explicit repartition at that width stays scale-adaptive.
    n_shuf = int(facts.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        a.join(b, "__g")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .repartition(n_shuf, "a", "b")
        .dropDuplicates(["a", "b"])
    )
    # this construction IS canonical (a < b, simple, deduplicated) —
    # tag it so canonical_cut skips its re-distinct, a full redundant
    # shuffle of the pair set otherwise (r14; __dict__ for the same
    # Column-shadowing reason as is_canonical_cut)
    edges._ddl_canonical_form = True
    return edges, hot.select(
        F.col("__g").alias(group_col), F.col("__n").alias("n_items")
    )


def _canonical_und(edges: DataFrame) -> DataFrame:
    """Undirected simple edges ``a < b``, deduplicated."""
    return (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def is_canonical_cut(edges: DataFrame) -> bool:
    """True iff ``edges`` was produced by :func:`canonical_cut` — i.e.
    it is ALREADY canonical (``a < b``, simple, deduplicated) AND its
    lineage is already materialized. Read via ``__dict__`` (the
    ``spread_input`` lesson: ``DataFrame.__getattr__`` resolves
    unknown attributes to COLUMNS, so a column literally named
    ``_ddl_canonical_cut`` must not look like the tag)."""
    return edges.__dict__.get("_ddl_canonical_cut") is True


def canonical_cut(edges: DataFrame) -> DataFrame:
    """Canonicalize ``edges(a, b)`` to undirected simple form and
    materialize the result ONCE, tagging the frame so every consumer
    (:func:`triangles`, :func:`triangle_stats`,
    :func:`~..kcore.k_core`) skips its own re-canonicalization — a
    full distinct shuffle + a second checkpoint write of the whole
    edge set per consumer otherwise (ADVICE r12: canonical-of-
    canonical is the identity, but it is NOT free). A caller fanning
    one edge frame into several graph operators should pass it
    through here first; passing raw edges directly to each operator
    stays correct (each cuts internally) and merely pays the
    per-consumer materialization."""
    from ..checkpoint import cut_lineage

    if is_canonical_cut(edges):
        return edges
    # an already-canonical construction (cooccurrence_edges) skips the
    # re-canonicalization — canonical-of-canonical is the identity, and
    # the distinct it would re-run is a full shuffle of the edge set
    if edges.__dict__.get("_ddl_canonical_form") is True:
        out = cut_lineage(edges, eager=True)
    else:
        out = cut_lineage(_canonical_und(edges), eager=True)
    out._ddl_canonical_cut = True
    return out


def _oriented(und: DataFrame, n_edges: int | None = None) -> DataFrame:
    """Canonical undirected edges → degree-oriented edges with packed
    ``(degree·2³² + id)`` keys: ``(src, dst, src_key, dst_key)`` with
    ``src_key < dst_key``. Input MUST already be canonical (``a < b``,
    simple, deduplicated) — both callers guarantee it
    (:func:`_triangles_from_und` via :func:`canonical_cut`, the 100×
    probe via :func:`cooccurrence_edges`' construction), so the
    defensive re-distinct this used to run was a full extra shuffle of
    the edge set inside every wedge plan (removed r13).

    ``n_edges``: the materialized edge count when the caller knows it
    (cheap — the input is checkpointed); at or below
    :data:`BROADCAST_MAX_EDGES` the node-sized degree table (≤ 2m
    nodes) is broadcast into both key-attach joins, so the edge set is
    never shuffled by the orient stage (r14, guide §3.1)."""
    # explode, not unionAll (r15): the union form scans the edge frame
    # twice (one copy per endpoint column); explode emits both
    # endpoints in one pass — identical counts
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # ONE packed-key side probed by BOTH endpoint joins (r15, guide
    # §2.4): the identical broadcast subtree is built once and reused
    # (ReusedExchange) instead of collecting two per-column aliases of
    # the same degree table
    degk = deg.select(
        "node", (F.col("deg") * F.lit(PACK) + F.col("node")).alias("k")
    )
    if n_edges is not None and n_edges <= BROADCAST_MAX_EDGES:
        degk = F.broadcast(degk)
    keyed = (
        und.join(degk, F.col("a") == F.col("node"))
        .select("a", "b", F.col("k").alias("ka"))
        .join(degk, F.col("b") == F.col("node"))
        .select("a", "b", "ka", F.col("k").alias("kb"))
    )
    return keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.least("ka", "kb").alias("src_key"),
        F.greatest("ka", "kb").alias("dst_key"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles of the undirected simple graph, one row each:
    ``(u, v, w)`` — the degree-orientation guarantees each triangle
    appears exactly once, with ``u`` the lowest-``(deg, id)`` corner.
    Input ``edges(a, b)`` need not be canonical; self-loops drop.

    The INPUT lineage is materialized once up front (r12): ``edges``
    often arrives as an expensive un-materialized plan (the
    ``cooccurrence_edges`` pair join over the fact table), and the
    orient stage consumes it three times — without the cut, the 100×
    fixed-dims probe recomputed the facts→pairs→distinct chain per
    consumer (the k_core entry always had this cut; the r12 probe
    caught the asymmetry). A :func:`canonical_cut` input is consumed
    as-is (r13): no second distinct, no second checkpoint write."""
    return _triangles_from_und(canonical_cut(edges))


def _triangles_from_und(und: DataFrame) -> DataFrame:
    """Wedge join + closing-edge probe over an ALREADY-MATERIALIZED
    canonical edge frame.

    r14 probe shape (guide §3.1/§2.3): the wedge set is O(m^1.5) —
    at sf0.1 41M rows against 1.2M edges — so the closing-edge probe
    must never shuffle it. The closing pair is packed into ONE BIGINT
    (``v·2³² + w``; ids are < 2³² by the PACK contract) and the
    edge-sized closing side is broadcast below
    :data:`BROADCAST_MAX_EDGES` (the count of the checkpointed input
    is one cheap job), making the probe a map-side broadcast semi join
    — measured 16.3 s → 2.7 s on the same wedge set. Above the gate
    the semi join shuffles, but on the packed single key: half the
    bytes of the old (v, w) two-column exchange (measured 8.7 s)."""
    from ..checkpoint import cut_lineage

    # ONE cheap job over the checkpointed input: the broadcast-gate
    # count, plus the max node id for the pair-pack guard (r15, ADVICE
    # r14 #1 — v·2³² + w needs v < 2³¹ or the signed-int64 product
    # overflows: ANSI throws mid-query, non-ANSI silently wraps)
    row = und.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.greatest("a", "b")).alias("mx"),
    ).first()
    n_edges = row["n"]
    if row["mx"] is not None and row["mx"] >= PACK // 2:
        raise ValueError(
            f"triangles: max node id {row['mx']} >= 2^31 — the packed "
            "pair key v*2^32 + w would overflow int64; re-mint ids "
            "(operators/graph.mint_node_ids keeps them dense from 0)"
        )
    # the oriented frame is consumed THREE times (both wedge sides +
    # the closing-edge probe) — materialize once or the plan recomputes
    # the degree/orient chain per consumer
    o = cut_lineage(_oriented(und, n_edges=n_edges), eager=True)
    e1 = o.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("dst_key").alias("kv"),
    )
    e2 = o.select(
        F.col("src").alias("u"),
        F.col("dst").alias("w"),
        F.col("dst_key").alias("kw"),
    )
    # r15 (guide §3.1): under the same edge gate, broadcast one side
    # of the wedge self-join too — the edge-sized build side replaces
    # the two u-keyed exchanges + sorts that previously fed the
    # O(m^1.5) wedge set, so wedge generation AND the closing probe
    # run as one map-side chain with zero exchanges over the
    # checkpointed oriented frame
    if n_edges <= BROADCAST_MAX_EDGES:
        e2 = F.broadcast(e2)
    wedges = (
        e1.join(e2, "u")
        .filter(F.col("kv") < F.col("kw"))
        .select(
            "u", "v", "w", (F.col("v") * F.lit(PACK) + F.col("w")).alias("vw")
        )
    )
    closing = o.select(
        (F.col("src") * F.lit(PACK) + F.col("dst")).alias("vw")
    )
    if n_edges <= BROADCAST_MAX_EDGES:
        closing = F.broadcast(closing)
    return wedges.join(closing, "vw", "leftsemi").select("u", "v", "w")


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient:
    ``(node, degree, n_triangles, clustering)`` with ``clustering =
    2·T / (d·(d−1))`` for ``d ≥ 2`` (NULL below — undefined, not 0; a
    degree-1 node has no potential wedges). Nodes of the graph with
    zero triangles still appear (left join against the degree table).
    Exact integer counts; the single division is double and
    deterministic."""
    from ..checkpoint import cut_lineage

    # ONE materialization of the (possibly expensive) input lineage,
    # shared by the triangle pipeline AND the degree table below (r12:
    # the degree table previously re-derived from the raw edges plan,
    # re-running the whole cooccurrence pair join in the final job);
    # a canonical_cut input passes straight through (r13)
    und = canonical_cut(edges)
    # materialized: the probe chain above it is expensive (r12); the
    # corner fan-out below reads it once via explode (r15 — the former
    # 3-way union planned the scan three times)
    tri = cut_lineage(_triangles_from_und(und), eager=True)
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    j = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
    )
    d = F.col("degree").cast("double")
    return j.select(
        "node",
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            F.lit(2.0) * F.col("n_triangles").cast("double") / (d * (d - 1)),
        ).alias("clustering"),
    )


def cooccurrence_oracle_sql(
    table: str, group_col: str, item_col: str, max_per_group: int = 1000
) -> str:
    """DuckDB CTE producing the same canonical co-occurrence edges
    (hot groups excluded with the same cap)."""
    return f"""
        SELECT DISTINCT i1.__i AS a, i2.__i AS b
        FROM (SELECT DISTINCT {group_col} AS __g, {item_col} AS __i
              FROM {table}) i1
        JOIN (SELECT DISTINCT {group_col} AS __g, {item_col} AS __i
              FROM {table}) i2 ON i1.__g = i2.__g AND i1.__i < i2.__i
        WHERE i1.__g NOT IN (
          SELECT {group_col} FROM (
            SELECT DISTINCT {group_col}, {item_col} FROM {table})
          GROUP BY {group_col} HAVING count(*) > {int(max_per_group)})
    """


def triangle_stats_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_stats` over an edge CTE
    ``edges_sql`` producing ``(a, b)`` — the identical packed-key
    orientation arithmetic and wedge join, integer-exact."""
    return f"""
        WITH raw(a, b) AS ({edges_sql}),
        und AS (
          SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
          FROM raw WHERE a <> b
        ), deg AS (
          SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          GROUP BY node
        ), keyed AS (
          SELECT und.a, und.b,
                 d1.deg * {PACK} + und.a AS ka,
                 d2.deg * {PACK} + und.b AS kb
          FROM und
          JOIN deg d1 ON d1.node = und.a
          JOIN deg d2 ON d2.node = und.b
        ), o AS (
          SELECT CASE WHEN ka < kb THEN a ELSE b END AS src,
                 CASE WHEN ka < kb THEN b ELSE a END AS dst,
                 least(ka, kb) AS src_key, greatest(ka, kb) AS dst_key
          FROM keyed
        ), tri AS (
          SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
          FROM o e1 JOIN o e2
            ON e1.src = e2.src AND e1.dst_key < e2.dst_key
          WHERE EXISTS (
            SELECT 1 FROM o c WHERE c.src = e1.dst AND c.dst = e2.dst)
        ), per_node AS (
          SELECT node, count(*) AS n_triangles FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT v FROM tri
            UNION ALL SELECT w FROM tri)
          GROUP BY node
        )
        SELECT deg.node, deg.deg AS degree,
               coalesce(per_node.n_triangles, 0) AS n_triangles,
               CASE WHEN deg.deg >= 2 THEN
                 CAST('2.0' AS DOUBLE) * CAST(coalesce(per_node.n_triangles, 0) AS DOUBLE)
                 / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1))
               END AS clustering
        FROM deg LEFT JOIN per_node ON deg.node = per_node.node
    """
