"""k-core extraction — iterative degree peeling on FK-derived graphs.

The k-core is the maximal subgraph where every node keeps degree ≥ k —
the standard "dense backbone" primitive (spam rings, community cores,
curriculum selection of well-connected training examples). Peeling is
the fixpoint of: drop every node with induced degree < k, recompute.

Determinism/oracle contract: two modes (r9 closes the r8 sharp edge
of a silently under-provisioned fixed round count).

- **Convergence mode** (``iters=None``, the default): peel until the
  alive count is stable — the alive set only shrinks, so an unchanged
  COUNT means an unchanged SET, i.e. the exact fixpoint. The loop is
  bounded by ``max_iters`` and RAISES if it hasn't converged by then
  (loud, never a silent superset). One bounded ``count()`` action per
  round is the only driver state. ``return_rounds=True`` also returns
  the number of peel rounds executed, which is exactly the ``iters``
  an unrolled-CTE oracle twin needs to replay the trajectory.
- **Fixed mode** (``iters=n``): run exactly ``n`` peel rounds — the
  fixpoint is monotone, so any count at-or-past convergence returns
  the exact k-core; this is what lets the DuckDB twin replay the
  computation as ``n`` unrolled CTE stages (the ``labelprop`` oracle
  pattern). Tests pin that the result IS the fixpoint (one more round
  changes nothing) at the pinned ``iters``.

Scale shape: each round is one groupBy (induced degrees) + two semi
joins (filter both edge endpoints), all shuffling on the node key —
co-partitionable, no driver state beyond the loop counter; lineage is
cut every two rounds (the pagerank cadence). Peeling converges in
O(peeling depth) rounds, which is small for power-law graphs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_count, cut_lineage

# Scale-adaptive join-strategy gate (r14, guide §3.1): the alive set
# is node-sized (one BIGINT per surviving node, only ever shrinking),
# so at or below this count it is broadcast into both per-round semi
# joins — the full edge set is then never shuffled by the peel, only
# scanned and filtered map-side; the induced-degree groupBy becomes
# the round's single exchange. 8M nodes ≈ 64 MB framed, far under the
# broadcast caps on production executors; above the gate the peel
# falls back to the shuffled semi joins. Override per deployment.
BROADCAST_MAX_NODES = int(
    os.environ.get("DDL_GRAPH_BROADCAST_MAX_NODES", "8000000")
)

# Count-derived partitioning for the node-sized per-round state (r15,
# guide §2.1/§2.2): the alive frame is (node, deg) BIGINT pairs — ~16
# bytes a row — so 4M rows land a post-shuffle partition in the
# guide's 64-256 MB band. Without the coalesce each per-round cut
# materializes the session's full shuffle-partition count of near-
# empty tasks (checkpoint materialization bypasses AQE's runtime
# coalescing), and every downstream job over the state re-pays that
# task floor — the reason kcore ran 3x FASTER on 8 cores than 32 at
# bench scale (PERF_r14 scaling ratio 0.32). Scale-adaptive: the
# partition count is ceil(previous alive count / this), never a
# constant tuned to the local core count.
NODE_ROWS_PER_PARTITION = int(
    os.environ.get("DDL_NODE_ROWS_PER_PARTITION", "4000000")
)

# Count-derived width for the per-round EDGE scans (r15, guide
# §2.1/§2.2): the peel re-scans the full checkpointed edge frame every
# round (two broadcast semi joins + the degree aggregate), so its task
# count is paid rounds× — at bench scale the frame arrives at the
# session's shuffle width (32 near-empty tasks × 6 rounds of pure task
# floor; measured 4.2 s → 2.1 s peel with the scan coalesced). 8M edge
# rows ≈ 128-200 MB tungsten (two BIGINTs a row) — the guide's
# per-task band — so the width is ceil(edge count / this), never a
# local-core-count constant.
EDGE_ROWS_PER_PARTITION = int(
    os.environ.get("DDL_EDGE_ROWS_PER_PARTITION", "8000000")
)


def _node_parts(n: int) -> int:
    return max(1, -(-n // NODE_ROWS_PER_PARTITION))


def _edge_parts(m: int) -> int:
    return max(1, -(-m // EDGE_ROWS_PER_PARTITION))


def _induced_degrees(und: DataFrame) -> DataFrame:
    # explode, not unionAll (r15, guide §2.4): the union form plans the
    # edge-filter subtree TWICE (one copy per endpoint column), so each
    # peel round scanned the edge set and ran its two semi joins twice;
    # the explode emits both endpoints in ONE pass — same multiset of
    # nodes, identical aggregate
    return (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    iters: int | None = None,
    max_iters: int = 32,
    return_rounds: bool = False,
):
    """Nodes of the k-core with their induced degree in the surviving
    subgraph: ``(node, core_degree)``. With ``iters=None`` (default)
    peeling runs to the detected fixpoint (bounded by ``max_iters``,
    raising on non-convergence); with a fixed ``iters`` it runs
    exactly that many rounds (oracle-replay mode — pick it at-or-past
    convergence; see module docstring). A node whose neighbors all
    peeled away in the final round appears with ``core_degree`` 0.
    ``return_rounds=True`` returns ``(df, rounds)`` where ``rounds``
    is the peel-round count an unrolled oracle twin must replay.

    A :func:`~.triangles.canonical_cut` input is consumed as-is
    (r13): a caller fanning one edge frame into several graph
    operators pays ONE distinct + checkpoint total, not one per
    operator."""
    from .triangles import canonical_cut

    und = canonical_cut(edges)
    # narrow the per-round edge scan to a count-derived width (r15,
    # guide §2.1): the count is one cheap job over the checkpointed
    # frame, the coalesce is narrow (no shuffle), and every round's
    # scan then launches ceil(m / EDGE_ROWS_PER_PARTITION) tasks
    # instead of the session's shuffle width of near-empty ones
    und = und.coalesce(_edge_parts(und.count()))
    # materialize + count the initial alive set in ONE node-sized job
    # (r15, cut_count): the count drives the broadcast gate — alive
    # only shrinks, so one decision holds for every round (r14). The
    # state KEEPS its deg column (r15): at a detected fixpoint the
    # carried degree IS the induced core degree (see below), so
    # convergence mode needs no final edge-set pass at all.
    alive, n0 = cut_count(_induced_degrees(und).filter(F.col("deg") >= k))
    bcast = n0 <= BROADCAST_MAX_NODES
    rounds = 1

    def filtered(alive):
        # ONE alive-side frame probed by BOTH endpoint semi joins: the
        # identical broadcast subtree is built once and reused
        # (ReusedExchange) instead of shipping two per-column aliases
        # of the same node set every round (r15, guide §2.4)
        s = alive.select("node")
        if bcast:
            s = F.broadcast(s)
        return und.join(s, F.col("a") == F.col("node"), "leftsemi").join(
            s, F.col("b") == F.col("node"), "leftsemi"
        )

    def peel(alive, n_prev):
        # cut EVERY round: the alive frame is node-sized (tiny next to
        # the edges) and each uncut round would otherwise stack two
        # semi joins + an aggregate into one enormous static plan.
        # Coalesce to a count-derived partition number first so the
        # materialization (and every later scan of the state) is a
        # handful of tasks, not the session's shuffle-partition count
        # of near-empty ones (r15, guide §2.1).
        return (
            _induced_degrees(filtered(alive))
            .filter(F.col("deg") >= k)
            .coalesce(_node_parts(n_prev))
        )

    if iters is not None:
        for _ in range(iters - 1):
            alive = cut_lineage(peel(alive, n0), eager=True)
        rounds = iters
        # fixed mode may stop SHORT of convergence (the oracle-replay
        # contract): the carried deg is the degree in the PREVIOUS
        # round's subgraph, so the induced degree must be recomputed
        # over the final surviving edge set
        final = filtered(alive)
        out = alive.join(
            _induced_degrees(final).withColumnRenamed("deg", "core_degree"),
            "node",
            "left",
        ).select(
            "node", F.coalesce("core_degree", F.lit(0)).alias("core_degree")
        )
        return (out, rounds) if return_rounds else out
    prev = n0
    while True:
        if rounds >= max_iters:
            raise RuntimeError(
                f"k_core: no fixpoint within max_iters={max_iters} "
                f"peel rounds (alive={prev}) — raise max_iters"
            )
        # materialize + fixpoint-count in ONE job per round (r15,
        # cut_count — formerly a checkpoint job plus a count job)
        alive, cur = cut_count(peel(alive, prev))
        rounds += 1
        if cur == prev:
            # the alive set only shrinks: equal count == equal set ==
            # fixpoint (the confirming round is a no-op peel). At the
            # fixpoint alive_n == alive_{n-1}, so the subgraph the
            # carried deg was measured in (und ∩ alive_{n-1}) IS the
            # final core subgraph (und ∩ alive_n): deg == core_degree,
            # and every survivor has deg >= k >= 1, so the old
            # zero-coalesce left join is unreachable here — the
            # answer is the state frame itself, no edge pass (r15)
            break
        prev = cur
    out = alive.select("node", F.col("deg").alias("core_degree"))
    return (out, rounds) if return_rounds else out


def k_core_oracle_sql(edges_sql: str, k: int, iters: int = 8) -> str:
    """DuckDB twin of :func:`k_core`: the same ``iters`` peel rounds
    unrolled as CTE stages over an edge CTE producing ``(a, b)``.
    Stages are MATERIALIZED — DuckDB inlines plain CTEs at every use
    site, which re-opens the source parquet once per reference and
    exhausts file handles on a deep unroll."""
    parts = [
        f"und AS MATERIALIZED (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b "
        f"FROM ({edges_sql}) WHERE a <> b)",
        f"a0 AS MATERIALIZED (SELECT node FROM (SELECT node, count(*) AS deg FROM ("
        f"SELECT a AS node FROM und UNION ALL SELECT b FROM und) "
        f"GROUP BY node) WHERE deg >= {int(k)})",
    ]
    prev = "a0"
    for i in range(1, iters):
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT a, b FROM und WHERE a IN (SELECT node FROM {prev}) "
            f"AND b IN (SELECT node FROM {prev}))"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node FROM (SELECT node, count(*) AS deg FROM ("
            f"SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i}) "
            f"GROUP BY node) WHERE deg >= {int(k)})"
        )
        prev = f"a{i}"
    parts.append(
        f"ef AS MATERIALIZED (SELECT a, b FROM und WHERE a IN (SELECT node FROM {prev}) "
        f"AND b IN (SELECT node FROM {prev}))"
    )
    parts.append(
        "df AS (SELECT node, count(*) AS deg FROM ("
        "SELECT a AS node FROM ef UNION ALL SELECT b FROM ef) GROUP BY node)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT {prev}.node, coalesce(df.deg, 0) AS core_degree "
        f"FROM {prev} LEFT JOIN df ON {prev}.node = df.node"
    )
