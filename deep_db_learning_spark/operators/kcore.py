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

from ..checkpoint import cut_lineage

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


def _induced_degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
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
    # materialize + count the initial alive set in BOTH modes (two
    # node-sized jobs): the count drives the broadcast gate — alive
    # only shrinks, so one decision holds for every round (r14)
    alive = cut_lineage(
        _induced_degrees(und).filter(F.col("deg") >= k).select("node"),
        eager=True,
    )
    n0 = alive.count()
    bcast = n0 <= BROADCAST_MAX_NODES
    rounds = 1

    def side(alive, col):
        s = alive.select(F.col("node").alias(col))
        return F.broadcast(s) if bcast else s

    def peel(alive):
        sub = und.join(side(alive, "a"), "a", "leftsemi").join(
            side(alive, "b"), "b", "leftsemi"
        )
        # cut EVERY round: the alive frame is node-sized (tiny next to
        # the edges) and each uncut round would otherwise stack two
        # semi joins + an aggregate into one enormous static plan
        return cut_lineage(
            _induced_degrees(sub).filter(F.col("deg") >= k).select("node"),
            eager=True,
        )

    if iters is not None:
        for _ in range(iters - 1):
            alive = peel(alive)
        rounds = iters
    else:
        prev = n0
        while True:
            if rounds >= max_iters:
                raise RuntimeError(
                    f"k_core: no fixpoint within max_iters={max_iters} "
                    f"peel rounds (alive={prev}) — raise max_iters"
                )
            alive = peel(alive)
            rounds += 1
            cur = alive.count()
            if cur == prev:
                # the alive set only shrinks: equal count == equal set
                # == fixpoint (the confirming round is a no-op peel)
                break
            prev = cur
    final = und.join(side(alive, "a"), "a", "leftsemi").join(
        side(alive, "b"), "b", "leftsemi"
    )
    out = alive.join(
        _induced_degrees(final).withColumnRenamed("deg", "core_degree"),
        "node",
        "left",
    ).select(
        "node", F.coalesce("core_degree", F.lit(0)).alias("core_degree")
    )
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
