"""Label propagation over the FK graph — synchronous, integer-exact.

The companion to ``operators/pagerank.py`` for the second classic
iterative graph analysis: community detection (every node starts as
its own label) and semi-supervised label spreading (a few labeled
nodes, clamped, vote their neighborhoods) — the label-expansion shape
a training pipeline uses to grow a small labeled set along relational
structure.

Determinism is the whole design (the reason LPA is usually *not*
reproducible): updates are SYNCHRONOUS (round t+1 sees only round t),
and the per-node vote is resolved by the total order
``(count DESC, label ASC)`` — pure integer counts, no float, no
``rand()`` — so every round is bit-identical on any engine and the
DuckDB oracle (:func:`label_propagation_oracle_sql`, an unrolled CTE
chain with the same ``QUALIFY row_number`` tie-break) replays the
trajectory exactly: value-hash-checkable, not rows-only.

Scale shape per round: ONE join (edges ⋈ labels on src) + ONE
(dst, label) count groupBy + ONE row_number window on dst — all hash
partitioned on the node key; labels are lineage-cut per round so the
plan stays O(1) deep. Nodes with no in-edges keep their label (left
join + coalesce); clamped nodes never change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage

LP_CONFIG = {"iters": 5}


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    labels: DataFrame | None = None,
    iters: int | None = None,
    symmetrize: bool = True,
) -> DataFrame:
    """``edges``: (src, dst) BIGINT pairs; ``nodes``: (node) BIGINT —
    the full vertex set. ``labels``: optional (node, label BIGINT)
    seed frame — nodes present in it are CLAMPED (semi-supervised
    mode; absent nodes start unlabeled and take no part in votes until
    labeled). Without ``labels`` every node seeds as its own id
    (community mode). Returns (node, label).

    ``symmetrize``: vote along both edge directions (the usual LPA
    graph is undirected; parallel edges vote once per direction)."""
    iters = LP_CONFIG["iters"] if iters is None else iters
    nodes = cut_lineage(
        nodes.select(F.col("node").cast("bigint").alias("node")), eager=True
    )
    e = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = cut_lineage(e, eager=True)
    if labels is None:
        cur = nodes.select("node", F.col("node").alias("label"))
        clamped = None
    else:
        seeds = labels.select(
            F.col("node").cast("bigint").alias("node"),
            F.col("label").cast("bigint").alias("label"),
        )
        cur = nodes.join(seeds, "node", "left")
        clamped = cut_lineage(seeds, eager=True)
    cur = cut_lineage(cur, eager=True)
    w = Window.partitionBy("node").orderBy(
        F.desc("votes"), F.asc("label")
    )
    for _ in range(iters):
        votes = (
            e.join(
                cur.select(F.col("node").alias("src"), "label"), "src"
            )
            .filter(F.col("label").isNotNull())
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        winner = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        nxt = (
            cur.join(winner, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
        if clamped is not None:
            nxt = (
                nxt.join(
                    clamped.select("node", F.col("label").alias("seed")),
                    "node",
                    "left",
                )
                .select("node", F.coalesce("seed", "label").alias("label"))
            )
        cur = cut_lineage(nxt, eager=True)
    return cur


def label_propagation_oracle_sql(
    edges_sql: str,
    nodes_sql: str,
    iters: int | None = None,
    symmetrize: bool = True,
) -> str:
    """Unrolled-CTE DuckDB twin of community-mode
    :func:`label_propagation` (same synchronous rounds, same
    ``(count DESC, label ASC)`` tie-break)."""
    iters = LP_CONFIG["iters"] if iters is None else iters
    sym = (
        f"SELECT src, dst FROM ({edges_sql}) UNION ALL "
        f"SELECT dst, src FROM ({edges_sql})"
        if symmetrize
        else edges_sql
    )
    parts = [
        f"n AS (SELECT node FROM ({nodes_sql}))",
        f"e AS ({sym})",
        "l0 AS (SELECT node, node AS label FROM n)",
    ]
    for i in range(iters):
        parts.append(f"""
        w{i} AS (
          SELECT e.dst AS node, l{i}.label, count(*) AS votes
          FROM e JOIN l{i} ON e.src = l{i}.node
          GROUP BY 1, 2
          QUALIFY row_number() OVER (
            PARTITION BY e.dst ORDER BY count(*) DESC, l{i}.label ASC) = 1
        ),
        l{i + 1} AS (
          SELECT l{i}.node, coalesce(w{i}.label, l{i}.label) AS label
          FROM l{i} LEFT JOIN w{i} ON l{i}.node = w{i}.node
        )""")
    return (
        "WITH " + ",".join(parts) + f" SELECT node, label FROM l{iters}"
    )
