"""Connected components — iterative min-label propagation as a
DataFrame loop (extension; no reference counterpart).

The dedup family produces near-duplicate *pairs*; collapsing
transitive chains ("A≈B, B≈C ⇒ {A,B,C} are one document") needs the
connected components of the pair graph. This is the canonical
iterative Spark algorithm shape:

- state = (node, label) DataFrame, label init = node id;
- per round, every node takes the min of its own and its neighbours'
  labels (edges ⋈ labels → groupBy(node).min — one shuffle per round);
- labels are monotonically non-increasing, so ``sum(label)`` is a
  strictly decreasing convergence measure — the fixpoint check is one
  cheap aggregate, no join against the previous state;
- each round persists its result and unpersists the previous one, and
  ``localCheckpoint`` every few rounds cuts the growing lineage (the
  classic failure mode of iterative DataFrame jobs).

Rounds needed = graph diameter (near-dup clusters are shallow; a
path-shaped corpus worst-cases at O(n) — switch to GraphFrames'
large-star/small-star if that ever matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..checkpoint import cut_lineage


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``; returns
    (node, component) with component = min node id reachable.
    ``nodes`` (single-column) adds isolated vertices as singleton
    components."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().persist()

    labels = e.select(F.col("a").alias("node"))
    if nodes is not None:
        ncol = nodes.columns[0]
        labels = labels.unionByName(nodes.select(F.col(ncol).alias("node")))
    labels = labels.distinct().withColumn("label", F.col("node")).persist()

    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for i in range(max_iter):
        msgs = e.join(labels, e.a == labels.node).select(
            F.col("b").alias("node"), F.col("label")
        )
        new = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0:
            new = cut_lineage(new, eager=True)
        else:
            new = new.persist()
        cur_sum = new.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    e.unpersist()
    # the cached rounds execute fine, but the RETURNED plan would still
    # print/optimize the whole unfolded loop lineage — an EAGER
    # checkpoint caps it at the final state AND lets the final round's
    # cache entry be released here (blocks already exist, so the
    # checkpoint is a cheap copy; a lazy cut would keep the parent
    # pinned with no unpersist moment)
    out = cut_lineage(labels, eager=True).select(
        "node", F.col("label").alias("component")
    )
    labels.unpersist()
    return out
