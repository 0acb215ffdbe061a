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


def _star_checksum(e: DataFrame):
    """One cheap agg that fingerprints an edge set: (count, Σsrc, Σdst,
    Σxxhash64(src,dst)). Equality across two rounds ⇒ the set is
    (collision-improbably) unchanged — the fixpoint test without an
    O(E) set comparison join."""
    r = e.agg(
        F.count(F.lit(1)),
        F.sum("x"),
        F.sum("y"),
        # decimal fold: Σ of 2^63-scale hashes overflows long under ANSI
        F.sum(F.xxhash64("x", "y").cast("decimal(38,0)")),
    ).collect()[0]
    return tuple(r)


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Components via alternating large-star / small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — same output contract as :func:`connected_components`
    ((node, component), component = min reachable id) but O(log n)
    rounds instead of O(diameter): a path-shaped pair graph that the
    min-label loop walks one hop per round collapses here in a handful
    of star contractions. This is the default at scale; the min-label
    loop remains as the independently-shaped twin the equality tests
    pin against.

    Edge set invariant between rounds: directed pairs (x, y) with
    x > y (every emitted target is a neighborhood minimum).

    - large-star: per node u over the SYMMETRIC neighborhood,
      m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u — one
      groupBy + one co-partitioned join, no collect_list (hub
      neighborhoods never materialize in one task).
    - small-star: per head x over the downward pairs, m = min(Γ⁻(x));
      emit (y, m) for y ∈ Γ⁻(x) \\ {m} plus (x, m).

    Converges when the small-star output's checksum repeats; raises
    ``RuntimeError`` past ``max_iter`` (unlike the min-label loop this
    algorithm's round budget is logarithmic, so non-convergence is a
    bug, not a big diameter).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("x"), F.least("a", "b").alias("y")
        )
        .distinct()
        .persist()
    )
    prev = None
    for i in range(max_iter):
        sym = e.select("x", "y").unionByName(
            e.select(F.col("y").alias("x"), F.col("x").alias("y"))
        )
        mins = sym.groupBy("x").agg(
            F.least(F.min("y"), F.first("x")).alias("m")
        )
        large = (
            sym.join(mins, "x")
            .filter(F.col("y") > F.col("x"))
            .select(F.col("y").alias("x"), F.col("m").alias("y"))
            .distinct()
        )
        mins2 = large.groupBy("x").agg(F.min("y").alias("m"))
        joined = large.join(mins2, "x")
        small = (
            joined.filter(F.col("y") != F.col("m"))
            .select(F.col("y").alias("x"), F.col("m").alias("y"))
            .unionByName(joined.select("x", F.col("m").alias("y")))
            .distinct()
        )
        if (i + 1) % checkpoint_every == 0:
            small = cut_lineage(small, eager=True)
        else:
            small = small.persist()
        cur = _star_checksum(small)
        e.unpersist()
        e = small
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"large/small-star did not converge in {max_iter} rounds"
        )
    labels = e.select(F.col("x").alias("node"), F.col("y").alias("component"))
    roots = e.select(
        F.col("y").alias("node"), F.col("y").alias("component")
    ).distinct()
    out = labels.unionByName(roots)
    if nodes is not None:
        ncol = nodes.columns[0]
        iso = (
            nodes.select(F.col(ncol).alias("node"))
            .distinct()
            .join(out.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        out = out.unionByName(iso)
    out = cut_lineage(out.distinct(), eager=True)
    e.unpersist()
    return out
