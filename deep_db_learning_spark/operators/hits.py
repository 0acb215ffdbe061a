"""HITS hubs & authorities (Kleinberg 1999) over the FK graph — the
companion importance measure to ``operators/pagerank.py`` (hubs point
at good authorities, authorities are pointed at by good hubs; on the
orders→customer FK graph: order hubs ∝ their customer's authority,
customer authorities ∝ the summed hub mass of their orders).

Exactness design (the PageRank recipe): the classical algorithm
L2-normalizes every round, which would put an engine-dependent sqrt in
the trajectory. This implementation iterates UNNORMALIZED integer
updates instead —

    h_i(u) = Σ_{(u,v)∈E} a_{i−1}(v)        a_0 ≡ 1
    a_i(v) = Σ_{(u,v)∈E} h_i(u)

— whose values are exact path counts (the entries of (A·Aᵀ)^i·1), so
the whole trajectory is BIGINT and the unrolled-CTE DuckDB twin
value-hash-matches every score. Normalization is a RANKING no-op
(positive scalar per round), so the unnormalized fixed-iteration
scores order nodes exactly as normalized HITS at the same depth; the
max-normalized double renderings are one deterministic division at
the end, never inside the loop.

Scale posture: each iteration is two join-groupBy rounds on the node
key (co-partitionable, AQE-skew-handled); state is one (node, value)
frame per side, lineage-cut on a cadence; sums fold through
DECIMAL(38,0) (exact, overflow-safe past bigint). Growth is
~(mean degree)^{2·iters} — with the default 4 iterations the values
stay far inside BIGINT for any graph whose mean degree is < ~40; a
deeper run on a denser graph should rescale (divide all values by a
shared power of two between rounds — ranking-preserving) before the
fold could overflow, which the DECIMAL(38,0) cast turns into a loud
NULL-sum failure rather than silent wraparound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage

HITS_CONFIG = {"iters": 4}

_DEC = "decimal(38,0)"


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int | None = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Integer-exact HITS. ``edges``: (src, dst) BIGINT directed pairs;
    ``nodes``: (node) — the full vertex set. Returns
    ``(node, hub_scaled, auth_scaled, hub, auth)``: exact BIGINT path
    counts plus their max-normalized double renderings (0.0 on an
    all-zero side)."""
    iters = HITS_CONFIG["iters"] if iters is None else iters
    nodes = cut_lineage(
        nodes.select(F.col("node").cast("bigint").alias("node")), eager=True
    )
    edges = cut_lineage(
        edges.select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
        ),
        eager=True,
    )
    a = nodes.select("node", F.lit(1).cast("bigint").alias("v"))
    h = None
    for i in range(1, iters + 1):
        h_agg = (
            edges.join(a.select(F.col("node").alias("dst"), "v"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("v").cast(_DEC)).cast("bigint").alias("v"))
        )
        h = nodes.join(
            h_agg.select(F.col("src").alias("node"), "v"), "node", "left"
        ).select("node", F.coalesce("v", F.lit(0)).cast("bigint").alias("v"))
        a_agg = (
            edges.join(h.select(F.col("node").alias("src"),
                                F.col("v").alias("hv")), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("hv").cast(_DEC)).cast("bigint").alias("v"))
        )
        a = nodes.join(
            a_agg.select(F.col("dst").alias("node"), "v"), "node", "left"
        ).select("node", F.coalesce("v", F.lit(0)).cast("bigint").alias("v"))
        if i % checkpoint_every == 0 or i == iters:
            h = cut_lineage(h, eager=True)
            a = cut_lineage(a, eager=True)
    out = h.select("node", F.col("v").alias("hub_scaled")).join(
        a.select("node", F.col("v").alias("auth_scaled")), "node"
    )
    mx = out.agg(
        F.max("hub_scaled").alias("__mh"), F.max("auth_scaled").alias("__ma")
    )
    return out.crossJoin(F.broadcast(mx)).select(
        "node",
        "hub_scaled",
        "auth_scaled",
        F.when(
            F.col("__mh") > 0,
            F.col("hub_scaled").cast("double") / F.col("__mh").cast("double"),
        ).otherwise(F.lit(0.0)).alias("hub"),
        F.when(
            F.col("__ma") > 0,
            F.col("auth_scaled").cast("double") / F.col("__ma").cast("double"),
        ).otherwise(F.lit(0.0)).alias("auth"),
    )


def hits_oracle_sql(
    nodes_sql: str, edges_sql: str, iters: int | None = None
) -> str:
    """Unrolled-CTE DuckDB twin of :func:`hits` — the identical
    integer updates, one (h, a) CTE pair per iteration, the identical
    final max-normalized division."""
    iters = HITS_CONFIG["iters"] if iters is None else iters
    parts = [
        f"nd AS ({nodes_sql})",
        f"ed AS ({edges_sql})",
        "a0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nd)",
    ]
    prev_a = "a0"
    for i in range(1, iters + 1):
        parts.append(
            f"""h{i} AS (
              SELECT nd.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
              FROM nd LEFT JOIN (
                SELECT e.src AS node,
                       CAST(sum(CAST(a.v AS DECIMAL(38,0))) AS BIGINT) AS v
                FROM ed e JOIN {prev_a} a ON a.node = e.dst
                GROUP BY e.src) s ON s.node = nd.node)"""
        )
        parts.append(
            f"""a{i} AS (
              SELECT nd.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
              FROM nd LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum(CAST(h.v AS DECIMAL(38,0))) AS BIGINT) AS v
                FROM ed e JOIN h{i} h ON h.node = e.src
                GROUP BY e.dst) s ON s.node = nd.node)"""
        )
        prev_a = f"a{i}"
    ctes = ",\n".join(parts)
    return f"""
        WITH {ctes},
        fin AS (
          SELECT h.node, h.v AS hub_scaled, a.v AS auth_scaled
          FROM h{iters} h JOIN a{iters} a ON a.node = h.node
        ),
        mx AS (
          SELECT max(hub_scaled) AS mh, max(auth_scaled) AS ma FROM fin
        )
        SELECT node, hub_scaled, auth_scaled,
               CASE WHEN mx.mh > 0 THEN
                 CAST(hub_scaled AS DOUBLE) / CAST(mx.mh AS DOUBLE)
               ELSE 0.0 END AS hub,
               CASE WHEN mx.ma > 0 THEN
                 CAST(auth_scaled AS DOUBLE) / CAST(mx.ma AS DOUBLE)
               ELSE 0.0 END AS auth
        FROM fin, mx
    """
