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

Auto-rescale: growth is ~(mean degree)^{2·iters}, so a deep run on a
dense graph would overflow BIGINT. After every round both sides are
divided by a SHARED power of two whenever the round maximum's bit
length exceeds ``rescale_bits`` (default 40 — never triggered at
moderate densities, so shallow runs keep exact path counts). The
shift is computed from the integer round max by a bit-length ladder
of pure comparisons (no log2, no floats), so the DuckDB twin and the
python replay compute the IDENTICAL shift from the identical max and
the whole rescaled trajectory stays engine-exact. Floor-dividing both
sides by one shared 2^s preserves the score ORDER (non-strict: values
within the same 2^s quantum merge — the price of staying integer);
the headroom left (2^rescale_bits per value) keeps the next round's
fold inside BIGINT for any in-degree up to 2^(62 − rescale_bits).

Loud overflow, independent of ANSI mode: each fold runs in
DECIMAL(38,0) (exact far past BIGINT) and the result is checked
against BIGINT range IN-PLAN — ``raise_error`` fires before the cast,
so even with ``spark.sql.ansi.enabled=false`` (where CAST overflow
silently NULLs and the left-join zero-fill would swallow it) an
overflow is a visible failure, never a silently zeroed score.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage

HITS_CONFIG = {"iters": 4, "rescale_bits": 40}

_DEC = "decimal(38,0)"
_MAX_LONG = (1 << 63) - 1


def _bitlen_expr(c: Column) -> Column:
    """Integer bit length of a non-negative BIGINT column — 1 + the
    number of k ∈ [1, 62] with ``c ≥ 2^k`` (0 for c ≤ 0). A ladder of
    pure integer comparisons: both engines and the python twin
    (``int.bit_length``) agree exactly — no log2 anywhere."""
    s = F.lit(0)
    for k in range(1, 63):
        s = s + (c >= F.lit(1 << k).cast("bigint")).cast("int")
    return F.when(c <= 0, F.lit(0)).otherwise(s + F.lit(1))


def _guarded_bigint(s: Column) -> Column:
    """DECIMAL(38,0) aggregate → BIGINT with an in-plan range check:
    overflow raises instead of (non-ANSI) silently casting to NULL."""
    return (
        F.when(
            s > F.lit(_MAX_LONG).cast(_DEC),
            F.raise_error(F.lit(
                "hits: fold exceeds BIGINT — raise rescale_bits headroom"
                " (lower rescale_bits) or reduce iters"
            )),
        )
        .otherwise(s)
        .cast("bigint")
    )


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int | None = None,
    checkpoint_every: int = 2,
    rescale_bits: int | None = None,
) -> DataFrame:
    """Integer-exact HITS. ``edges``: (src, dst) BIGINT directed pairs;
    ``nodes``: (node) — the full vertex set. Returns
    ``(node, hub_scaled, auth_scaled, hub, auth)``: exact (up to the
    shared per-round rescale, which only fires past ``rescale_bits``)
    BIGINT path counts plus their max-normalized double renderings
    (0.0 on an all-zero side)."""
    iters = HITS_CONFIG["iters"] if iters is None else iters
    rescale_bits = (
        HITS_CONFIG["rescale_bits"] if rescale_bits is None else rescale_bits
    )
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
            .agg(_guarded_bigint(F.sum(F.col("v").cast(_DEC))).alias("v"))
        )
        h = nodes.join(
            h_agg.select(F.col("src").alias("node"), "v"), "node", "left"
        ).select("node", F.coalesce("v", F.lit(0)).cast("bigint").alias("v"))
        a_agg = (
            edges.join(h.select(F.col("node").alias("src"),
                                F.col("v").alias("hv")), "src")
            .groupBy("dst")
            .agg(_guarded_bigint(F.sum(F.col("hv").cast(_DEC))).alias("v"))
        )
        a = nodes.join(
            a_agg.select(F.col("dst").alias("node"), "v"), "node", "left"
        ).select("node", F.coalesce("v", F.lit(0)).cast("bigint").alias("v"))
        # shared-power-of-two rescale: one 1-row shift frame per round,
        # broadcast to both sides; shift 0 (the common case) is the
        # identity, so shallow runs keep exact path counts
        mx = h.agg(F.max("v").alias("__mh")).crossJoin(
            a.agg(F.max("v").alias("__ma"))
        )
        shift = mx.select(
            F.greatest(
                F.lit(0),
                _bitlen_expr(F.greatest(F.col("__mh"), F.col("__ma")))
                - F.lit(rescale_bits),
            ).cast("int").alias("__sh")
        )
        h = h.crossJoin(F.broadcast(shift)).select(
            "node",
            F.call_function("shiftright", F.col("v"), F.col("__sh"))
            .alias("v"),
        )
        a = a.crossJoin(F.broadcast(shift)).select(
            "node",
            F.call_function("shiftright", F.col("v"), F.col("__sh"))
            .alias("v"),
        )
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


def _bitlen_sql(expr: str) -> str:
    """SQL twin of :func:`_bitlen_expr` — the same comparison ladder."""
    terms = " + ".join(
        f"(CASE WHEN {expr} >= {1 << k} THEN 1 ELSE 0 END)"
        for k in range(1, 63)
    )
    return f"(CASE WHEN {expr} <= 0 THEN 0 ELSE 1 + ({terms}) END)"


def hits_oracle_sql(
    nodes_sql: str,
    edges_sql: str,
    iters: int | None = None,
    rescale_bits: int | None = None,
) -> str:
    """Unrolled-CTE DuckDB twin of :func:`hits` — the identical
    integer updates, one (h, a, shift, rescale) CTE group per
    iteration (the shift computed by the identical bit-length ladder;
    ``v // (1 << s)`` ≡ the engine's arithmetic shiftright on
    non-negative values), the identical final max-normalized
    division. DuckDB's DECIMAL→BIGINT cast errors loudly on overflow
    natively, mirroring the engine's in-plan raise."""
    iters = HITS_CONFIG["iters"] if iters is None else iters
    rescale_bits = (
        HITS_CONFIG["rescale_bits"] if rescale_bits is None else rescale_bits
    )
    # every CTE is MATERIALIZED: DuckDB re-inlines plain CTEs at each
    # reference, and the per-iteration chain (h -> a -> shift -> two
    # rescales, each referencing earlier CTEs more than once) would
    # blow up exponentially in unroll depth without it (the kcore-twin
    # lesson)
    parts = [
        f"nd AS MATERIALIZED ({nodes_sql})",
        f"ed AS MATERIALIZED ({edges_sql})",
        "ar0 AS MATERIALIZED (SELECT node, CAST(1 AS BIGINT) AS v FROM nd)",
    ]
    prev_a = "ar0"
    for i in range(1, iters + 1):
        parts.append(
            f"""h{i} AS MATERIALIZED (
              SELECT nd.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
              FROM nd LEFT JOIN (
                SELECT e.src AS node,
                       CAST(sum(CAST(a.v AS DECIMAL(38,0))) AS BIGINT) AS v
                FROM ed e JOIN {prev_a} a ON a.node = e.dst
                GROUP BY e.src) s ON s.node = nd.node)"""
        )
        parts.append(
            f"""a{i} AS MATERIALIZED (
              SELECT nd.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
              FROM nd LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum(CAST(h.v AS DECIMAL(38,0))) AS BIGINT) AS v
                FROM ed e JOIN h{i} h ON h.node = e.src
                GROUP BY e.dst) s ON s.node = nd.node)"""
        )
        parts.append(
            f"""sh{i} AS MATERIALIZED (
              SELECT greatest(0, {_bitlen_sql('m')} - {rescale_bits}) AS s
              FROM (SELECT greatest((SELECT max(v) FROM h{i}),
                                    (SELECT max(v) FROM a{i})) AS m))"""
        )
        parts.append(
            f"""hr{i} AS MATERIALIZED (
              SELECT node, v // (CAST(1 AS BIGINT) << s) AS v
              FROM h{i}, sh{i})"""
        )
        parts.append(
            f"""ar{i} AS MATERIALIZED (
              SELECT node, v // (CAST(1 AS BIGINT) << s) AS v
              FROM a{i}, sh{i})"""
        )
        prev_a = f"ar{i}"
    ctes = ",\n".join(parts)
    return f"""
        WITH {ctes},
        fin AS (
          SELECT h.node, h.v AS hub_scaled, a.v AS auth_scaled
          FROM hr{iters} h JOIN ar{iters} a ON a.node = h.node
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


def hits_py(
    edges: list[tuple],
    nodes: list,
    iters: int | None = None,
    rescale_bits: int | None = None,
) -> dict:
    """Independent python replay of :func:`hits` — arbitrary-precision
    would diverge from the engine, so the replay applies the IDENTICAL
    per-round shared-shift rescale (``int.bit_length`` ≡ the ladder).
    Returns ``{node: (hub_scaled, auth_scaled)}``."""
    iters = HITS_CONFIG["iters"] if iters is None else iters
    rescale_bits = (
        HITS_CONFIG["rescale_bits"] if rescale_bits is None else rescale_bits
    )
    nodeset = set(nodes)
    edges = [(s, d) for s, d in edges if s in nodeset and d in nodeset]
    a = {n: 1 for n in nodes}
    h = {n: 0 for n in nodes}
    for _ in range(iters):
        h = {n: 0 for n in nodes}
        for s, d in edges:
            h[s] += a[d]
        a = {n: 0 for n in nodes}
        for s, d in edges:
            a[d] += h[s]
        m = max(max(h.values(), default=0), max(a.values(), default=0))
        sh = max(0, (m.bit_length() if m > 0 else 0) - rescale_bits)
        h = {n: v >> sh for n, v in h.items()}
        a = {n: v >> sh for n, v in a.items()}
    return {n: (h[n], a[n]) for n in nodes}
