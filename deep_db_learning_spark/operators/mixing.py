"""Dataset mixing and shard packing (extension — no reference
counterpart; the source-mixing / sequence-packing stage of a
large-scale training-data pipeline).

- :func:`stratified_sample` — per-stratum sampling rates ("mix 30% of
  crawl, 100% of wiki, 5% of forums"), decided by the repo's portable
  seeded hash of the row key, NOT ``rand()``: deterministic across
  runs, partitionings, and engines (a DuckDB oracle reproduces the
  exact kept set), and stable under re-execution — a retried task
  keeps the same rows. This is Spark's ``sampleBy`` with
  reproducibility guarantees strong enough to oracle-check.
- :func:`pack_shards` — assign documents to fixed token-budget shards
  in a stable order (the "pack sequences into context windows /
  output files" step). The assignment needs a global running token
  total — inherently sequential — which is computed as a two-phase
  distributed prefix sum: chunk rows by the order key, windowed
  cumsum WITHIN each chunk (parallel), per-chunk totals cumulated
  into chunk offsets (one tiny aggregation), offset + within = global
  cumsum. No global single-partition sort anywhere; the widest window
  partition is one chunk. DuckDB reproduces it as one plain window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import (
    MERSENNE_31,
    knuth_hash,
    knuth_hash_sql,
    md5_prefix_hash,
    md5_prefix_hash_sql,
)

_NUMERIC_KEY_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}
_MD5_RANGE = float(1 << 32)


def _is_numeric_key(df: DataFrame, key_col: str) -> bool:
    return dict(df.dtypes)[key_col] in _NUMERIC_KEY_TYPES


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``hash(key) / range < fractions[stratum]`` — a
    per-stratum Bernoulli sample that is a pure row-local predicate:
    no shuffle, no RNG state, pushdown-friendly, identical on any
    engine that reproduces the hash (see :func:`stratified_sample_sql`).

    Integer keys hash with the portable Knuth multiplicative hash;
    string/other keys with the md5-prefix hash of ``key|seed`` (a
    bigint cast of a string key would be NULL and silently drop every
    row — review r3). Strata missing from ``fractions`` get
    ``default_fraction`` (0 ⇒ dropped — the "mix only these sources"
    shape).
    """
    if _is_numeric_key(df, key_col):
        h = knuth_hash(F.col(key_col), seed)
        rng = float(MERSENNE_31)
    else:
        h = md5_prefix_hash(
            F.concat(F.col(key_col).cast("string"), F.lit(f"|{seed}"))
        )
        rng = _MD5_RANGE
    frac: Column = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(
            frac
        )
    return df.filter(h < (frac * F.lit(rng)))


def stratified_sample_sql(
    table: str,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
    numeric_key: bool = True,
) -> str:
    """DuckDB twin of :func:`stratified_sample` (same hash arithmetic,
    same CASE ladder) — pass ``numeric_key=False`` for string keys to
    mirror the md5 path."""
    if numeric_key:
        h = knuth_hash_sql(key_col, seed)
        rng = float(MERSENNE_31)
    else:
        h = md5_prefix_hash_sql(f"CAST({key_col} AS VARCHAR) || '|{seed}'")
        rng = _MD5_RANGE
    case = "CASE"
    for value, f in sorted(fractions.items()):
        case += f" WHEN {strata_col} = '{value}' THEN {float(f)!r}"
    case += f" ELSE {float(default_fraction)!r} END"
    return f"SELECT * FROM {table} WHERE {h} < ({case}) * {rng!r}"


def pack_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    shard_col: str = "shard_id",
    chunk_size: int | None = None,
) -> DataFrame:
    """Append ``shard_col``: the zero-based shard each row STARTS in
    when rows are laid out in ``order_col`` order and shards hold
    ``budget`` tokens (a row may straddle a boundary; it belongs to the
    shard its first token lands in — the streaming-writer semantic).

    ``shard = floor((global_cumsum - tokens) / budget)`` with the
    global cumsum computed as a two-phase prefix sum over
    ``chunk = floor(order / chunk_size)``:

    1. windowed cumsum within each chunk (parallel across chunks; the
       only sort is per-chunk);
    2. per-chunk token totals → cumulative chunk offsets (an
       aggregation whose result has one row per chunk — tiny — plus
       one small window over it);
    3. global cumsum = chunk offset + within-chunk cumsum.

    ``chunk_size`` defaults to ``(max(order)+1) / (4 × shuffle
    partitions)`` so chunks outnumber cores. ``order_col`` must be
    unique (a PK / packed id) for a well-defined order. The division
    happens in double precision (both here and in the DuckDB twin) —
    exact while the running token total stays under 2⁵³ (~9e15 tokens,
    comfortably past 100 TB of text); switch to integer ``div`` if a
    corpus ever exceeds that.
    """
    spark = df.sparkSession
    if chunk_size is None:
        max_order = df.agg(F.max(order_col)).first()[0]
        if max_order is None:  # empty frame — any chunking works
            chunk_size = 1
        else:
            n_chunks = 4 * int(spark.conf.get("spark.sql.shuffle.partitions", "64"))
            chunk_size = max(1, int(max_order) // n_chunks + 1)

    tagged = df.withColumn(
        "__chunk", F.floor(F.col(order_col) / F.lit(int(chunk_size)))
    )
    w_in = (
        Window.partitionBy("__chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = tagged.withColumn("__within", F.sum(token_col).over(w_in))

    totals = tagged.groupBy("__chunk").agg(F.sum(token_col).alias("__tot"))
    w_off = (
        Window.orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "__offset", F.sum("__tot").over(w_off) - F.col("__tot")
    ).select("__chunk", "__offset")

    out = within.join(F.broadcast(offsets), "__chunk").withColumn(
        shard_col,
        F.floor(
            (F.col("__offset") + F.col("__within") - F.col(token_col))
            / F.lit(int(budget))
        ).cast("int"),
    )
    return out.drop("__chunk", "__within", "__offset")


def pack_shards_sql(
    table: str, token_col: str, budget: int, order_col: str, shard_col: str = "shard_id"
) -> str:
    """DuckDB twin of :func:`pack_shards`: one plain global window (the
    oracle can afford the single sort the distributed form avoids)."""
    return (
        f"SELECT *, CAST(floor((sum({token_col}) OVER (ORDER BY {order_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - {token_col}) "
        f"/ {int(budget)}) AS INT) AS {shard_col} FROM {table}"
    )


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Per-source keep fractions for temperature-based mixing — the
    standard multilingual/multi-source LLM re-balancing rule: sampling
    weight ``w_i ∝ n_i^alpha`` (``alpha=1`` keeps natural proportions,
    ``alpha=0`` mixes uniformly, the usual range is 0.3-0.7, the
    mT5/XLM-R convention). Returns a fractions dict to feed
    :func:`stratified_sample` (which keeps the deterministic portable
    -hash semantics and the DuckDB twin).

    Down-sampling only (a Bernoulli keep can't up-sample): with
    ``target_rows`` the fractions aim the expected TOTAL there
    (``f_i = target·w_i/n_i``, capped at 1 — capped sources free no
    budget, by design: redistributing it would distort the
    temperature); without, the scale is chosen so the most
    up-weighted source is kept in full (max f_i = 1) — the largest
    corpus that achieves the temperature distribution exactly.

    One count job over the strata (tiny result); everything else is
    driver arithmetic (:func:`temperature_fractions_py` — callers that
    already hold per-stratum counts skip the count job entirely).
    """
    counts = {
        r[strata_col]: r["count"]
        for r in df.groupBy(strata_col).count().collect()
    }
    return temperature_fractions_py(counts, alpha, target_rows)


def temperature_fractions_py(
    counts: dict,
    alpha: float = 0.5,
    target_rows: int | None = None,
) -> dict[str, float]:
    """The driver arithmetic of :func:`temperature_fractions` over
    precomputed per-stratum counts — the fused-stats path (r15): an
    entry that also needs per-stratum score folds computes BOTH in one
    groupBy job and feeds the counts here, instead of paying a second
    full-corpus aggregate. A ``None`` stratum is skipped (the same rule
    the collect path applies)."""
    counts = {s: int(n) for s, n in counts.items() if s is not None}
    if not counts:
        return {}
    weights = {s: float(n) ** alpha for s, n in counts.items()}
    # fold in sorted-strata order: a dict-order float sum would make
    # the fractions depend on collect order — an independent twin
    # (DuckDB-counted) must reproduce the exact doubles
    tot_w = sum(weights[s] for s in sorted(weights))
    if target_rows is not None:
        return {
            s: min(1.0, target_rows * (weights[s] / tot_w) / counts[s])
            for s in counts
        }
    # max_i (w_i / n_i) keeps that source fully
    scale = 1.0 / max(weights[s] / counts[s] for s in sorted(weights))
    return {s: scale * weights[s] / counts[s] for s in counts}


def domain_weight_py(
    stats: dict,
    eta: float = 1.0,
    floor: float = 0.0,
) -> dict:
    """The shared domain-reweighting arithmetic — used identically by
    the engine (over Spark decimal folds) and any twin (over
    DuckDB-read folds); drift breaks parity. ``stats`` = {domain:
    (score_sum: float, n: int)}. Returns {domain: (mean, excess,
    weight)} with ``weight`` the normalized, floored mixture weight.

    All folds are summed in sorted-domain order so an independent twin
    reproduces the exact doubles (the temperature_fractions rule)."""
    import math

    domains = sorted(stats)
    n_tot = sum(stats[d][1] for d in domains)
    s_tot = sum(stats[d][0] for d in domains)
    mean_all = s_tot / n_tot
    means = {d: stats[d][0] / stats[d][1] for d in domains}
    # log-sum-exp shift: subtract the max exponent before exp() so a
    # large eta or a wide score range (raw LR logits) can't overflow
    # to inf and normalize every domain to NaN. Mathematically the
    # shift cancels in the normalization; the doubles stay
    # deterministic under the sorted-domain fold rule (max over a
    # sorted scan is order-independent anyway).
    ex = {d: eta * (means[d] - mean_all) for d in domains}
    shift = max(ex[d] for d in domains)
    raw = {
        d: (stats[d][1] / n_tot) * math.exp(ex[d] - shift)
        for d in domains
    }
    z = sum(raw[d] for d in domains)
    if not math.isfinite(z) or z <= 0.0:
        raise ValueError(
            "domain_weight_py: non-finite normalizer — scores or eta "
            "out of range even after the log-sum-exp shift"
        )
    w = {d: raw[d] / z for d in domains}
    if floor > 0.0:
        w = {d: max(floor, w[d]) for d in domains}
        z2 = sum(w[d] for d in domains)
        w = {d: w[d] / z2 for d in domains}
    return {d: (means[d], means[d] - mean_all, w[d]) for d in domains}


def domain_weights(
    scored: DataFrame,
    domain_col: str,
    score_col: str,
    eta: float = 1.0,
    floor: float = 0.0,
) -> DataFrame:
    """Quality-aware domain reweighting — the mixture step that feeds
    a trained quality signal (the r10 LR filter's logit, a DSIR score,
    an LM NLL with ``eta`` negated) back into source proportions:

        ``α_d ∝ natural_frac_d · exp(η · (mean_score_d − mean_all))``

    — the DoReMi-shaped multiplicative-weights objective (Xie et al.
    2023, arXiv:2305.10429) with a STATIC proxy: one exponential
    reweight of the natural distribution by per-domain excess score
    (full DoReMi retrains the proxy between rounds — that loop lives
    at the trainer seam; with static scores extra rounds are a no-op,
    so exactly one is taken). ``floor`` keeps a minimum share per
    domain (DoReMi's uniform-smoothing term).

    Physical shape: ONE map-side-combinable groupBy over the scored
    corpus (exact decimal score folds + counts — n_domains rows of
    driver state), then the transcendentals run DRIVER-SIDE in shared
    python (:func:`domain_weight_py` — the BM25-idf/PSI recipe), so
    the weights are engine-independent literals. Returns ``(domain,
    n_docs, mean_score, excess, weight)``; feed the ``weight`` column
    into :func:`temperature_fractions`-style keep rates or a shard
    mixer."""
    from ..functions.exact_agg import exact_sum

    rows = (
        scored.where(
            F.col(domain_col).isNotNull() & F.col(score_col).isNotNull()
        )
        .groupBy(domain_col)
        .agg(
            exact_sum(F.col(score_col)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    stats = {r[domain_col]: (float(r["s"]), int(r["n"])) for r in rows}
    return domain_weights_from_stats(
        scored.sparkSession, stats, domain_col, eta, floor
    )


def domain_weights_from_stats(
    spark,
    stats: dict,
    domain_col: str = "domain",
    eta: float = 1.0,
    floor: float = 0.0,
) -> DataFrame:
    """:func:`domain_weights` from precomputed per-domain folds — the
    fused-stats path (r15). ``stats`` = {domain: (score_sum, n)} with
    the sums produced by the same ``exact_sum`` decimal fold (``F.sum``
    skips NULL scores, so an unfiltered groupBy's fold over non-NULL
    domains is value-identical to the filtered one); domains with
    ``n == 0`` must already be absent, as they are from a filtered
    groupBy. Arithmetic and output schema are exactly
    :func:`domain_weights`'s."""
    if not stats:
        raise ValueError("domain_weights: empty input")
    out = domain_weight_py(stats, eta, floor)
    return spark.createDataFrame(
        [
            (d, stats[d][1], out[d][0], out[d][1], out[d][2])
            for d in sorted(out)
        ],
        f"{domain_col} string, n_docs bigint, mean_score double, "
        "excess double, weight double",
    )
