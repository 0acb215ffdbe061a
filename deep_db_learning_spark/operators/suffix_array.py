"""Distributed suffix array by prefix doubling — the exact-substring
backbone of corpus dedup (Lee et al. 2022 build suffix arrays to find
every duplicated substring exactly; ``operators/dedup.duplicate_spans``
is the rolling-hash approximation of the same analysis). The
construction here is the canonical sort-based distributed algorithm
(Manber & Myers doubling; Flick & Aluru 2015 for the MPI version):

    round 0:  rank every position by its single character
    round j:  re-rank by the pair (rank[pos], rank[pos + 2^j]) —
              after round j ranks order suffixes by their first
              2^(j+1) characters
    stop:     2^rounds ≥ the longest document

Each document is its own string (no cross-document continuation —
the concatenate-with-unique-separators semantics): a missing
``pos + 2^j`` ranks as −1, which sorts before every real rank, so a
shorter suffix orders before its extensions (proper lexicographic
order). Identical suffixes ACROSS documents keep equal ranks forever;
the final suffix-array order breaks those ties by ``(doc, pos)`` — a
deterministic total order both engines and the python twin share.

Everything is integer: character code points, dense ranks, −1
sentinels — no floats anywhere, so the python twin reproduces the
array bit-for-bit.

Scale posture: prefix doubling is SORT-BOUND — ⌈log₂ maxlen⌉ rounds,
each one global sort of the (doc, pos, key) frame plus one
co-partitioned self-join on (doc, pos+2^j). That is the honest cost
of exact suffix ordering at any scale (the published distributed SA
builders have the same shape); the dense re-rank runs over the
DISTINCT key pairs (≤ corpus positions, usually far fewer in early
rounds) so the corpus-wide frame never funnels through the
single-partition ranking window — only the shrinking key dictionary
does. Early exit when every rank is already unique.

On top of the array: adjacent-suffix LCPs by binary descent over the
saved per-round rank tables (compare 2^j-prefix ranks high-to-low,
advance on equality — O(log maxlen) co-partitioned joins total), and
:func:`longest_repeated_substring`, the classic SA application,
driver-hashable because its output is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..checkpoint import cut_lineage


def corpus_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc, pos, ch)`` — one row per character position (0-based).
    Row-local flatMap (character split + posexplode), no shuffle.
    Ranking compares ``ch`` as a string: Spark's binary UTF-8 order
    equals code-point order, which is exactly python's character
    comparison — the twin contract."""
    return (
        df.where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(
            F.col(id_col).alias("doc"),
            F.posexplode(
                F.split(F.col(text_col), "(?!^)")
            ).alias("pos", "ch"),
        )
        # the end-of-string lookahead match leaves one trailing ''
        .where(F.col("ch") != "")
    )


def _two_phase_row_number(
    df: DataFrame, cols: list[str], out: str = "__rn"
) -> DataFrame:
    """Global 1-based row numbers under ``ORDER BY cols`` WITHOUT a
    single-partition stage: range-partition on the sort key, number
    rows locally per partition, shift each partition by the cumulative
    count of the partitions before it. The only single-partition work
    is the cumulative sum over the PER-PARTITION COUNTS (≤
    ``spark.sql.shuffle.partitions`` rows — bounded state independent
    of data volume). Numbers are independent of where the range
    boundaries land (global order is preserved across range
    partitions), so on a total-order key the output is deterministic
    bit-for-bit."""
    parts = df.repartitionByRange(*[F.col(c) for c in cols])
    local = parts.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__lr",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
        ),
    )
    counts = local.groupBy("__pid").agg(F.max("__lr").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    return local.join(F.broadcast(offs), "__pid").select(
        *df.columns, (F.col("__lr") + F.col("__off")).alias(out)
    )


def _dense_rank_keys(keyed: DataFrame, cols: list[str]) -> DataFrame:
    """Dense-rank the frame by ``cols`` WITHOUT a single-partition
    stage anywhere: rank the DISTINCT key tuples (the shrinking
    dictionary) through :func:`_two_phase_row_number` (distinct rows ⇒
    row number ≡ dense rank), then join back — so even in the LAST
    doubling round, where the key dictionary approaches
    corpus-position count, no stage holds the dictionary on one
    reducer. Ranks are dense and start at 1."""
    keys = keyed.select(*cols).distinct()
    ranked = _two_phase_row_number(keys, cols, out="__r")
    return keyed.join(ranked, cols)


def build_suffix_array(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Returns ``(ranks, rounds)``: ``ranks`` = (doc, pos, r) with
    ``r`` the final dense suffix rank (equal ONLY for identical
    suffixes of different documents — the SA order is
    ``(r, doc, pos)``), and ``rounds`` = [(2^j, frame_j)] — every
    round's (doc, pos, r) table, saved for LCP binary descent."""
    cur = _dense_rank_keys(
        corpus_positions(df, text_col, id_col), ["ch"]
    ).select("doc", "pos", F.col("__r").cast("bigint").alias("r"))
    cur = cut_lineage(cur, eager=True)
    n_pos = cur.count()
    rounds: list[tuple[int, DataFrame]] = [(1, cur)]
    if n_pos == 0:
        # all texts NULL/empty — F.max() below would return None and
        # the loop arithmetic would crash on None + 1
        return cur, rounds
    offset = 1
    while True:
        n_ranks = cur.agg(F.max("r")).first()[0]
        if n_ranks == n_pos:
            break  # all suffixes already separated (up to identity)
        maxlen = cur.agg(F.max("pos")).first()[0] + 1
        if offset >= maxlen:
            break  # equal ranks now mean identical suffixes
        nxt = cur.select(
            "doc", (F.col("pos") - offset).alias("pos"),
            F.col("r").alias("r2"),
        )
        paired = cur.join(nxt, ["doc", "pos"], "left").select(
            "doc", "pos", "r", F.coalesce("r2", F.lit(-1)).alias("r2")
        )
        cur = _dense_rank_keys(paired, ["r", "r2"]).select(
            "doc", "pos", F.col("__r").cast("bigint").alias("r")
        )
        cur = cut_lineage(cur, eager=True)
        offset *= 2
        rounds.append((offset, cur))
    return cur, rounds


def adjacent_lcp(
    ranks: DataFrame, rounds: list[tuple[int, DataFrame]], doc_len: DataFrame
) -> DataFrame:
    """LCP of every adjacent suffix pair in SA order
    ``(r, doc, pos)`` — binary descent over the per-round rank tables:
    at level 2^j, equal ranks mean equal 2^j-prefixes, so advance both
    cursors and add 2^j. The sum is capped at the shorter suffix's
    length (identical cross-document suffixes hold equal ranks at
    every level — without the cap the descent would overshoot their
    actual length). Returns
    ``(doc_a, pos_a, doc_b, pos_b, lcp)``. ``doc_len``: (doc, len)."""
    # SA positions via the same two-phase rank — (doc, pos) is unique,
    # so (r, doc, pos) is a total order and the numbering is exact; the
    # corpus-position frame never funnels through one reducer here
    # either (this was the one remaining global-rank window in the SA
    # family)
    sa = _two_phase_row_number(ranks, ["r", "doc", "pos"], out="sa")
    a = sa.select(
        F.col("sa").alias("i"), F.col("doc").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = sa.select(
        (F.col("sa") - 1).alias("i"), F.col("doc").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    pairs = a.join(b, "i").select("doc_a", "pos_a", "doc_b", "pos_b")
    pairs = pairs.withColumn("lcp", F.lit(0).cast("bigint")).withColumn(
        "ca", F.col("pos_a")
    ).withColumn("cb", F.col("pos_b"))
    for off, frame in sorted(rounds, key=lambda t: -t[0]):
        ra = frame.select(
            F.col("doc").alias("doc_a"), F.col("pos").alias("ca"),
            F.col("r").alias("__ra"),
        )
        rb = frame.select(
            F.col("doc").alias("doc_b"), F.col("pos").alias("cb"),
            F.col("r").alias("__rb"),
        )
        pairs = (
            pairs.join(ra, ["doc_a", "ca"], "left")
            .join(rb, ["doc_b", "cb"], "left")
        )
        eq = (
            F.col("__ra").isNotNull()
            & F.col("__rb").isNotNull()
            & (F.col("__ra") == F.col("__rb"))
        )
        pairs = pairs.select(
            "doc_a", "pos_a", "doc_b", "pos_b",
            (F.col("lcp") + F.when(eq, off).otherwise(0)).alias("lcp"),
            (F.col("ca") + F.when(eq, off).otherwise(0)).alias("ca"),
            (F.col("cb") + F.when(eq, off).otherwise(0)).alias("cb"),
        )
        pairs = cut_lineage(pairs, eager=True)
    la = doc_len.select(F.col("doc").alias("doc_a"), F.col("len").alias("__la"))
    lb = doc_len.select(F.col("doc").alias("doc_b"), F.col("len").alias("__lb"))
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(
            "doc_a", "pos_a", "doc_b", "pos_b",
            F.least(
                F.col("lcp"),
                F.col("__la") - F.col("pos_a"),
                F.col("__lb") - F.col("pos_b"),
            ).alias("lcp"),
        )
    )


def longest_repeated_substring(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The classic SA application, corpus-wide and exact: the maximum
    adjacent-suffix LCP is the length of the longest substring that
    occurs at least twice anywhere in the corpus (within one document
    or across documents). Returns every position participating in a
    maximal pair: ``(doc_id, pos, lcp)``, distinct."""
    ranks, rounds = build_suffix_array(df, text_col, id_col)
    doc_len = df.where(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(F.col(id_col).alias("doc"), F.length(text_col).alias("len"))
    lcps = cut_lineage(adjacent_lcp(ranks, rounds, doc_len), eager=True)
    mx = lcps.agg(F.max("lcp").alias("__mx"))
    hits = lcps.crossJoin(F.broadcast(mx)).where(
        (F.col("lcp") == F.col("__mx")) & (F.col("lcp") > 0)
    )
    return (
        hits.select(
            F.col("doc_a").alias(id_col), F.col("pos_a").alias("pos"), "lcp"
        )
        .unionByName(
            hits.select(
                F.col("doc_b").alias(id_col), F.col("pos_b").alias("pos"),
                "lcp",
            )
        )
        .distinct()
    )


def suffix_array_py(texts: dict) -> list[tuple]:
    """Independent python twin: the full suffix array of
    ``{doc_id: text}`` under the engine's total order — plain
    lexicographic suffix sort (python string comparison IS
    shorter-prefix-first, matching the −1 sentinel), ties between
    identical cross-document suffixes by (doc, pos). Returns
    ``[(doc, pos)]`` in SA order."""
    suf = [
        (t[p:], d, p)
        for d, t in texts.items()
        if t
        for p in range(len(t))
    ]
    suf.sort()
    return [(d, p) for _s, d, p in suf]


def longest_repeated_substring_py(texts: dict) -> list[tuple]:
    """Twin of :func:`longest_repeated_substring`: direct
    common-prefix comparison of adjacent suffixes in the twin's own
    SA order. Returns sorted distinct ``(doc, pos, lcp)`` rows."""
    sa = suffix_array_py(texts)
    strs = {(d, p): texts[d][p:] for d, p in sa}

    def lcp(x, y):
        n = min(len(x), len(y))
        i = 0
        while i < n and x[i] == y[i]:
            i += 1
        return i

    best = 0
    rows: set = set()
    vals = []
    for i in range(1, len(sa)):
        vals.append(lcp(strs[sa[i - 1]], strs[sa[i]]))
        best = max(best, vals[-1])
    if best == 0:
        return []
    for i in range(1, len(sa)):
        if vals[i - 1] == best:
            rows.add((*sa[i - 1], best))
            rows.add((*sa[i], best))
    return sorted(rows)
