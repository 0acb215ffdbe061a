"""Temporal joins — as-of and range joins over event streams.

The reference has no theta/range/as-of joins (all its joins are FK
equi-joins, SURVEY §2.3); these are the extension the `events` table
exists for: state-at-time lookups (as-of) and interval containment
(range) are the two temporal primitives a training-data pipeline needs
that Spark has no single built-in operator for.

Both are implemented as compositions of existing DataFrame ops with
scale-safe physical shapes:

- **as-of join**: union the two inputs, one window pass per key ordered
  by time, ``last(payload, ignorenulls)`` carries the most recent right
  row forward onto each left row. ONE shuffle on the key, zero join
  explosion — contrast with the naive ``left.join(right, key).filter(
  r.ts <= l.ts)`` + row_number, which materializes |L|×|R per key|
  intermediate rows. Skewed keys cost one window partition each; salt
  upstream if a single key exceeds an executor.
- **range join**: equi-join on (key, time-bin) + exact residual
  predicate. Each right interval explodes to the bins it covers
  (``sequence``), each left point belongs to exactly one bin, so the
  bin join finds every containing interval exactly once — no
  cross-product, no duplicate pairs. Choose ``bin_width`` ≈ the typical
  interval length: wider bins → fewer exploded rows but more residual
  filtering; narrower → the reverse. This is the same binned-overlap
  strategy Databricks' range-join optimization applies from a hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..checkpoint import cut_lineage


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    payload: list[str] | None = None,
    suffix: str = "_asof",
    inclusive: bool = True,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: attach to each left row the payload of the
    latest right row of the same key with ``right.ts <= left.ts``
    (``<`` when ``inclusive=False``). Left-outer semantics — left rows
    before any right row keep NULL payload.

    The matched right timestamp is returned as ``{right_ts}{suffix}``
    alongside the payload columns (suffixed on name collisions).

    Ties: among right rows sharing (key, ts), ``tie_break`` (right-side
    column names) extends the window ordering so the winner is
    deterministic across runs, partitionings, and engines — the
    LARGEST tie_break tuple wins (it sorts last, and the carry takes
    the last non-null). Without it the winner is whichever right row
    the union order happens to place last; supply pre-deduplicated
    right input or a tie_break when (key, ts) is not unique. Left-row
    ties never matter: their payload columns are NULL, so the
    ``last(..., ignorenulls)`` carry is invariant to their order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    tie_break = tie_break or []
    right_ts = right_ts or left_ts
    if payload is None:
        payload = [c for c in right.columns if c not in keys and c != right_ts]
    pay_out = {
        p: (p + suffix if p in left.columns else p) for p in payload
    }
    ts_out = right_ts + suffix if right_ts in left.columns or right_ts == left_ts else right_ts

    left_cols = [c for c in left.columns]
    # union frame: keys, event time, side marker, left columns (NULL on
    # right rows), payload columns (NULL on left rows)
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}") for p in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__p__ts"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{t}") for t in tie_break],
    )
    # inclusive: right rows sort BEFORE left rows at equal ts (they are
    # visible to it); exclusive: after (they are not)
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0 if inclusive else 2).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
        *[F.col(p).alias(f"__p_{p}") for p in payload],
        F.col(right_ts).alias("__p__ts"),
        *[F.col(t).alias(f"__tb_{t}") for t in tie_break],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts"),
            F.col("__side"),
            *[F.col(f"__tb_{t}") for t in tie_break],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_side.unionByName(r_side).select(
        "*",
        *[
            F.last(F.col(f"__p_{p}"), ignorenulls=True).over(w).alias(f"__c_{p}")
            for p in payload
        ],
        F.last(F.col("__p__ts"), ignorenulls=True).over(w).alias("__c__ts"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col(f"__c_{p}").alias(pay_out[p]) for p in payload],
        F.col("__c__ts").alias(ts_out),
    )


def asof_join_oracle_sql(
    left_sql: str,
    right_sql: str,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    payload: list[tuple[str, str]],
    ts_alias: str,
    inclusive: bool = True,
) -> str:
    """ANSI-SQL twin of :func:`asof_join` (same union + window shape,
    runs on DuckDB) for oracle checks. ``payload`` is (column, alias);
    ``left_cols`` must NOT repeat the key columns or ``left_ts`` — keys
    and the left timestamp are emitted separately (duplicated names
    would make the union's select list ambiguous)."""
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(left_cols) & ({*keys, left_ts})
    if overlap:
        raise ValueError(f"left_cols must not repeat keys/left_ts: {overlap}")
    key_list = ", ".join(keys)
    side = "0" if inclusive else "2"
    l_pay_nulls = ",\n           ".join(
        f"NULL AS __p_{c}" for c, _ in payload
    )
    r_pay = ",\n           ".join(f"{c} AS __p_{c}" for c, _ in payload)
    l_cols = ", ".join(left_cols)
    l_null_cols = ", ".join(f"NULL AS {c}" for c in left_cols)
    carried = ",\n           ".join(
        f"last_value(__p_{c} IGNORE NULLS) OVER w AS {alias}" for c, alias in payload
    )
    return f"""
    WITH u AS (
        SELECT {key_list}, {left_ts} AS __ts, 1 AS __side, {l_cols},
           {l_pay_nulls}, NULL AS __p__ts
        FROM ({left_sql})
        UNION ALL
        SELECT {key_list}, {right_ts} AS __ts, {side} AS __side, {l_null_cols},
           {r_pay}, {right_ts} AS __p__ts
        FROM ({right_sql})
    ), c AS (
        SELECT *,
           {carried},
           last_value(__p__ts IGNORE NULLS) OVER w AS {ts_alias}
        FROM u
        WINDOW w AS (PARTITION BY {key_list} ORDER BY __ts, __side
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT {key_list}, __ts AS {left_ts}, {l_cols},
           {", ".join(a for _, a in payload)}, {ts_alias}
    FROM c WHERE __side = 1
    """


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: pair each left row with every right
    row of the same key whose half-open interval
    ``[right_start, right_end)`` contains ``left_point``.

    Physical shape: explode each right interval to its covering
    time-bins, equi-join on (keys, bin), residual-filter the exact
    predicate. The bin join is a plain hash join Catalyst can plan
    (broadcast/AQE apply); nothing is quadratic. Each (left, right)
    match arises from exactly one bin (the left point's), so no
    dedup pass is needed. ``how="left"`` keeps match-less left rows.
    """
    keys = [on] if isinstance(on, str) else list(on)
    width = F.expr(f"INTERVAL {bin_width}")
    # width in microseconds as a DIFFERENCE of two unix_micros, so the
    # session-timezone offset of the epoch literal cancels — a bare
    # unix_micros(epoch + interval) is only the interval width when the
    # session zone is UTC, and this function must not depend on that
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    width_us = F.unix_micros(epoch + width) - F.unix_micros(epoch)

    def _us(c: str) -> Column:
        # unix_micros requires TIMESTAMP; NTZ casts through the session
        # zone — monotonic and applied identically to both sides, so bin
        # assignment stays consistent (the residual predicate is exact
        # on the original values regardless)
        return F.unix_micros(F.col(c).cast("timestamp"))

    l_bin = F.floor(_us(left_point) / width_us).cast("bigint")
    r_bins = F.sequence(
        F.floor(_us(right_start) / width_us).cast("bigint"),
        # end is exclusive, but a point in the end's bin can still be
        # < end, so cover through the end bin
        F.floor(_us(right_end) / width_us).cast("bigint"),
    )
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # how="left" needs to re-attach match-less left rows, and joining
    # back on list(left.columns) is wrong twice over: a left row with a
    # NULL in ANY column never matches itself (NULL != NULL, payload
    # silently lost) and duplicate left rows cross-multiply. A surrogate
    # row id fixes both. monotonically_increasing_id alone is NOT safe:
    # the tagged frame appears in BOTH join branches and would be
    # computed twice, and post-shuffle intra-partition row order is not
    # reproducible — the same logical row could get two different ids.
    # localCheckpoint materializes the ids once; both branches read the
    # same blocks (GC-reclaimed with the frame).
    tagged = (
        cut_lineage(
            left.withColumn("__rjid", F.monotonically_increasing_id()), eager=True
        )
        if how == "left"
        else left
    )
    l = tagged.withColumn("__bin", l_bin)
    r = right.withColumn("__bin", F.explode(r_bins))
    joined = l.join(r, [*keys, "__bin"], "inner").filter(
        (F.col(right_start) <= F.col(left_point))
        & (F.col(left_point) < F.col(right_end))
    )
    out = joined.drop("__bin")
    if how == "inner":
        return out
    right_only = [c for c in right.columns if c not in set(left.columns)]
    return tagged.join(
        out.select("__rjid", *right_only), ["__rjid"], "left"
    ).drop("__rjid")


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered multi-step funnel: for each user, the EARLIEST
    completion of ``steps`` in order, with every later step falling
    within ``within_seconds`` of the user's step-1 time. Returns one
    row per step: ``(step, name, n_users, avg_seconds)`` —
    ``n_users`` reaching that step, ``avg_seconds`` the exact-decimal
    mean elapsed time from step 1 (0.0 for step 1, NULL when nobody
    reached the step).

    Earliest-completion semantics (the standard product-analytics
    definition): step 1 anchors at the user's first step-1 event;
    step i+1 at the first step-(i+1) event strictly after step i's
    anchor and within the window. Greedy-earliest is optimal here: an
    anchor can only help later steps by being as early as possible, so
    no backtracking is needed and each step costs ONE conditional
    aggregate + ONE co-partitioned join on the user key (k−1 joins
    total, all sharing the first shuffle's partitioning — no window
    over the whole event set, no per-user array materialization).
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    from ..functions.exact_agg import exact_avg

    u, t = F.col(user_col), F.col(ts_col)
    t_us = F.unix_micros(t.cast("timestamp"))
    ev = events.select(
        u.alias("__u"), t_us.alias("__t"), F.col(type_col).alias("__y")
    )
    reach = (
        ev.filter(F.col("__y") == steps[0])
        .groupBy("__u")
        .agg(F.min("__t").alias("__anchor"))
        .withColumn("__t0", F.col("__anchor"))
    )
    spark = events.sparkSession
    frames = [
        reach.agg(
            F.lit(1).alias("step"),
            F.lit(steps[0]).alias("name"),
            F.count(F.lit(1)).alias("n_users"),
            F.when(F.count(F.lit(1)) > 0, F.lit(0.0)).alias("avg_seconds"),
        )
    ]
    lim = F.col("__t0") + F.lit(int(within_seconds) * 1_000_000)
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("__y") == s)
            .join(reach.select("__u", "__anchor", "__t0"), "__u")
            .filter((F.col("__t") > F.col("__anchor")) & (F.col("__t") <= lim))
            .groupBy("__u", "__t0")
            .agg(F.min("__t").alias("__anchor"))
            .select("__u", "__anchor", "__t0")
        )
        reach = nxt
        frames.append(
            reach.agg(
                F.lit(i).alias("step"),
                F.lit(s).alias("name"),
                F.count(F.lit(1)).alias("n_users"),
                exact_avg(
                    (F.col("__anchor") - F.col("__t0")).cast("double")
                    / F.lit(1_000_000.0)
                ).alias("avg_seconds"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def funnel_oracle_sql(
    events_table: str,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """Sequential-CTE DuckDB twin of :func:`funnel` (same
    greedy-earliest anchors, same decimal-fold mean)."""
    from ..functions.exact_agg import exact_avg_sql

    def us(alias: str) -> str:
        return f"epoch_us(CAST({alias}.{ts_col} AS TIMESTAMP))"

    lim = f"s1.t0 + CAST({int(within_seconds)} AS BIGINT) * 1000000"
    parts = [
        f"""s1 AS (
          SELECT {user_col} AS u, min({us(events_table)}) AS t0
          FROM {events_table} WHERE {type_col} = '{steps[0]}' GROUP BY 1
        )"""
    ]
    for i, s in enumerate(steps[1:], start=2):
        prev = f"s{i - 1}"
        anchor = "s1.t0" if i == 2 else f"{prev}.a"
        s1_join = (
            "" if i == 2 else f"JOIN s1 ON e.{user_col} = s1.u\n          "
        )
        parts.append(f"""s{i} AS (
          SELECT e.{user_col} AS u, any_value(s1.t0) AS t0,
                 min({us('e')}) AS a
          FROM {events_table} e
          JOIN {prev} ON e.{user_col} = {prev}.u
          {s1_join}WHERE e.{type_col} = '{s}'
            AND {us('e')} > {anchor} AND {us('e')} <= {lim}
          GROUP BY 1
        )""")
    selects = [
        f"""SELECT 1 AS step, '{steps[0]}' AS name, count(*) AS n_users,
            CASE WHEN count(*) > 0 THEN CAST('0' AS DOUBLE) END
              AS avg_seconds
        FROM s1"""
    ]
    avg = exact_avg_sql("CAST(a - t0 AS DOUBLE) / CAST('1000000' AS DOUBLE)")
    for i, s in enumerate(steps[1:], start=2):
        selects.append(
            f"SELECT {i}, '{s}', count(*), {avg} FROM s{i}"
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(selects)


def resample_dense(
    df: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    step_seconds: int,
    fill: dict | None = None,
    bounds: str = "per_key",
) -> DataFrame:
    """Densify a (key, bucket-timestamp, metrics…) frame: emit one row
    per key per ``step_seconds`` bucket over the key's [min, max] span
    (``bounds="global"``: the whole frame's span — every key gets the
    full grid), filling absent buckets with ``fill`` (column → value;
    unfilled columns stay NULL).

    Windowed aggregates (``events_hourly`` etc.) drop empty buckets; a
    forecasting/feature consumer usually needs the dense grid. Shape:
    one aggregate for the spans, one row-local ``sequence`` explode
    (span/step rows per key — bounded by the time range, NOT by the
    data volume), one left join back on (key, bucket). Input bucket
    timestamps must be step-aligned (a misaligned row would silently
    miss the grid — validated: misalignment raises).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step_us = int(step_seconds) * 1_000_000
    misaligned = df.filter((us % F.lit(step_us)) != 0).limit(1).count()
    if misaligned:
        raise ValueError(
            f"resample_dense: {ts_col} has buckets not aligned to"
            f" {step_seconds}s"
        )
    if bounds == "global":
        span = df.agg(
            F.min(us).alias("__lo"), F.max(us).alias("__hi")
        )
        spans = df.select(*keys).distinct().crossJoin(F.broadcast(span))
    elif bounds == "per_key":
        spans = df.groupBy(*keys).agg(
            F.min(us).alias("__lo"), F.max(us).alias("__hi")
        )
    else:
        raise ValueError(f"unknown bounds mode: {bounds!r}")
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_us))
        ).alias("__bucket_us"),
    ).select(
        *keys,
        F.timestamp_micros(F.col("__bucket_us"))
        .cast(df.schema[ts_col].dataType)
        .alias(ts_col),
    )
    out = grid.join(df, keys + [ts_col], "left")
    for c, v in (fill or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event (period = ``period_days``-day buckets counted
    from the global minimum timestamp — fixed-width periods, so the
    index math is pure integer division); each later period they are
    active increments that (cohort, period_index) cell. Returns one
    row per observed cell: ``(cohort_period, period_index,
    n_active, n_cohort, retention)`` with ``period_index`` 0 at the
    cohort period itself (``n_active = n_cohort`` there by
    construction) and ``retention = n_active / n_cohort`` (double
    division of two exact counts — deterministic).

    Shape: one aggregate for the global epoch, one per-user min
    (shuffle on user), one distinct over (user, period) co-partitioned
    with it, one count per cell — no window over the raw events, no
    driver state beyond the single epoch scalar."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    step = int(period_days) * 86400 * 1_000_000
    epoch = events.agg(F.min(us)).first()[0]
    if epoch is None:
        raise ValueError("cohort_retention: no events")
    # integer division end-to-end: a double quotient could land on an
    # exact period boundary one ulp off between engines
    period = ((us - F.lit(epoch)) - ((us - F.lit(epoch)) % F.lit(step))) / F.lit(step)
    period = period.cast("long")
    per_user = events.select(
        F.col(user_col).alias("__u"), period.alias("__p")
    )
    first = per_user.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    active = per_user.distinct().join(first, "__u")
    cells = active.groupBy(
        F.col("__cohort").alias("cohort_period"),
        (F.col("__p") - F.col("__cohort")).alias("period_index"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    sizes = first.groupBy(F.col("__cohort").alias("cohort_period")).agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return cells.join(F.broadcast(sizes), "cohort_period").select(
        "cohort_period", "period_index", "n_active", "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort"))
        .alias("retention"),
    )


def rolling_anomaly(
    df: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    z_threshold: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each row is scored
    against the trailing ``window_seconds`` (inclusive of itself) of
    its key's values. Appends ``roll_n``, ``roll_mean``, ``roll_std``
    (population), ``zscore`` and ``is_anomaly`` (|z| ≥ threshold; NULL
    z — fewer than ``min_points`` in the window, or zero variance —
    is never flagged).

    Determinism: the frame is a RANGE frame over the microsecond
    timestamp, so its contents are value-determined (ties share one
    frame — no peer-order ambiguity), and the moments come from
    decimal folds (value and value² summed as DECIMAL(30,9)), so the
    whole score is partitioning- and engine-independent — a DuckDB
    twin with the same casts matches bitwise. One shuffle on the key.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    span = int(window_seconds) * 1_000_000
    w = (
        Window.partitionBy(*keys)
        .orderBy(us)
        .rangeBetween(-span, 0)
    )
    from ..functions.exact_agg import DECIMAL_TYPE

    v = F.col(value_col)
    n = F.count(v).over(w)
    s = F.sum(v.cast(DECIMAL_TYPE)).over(w).cast("double")
    ss = F.sum((v * v).cast(DECIMAL_TYPE)).over(w).cast("double")
    mean = s / n
    # clamp: decimal rounding of v and v*v happens independently, so a
    # constant window can cancel to a tiny NEGATIVE variance — both
    # engines clamp identically (DuckDB's sqrt would error on it)
    var = F.greatest((ss - s * s / n) / n, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(
        (n >= F.lit(int(min_points))) & (std > 0.0), (v - mean) / std
    )
    return df.select(
        "*",
        n.alias("roll_n"),
        mean.alias("roll_mean"),
        std.alias("roll_std"),
        z.alias("zscore"),
        F.coalesce(
            F.abs(z) >= F.lit(float(z_threshold)), F.lit(False)
        ).alias("is_anomaly"),
    )


def attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_types: tuple = ("click", "view", "signup"),
    lookback: str = "1 day",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    decay_halflife: str | None = "6 hours",
) -> DataFrame:
    """Multi-touch conversion attribution — credit each touch channel
    for the conversions it preceded, under the five standard models
    in ONE pass: ``first`` (the earliest touch in the lookback window
    takes the whole conversion), ``last`` (the latest touch before the
    conversion), ``linear`` (1/n to each of the n window touches),
    ``ushape`` (position-based 40/20/40: first and last touch take
    0.4 each, the n−2 middles split 0.2 evenly; n=1 → 1, n=2 → ½/½ —
    exact rationals of the existing rank/count columns), ``decay``
    (BUCKETED time-decay: a touch's weight halves for every
    FULL ``decay_halflife`` elapsed before the conversion —
    ``w = 2^−⌊Δt/H⌋`` normalized per conversion. The floor makes every
    weight an exact power of two and the whole model engine-exact;
    the smooth ``2^{−Δt/H}`` would put a transcendental in the oracle
    trajectory for a cosmetic difference).
    Returns ``(model, event_type, n_touches, credit)`` — ``credit``
    sums to the number of attributed conversions per model.

    Physical shape: touches pair with conversions through
    :func:`range_join` (binned interval equi-join on the user key —
    nothing quadratic, the 100 TB shape), then two ``conv_id`` window
    ranks + one count produce all three credit columns from the SAME
    pair frame, and one grouped aggregate per model folds credits as
    exact decimals (``exact_sum`` — engine-independent doubles).
    Ties inside a conversion window break by ``(ts, event_id)`` for
    the ascending rank and ``(ts DESC, event_id DESC)`` for the
    descending one — a deterministic total order both engines share,
    with the DESC mirror guaranteeing first ≠ last whenever n ≥ 2
    (credit conserves even when every touch shares one timestamp)."""
    from pyspark.sql.window import Window

    from ..functions.exact_agg import exact_sum

    conv = events.where(F.col(type_col) == conv_type).select(
        F.col(user_col),
        F.col(id_col).alias("conv_id"),
        (F.col(ts_col) - F.expr(f"INTERVAL {lookback}")).alias("w_start"),
        F.col(ts_col).alias("w_end"),
    )
    touches = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col),
        F.col(type_col),
    )
    # bin width DERIVED from the lookback (lookback/24, floored at one
    # minute) instead of range_join's fixed 1-hour default: each
    # conversion interval then explodes to ~25 covering bins for ANY
    # lookback — a '90 days' lookback under the fixed default would
    # explode to ~2161 bins per conversion — while the candidate-pair
    # overhead stays (L+W)/L ≈ 1.04. The interval string is evaluated
    # by the ENGINE's own arithmetic (one 1-row job), so every unit
    # Spark accepts works; binning never affects results (the exact
    # predicate re-filters), so the oracle needs no mirror.
    epoch0 = F.lit("1970-01-01 00:00:00").cast("timestamp")
    lookback_us = events.sparkSession.range(1).select(
        (
            F.unix_micros(epoch0 + F.expr(f"INTERVAL {lookback}"))
            - F.unix_micros(epoch0)
        ).alias("us")
    ).first()["us"]
    width_us = max(lookback_us // 24, 60_000_000)
    pairs = range_join(
        touches, conv, on=user_col, left_point=ts_col,
        right_start="w_start", right_end="w_end",
        bin_width=f"{width_us} MICROSECOND",
    )
    w = Window.partitionBy("conv_id")
    ra = F.row_number().over(w.orderBy(F.col(ts_col), F.col("touch_id")))
    n = F.count(F.lit(1)).over(w)
    # rd is the descending rank under the MIRRORED tie-break
    # (ts DESC, touch_id DESC): because (ts, touch_id) is a total
    # order, that is exactly n + 1 − ra — computed from the ascending
    # sort instead of a second full sort of the pair frame (one
    # Exchange + one Sort in the plan, not two Sorts). The mirror
    # matters for credit conservation: whenever a window holds n ≥ 2
    # touches the ra==1 and rd==1 rows are DISTINCT even if every
    # touch shares one timestamp — with both ranks tie-breaking ASC,
    # an all-tied window made one row first AND last, the rd==1 ushape
    # branch never fired, and the model handed out
    # 0.4 + 0.2·(n−1)/(n−2) < 1 per conversion
    rd = n + F.lit(1) - ra
    # bucketed decay: Δt and H in integer microseconds, weight an
    # exact power of two, per-conversion normalization in-plan
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    h_us = F.unix_micros(
        epoch + F.expr(f"INTERVAL {decay_halflife or '6 hours'}")
    ) - F.unix_micros(epoch)
    buckets = F.floor(
        (
            F.unix_micros(F.col("w_end").cast("timestamp"))
            - F.unix_micros(F.col(ts_col).cast("timestamp"))
        )
        / h_us
    ).cast("int")
    # weights are exact powers of two. Cap the shift at 59, not 62:
    # the normalizer folds weights as decimal(30,18), and 2^-60 and
    # below quantize to 0E-18 — a conversion whose window touches ALL
    # sit >=~60 halflives back (reachable with e.g. lookback '90 days'
    # + halflife '1 hour') would get a zero normalizer and divide to
    # Inf.  2^-59 still rounds to 2E-18 at scale 18, so every touch
    # keeps a nonzero decimal weight.  The per-conversion normalizer
    # folds as decimals — a float window sum would be
    # accumulation-order-sensitive.
    dw = F.lit(1.0) / F.call_function(
        "shiftleft", F.lit(1).cast("bigint"),
        F.least(buckets, F.lit(59)),
    ).cast("double")
    scored = pairs.select(
        type_col,
        (ra == 1).cast("double").alias("__first"),
        (rd == 1).cast("double").alias("__last"),
        (F.lit(1.0) / n).alias("__linear"),
        # position-based (U-shaped) 40/20/40 — the n==2 branch first,
        # so the row that is BOTH first and last of a pair gets ½ once
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(ra == 1, F.lit(0.4))
        .when(rd == 1, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - F.lit(2)).cast("double"))
        .alias("__ushape"),
        (
            dw
            / F.sum(dw.cast("decimal(30,18)")).over(w).cast("double")
        ).alias("__decay"),
    )
    # ONE grouped aggregate folds all five models' credits (the five
    # exact decimal folds are map-side combinable in the same shuffle),
    # then a stack() unpivot emits the per-model rows — a five-model
    # UNION would re-run the whole range join + window pass per model,
    # 5× the pair-generation work for byte-identical values
    models = ("first", "last", "linear", "ushape", "decay")
    agg = scored.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("n_touches"),
        *[exact_sum(F.col(f"__{m}")).alias(f"__c_{m}") for m in models],
    )
    stack = ", ".join(f"'{m}', __c_{m}" for m in models)
    return agg.select(
        F.col(type_col),
        F.col("n_touches"),
        F.expr(f"stack({len(models)}, {stack}) AS (model, credit)"),
    ).select("model", type_col, "n_touches", "credit")


def attribution_oracle_sql(
    events_table: str = "events",
    conv_type: str = "purchase",
    touch_types: tuple = ("click", "view", "signup"),
    lookback: str = "1 day",
    decay_halflife: str = "6 hours",
) -> str:
    """DuckDB twin of :func:`attribution` — the identical window
    predicate (half-open ``[conv_ts − lookback, conv_ts)``), tie
    order, credit arithmetic, and exact decimal fold."""
    from ..functions.exact_agg import exact_sum_sql

    tt = ", ".join(f"'{t}'" for t in touch_types)
    models = []
    for model, credit in (
        ("first", "CASE WHEN ra = 1 THEN 1.0 ELSE 0.0 END"),
        ("last", "CASE WHEN rd = 1 THEN 1.0 ELSE 0.0 END"),
        ("linear", "CAST(1.0 AS DOUBLE) / n"),
        # float literals cross as CAST('..' AS DOUBLE) — bare decimals
        # parse as DECIMAL in DuckDB
        (
            "ushape",
            "CASE WHEN n = 1 THEN CAST('1.0' AS DOUBLE) "
            "WHEN n = 2 THEN CAST('0.5' AS DOUBLE) "
            "WHEN ra = 1 THEN CAST('0.4' AS DOUBLE) "
            "WHEN rd = 1 THEN CAST('0.4' AS DOUBLE) "
            "ELSE CAST('0.2' AS DOUBLE) / CAST(n - 2 AS DOUBLE) END",
        ),
        ("decay", "dw / dnorm"),
    ):
        models.append(f"""
        SELECT '{model}' AS model, event_type,
               count(*) AS n_touches,
               {exact_sum_sql(credit)} AS credit
        FROM rk GROUP BY event_type""")
    body = "\nUNION ALL\n".join(models)
    return f"""
        WITH conv AS (
          SELECT user_id, event_id AS conv_id,
                 ts - INTERVAL {lookback} AS w_start, ts AS w_end
          FROM {events_table} WHERE event_type = '{conv_type}'
        ), tch AS (
          SELECT user_id, event_id AS touch_id, ts, event_type
          FROM {events_table} WHERE event_type IN ({tt})
        ), pr AS (
          SELECT t.event_type, c.conv_id,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.ts, t.touch_id) AS ra,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.ts DESC, t.touch_id DESC) AS rd,
                 count(*) OVER (PARTITION BY c.conv_id) AS n,
                 -- bucketed decay weight: exact power of two (integer
                 -- floor division; the engine's float floor agrees —
                 -- microsecond integers keep the quotient >1 µs from
                 -- any boundary flip).  Shift capped at 59 like the
                 -- engine: 2^-60 quantizes to 0 at decimal scale 18.
                 CAST(1.0 AS DOUBLE) / CAST(CAST(1 AS BIGINT) << CAST(
                   least((epoch_us(c.w_end) - epoch_us(t.ts)) //
                         (epoch_us(TIMESTAMP '1970-01-01 00:00:00'
                                   + INTERVAL {decay_halflife})), 59)
                   AS INT) AS DOUBLE) AS dw
          FROM tch t JOIN conv c
            ON t.user_id = c.user_id
           AND t.ts >= c.w_start AND t.ts < c.w_end
        ), rk AS (
          SELECT *,
                 CAST(CAST(sum(CAST(dw AS DECIMAL(30,18)))
                       OVER (PARTITION BY conv_id) AS VARCHAR)
                      AS DOUBLE) AS dnorm
          FROM pr
        )
        {body}
    """
