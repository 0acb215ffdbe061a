"""Point-in-time feature-store joins — leakage-free training frames.

The reference builds its training tables by joining *current* feature
values onto labeled rows (the whole database is a static snapshot,
``db_transformer/data/ctu_dataset.py`` loads each table once). A
production training pipeline over event data cannot do that: joining a
feature value observed AFTER the label timestamp leaks the future into
the features. The standard cure (Feast / Databricks feature store
semantics) is the *point-in-time join*: for each spine row
``(entity, ts, label)`` attach, per feature view, the latest feature
row of that entity with ``feature.ts <= spine.ts`` — optionally
windowed by a max-staleness bound — plus rolling aggregates over a
trailing time window ending at ``spine.ts``.

Physical shapes (all one-shuffle-per-feature-family, no join
explosion):

- **as-of views** reuse :func:`..operators.temporal.asof_join` — union
  + single window pass per entity key. A view whose match is older
  than ``max_staleness`` is nulled AFTER the carry: backward as-of
  carries the *latest* eligible row, so "latest is too stale" is
  exactly "no row within the bound" — the post-hoc null is not an
  approximation.
- **rolling features** compute trailing-window aggregates with the
  same union trick: spine points (side=1) and source rows (side=0)
  share one RANGE window ``[ts - window, ts]`` ordered by event time;
  counts/sums see only side-0 rows. Float sums fold in decimal
  (``exact_agg`` discipline) so the result is partition-order
  invariant and oracle-reproducible.

At 100 TB: each view/rolling family costs one hash-partition on the
entity key; no state ever reaches the driver; skewed entities cost one
window partition each (salt upstream if a single entity exceeds an
executor, same caveat as ``asof_join``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact_agg import DECIMAL_TYPE
from ..operators.temporal import asof_join


@dataclass(frozen=True)
class FeatureView:
    """A backward as-of feature family.

    ``source`` must have at most one row per (entity, ts) — pass
    ``tie_break`` (source column names, largest tuple wins) when it
    does not, so the carried row is deterministic across engines.
    ``max_staleness`` is an SQL interval body (e.g. ``"3 days"``);
    matches older than ``spine.ts - max_staleness`` become NULL.
    Output columns are ``{name}_{feature}`` plus ``{name}_ts`` (the
    matched feature timestamp, nulled under the same staleness rule).
    """

    name: str
    source: DataFrame
    entity_col: str
    ts_col: str
    features: list[str]
    max_staleness: str | None = None
    tie_break: list[str] = field(default_factory=list)


@dataclass(frozen=True)
class RollingFeature:
    """A trailing-window aggregate family ending at the spine row's
    timestamp (inclusive both ends: rows with ``ts in [spine.ts -
    window, spine.ts]`` participate).

    Emits ``{name}_cnt`` (BIGINT, never NULL) and — when ``value_col``
    is set — ``{name}_sum`` (decimal-exact double, 0.0 when empty).
    """

    name: str
    source: DataFrame
    entity_col: str
    ts_col: str
    window: str  # SQL interval body, e.g. "24 hours"
    value_col: str | None = None


def _interval_us(spark_df: DataFrame, interval: str):
    """Interval width in microseconds as a Column (difference of two
    unix_micros so the session-zone offset cancels — same trick as
    ``range_join``)."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    return F.unix_micros(epoch + F.expr(f"INTERVAL {interval}")) - F.unix_micros(epoch)


def apply_view(spine: DataFrame, view: FeatureView, entity_col: str, ts_col: str) -> DataFrame:
    """Attach one as-of feature view to the spine (see FeatureView)."""
    out_ts = f"{view.name}_ts"
    feat_out = {f: f"{view.name}_{f}" for f in view.features}
    right = view.source.select(
        F.col(view.entity_col).alias(entity_col),
        F.col(view.ts_col).alias(out_ts),
        *[F.col(f).alias(feat_out[f]) for f in view.features],
        *[F.col(t) for t in view.tie_break],
    )
    joined = asof_join(
        spine,
        right,
        on=entity_col,
        left_ts=ts_col,
        right_ts=out_ts,
        payload=list(feat_out.values()),
        tie_break=view.tie_break,
    )
    if view.tie_break:
        joined = joined.drop(*view.tie_break)
    if view.max_staleness is None:
        return joined
    fresh = F.col(out_ts) >= F.col(ts_col) - F.expr(f"INTERVAL {view.max_staleness}")
    keep = [c for c in joined.columns if c != out_ts and c not in feat_out.values()]
    return joined.select(
        *keep,
        *[F.when(fresh, F.col(a)).alias(a) for a in feat_out.values()],
        F.when(fresh, F.col(out_ts)).alias(out_ts),
    )


def apply_rolling(
    spine: DataFrame, roll: RollingFeature, entity_col: str, ts_col: str
) -> DataFrame:
    """Attach one trailing-window aggregate family to the spine.

    The aggregate is a function of (entity, ts) alone, so it is
    computed once per distinct spine point and equi-joined back —
    duplicate spine rows per (entity, ts) share the value instead of
    inflating the window frame.
    """
    src = roll.source.select(
        F.col(roll.entity_col).alias(entity_col),
        F.col(roll.ts_col).alias("__ts"),
        *(
            [F.col(roll.value_col).cast(DECIMAL_TYPE).alias("__val")]
            if roll.value_col
            else [F.lit(None).cast(DECIMAL_TYPE).alias("__val")]
        ),
    )
    pts = spine.select(entity_col, F.col(ts_col).alias("__ts")).distinct()
    u = pts.select(
        entity_col,
        "__ts",
        F.lit(1).alias("__side"),
        F.lit(None).cast(DECIMAL_TYPE).alias("__val"),
    ).unionByName(src.select(entity_col, "__ts", F.lit(0).alias("__side"), "__val"))
    win_us = _interval_us(spine, roll.window)
    u = u.withColumn("__us", F.unix_micros(F.col("__ts").cast("timestamp")))
    # rangeBetween takes literal ints; materialize the interval width
    # via a 1-row local eval (no data scan — the expression is constant)
    width = u.sparkSession.range(1).select(win_us.alias("w")).first()["w"]
    w = (
        Window.partitionBy(entity_col)
        .orderBy("__us")
        .rangeBetween(-int(width), 0)
    )
    cnt = F.count(F.when(F.col("__side") == 0, F.lit(1))).over(w)
    cols = [F.col(entity_col), F.col("__ts"), cnt.alias(f"{roll.name}_cnt")]
    if roll.value_col:
        s = F.sum(F.when(F.col("__side") == 0, F.col("__val"))).over(w)
        cols.append(F.coalesce(s.cast("double"), F.lit(0.0)).alias(f"{roll.name}_sum"))
    feat = u.select(*cols, "__side").filter(F.col("__side") == 1).drop("__side")
    return spine.join(
        feat.withColumnRenamed("__ts", ts_col), [entity_col, ts_col], "inner"
    )


def build_training_frame(
    spine: DataFrame,
    entity_col: str,
    ts_col: str,
    views: list[FeatureView] | tuple = (),
    rollings: list[RollingFeature] | tuple = (),
) -> DataFrame:
    """Compose as-of views and rolling features onto a labeled spine.

    Every feature value is observable at ``spine.ts`` (backward-
    inclusive): as-of carries the latest ``feature.ts <= spine.ts``
    row; rolling windows end at ``spine.ts``. ``point_in_time_audit``
    machine-checks the invariant.
    """
    out = spine
    for v in views:
        out = apply_view(out, v, entity_col, ts_col)
    for r in rollings:
        out = apply_rolling(out, r, entity_col, ts_col)
    return out


def point_in_time_audit(frame: DataFrame, ts_col: str, view_ts_cols: list[str]) -> DataFrame:
    """One-row frame counting point-in-time violations per view ts
    column (a carried feature timestamp strictly AFTER the spine
    timestamp = future leakage). All zeros ⇔ the frame is
    leakage-free."""
    return frame.agg(
        *[
            F.count(F.when(F.col(c) > F.col(ts_col), F.lit(1))).alias(f"{c}_leaks")
            for c in view_ts_cols
        ]
    )


def rolling_sum_oracle_sql(inner: str) -> str:
    """DuckDB twin of the rolling decimal-sum → double hop: the direct
    decimal→double cast is not correctly rounded in DuckDB; the VARCHAR
    hop matches Java's BigDecimal.doubleValue (see exact_agg)."""
    return f"CAST(CAST(({inner}) AS VARCHAR) AS DOUBLE)"
