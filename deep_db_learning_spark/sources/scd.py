"""Slowly-changing-dimension (SCD Type 2) maintenance.

The reference materializes each table once and never updates it
(``db_transformer/data/ctu_dataset.py`` loads a static snapshot). A
pipeline that re-trains over months of crawls needs *versioned*
dimensions: apply a batch of changes to a keyed store so that every
historical value stays queryable — the classic SCD2 layout
``(key, tracked..., valid_from, valid_to)`` with ``valid_to IS NULL``
marking the current version.

``scd2_apply`` is fully set-based and costs ONE shuffle (hash
partition on the key): open history rows and the change batch share a
single per-key window pass that

1. deduplicates changes per (key, ts) — deterministic winner by
   ``tie_break`` (largest tuple wins);
2. drops *late* changes (``ts <=`` the open row's ``valid_from``) —
   an out-of-order feed cannot silently rewrite closed history; audit
   them first with :func:`scd2_late_changes`;
3. suppresses no-ops — a change equal (null-safe) to the immediately
   preceding version creates no new version;
4. closes each superseded version at the next kept change
   (``valid_to = lead(valid_from)``).

Batch-boundary independence is the correctness contract: applying a
time-ordered change feed in any number of batches yields the same
history as one batch (driver-oracle-checked — the DuckDB twin computes
the whole history in one window pass while the engine applies three
batches).

At 100 TB: closed rows stream through untouched (filter + union, no
shuffle); only open rows + the batch shuffle. State never reaches the
driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _keys(key_cols: list[str] | str) -> list[str]:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def scd2_apply(
    history: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str] | str,
    tracked_cols: list[str],
    ts_col: str = "ts",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Apply a change batch to an SCD2 history (None = empty store).

    ``changes``: one row per observed version — ``key_cols``,
    ``tracked_cols``, ``ts_col`` (observation time). ``history``:
    ``key_cols + tracked_cols + [valid_from, valid_to]``.
    Returns the new history with the same layout.
    """
    keys = _keys(key_cols)
    tie_break = tie_break or list(tracked_cols)
    out_cols = keys + list(tracked_cols) + ["valid_from", "valid_to"]
    if history is not None:
        missing = set(out_cols) - set(history.columns)
        if missing:
            raise ValueError(f"history is missing SCD2 columns: {sorted(missing)}")

    ch = changes.select(
        *keys,
        *tracked_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__src"),
        *[F.col(t).alias(f"__tb_{t}") for t in tie_break],
    )
    if history is None:
        closed = None
        u = ch
    else:
        closed = history.filter(F.col("valid_to").isNotNull()).select(*out_cols)
        open_rows = history.filter(F.col("valid_to").isNull()).select(
            *keys,
            *tracked_cols,
            F.col("valid_from").alias("__ts"),
            F.lit(0).alias("__src"),
            # the open row always wins its own timestamp slot; its
            # tie_break values are never compared against a change's
            # (late changes at that ts are dropped first)
            *[F.col(t).alias(f"__tb_{t}") for t in tie_break],
        )
        u = open_rows.unionByName(ch)

    w_key = Window.partitionBy(*keys)
    # (2) late-change drop: anything at or before the open row's ts
    open_ts = F.max(F.when(F.col("__src") == 0, F.col("__ts"))).over(w_key)
    u = u.withColumn("__open_ts", open_ts).filter(
        (F.col("__src") == 0)
        | F.col("__open_ts").isNull()
        | (F.col("__ts") > F.col("__open_ts"))
    )
    # (1) per-(key, ts) winner: order by (ts, src, tie_break DESC) and
    # keep the first row of each ts run — same partitioning, the sort
    # is shared by every following window
    w_ord = w_key.orderBy(
        F.col("__ts"),
        F.col("__src"),
        *[F.col(f"__tb_{t}").desc() for t in tie_break],
    )
    u = u.withColumn("__prev_ts", F.lag("__ts").over(w_ord)).filter(
        F.col("__prev_ts").isNull() | (F.col("__prev_ts") != F.col("__ts"))
    )
    # (3) no-op suppression: null-safe compare against the previous
    # kept version (ts now unique per key, so orderBy ts alone)
    w_ts = w_key.orderBy("__ts")
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(t).eqNullSafe(F.lag(F.col(t)).over(w_ts))
            for t in tracked_cols
        ],
    )
    first = F.lag("__ts").over(w_ts).isNull()
    u = u.withColumn("__keep", first | changed).filter(F.col("__keep"))
    # (4) close superseded versions
    u = u.select(
        *keys,
        *tracked_cols,
        F.col("__ts").alias("valid_from"),
        F.lead("__ts").over(w_ts).alias("valid_to"),
    )
    return u if closed is None else closed.unionByName(u)


def scd2_late_changes(
    history: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str] | str,
    ts_col: str = "ts",
) -> DataFrame:
    """The change rows :func:`scd2_apply` would drop as late (at or
    before the key's open ``valid_from``) — audit before applying."""
    keys = _keys(key_cols)
    if history is None:
        return changes.limit(0)
    open_ts = history.filter(F.col("valid_to").isNull()).select(
        *keys, F.col("valid_from").alias("__open_ts")
    )
    return (
        changes.join(open_ts, keys, "inner")
        .filter(F.col(ts_col) <= F.col("__open_ts"))
        .drop("__open_ts")
    )


def scd2_snapshot_at(history: DataFrame, as_of) -> DataFrame:
    """Point-in-time read: the version of each key valid at ``as_of``
    (``valid_from <= as_of < valid_to``, open versions unbounded)."""
    ts = F.lit(as_of).cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (ts < F.col("valid_to")))
    ).drop("valid_from", "valid_to")


def scd2_current(history: DataFrame) -> DataFrame:
    """The current version of every key."""
    return history.filter(F.col("valid_to").isNull()).drop("valid_to")
