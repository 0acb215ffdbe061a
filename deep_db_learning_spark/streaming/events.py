"""Structured Streaming ingestion of the ``events`` table (extension —
the reference has **zero** streaming functionality, SURVEY §2.9; this
is the BASELINE.json north-star design: events stream → windowed
per-entity features that join the node store).

Batch and stream share the same logical transformations (the DataFrame
API is identical), so every feature here is defined once and used in
both modes — the batch mode doubles as the DuckDB-checkable oracle of
the streaming computation.

Scale posture: tumbling windows + watermark bound state; the window
aggregation shuffles on (window, user_id) which is naturally balanced;
``availableNow`` triggers let backfills run as bounded streams.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deep_db_learning_spark.functions.exact_agg import exact_avg, exact_sum
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)
from pyspark.sql.window import Window

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# TIMESTAMP(NANOS) sources are read as BIGINT under nanosAsLong, then
# converted (micros truncation, like DuckDB / the batch reader)
_EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _parquet_ts_unit(path: str, column: str = "ts") -> str:
    """Timestamp unit ('ns'/'us'/'ms'/'s') of ``column`` from the footer
    of one parquet file under ``path``. Streams need a declared schema up
    front, and the right declaration depends on the physical unit — the
    driver has shipped this table as both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across rounds, so sniff, don't assume."""
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        names = [n for n in sorted(os.listdir(path)) if n.endswith(".parquet")]
        if not names:
            raise FileNotFoundError(f"no parquet files under {path}")
        f = os.path.join(path, names[0])
    return pq.read_schema(f).field(column).type.unit


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """``readStream`` over a parquet directory of event files. The
    driver testdata is a single file; a production feed would be a
    growing directory — same code."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    unit = _parquet_ts_unit(path)
    if os.path.isfile(path):
        # FileStreamSource only accepts directories; expose a single-file
        # fixture (the driver testdata) through a symlinked temp dir
        import tempfile

        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    if unit == "ns":
        # nanos: no Spark timestamp type holds them — read the raw int64
        # and truncate to micros (matching the batch reader and DuckDB)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        # event-time watermarks require TIMESTAMP (not NTZ); session tz
        # is pinned to UTC above so the instant equals the batch NTZ value
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # micros (or coarser): the natural NTZ read, cast to TIMESTAMP for
    # watermark support — identity on the instant under the UTC session
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_user_features(
    events: DataFrame, watermark: str = "2 hours", window_len: str = "1 hour"
) -> DataFrame:
    """Tumbling-window per-user features with late-data watermark.

    Works identically on a batch DataFrame (no watermark applied — the
    watermark only bounds streaming state) and a streaming one.
    """
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    # exact distinct is unsupported in streaming aggregation — HLL there
    # (exact in practice at event_type cardinalities), exact in batch
    n_types = (
        F.approx_count_distinct("event_type")
        if events.isStreaming
        else F.count_distinct("event_type")
    )
    return e.groupBy(
        F.window("ts", window_len).alias("win"), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value").alias("sum_value"),
        exact_avg("value").alias("avg_value"),
        n_types.alias("n_event_types"),
    ).select(
        F.col("win.start").alias("window_start"),
        "user_id",
        "n_events",
        "sum_value",
        "avg_value",
        "n_event_types",
    )


def sliding_user_features(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window per-user features: each event contributes to
    ``window_len / slide`` overlapping windows (Spark expands them in
    the window generator — no self-join). Batch and streaming share the
    plan exactly like :func:`hourly_user_features`."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window_len, slide).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def user_profile_features(events: DataFrame) -> DataFrame:
    """Whole-history per-user profile — the node-store feature join for
    the customer graph (FK events.user_id → customer.c_custkey)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value").alias("sum_value"),
        F.max("ts").alias("last_ts"),
        F.count_distinct("event_type").alias("n_event_types"),
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, tie_break: tuple[str, ...] = ("event_id",)
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when a
    user's inter-event gap exceeds ``gap_minutes``. Classic two-window
    formulation — lag + running sum of boundary flags. Streaming
    equivalent would use ``session_window``; batch form is the oracle.

    ``tie_break`` columns extend the window ordering beyond ``ts`` so
    rows sharing (user_id, ts) have ONE deterministic lag order across
    runs, partitionings, and engines. Session membership is provably
    tie-order-invariant (equal-ts rows get gap 0), but determinism of
    the full plan is a correctness property here, not an optimization:
    the oracle SQL orders by the same columns.
    """
    tb = [c for c in tie_break if c in events.columns]
    w = Window.partitionBy("user_id").orderBy("ts", *tb)
    # micros, not unix_timestamp (which truncates to seconds): the gap
    # decision must see sub-second precision, matching stream_sessionize
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    boundary = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return events.withColumn("__b", boundary).withColumn(
        "session_id", F.sum("__b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__b")


def session_stats(
    events: DataFrame, gap_minutes: int = 30, tie_break: tuple[str, ...] = ("event_id",)
) -> DataFrame:
    """Per-session summary built on :func:`sessionize`."""
    s = sessionize(events, gap_minutes, tie_break)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        exact_sum("value").alias("sum_value"),
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, spark: SparkSession
) -> DataFrame:
    """Execute a bounded stream (availableNow) into an in-memory sink
    and return the result table — the test/backfill harness."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
