"""Write-side data layout: range clustering, Morton (z-order)
interleaving, and row-group-statistics evidence.

The reference's store is a pandas pickle per table
(`db_transformer/data/dataset_defaults.py` / `ctu_dataset.py` save
paths) — at 100 TB the *layout* of the parquet you write decides how
much of it every later query has to read. Parquet readers (Spark's
vectorized scan included) skip whole row groups whose min/max
statistics exclude a pushed-down predicate; that only bites when the
writer made values *locally dense*, i.e. each row group covers a
narrow slice of the filter column's domain:

- ``write_clustered(cluster_by=[c])`` — global range partitioning on
  ``c`` (``repartitionByRange`` + ``sortWithinPartitions``): every
  output file owns one contiguous slice of the domain, so a point or
  range predicate on ``c`` touches ~1 file in N.
- ``write_clustered(cluster_by=[a, b], zorder=True)`` — Morton
  (bit-interleaved) key over 2-3 columns, the Delta/Iceberg
  ``OPTIMIZE ZORDER BY`` layout: each row group becomes a small
  hyper-rectangle of the (a, b) space, so predicates on EITHER column
  (or both) skip most groups — single-column range clustering can
  only serve its one leading column.
- ``partition_by`` composes underneath as ordinary hive partition
  pruning (directory-level, before any file is opened).

The z-key is pure JVM bit arithmetic (shift/AND/OR over longs —
whole-stage codegen, no UDF). Layout carries NO query semantics: the
row set is untouched (round-trip equality is pinned in tests), only
the physical order changes, so clustering needs no oracle — its
effect is measured by :func:`row_group_stats` /
:func:`clustering_span` over the written footers (public parquet
metadata via pyarrow).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 21  # bits per dimension; 3 dims * 21 = 63 bits < long


def morton_key(
    cols: list[Column | str],
    bounds: list[tuple[float, float]],
    bits: int = ZBITS,
) -> Column:
    """Bit-interleaved z-order key over 2-3 numeric columns.

    Each column is affinely ranked into ``[0, 2^bits)`` using the
    provided (min, max) ``bounds`` (one driver agg computes them in
    :func:`write_clustered`), then the bit planes are interleaved
    round-robin — ~40 shift/mask terms OR-folded into one long, all
    inside codegen. Rounding in the rank scaling is irrelevant to
    correctness: the key orders rows, it never filters them.
    """
    if not 2 <= len(cols) <= 3:
        raise ValueError("morton_key interleaves 2 or 3 columns")
    if len(bounds) != len(cols):
        raise ValueError("one (min, max) bound per column")
    ranks = []
    top = (1 << bits) - 1
    for c, (lo, hi) in zip(cols, bounds):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            ranks.append(F.lit(0).cast("long"))
            continue
        r = ((col.cast("double") - float(lo)) / span) * top
        ranks.append(
            F.least(F.greatest(r.cast("long"), F.lit(0)), F.lit(top))
        )
    d = len(ranks)
    terms = [
        F.shiftleft(
            F.shiftright(rank, i).bitwiseAND(F.lit(1)), i * d + j
        )
        for j, rank in enumerate(ranks)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("__zkey")


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    partition_by: list[str] | None = None,
    n_files: int | None = None,
    zorder: bool = False,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range- or z-order-clustered parquet write.

    ``n_files`` defaults to the session shuffle parallelism; at the
    cluster scale set it from ``rows × row_bytes / target_file_size``
    (or cap files with ``max_records_per_file`` and let AQE coalesce).
    The sampling ``repartitionByRange`` does for its range boundaries
    is Spark's built-in reservoir pass — no driver materialization.
    """
    spark = df.sparkSession
    n = n_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if zorder:
        bounds = df.agg(
            *[
                f
                for c in cluster_by
                for f in (
                    F.min(F.col(c).cast("double")),
                    F.max(F.col(c).cast("double")),
                )
            ]
        ).collect()[0]
        pairs = [
            (bounds[2 * i], bounds[2 * i + 1]) for i in range(len(cluster_by))
        ]
        key = morton_key(list(cluster_by), pairs)
        out = (
            df.withColumn("__zkey", key)
            .repartitionByRange(n, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def row_group_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-row-group (file, n_rows, col → (min, max)) from the parquet
    footers — driver-side evidence tooling (pyarrow), no Spark job."""
    import pyarrow.parquet as pq

    out = []
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        names = frag.physical_schema.names
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            row = {"file": frag.path, "n_rows": rg.num_rows}
            for c in cols:
                st = rg.column(names.index(c)).statistics
                row[c] = (st.min, st.max) if st else None
            out.append(row)
    return out


def clustering_span(path: str, col: str) -> float:
    """Mean normalized row-group span of ``col``: 0 → every row group
    covers a point of the domain (perfect skipping), 1 → every row
    group spans the whole domain (no skipping possible). The metric a
    100 TB table's layout is judged by."""
    stats = [s[col] for s in row_group_stats(path, [col]) if s[col]]
    los = [float(a) for a, _ in stats]
    his = [float(b) for _, b in stats]
    glo, ghi = min(los), max(his)
    if ghi == glo:
        return 0.0
    return sum(h - l for l, h in zip(los, his)) / (len(stats) * (ghi - glo))


def row_groups_touched(
    path: str, col: str, lo: float, hi: float
) -> tuple[int, int]:
    """(touched, total) row groups whose [min, max] intersects
    [lo, hi] — exactly the footer test a statistics-pruning reader
    performs for a pushed-down range predicate."""
    stats = [s[col] for s in row_group_stats(path, [col]) if s[col]]
    touched = sum(
        1 for a, b in stats if not (float(b) < lo or float(a) > hi)
    )
    return touched, len(stats)
