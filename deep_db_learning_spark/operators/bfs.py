"""Set-oriented BFS neighborhood expansion (SURVEY J3 / N28).

The reference's ``BFSStrategy`` (``data/strategy/bfs.py:18-84``) runs
one SQL round-trip per hop per table **per sample row** — the
scalability anti-pattern called out in SURVEY §3 EP3. These operators
keep its exact traversal semantics but run them for an arbitrary root
*set* in one distributed job chain:

- forward expansion along every FK of a visited table;
- reverse expansion along every FK *referencing* a visited table,
  **except back into the parent table** the frontier came from
  (``bfs.py:66-70`` parent pruning);
- forward targets of the same hop are excluded from reverse expansion
  (``processed_foreigns``, ``bfs.py:60``);
- depth bound: tables at depth ≤ max_depth-1 are materialized, i.e.
  expansion stops once ``depth + 1 == max_depth`` (``bfs.py:49-50``);
- the reference supports only single-column keys (its own TODO,
  ``bfs.py:53``) — multi-column FKs are skipped identically.

ONE traversal skeleton (:func:`_bfs_traverse`) serves both the merged
and the per-root variants — the documented contract is that they have
identical traversal semantics, so the hop order, parent pruning, and
depth accounting exist exactly once; the variants differ only in their
hop join (leftsemi vs root-tag-propagating inner) and visited
projection. Frontier frames that seed another hop are materialized via
``localCheckpoint`` (not a bare ``persist`` nothing could ever
unpersist): lineage is truncated so hop N+1 never recomputes the whole
prior join chain, and the blocks are reclaimed when the frames are
garbage-collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import ForeignKey
from ..checkpoint import cut_lineage


def _referencing_map(
    foreign_keys: dict[str, list[ForeignKey]]
) -> dict[str, list[tuple[str, ForeignKey]]]:
    ref: dict[str, list[tuple[str, ForeignKey]]] = {}
    for t, fks in foreign_keys.items():
        for fk in fks:
            ref.setdefault(fk.ref_table, []).append((t, fk))
    return ref


def _bfs_traverse(
    tables: dict[str, DataFrame],
    foreign_keys: dict[str, list[ForeignKey]],
    target_table: str,
    f0: DataFrame,
    max_depth: int,
    hop,
    project,
) -> dict[str, DataFrame]:
    """The shared frontier loop. ``hop(direction, table, rows, fk,
    next_table) -> DataFrame`` produces the next frontier frame;
    ``project(table, frame) -> DataFrame`` maps a frontier frame to the
    visited-set shape accumulated per table."""
    referencing = _referencing_map(foreign_keys)
    visited: dict[str, DataFrame] = {target_table: project(target_table, f0)}
    frontier: list[tuple[str, DataFrame, str | None]] = [(target_table, f0, None)]

    for depth in range(1, max_depth):
        next_frontier: list[tuple[str, DataFrame, str | None]] = []
        for table_name, rows, parent in frontier:
            processed_forward: set[str] = set()
            # forward: along this table's FKs (single-column only — parity)
            for fk in foreign_keys.get(table_name, []):
                if len(fk.columns) != 1 or fk.ref_table not in tables:
                    continue
                next_frontier.append(
                    (fk.ref_table, hop("forward", table_name, rows, fk, fk.ref_table), table_name)
                )
                processed_forward.add(fk.ref_table)
            # reverse: tables referencing this one, parent-pruned
            for ref_table, fk in referencing.get(table_name, []):
                if (
                    ref_table in processed_forward
                    or ref_table == parent
                    or len(fk.columns) != 1
                    or ref_table not in tables
                ):
                    continue
                next_frontier.append(
                    (ref_table, hop("reverse", table_name, rows, fk, ref_table), table_name)
                )
        # frames that will seed ANOTHER hop get materialized: without it,
        # hop N+1's joins recompute every prior hop's join chain
        # (iterative-algorithm lineage growth — the classic Spark trap)
        if depth < max_depth - 1:
            next_frontier = [
                (t, cut_lineage(rows, eager=True), parent)
                for t, rows, parent in next_frontier
            ]
        for table_name, rows, _ in next_frontier:
            v = project(table_name, rows)
            visited[table_name] = (
                visited[table_name].unionByName(v) if table_name in visited else v
            )
        frontier = next_frontier

    return {t: df.dropDuplicates() for t, df in visited.items()}


def bfs_expand(
    tables: dict[str, DataFrame],
    foreign_keys: dict[str, list[ForeignKey]],
    target_table: str,
    roots: DataFrame,
    max_depth: int,
    primary_keys: dict[str, list[str]] | None = None,
) -> dict[str, DataFrame]:
    """Expand from ``roots`` (a DataFrame of target-table rows, or of
    just its key columns) and return {table → distinct visited rows}.

    Per-hop frontiers are ``leftsemi`` joins (P5: the distributed
    analog of ``WHERE key IN (:keys)``), so only key columns shuffle,
    never full rows. ``primary_keys`` is accepted for signature parity;
    reverse expansion uses each FK's declared ``ref_columns`` (strictly
    more correct than the reference's "first column" assumption,
    ``bfs.py:63``, and identical on the star schema).
    """
    if max_depth <= 0:
        return {}

    root_rows = tables[target_table].join(
        roots.select(*[c for c in roots.columns if c in tables[target_table].columns]),
        on=[c for c in roots.columns if c in tables[target_table].columns],
        how="leftsemi",
    )

    def hop(direction, table_name, rows, fk, next_table):
        if direction == "forward":
            keys = rows.select(F.col(fk.columns[0]).alias(fk.ref_columns[0])).distinct()
            return tables[next_table].join(keys, fk.ref_columns[0], "leftsemi")
        keys = rows.select(F.col(fk.ref_columns[0]).alias(fk.columns[0])).distinct()
        return tables[next_table].join(keys, fk.columns[0], "leftsemi")

    return _bfs_traverse(
        tables, foreign_keys, target_table, root_rows, max_depth, hop,
        project=lambda t, df: df,
    )


def bfs_expand_per_root(
    tables: dict[str, DataFrame],
    foreign_keys: dict[str, list[ForeignKey]],
    target_table: str,
    roots: DataFrame,
    max_depth: int,
    primary_keys: dict[str, list[str]],
) -> dict[str, DataFrame]:
    """Per-root BFS: identical traversal semantics to :func:`bfs_expand`
    (literally the same :func:`_bfs_traverse` skeleton) but every
    visited row stays tagged with the root it was reached from — the
    minibatch-training shape. Returns
    ``{table → DataFrame(root_id, *pk_cols)}`` with one row per
    (root, visited row).

    The reference materializes one subgraph per target row in a Python
    loop — ``get(idx)`` (``data/dataset.py:249-258``) re-runs
    ``BFSStrategy`` per sample. Here ALL roots expand in one job chain:
    frontiers carry a ``root_id`` column, hops are inner joins on the FK
    key (propagating the tag), and membership dedup is per (root, row).
    Row-count cost is inherently Σ|subgraph| — the same rows the
    reference would copy per sample, minus the per-row round-trips.
    Frontiers project only key columns (pk + FK endpoints), so wide
    tables never shuffle full rows.
    """
    if max_depth <= 0:
        return {}
    tpk = primary_keys[target_table]
    if len(tpk) != 1:
        raise ValueError("per-root BFS needs a single-column target pk as root id")
    root_col = tpk[0]

    referencing = _referencing_map(foreign_keys)

    def key_cols(t: str) -> list[str]:
        cols = set(primary_keys.get(t, []))
        for fk in foreign_keys.get(t, []):
            if len(fk.columns) == 1 and fk.ref_table in tables:
                cols.add(fk.columns[0])
        for rt, fk in referencing.get(t, []):
            if len(fk.columns) == 1 and rt in tables:
                cols.add(fk.ref_columns[0])
        return sorted(c for c in cols if c in tables[t].columns)

    base = tables[target_table].select(*key_cols(target_table))
    f0 = base.join(
        roots.select(F.col(root_col)).distinct(), root_col, "leftsemi"
    ).withColumn("root_id", F.col(root_col))

    def hop(direction, table_name, rows, fk, next_table):
        if direction == "forward":
            keys = rows.select(
                "root_id", F.col(fk.columns[0]).alias(fk.ref_columns[0])
            ).distinct()
            return tables[next_table].select(*key_cols(next_table)).join(
                keys, fk.ref_columns[0], "inner"
            )
        keys = rows.select(
            "root_id", F.col(fk.ref_columns[0]).alias(fk.columns[0])
        ).distinct()
        return tables[next_table].select(*key_cols(next_table)).join(
            keys, fk.columns[0], "inner"
        )

    return _bfs_traverse(
        tables, foreign_keys, target_table, f0, max_depth, hop,
        project=lambda t, df: df.select("root_id", *primary_keys.get(t, [])),
    )


def bfs_visited_counts_per_root(
    tables: dict[str, DataFrame],
    foreign_keys: dict[str, list[ForeignKey]],
    target_table: str,
    roots: DataFrame,
    max_depth: int,
    primary_keys: dict[str, list[str]],
) -> DataFrame:
    """Oracle-checkable summary of :func:`bfs_expand_per_root`:
    (root_id, table_name, n_visited) with one row per root × visited
    table (tables a root never reaches are absent, matching the
    reference's per-sample subgraph containing only reached stores)."""
    visited = bfs_expand_per_root(
        tables, foreign_keys, target_table, roots, max_depth, primary_keys
    )
    out = None
    for t in sorted(visited):
        row = visited[t].groupBy("root_id").agg(
            F.count(F.lit(1)).alias("n_visited")
        ).select("root_id", F.lit(t).alias("table_name"), "n_visited")
        out = row if out is None else out.unionByName(row)
    if out is not None:
        return out
    # empty fallback mirrors the normal path's schema: root_id keeps the
    # root column's actual type (string/int/... roots), not a hardcoded one
    root_col = primary_keys[target_table][0]
    if root_col in roots.columns:
        root_type = roots.schema[root_col].dataType.simpleString()
    else:
        root_type = roots.schema[roots.columns[0]].dataType.simpleString()
    return roots.sparkSession.createDataFrame(
        [], f"root_id {root_type}, table_name string, n_visited bigint"
    )


def bfs_visited_counts(
    tables: dict[str, DataFrame],
    foreign_keys: dict[str, list[ForeignKey]],
    target_table: str,
    roots: DataFrame,
    max_depth: int,
) -> DataFrame:
    """Convenience summary: (table_name, n_visited) — the oracle-checkable
    shape of a BFS result."""
    visited = bfs_expand(tables, foreign_keys, target_table, roots, max_depth)
    spark = roots.sparkSession
    out = None
    for t in sorted(visited):
        row = visited[t].agg(F.count(F.lit(1)).alias("n_visited")).select(
            F.lit(t).alias("table_name"), "n_visited"
        )
        out = row if out is None else out.unionByName(row)
    return out if out is not None else spark.createDataFrame(
        [], "table_name string, n_visited bigint"
    )
