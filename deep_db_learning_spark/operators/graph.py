"""Heterogeneous-graph construction from FK metadata (SURVEY §2.3).

The reference builds a PyG ``HeteroData``: per-table node stores with
**positional** row indices and per-FK ``edge_index`` tensors produced by
pandas inner merges (``data/utils/heterodata_builder.py:130-158``,
duplicate impl ``data/ctu_dataset.py:301-333``). Our graph is a pair of
DataFrame families — ``nodes[table]`` carrying ``node_id`` and
``edges[edge_type]`` carrying ``(src, dst)`` — exactly the GraphFrames
layout, persisted as Parquet.

Node-id strategy (the 100 TB decision):

- ``mode="pk"`` (default): ``node_id`` = the table's single numeric PK.
  Zero shuffle, zero scan — ids are stable under repartitioning and
  appends, and every downstream join co-partitions on them.
- composite integral PK: mixed-radix **packed bigint** of the key
  columns (one tiny min/max agg to size the radices). Still a pure row
  expression — no window, no sort, stable under recomputation — so
  composite-PK fact tables (lineitem) keep the fused aggregation path.
- ``mode="positional"``: contiguous [0, n) ids via ``row_number()``
  ordered by PK, for strict parity with PyG tensors and for export to
  training frameworks that need dense indices. A global row_number is
  a single-partition sort at scale — parity/export ONLY, never the
  default; the packed path above exists precisely so no default build
  ever funnels a fact table through one task.

Edge semantics: inner join ⇒ rows with NULL FK or dangling reference
silently drop — J2, matching the reference (``heterodata_builder.py:145-151``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..schema import DBSchema, ForeignKey

# below this row count a join side is explicitly broadcast (dimension
# tables, code tables); Spark's own threshold is byte-based — this is a
# row-based hint for sides we know are small from profiling
BROADCAST_ROW_LIMIT = 1_000_000


_INTEGRAL_DTYPES = {"tinyint", "smallint", "int", "bigint"}

# (DataFrame, pk) → the packed-id stats (mins, ranges, maxdup) | None.
# The stats job is one cheap columnar agg, but build_hetero_graph runs
# per pipeline stage (bench: 5+ builds per session over the SAME loaded
# tables), and paying the fact-table scan each time doubled the graph
# build. Strong refs are fine: bounded by distinct tables per session.
#
# INVALIDATION CONTRACT: packed ids (like the reference's positional
# pandas index) assume a STATIC table. A DataFrame over a growing
# parquet directory re-lists files per action — keys appended outside
# the cached [min, max] would pack out of range. Call
# clear_packed_stats() after mutating a source a cached frame reads
# (the streaming node-store path builds fresh frames per snapshot, so
# it never hits this).
_PACKED_STATS: dict = {}


def clear_packed_stats() -> None:
    """Drop memoized packed-node-id stats (see the invalidation
    contract above) — required after appending to a source file/dir
    that a previously-built graph's DataFrame reads."""
    _PACKED_STATS.clear()


def _packed_node_id_expr(df: DataFrame, pk: list[str]):
    """Mint a composite-PK ``node_id`` as a pure row expression: a
    mixed-radix pack of ``(col - min(col))`` over the key columns.

    One tiny agg job (min/max of the key columns — a columnar scan of
    just those columns) buys a shuffle-free, sort-free id that is stable
    under repartitioning and recomputation. This replaces the former
    positional fallback, whose partition-less ``Window.orderBy`` funnels
    the whole table through ONE task — on this very testdata that table
    is lineitem, the fact table, so the old fallback was the repo's one
    genuine scale-killer. Returns ``None`` when the key has non-integral
    columns, NULLs in the min/max, or the packed range would overflow
    int64 — callers then fall back to positional.
    """
    dtypes = dict(df.dtypes)
    if not pk or any(dtypes.get(c) not in _INTEGRAL_DTYPES for c in pk):
        return None
    key = (df, tuple(pk))
    if key in _PACKED_STATS:
        stats = _PACKED_STATS[key]
        if stats is None:
            return None
        mins, ranges, maxdup = stats
    else:
        # one parallel job: per-key-column min/max plus the worst duplicate
        # count of the declared key (driver-generated data does ship key
        # dups — the id must stay unique per ROW, like the reference's
        # positional pandas index). groupBy(pk) is a shuffle of the key
        # columns only, with map-side partial aggregation — a normal
        # parallel job, unlike the single-task global sort this replaces.
        grouped = df.groupBy(*[F.col(c) for c in pk]).agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        aggs = [F.max("__cnt").alias("__maxdup")]
        for c in pk:
            aggs.append(F.min(F.col(c).cast("bigint")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("bigint")).alias(f"__max_{c}"))
        row = grouped.agg(*aggs).first()
        mins = [row[f"__min_{c}"] for c in pk]
        maxs = [row[f"__max_{c}"] for c in pk]
        maxdup = row["__maxdup"]
        if any(v is None for v in mins + maxs):
            _PACKED_STATS[key] = None
            return None  # empty table or NULLs in the key
        ranges = [mx - mn + 1 for mn, mx in zip(mins, maxs)]
        if maxdup > 1:
            ranges.append(maxdup)
        total = 1
        for r in ranges:
            total *= r
            if total >= 1 << 62:
                _PACKED_STATS[key] = None
                return None
        _PACKED_STATS[key] = (mins, ranges, maxdup)
    expr = None
    for c, mn, r in zip(pk, mins, ranges):
        digit = F.col(c).cast("bigint") - F.lit(mn)
        expr = digit if expr is None else expr * F.lit(r) + digit
    if maxdup > 1:
        # disambiguate duplicate-key rows with a rank from a window
        # PARTITIONED by the key (tiny groups, fully parallel — no
        # Exchange SinglePartition anywhere in the plan). Order by the
        # remaining sortable columns PLUS an xxhash64 of the
        # non-orderable ones: dup rows differing only in an array/map/
        # struct/binary column would otherwise tie, making the rank —
        # and therefore node ids across separately-evaluated frames —
        # nondeterministic. Fully identical rows still tie and are
        # interchangeable.
        orderable, hashed = [], []
        for c, t in df.dtypes:
            if c in pk:
                continue
            (hashed if t.startswith(("array", "map", "struct", "binary")) else orderable).append(c)
        order_cols = [F.col(c) for c in pk + orderable]
        if hashed:
            order_cols.append(F.xxhash64(*[F.col(c) for c in hashed]))
        w = Window.partitionBy(*[F.col(c) for c in pk]).orderBy(*order_cols)
        expr = expr * F.lit(maxdup) + (F.row_number().over(w) - 1)
    return expr


def mint_node_ids(
    df: DataFrame, pk: list[str], mode: str = "pk", id_col: str = "node_id"
) -> tuple[DataFrame, str]:
    """Attach a stable ``node_id``; returns ``(df, kind)`` where kind is
    ``"pk"`` (id == the single pk), ``"packed"`` (pure expression of a
    composite pk), or ``"positional"`` (dense row_number — parity/export
    only; carries a global sort)."""
    if mode == "pk":
        if len(pk) == 1:
            return df.withColumn(id_col, F.col(pk[0]).cast("bigint")), "pk"
        packed = _packed_node_id_expr(df, pk)
        if packed is not None:
            return df.withColumn(id_col, packed), "packed"
        mode = "positional"
    if mode == "positional":
        if not pk:
            raise ValueError("positional node ids require a primary key ordering")
        w = Window.orderBy(*[F.col(c) for c in pk])
        return df.withColumn(id_col, (F.row_number().over(w) - 1).cast("bigint")), "positional"
    raise ValueError(f"unknown node id mode {mode!r}")


def with_node_ids(
    df: DataFrame, pk: list[str], mode: str = "pk", id_col: str = "node_id"
) -> DataFrame:
    """Attach a stable ``node_id`` (see :func:`mint_node_ids`)."""
    return mint_node_ids(df, pk, mode, id_col)[0]


def fk_edges(
    src_nodes: DataFrame,
    dst_nodes: DataFrame,
    fk: ForeignKey,
    src_id: str = "node_id",
    dst_id: str = "node_id",
    broadcast_dst: bool | None = None,
) -> DataFrame:
    """J1: one FK ⇒ one ``(src, dst)`` edge DataFrame.

    Multi-column FKs join on all column pairs. The dst side projects
    only ``ref_columns + node_id`` (column pruning reaches the scan);
    when the dst table is a known-small dimension, broadcast it so the
    fact table never shuffles.
    """
    s = src_nodes.select(F.col(src_id).alias("src"), *[F.col(c) for c in fk.columns])
    d = dst_nodes.select(F.col(dst_id).alias("dst"), *[F.col(c) for c in fk.ref_columns])
    if broadcast_dst:
        d = broadcast(d)
    cond = None
    for c, rc in zip(fk.columns, fk.ref_columns):
        # plain equality (not null-safe): NULL FKs must drop (J2)
        clause = s[c] == d[rc]
        cond = clause if cond is None else (cond & clause)
    return s.join(d, cond, "inner").select("src", "dst")


def reverse_edges(edges: DataFrame) -> DataFrame:
    """J5: the ``rev_`` edge type (``T.ToUndirected()`` analog,
    ``heterodata_builder.py:295-297``)."""
    return edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))


def self_loop_edges(nodes: DataFrame, id_col: str = "node_id") -> DataFrame:
    """J6: ``T.AddSelfLoops()`` analog (``data/dataset.py:365``)."""
    return nodes.select(F.col(id_col).alias("src"), F.col(id_col).alias("dst"))


@dataclass
class HeteroGraph:
    """The engine's ``HeteroData``: node/edge DataFrames + typing.

    ``edges`` keys are ``(src_table, fk_name, dst_table)`` flattened to
    ``"src_table__fkname__dst_table"`` for Parquet-path safety.
    """

    nodes: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[str, DataFrame] = field(default_factory=dict)
    edge_meta: dict[str, tuple[str, str]] = field(default_factory=dict)  # type → (src_table, dst_table)
    edge_fks: dict[str, ForeignKey] = field(default_factory=dict)  # forward edges only
    pk_node_ids: set[str] = field(default_factory=set)  # tables where node_id == single pk
    # tables whose node_id is a pure row expression (single pk OR packed
    # composite pk) — no window, stable under recomputation; such tables
    # are eligible as the SRC side of the fused aggregation plan
    expr_node_ids: set[str] = field(default_factory=set)

    @staticmethod
    def edge_type(src_table: str, fk: ForeignKey) -> str:
        return f"{src_table}__{'_'.join(fk.columns)}__{fk.ref_table}"

    def aggregate_along_edge(
        self,
        et: str,
        feature_cols: list[str],
        aggs: list[str] = ("mean",),
        prefix: str = "",
        features: DataFrame | None = None,
        neighbor_budget: int | None = None,
        budget_seed: int = 42,
    ) -> DataFrame:
        """1-hop message aggregation over an edge type, with plan fusion.

        The generic form is ``edges ⋈ src_features → groupBy(dst)``
        (:func:`~.message_passing.aggregate_neighbors`) — but when the
        edge type is a *forward FK edge*, features are the src table's
        own columns, and both endpoints use pk node ids, that plan scans
        the src table twice (edge list + features) and re-joins them on
        node_id — a self-join Catalyst cannot eliminate (Spark has no FK
        constraints to reason with). The fused plan is

            src.select(fk AS dst, features) → groupBy(dst) → agg
              → leftsemi dst_keys

        one scan, the same single shuffle, and the semi join preserves
        J2 semantics (NULL FKs and dangling refs drop; dst keys are
        unique pks so inner-join ≡ semi-join here). Aggregating BEFORE
        the semi join keeps the joined row count at |groups|, not
        |edges|. At 100 TB this halves fact-table scans per layer.

        ``features``: a derived frame keyed by ``node_id``. When the
        edge is a forward FK edge it STILL fuses — the src table's
        (node_id, fk) projection joins the feature frame directly and
        the dst-existence check becomes a semi join on the aggregated
        output (|groups| rows), never on the fact table. Equivalent to
        the generic plan for any data: dangling/NULL fk groups are
        dropped by the semi join instead of before aggregation.

        ``neighbor_budget``: keep ≤k pseudo-random src rows per dst
        before aggregating — the reference's ``HGTLoader``
        ``num_samples`` fan-out cap (``experiments/blueprint_mlflow.py:
        119-133``, ≤50 neighbors/node type/layer). The sample is the
        deterministic :func:`~.sampling.sample_neighbors` order
        (``knuth_hash(src_node_id, budget_seed)``, src id tie-break) so
        it is identical on any engine and any partitioning. The window
        partitions on the same ``dst`` key the aggregation groups on,
        so AQE reuses the exchange — budgeting adds a per-partition
        sort, not a second shuffle. Sampling runs per dst group
        independently, so doing it before the dst-existence semi join
        (fused path) equals sampling the inner-joined edge list.
        """
        from .message_passing import aggregate_neighbors
        from .sampling import sample_neighbors

        src_t, dst_t = self.edge_meta[et]
        src_nodes = self.nodes[src_t]
        fk = self.edge_fks.get(et)
        keyed_features = (
            features is not None
            and features is not src_nodes
            and "node_id" in features.columns
            and all(c in features.columns for c in feature_cols)
        )
        # fusability: the dst side MUST use raw-pk node ids (the fk
        # column value IS the dst node_id); the src side only needs a
        # row-expression id (pk or packed composite) so that keyed
        # feature frames join consistently — composite-PK fact tables
        # (lineitem) fuse too
        fusable = (
            fk is not None
            and len(fk.columns) == 1
            and (features is None or features is src_nodes or keyed_features)
            and src_t in (self.pk_node_ids | self.expr_node_ids)
            and dst_t in self.pk_node_ids
            and (
                keyed_features
                or all(c in src_nodes.columns for c in feature_cols)
            )
        )
        if not fusable:
            feats = features if features is not None else src_nodes
            edges = self.edges[et]
            if neighbor_budget is not None:
                edges = sample_neighbors(edges, neighbor_budget, budget_seed)
            return aggregate_neighbors(
                edges, feats, feature_cols, list(aggs), prefix=prefix
            )
        from .message_passing import agg_expressions

        if keyed_features:
            dtypes = dict(features.dtypes)
            fact = src_nodes.select(
                "node_id", F.col(fk.columns[0]).cast("bigint").alias("dst")
            )
            # sample BEFORE the feature join — the budget is structural
            # (≤k graph neighbors per dst, like the generic path which
            # samples the raw edge list); a feature-less sampled
            # neighbor then drops in the inner join rather than being
            # silently replaced by a feature-bearing one
            if neighbor_budget is not None:
                fact = sample_neighbors(
                    fact, neighbor_budget, budget_seed, src="node_id"
                )
            fact = fact.join(
                features.select("node_id", *feature_cols), "node_id"
            ).drop("node_id")
        else:
            dtypes = dict(src_nodes.dtypes)
            fact = src_nodes.select(
                F.col("node_id").alias("__src"),
                F.col(fk.columns[0]).cast("bigint").alias("dst"),
                *[F.col(c) for c in feature_cols],
            )
            if neighbor_budget is not None:
                fact = sample_neighbors(
                    fact, neighbor_budget, budget_seed, src="__src"
                )
            fact = fact.drop("__src")
        grouped = fact.groupBy("dst").agg(
            *agg_expressions(dtypes, feature_cols, list(aggs), prefix)
        )
        dst_keys = self.nodes[dst_t].select(F.col("node_id").alias("dst"))
        return grouped.join(dst_keys, "dst", "leftsemi")

    def add_reverse_edges(self) -> "HeteroGraph":
        """J5 for every edge type (skipping already-reversed ones)."""
        for et in list(self.edges):
            if et.startswith("rev_"):
                continue
            rev = "rev_" + et
            if rev not in self.edges:
                self.edges[rev] = reverse_edges(self.edges[et])
                s, d = self.edge_meta[et]
                self.edge_meta[rev] = (d, s)
        return self

    def add_self_loops(self) -> "HeteroGraph":
        for t, nodes in self.nodes.items():
            et = f"self_{t}"
            if et not in self.edges:
                self.edges[et] = self_loop_edges(nodes)
                self.edge_meta[et] = (t, t)
        return self

    def drop_empty(self) -> "HeteroGraph":
        """P9: empty-store elimination (``nn/models/blueprint.py:198-214``).
        ``isEmpty`` is a cheap limit-1 job, not a full count."""
        self.nodes = {t: df for t, df in self.nodes.items() if not df.isEmpty()}
        self.edges = {
            et: df
            for et, df in self.edges.items()
            if self.edge_meta[et][0] in self.nodes
            and self.edge_meta[et][1] in self.nodes
            and not df.isEmpty()
        }
        self.edge_meta = {et: m for et, m in self.edge_meta.items() if et in self.edges}
        return self

    def edge_counts(self, max_concurrency: int = 8) -> dict[str, int]:
        """Count every edge type, submitting the independent count jobs
        from concurrent driver threads (same pattern as the profiler's
        prefetch): each count is one small join job; sequential
        submission leaves the executor under-filled between jobs both
        locally and on a cluster."""
        from concurrent.futures import ThreadPoolExecutor

        ets = list(self.edges)
        if len(ets) <= 1:
            return {et: self.edges[et].count() for et in ets}
        with ThreadPoolExecutor(min(max_concurrency, len(ets))) as pool:
            counts = list(pool.map(lambda et: self.edges[et].count(), ets))
        return dict(zip(ets, counts))

    def save(self, path: str, mode: str = "overwrite") -> None:
        """S9: persisted node/edge Parquet layout — the materialization
        checkpoint after which training iterations never re-run the
        build joins. A small ``meta.json`` sidecar carries edge_meta,
        edge_fks, and the node-id provenance sets so a reloaded graph
        keeps its fused-aggregation eligibility (without it, every
        ``aggregate_along_edge`` after a load silently falls back to the
        double-scan generic plan)."""
        import json

        for t, df in self.nodes.items():
            df.write.mode(mode).parquet(os.path.join(path, "nodes", t))
        for et, df in self.edges.items():
            df.write.mode(mode).parquet(os.path.join(path, "edges", et))
        meta = {
            "edge_meta": {et: list(m) for et, m in self.edge_meta.items()},
            "edge_fks": {
                et: {
                    "columns": fk.columns,
                    "ref_table": fk.ref_table,
                    "ref_columns": fk.ref_columns,
                }
                for et, fk in self.edge_fks.items()
            },
            "pk_node_ids": sorted(self.pk_node_ids),
            "expr_node_ids": sorted(self.expr_node_ids),
        }
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "HeteroGraph":
        import json

        g = cls()
        ndir, edir = os.path.join(path, "nodes"), os.path.join(path, "edges")
        for t in sorted(os.listdir(ndir)):
            g.nodes[t] = spark.read.parquet(os.path.join(ndir, t))
        for et in sorted(os.listdir(edir)):
            g.edges[et] = spark.read.parquet(os.path.join(edir, et))
        meta_path = os.path.join(path, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            g.edge_meta = {et: tuple(m) for et, m in meta["edge_meta"].items()}
            g.edge_fks = {
                et: ForeignKey(d["columns"], d["ref_table"], d["ref_columns"])
                for et, d in meta["edge_fks"].items()
            }
            g.pk_node_ids = set(meta["pk_node_ids"])
            g.expr_node_ids = set(meta["expr_node_ids"])
            return g
        # legacy layout without a sidecar: reconstruct edge_meta from the
        # directory names, stripping only a LEADING rev_/self_ prefix
        # (mid-string occurrences belong to FK column names)
        for et in g.edges:
            if et.startswith("self_"):
                t = et[len("self_"):]
                g.edge_meta[et] = (t, t)
                continue
            base = et[len("rev_"):] if et.startswith("rev_") else et
            parts = base.split("__")
            if len(parts) == 3:
                src, _, dst = parts
                g.edge_meta[et] = (dst, src) if et.startswith("rev_") else (src, dst)
        return g


def build_hetero_graph(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list[ForeignKey]],
    id_mode: str = "pk",
    table_sizes: dict[str, int] | None = None,
    add_reverse: bool = True,
) -> HeteroGraph:
    """The ``build_hetero_data`` analog (``ctu_dataset.py:101-232``):
    node ids for every table, one edge DataFrame per FK, optional
    reverse edges. Dimension tables below :data:`BROADCAST_ROW_LIMIT`
    (when sizes are known from profiling) broadcast in the edge joins.
    """
    g = HeteroGraph()
    for t, df in tables.items():
        pk = primary_keys.get(t, [])
        g.nodes[t], kind = mint_node_ids(df, pk, id_mode)
        if kind == "pk":
            g.pk_node_ids.add(t)
            g.expr_node_ids.add(t)
        elif kind == "packed":
            g.expr_node_ids.add(t)
    for t, fks in foreign_keys.items():
        if t not in g.nodes:
            continue
        for fk in fks:
            if fk.ref_table not in g.nodes:
                continue
            bc = None
            if table_sizes and table_sizes.get(fk.ref_table, 1 << 60) <= BROADCAST_ROW_LIMIT:
                bc = True
            et = HeteroGraph.edge_type(t, fk)
            g.edges[et] = fk_edges(g.nodes[t], g.nodes[fk.ref_table], fk, broadcast_dst=bc)
            g.edge_meta[et] = (t, fk.ref_table)
            g.edge_fks[et] = fk
    if add_reverse:
        g.add_reverse_edges()
    return g


def graph_statistics(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, list[str]],
    foreign_keys: dict[str, list[ForeignKey]],
) -> DataFrame:
    """A9 dataset statistics (``scripts/dataset_info.py:19-60``): per FK
    edge type — tuple counts of both endpoint tables, edge count, and
    edges-per-source ratio. The per-DB totals the reference prints
    (#relations, #tuples, #edges) are the obvious aggregates of this
    frame; emitting per-edge-type rows keeps everything data-derived
    and oracle-checkable. One count per table + one per FK join — all
    independent, so they are submitted from concurrent driver threads
    (the same pool pattern as :meth:`HeteroGraph.edge_counts`): on a
    cluster, sequential submission would leave executors idle between
    ~18 small jobs."""
    from concurrent.futures import ThreadPoolExecutor

    g = build_hetero_graph(tables, primary_keys, foreign_keys, add_reverse=False)
    spark = next(iter(tables.values())).sparkSession
    with ThreadPoolExecutor(min(8, max(1, len(tables)))) as pool:
        n_rows = dict(
            zip(tables, pool.map(lambda t: tables[t].count(), tables))
        )
    edge_counts = g.edge_counts()
    rows = []
    for et in sorted(g.edges):
        src_t, dst_t = g.edge_meta[et]
        n_edges = edge_counts[et]
        rows.append(
            (
                et,
                src_t,
                dst_t,
                n_rows[src_t],
                n_rows[dst_t],
                n_edges,
                n_edges / n_rows[src_t] if n_rows[src_t] else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "edge_type string, src_table string, dst_table string, "
        "n_src_rows bigint, n_dst_rows bigint, n_edges bigint, edges_per_src double",
    )
