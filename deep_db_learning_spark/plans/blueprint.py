"""BlueprintModel as a staged relational plan (SURVEY N20, §2.8 hooks).

The reference's ``BlueprintModel`` (``nn/models/blueprint.py:24-214``)
is a composable pipeline:

    embedder → positional-enc → [pre_combination → HeteroConv(
    table_combination per edge type) → post_combination] × L →
    decoder_aggregation → decoder

Re-expressed here as a **plan over DataFrames**: each layer is one
round of join+groupBy message passing (N13 ``HeteroConv`` ≡
:func:`~..operators.message_passing.hetero_layer`), and every hook is
a user callable over DataFrames — the same extension points
(``blueprint.py:40-56``) with Spark-native signatures:

- ``embedder(nodes: dict[str, DataFrame]) -> dict[str, DataFrame]`` —
  initial per-table feature frames (default: numeric columns).
- ``pre_combination/post_combination(layer_idx, table, df) -> df`` —
  per-node-type transforms around each conv layer (N14
  ``NodeApplied``).
- ``table_combination`` — the per-edge-type aggregation set
  (default mean; the reference's per-edge conv choice).
- ``decoder(df) -> df`` — final transform of the target table frame.

Empty node frames and dangling edge types are skipped, mirroring the
empty-store elimination guard (``blueprint.py:198-214``, P9).

Scale: L layers = L shuffle rounds keyed on node_id; every layer's
frames stay partitioned on node_id so consecutive joins reuse the
exchange. Nothing collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.graph import HeteroGraph
from ..operators.message_passing import hetero_layer
from ..schema import DBSchema


def _numeric_cols(df: DataFrame) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() in ("int", "bigint", "float", "double")
        and f.name != "node_id"
    ]


@dataclass
class BlueprintPlan:
    """Configurable L-layer message-passing feature plan."""

    graph: HeteroGraph
    schema: DBSchema | None = None
    layers: int = 1
    aggs: tuple[str, ...] = ("mean",)
    embedder: Callable[[dict[str, DataFrame]], dict[str, DataFrame]] | None = None
    pre_combination: Callable[[int, str, DataFrame], DataFrame] | None = None
    post_combination: Callable[[int, str, DataFrame], DataFrame] | None = None
    decoder: Callable[[DataFrame], DataFrame] | None = None
    feature_cols: dict[str, list[str]] = field(default_factory=dict)

    def _initial_features(self) -> dict[str, DataFrame]:
        nodes = {t: df for t, df in self.graph.nodes.items() if len(df.columns) > 1}
        if self.embedder is not None:
            return self.embedder(nodes)
        out: dict[str, DataFrame] = {}
        for t, df in nodes.items():
            if self.schema is not None and t in self.schema:
                cols = [
                    c
                    for c, spec in self.schema[t].columns.items()
                    if spec.type == "num" and c in df.columns
                ]
            else:
                cols = _numeric_cols(df)
            out[t] = df.select("node_id", *cols)
        return out

    def run(self, target_table: str) -> DataFrame:
        """Execute the staged plan; returns the target table's frame of
        node_id + propagated features after L layers + decoder."""
        feats = self._initial_features()
        col_map = {
            t: [c for c in df.columns if c != "node_id"] for t, df in feats.items()
        }
        edges = {
            et: e
            for et, e in self.graph.edges.items()
            if not et.startswith("self_")
        }
        for layer_idx in range(self.layers):
            if self.pre_combination is not None:
                feats = {
                    t: self.pre_combination(layer_idx, t, df) for t, df in feats.items()
                }
                col_map = {
                    t: [c for c in df.columns if c != "node_id"]
                    for t, df in feats.items()
                }
            # N13: one aggregation per edge type, combined per dst table
            combined = hetero_layer(
                edges, self.graph.edge_meta, feats, col_map, aggs=list(self.aggs)
            )
            nxt: dict[str, DataFrame] = {}
            for t, base in feats.items():
                if t in combined:
                    msg = combined[t].withColumnRenamed("dst", "node_id")
                    merged = base.join(msg, "node_id", "left").na.fill(0.0)
                else:
                    merged = base
                if self.post_combination is not None:
                    merged = self.post_combination(layer_idx, t, merged)
                nxt[t] = merged
            feats = nxt
            col_map = {
                t: [c for c in df.columns if c != "node_id"] for t, df in feats.items()
            }
        out = feats[target_table]
        if self.decoder is not None:
            out = self.decoder(out)
        return out
