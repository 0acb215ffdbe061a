"""Trained-model persistence for the relational stack.

The reference checkpoints through Lightning/MLflow
(``experiments/blueprint_mlflow.py``); this engine's model state is a
plain params dict (``TrainResult.params``) whose members are numpy
arrays — plus, in frame-resident high-cardinality mode, per-layer
``(code, evec)`` DataFrames. Persistence keeps each in its native
durable form:

- ndarrays → one ``arrays.npz`` (exact float64 bits, no text round
  trip);
- frame embeddings → parquet under ``layer_<i>_emb/`` (stays
  DISTRIBUTED: a 10⁸-row embedding table never touches the driver —
  the same reason it trains as a frame);
- a ``manifest.json`` recording the layout, so ``load_stack_model``
  can rebuild the params dict for :func:`~.stack.predict_relational_stack`
  (round-trip prediction equality is pytest-pinned).

``path`` is a local/driver-visible directory for the npz+manifest and
a Spark-writable URI for the parquet parts — on a cluster point it at
shared storage.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def save_stack_model(result, path: str) -> None:
    """Persist a :class:`~.training.TrainResult` (or bare params dict)
    from :func:`~.stack.train_relational_stack`."""
    params = getattr(result, "params", result)
    os.makedirs(path, exist_ok=True)
    arrays: dict[str, np.ndarray] = {
        "emb": params["emb"],
        "W_head": params["W_head"],
        "b_head": params["b_head"],
    }
    layers_meta = []
    for i, layer in enumerate(params["layers"]):
        arrays[f"layer_{i}_W"] = layer["W"]
        arrays[f"layer_{i}_b"] = layer["b"]
        emb = layer["emb"]
        if isinstance(emb, DataFrame):
            emb.write.mode("overwrite").parquet(
                os.path.join(path, f"layer_{i}_emb")
            )
            layers_meta.append({"emb": "frame"})
        else:
            arrays[f"layer_{i}_emb"] = emb
            layers_meta.append({"emb": "array"})
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"format": 1, "layers": layers_meta}, f)


def load_stack_model(spark: SparkSession, path: str) -> dict:
    """Rebuild the params dict saved by :func:`save_stack_model` —
    feed it straight to ``predict_relational_stack`` (which accepts a
    params dict in place of the TrainResult)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    arrays = np.load(os.path.join(path, "arrays.npz"))
    layers = []
    for i, lm in enumerate(manifest["layers"]):
        emb = (
            spark.read.parquet(os.path.join(path, f"layer_{i}_emb"))
            if lm["emb"] == "frame"
            else arrays[f"layer_{i}_emb"]
        )
        layers.append(
            {
                "emb": emb,
                "W": arrays[f"layer_{i}_W"],
                "b": arrays[f"layer_{i}_b"],
            }
        )
    return {
        "emb": arrays["emb"],
        "W_head": arrays["W_head"],
        "b_head": arrays["b_head"],
        "layers": layers,
    }
