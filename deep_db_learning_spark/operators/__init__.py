from . import (
    bfs,
    dedup,
    embedder,
    graph,
    kernels,
    message_passing,
    multimodal,
    sampling,
    similarity,
    temporal,
)

__all__ = [
    "bfs",
    "dedup",
    "embedder",
    "graph",
    "kernels",
    "message_passing",
    "multimodal",
    "sampling",
    "similarity",
    "temporal",
]
