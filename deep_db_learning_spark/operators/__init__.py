from . import (
    bfs,
    components,
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
    "components",
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
