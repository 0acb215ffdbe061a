from . import (
    bfs,
    dedup,
    embedder,
    graph,
    message_passing,
    multimodal,
    sampling,
    similarity,
)

__all__ = [
    "bfs",
    "dedup",
    "embedder",
    "graph",
    "message_passing",
    "multimodal",
    "sampling",
    "similarity",
]
