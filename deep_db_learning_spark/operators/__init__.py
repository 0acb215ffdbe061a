from . import bfs, embedder, graph, message_passing, sampling

__all__ = ["bfs", "embedder", "graph", "message_passing", "sampling"]
