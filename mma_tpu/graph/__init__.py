from mma_tpu.graph.container import Graph, BatchedGraphs
from mma_tpu.graph.build import (
    graph_from_edges,
    graph_from_neighbor_lists,
    graph_from_dense,
    pad_graph,
)

__all__ = [
    "Graph",
    "BatchedGraphs",
    "graph_from_edges",
    "graph_from_neighbor_lists",
    "graph_from_dense",
    "pad_graph",
]
