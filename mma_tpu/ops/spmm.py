"""Sparse-matrix × dense-matrix products over binary adjacencies.

The reference's two SpMM sites (``node_classification/layers.py:41,862``)
multiply the raw, un-normalized, no-self-loop 0/1 adjacency by dense
features. With the dst-sorted edge list that is exactly one gather + one
sorted segment-sum: ``out[i] = Σ_{j ∈ N(i)} x[j]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from mma_tpu.graph.container import Graph
from mma_tpu.ops.segment import segment_sum


def binary_spmm(graph: Graph, x: jnp.ndarray, *, use_pallas: bool = False) -> jnp.ndarray:
    """``A @ x`` for the graph's binary adjacency; ``x`` is ``(N, F)``."""
    gathered = x[graph.src]
    gathered = jnp.where(graph.edge_mask[:, None], gathered, 0.0)
    if use_pallas:
        from mma_tpu.ops.pallas.fused_mma import fused_segment_sum

        return fused_segment_sum(gathered, graph)
    return segment_sum(gathered, graph.dst, graph.n_node, sorted=True)
