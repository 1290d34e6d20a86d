"""mma_tpu — a TPU-native Multi-Mask Aggregator (MMA) GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Multi-Mask Aggregators implementation (asarigun/mma, LoG 2022): learned
per-edge, per-aggregator masks weighting multiple neighborhood aggregators
(sum/mean/max/min families), PNA-style degree scalers, covering both the
pygcn-style node-classification stack (Cora/Citeseer/Pubmed) and the
MultiMaskConv graph-regression stack (ZINC).

Architecture (TPU-first, not a port):

- Graphs are static-shape edge lists sorted by destination plus CSR row
  offsets (``mma_tpu.graph``). No per-node Python loops, no scatter
  extensions: aggregation is expressed as per-node MXU projections +
  gathers + sorted segment reductions.
- The per-edge mask logits ``[h_dst ‖ h_src] @ W_mask`` of the reference
  (reference ``node_classification/layers.py:215-216``) decompose into two
  per-node projections ``H @ W_top`` / ``H @ W_bot`` that run once on the
  MXU and are gathered per edge — an O(N·F²) SDDMM instead of O(E·F²).
- A fused Pallas kernel (``mma_tpu.ops.pallas``) performs the per-edge
  mask + multiply + K-way segment-sum in one pass over edges, with the
  block segment-sum expressed as a one-hot matmul on the MXU.
- Multi-chip scaling via ``jax.sharding`` meshes: data-parallel batched
  graphs for regression, edge-partitioned aggregation with partial-sum
  ``psum`` for full-graph node classification (``mma_tpu.parallel``).

Parity: the reference has a number of load-bearing quirks (dead activation
branches, always-on dropout, degenerate scalers, untrained mask transforms —
see SURVEY.md §5 N1-N11). Every op takes a ``parity`` switch replicating
them exactly, with the default giving the intended math.
"""

__version__ = "0.1.0"

from mma_tpu.graph.container import Graph, BatchedGraphs  # noqa: F401
from mma_tpu.graph.build import (  # noqa: F401
    graph_from_dense,
    graph_from_edges,
    graph_from_neighbor_lists,
)
from mma_tpu.models import NodeClassifier, ZincNet  # noqa: F401
from mma_tpu.nn import (  # noqa: F401
    GraphConvolution,
    MMALayer,
    MultiMaskConv,
)
