"""Static-shape graph containers for TPU execution.

The reference keeps graphs as a torch sparse COO adjacency *plus* redundant
per-node Python neighbor lists (``node_classification/utils.py:98-100``),
which its layers iterate with per-node Python loops
(``node_classification/layers.py:205-222``). On TPU everything must be a
statically-shaped array under ``jit``, so the canonical representation here
is a padded edge list sorted by destination node:

- ``src[e]`` / ``dst[e]``: endpoints of edge ``e`` (message flows
  ``src → dst``; ``dst`` is the "center" node of the reference's loops).
- ``dst`` is sorted ascending, so segment reductions can use
  ``indices_are_sorted=True`` and the Pallas kernel can reduce contiguous
  edge blocks onto contiguous output rows.
- Padding edges sit at the tail with ``src = dst = n_node - 1`` (a padding
  node) and ``edge_mask = False``; padded aggregation contributions are
  masked to the reduction's neutral element.
- ``row_ptr`` is the CSR row-offset view of the same edge list (offset of
  each node's first in-edge), used for degree lookups and kernel block
  scheduling.

Graphs are registered JAX pytrees: they can be passed through ``jit``,
``grad``, ``shard_map`` and stored in checkpoints like any other array
bundle.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def _dataclass_pytree(cls, static_fields=()):
    """Register a dataclass as a pytree; ``static_fields`` go to aux data."""
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in static_fields]

    def flatten(obj):
        aux = tuple(getattr(obj, n) for n in static_fields)
        return tuple(getattr(obj, n) for n in fields), aux

    def unflatten(aux, leaves):
        return cls(**dict(zip(fields, leaves)), **dict(zip(static_fields, aux)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass
class Graph:
    """A single graph (or disjoint union of graphs) in padded edge-list form.

    Shapes: ``E`` = padded edge count, ``N`` = padded node count. Both are
    static under ``jit``.
    """

    src: jnp.ndarray  # (E,) int32 — neighbor / message source
    dst: jnp.ndarray  # (E,) int32 — center / message destination, sorted
    edge_mask: jnp.ndarray  # (E,) bool — True for real edges
    node_mask: jnp.ndarray  # (N,) bool — True for real nodes
    deg: jnp.ndarray  # (N,) float32 — in-degree over real edges
    row_ptr: jnp.ndarray  # (N+1,) int32 — CSR offsets into the edge list
    # Transpose (CSC) view for src-keyed segment reductions — the
    # backward pass of gathers-by-src. ``src_perm`` sorts edges by
    # (src-major, dst-minor); ``col_ptr`` are the offsets of each node's
    # out-edges in that order. ``src_csc``/``dst_csc`` are the edge
    # endpoints in that order (src_csc = src[src_perm], precomputed
    # host-side so backward passes can gather node tables *directly
    # into CSC order* — node-table gathers run ~2-5× faster than edge
    # permutes, which are DMA-issue-rate bound). Optional: None disables
    # the Pallas backward fast path.
    src_perm: "jnp.ndarray | None" = None  # (E,) int32
    col_ptr: "jnp.ndarray | None" = None  # (N+1,) int32
    src_csc: "jnp.ndarray | None" = None  # (E,) int32 — src, CSC order
    dst_csc: "jnp.ndarray | None" = None  # (E,) int32 — dst, CSC order
    # Static (non-leaf) metadata: host-computed kernel grid bounds
    # (max chunks per row block, total flattened steps) — diagnostics
    # only; the kernel derives its own bound.
    chunk_hint: "tuple | None" = None
    # Static ELL degree-bucket layout ``((row_end, width), ...)``: rows
    # of range b have at most ``width_b`` in-edges (see
    # ``mma_tpu.ops.ell``). Producers with structural degree bounds set
    # it (per-hop sampled subgraphs); None = no known bucket layout.
    ell_hint: "tuple | None" = None
    # Degree-EXACT ELL layout marker (static): every row in bucket b has
    # EXACTLY ``width_b`` edges (bucket-padding rows carry synthetic
    # padding edges), nodes are grouped by degree, and the flat slot
    # index therefore EQUALS the dst-sorted edge index — slot expand and
    # collapse are reshapes, not gathers (``mma_tpu.ops.ell`` exact
    # paths). Only ``batch_graphs(ell_degree_budgets=...)`` sets this.
    # NOTE: such graphs break the "padding edges all point at the last
    # node" invariant (bucket-pad edges point at their own bucket-pad
    # rows); all padding edges still point at masked padding rows.
    ell_exact: bool = False
    # Static: the CSC view is degree-exact under the SAME buckets —
    # true for symmetric degree-exact batches (in-degree == out-degree
    # per node; the synthetic self-loops preserve it), where src-keyed
    # segment sums reduce to permute + per-bucket lane-slice sums
    # (``ops.gather.gather_by_src`` fast path), no kernel launch.
    csc_ell_exact: bool = False

    @property
    def n_node(self) -> int:
        return self.node_mask.shape[0]

    @property
    def n_edge(self) -> int:
        return self.src.shape[0]

    @property
    def num_nodes(self) -> jnp.ndarray:
        """Number of real (unpadded) nodes, as a traced scalar."""
        return jnp.sum(self.node_mask.astype(jnp.int32))

    @property
    def num_edges(self) -> jnp.ndarray:
        return jnp.sum(self.edge_mask.astype(jnp.int32))


_dataclass_pytree(
    Graph,
    static_fields=("chunk_hint", "ell_hint", "ell_exact", "csc_ell_exact"),
)


@dataclasses.dataclass
class BatchedGraphs:
    """A batch of graphs packed as one disjoint union plus readout indices.

    Mirrors the capability of the PyG ``DataLoader`` collate used by the
    reference ZINC pipeline (``graph_regression/mma.py:52-54``): node/edge
    arrays of all graphs are concatenated, node indices offset per graph,
    and ``node_to_graph`` maps each node to its graph for pooled readout
    (the reference's ``batch`` vector).
    """

    graph: Graph
    node_to_graph: jnp.ndarray  # (N,) int32 — graph id per node (pad → G-1)
    graph_mask: jnp.ndarray  # (G,) bool — True for real graphs
    node_feat: Optional[jnp.ndarray] = None  # (N, ...) node features/ids
    edge_feat: Optional[jnp.ndarray] = None  # (E, ...) edge features/ids
    target: Optional[jnp.ndarray] = None  # (G, ...) per-graph targets
    # Static: True when nodes of each member graph are contiguous (so
    # ``node_to_graph`` is sorted ascending and pooled readouts may pass
    # ``indices_are_sorted``). Degree-ordered batches
    # (``ell_degree_budgets``) interleave graphs' nodes and set False.
    nodes_grouped: bool = True

    @property
    def n_graph(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_graphs(self) -> jnp.ndarray:
        return jnp.sum(self.graph_mask.astype(jnp.int32))


_dataclass_pytree(BatchedGraphs, static_fields=("nodes_grouped",))
