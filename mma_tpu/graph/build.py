"""Host-side (NumPy) graph construction: COO → sorted, padded edge lists.

Replaces the reference's scipy/networkx ingestion
(``node_classification/utils.py:66-71,98-100,139-146``) with a direct
edge-list build. A native C++ fast path for the sort/CSR build is used when
the ``mma_tpu.graph.native`` extension is available; otherwise NumPy.

Padding policy: TPU compilation is per-shape, so node/edge counts are
rounded up to configurable multiples (default 8 nodes / 128 edges, matching
f32 VPU sublane×lane tiling) and at least one padding node is always added
to serve as the target of padding edges.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from mma_tpu.constants import BLOCK_B, BLOCK_R, EDGE_PAD_MULTIPLE, NODE_PAD_MULTIPLE
from mma_tpu.graph.container import Graph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def chunk_hint_from_row_ptr(row_ptr: np.ndarray, num_rows: int,
                            block_r: int = BLOCK_R, block_b: int = BLOCK_B):
    """Static grid bounds for the fused Pallas kernel: ``(max_chunks,
    total_steps)`` where ``total_steps = Σ_blocks max(chunks_block, 1)``
    (the flattened-grid step count — skew-proof) and ``max_chunks`` is the
    per-block bound (legacy 2-D grid)."""
    n_blocks = _round_up(max(num_rows, 1), block_r) // block_r
    idx = np.minimum(np.arange(n_blocks + 1) * block_r, num_rows)
    bounds = np.asarray(row_ptr)[idx]
    starts, ends = bounds[:-1], bounds[1:]
    counts = -(-ends // block_b) - starts // block_b  # ceil(end/B) - floor(start/B)
    counts = np.maximum(counts, 1)
    return int(counts.max(initial=1)), int(counts.sum())


def graph_from_edges(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    n_node_pad: Optional[int] = None,
    n_edge_pad: Optional[int] = None,
    sort: bool = True,
) -> Graph:
    """Build a padded, dst-sorted :class:`Graph` from COO endpoints.

    Within each destination segment, edges keep ascending source order —
    the same neighbor order the reference iterates (scipy CSR ``nonzero``
    order, ``node_classification/utils.py:98-100``), so sequential-sum
    parity checks see the same association order.
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    if src.shape != dst.shape or src.ndim != 1:
        raise ValueError(f"src/dst must be 1-D and equal length, got {src.shape} vs {dst.shape}")
    num_edges = src.shape[0]

    if sort and num_edges > 0:
        from mma_tpu.graph import native

        src, dst, _ = native.sort_edges(src, dst, num_nodes)  # dst-major

    n_node = n_node_pad or _round_up(num_nodes + 1, NODE_PAD_MULTIPLE)
    n_edge = n_edge_pad or max(_round_up(num_edges, EDGE_PAD_MULTIPLE), EDGE_PAD_MULTIPLE)
    if n_node <= num_nodes:
        raise ValueError(f"n_node_pad={n_node} must exceed num_nodes={num_nodes} (padding node needed)")
    if n_edge < num_edges:
        raise ValueError(f"n_edge_pad={n_edge} < num_edges={num_edges}")

    pad_e = n_edge - num_edges
    pad_node = n_node - 1
    src_p = np.concatenate([src, np.full(pad_e, pad_node, np.int32)])
    dst_p = np.concatenate([dst, np.full(pad_e, pad_node, np.int32)])
    edge_mask = np.zeros(n_edge, bool)
    edge_mask[:num_edges] = True
    node_mask = np.zeros(n_node, bool)
    node_mask[:num_nodes] = True

    from mma_tpu.graph import native

    deg = native.degrees(dst, n_node)
    # CSR offsets over the *padded* edge list (padding edges land on the
    # padding node's row, which is fine — its row is masked out).
    row_ptr = native.build_row_ptr(dst_p, n_node)
    # Transpose (CSC) ordering over the padded list for backward-pass
    # src-keyed segment reductions.
    _, src_sorted, src_perm = native.sort_edges(dst_p, src_p, n_node)
    col_ptr = native.build_row_ptr(src_sorted, n_node)

    return Graph(
        src=jnp.asarray(src_p),
        dst=jnp.asarray(dst_p),
        edge_mask=jnp.asarray(edge_mask),
        node_mask=jnp.asarray(node_mask),
        deg=jnp.asarray(deg),
        row_ptr=jnp.asarray(row_ptr),
        src_perm=jnp.asarray(src_perm),
        col_ptr=jnp.asarray(col_ptr),
        src_csc=jnp.asarray(src_sorted),
        dst_csc=jnp.asarray(dst_p[src_perm]),
        chunk_hint=chunk_hint_from_row_ptr(row_ptr, n_node),
    )


def graph_from_neighbor_lists(
    add_all: Sequence[np.ndarray],
    n_node_pad: Optional[int] = None,
    n_edge_pad: Optional[int] = None,
) -> Graph:
    """Build from the reference's per-node neighbor-list format.

    ``add_all[i]`` lists the neighbors of center node ``i``
    (``node_classification/utils.py:98-100``); each pair becomes an edge
    ``j → i`` so that aggregation at ``i`` sums over its neighbors.
    """
    num_nodes = len(add_all)
    dst = np.concatenate(
        [np.full(len(nbrs), i, np.int32) for i, nbrs in enumerate(add_all)]
        or [np.zeros(0, np.int32)]
    )
    src = np.concatenate(
        [np.asarray(nbrs, np.int32) for nbrs in add_all] or [np.zeros(0, np.int32)]
    )
    return graph_from_edges(src, dst, num_nodes, n_node_pad, n_edge_pad)


def graph_from_dense(adj: np.ndarray, **kw) -> Graph:
    """Build from a dense 0/1 adjacency; ``adj[i, j] != 0`` ⇒ edge ``j → i``."""
    adj = np.asarray(adj)
    dst, src = np.nonzero(adj)
    return graph_from_edges(src.astype(np.int32), dst.astype(np.int32), adj.shape[0], **kw)


def pad_graph(g: Graph, n_node: int, n_edge: int) -> Graph:
    """Re-pad an existing graph to larger static shapes (host-side)."""
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    mask = np.asarray(g.edge_mask)
    num_nodes = int(np.asarray(g.node_mask).sum())
    return graph_from_edges(
        src[mask], dst[mask], num_nodes, n_node_pad=n_node, n_edge_pad=n_edge, sort=False
    )
