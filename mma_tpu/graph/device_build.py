"""Device-side completion of sampled-subgraph structure.

The sampled pipeline produces a fresh subgraph per batch; shipping the
full :class:`Graph` from the host costs ~30 MB/batch of link traffic
(src/dst + the CSC view + row pointers + degrees + masks). Everything
except the sorted edge endpoints is *derivable*, so this module builds
it on device from just ``(src, dst, node_ids, n_real_edges)`` — ~3×
less host→device traffic, and the derivations are cheap device ops
(searchsorted over a sorted array, one lexsort for the CSC view, one
gather into a device-resident degree table).

Semantics match ``graph_from_edges`` + the sampler's true-degree
override exactly (tested field-for-field in ``tests/test_sampling.py``):

- ``src``/``dst`` arrive dst-sorted (src ascending within dst — the
  native sampler + counting sort's order) with padding edges at the
  tail pointing at the padding node;
- ``row_ptr[i] = first edge with dst ≥ i`` (padded list, CSR contract);
- CSC view via one lexsort (src-major, dst-minor over the padded list);
- ``deg`` = full-graph true in-degrees gathered from a device-resident
  table by global node id (the sampler's unbiased-mean convention);
  holes/padding rows get 0;
- masks from the real counts.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mma_tpu.graph.container import Graph


@functools.partial(jax.jit, static_argnames=("chunk_hint", "ell_hint"))
def finish_graph_on_device(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    node_ids: jnp.ndarray,
    n_real_edges: jnp.ndarray,
    deg_table: jnp.ndarray,
    src_perm: Optional[jnp.ndarray] = None,
    *,
    chunk_hint: Optional[tuple] = None,
    ell_hint: Optional[tuple] = None,
) -> Graph:
    """Build a full :class:`Graph` from minimal host-shipped arrays.

    ``src``/``dst``: (E_pad,) int32 dst-sorted padded endpoints;
    ``node_ids``: (N_pad,) int32 global id per local row (−1 for
    padding/holes — also defines ``node_mask``); ``n_real_edges``:
    scalar int32; ``deg_table``: (N_global,) f32 device-resident
    true in-degrees; ``src_perm``: optional host-emitted CSC
    permutation (``sample_arrays(emit_csc=True)`` — the native counting
    sort). When given, the CSC view is two int32 gathers; when absent
    it falls back to a device sort (measured ~0.7 s/batch at ogbn pads
    — the reason the host emits it, VERDICT r4 #4).
    """
    e_pad = src.shape[0]
    n_node = node_ids.shape[0]

    edge_mask = jnp.arange(e_pad, dtype=jnp.int32) < n_real_edges
    node_mask = node_ids >= 0
    deg = jnp.where(
        node_mask, deg_table[jnp.maximum(node_ids, 0)], 0.0
    ).astype(jnp.float32)

    rows = jnp.arange(n_node + 1, dtype=jnp.int32)
    row_ptr = jnp.searchsorted(dst, rows, side="left").astype(jnp.int32)

    # CSC view: stable (src-major, dst-minor) order over the padded
    # list. The list is already dst-sorted, so a single-key STABLE
    # argsort by src gives the order (no two-key lexsort needed).
    if src_perm is None:
        src_perm = jnp.argsort(src, stable=True).astype(jnp.int32)
    src_csc = src[src_perm]
    dst_csc = dst[src_perm]
    col_ptr = jnp.searchsorted(src_csc, rows, side="left").astype(jnp.int32)

    return Graph(
        src=src,
        dst=dst,
        edge_mask=edge_mask,
        node_mask=node_mask,
        deg=deg,
        row_ptr=row_ptr,
        src_perm=src_perm,
        col_ptr=col_ptr,
        src_csc=src_csc,
        dst_csc=dst_csc,
        chunk_hint=chunk_hint,
        ell_hint=ell_hint,
    )


def shape_canonical_chunk_hint(n_edge_pad: int, n_node_pad: int) -> tuple:
    """The pad-shape chunk-hint bound (same formula as
    ``train.sampled.stack_graphs`` uses to canonicalize): valid for any
    member graph with these pads, so batches share one compiled
    program."""
    from mma_tpu.constants import BLOCK_B, BLOCK_R

    n_chunks = -(-n_edge_pad // BLOCK_B)
    n_blocks = -(-n_node_pad // BLOCK_R)
    return (n_chunks + 1, n_chunks + n_blocks)
