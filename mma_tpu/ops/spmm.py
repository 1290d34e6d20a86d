"""Sparse-matrix × dense-matrix products over binary adjacencies.

The reference's two SpMM sites (``node_classification/layers.py:41,862``)
multiply the raw, un-normalized, no-self-loop 0/1 adjacency by dense
features. With the dst-sorted edge list that is exactly one gather + one
sorted segment-sum: ``out[i] = Σ_{j ∈ N(i)} x[j]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mma_tpu.graph.container import Graph
from mma_tpu.ops.segment import segment_sum


def binary_spmm(
    graph: Graph,
    x: jnp.ndarray,
    *,
    use_pallas: bool = False,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """``A @ x`` for the graph's binary adjacency; ``x`` is ``(N, F)``.

    Under ``shard_map`` with the edge list partitioned along ``axis_name``
    (``mma_tpu.parallel.edge_parallel``), each device reduces its local
    edge shard to a full-size partial and partials combine with ``psum``
    (x and the output stay node-replicated).
    """
    if use_pallas and graph.src_perm is not None:
        from mma_tpu.ops.pallas.fused_mma import (
            fused_segment_sum,
            fused_segment_sum_by_src,
            fused_segment_sum_csc,
        )

        # Custom VJP: the transpose of A@x over a binary adjacency is a
        # src-keyed segment sum of dst-gathered cotangents — both
        # directions run the sorted Pallas kernel (no XLA scatter).
        # IMPORTANT: the op and its VJP are purely LOCAL; under edge
        # sharding the psum goes *outside* so shard_map's AD composes
        # (a psum inside the bwd would mix partial cotangents).
        @jax.custom_vjp
        def _spmm(x):
            gathered = x[graph.src]
            gathered = jnp.where(graph.edge_mask[:, None], gathered, 0.0)
            return fused_segment_sum(gathered, graph)

        def _fwd(x):
            return _spmm(x), None

        def _bwd(_, ct):
            if graph.dst_csc is not None:
                # Gather the cotangent straight into CSC order (node-table
                # gather — no edge permute). Padding edges all point at
                # the padding node, so zeroing its ct row masks them.
                ct_z = jnp.where(graph.node_mask[:, None], ct, 0.0)
                return (fused_segment_sum_csc(ct_z[graph.dst_csc], graph),)
            ct_e = ct[graph.dst]
            ct_e = jnp.where(graph.edge_mask[:, None], ct_e, 0.0)
            return (fused_segment_sum_by_src(ct_e, graph),)

        _spmm.defvjp(_fwd, _bwd)
        out = _spmm(x)
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        return out

    gathered = x[graph.src]
    gathered = jnp.where(graph.edge_mask[:, None], gathered, 0.0)
    if use_pallas and axis_name is None:
        from mma_tpu.ops.pallas.fused_mma import fused_segment_sum

        return fused_segment_sum(gathered, graph)
    out = segment_sum(gathered, graph.dst, graph.n_node, sorted=True)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out
