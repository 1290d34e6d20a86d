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
    if (use_pallas and axis_name is None and graph.ell_hint is not None
            and graph.chunk_hint is not None and graph.src_perm is None):
        # ELL dense-neighbor fallback for degree-bounded graphs WITHOUT
        # a CSR/CSC kernel structure. When the kernel structure exists
        # the CSR path below wins for a plain SpMM (measured at ogbn
        # shapes: fwd 6.2 vs 17.0 ms, grad 22.1 vs 32.7 — one compact
        # gather beats the slot-row expansion when there is no mask
        # math to fuse); ELL earns its keep in masked_multi_aggregate,
        # where one fused [d‖h] slot gather replaces two edge gathers.
        from mma_tpu.ops.ell import (
            EllSpec,
            ell_gather_nodes_by_src,
            ell_valid,
            masked_slot_sum,
            pad_rows,
        )

        spec = EllSpec.from_hint(graph.ell_hint)
        parts = ell_gather_nodes_by_src(x, graph, spec)
        sums = [
            masked_slot_sum(p.astype(jnp.float32), v, w)
            for p, v, w in zip(parts, ell_valid(graph, spec), spec.widths)
        ]
        return pad_rows(jnp.concatenate(sums, axis=0), graph.n_node)

    if use_pallas and graph.src_perm is not None:
        from mma_tpu.ops.pallas.fused_mma import (
            fused_segment_sum,
            fused_segment_sum_by_src,
            fused_segment_sum_csc,
        )

        # 128-lane padding: both the XLA gather and the sorted-sum kernel
        # run ~1.8× faster on 128-lane-multiple rows than on narrower
        # ones (measured on v5e: w64 f32 gather 7.0 ms vs w128 4.6 ms;
        # sum kernel 6.3 ms vs 3.6 ms on 2.1M edges). Padding lanes are
        # zeros end-to-end, sliced off at the boundary.
        f = x.shape[1]
        f_pad = -(-f // 128) * 128
        # Workload-keyed block sizes (sweep-backed, value-exact — see
        # mma_tpu.autotune.choose_blocks): small/sparse graphs halve the
        # row-block count.
        from mma_tpu.autotune import choose_blocks

        block_r, block_b = choose_blocks(graph.n_edge, graph.n_node, lanes=f_pad)

        def _pad_tab(t):
            if f_pad == f:
                return t
            t = jnp.pad(t, ((0, 0), (0, f_pad - f)))
            # Materialize before gathering — a fused pad+gather lowers to
            # the slow narrow-row gather.
            return jax.lax.optimization_barrier(t)

        # Custom VJP: the transpose of A@x over a binary adjacency is a
        # src-keyed segment sum of dst-gathered cotangents — both
        # directions run the sorted Pallas kernel (no XLA scatter).
        # IMPORTANT: the op and its VJP are purely LOCAL; under edge
        # sharding the psum goes *outside* so shard_map's AD composes
        # (a psum inside the bwd would mix partial cotangents).
        @jax.custom_vjp
        def _spmm(x):
            # Padding edges all have src = the padding node; zeroing its
            # row at NODE level (N rows) replaces the edge-level
            # ``where(edge_mask, ·, 0)`` pass over the gathered (E, F)
            # array — one full HBM read+write of the edge array saved.
            x_z = jnp.where(graph.node_mask[:, None], x, 0.0)
            gathered = _pad_tab(x_z)[graph.src]
            return fused_segment_sum(
                gathered, graph, block_r=block_r, block_b=block_b
            )[:, :f]

        def _fwd(x):
            # graph rides through residuals, not the closure (inside
            # shard_map its leaves are tracers; a closure would leak).
            return _spmm(x), graph

        def _bwd(g, ct):
            if g.dst_csc is not None:
                # Gather the cotangent straight into CSC order (node-table
                # gather — no edge permute). Padding edges all point at
                # the padding node, so zeroing its ct row masks them.
                ct_z = jnp.where(g.node_mask[:, None], ct, 0.0)
                ct_e = _pad_tab(ct_z)[g.dst_csc]
                return (fused_segment_sum_csc(
                    ct_e, g, block_r=block_r, block_b=block_b
                )[:, :f].astype(x.dtype),)
            ct_e = _pad_tab(ct)[g.dst]
            ct_e = jnp.where(g.edge_mask[:, None], ct_e, 0.0)
            return (fused_segment_sum_by_src(
                ct_e, g, block_r=block_r, block_b=block_b
            )[:, :f].astype(x.dtype),)

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
