"""Node-table gathers with scatter-free VJPs.

``x[graph.dst]`` / ``x[graph.src]`` are plain XLA gathers, but their
autodiff transposes are scatter-adds — XLA lowers those to a serialized
per-row scatter on TPU, which dominates any training step that builds
per-edge messages from node projections (the graph-regression conv's
``p_dst[dst] + p_src[src]``, ``/root/reference/graph_regression/
mma_conv.py:143-156``; torch reaches the same math through
``torch_scatter`` whose CUDA backward is a fused atomic scatter).

These wrappers keep the forward as the (fast) XLA gather and route the
backward through the sorted Pallas segment-sum kernels instead:

- ``gather_by_dst`` — transpose is a dst-keyed segment sum; edges are
  dst-sorted (architecture invariant), so the sorted kernel applies
  directly.
- ``gather_by_src`` — transpose is a src-keyed sum; the CSC view
  (``src_perm``/``col_ptr``) makes it a sorted reduction too.

Both fall back to the plain gather (XLA VJP) when the graph lacks the
CSR/CSC structure (sharded graphs null it — CLAUDE.md invariant).

Padding edges point at the padding node, so their cotangents land on
the padding row exactly like XLA's scatter-add would — identical
semantics, no masking needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mma_tpu.graph.container import Graph


def gather_by_dst(x: jnp.ndarray, graph: Graph, *, precision: str = "highest"):
    """``x[graph.dst]`` (N, C) → (E, C); VJP = sorted Pallas segment-sum."""
    if graph.chunk_hint is None:
        return x[graph.dst]
    from mma_tpu.ops.pallas.fused_mma import fused_segment_sum

    @jax.custom_vjp
    def _op(x_):
        return x_[graph.dst]

    def _fwd(x_):
        # graph in residuals, not closure (shard_map tracer safety).
        return x_[graph.dst], graph

    def _bwd(g, ct):
        dx = fused_segment_sum(ct, g, precision=precision)
        return (dx.astype(x.dtype),)

    _op.defvjp(_fwd, _bwd)
    return _op(x)


def gather_by_src(x: jnp.ndarray, graph: Graph, *, precision: str = "highest"):
    """``x[graph.src]`` (N, C) → (E, C); VJP = CSC Pallas segment-sum."""
    if graph.chunk_hint is None or graph.col_ptr is None:
        return x[graph.src]
    from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_by_src

    @jax.custom_vjp
    def _op(x_):
        return x_[graph.src]

    def _fwd(x_):
        return x_[graph.src], graph

    def _bwd(g, ct):
        dx = fused_segment_sum_by_src(ct, g, precision=precision)
        return (dx.astype(x.dtype),)

    _op.defvjp(_fwd, _bwd)
    return _op(x)
