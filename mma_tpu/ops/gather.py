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
    """``x[graph.src]`` (N, C) → (E, C); VJP = CSC Pallas segment-sum.

    Keys on the CSC fields alone (not ``chunk_hint``): degree-exact ELL
    graphs null ``chunk_hint`` (they break the CSR kernels' padding-edge
    invariant) but carry a valid CSC view, and the CSC segment-sum makes
    no assumption about where padding edges point — their cotangents
    land on their own masked padding rows. Sharded graphs null the CSC
    fields too, so they still take the plain-gather fallback."""
    if graph.col_ptr is None or graph.src_perm is None:
        return x[graph.src]
    from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_by_src

    @jax.custom_vjp
    def _op(x_):
        return x_[graph.src]

    def _fwd(x_):
        return x_[graph.src], graph

    def _bwd(g, ct):
        if g.csc_ell_exact:
            dx = _csc_exact_segment_sum(ct, g)
        else:
            dx = fused_segment_sum_by_src(ct, g, precision=precision)
        return (dx.astype(x.dtype),)

    _op.defvjp(_fwd, _bwd)
    return _op(x)


def _csc_exact_segment_sum(ct: jnp.ndarray, g: Graph) -> jnp.ndarray:
    """Src-keyed segment sum on a symmetric degree-exact graph
    (``Graph.csc_ell_exact``): after the CSC permute the edge stream is
    degree-exact under the same buckets (every bucket row has exactly
    ``width`` out-edges), so the reduce is per-bucket lane-slice sums of
    a ``(rows, W·C)`` reshape — one permute gather, zero kernel
    launches, zero scatters. Accumulates in f32. The one-hot CSC kernel
    this replaces was grid-step-overhead-bound at ZINC shapes
    (~3.5 ms vs ~1 ms for permute + fused sums)."""
    from mma_tpu.ops.ell import EllSpec, pad_rows, slot_slices

    spec = EllSpec.from_hint(g.ell_hint)
    c = ct.shape[1]
    ct_csc = ct[g.src_perm]
    parts, off = [], 0
    for r, w in zip(spec.rows, spec.widths):
        blk = ct_csc[off : off + r * w].reshape(r, w * c)
        acc = None
        for sl in slot_slices(blk, w):
            s32 = sl.astype(jnp.float32)
            acc = s32 if acc is None else acc + s32
        parts.append(acc)
        off += r * w
    return pad_rows(jnp.concatenate(parts, axis=0), g.n_node)
