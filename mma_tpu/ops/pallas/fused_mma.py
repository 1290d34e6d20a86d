"""Pallas TPU kernel: sorted segment-sum over CSR row blocks.

Replaces the XLA scatter-add lowering of ``segment_sum`` on the hot MMA
paths (the reference's equivalents are ``torch_scatter.scatter`` and
cuSPARSE ``spmm`` — SURVEY §2.2). TPU has no fast scatter; instead:

- the grid is ``(row_block, chunk)``: R output rows × block-aligned edge
  chunks of B edges. Because edges are sorted by destination, each row
  block's edges occupy one contiguous range ``[row_ptr[r0], row_ptr[r0+R])``
  of the edge array, covered by the aligned chunks
  ``[start//B, ceil(end/B))``. Row blocks partition the output, so the
  row dimension is parallel (megacore-safe); the chunk dimension
  accumulates into the same output block, which Pallas keeps resident in
  VMEM across the inner grid dimension;
- chunk addressing is data-dependent but *block-aligned*, so the scalar-
  prefetched per-block edge bounds drive ordinary BlockSpec index maps —
  the automatic pipeline does all DMA (no manual copies);
- the in-block "scatter" is a one-hot contraction on the MXU:
  ``out[r] += Σ_e 1[dst_e == r0+r]·data_e`` as an ``(R, B) × (B, C)``
  matmul — no serialized read-modify-write per edge, no atomics, fully
  deterministic.

The grid's chunk extent is the static per-graph bound
``Graph.chunk_hint`` (host-computed at build); blocks with fewer chunks
skip compute (and their index map clamps to an already-resident block, so
no extra DMA is issued).

Cost: ``R·B·C`` MACs per ``B`` edges — an amplification of R over the
useful adds, traded against scatter-free, layout-friendly execution; at
C≥64 this is far ahead of the XLA scatter path (see bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mma_tpu.constants import BLOCK_B, BLOCK_R
from mma_tpu.graph.container import Graph


def _kernel(starts_ref, ends_ref, ids_ref, data_ref, out_ref, *, block_b: int,
            block_sub: int, passes: int):
    r, c = pl.program_id(0), pl.program_id(1)
    start, end = starts_ref[r], ends_ref[r]
    first_chunk = start // block_b
    num_chunks = pl.cdiv(end, block_b) - first_chunk

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < num_chunks)
    def _():
        block_r = out_ref.shape[0]
        g = first_chunk + c  # global chunk actually resident in ids/data
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        acc = jnp.zeros_like(out_ref)
        # block_b = n_sub × block_sub: one full-width MXU contraction per
        # 128-lane sub-chunk (ids come tiled (1, n_sub, 128)).
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota  # (1, S)
            valid = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]  # (1, S)
            onehot = ((ids - row0) == rr) & valid  # (R, S)
            oh = onehot.astype(jnp.float32)
            d = data_ref[pl.ds(j * block_sub, block_sub), :]
            # The MXU rounds f32 operands to bf16 per pass. The one-hot is
            # 0/1 (bf16-exact); splitting the data into bf16 terms
            # recovers ~8 mantissa bits per extra pass (passes=3 ≈ f32).
            for _ in range(passes):
                hi = d.astype(jnp.bfloat16).astype(jnp.float32)
                acc += jax.lax.dot_general(
                    oh, hi,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d = d - hi
        out_ref[:] += acc


_PASSES = {"fastest": 1, "high": 2, "highest": 3}


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "max_chunks", "interpret", "passes")
)
def _fused_segment_sum(data, dst, row_ptr, *, block_r, block_b, max_chunks,
                       interpret, passes):
    e_pad, ch = data.shape
    assert e_pad % block_b == 0, (e_pad, block_b)
    n = row_ptr.shape[0] - 1
    num_blocks = pl.cdiv(n, block_r)
    num_data_chunks = e_pad // block_b

    # Per-row-block edge ranges from the CSR offsets.
    block_rows = jnp.minimum(jnp.arange(num_blocks + 1, dtype=jnp.int32) * block_r, n)
    bounds = row_ptr[block_rows]
    starts, ends = bounds[:-1], bounds[1:]

    def chunk_index(r, c, starts_ref, ends_ref):
        first = starts_ref[r] // block_b
        last = jnp.maximum(pl.cdiv(ends_ref[r], block_b) - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), num_data_chunks - 1)

    from mma_tpu.constants import BLOCK_SUB

    n_sub = block_b // BLOCK_SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks, max_chunks),
        in_specs=[
            pl.BlockSpec(  # ids: (chunks, n_sub, 128) int32, 1 chunk/step
                (1, n_sub, BLOCK_SUB),
                lambda r, c, s, e: (chunk_index(r, c, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # data: (E, C) f32, one (B, C) chunk per step
                (block_b, ch),
                lambda r, c, s, e: (chunk_index(r, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_r, ch), lambda r, c, s, e: (r, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, block_b=block_b, block_sub=BLOCK_SUB, passes=passes
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((int(num_blocks) * block_r, ch), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(starts, ends, dst.reshape(num_data_chunks, n_sub, BLOCK_SUB), data)[:n]


def _masked_kernel(starts_ref, ends_ref, ids_ref, logits_ref, h_ref, pat_ref,
                   out_ref, *, block_b: int, block_sub: int, passes: int,
                   n_agg: int):
    """Fused mask-activation + multiply + segment-sum.

    Per chunk: ``msg = where(pat, σ(logits), logits) * tile(h, K)`` then
    the one-hot MXU contraction of :func:`_kernel`. Avoids materializing
    the (E, K·F) mask/message intermediates in HBM.
    """
    r, c = pl.program_id(0), pl.program_id(1)
    start, end = starts_ref[r], ends_ref[r]
    first_chunk = start // block_b
    num_chunks = pl.cdiv(end, block_b) - first_chunk

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(c < num_chunks)
    def _():
        block_r = out_ref.shape[0]
        g = first_chunk + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)

        logits = logits_ref[:]  # (B, K·F)
        pat = pat_ref[:]  # (1, K·F) 0/1
        mask = jnp.where(pat > 0, jax.nn.sigmoid(logits), logits)
        h = h_ref[:]  # (B, F)
        if n_agg > 1:
            h = jnp.concatenate([h] * n_agg, axis=1)
        msg = mask * h

        acc = jnp.zeros_like(out_ref)
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota
            valid = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]
            onehot = ((ids - row0) == rr) & valid
            oh = onehot.astype(jnp.float32)
            d = msg[j * block_sub : (j + 1) * block_sub, :]
            for _ in range(passes):
                hi = d.astype(jnp.bfloat16).astype(jnp.float32)
                acc += jax.lax.dot_general(
                    oh, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d = d - hi
        out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("block_r", "block_b", "max_chunks", "interpret", "passes",
                     "n_agg"),
)
def _fused_masked_segment_sum(logits, h_src, pattern, dst, row_ptr, *, block_r,
                              block_b, max_chunks, interpret, passes, n_agg):
    e_pad, ckf = logits.shape
    assert e_pad % block_b == 0
    n = row_ptr.shape[0] - 1
    num_blocks = pl.cdiv(n, block_r)
    num_data_chunks = e_pad // block_b

    block_rows = jnp.minimum(jnp.arange(num_blocks + 1, dtype=jnp.int32) * block_r, n)
    bounds = row_ptr[block_rows]
    starts, ends = bounds[:-1], bounds[1:]

    def chunk_index(r, c, starts_ref, ends_ref):
        first = starts_ref[r] // block_b
        last = jnp.maximum(pl.cdiv(ends_ref[r], block_b) - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), num_data_chunks - 1)

    from mma_tpu.constants import BLOCK_SUB

    n_sub = block_b // BLOCK_SUB
    f = ckf // n_agg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks, max_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, BLOCK_SUB),
                lambda r, c, s, e: (chunk_index(r, c, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, ckf),
                lambda r, c, s, e: (chunk_index(r, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, f),
                lambda r, c, s, e: (chunk_index(r, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ckf), lambda r, c, s, e: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_r, ckf), lambda r, c, s, e: (r, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _masked_kernel, block_b=block_b, block_sub=BLOCK_SUB,
            passes=passes, n_agg=n_agg,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((int(num_blocks) * block_r, ckf), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(starts, ends, dst.reshape(num_data_chunks, n_sub, BLOCK_SUB),
      logits, h_src, pattern)[:n]


def fused_masked_aggregate(
    logits: jnp.ndarray,
    h_src: jnp.ndarray,
    sig_pattern: jnp.ndarray,
    graph: Graph,
    n_agg: int,
    *,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "high",
) -> jnp.ndarray:
    """``S[i] = Σ_{e: dst=i} act(logits_e) ⊙ tile(h_src_e, K)`` fused.

    ``logits``: (E, K·F) flat mask logits (pre-gathered per edge);
    ``h_src``: (E, F) gathered source features; ``sig_pattern``: (K·F,)
    bool — which lanes apply sigmoid (N1 table). Differentiable (custom
    VJP recomputes the activation elementwise in XLA).
    """
    e, ckf = logits.shape
    assert e == graph.n_edge and h_src.shape == (e, ckf // n_agg)
    passes = _PASSES[precision]
    max_chunks = (
        graph.chunk_hint if (block_r, block_b) == (BLOCK_R, BLOCK_B) else None
    )
    pat2d = sig_pattern.astype(jnp.float32).reshape(1, ckf)

    def _run(l, h):
        dst = graph.dst
        mc = max_chunks
        if mc is None or e % block_b != 0:
            pad = (-e) % block_b
            if pad:
                l = jnp.pad(l, ((0, pad), (0, 0)))
                h = jnp.pad(h, ((0, pad), (0, 0)))
                dst = jnp.pad(dst, (0, pad), constant_values=graph.n_node - 1)
            mc = (e + pad) // block_b
        return _fused_masked_segment_sum(
            l, h, pat2d, dst, graph.row_ptr,
            block_r=block_r, block_b=block_b, max_chunks=mc,
            interpret=jax.devices()[0].platform != "tpu",
            passes=passes, n_agg=n_agg,
        )

    @jax.custom_vjp
    def _op(l, h):
        return _run(l, h)

    def _fwd(l, h):
        return _run(l, h), (l, h)

    def _bwd(res, ct):
        l, h = res
        pat = sig_pattern[None, :]
        sig = jax.nn.sigmoid(l)
        mask = jnp.where(pat, sig, l)
        ge = ct[graph.dst]  # (E, K·F)
        ge = jnp.where(graph.edge_mask[:, None], ge, 0.0)
        h_t = jnp.tile(h, (1, n_agg))
        dl = ge * h_t * jnp.where(pat, sig * (1.0 - sig), 1.0)
        gm = ge * mask
        f = ckf // n_agg
        dh = gm[:, :f]
        for kk in range(1, n_agg):
            dh = dh + gm[:, kk * f : (kk + 1) * f]
        return dl, dh

    _op.defvjp(_fwd, _bwd)
    return _op(logits, h_src)


def fused_segment_sum(
    data: jnp.ndarray,
    graph: Graph,
    *,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "high",
) -> jnp.ndarray:
    """Segment-sum ``data`` (E, C) over ``graph.dst`` → (N, C).

    Requires the graph's dst-sorted edge order. Rows belonging to padding
    nodes receive sums of padding-edge data rows — callers mask padded
    data to zero (``masked_multi_aggregate`` / ``binary_spmm`` do).

    ``precision``: ``"fastest"`` (single MXU pass, data rounded to bf16,
    ~1e-3 relative error), ``"high"`` (2-term bf16 split, ~1e-6 —
    default), ``"highest"`` (3-term split, ≈ exact f32).
    """
    assert data.ndim == 2 and data.shape[0] == graph.n_edge, data.shape

    # The kernel needs a custom VJP (pallas_call has no AD rule); the
    # transpose of a segment-sum is a gather by destination.
    @jax.custom_vjp
    def _op(d):
        return _run(d)

    def _op_fwd(d):
        return _run(d), None

    def _op_bwd(_, ct):
        ct_e = ct[graph.dst]
        ct_e = jnp.where(graph.edge_mask[:, None], ct_e, 0.0)
        return (ct_e,)

    _op.defvjp(_op_fwd, _op_bwd)

    passes = _PASSES[precision]
    # chunk_hint is computed at graph build against the default block
    # sizes; a custom blocking falls back to the conservative bound.
    max_chunks = (
        graph.chunk_hint if (block_r, block_b) == (BLOCK_R, BLOCK_B) else None
    )
    def _run(d):
        dst = graph.dst
        mc = max_chunks
        if mc is None or graph.n_edge % block_b != 0:
            # Conservative fallback: a full sweep of chunks per row block.
            pad = (-graph.n_edge) % block_b
            if pad:
                d = jnp.pad(d, ((0, pad), (0, 0)))
                dst = jnp.pad(dst, (0, pad), constant_values=graph.n_node - 1)
            mc = (graph.n_edge + pad) // block_b
        return _fused_segment_sum(
            d, dst, graph.row_ptr,
            block_r=block_r, block_b=block_b, max_chunks=mc,
            interpret=jax.devices()[0].platform != "tpu", passes=passes,
        )

    return _op(data)
