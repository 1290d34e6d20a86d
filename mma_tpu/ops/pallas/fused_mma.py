"""Pallas TPU kernels: sorted segment-sum (and fused masked variants)
over CSR row blocks.

Replaces the XLA scatter-add lowering of ``segment_sum`` on the hot MMA
paths (the reference's equivalents are ``torch_scatter.scatter`` and
cuSPARSE ``spmm`` — SURVEY §2.2). TPU has no fast scatter; instead:

- the grid is a **flattened sequence of (row_block, chunk) steps**: R
  output rows per row block, B-edge block-aligned chunks. Because edges
  are sorted by destination, each row block's edges occupy one contiguous
  range ``[row_ptr[r0], row_ptr[r0+R])``, covered by the aligned chunks
  ``[start//B, ceil(end/B))``. Scalar-prefetched step→(block, chunk)
  maps give every step real work, so the grid size is
  ``Σ_blocks max(chunks_block, 1) ≤ E/B + n_blocks`` — *independent of
  degree skew* (a 2-D ``(block, max_chunks)`` grid wastes
  ``max-mean`` chunk slots per block, which is catastrophic under
  power-law degrees);
- chunk addressing is data-dependent but block-aligned, so ordinary
  BlockSpec index maps drive the automatic pipeline (no manual DMA);
  consecutive steps of one row block revisit the same output block, which
  Pallas keeps resident in VMEM;
- the in-block "scatter" is a one-hot contraction on the MXU:
  ``out[r] += Σ_e 1[dst_e == r0+r]·data_e`` as ``(R, 128) × (128, C)``
  sub-matmuls — no serialized read-modify-write, no atomics, fully
  deterministic.

Precision: the MXU rounds f32 operands to bf16 per pass; the one-hot is
0/1 (bf16-exact) and the data operand is split into 1-3 bf16 terms
(``precision=fastest/high/highest`` ≈ 1e-2/1e-4/1e-6 relative error).
bf16 input data needs a single pass and is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mma_tpu.constants import BLOCK_B, BLOCK_R, BLOCK_SUB
from mma_tpu.graph.container import Graph

_PASSES = {"fastest": 1, "high": 2, "highest": 3}

# Default src-keyed backward strategy for the fused edge program
# (overridable per call via ``fused_mma_edge_program(..., bwd_mode=…)``):
# "csc_gather" gathers [ct ‖ c] node rows straight into CSC edge order and
# recomputes the mask chain in the CSC kernel (no edge permute);
# "payload_permute" emits the per-edge payload from the dst pass and
# permutes it into CSC order. Measured on v5e (131k nodes / 2.1M edges,
# F=64, K=2): payload_permute wins the full layer train step (22.7M vs
# 21.6M edges/s) — the CSC recompute pass re-reads the wide [ct ‖ c]
# table per edge, which outweighs the saved permute at this width. The
# CSC-direct trick still pays off where there is nothing to recompute:
# binary_spmm's backward gathers the cotangent straight into CSC order.
EDGE_BWD_MODE = "payload_permute"


def _step_maps(starts, ends, num_blocks, total_steps, block_b):
    """Scalar-prefetch arrays mapping flat step → (row block, chunk).

    INVARIANT (load-bearing): the per-step *data chunk index* produced by
    ``_chunk_index_fn`` over these maps is monotone non-decreasing across
    the flattened step sequence — row blocks are visited in ascending
    order, each block's chunks ascend from ``starts[b] // block_b``, and
    ``starts[b+1] // block_b ≥`` the previous block's last chunk (edges
    are dst-sorted, so block edge ranges are ordered); empty-block filler
    steps clip into the preceding chunk. The payload-emitting backward
    kernel relies on this: when two consecutive row blocks share a chunk,
    the second block's first step reads back the chunk rows the first
    block wrote (Pallas keeps the revisited output block VMEM-resident
    precisely because the chunk index did not move backwards).
    """
    counts = jnp.maximum(
        (ends + block_b - 1) // block_b - starts // block_b, 1
    ).astype(jnp.int32)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    steps = jnp.arange(total_steps, dtype=jnp.int32)
    block_of = jnp.clip(
        jnp.searchsorted(offsets, steps, side="right").astype(jnp.int32) - 1,
        0,
        num_blocks - 1,
    )
    chunk_of = steps - offsets[block_of]
    return block_of, chunk_of


def _chunk_index_fn(num_data_chunks, block_b):
    def chunk_index(i, bstep, cstep, starts, ends):
        r = bstep[i]
        g = starts[r] // block_b + cstep[i]
        return jnp.clip(g, 0, num_data_chunks - 1)

    return chunk_index


# Kernel dots pin precision=DEFAULT explicitly: these kernels do their
# own bf16 operand splits, so the global jax_default_matmul_precision
# (which quality runs set to "highest") must not leak in — Mosaic cannot
# lower HIGH and would emulate HIGHEST redundantly on top of the splits.
_MXU = jax.lax.Precision.DEFAULT


def _contract(acc, onehot, d, passes):
    """acc += onehotᵀ-style contraction with bf16-split data operand."""
    oh = onehot.astype(jnp.float32)
    d = d.astype(jnp.float32)
    for _ in range(passes):
        hi = d.astype(jnp.bfloat16).astype(jnp.float32)
        acc += jax.lax.dot_general(
            oh, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_MXU,
        )
        d = d - hi
    return acc


def _split_terms(table, passes):
    """bf16-split terms of a (loop-invariant) f32 operand, computed ONCE
    so per-sub-chunk dot passes don't redo the VPU conversions."""
    m = table.astype(jnp.float32)
    terms = []
    for _ in range(passes):
        hi = m.astype(jnp.bfloat16).astype(jnp.float32)
        terms.append(hi)
        m = m - hi
    return terms


def _select_rows_pre(onehot, terms):
    """Row gather via the MXU: ``out[s] = table[row_of(s)]`` as
    ``onehotᵀ (S, R) @ table (R, C)`` over pre-split table terms
    (rows with no one-hot hit come back 0)."""
    oh = onehot.astype(jnp.float32)
    acc = jnp.zeros((onehot.shape[1], terms[0].shape[1]), jnp.float32)
    for hi in terms:
        acc += jax.lax.dot_general(
            oh, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_MXU,
        )
    return acc


def _select_rows(onehot, table, passes):
    return _select_rows_pre(onehot, _split_terms(table, passes))


def _dot_split_pre(a, b_terms, passes, dims=(((1,), (0,)), ((), ()))):
    """``dot_general(a, b, dims)`` with BOTH operands bf16-split (the MXU
    rounds f32 operands to bf16 per pass); ``b``'s split terms are
    precomputed (hoist loop-invariant operands out of sub-chunk loops).
    ``passes=1/2/3`` → 1/3/6 MXU passes, dropping cross terms of total
    split order ≥ passes: relative error ~1e-2 / ~1e-5 / ≈f32-exact.
    bf16 inputs are exact at 1 pass."""
    a_terms = _split_terms(a, passes)
    acc = None
    for i, at in enumerate(a_terms):
        for j, bt in enumerate(b_terms):
            if i + j < passes:
                term = jax.lax.dot_general(
                    at, bt, dims,
                    preferred_element_type=jnp.float32, precision=_MXU,
                )
                acc = term if acc is None else acc + term
    return acc


def _dot_split(a, b, passes, dims=(((1,), (0,)), ((), ()))):
    return _dot_split_pre(a, _split_terms(b, passes), passes, dims)


def _sum_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref, ids_ref, data_ref,
                out_ref, *, block_b, block_sub, passes):
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = out_ref.shape[0]
        g = start // block_b + c  # chunk resident in ids/data
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        acc = jnp.zeros_like(out_ref)
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota  # (1, S)
            valid = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]  # (1, S)
            onehot = ((ids - row0) == rr) & valid  # (R, S)
            acc = _contract(
                acc, onehot, data_ref[pl.ds(j * block_sub, block_sub), :], passes
            )
        out_ref[:] += acc


def _sumsq_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref, ids_ref,
                  data_ref, out_ref, *, block_b, block_sub, passes):
    """Σx and Σx² in ONE edge pass: out lanes [0, C) hold the segment
    sum, [C, 2C) the sum of squares — var/std aggregators need both
    (the reference reaches them via two ``torch_scatter`` calls,
    ``graph_regression/mma_conv.py:167-172``; one fused pass halves the
    edge read traffic). The square is computed on the VPU in f32 (exact
    for bf16 inputs: an 8-bit×8-bit mantissa product fits f32)."""
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b
    ch = data_ref.shape[1]

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = out_ref.shape[0]
        g = start // block_b + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        acc1 = jnp.zeros((block_r, ch), jnp.float32)
        acc2 = jnp.zeros((block_r, ch), jnp.float32)
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota
            valid = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]
            onehot = ((ids - row0) == rr) & valid
            d = data_ref[pl.ds(j * block_sub, block_sub), :].astype(jnp.float32)
            acc1 = _contract(acc1, onehot, d, passes)
            acc2 = _contract(acc2, onehot, d * d, passes)
        out_ref[:, :ch] += acc1
        out_ref[:, ch:] += acc2


def _masked_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref, ids_ref,
                   logits_ref, h_ref, pat_ref, out_ref, *, block_b, block_sub,
                   passes, n_agg):
    """Fused mask-activation + multiply + segment-sum: per chunk
    ``msg = where(pat, σ(logits), logits) * tile(h, K)`` then the one-hot
    contraction — no (E, K·F) mask/message intermediates in HBM."""
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = out_ref.shape[0]
        g = start // block_b + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)

        # Mask math in f32 regardless of input dtype (Mosaic's logistic
        # lowering mishandles bf16 broadcasts; VPU cost is identical).
        logits = logits_ref[:].astype(jnp.float32)  # (B, K·F)
        pat = pat_ref[:].astype(jnp.float32)  # (1, K·F) 0/1
        mask = jnp.where(pat > 0, jax.nn.sigmoid(logits), logits)
        h = h_ref[:].astype(jnp.float32)  # (B, F)
        if n_agg > 1:
            h = jnp.concatenate([h] * n_agg, axis=1)
        msg = mask * h

        acc = jnp.zeros_like(out_ref)
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota
            valid = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]
            onehot = ((ids - row0) == rr) & valid
            acc = _contract(
                acc, onehot, msg[j * block_sub : (j + 1) * block_sub, :], passes
            )
        out_ref[:] += acc


def _program_fwd_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref, ids_ref,
                        dh_ref, c_ref, pat_ref, out_ref, *, block_b, block_sub,
                        passes, n_agg):
    """Fully fused MMA edge-program forward: the per-edge ``c[dst]`` term
    is gathered *in-kernel* from the block-resident ``c`` rows (one-hot
    MXU select), so logits never materialize in HBM. Per chunk:
    ``msg = act(c[dst] + d_src) * tile(h_src, K)`` then the one-hot
    segment-sum contraction. Inputs per edge are just the gathered
    ``[d ‖ h]`` table rows."""
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = out_ref.shape[0]
        ckf = out_ref.shape[1]
        g = start // block_b + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        pat = pat_ref[:].astype(jnp.float32)  # (1, K·F) 0/1
        c_terms = _split_terms(c_ref[:], passes)  # hoisted (R, K·F) split

        acc = jnp.zeros_like(out_ref)
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota  # (1, S)
            covered = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]  # (1, S)
            onehot = ((ids - row0) == rr) & covered  # (R, S)
            dh = dh_ref[pl.ds(j * block_sub, block_sub), :].astype(jnp.float32)
            d_sub, h_sub = dh[:, :ckf], dh[:, ckf:]
            logits = _select_rows_pre(onehot, c_terms) + d_sub  # (S, K·F)
            mask = jnp.where(pat > 0, jax.nn.sigmoid(logits), logits)
            if n_agg > 1:
                h_sub = jnp.concatenate([h_sub] * n_agg, axis=1)
            acc = _contract(acc, onehot, mask * h_sub, passes)
        out_ref[:] += acc


def _program_bwd_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref, nreal_ref,
                        ids_ref, dh_ref, c_ref, ct_ref, pat_ref,
                        dc_ref, *maybe_payload, block_b, block_sub, passes,
                        n_agg):
    """Fused MMA edge-program backward, dst orientation, one edge pass.

    Recomputes the mask chain from the forward residual (the gathered
    ``[d ‖ h]`` rows) plus block-resident ``c``, gathers the cotangent
    ``ct[dst]`` via one-hot MXU select, and emits both

    - ``dc`` — the dst-keyed reduction of ``dlogits`` (accumulated across
      the block's chunks like the forward output), and
    - ``payload = [dlogits ‖ dh_e]`` per edge — everything the src-keyed
      half of the backward needs, written chunk-aligned so the CSC pass
      (``fused_segment_sum_by_src``) consumes it directly.

    This replaces the XLA elementwise VJP chain (gather → sigmoid →
    three products → concat → separate segment-sum), which is ~4× the
    HBM traffic. A payload chunk shared by two row blocks is visited by
    consecutive grid steps; the second visitor (``c == 0`` with an
    unaligned start) preserves the first's rows instead of zeroing."""
    payload_ref = maybe_payload[0] if maybe_payload else None
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    n_real = nreal_ref[0]
    num_chunks = pl.cdiv(end, block_b) - start // block_b

    @pl.when(c == 0)
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = dc_ref.shape[0]
        ckf = dc_ref.shape[1]
        f = ckf // n_agg
        g = start // block_b + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (block_sub, 1), 0)
        pat = pat_ref[:].astype(jnp.float32)
        c_terms = _split_terms(c_ref[:], passes)
        ct_terms = _split_terms(ct_ref[:], passes)
        shared_start = (c == 0) & (start % block_b != 0)

        acc = jnp.zeros_like(dc_ref)
        for j in range(block_b // block_sub):
            base = g * block_b + j * block_sub
            gidx = base + sub_iota  # (1, S)
            covered = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]
            onehot = ((ids - row0) == rr) & covered  # (R, S)
            # Padding edges (tail, index ≥ n_real) must contribute zero
            # gradient — drop them from the cotangent gather.
            onehot_real = onehot & (gidx < n_real)
            dh = dh_ref[pl.ds(j * block_sub, block_sub), :].astype(jnp.float32)
            d_sub, h_sub = dh[:, :ckf], dh[:, ckf:]
            logits = _select_rows_pre(onehot, c_terms) + d_sub
            sig = jax.nn.sigmoid(logits)
            mask = jnp.where(pat > 0, sig, logits)
            dmask = jnp.where(pat > 0, sig * (1.0 - sig), 1.0)
            ge = _select_rows_pre(onehot_real, ct_terms)  # (S, K·F)
            if n_agg > 1:
                h_t = jnp.concatenate([h_sub] * n_agg, axis=1)
            else:
                h_t = h_sub
            dlog = ge * h_t * dmask
            gm = ge * mask
            dh_e = gm[:, :f]
            for kk in range(1, n_agg):
                dh_e = dh_e + gm[:, kk * f : (kk + 1) * f]
            acc = _contract(acc, onehot, dlog, passes)

            if payload_ref is not None:
                val = jnp.concatenate([dlog, dh_e], axis=1)  # (S, K·F+F)
                covered_col = (base + col_iota >= start) & (base + col_iota < end)
                prev = payload_ref[pl.ds(j * block_sub, block_sub), :]
                payload_ref[pl.ds(j * block_sub, block_sub), :] = jnp.where(
                    covered_col, val, jnp.where(shared_start, prev, 0.0)
                )
        dc_ref[:] += acc


def _program_bwd_csc_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref,
                            ids_ref, ctc_ref, d_ref, h_ref, pat_ref,
                            out_ref, *, block_b, block_sub, passes, n_agg):
    """Src-keyed half of the MMA edge-program backward, CSC orientation.

    Consumes ``ctc = [ct ‖ c][dst_csc]`` — node-table rows gathered
    straight into CSC edge order (no edge permute) — plus the
    block-resident src-side tables ``d`` (R, K·F) and ``h`` (R, F).
    Recomputes the mask chain per edge (logits = c-part + d[src] with
    d selected in-kernel) and accumulates ``[dd ‖ dh]`` for the block's
    src rows. Padding edges arrive pre-zeroed (their dst is the padding
    node, whose ct/c rows the caller zeroes)."""
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = out_ref.shape[0]
        ckf = d_ref.shape[1]
        f = ckf // n_agg
        g = start // block_b + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        pat = pat_ref[:].astype(jnp.float32)
        d_terms = _split_terms(d_ref[:], passes)
        h_terms = _split_terms(h_ref[:], passes)

        acc = jnp.zeros_like(out_ref)
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota
            covered = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]
            onehot = ((ids - row0) == rr) & covered
            ctc = ctc_ref[pl.ds(j * block_sub, block_sub), :].astype(jnp.float32)
            ge, c_part = ctc[:, :ckf], ctc[:, ckf:]
            logits = c_part + _select_rows_pre(onehot, d_terms)
            sig = jax.nn.sigmoid(logits)
            mask = jnp.where(pat > 0, sig, logits)
            dmask = jnp.where(pat > 0, sig * (1.0 - sig), 1.0)
            h_sel = _select_rows_pre(onehot, h_terms)  # (S, F)
            if n_agg > 1:
                h_t = jnp.concatenate([h_sel] * n_agg, axis=1)
            else:
                h_t = h_sel
            dlog = ge * h_t * dmask
            gm = ge * mask
            dh_e = gm[:, :f]
            for kk in range(1, n_agg):
                dh_e = dh_e + gm[:, kk * f : (kk + 1) * f]
            acc = _contract(
                acc, onehot, jnp.concatenate([dlog, dh_e], axis=1), passes
            )
        out_ref[:] += acc


def _program_fwd_lean_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref,
                             ids_ref, hg_ref, c_ref, w_ref, pat_ref, out_ref,
                             *, block_b, block_sub, passes, n_agg, f):
    """Lean MMA edge-program forward: the src-side mask projection
    ``d = h @ W_bot`` is computed *in-kernel* on the MXU (W_bot is
    block-resident), so the per-edge random gather shrinks from the
    wide ``[d ‖ h]`` table (K·F+F lanes — width 192 hits an XLA gather
    cliff at F=64, K=2) to ``tile(h, K)`` padded to the fast 128-lane
    gather class. Per chunk:
    ``msg = act(c[dst] + h_src @ W_bot) * tile(h_src, K)`` then the
    one-hot segment-sum contraction.

    ``hg_ref``: (B, F_pad) gathered ``tile(h, K)`` rows (lanes [0, K·F)
    real); ``w_ref``: (F, K·F) resident; ``c_ref``: (R, K·F) resident.
    """
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = out_ref.shape[0]
        ckf = out_ref.shape[1]
        g = start // block_b + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        pat = pat_ref[:].astype(jnp.float32)  # (1, K·F) 0/1
        c_terms = _split_terms(c_ref[:], passes)  # hoisted (R, K·F) split
        w_terms = _split_terms(w_ref[:], passes)  # hoisted (F, K·F) split

        acc = jnp.zeros_like(out_ref)
        for j in range(block_b // block_sub):
            gidx = g * block_b + j * block_sub + sub_iota  # (1, S)
            covered = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]  # (1, S)
            onehot = ((ids - row0) == rr) & covered  # (R, S)
            hg = hg_ref[pl.ds(j * block_sub, block_sub), :]
            h_t = hg[:, :ckf].astype(jnp.float32)  # tile(h, K)
            d_sub = _dot_split_pre(hg[:, :f], w_terms, passes)  # (S, K·F)
            logits = _select_rows_pre(onehot, c_terms) + d_sub
            mask = jnp.where(pat > 0, jax.nn.sigmoid(logits), logits)
            acc = _contract(acc, onehot, mask * h_t, passes)
        out_ref[:] += acc


def _program_bwd_lean_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref,
                             nreal_ref, ids_ref, hg_ref, c_ref, ct_ref,
                             w_ref, wt_ref, pat_ref, dc_ref, dw_ref,
                             payload_ref, *, block_b, block_sub, passes,
                             n_agg, f):
    """Lean MMA edge-program backward, dst orientation, one edge pass.

    Recomputes the mask chain from the gathered ``tile(h, K)`` residual
    plus block-resident ``c`` and ``W_bot``, gathers ``ct[dst]`` via
    one-hot MXU select, and emits

    - ``dc``   — dst-keyed reduction of ``dlogits`` (block-accumulated),
    - ``dw``   — ``Σ_e h_eᵀ dlogits_e``, accumulated into a single
      (F, K·F) output block with a constant index map (resident across
      the whole grid, flushed once at the end),
    - ``payload`` — per-edge ``dh_e = Σ_k (ge·mask)_k + dlogits @ W_botᵀ``
      (F lanes — the only residual the src-keyed CSC pass needs; 3×
      narrower than the wide-program payload).
    """
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    n_real = nreal_ref[0]
    num_chunks = pl.cdiv(end, block_b) - start // block_b

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(c == 0)
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        block_r = dc_ref.shape[0]
        ckf = dc_ref.shape[1]
        g = start // block_b + c
        row0 = r * block_r
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (block_sub, 1), 0)
        pat = pat_ref[:].astype(jnp.float32)
        c_terms = _split_terms(c_ref[:], passes)
        ct_terms = _split_terms(ct_ref[:], passes)
        w_terms = _split_terms(w_ref[:], passes)
        wt_terms = _split_terms(wt_ref[:], passes)  # W_botᵀ, pre-transposed
        shared_start = (c == 0) & (start % block_b != 0)

        acc = jnp.zeros_like(dc_ref)
        accw = jnp.zeros_like(dw_ref)
        for j in range(block_b // block_sub):
            base = g * block_b + j * block_sub
            gidx = base + sub_iota  # (1, S)
            covered = (gidx >= start) & (gidx < end)
            ids = ids_ref[0, j : j + 1, :]
            onehot = ((ids - row0) == rr) & covered  # (R, S)
            onehot_real = onehot & (gidx < n_real)
            hg = hg_ref[pl.ds(j * block_sub, block_sub), :]
            h_t = hg[:, :ckf].astype(jnp.float32)
            h_sub = hg[:, :f]
            d_sub = _dot_split_pre(h_sub, w_terms, passes)
            logits = _select_rows_pre(onehot, c_terms) + d_sub
            sig = jax.nn.sigmoid(logits)
            mask = jnp.where(pat > 0, sig, logits)
            dmask = jnp.where(pat > 0, sig * (1.0 - sig), 1.0)
            ge = _select_rows_pre(onehot_real, ct_terms)  # (S, K·F)
            dlog = ge * h_t * dmask
            gm = ge * mask
            dh_e = gm[:, :f]
            for kk in range(1, n_agg):
                dh_e = dh_e + gm[:, kk * f : (kk + 1) * f]
            # d-path gradient: dh_e += dlog @ W_botᵀ (S, K·F) @ (K·F, F).
            dh_e = dh_e + _dot_split_pre(dlog, wt_terms, passes)
            # dW_bot: contract the sub-chunk dim — h_sub (S, F) ×
            # dlog (S, K·F) over dim 0 (no in-kernel transpose). This
            # accumulates over ALL edges, so split error scales with the
            # global magnitude and per-element cancellation can leave
            # large relative error — use the ≈exact 3-pass dual split on
            # the f32 path (bf16 inputs stay single-pass).
            w_passes = 3 if passes >= 2 else passes
            accw += _dot_split(h_sub, dlog, w_passes, (((0,), (0,)), ((), ())))
            acc = _contract(acc, onehot, dlog, passes)

            covered_col = (base + col_iota >= start) & (base + col_iota < end)
            prev = payload_ref[pl.ds(j * block_sub, block_sub), :]
            payload_ref[pl.ds(j * block_sub, block_sub), :] = jnp.where(
                covered_col, dh_e, jnp.where(shared_start, prev, 0.0)
            )
        dc_ref[:] += acc
        dw_ref[:] += accw


def _grid_and_prefetch(row_ptr, e_pad, block_r, block_b):
    n = row_ptr.shape[0] - 1
    num_blocks = pl.cdiv(n, block_r)
    num_data_chunks = e_pad // block_b
    # Universal tight step bound: Σ max(chunks_b, 1) ≤ E/B + num_blocks.
    total_steps = num_data_chunks + int(num_blocks)

    block_rows = jnp.minimum(jnp.arange(num_blocks + 1, dtype=jnp.int32) * block_r, n)
    bounds = row_ptr[block_rows]
    starts, ends = bounds[:-1], bounds[1:]
    block_of, chunk_of = _step_maps(starts, ends, num_blocks, total_steps, block_b)
    return n, num_blocks, num_data_chunks, total_steps, starts, ends, block_of, chunk_of


def _fit_block_sub(block_sub, block_b):
    """Largest divisor of ``block_b`` that is <= the requested contraction width.

    Shard-local callers can have block_b below the global BLOCK_SUB, or a
    non-power-of-two multiple of 128 (node-sharded pads like 640/768/896):
    a plain ``min`` clamp then picks a width that does not divide the chunk
    and the ``dst.reshape(num_chunks, n_sub, block_sub)`` fails at trace
    time. Halve until it divides (block_b is always a multiple of 128, so
    this terminates at a 128-multiple or at block_b itself).
    """
    block_sub = min(block_sub, block_b)
    while block_b % block_sub:
        block_sub //= 2
    return block_sub


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "block_sub", "interpret", "passes")
)
def _fused_segment_sum(data, dst, row_ptr, *, block_r, block_b,
                       block_sub=BLOCK_SUB, interpret, passes):
    e_pad, ch = data.shape
    assert e_pad % block_b == 0, (e_pad, block_b)
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(  # ids tiled (chunks, n_sub, 128)
                (1, n_sub, block_sub),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # data (E, C) → (B, C) chunks
                (block_b, ch),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_r, ch), lambda i, b, c, s, e: (b[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _sum_kernel, block_b=block_b, block_sub=block_sub, passes=passes
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((int(num_blocks) * block_r, ch), jnp.float32),
        interpret=interpret,
    )(block_of, chunk_of, starts, ends,
      dst.reshape(num_chunks, n_sub, block_sub), data)[:n]


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "block_sub", "interpret", "passes", "n_agg")
)
def _fused_masked_segment_sum(logits, h_src, pattern, dst, row_ptr, *, block_r,
                              block_b, block_sub=BLOCK_SUB, interpret, passes, n_agg):
    e_pad, ckf = logits.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub
    f = ckf // n_agg

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, block_sub),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, ckf),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, f),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, ckf), lambda i, b, c, s, e: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_r, ckf), lambda i, b, c, s, e: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _masked_kernel, block_b=block_b, block_sub=block_sub,
            passes=passes, n_agg=n_agg,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((int(num_blocks) * block_r, ckf), jnp.float32),
        interpret=interpret,
    )(block_of, chunk_of, starts, ends,
      dst.reshape(num_chunks, n_sub, block_sub), logits, h_src, pattern)[:n]


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "block_sub", "interpret", "passes", "n_agg")
)
def _fused_program_fwd(c, dh_src, pattern, dst, row_ptr, *, block_r, block_b,
                       block_sub=BLOCK_SUB, interpret, passes, n_agg):
    e_pad, ckf_f = dh_src.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub
    ckf = c.shape[1]
    n_rows = int(num_blocks) * block_r
    c_p = jnp.pad(c, ((0, n_rows - c.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, block_sub),
                lambda i, b, c_, s, e: (chunk_index(i, b, c_, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, ckf_f),
                lambda i, b, c_, s, e: (chunk_index(i, b, c_, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckf), lambda i, b, c_, s, e: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_r, ckf), lambda i, b, c_, s, e: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _program_fwd_kernel, block_b=block_b, block_sub=block_sub,
            passes=passes, n_agg=n_agg,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, ckf), jnp.float32),
        interpret=interpret,
    )(block_of, chunk_of, starts, ends,
      dst.reshape(num_chunks, n_sub, block_sub), dh_src, c_p, pattern)[:n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_r", "block_b", "block_sub", "interpret", "passes", "n_agg", "emit_payload"
    ),
)
def _fused_program_bwd(c, ct, dh_src, pattern, dst, row_ptr, n_real, *,
                       block_r, block_b, block_sub=BLOCK_SUB, interpret,
                       passes, n_agg, emit_payload=True):
    e_pad, ckf_f = dh_src.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub
    ckf = c.shape[1]
    n_rows = int(num_blocks) * block_r
    c_p = jnp.pad(c, ((0, n_rows - c.shape[0]), (0, 0)))
    ct_p = jnp.pad(ct, ((0, n_rows - ct.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, block_sub),
                lambda i, b, c_, s, e, nr: (chunk_index(i, b, c_, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, ckf_f),
                lambda i, b, c_, s, e, nr: (chunk_index(i, b, c_, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckf), lambda i, b, c_, s, e, nr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
        ) + ((
            pl.BlockSpec(
                (block_b, ckf_f),
                lambda i, b, c_, s, e, nr: (chunk_index(i, b, c_, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
        ) if emit_payload else ()),
    )
    out_shape = (jax.ShapeDtypeStruct((n_rows, ckf), jnp.float32),)
    if emit_payload:
        out_shape += (jax.ShapeDtypeStruct((e_pad, ckf_f), jnp.float32),)
    outs = pl.pallas_call(
        functools.partial(
            _program_bwd_kernel, block_b=block_b, block_sub=block_sub,
            passes=passes, n_agg=n_agg,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(block_of, chunk_of, starts, ends, n_real,
      dst.reshape(num_chunks, n_sub, block_sub), dh_src, c_p, ct_p, pattern)
    dc = outs[0][:n]
    return (dc, outs[1]) if emit_payload else (dc, None)


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "block_sub", "interpret", "passes", "n_agg")
)
def _fused_program_bwd_csc(ctc, d, h, pattern, src_csc, col_ptr, *,
                           block_r, block_b, block_sub=BLOCK_SUB, interpret,
                           passes, n_agg):
    e_pad, two_ckf = ctc.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(col_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub
    ckf = d.shape[1]
    f = h.shape[1]
    n_rows = int(num_blocks) * block_r
    d_p = jnp.pad(d, ((0, n_rows - d.shape[0]), (0, 0)))
    h_p = jnp.pad(h, ((0, n_rows - h.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, block_sub),
                lambda i, b, c_, s, e: (chunk_index(i, b, c_, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, two_ckf),
                lambda i, b, c_, s, e: (chunk_index(i, b, c_, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, f), lambda i, b, c_, s, e: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckf), lambda i, b, c_, s, e: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_r, ckf + f), lambda i, b, c_, s, e: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _program_bwd_csc_kernel, block_b=block_b, block_sub=block_sub,
            passes=passes, n_agg=n_agg,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, ckf + f), jnp.float32),
        interpret=interpret,
    )(block_of, chunk_of, starts, ends,
      src_csc.reshape(num_chunks, n_sub, block_sub), ctc, d_p, h_p, pattern)
    return out[:n]


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "block_sub", "interpret",
                              "passes", "n_agg", "f")
)
def _fused_program_fwd_lean(c, hg, w, pattern, dst, row_ptr, *, block_r,
                            block_b, block_sub=BLOCK_SUB, interpret, passes,
                            n_agg, f):
    e_pad, f_pad = hg.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub
    ckf = c.shape[1]
    n_rows = int(num_blocks) * block_r
    c_p = jnp.pad(c, ((0, n_rows - c.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, block_sub),
                lambda i, b, c_, s, e: (chunk_index(i, b, c_, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, f_pad),
                lambda i, b, c_, s, e: (chunk_index(i, b, c_, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, ckf), lambda i, b, c_, s, e: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckf), lambda i, b, c_, s, e: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_r, ckf), lambda i, b, c_, s, e: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _program_fwd_lean_kernel, block_b=block_b, block_sub=block_sub,
            passes=passes, n_agg=n_agg, f=f,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, ckf), jnp.float32),
        interpret=interpret,
    )(block_of, chunk_of, starts, ends,
      dst.reshape(num_chunks, n_sub, block_sub), hg, c_p, w, pattern)[:n]


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "block_sub", "interpret",
                              "passes", "n_agg", "f")
)
def _fused_program_bwd_lean(c, ct, hg, w, wt, pattern, dst, row_ptr, n_real,
                            *, block_r, block_b, block_sub=BLOCK_SUB,
                            interpret, passes, n_agg, f):
    e_pad, f_pad = hg.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub
    ckf = c.shape[1]
    n_rows = int(num_blocks) * block_r
    c_p = jnp.pad(c, ((0, n_rows - c.shape[0]), (0, 0)))
    ct_p = jnp.pad(ct, ((0, n_rows - ct.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, block_sub),
                lambda i, b, c_, s, e, nr: (chunk_index(i, b, c_, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, f_pad),
                lambda i, b, c_, s, e, nr: (chunk_index(i, b, c_, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, ckf), lambda i, b, c_, s, e, nr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ckf, f), lambda i, b, c_, s, e, nr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ckf), lambda i, b, c_, s, e, nr: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_r, ckf), lambda i, b, c_, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, ckf), lambda i, b, c_, s, e, nr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, f),
                lambda i, b, c_, s, e, nr: (chunk_index(i, b, c_, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_rows, ckf), jnp.float32),
        jax.ShapeDtypeStruct((f, ckf), jnp.float32),
        jax.ShapeDtypeStruct((e_pad, f), jnp.float32),
    )
    dc, dw, payload = pl.pallas_call(
        functools.partial(
            _program_bwd_lean_kernel, block_b=block_b, block_sub=block_sub,
            passes=passes, n_agg=n_agg, f=f,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(block_of, chunk_of, starts, ends, n_real,
      dst.reshape(num_chunks, n_sub, block_sub), hg, c_p, ct_p, w, wt, pattern)
    return dc[:n], dw, payload


def _pad_edges(arrs, dst, n_edge, n_node, block_b):
    pad = (-n_edge) % block_b
    if pad:
        arrs = [jnp.pad(a, ((0, pad), (0, 0))) for a in arrs]
        dst = jnp.pad(dst, (0, pad), constant_values=n_node - 1)
    return arrs, dst


def fused_segment_sum(
    data: jnp.ndarray,
    graph: Graph,
    *,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "high",
) -> jnp.ndarray:
    """Segment-sum ``data`` (E, C) over ``graph.dst`` → (N, C) float32.

    Requires the graph's dst-sorted edge order. Rows belonging to padding
    nodes receive sums of padding-edge data rows — callers mask padded
    data to zero (``masked_multi_aggregate`` / ``binary_spmm`` do).

    ``precision``: ``"fastest"`` (single MXU pass, data rounded to bf16,
    ~1e-3 relative error), ``"high"`` (2-term bf16 split, ~1e-6 —
    default), ``"highest"`` (3-term split, ≈ exact f32). bf16 input data
    is exact in a single pass.
    """
    assert data.ndim == 2 and data.shape[0] == graph.n_edge, data.shape
    if data.dtype == jnp.bfloat16:
        precision = "fastest"  # single pass is exact for bf16 data
    passes = _PASSES[precision]

    def _run(d):
        (d,), dst = _pad_edges([d], graph.dst, graph.n_edge, graph.n_node, block_b)
        return _fused_segment_sum(
            d, dst, graph.row_ptr, block_r=block_r, block_b=block_b,
            interpret=jax.devices()[0].platform != "tpu", passes=passes,
        )

    # pallas_call has no AD rule; the transpose of a segment-sum is a
    # gather by destination. The graph rides through the VJP *residuals*,
    # never a closure: inside shard_map the graph leaves are tracers, and
    # a closure capture would leak them into the backward trace.
    @jax.custom_vjp
    def _op(d):
        return _run(d)

    def _op_fwd(d):
        return _run(d), graph

    def _op_bwd(g, ct):
        ct_e = ct[g.dst].astype(data.dtype)
        ct_e = jnp.where(g.edge_mask[:, None], ct_e, 0)
        return (ct_e,)

    _op.defvjp(_op_fwd, _op_bwd)
    return _op(data)


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_b", "block_sub", "interpret", "passes")
)
def _fused_segment_sum_sq(data, dst, row_ptr, *, block_r, block_b,
                          block_sub=BLOCK_SUB, interpret, passes):
    e_pad, ch = data.shape
    assert e_pad % block_b == 0, (e_pad, block_b)
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    chunk_index = _chunk_index_fn(num_chunks, block_b)
    block_sub = _fit_block_sub(block_sub, block_b)
    n_sub = block_b // block_sub

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_sub, block_sub),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, ch),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_r, 2 * ch), lambda i, b, c, s, e: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _sumsq_kernel, block_b=block_b, block_sub=block_sub, passes=passes
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((int(num_blocks) * block_r, 2 * ch),
                                       jnp.float32),
        interpret=interpret,
    )(block_of, chunk_of, starts, ends,
      dst.reshape(num_chunks, n_sub, block_sub), data)[:n]


def fused_segment_sum_sq(
    data: jnp.ndarray,
    graph: Graph,
    *,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "high",
) -> jnp.ndarray:
    """``[Σ data ‖ Σ data²]`` over ``graph.dst`` → (N, 2C) in one edge
    pass — the var/std aggregators' fused input. Padding edges must hold
    zero data (callers mask; zeros contribute 0 to both halves of the
    padding node's row only — same containment as ``fused_segment_sum``).

    Differentiable: ``d/dx = ct_sum[dst] + 2·x·ct_sq[dst]`` — two cheap
    dst-keyed *gathers*, no scatter.
    """
    assert data.ndim == 2 and data.shape[0] == graph.n_edge, data.shape
    if data.dtype == jnp.bfloat16:
        precision = "fastest"
    passes = _PASSES[precision]
    ch = data.shape[1]

    def _run(d):
        (d,), dst = _pad_edges([d], graph.dst, graph.n_edge, graph.n_node, block_b)
        return _fused_segment_sum_sq(
            d, dst, graph.row_ptr, block_r=block_r, block_b=block_b,
            interpret=jax.devices()[0].platform != "tpu", passes=passes,
        )

    @jax.custom_vjp
    def _op(d):
        return _run(d)

    def _op_fwd(d):
        return _run(d), (d, graph)  # graph in residuals, not closure

    def _op_bwd(res, ct):
        d, g = res
        ct_e = ct[g.dst]
        dx = ct_e[:, :ch] + 2.0 * d.astype(jnp.float32) * ct_e[:, ch:]
        dx = jnp.where(g.edge_mask[:, None], dx, 0)
        return (dx.astype(d.dtype),)

    _op.defvjp(_op_fwd, _op_bwd)
    return _op(data)


def fused_segment_sum_raw(
    data: jnp.ndarray,
    dst: jnp.ndarray,
    row_ptr: jnp.ndarray,
    *,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "high",
) -> jnp.ndarray:
    """Sorted segment-sum from raw CSR arrays (no :class:`Graph`).

    The building block for *sharded* regimes, where each device holds a
    local CSR slice inside ``shard_map`` and no Graph container exists
    (sharded graphs null ``chunk_hint`` — CLAUDE.md invariant — so the
    Graph-level wrappers refuse them; this wrapper takes the local
    structure directly). Requirements: ``data`` (E_pad, C) with
    ``E_pad % min(block_b, E_pad) == 0`` and padding rows ZERO, ``dst``
    dst-sorted with padding edges pointing at the LAST row,
    ``row_ptr`` (N+1,) covering all E_pad edges. Returns (N, C) float32.

    Differentiable: the transpose is a dst-keyed gather (padding-edge
    cotangents land on padded data positions the caller masks out).
    """
    e_pad, _ = data.shape
    bb = min(block_b, e_pad)
    assert e_pad % bb == 0 and bb % 128 == 0, (e_pad, bb)
    if data.dtype == jnp.bfloat16:
        precision = "fastest"
    passes = _PASSES[precision]
    interpret = jax.devices()[0].platform != "tpu"

    # dst/row_ptr are explicit custom_vjp args (NOT closed over): inside
    # shard_map they are tracers, and a closure capture would leak them
    # into the later backward trace. Integer args get float0 cotangents.
    import numpy as _np

    @jax.custom_vjp
    def _op(d, dst_, rp_):
        return _fused_segment_sum(
            d, dst_, rp_, block_r=block_r, block_b=bb,
            interpret=interpret, passes=passes,
        )

    def _op_fwd(d, dst_, rp_):
        return _op(d, dst_, rp_), (dst_, rp_)

    def _op_bwd(res, ct):
        dst_, rp_ = res
        return (
            ct[dst_].astype(data.dtype),
            _np.zeros(dst_.shape, jax.dtypes.float0),
            _np.zeros(rp_.shape, jax.dtypes.float0),
        )

    _op.defvjp(_op_fwd, _op_bwd)
    return _op(data, dst, row_ptr)


def fused_segment_sum_by_src(
    data: jnp.ndarray,
    graph: Graph,
    *,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "high",
) -> jnp.ndarray:
    """Segment-sum ``data`` (E, C) over ``graph.src`` → (N, C) float32.

    The transpose orientation (CSC view): permutes the edge data into the
    precomputed src-sorted order (``graph.src_perm`` / ``graph.col_ptr``)
    and runs the same row-block kernel — this is how backward-pass
    scatters (the transposes of gathers-by-src) stay scatter-free. Not
    differentiable (it is itself backward-path machinery).
    """
    assert graph.src_perm is not None and graph.col_ptr is not None
    data_p = data[graph.src_perm]
    return fused_segment_sum_csc(
        data_p, graph, block_r=block_r, block_b=block_b, precision=precision
    )


def fused_segment_sum_csc(
    data_csc: jnp.ndarray,
    graph: Graph,
    *,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "high",
) -> jnp.ndarray:
    """Segment-sum of *already CSC-ordered* edge data over src → (N, C).

    The fast path for src-keyed backward reductions: producers that can
    emit edge data directly in CSC order (e.g. node-table gathers by
    ``graph.dst_csc``) skip the edge permute entirely — permutes of edge
    arrays are DMA-issue-rate bound (~19 ns/row regardless of width or
    run length), while node-table gathers run 2-5× faster per byte."""
    assert graph.col_ptr is not None
    if data_csc.dtype == jnp.bfloat16:
        precision = "fastest"
    passes = _PASSES[precision]
    src_sorted = (
        graph.src_csc if graph.src_csc is not None
        else graph.src[graph.src_perm]
    )
    (data_csc,), src_sorted = _pad_edges(
        [data_csc], src_sorted, graph.n_edge, graph.n_node, block_b
    )
    return _fused_segment_sum(
        data_csc, src_sorted, graph.col_ptr, block_r=block_r, block_b=block_b,
        interpret=jax.devices()[0].platform != "tpu", passes=passes,
    )


def fused_mma_edge_program(
    c: jnp.ndarray,
    d: jnp.ndarray,
    h: jnp.ndarray,
    sig_pattern: jnp.ndarray,
    graph: Graph,
    n_agg: int,
    *,
    precision: str = "high",
    bwd_mode: "str | None" = None,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    block_sub: int = BLOCK_SUB,
) -> jnp.ndarray:
    """Full MMA edge program with Pallas forward *and* backward.

    ``bwd_mode`` selects the src-keyed backward strategy
    (``"payload_permute"`` / ``"csc_gather"``, see ``EDGE_BWD_MODE``);
    ``None`` takes the module default. It is resolved here, inside the
    traced call, so the choice is part of the jitted signature.

    ``S[i] = Σ_{e: dst=i} act(c[dst_e] + d[src_e]) ⊙ tile(h[src_e], K)``
    with ``c``/``d`` the per-node mask projections (N, K·F) and ``h``
    (N, F).

    HBM-traffic-minimal design (random-access reads are the cost floor:
    ~100 GB/s measured vs ~400 GB/s for dst-sorted gathers):

    - forward: ONE wide src-keyed gather over a concatenated ``[d ‖ h]``
      table; the ``c[dst]`` term is selected *in-kernel* from
      block-resident ``c`` rows (one-hot MXU), so neither logits nor
      messages ever materialize in HBM. The gathered rows double as the
      only backward residual.
    - backward: one fused dst-oriented kernel recomputes the mask chain,
      selects ``ct[dst]`` in-kernel, and emits ``dc`` plus the per-edge
      ``[dlogits ‖ dh_e]`` payload; the src-keyed reductions (``dd``,
      ``dh``) then run as ONE wide CSC-permuted Pallas segment-sum.
      No XLA scatter-adds and no standalone elementwise VJP chain.
    """
    e = graph.n_edge
    ckf = c.shape[1]
    f = ckf // n_agg
    assert d.shape == c.shape and h.shape[1] == f
    if bwd_mode is None:
        bwd_mode = EDGE_BWD_MODE
    assert bwd_mode in ("payload_permute", "csc_gather"), bwd_mode
    passes = _PASSES[precision]
    interpret = jax.devices()[0].platform != "tpu"
    pat2d = sig_pattern.astype(jnp.float32).reshape(1, ckf)

    def _fwd_run(c, dh_src):
        (dh_p,), dst = _pad_edges(
            [dh_src], graph.dst, e, graph.n_node, block_b
        )
        return _fused_program_fwd(
            c.astype(jnp.float32), dh_p, pat2d, dst, graph.row_ptr,
            block_r=block_r, block_b=block_b, block_sub=block_sub,
            interpret=interpret, passes=passes, n_agg=n_agg,
        )

    @jax.custom_vjp
    def _op(c, d, h):
        dh_src = jnp.concatenate([d, h], axis=1)[graph.src]  # (E, K·F+F)
        return _fwd_run(c, dh_src)

    def _fwd(c, d, h):
        dh_src = jnp.concatenate([d, h], axis=1)[graph.src]
        # graph + pattern ride through residuals, not closures (inside
        # shard_map they are tracers; closures would leak them).
        return _fwd_run(c, dh_src), (c, d, h, dh_src, graph, pat2d)

    def _bwd(res, ct):
        c_, d_, h_, dh_src, g, pat = res
        (dh_p,), dst = _pad_edges(
            [dh_src], g.dst, e, g.n_node, block_b
        )
        n_real = g.num_edges.astype(jnp.int32).reshape(1)
        csc = g.dst_csc is not None and bwd_mode == "csc_gather"
        dc, payload = _fused_program_bwd(
            c_.astype(jnp.float32), ct.astype(jnp.float32), dh_p, pat,
            dst, g.row_ptr, n_real,
            block_r=block_r, block_b=block_b, block_sub=block_sub,
            interpret=interpret, passes=passes, n_agg=n_agg,
            emit_payload=not csc,
        )
        if csc:
            # Src-keyed half via CSC recompute: gather [ct ‖ c] node rows
            # straight into CSC edge order (no edge permute — permutes are
            # DMA-issue-bound) and rebuild the mask chain in-kernel from
            # the block-resident d/h tables. Zeroing the padding node's ct
            # row masks the padding edges (they all point at it).
            ct_z = jnp.where(
                g.node_mask[:, None], ct.astype(jnp.float32), 0.0
            )
            ctc = jnp.concatenate([ct_z, c_.astype(jnp.float32)], axis=1)[
                g.dst_csc
            ]
            (ctc_p,), src_csc = _pad_edges(
                [ctc], g.src_csc, e, g.n_node, block_b
            )
            src_side = _fused_program_bwd_csc(
                ctc_p, d_.astype(jnp.float32), h_.astype(jnp.float32),
                pat, src_csc, g.col_ptr,
                block_r=block_r, block_b=block_b, block_sub=block_sub,
                interpret=interpret, passes=passes, n_agg=n_agg,
            )
        else:
            # One wide src-keyed pass for both dd and dh (tuned blocks
            # threaded through — the row-block tuning applies to every
            # pass of the backward, not just the dst kernel).
            src_side = fused_segment_sum_by_src(
                payload[:e], g, precision=precision,
                block_r=block_r, block_b=block_b,
            )
        dd, dh = src_side[:, :ckf], src_side[:, ckf:]
        return dc.astype(c.dtype), dd.astype(d.dtype), dh.astype(h.dtype)

    _op.defvjp(_fwd, _bwd)
    return _op(c, d, h)


def fused_mma_edge_program_lean(
    c: jnp.ndarray,
    w_bot: jnp.ndarray,
    h: jnp.ndarray,
    sig_pattern: jnp.ndarray,
    graph: Graph,
    n_agg: int,
    *,
    precision: str = "high",
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    block_sub: int = BLOCK_SUB,
) -> jnp.ndarray:
    """Lean MMA edge program: ``d = h @ W_bot`` moves *into* the kernel.

    ``S[i] = Σ_{e: dst=i} act(c[dst_e] + h[src_e] @ W_bot) ⊙ tile(h[src_e], K)``

    vs ``fused_mma_edge_program`` (which takes a precomputed ``d`` and
    gathers the wide ``[d ‖ h]`` table): the only random access shrinks
    from K·F+F lanes to ``tile(h, K)`` zero-padded to a 128-lane
    multiple — measured on v5e, the width-192 f32 gather runs at
    ~50 GB/s while width-128 runs at ~236 GB/s (XLA gather prefers
    power-of-two 512-byte rows), and the kernel streams 2/3 the edge
    bytes. The src-side projection costs one extra (S, F)×(F, K·F) MXU
    dot per sub-chunk — the kernel is bandwidth-bound, not MXU-bound.

    Backward: one dst-oriented pass emits ``dc``, ``dW_bot`` (a single
    constant-index output block accumulated across the whole grid) and a
    per-edge ``dh`` payload (F lanes, 3× narrower than the wide
    program's), reduced src-keyed by the CSC segment-sum kernel.

    bf16 inputs run every MXU contraction in ONE exact pass (f32
    ``precision="high"`` uses 2-pass splits / 3-pass dual splits).

    Replaces ``torch_scatter.scatter`` at
    ``/root/reference/graph_regression/mma_conv.py:166`` and the mask
    SDDMM at ``/root/reference/node_classification/layers.py:215-217``.
    """
    e = graph.n_edge
    ckf = c.shape[1]
    f = ckf // n_agg
    assert w_bot.shape == (f, ckf), (w_bot.shape, (f, ckf))
    assert h.shape[1] == f
    passes = 1 if h.dtype == jnp.bfloat16 else _PASSES[precision]
    interpret = jax.devices()[0].platform != "tpu"
    pat2d = sig_pattern.astype(jnp.float32).reshape(1, ckf)
    f_pad = -(-ckf // 128) * 128  # 128-lane multiple ≥ ckf (fast gathers)

    def _gather_table(h_):
        tab = jnp.tile(h_, (1, n_agg)) if n_agg > 1 else h_
        if f_pad > ckf:
            tab = jnp.pad(tab, ((0, 0), (0, f_pad - ckf)))
        # Materialize the padded table BEFORE the gather: fusing the pad
        # into the gather makes XLA emit the slow sub-128-lane gather
        # (measured 7.9 ms fused vs 4.6 ms from a materialized 128-wide
        # f32 table on 2.1M rows).
        tab = jax.lax.optimization_barrier(tab)
        return tab[graph.src]  # (E, f_pad)

    def _fwd_run(c_, w_, hg):
        (hg_p,), dst = _pad_edges([hg], graph.dst, e, graph.n_node, block_b)
        return _fused_program_fwd_lean(
            c_.astype(jnp.float32), hg_p, w_.astype(jnp.float32), pat2d,
            dst, graph.row_ptr, block_r=block_r, block_b=block_b,
            block_sub=block_sub, interpret=interpret, passes=passes,
            n_agg=n_agg, f=f,
        )

    @jax.custom_vjp
    def _op(c_, w_, h_):
        return _fwd_run(c_, w_, _gather_table(h_))

    def _fwd(c_, w_, h_):
        hg = _gather_table(h_)
        # graph + pattern in residuals, not closures (shard_map safety).
        return _fwd_run(c_, w_, hg), (c_, w_, hg, graph, pat2d)

    def _bwd(res, ct):
        c_, w_, hg, g, pat = res
        (hg_p,), dst = _pad_edges([hg], g.dst, e, g.n_node, block_b)
        n_real = g.num_edges.astype(jnp.int32).reshape(1)
        w32 = w_.astype(jnp.float32)
        dc, dw, payload = _fused_program_bwd_lean(
            c_.astype(jnp.float32), ct.astype(jnp.float32), hg_p, w32,
            w32.T, pat, dst, g.row_ptr, n_real,
            block_r=block_r, block_b=block_b, block_sub=block_sub,
            interpret=interpret, passes=passes, n_agg=n_agg, f=f,
        )
        dh = fused_segment_sum_by_src(
            payload[:e], g, precision=precision,
            block_r=block_r, block_b=block_b,
        )
        return dc.astype(c.dtype), dw.astype(w_bot.dtype), dh.astype(h.dtype)

    _op.defvjp(_fwd, _bwd)
    return _op(c, w_bot, h)


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
    bool — which lanes apply sigmoid (N1 table, see
    ``mma_tpu.ops.aggregators``). Differentiable (custom VJP recomputes
    the activation elementwise in XLA).
    """
    e, ckf = logits.shape
    assert e == graph.n_edge and h_src.shape == (e, ckf // n_agg)
    passes = 1 if logits.dtype == jnp.bfloat16 else _PASSES[precision]
    pat2d = sig_pattern.astype(logits.dtype).reshape(1, ckf)

    def _run(l, h):
        (l, h), dst = _pad_edges([l, h], graph.dst, e, graph.n_node, block_b)
        return _fused_masked_segment_sum(
            l, h, pat2d, dst, graph.row_ptr,
            block_r=block_r, block_b=block_b,
            interpret=jax.devices()[0].platform != "tpu",
            passes=passes, n_agg=n_agg,
        )

    @jax.custom_vjp
    def _op(l, h):
        return _run(l, h)

    def _fwd(l, h):
        return _run(l, h), (l, h, graph, sig_pattern)

    def _bwd(res, ct):
        l, h, g, sp = res
        pat = sp[None, :]
        sig = jax.nn.sigmoid(l)
        mask = jnp.where(pat, sig, l)
        ge = ct[g.dst].astype(l.dtype)  # (E, K·F)
        ge = jnp.where(g.edge_mask[:, None], ge, 0)
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
