"""Pallas TPU kernel: sorted segmented min/max over CSR row blocks.

The reference reaches segmented min/max through ``torch_scatter.scatter``
with ``reduce='min'/'max'`` (``graph_regression/mma_conv.py:166-172``) —
the ZINC flagship config is ``--aggregators min,max``
(``/root/reference/README.md:79``). XLA lowers ``segment_min/max`` to a
generic scatter, which serializes on TPU. min/max have no MXU
formulation (unlike the sum family's one-hot contraction), so this
kernel uses the ordering invariant instead:

- edges are **dst-sorted**, so each output row's edges are one contiguous
  run; a segmented inclusive scan (Hillis–Steele doubling: combine with
  the value ``2^k`` sublanes above iff both sublanes share a dst) leaves
  each run's last element holding the run's min/max. The doubling-scan
  shortcut — test only the endpoints' ids, not the whole interval — is
  valid *because* ids are monotone;
- ``scan_steps`` caps the doubling at the graph's max in-degree
  (``ceil(log2(min(max_deg, block_b)))``): molecule graphs (deg ≤ ~6)
  need 3 steps instead of ``log2(block_b)`` = 10;
- each row's per-chunk partial sits at a *known position* (the row's
  last in-chunk edge, from the CSR row pointers), so extraction is a
  one-hot MXU contraction with exactly one hit per row — values ride
  through a 3-term bf16 split (~1e-7 relative; min/max never
  re-associate, so this is also the path's only error source);
- partials combine across a row block's chunks with min/max in the
  VMEM-resident output block, exactly like the sum kernel's ``+=``.

min and max run in ONE pass over the data (shared shifts and masks) —
the ZINC parity semantics (N6) feed *the same* message tensor to every
aggregator, so ``ops=("min","max")`` halves the edge traffic vs two
kernel launches.

Grid/prefetch machinery is shared with ``fused_mma`` (same flattened
step sequence, same chunk-index monotonicity invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mma_tpu.constants import BLOCK_B, BLOCK_R
from mma_tpu.graph.container import Graph
from mma_tpu.ops.pallas.fused_mma import (
    _PASSES,
    _grid_and_prefetch,
    _pad_edges,
    _split_terms,
)

_NEUTRAL = {"min": jnp.inf, "max": -jnp.inf}


def _select_last(onehot_f32, x, passes):
    """``out[r] = x[pos_r]`` as ``onehotᵀ (B, R) @ x (B, C)`` with the
    data operand bf16-split. At most one hit per row, so the contraction
    is a pure selection (no accumulation error beyond the split
    residual, ≤ ~1e-7 relative at 3 passes); rows with no hit come
    back 0 and are replaced by the caller."""
    acc = jnp.zeros((onehot_f32.shape[1], x.shape[1]), jnp.float32)
    d = x
    for _ in range(passes):
        hi = d.astype(jnp.bfloat16).astype(jnp.float32)
        acc += jax.lax.dot_general(
            onehot_f32, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        d = d - hi
    return acc


def _shift_down(x, sh, fill):
    """x shifted ``sh`` sublanes toward higher indices; head ← fill.

    Non-circular (unlike roll) so no wraparound masking is needed."""
    head = jnp.full((sh,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([head, x[: x.shape[0] - sh]], axis=0)


def _minmax_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref,
                   rs_ref, re_ref, data_ref, out_ref, *,
                   block_b, scan_steps, ops, passes):
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b
    ch = data_ref.shape[1]

    @pl.when(c == 0)
    def _():
        for pi, op in enumerate(ops):
            out_ref[:, pi * ch : (pi + 1) * ch] = jnp.full(
                (out_ref.shape[0], ch), _NEUTRAL[op], jnp.float32
            )

    @pl.when((start < end) & (c < num_chunks))
    def _():
        g = start // block_b + c
        chunk_lo = g * block_b
        chunk_hi = chunk_lo + block_b

        rs = rs_ref[0]  # (1, R) row starts
        re = re_ref[0]  # (1, R) row ends
        pos = chunk_lo + jax.lax.broadcasted_iota(jnp.int32, (block_b, 1), 0)

        # Per-edge local row id: #(row starts ≤ pos) − 1; uncovered
        # sublanes (outside this block's edge range) get the sentinel −1
        # so they never merge with a covered run.
        cnt = jnp.sum((pos >= rs).astype(jnp.int32), axis=1, keepdims=True)
        covered = (pos >= start) & (pos < end)
        ids = jnp.where(covered, cnt - 1, -1)  # (B, 1)

        x = data_ref[:].astype(jnp.float32)  # (B, C)
        accs = {op: x for op in ops}
        for k in range(scan_steps):
            sh = 1 << k
            if sh >= block_b:
                break
            ids_sh = _shift_down(ids, sh, jnp.int32(-7))
            same = ids == ids_sh  # (B, 1); monotone ids ⇒ endpoint test ok
            if "min" in accs:
                lo = _shift_down(accs["min"], sh, jnp.inf)
                accs["min"] = jnp.where(same, jnp.minimum(accs["min"], lo), accs["min"])
            if "max" in accs:
                hi = _shift_down(accs["max"], sh, -jnp.inf)
                accs["max"] = jnp.where(same, jnp.maximum(accs["max"], hi), accs["max"])

        # Each intersecting nonempty row's partial sits at its last
        # in-chunk edge: min(row_end, chunk_hi) − 1. One-hot built in
        # (B, R) orientation — no lane↔sublane relayouts.
        valid_r = (re > rs) & (rs < chunk_hi) & (re > chunk_lo)  # (1, R)
        pos_r = jnp.minimum(re, chunk_hi) - 1  # (1, R) absolute position
        onehot = ((pos == pos_r) & valid_r).astype(jnp.float32)  # (B, R)
        # Per-row hit indicator in (R, 1) orientation via the same
        # contraction (0/1 exact in bf16, single pass).
        hits = jax.lax.dot_general(
            onehot, jnp.ones((block_b, 1), jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (R, 1)

        for pi, op in enumerate(ops):
            sel = _select_last(onehot, accs[op], passes)
            contrib = jnp.where(hits > 0.5, sel, _NEUTRAL[op])
            cur = out_ref[:, pi * ch : (pi + 1) * ch]
            comb = jnp.minimum if op == "min" else jnp.maximum
            out_ref[:, pi * ch : (pi + 1) * ch] = comb(cur, contrib)



def _compiler_params():
    """Per-kernel VMEM request matching the block budget (the budget is
    an env knob — see ``mma_tpu.constants.VMEM_BUDGET_MB``); None at the
    default budget (the platform's 16 MB scoped default suffices)."""
    from mma_tpu.constants import VMEM_BUDGET_MB

    if VMEM_BUDGET_MB <= 10:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=(VMEM_BUDGET_MB + 16) * 2**20
    )


def _dropout_keep(seed, pos, lane, rate):
    """Position-keyed dropout mask, (B, C) float32 ∈ {0, 1/(1-rate)}.

    A murmur3-finalizer hash of (seed, absolute edge index, lane) — NOT
    ``pltpu.prng_*`` (no interpret-mode lowering; and the stateful PRNG
    would have to replay identically across the differently-blocked
    forward/backward grids). Position keying makes the mask a pure
    function of (seed, edge, lane): the backward recomputes it exactly,
    any block size. Plain int32 ops (wrapping mult is two's-complement
    on TPU and in interpret mode), VPU-only, zero HBM traffic. Bit
    quality is far beyond what a dropout mask needs.
    """
    x = (pos * jnp.int32(-1640531527) + lane * jnp.int32(-2048144789)
         + seed).astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    u = (x & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    thresh = jnp.int32(int(rate * 2147483648.0))
    keep = (u >= thresh).astype(jnp.float32)
    return keep * jnp.float32(1.0 / (1.0 - rate))


def _minmax_prog_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref, seed_ref,
                        rs_ref, re_ref, hg_ref, c_ref, out_ref, *,
                        block_b, scan_steps, ops, c_passes, rate,
                        has_dropout):
    """Fused min/max EDGE PROGRAM forward: message build + N2 dropout +
    segmented reduce in one pass.

    ``x_e = m_e ⊙ (hg_e + c[dst_e])`` then the doubling-scan min/max —
    ``c`` rows are block-resident (dst rows ARE the output block's
    rows), selected per edge by an exact 3-term one-hot MXU select, so
    the (E, C) message tensor never exists in HBM; ``m`` is the
    position-keyed dropout mask (torch ``F.dropout`` zeros participate
    in min/max as 0 — reference semantics, the mask multiplies AFTER
    the add). Replaces the reference's message + ``torch_scatter``
    reduce pair (``graph_regression/mma_conv.py:138-176``) as one
    differentiable unit.
    """
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    num_chunks = pl.cdiv(end, block_b) - start // block_b
    ch = hg_ref.shape[1]

    @pl.when(c == 0)
    def _():
        for pi, op in enumerate(ops):
            out_ref[:, pi * ch : (pi + 1) * ch] = jnp.full(
                (out_ref.shape[0], ch), _NEUTRAL[op], jnp.float32
            )

    @pl.when((start < end) & (c < num_chunks))
    def _():
        g = start // block_b + c
        chunk_lo = g * block_b
        chunk_hi = chunk_lo + block_b
        rs = rs_ref[0]  # (1, R)
        re = re_ref[0]
        pos = chunk_lo + jax.lax.broadcasted_iota(jnp.int32, (block_b, 1), 0)
        cnt = jnp.sum((pos >= rs).astype(jnp.int32), axis=1, keepdims=True)
        covered = (pos >= start) & (pos < end)
        ids = jnp.where(covered, cnt - 1, -1)  # (B, 1)
        block_r = out_ref.shape[0]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_r), 1)
        exp_onehot = (ids == r_iota).astype(jnp.float32)  # (B, R)

        def sel(terms):
            acc = jnp.zeros((block_b, terms[0].shape[1]), jnp.float32)
            for hi in terms:
                acc += jax.lax.dot_general(
                    exp_onehot, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            return acc

        x = hg_ref[:].astype(jnp.float32) + sel(
            _split_terms(c_ref[:], c_passes)
        )
        if has_dropout:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
            x = x * _dropout_keep(seed_ref[0], pos, lane, rate)

        accs = {op: x for op in ops}
        for k in range(scan_steps):
            sh = 1 << k
            if sh >= block_b:
                break
            ids_sh = _shift_down(ids, sh, jnp.int32(-7))
            same = ids == ids_sh
            if "min" in accs:
                lo = _shift_down(accs["min"], sh, jnp.inf)
                accs["min"] = jnp.where(same, jnp.minimum(accs["min"], lo), accs["min"])
            if "max" in accs:
                hi = _shift_down(accs["max"], sh, -jnp.inf)
                accs["max"] = jnp.where(same, jnp.maximum(accs["max"], hi), accs["max"])

        valid_r = (re > rs) & (rs < chunk_hi) & (re > chunk_lo)  # (1, R)
        pos_r = jnp.minimum(re, chunk_hi) - 1
        onehot = ((pos == pos_r) & valid_r).astype(jnp.float32)  # (B, R)
        hits = jax.lax.dot_general(
            onehot, jnp.ones((block_b, 1), jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (R, 1)
        for pi, op in enumerate(ops):
            s = _select_last(onehot, accs[op], 3)
            contrib = jnp.where(hits > 0.5, s, _NEUTRAL[op])
            cur = out_ref[:, pi * ch : (pi + 1) * ch]
            comb = jnp.minimum if op == "min" else jnp.maximum
            out_ref[:, pi * ch : (pi + 1) * ch] = comb(cur, contrib)


def _minmax_prog_bwd_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref,
                            nreal_ref, seed_ref, rs_ref, re_ref, hg_ref,
                            c_ref, out_ref, ct_ref, grad_ref, dc_ref,
                            hit_before, *, block_b, scan_steps, ops,
                            passes, c_passes, rate, has_dropout):
    """Backward of the fused min/max edge program, one edge pass.

    Recomputes ``x = m ⊙ (hg + c[dst])`` exactly (the c-select is a pure
    one-hot selection of exact 3-term bf16 splits — no accumulation, so
    recompute is bitwise; the mask is position-keyed), routes each
    cotangent to the FIRST hit as in ``_minmax_bwd_kernel``, and emits

    - ``grad`` — per-edge ``dhg = routed_ct ⊙ m`` (the payload the
      src-keyed CSC reduce and the edge-feature VJP consume),
    - ``dc`` — dst-keyed reduction of the same, block-accumulated
      (dst rows are block-resident; no XLA segment-sum pass).
    """
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    n_real = nreal_ref[0]
    num_chunks = pl.cdiv(end, block_b) - start // block_b
    ch = hg_ref.shape[1]

    @pl.when(c == 0)
    def _():
        hit_before[:] = jnp.zeros_like(hit_before)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        g = start // block_b + c
        chunk_lo = g * block_b
        rs = rs_ref[0]
        re = re_ref[0]
        pos = chunk_lo + jax.lax.broadcasted_iota(jnp.int32, (block_b, 1), 0)
        cnt = jnp.sum((pos >= rs).astype(jnp.int32), axis=1, keepdims=True)
        covered = (pos >= start) & (pos < end)
        ids = jnp.where(covered, cnt - 1, -1)
        block_r = out_ref.shape[0]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_r), 1)
        exp_onehot = (ids == r_iota).astype(jnp.float32)
        shared_start = (c == 0) & (start % block_b != 0)

        def sel(terms):
            acc = jnp.zeros((block_b, terms[0].shape[1]), jnp.float32)
            for hi in terms:
                acc += jax.lax.dot_general(
                    exp_onehot, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            return acc

        # Exact recompute of the forward's x.
        x = hg_ref[:].astype(jnp.float32) + sel(
            _split_terms(c_ref[:], c_passes)
        )
        m = None
        if has_dropout:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
            m = _dropout_keep(seed_ref[0], pos, lane, rate)
            x = x * m
        out_e = sel(_split_terms(out_ref[:], 3))  # exact fwd-output select
        ct_e = sel(_split_terms(ct_ref[:], passes))
        real = covered & (pos < n_real)

        grad = jnp.zeros((block_b, ch), jnp.float32)
        new_counts = []
        for pi, _op in enumerate(ops):
            sl = slice(pi * ch, (pi + 1) * ch)
            hit = ((x == out_e[:, sl]) & real).astype(jnp.float32)
            incl = hit
            for k in range(scan_steps):
                sh = 1 << k
                if sh >= block_b:
                    break
                ids_sh = _shift_down(ids, sh, jnp.int32(-7))
                same = ids == ids_sh
                lo = _shift_down(incl, sh, 0.0)
                incl = jnp.where(same, jnp.maximum(incl, lo), incl)
            ids_sh1 = _shift_down(ids, 1, jnp.int32(-7))
            excl = jnp.where(ids == ids_sh1, _shift_down(incl, 1, 0.0), 0.0)
            before_e = sel([hit_before[:, sl]])
            first = hit * (1.0 - jnp.minimum(excl, 1.0)) * (before_e <= 0.5)
            grad += ct_e[:, sl] * first
            new_counts.append(jax.lax.dot_general(
                exp_onehot, hit, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ))
        hit_before[:] += (jnp.concatenate(new_counts, axis=1)
                          if len(ops) > 1 else new_counts[0])

        if has_dropout:
            grad = grad * m
        # dc: dst-keyed reduce of grad — dst rows are block-resident.
        # grad has ≤ P nonzeros per (row-run, channel), so the 3-term
        # split contraction is a near-pure selection-sum (≈ f32 exact).
        dc_acc = jnp.zeros((block_r, ch), jnp.float32)
        gterm = grad
        for _ in range(3):
            hi = gterm.astype(jnp.bfloat16).astype(jnp.float32)
            dc_acc += jax.lax.dot_general(
                exp_onehot, hi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            gterm = gterm - hi
        dc_ref[:] += dc_acc

        col_iota = jax.lax.broadcasted_iota(jnp.int32, (block_b, 1), 0)
        covered_col = ((chunk_lo + col_iota >= start)
                       & (chunk_lo + col_iota < end))
        prev = grad_ref[:]
        grad_ref[:] = jnp.where(
            covered_col, grad, jnp.where(shared_start, prev, 0.0)
        )


def _minmax_bwd_kernel(bstep_ref, cstep_ref, starts_ref, ends_ref, nreal_ref,
                       rs_ref, re_ref, data_ref, out_ref, ct_ref, grad_ref,
                       hit_before, *, block_b, scan_steps, ops, passes,
                       data_passes):
    """Backward of the segmented min/max, dst orientation, one edge pass.

    Routes each (row, channel, op) cotangent to the FIRST edge whose value
    equals the segment optimum — torch_scatter's argmin/argmax routing
    (``/root/reference/graph_regression/mma_conv.py:166-172`` backward),
    a valid subgradient. Mechanics per chunk:

    - ``out[dst]``/``ct[dst]`` come from the block-resident rows via a
      full-expansion one-hot MXU select. The forward-output select uses
      an exact 3-term bf16 split (bf16 terms carry disjoint 8-bit
      mantissa windows of the f32 value and each one-hot pass selects a
      single term with no accumulation), so the ``data == out[dst]`` hit
      test is an EXACT f32 comparison; bf16 data needs one term.
    - first-in-chunk hit: segmented exclusive prefix-OR (the same
      endpoint-test doubling scan as the forward, max over {0,1}).
    - first-across-chunks: ``hit_before`` (R, P·C) scratch persists
      across the row block's sequential grid steps and accumulates each
      chunk's per-row hit counts; a chunk's first hit only wins if no
      earlier chunk hit (scratch is zeroed at each block's first step).
    - padding edges (index ≥ n_real) are excluded from hits — their data
      rows are zeros, which CAN tie a real optimum at 0.0.
    """
    i = pl.program_id(0)
    r = bstep_ref[i]
    c = cstep_ref[i]
    start, end = starts_ref[r], ends_ref[r]
    n_real = nreal_ref[0]
    num_chunks = pl.cdiv(end, block_b) - start // block_b
    ch = data_ref.shape[1]

    @pl.when(c == 0)
    def _():
        hit_before[:] = jnp.zeros_like(hit_before)

    @pl.when((start < end) & (c < num_chunks))
    def _():
        g = start // block_b + c
        chunk_lo = g * block_b
        rs = rs_ref[0]  # (1, R) row starts
        re = re_ref[0]  # (1, R) row ends
        pos = chunk_lo + jax.lax.broadcasted_iota(jnp.int32, (block_b, 1), 0)
        cnt = jnp.sum((pos >= rs).astype(jnp.int32), axis=1, keepdims=True)
        covered = (pos >= start) & (pos < end)
        ids = jnp.where(covered, cnt - 1, -1)  # (B, 1) local row id
        block_r = out_ref.shape[0]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_r), 1)
        exp_onehot = (ids == r_iota).astype(jnp.float32)  # (B, R)
        shared_start = (c == 0) & (start % block_b != 0)

        def sel(terms):
            acc = jnp.zeros((block_b, terms[0].shape[1]), jnp.float32)
            for hi in terms:
                acc += jax.lax.dot_general(
                    exp_onehot, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            return acc

        out_e = sel(_split_terms(out_ref[:], data_passes))  # exact select
        ct_e = sel(_split_terms(ct_ref[:], passes))
        x = data_ref[:].astype(jnp.float32)  # (B, C)
        real = covered & (pos < n_real)  # (B, 1)

        grad = jnp.zeros((block_b, ch), jnp.float32)
        new_counts = []
        for pi, _op in enumerate(ops):
            sl = slice(pi * ch, (pi + 1) * ch)
            hit = ((x == out_e[:, sl]) & real).astype(jnp.float32)  # (B, C)
            # Exclusive prefix-OR within each run (doubling scan; the
            # endpoint id test is valid because ids are monotone).
            incl = hit
            for k in range(scan_steps):
                sh = 1 << k
                if sh >= block_b:
                    break
                ids_sh = _shift_down(ids, sh, jnp.int32(-7))
                same = ids == ids_sh
                lo = _shift_down(incl, sh, 0.0)
                incl = jnp.where(same, jnp.maximum(incl, lo), incl)
            ids_sh1 = _shift_down(ids, 1, jnp.int32(-7))
            excl = jnp.where(ids == ids_sh1, _shift_down(incl, 1, 0.0), 0.0)
            # Hits in earlier chunks of this row win.
            before_e = sel([hit_before[:, sl]])  # counts ≤ B, exact bf16?
            first = hit * (1.0 - jnp.minimum(excl, 1.0)) * (before_e <= 0.5)
            grad += ct_e[:, sl] * first
            # Row-keyed hit counts for the scratch update (0/1 data —
            # single exact pass).
            new_counts.append(jax.lax.dot_general(
                exp_onehot, hit, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ))  # (R, C)
        hit_before[:] += (jnp.concatenate(new_counts, axis=1)
                          if len(ops) > 1 else new_counts[0])

        col_iota = jax.lax.broadcasted_iota(jnp.int32, (block_b, 1), 0)
        covered_col = ((chunk_lo + col_iota >= start)
                       & (chunk_lo + col_iota < end))
        prev = grad_ref[:]
        grad_ref[:] = jnp.where(
            covered_col, grad, jnp.where(shared_start, prev, 0.0)
        )


@functools.partial(
    jax.jit,
    static_argnames=("block_r", "block_b", "interpret", "passes", "ops",
                     "scan_steps"),
)
def _fused_segment_minmax(data, row_ptr, *, block_r, block_b, interpret,
                          passes, ops, scan_steps):
    e_pad, ch = data.shape
    assert e_pad % block_b == 0, (e_pad, block_b)
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)

    # Per-block row-pointer slices (row starts / row ends), padded past n
    # with empty rows at e_pad so valid_r is False for them.
    n_rows = int(num_blocks) * block_r
    rp_pad = jnp.pad(row_ptr, (0, n_rows + 1 - row_ptr.shape[0]),
                     constant_values=e_pad)
    # (num_blocks, 1, R) so the (1, 1, R) blocks match the trailing
    # array dims (TPU block-shape constraint).
    rs2d = rp_pad[:n_rows].reshape(num_blocks, 1, block_r)
    re2d = rp_pad[1 : n_rows + 1].reshape(num_blocks, 1, block_r)

    def chunk_index(i, bstep, cstep, s, e):
        g = s[bstep[i]] // block_b + cstep[i]
        return jnp.clip(g, 0, num_chunks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec((1, 1, block_r), lambda i, b, c, s, e: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_r), lambda i, b, c, s, e: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, ch),
                lambda i, b, c, s, e: (chunk_index(i, b, c, s, e), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_r, len(ops) * ch), lambda i, b, c, s, e: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _minmax_kernel, block_b=block_b, scan_steps=scan_steps,
            ops=ops, passes=passes,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, len(ops) * ch), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(block_of, chunk_of, starts, ends, rs2d, re2d, data)[:n]


@functools.partial(
    jax.jit,
    static_argnames=("block_r", "block_b", "interpret", "passes",
                     "data_passes", "ops", "scan_steps"),
)
def _fused_segment_minmax_bwd(data, out, ct, row_ptr, n_real, *, block_r,
                              block_b, interpret, passes, data_passes, ops,
                              scan_steps):
    e_pad, ch = data.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    n_rows = int(num_blocks) * block_r
    rp_pad = jnp.pad(row_ptr, (0, n_rows + 1 - row_ptr.shape[0]),
                     constant_values=e_pad)
    rs2d = rp_pad[:n_rows].reshape(num_blocks, 1, block_r)
    re2d = rp_pad[1 : n_rows + 1].reshape(num_blocks, 1, block_r)
    pc = len(ops) * ch
    out_p = jnp.pad(out, ((0, n_rows - out.shape[0]), (0, 0)))
    # ±inf (empty rows' neutral) would turn the bf16 split into NaNs that
    # poison the one-hot select; those rows have no edges, so zero them.
    out_p = jnp.where(jnp.isfinite(out_p), out_p, 0.0)
    ct_p = jnp.pad(ct, ((0, n_rows - ct.shape[0]), (0, 0)))

    def chunk_index(i, bstep, cstep, s, e, nr):
        g = s[bstep[i]] // block_b + cstep[i]
        return jnp.clip(g, 0, num_chunks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec((1, 1, block_r),
                         lambda i, b, c, s, e, nr: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_r),
                         lambda i, b, c, s, e, nr: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, ch),
                lambda i, b, c, s, e, nr: (chunk_index(i, b, c, s, e, nr), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, pc), lambda i, b, c, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, pc), lambda i, b, c, s, e, nr: (b[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, ch),
            lambda i, b, c, s, e, nr: (chunk_index(i, b, c, s, e, nr), 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_r, pc), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _minmax_bwd_kernel, block_b=block_b, scan_steps=scan_steps,
            ops=ops, passes=passes, data_passes=data_passes,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, ch), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(block_of, chunk_of, starts, ends, n_real, rs2d, re2d, data, out_p, ct_p)


@functools.partial(
    jax.jit,
    static_argnames=("block_r", "block_b", "interpret", "ops", "scan_steps",
                     "c_passes", "rate", "has_dropout"),
)
def _fused_minmax_prog(hg, c, row_ptr, seed, *, block_r, block_b, interpret,
                       ops, scan_steps, c_passes, rate, has_dropout):
    e_pad, ch = hg.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    n_rows = int(num_blocks) * block_r
    rp_pad = jnp.pad(row_ptr, (0, n_rows + 1 - row_ptr.shape[0]),
                     constant_values=e_pad)
    rs2d = rp_pad[:n_rows].reshape(num_blocks, 1, block_r)
    re2d = rp_pad[1 : n_rows + 1].reshape(num_blocks, 1, block_r)
    c_p = jnp.pad(c, ((0, n_rows - c.shape[0]), (0, 0)))

    def chunk_index(i, bstep, cstep, s, e, sd):
        g = s[bstep[i]] // block_b + cstep[i]
        return jnp.clip(g, 0, num_chunks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec((1, 1, block_r),
                         lambda i, b, c_, s, e, sd: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_r),
                         lambda i, b, c_, s, e, sd: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, ch),
                lambda i, b, c_, s, e, sd: (chunk_index(i, b, c_, s, e, sd), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ch), lambda i, b, c_, s, e, sd: (b[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_r, len(ops) * ch), lambda i, b, c_, s, e, sd: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _minmax_prog_kernel, block_b=block_b, scan_steps=scan_steps,
            ops=ops, c_passes=c_passes, rate=rate, has_dropout=has_dropout,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, len(ops) * ch), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(block_of, chunk_of, starts, ends, seed, rs2d, re2d, hg, c_p)[:n]


@functools.partial(
    jax.jit,
    static_argnames=("block_r", "block_b", "interpret", "ops", "scan_steps",
                     "passes", "c_passes", "rate", "has_dropout"),
)
def _fused_minmax_prog_bwd(hg, c, out, ct, row_ptr, n_real, seed, *, block_r,
                           block_b, interpret, ops, scan_steps, passes,
                           c_passes, rate, has_dropout):
    e_pad, ch = hg.shape
    assert e_pad % block_b == 0
    (n, num_blocks, num_chunks, total_steps, starts, ends, block_of, chunk_of
     ) = _grid_and_prefetch(row_ptr, e_pad, block_r, block_b)
    n_rows = int(num_blocks) * block_r
    rp_pad = jnp.pad(row_ptr, (0, n_rows + 1 - row_ptr.shape[0]),
                     constant_values=e_pad)
    rs2d = rp_pad[:n_rows].reshape(num_blocks, 1, block_r)
    re2d = rp_pad[1 : n_rows + 1].reshape(num_blocks, 1, block_r)
    pc = len(ops) * ch
    c_p = jnp.pad(c, ((0, n_rows - c.shape[0]), (0, 0)))
    out_p = jnp.pad(out, ((0, n_rows - out.shape[0]), (0, 0)))
    out_p = jnp.where(jnp.isfinite(out_p), out_p, 0.0)
    ct_p = jnp.pad(ct, ((0, n_rows - ct.shape[0]), (0, 0)))

    def chunk_index(i, bstep, cstep, s, e, nr, sd):
        g = s[bstep[i]] // block_b + cstep[i]
        return jnp.clip(g, 0, num_chunks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec((1, 1, block_r),
                         lambda i, b, c_, s, e, nr, sd: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_r),
                         lambda i, b, c_, s, e, nr, sd: (b[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, ch),
                lambda i, b, c_, s, e, nr, sd: (
                    chunk_index(i, b, c_, s, e, nr, sd), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ch),
                         lambda i, b, c_, s, e, nr, sd: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, pc),
                         lambda i, b, c_, s, e, nr, sd: (b[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, pc),
                         lambda i, b, c_, s, e, nr, sd: (b[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_b, ch),
                lambda i, b, c_, s, e, nr, sd: (
                    chunk_index(i, b, c_, s, e, nr, sd), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_r, ch),
                         lambda i, b, c_, s, e, nr, sd: (b[i], 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((block_r, pc), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _minmax_prog_bwd_kernel, block_b=block_b, scan_steps=scan_steps,
            ops=ops, passes=passes, c_passes=c_passes, rate=rate,
            has_dropout=has_dropout,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, ch), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, ch), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(block_of, chunk_of, starts, ends, n_real, seed, rs2d, re2d, hg, c_p,
      out_p, ct_p)


def _adaptive_block_b(block_b, per_row_bytes, budget=None):
    from mma_tpu.constants import VMEM_BUDGET_MB

    budget = budget or VMEM_BUDGET_MB * 2**20
    bb = block_b
    while bb > 128 and bb * per_row_bytes > budget:
        bb //= 2
    return bb


def _adaptive_block_r(ch, p, block_r):
    """block_r stays at the caller's value (128): the one-hot selects
    cost O(E · block_r · C) MXU work — growing the row block multiplies
    per-chunk select passes and measured STRICTLY worse on TPU (ZINC
    bf16 train 3.14M → 2.45M edges/s at block_r=512) even though it cuts
    row-block grid steps. Returns (block_r, row-resident bytes) so
    block_b sizing can subtract the row-block live set."""
    row_cost = 4 * ch * (5 + 6 * p)
    return block_r, block_r * row_cost


def fused_minmax_edge_program(
    c: jnp.ndarray,
    hg: jnp.ndarray,
    graph: Graph,
    ops: tuple = ("min", "max"),
    *,
    seed: "jnp.ndarray | None" = None,
    rate: float = 0.5,
    max_run: "int | None" = None,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "highest",
) -> jnp.ndarray:
    """Fused min/max edge program: message build + dropout + reduce.

    ``out[i, p·C:(p+1)·C] = op_p over {e: dst_e = i} of
    m_e ⊙ (hg_e + c[i])`` — ``c`` (N, C) is the dst-side node
    projection (block-resident in-kernel; the (E, C) message tensor
    never reaches HBM), ``hg`` (E, C) the per-edge remainder
    (src-gather + bias + edge term, built by one XLA fusion), ``m`` the
    N2 dropout mask (``seed`` (1,) int32 enables it; position-keyed
    hash, exactly recomputed in the backward — the pattern differs from
    the XLA path's ``jax.random`` one, as any two rng streams do).

    Backward: one fused pass emits the routed per-edge payload
    ``dhg`` (feeds the CSC src reduce + edge-feature VJPs upstream) and
    the block-accumulated ``dc`` — no XLA scatter anywhere. Replaces
    ``/root/reference/graph_regression/mma_conv.py:138-176`` (message +
    scatter reduce) as one differentiable unit.
    """
    e, ch = hg.shape
    assert e == graph.n_edge and c.shape[1] == ch, (hg.shape, c.shape)
    assert all(o in ("min", "max") for o in ops) and len(ops) >= 1
    has_dropout = seed is not None
    seed_arr = (seed.reshape(1).astype(jnp.int32) if has_dropout
                else jnp.zeros(1, jnp.int32))
    is_bf16 = hg.dtype == jnp.bfloat16
    passes = 1 if is_bf16 else _PASSES[precision]
    # The backward's hit test needs the recompute EXACT: the c-select
    # must reconstruct c bitwise (pure selection of split terms).
    c_passes = 1 if c.dtype == jnp.bfloat16 else 3
    from mma_tpu.constants import VMEM_BUDGET_MB

    p = len(ops)
    block_r, row_bytes = _adaptive_block_r(ch, p, block_r)
    rem = VMEM_BUDGET_MB * 2**20 - row_bytes
    bb_fwd = _adaptive_block_b(block_b, 4 * ch * (5 + 3 * p), budget=rem)
    bb_bwd = _adaptive_block_b(block_b, 4 * ch * (8 + 5 * p), budget=rem)
    fwd_scan = _scan_steps_for(graph, max_run, bb_fwd)
    bwd_scan = _scan_steps_for(graph, max_run, bb_bwd)
    interpret = jax.devices()[0].platform != "tpu"

    def _run(c_, hg_):
        (hg_p,), _ = _pad_edges([hg_], graph.dst, e, graph.n_node, bb_fwd)
        return _fused_minmax_prog(
            hg_p, c_.astype(jnp.float32), graph.row_ptr, seed_arr,
            block_r=block_r, block_b=bb_fwd, interpret=interpret, ops=ops,
            scan_steps=fwd_scan, c_passes=c_passes, rate=rate,
            has_dropout=has_dropout,
        )

    @jax.custom_vjp
    def _op(c_, hg_):
        return _run(c_, hg_)

    def _fwd(c_, hg_):
        out = _run(c_, hg_)
        return out, (c_, hg_, out, graph, seed_arr)

    def _bwd(res, ct):
        c_, hg_, out, g, sd = res
        (hg_p,), _ = _pad_edges([hg_], g.dst, e, g.n_node, bb_bwd)
        n_real = g.num_edges.astype(jnp.int32).reshape(1)
        grad, dc = _fused_minmax_prog_bwd(
            hg_p, c_.astype(jnp.float32), out, ct.astype(jnp.float32),
            g.row_ptr, n_real, sd,
            block_r=block_r, block_b=bb_bwd, interpret=interpret, ops=ops,
            scan_steps=bwd_scan, passes=passes, c_passes=c_passes,
            rate=rate, has_dropout=has_dropout,
        )
        return (dc[: c.shape[0]].astype(c.dtype),
                grad[:e].astype(hg.dtype))

    _op.defvjp(_fwd, _bwd)
    return _op(c, hg)


def _scan_steps_for(graph: Graph, max_run, block_b) -> int:
    cap = block_b if max_run is None else min(int(max_run), block_b)
    steps = 0
    while (1 << steps) < cap:
        steps += 1
    return steps


def fused_segment_minmax(
    data: jnp.ndarray,
    graph: Graph,
    ops: tuple = ("min", "max"),
    *,
    max_run: "int | None" = None,
    block_r: int = BLOCK_R,
    block_b: int = BLOCK_B,
    precision: str = "highest",
) -> jnp.ndarray:
    """Segmented min/max of ``data`` (E, C) over ``graph.dst`` → (N, P·C).

    ``ops`` ⊆ {"min", "max"}; output lanes ``[p·C, (p+1)·C)`` hold op
    ``p``'s reduction. Both ops share one pass over the edge data. Empty
    rows yield the op's neutral element (±inf) — callers select them
    away by degree (the conv layers do ``where(deg > 0, ·, 0)``).
    Padding edges contribute only to their own (padding-node) row.

    ``max_run``: static upper bound on any node's in-degree; caps the
    scan at ``ceil(log2(min(max_run, block_b)))`` doubling steps. Wrong
    (too small) values give wrong results — callers derive it from
    dataset metadata (ZINC: 8) or leave None (full ``log2(block_b)``).

    Differentiable, with a fused Pallas backward: the VJP routes each
    op's cotangent to the FIRST edge whose value equals the segment
    optimum (torch_scatter's argmin/argmax routing — a valid
    subgradient) in ONE edge pass: in-kernel exact hit test against the
    forward output, segmented prefix-OR scan for the first in-chunk hit,
    cross-chunk first-hit via a persistent row-block scratch. No XLA
    scatter and no nties segment-sum round trip.
    """
    e, ch = data.shape
    assert e == graph.n_edge, (data.shape, graph.n_edge)
    assert all(o in ("min", "max") for o in ops) and len(ops) >= 1
    is_bf16 = data.dtype == jnp.bfloat16
    passes = 1 if is_bf16 else _PASSES[precision]
    # The backward's hit test needs the fwd-output select to be EXACT:
    # 3 bf16 terms reconstruct any f32; bf16 values need one.
    data_passes = 1 if is_bf16 else 3
    scan_steps = _scan_steps_for(graph, max_run, block_b)
    # The bwd kernel's live VMEM set is ~(6 + 5·P) f32 arrays of
    # (block_b, ch) (selects, scan temporaries, grad, hit masks) — at
    # ch=375, P=2, block_b=1024 that's ~24.8 MB vs the 16 MB default
    # scoped limit. Blocks size themselves against VMEM_BUDGET_MB
    # (launchers that raise the XLA scoped limit export a bigger budget;
    # fewer, bigger steps — per-step overhead dominates wide channels).
    block_r, row_bytes = _adaptive_block_r(ch, len(ops), block_r)
    from mma_tpu.constants import VMEM_BUDGET_MB

    block_b_bwd = _adaptive_block_b(
        block_b, 4 * ch * (6 + 5 * len(ops)),
        budget=VMEM_BUDGET_MB * 2**20 - row_bytes,
    )
    bwd_scan_steps = _scan_steps_for(graph, max_run, block_b_bwd)
    interpret = jax.devices()[0].platform != "tpu"

    def _run(d):
        (d,), _ = _pad_edges([d], graph.dst, e, graph.n_node, block_b)
        return _fused_segment_minmax(
            d, graph.row_ptr, block_r=block_r, block_b=block_b,
            interpret=interpret, passes=passes, ops=ops,
            scan_steps=scan_steps,
        )

    @jax.custom_vjp
    def _op(d):
        return _run(d)

    def _fwd(d):
        out = _run(d)
        # graph in residuals, not closure (shard_map tracer safety).
        return out, (d, out, graph)

    def _bwd(res, ct):
        d, out, g = res
        (d_p,), _ = _pad_edges([d], g.dst, e, g.n_node, block_b_bwd)
        n_real = g.num_edges.astype(jnp.int32).reshape(1)
        grad = _fused_segment_minmax_bwd(
            d_p, out, ct.astype(jnp.float32), g.row_ptr, n_real,
            block_r=block_r, block_b=block_b_bwd, interpret=interpret,
            passes=passes, data_passes=data_passes, ops=ops,
            scan_steps=bwd_scan_steps,
        )
        return (grad[:e].astype(d.dtype),)

    _op.defvjp(_fwd, _bwd)
    return _op(data)
