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
    )(block_of, chunk_of, starts, ends, n_real, rs2d, re2d, data, out_p, ct_p)


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
        return out, (d, out)

    def _bwd(res, ct):
        d, out = res
        (d_p,), _ = _pad_edges([d], graph.dst, e, graph.n_node, block_b)
        n_real = graph.num_edges.astype(jnp.int32).reshape(1)
        grad = _fused_segment_minmax_bwd(
            d_p, out, ct.astype(jnp.float32), graph.row_ptr, n_real,
            block_r=block_r, block_b=block_b, interpret=interpret,
            passes=passes, data_passes=data_passes, ops=ops,
            scan_steps=scan_steps,
        )
        return (grad[:e].astype(d.dtype),)

    _op.defvjp(_fwd, _bwd)
    return _op(data)
