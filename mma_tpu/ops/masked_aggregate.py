"""Fused-math core of the MMA layer: SDDMM mask logits + K-way masked
segment aggregation, expressed TPU-first.

The reference computes, for every center node ``i`` and neighbor ``j``,
``mask_ij = act([h_i ‖ h_j] @ W_k)`` and reduces ``mask_ij ⊙ h_j`` over
``j`` — as a Python loop over nodes with per-iteration host→device index
uploads (``node_classification/layers.py:205-222`` and 20 clones). Two
re-formulations make this TPU-shaped:

1. **SDDMM decomposition.** ``[h_i ‖ h_j] @ W = h_i @ W_top + h_j @ W_bot``
   with ``W_top = W[:F]``, ``W_bot = W[F:]``. The two projections are
   per-*node* MXU matmuls computed once (``O(N·F²·K)`` FLOPs) and gathered
   per edge, instead of a per-*edge* GEMM (``O(E·F²·K)``). For all K
   aggregators the projections batch into one ``(N, F) × (F, K·F)``
   matmul.

2. **Sum-only segment reduction.** Every usable reference aggregator
   reduces neighbors with a masked *sum* (max/min enter only via the
   center combine — see ``mma_tpu.ops.aggregators``), so one sorted
   ``segment_sum`` over edges serves all K aggregators in a single edge
   pass; an optional Pallas kernel fuses mask + multiply + segment-sum.

Parity knobs (SURVEY §5):

- N1 activation table via ``AggSpec.applies_sigmoid``.
- N2 always-on mask dropout: the caller controls this by passing ``rng``
  (dropout active) or ``rng=None`` (off); the training harness passes rng
  in eval when ``parity_dropout`` is requested.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mma_tpu.graph.container import Graph
from mma_tpu.ops.aggregators import AggSpec
from mma_tpu.ops.segment import segment_sum

_EPS = 1e-5


def mma_mask_projections(h: jnp.ndarray, mask_weights: jnp.ndarray):
    """Per-node mask projections ``c, d``: each ``(N, K·F)`` flat.

    ``mask_weights``: ``(K, 2F, F)`` — one ``[W_top; W_bot]`` per
    aggregator (reference's per-aggregator mask matrices,
    ``node_classification/models.py:23-43``). Per-edge logits are
    ``c[dst] + d[src]``.

    All edge-dimension tensors stay in flat ``(E, K·F)`` layout: with
    small K the ``(E, K, F)`` form has (K, F) minor dims that tile far
    below the TPU-native (8, 128), costing up to 8× memory traffic.
    Aggregator ``k`` owns lanes ``[k·F, (k+1)·F)``.
    """
    k, two_f, f = mask_weights.shape
    w_top = mask_weights[:, : two_f // 2, :]  # (K, F, F)
    w_bot = mask_weights[:, two_f // 2 :, :]
    # One batched MXU matmul each: (N, F) x (F, K*F).
    c = h @ w_top.transpose(1, 0, 2).reshape(f, k * f)
    d = h @ w_bot.transpose(1, 0, 2).reshape(f, k * f)
    return c, d


def mma_mask_logits(h: jnp.ndarray, mask_weights: jnp.ndarray, graph: Graph) -> jnp.ndarray:
    """Per-edge mask logits for K aggregators: ``(E, K·F)`` flat."""
    c, d = mma_mask_projections(h, mask_weights)
    return c[graph.dst] + d[graph.src]


def _sigmoid_lane_pattern(specs: Sequence[AggSpec], activation: str,
                          parity: bool, f: int) -> jnp.ndarray:
    """(K·F,) bool: which flat lanes get the sigmoid (N1 table)."""
    import numpy as np

    pat = np.repeat(
        np.array([s.applies_sigmoid(activation, parity) for s in specs], bool), f
    )
    return jnp.asarray(pat)


def _apply_mask_activation(
    logits: jnp.ndarray,
    specs: Sequence[AggSpec],
    activation: str,
    parity: bool,
) -> jnp.ndarray:
    """logits: (E, K·F) flat."""
    f = logits.shape[1] // len(specs)
    pat = _sigmoid_lane_pattern(specs, activation, parity, f)
    return jnp.where(pat[None, :], jax.nn.sigmoid(logits), logits)


def _ell_masked_aggregate(h_c, mask_weights, pat, graph, spec, k, f,
                          rng, rate, need_s2):
    """K-way masked aggregation over the ELL dense-neighbor layout
    (``mma_tpu.ops.ell``) — the scatter-free path for degree-bounded
    graphs (fanout-bounded sampled subgraphs carry ``graph.ell_hint``).

    Per slot: ``msg = act(c[dst] + d[src]) ⊙ tile(h[src], K)`` then a
    masked sum over the slot axis — all fused XLA elementwise; the only
    random access is one per-slot gather of the ``[d ‖ h]`` node table,
    whose VJP is a sorted CSC segment sum (no scatter). Unlike the fused
    CSR kernels this path also supports N2 mask dropout and the
    std/moment_3 combines without demotion.

    Returns ``(s, s2, cent3)``: the K masked sums (N, K·F); the masked
    sums of squares (or None); and a closure
    ``cent3(idx, mean) -> Σ (msg_k − mean[dst])³`` for moment_3.
    """
    from mma_tpu.ops.ell import ell_gather_nodes_by_src, ell_valid, pad_rows

    n = graph.n_node
    kf = k * f
    t_w = kf + f  # per-slot lane width of the gathered [d ‖ h] table
    c, d = mma_mask_projections(h_c, mask_weights)
    table = jnp.concatenate([d, h_c], axis=1)  # (N, K·F + F)
    parts = ell_gather_nodes_by_src(table, graph, spec)
    valids = ell_valid(graph, spec)
    dropout_on = rng is not None and rate > 0.0
    c32 = c.astype(jnp.float32)
    ranges = list(zip(spec.starts, spec.bounds))
    # ONE rng draw per bucket (sliced per slot) — a draw per slot would
    # instantiate W_b threefry programs per bucket and blow up compile
    # time; the dropout pattern is this path's own rng partition anyway.
    keeps = None
    if dropout_on:
        keys = jax.random.split(rng, len(parts))
        keeps = [
            jax.random.bernoulli(
                keys[bi], 1.0 - rate,
                (parts[bi].shape[0], spec.widths[bi] * kf),
            )
            for bi in range(len(parts))
        ]

    def slot_msg(bi, di):
        """Slot ``di`` of bucket ``bi``: the (R_b, K·F) masked message."""
        s_, b_ = ranges[bi]
        td = parts[bi][:, di * t_w : (di + 1) * t_w].astype(jnp.float32)
        logits = c32[s_:b_] + td[:, :kf]
        mask = jnp.where(pat[None, :], jax.nn.sigmoid(logits), logits)
        if keeps is not None:
            keep = keeps[bi][:, di * kf : (di + 1) * kf]
            mask = jnp.where(keep, mask / (1.0 - rate), 0.0)
        h_e = td[:, kf:]
        h_t = jnp.concatenate([h_e] * k, axis=-1) if k > 1 else h_e
        return mask * h_t

    s1_parts, s2_parts = [], []
    for bi, w in enumerate(spec.widths):
        s1 = s2b = None
        for di in range(w):
            msg = slot_msg(bi, di)
            vd = valids[bi][:, di : di + 1]
            term = jnp.where(vd, msg, 0.0)
            s1 = term if s1 is None else s1 + term
            if need_s2:
                t2 = jnp.where(vd, msg * msg, 0.0)
                s2b = t2 if s2b is None else s2b + t2
        s1_parts.append(s1)
        if need_s2:
            s2_parts.append(s2b)
    s = pad_rows(jnp.concatenate(s1_parts, axis=0), n)
    s2 = (pad_rows(jnp.concatenate(s2_parts, axis=0), n)
          if need_s2 else None)

    def cent3(idx, mean):
        outs = []
        for bi, ((s_, b_), w) in enumerate(zip(ranges, spec.widths)):
            acc = None
            mean_b = mean[s_:b_]
            for di in range(w):
                msg_k = slot_msg(bi, di)[:, idx * f : (idx + 1) * f]
                cent = jnp.where(
                    valids[bi][:, di : di + 1],
                    (msg_k - mean_b) ** 3, 0.0,
                )
                acc = cent if acc is None else acc + cent
            outs.append(acc)
        return pad_rows(jnp.concatenate(outs, axis=0), n)

    return s, s2, cent3


def masked_multi_aggregate(
    h: jnp.ndarray,
    graph: Graph,
    mask_weights: jnp.ndarray,
    specs: Sequence[AggSpec],
    *,
    activation: str = "new_sigmoid",
    parity: bool = True,
    mask_dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
    pallas_bwd_mode: Optional[str] = None,
    axis_name: Optional[str] = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """K-way masked aggregation: returns ``(N, K, F)`` combined outputs.

    For each aggregator ``k``:
    ``S_k[i] = Σ_{e: dst(e)=i} act_k(logits_k[e]) ⊙ h[src(e)]`` followed by
    the spec's center combine. Padding edges contribute the sum-neutral 0.

    ``axis_name``: when set (inside ``shard_map`` with edges partitioned
    along that mesh axis), local partial segment-sums are ``psum``-combined
    across devices before the center combine — every usable aggregator's
    neighbor reduction is a sum, so edge sharding is exact.
    """
    n, f = h.shape
    k = len(specs)
    assert mask_weights.shape == (k, 2 * f, f), (mask_weights.shape, (k, 2 * f, f))

    # Edge-pipeline compute dtype: bfloat16 halves the gather/stream HBM
    # traffic (the layer's bottleneck) and makes the kernel's single MXU
    # pass exact; segment accumulation stays float32 either way. Parity
    # gates use float32.
    h_c = h.astype(compute_dtype)
    dropout_on = rng is not None and mask_dropout_rate > 0.0
    need_moments = any(sp.combine in ("std", "moment_3") for sp in specs)

    # Pallas paths require per-device-local CSR/CSC structure: always
    # present unsharded; under edge sharding only with kernel_structure
    # (signalled by src_perm being carried).
    #
    # PERF CLIFF (documented, by design): mask dropout (N2 parity
    # training) and std/moment_3 combines need per-edge mask/message
    # tensors, so they demote the fully fused edge program to the
    # half-fused path below (materialized (E, K·F) messages + fused
    # segment-sum) — ~2-3× more edge HBM traffic. Deterministic eval and
    # all README-preset aggregators keep the fully fused path.
    pallas_ok = use_pallas and graph.src_perm is not None
    fused_ok = pallas_ok and not dropout_on and not need_moments
    # ELL dense-neighbor path: graphs with a structural degree-bucket
    # layout (``graph.ell_hint`` — fanout-bounded sampled subgraphs) take
    # the scatter-free slot format, which ALSO covers mask dropout and
    # the moment combines (no demotion cliff). Unsharded reductions only.
    ell_ctx = None
    if (use_pallas and axis_name is None and graph.ell_hint is not None
            and graph.chunk_hint is not None):
        from mma_tpu.ops.ell import EllSpec

        spec = EllSpec(
            bounds=tuple(b for b, _ in graph.ell_hint),
            widths=tuple(w for _, w in graph.ell_hint),
        )
        pat = _sigmoid_lane_pattern(specs, activation, parity, f)
        s, s2_ell, cent3 = _ell_masked_aggregate(
            h_c, mask_weights.astype(compute_dtype), pat, graph, spec,
            k, f, rng if dropout_on else None, mask_dropout_rate,
            need_s2=any(sp.combine == "std" for sp in specs),
        )
        msgs = None
        ell_ctx = (s2_ell, cent3)
    elif fused_ok:
        # Fully fused path: gathers + activation + multiply + segment-sum
        # through the Pallas edge program — no (E, K·F) mask/message
        # intermediates in HBM, and every backward scatter runs as a
        # sorted Pallas segment-sum too. The default is the *lean*
        # program (src projection d = h @ W_bot computed in-kernel, so
        # the random gather is tile(h, K) at the fast 128-lane width);
        # an explicit ``pallas_bwd_mode`` selects the wide [d ‖ h]
        # program with that backward strategy (A/B + coverage).
        pat = _sigmoid_lane_pattern(specs, activation, parity, f)
        mw = mask_weights.astype(compute_dtype)
        # Workload-keyed block sizes (sweep-backed; value-exact — see
        # mma_tpu.autotune.choose_blocks).
        from mma_tpu.autotune import choose_blocks

        block_r, block_b = choose_blocks(graph.n_edge, n, lanes=k * f)
        if pallas_bwd_mode is None:
            from mma_tpu.ops.pallas.fused_mma import (
                fused_mma_edge_program_lean,
            )

            w_top = mw[:, :f, :].transpose(1, 0, 2).reshape(f, k * f)
            w_bot = mw[:, f:, :].transpose(1, 0, 2).reshape(f, k * f)
            c = h_c @ w_top
            s = fused_mma_edge_program_lean(
                c, w_bot, h_c, pat, graph, k,
                block_r=block_r, block_b=block_b,
            )
        else:
            from mma_tpu.ops.pallas.fused_mma import fused_mma_edge_program

            c, d = mma_mask_projections(h_c, mw)
            s = fused_mma_edge_program(
                c, d, h_c, pat, graph, k, bwd_mode=pallas_bwd_mode,
                block_r=block_r, block_b=block_b,
            )
        msgs = None
    else:
        logits = mma_mask_logits(h_c, mask_weights.astype(compute_dtype), graph)
        mask = _apply_mask_activation(logits, specs, activation, parity)
        if dropout_on:
            keep = jax.random.bernoulli(rng, 1.0 - mask_dropout_rate, mask.shape)
            mask = jnp.where(keep, mask / (1.0 - mask_dropout_rate), 0.0)

        h_src = jnp.tile(h_c[graph.src], (1, k))  # (E, K·F) per-aggregator
        msgs = mask * h_src
        msgs = jnp.where(graph.edge_mask[:, None], msgs, 0.0)

        if pallas_ok:
            from mma_tpu.ops.pallas.fused_mma import fused_segment_sum

            s = fused_segment_sum(msgs, graph)  # (N, K·F)
        else:
            # Accumulate in f32 regardless of the edge compute dtype.
            s = segment_sum(
                msgs.astype(jnp.float32), graph.dst, n, sorted=True
            )
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    s = s.reshape(n, k, f)

    deg = jnp.maximum(graph.deg, 1.0)[:, None]  # (N, 1), clamped
    outs = []
    if any(sp.combine == "std" for sp in specs):
        if ell_ctx is not None:
            s2 = ell_ctx[0].reshape(n, k, f)
        else:
            msgs_sq = jnp.where(graph.edge_mask[:, None], msgs * msgs, 0.0)
            s2 = segment_sum(msgs_sq.astype(jnp.float32), graph.dst, n, sorted=True)
            if axis_name is not None:
                s2 = jax.lax.psum(s2, axis_name)
            s2 = s2.reshape(n, k, f)
    for idx, sp in enumerate(specs):
        sk = s[:, idx, :]
        if sp.combine == "sum":
            out = h + sk
        elif sp.combine == "mean":
            out = (h + sk) / deg
        elif sp.combine == "max":
            out = jnp.maximum(h, sk)
        elif sp.combine == "min":
            out = jnp.minimum(h, sk)
        elif sp.combine == "passthrough":
            out = sk
        elif sp.combine == "std":
            mean = sk / deg
            mean_sq = s2[:, idx, :] / deg
            out = jnp.sqrt(jax.nn.relu(mean_sq - mean * mean) + _EPS)
        elif sp.combine == "normalized_mean":
            out = sk * jax.lax.rsqrt(deg)
        elif sp.combine == "moment_3":
            # Two-pass central moment: E[(x − μ)³] directly. The one-pass
            # raw-moment form (E[x³] − 3·E[x]·E[x²] + 2·E[x]³) cancels
            # catastrophically — degree-1 nodes have m3 ≡ 0 analytically,
            # and the cube root amplifies the f32 residue to ~1e-2.
            mean = sk / deg
            if ell_ctx is not None:
                s3 = ell_ctx[1](idx, mean)
            else:
                msgs_k = msgs[:, idx * f : (idx + 1) * f]
                cent = jnp.where(
                    graph.edge_mask[:, None], (msgs_k - mean[graph.dst]) ** 3, 0.0
                )
                s3 = segment_sum(cent, graph.dst, n, sorted=True)
                if axis_name is not None:
                    s3 = jax.lax.psum(s3, axis_name)
            m3 = s3 / deg
            # Signed cube root, continuous at 0: m3·(m3²+ε)^(-1/3) equals
            # cbrt(m3) for |m3| ≫ ε and is linear (not ±ε^(1/3)) at m3≈0 —
            # sign(m3)·(|m3|+ε)^(1/3) jumps by 2·ε^(1/3) on rounding noise.
            out = m3 * (m3 * m3 + _EPS) ** (-1.0 / 3.0)
        else:
            raise ValueError(f"unknown combine {sp.combine!r}")
        outs.append(out)
    return jnp.stack(outs, axis=1)  # (N, K, F)
