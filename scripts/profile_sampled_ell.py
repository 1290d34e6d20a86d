"""Bisect the sampled-regime ELL slowdown: time masked_multi_aggregate
(half-fused CSR vs ELL) in isolation at ogbn-like subgraph shapes,
chained dispatches, then bisect the ELL unit (gather only / +mask math /
+dropout)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t_chain(f, *args, iters=10, warmup=2):
    carry = jnp.zeros((8, 128), jnp.float32)
    for _ in range(warmup):
        carry = f(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = f(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from mma_tpu.data.sampling import NeighborSampler

    rs = np.random.RandomState(3)
    n = 400_000
    m = n * 40
    a = (rs.rand(m) ** 2 * n).astype(np.int64)
    b = rs.randint(0, n, size=m)
    keep = a != b
    src = np.concatenate([a[keep], b[keep]]).astype(np.int32)
    dst = np.concatenate([b[keep], a[keep]]).astype(np.int32)
    sampler = NeighborSampler.from_host_arrays(src, dst, n, (10, 10, 5), seed=4)
    seeds = rs.randint(0, n, 1024)

    hop_max = np.zeros(4, np.int64)
    max_edges = 0
    for _ in range(2):
        hc, _, s_c, _ = sampler._structure(
            rs.randint(0, n, 1024),
            sampler._structural_node_bound(1024),
            sampler._structural_edge_bound(1024),
        )
        hop_max = np.maximum(hop_max, hc)
        max_edges = max(max_edges, len(s_c))
    hop_pads = tuple(int(-(-int(c * 1.5) // 256) * 256) if i else 1024
                     for i, c in enumerate(hop_max))
    n_node_pad = -(-(sum(hop_pads) + 1) // 8192) * 8192
    n_edge_pad = -(-int(max_edges * 1.5) // 8192) * 8192
    log(f"pads: hops {hop_pads} nodes {n_node_pad} edges {n_edge_pad}")

    b_ell = sampler.sample(seeds, n_node_pad=n_node_pad,
                           n_edge_pad=n_edge_pad, hop_node_pads=hop_pads)
    b_csr = sampler.sample(seeds, n_node_pad=n_node_pad,
                           n_edge_pad=n_edge_pad)
    g_ell, g_csr = b_ell.graph, b_csr.graph
    log(f"subgraph: nodes {b_ell.num_nodes} edges "
        f"{int(np.asarray(g_ell.num_edges))}")

    from mma_tpu.nn.mma_layer import MMALayer

    f_hid = 64
    layer = MMALayer(f_hid, 47, ("mean", "mean2"), compute_dtype="bfloat16")
    params = layer.init(jax.random.PRNGKey(0))
    h = jnp.asarray(rs.randn(n_node_pad, f_hid).astype(np.float32))
    ones = jnp.ones((8, 128), jnp.float32) * 1e-30

    def unit(g):
        def loss(h_, rng):
            out = layer.apply(params, h_, g, rng=rng, use_pallas=True)
            return jnp.sum(jnp.where(g.node_mask[:, None], out, 0.0) ** 2)
        return loss

    for name, g in (("csr", g_csr), ("ell", g_ell)):
        lo = unit(g)

        @jax.jit
        def fwd_c(carry, h_, lo=lo):
            h_ = h_ + carry[0, 0] * 0
            return carry + lo(h_, jax.random.PRNGKey(1)) * ones

        @jax.jit
        def grad_c(carry, h_, lo=lo):
            h_ = h_ + carry[0, 0] * 0
            return carry + jnp.sum(
                jax.grad(lambda hh: lo(hh, jax.random.PRNGKey(1)))(h_)
            ) * ones

        log(f"{name} layer fwd:  {t_chain(fwd_c, h):7.2f} ms")
        log(f"{name} layer grad: {t_chain(grad_c, h):7.2f} ms")

    # --- bisect the ELL aggregate ------------------------------------
    from mma_tpu.ops.ell import (
        EllSpec, ell_gather_nodes_by_src, ell_valid, masked_slot_sum,
        pad_rows,
    )
    from mma_tpu.ops.masked_aggregate import mma_mask_projections

    spec = EllSpec.from_hint(g_ell.ell_hint)
    valids = ell_valid(g_ell, spec)
    kf = 2 * f_hid
    mw = params["masks"].astype(jnp.bfloat16)

    def gather_sum_only(h_):
        h_c = h_.astype(jnp.bfloat16)
        c, d = mma_mask_projections(h_c, mw)
        table = jnp.concatenate([d, h_c], axis=1)
        parts = ell_gather_nodes_by_src(table, g_ell, spec)
        acc = [masked_slot_sum(p.astype(jnp.float32), v, w)
               for p, v, w in zip(parts, valids, spec.widths)]
        s = pad_rows(jnp.concatenate(acc, axis=0), g_ell.n_node)
        return jnp.sum(s ** 2)

    def full_mask_math(h_, rng):
        from mma_tpu.ops.masked_aggregate import (
            _ell_masked_aggregate, _sigmoid_lane_pattern,
        )
        from mma_tpu.ops.aggregators import get_agg_spec

        specs = tuple(get_agg_spec(a) for a in ("mean", "mean2"))
        pat = _sigmoid_lane_pattern(specs, "new_sigmoid", True, f_hid)
        h_c = h_.astype(jnp.bfloat16)
        s, _, _ = _ell_masked_aggregate(
            h_c, mw, pat, g_ell, spec, 2, f_hid, rng, 0.5, False
        )
        return jnp.sum(s ** 2)

    for name, fn, args in (
        ("gather+sum", gather_sum_only, ()),
        ("mask-math nodrop", lambda h_: full_mask_math(h_, None), ()),
        ("mask-math drop", lambda h_: full_mask_math(
            h_, jax.random.PRNGKey(2)), ()),
    ):
        @jax.jit
        def fwd_c(carry, h_, fn=fn):
            h_ = h_ + carry[0, 0] * 0
            return carry + fn(h_) * ones

        @jax.jit
        def grad_c(carry, h_, fn=fn):
            h_ = h_ + carry[0, 0] * 0
            return carry + jnp.sum(jax.grad(fn)(h_)) * ones

        log(f"ell {name} fwd:  {t_chain(fwd_c, h):7.2f} ms")
        log(f"ell {name} grad: {t_chain(grad_c, h):7.2f} ms")


if __name__ == "__main__":
    main()
