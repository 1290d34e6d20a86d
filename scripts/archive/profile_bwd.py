"""Component-level timing of the MMA train step on TPU (synthetic-large).

Breaks the fwd/bwd of one MMALayer step into its constituent HBM passes
to locate the backward-pass gap (train 16.4M edges/s vs fwd 65.8M).
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t(f, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.nn.mma_layer import MMALayer
    from mma_tpu.ops.masked_aggregate import mma_mask_projections, _sigmoid_lane_pattern
    from mma_tpu.ops.pallas.fused_mma import (
        fused_mma_edge_program,
        fused_segment_sum,
        fused_segment_sum_by_src,
        fused_masked_aggregate,
    )
    from mma_tpu.ops.spmm import binary_spmm
    from mma_tpu.ops.aggregators import get_agg_spec

    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    n, f, k = graph.n_node, 64, 2
    kf = k * f
    e = graph.n_edge
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(n, f).astype(np.float32))
    c = jnp.asarray(rs.randn(n, kf).astype(np.float32))
    d = jnp.asarray(rs.randn(n, kf).astype(np.float32))
    ct = jnp.asarray(rs.randn(n, kf).astype(np.float32))
    specs = (get_agg_spec("mean"), get_agg_spec("mean2"))
    pat = _sigmoid_lane_pattern(specs, "new_sigmoid", True, f)
    res = {"n": int(n), "e": int(e)}

    # 1. forward edge program alone
    fwd = jax.jit(lambda c, d, h: fused_mma_edge_program(c, d, h, pat, graph, k))
    res["edge_fwd"] = t(fwd, c, d, h)
    log("edge_fwd", res["edge_fwd"])

    # 2. edge program vjp (fwd+bwd)
    def loss(c, d, h):
        return jnp.sum(fused_mma_edge_program(c, d, h, pat, graph, k) * ct)

    vjp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    res["edge_fwd_bwd"] = t(vjp, c, d, h)
    log("edge_fwd_bwd", res["edge_fwd_bwd"])

    # 3. permute gather payload[src_perm] for (E, 192)
    payload = jnp.asarray(rs.randn(e, kf + f).astype(np.float32))
    permute = jax.jit(lambda p: p[graph.src_perm])
    res["permute_gather_192"] = t(permute, payload)
    log("permute", res["permute_gather_192"])

    # 4. dst-sorted gather ct[dst] (E,128)
    gdst = jax.jit(lambda x: x[graph.dst])
    res["gather_dst_128"] = t(gdst, ct)
    # 4b. src random gather (E,192)
    tbl = jnp.asarray(rs.randn(n, kf + f).astype(np.float32))
    gsrc = jax.jit(lambda x: x[graph.src])
    res["gather_src_192"] = t(gsrc, tbl)
    log("gathers", res["gather_dst_128"], res["gather_src_192"])

    # 5. fused segment sums
    data128 = jnp.asarray(rs.randn(e, kf).astype(np.float32))
    ss = jax.jit(lambda x: fused_segment_sum(x, graph))
    res["segsum_128"] = t(ss, data128)
    ss_src = jax.jit(lambda x: fused_segment_sum_by_src(x, graph))
    res["segsum_src_192"] = t(ss_src, payload)
    log("segsums", res["segsum_128"], res["segsum_src_192"])

    # 6. elementwise bwd chain alone (as in _bwd)
    logits = jnp.asarray(rs.randn(e, kf).astype(np.float32))
    hs = jnp.asarray(rs.randn(e, f).astype(np.float32))

    @jax.jit
    def bwd_chain(logits, hs, ct):
        p = pat[None, :]
        sig = jax.nn.sigmoid(logits)
        mask = jnp.where(p, sig, logits)
        ge = ct[graph.dst]
        ge = jnp.where(graph.edge_mask[:, None], ge, 0)
        h_t = jnp.tile(hs, (1, k))
        dlogits = ge * h_t * jnp.where(p, sig * (1.0 - sig), 1.0)
        gm = ge * mask
        dh_e = gm[:, :f] + gm[:, f:]
        return jnp.concatenate([dlogits, dh_e], axis=1)

    res["bwd_elementwise_chain"] = t(bwd_chain, logits, hs, ct)
    log("bwd chain", res["bwd_elementwise_chain"])

    # 7. fused masked aggregate fwd alone (kernel only, logits materialized)
    fma = jax.jit(lambda l, h2: fused_masked_aggregate(l, h2, pat, graph, k))
    res["masked_agg_kernel"] = t(fma, logits, hs)
    log("masked_agg_kernel", res["masked_agg_kernel"])

    # 8. binary_spmm fwd and vjp
    x = jnp.asarray(rs.randn(n, f).astype(np.float32))
    sp = jax.jit(lambda x: binary_spmm(graph, x, use_pallas=True))
    res["spmm_fwd"] = t(sp, x)
    spv = jax.jit(jax.grad(lambda x: jnp.sum(binary_spmm(graph, x, use_pallas=True) * x)))
    res["spmm_fwd_bwd"] = t(spv, x)
    log("spmm", res["spmm_fwd"], res["spmm_fwd_bwd"])

    # 9. full layer fwd / train step for reference
    layer = MMALayer(in_features=f, out_features=f, aggregators=("mean", "mean2"))
    params = layer.init(jax.random.PRNGKey(0))
    fl = jax.jit(lambda p, x: layer.apply(p, x, graph, use_pallas=True))
    res["layer_fwd"] = t(fl, params, h)

    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, x):
        def loss(pp):
            out = layer.apply(pp, x, graph, use_pallas=True)
            return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) ** 2)

        g = jax.grad(loss)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2

    res["layer_train_step"] = t(step, params, opt_state, h, iters=10)
    log("layer", res["layer_fwd"], res["layer_train_step"])

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
