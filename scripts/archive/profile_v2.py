"""Round 2 profiling: new fused bwd kernel end-to-end + gather matrix."""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.nn.mma_layer import MMALayer
    from mma_tpu.ops.aggregators import get_agg_spec
    from mma_tpu.ops.masked_aggregate import _sigmoid_lane_pattern
    from mma_tpu.ops.pallas.fused_mma import fused_mma_edge_program

    def t_chain(f, x0, iters=10):
        x = f(x0)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / iters

    def t_plain(f, *args, iters=15, warmup=2):
        for _ in range(warmup):
            out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    res = {"device": str(jax.devices()[0])}
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

    # 1. New edge program fwd and fwd+bwd
    fwd = jax.jit(lambda c_, d_, h_: fused_mma_edge_program(c_, d_, h_, pat, graph, k))
    res["edge_fwd_v2"] = t_plain(fwd, c, d, h)
    log("edge_fwd_v2", res["edge_fwd_v2"])

    def loss(c_, d_, h_):
        return jnp.sum(fused_mma_edge_program(c_, d_, h_, pat, graph, k) * ct)

    vjp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    res["edge_fwd_bwd_v2"] = t_plain(vjp, c, d, h)
    log("edge_fwd_bwd_v2", res["edge_fwd_bwd_v2"])

    # 2. Full layer train step
    layer = MMALayer(in_features=f, out_features=f, aggregators=("mean", "mean2"))
    params = layer.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, x):
        def loss2(pp):
            out = layer.apply(pp, x, graph, use_pallas=True)
            return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) ** 2)

        g = jax.grad(loss2)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2

    def chained_step(args):
        p, o = args
        return step(p, o, h)

    res["layer_train_step_v2"] = t_chain(chained_step, (params, opt_state))
    res["layer_fwd_v2"] = t_plain(
        jax.jit(lambda p, x: layer.apply(p, x, graph, use_pallas=True)), params, h
    )
    log("layer", res["layer_fwd_v2"], res["layer_train_step_v2"])

    # 3. Gather matrix: node-table gathers by table size/dtype (chained).
    idx = jnp.asarray(np.asarray(graph.dst)[np.asarray(graph.src_perm)])  # dst_csc
    for width, dt, tag in (
        (128, jnp.float32, "f32_w128"),     # 67MB
        (128, jnp.bfloat16, "bf16_w128"),   # 34MB
        (256, jnp.float32, "f32_w256"),     # 134MB
        (256, jnp.bfloat16, "bf16_w256"),   # 67MB
        (64, jnp.float32, "f32_w64"),       # 34MB
        (384, jnp.bfloat16, "bf16_w384"),   # 100MB
    ):
        tbl = jnp.asarray(rs.randn(n, width).astype(np.float32)).astype(dt)

        def round_(t_, idx=idx, n=n):
            g = t_[idx]
            return t_ + g[:n]

        res[f"gather_dstcsc_{tag}"] = t_chain(jax.jit(round_), tbl)
        log("gather", tag, res[f"gather_dstcsc_{tag}"])

    # 4. Runny permutes (chained): runs of 64 / 1024 rows.
    edge32 = jnp.asarray(rs.randn(e, 192).astype(np.float32))
    for runlen in (64, 1024):
        chunks = np.random.RandomState(1).permutation(e // runlen)
        p_runs = jnp.asarray(
            (chunks[:, None] * runlen + np.arange(runlen)[None, :])
            .reshape(-1).astype(np.int32)
        )
        fp = jax.jit(lambda x, p_runs=p_runs: x[p_runs])
        res[f"permute_runs{runlen}_f32_w192"] = t_chain(fp, edge32)
        log("runs", runlen, res[f"permute_runs{runlen}_f32_w192"])

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
