"""A/B: csc_gather vs payload_permute edge backward + spmm CSC backward."""

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
    from mma_tpu.ops.pallas import fused_mma
    from mma_tpu.ops.spmm import binary_spmm

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
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(n, f).astype(np.float32))
    c = jnp.asarray(rs.randn(n, kf).astype(np.float32))
    d = jnp.asarray(rs.randn(n, kf).astype(np.float32))
    ct = jnp.asarray(rs.randn(n, kf).astype(np.float32))
    specs = (get_agg_spec("mean"), get_agg_spec("mean2"))
    pat = _sigmoid_lane_pattern(specs, "new_sigmoid", True, f)

    for mode in ("csc_gather", "payload_permute"):
        fused_mma.EDGE_BWD_MODE = mode

        def loss(c_, d_, h_):
            return jnp.sum(
                fused_mma.fused_mma_edge_program(c_, d_, h_, pat, graph, k) * ct
            )

        vjp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        res[f"edge_fwd_bwd_{mode}"] = t_plain(vjp, c, d, h)
        log(mode, res[f"edge_fwd_bwd_{mode}"])

    fused_mma.EDGE_BWD_MODE = "csc_gather"

    # spmm fwd+bwd with CSC backward
    x = jnp.asarray(rs.randn(n, f).astype(np.float32))
    spv = jax.jit(jax.grad(
        lambda x_: jnp.sum(binary_spmm(graph, x_, use_pallas=True) * x_)
    ))
    res["spmm_fwd_bwd_csc"] = t_plain(spv, x)
    log("spmm", res["spmm_fwd_bwd_csc"])

    # full layer train step, A/B both backward modes
    layer = MMALayer(in_features=f, out_features=f, aggregators=("mean", "mean2"))
    params = layer.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    n_edges = int(np.asarray(graph.num_edges))

    for mode in ("csc_gather", "payload_permute"):
        fused_mma.EDGE_BWD_MODE = mode

        @jax.jit
        def step(p, o, x_):
            def loss2(pp):
                out = layer.apply(pp, x_, graph, use_pallas=True)
                return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) ** 2)

            g = jax.grad(loss2)(p)
            u, o2 = opt.update(g, o, p)
            return optax.apply_updates(p, u), o2

        res[f"layer_train_step_{mode}"] = t_plain(
            step, params, opt_state, h, iters=10
        )
        res[f"train_edges_per_s_{mode}"] = (
            n_edges / res[f"layer_train_step_{mode}"]
        )
        log("layer step", mode, res[f"layer_train_step_{mode}"],
            res[f"train_edges_per_s_{mode}"])

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
