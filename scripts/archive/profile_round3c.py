"""Round-3c: lean edge program + padded spmm vs the wide program, plus
the full MMALayer headline fwd/train on synthetic-large."""

import json
import sys
import time

import numpy as np


def t(f, *args, iters=30, warmup=2):
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
    import optax

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.nn.mma_layer import MMALayer
    from mma_tpu.ops.pallas import fused_mma as fm
    from mma_tpu.ops.spmm import binary_spmm

    res = {"device": str(jax.devices()[0])}
    rs = np.random.RandomState(0)
    n_feat, k = 64, 2
    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    n = graph.n_node
    n_real = int(np.asarray(graph.num_edges))
    ckf = k * n_feat
    h = jnp.asarray(rs.randn(n, n_feat).astype(np.float32))
    c = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    d = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    w_bot = jnp.asarray(rs.randn(n_feat, ckf).astype(np.float32))
    pat1 = jnp.ones((ckf,), bool)

    # --- lean vs wide edge program: fwd and fwd+bwd ----------------------
    for dt_name, cast in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        cc, hh, ww = c.astype(cast), h.astype(cast), w_bot.astype(cast)
        dd = d.astype(cast)

        fl = jax.jit(lambda c_, w_, h_: fm.fused_mma_edge_program_lean(
            c_, w_, h_, pat1, graph, k))
        dt_s = t(fl, cc, ww, hh)
        res[f"lean_fwd_{dt_name}_ms"] = dt_s * 1e3
        res[f"lean_fwd_{dt_name}_Medges_s"] = n_real / dt_s / 1e6
        print("lean fwd", dt_name, dt_s, file=sys.stderr, flush=True)

        fw = jax.jit(lambda c_, d_, h_: fm.fused_mma_edge_program(
            c_, d_, h_, pat1, graph, k))
        dt_s = t(fw, cc, dd, hh)
        res[f"wide_fwd_{dt_name}_ms"] = dt_s * 1e3

        ct = jnp.asarray(rs.randn(n, ckf).astype(np.float32))

        def loss_lean(c_, w_, h_):
            return jnp.sum(fm.fused_mma_edge_program_lean(
                c_, w_, h_, pat1, graph, k) * ct)

        def loss_wide(c_, d_, h_):
            return jnp.sum(fm.fused_mma_edge_program(
                c_, d_, h_, pat1, graph, k) * ct)

        gl = jax.jit(jax.grad(loss_lean, (0, 1, 2)))
        dt_s = t(gl, cc, ww, hh)
        res[f"lean_grad_{dt_name}_ms"] = dt_s * 1e3
        gw = jax.jit(jax.grad(loss_wide, (0, 1, 2)))
        dt_s = t(gw, cc, dd, hh)
        res[f"wide_grad_{dt_name}_ms"] = dt_s * 1e3
        print("grads", dt_name, "done", file=sys.stderr, flush=True)

    # --- padded spmm ------------------------------------------------------
    x = jnp.asarray(rs.randn(n, 64).astype(np.float32))
    fs = jax.jit(lambda x_: binary_spmm(graph, x_, use_pallas=True))
    dt_s = t(fs, x)
    res["spmm_padded_w64_f32_ms"] = dt_s * 1e3

    # --- full MMALayer headline -------------------------------------------
    params = MMALayer(in_features=64, out_features=64,
                      aggregators=("mean", "mean2")).init(jax.random.PRNGKey(0))
    for dt_name in ("bfloat16", "float32"):
        layer = MMALayer(in_features=64, out_features=64,
                         aggregators=("mean", "mean2"), compute_dtype=dt_name)
        ffull = jax.jit(lambda p, x_: layer.apply(p, x_, graph, use_pallas=True))
        dt_s = t(ffull, params, h)
        res[f"layer_fwd_{dt_name}_ms"] = dt_s * 1e3
        res[f"layer_fwd_{dt_name}_Medges_s"] = n_real / dt_s / 1e6
        print("layer fwd", dt_name, dt_s, file=sys.stderr, flush=True)

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        y = jnp.asarray(rs.randn(n, 64).astype(np.float32))

        def step(p, s, x_):
            def loss_fn(p_):
                out = layer.apply(p_, x_, graph, use_pallas=True)
                return jnp.mean((out - y) ** 2)
            l, g = jax.value_and_grad(loss_fn)(p)
            up, s2 = opt.update(g, s)
            return optax.apply_updates(p, up), s2, l

        fstep = jax.jit(step)
        dt_s = t(fstep, params, opt_state, h)
        res[f"layer_train_{dt_name}_ms"] = dt_s * 1e3
        res[f"layer_train_{dt_name}_Medges_s"] = n_real / dt_s / 1e6
        print("layer train", dt_name, dt_s, file=sys.stderr, flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
