"""Round-4 experiment: ELL dense-neighbor path vs fused CSR Pallas on the
ZINC flagship bench workload (TPU). Usage: python scripts/profile_ell.py"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(f, *args, iters=15, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def time_step(f, *args, iters=10, warmup=2, n_state=2):
    state = args[:n_state]
    rest = args[n_state:]
    out = None
    for _ in range(warmup):
        out = f(*state, *rest)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*state, *rest)
        state = out[:n_state]
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from mma_tpu.data import load_zinc
    from mma_tpu.models import ZincNet
    from mma_tpu.nn.mma_conv import compute_avg_deg

    batch_size = 1024
    ds = load_zinc("train", subset_size=batch_size)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    n_need = int(ds.num_nodes.sum()) + 1
    e_need = int(sum(len(s_) for s_ in ds.edge_src))
    batch = next(ds.batches(
        batch_size,
        n_node=-(-n_need // 1024) * 1024,
        n_edge=-(-e_need // 1024) * 1024,
    ))
    log(f"batch: n_node={batch.graph.n_node} n_edge={batch.graph.n_edge} "
        f"real_edges={int(np.asarray(batch.graph.num_edges))} "
        f"maxdeg={float(np.asarray(batch.graph.deg).max())}")

    opt = optax.adam(1e-3)
    results = {}
    paths = (
        ("csr-bf16", "csr", "bfloat16", 8),
        ("ell-bf16-w4", "ell", "bfloat16", 4),
        ("ell-f32-w4", "ell", "float32", 4),
        ("ell-bf16-w8", "ell", "bfloat16", 8),
    )
    for name, fmt, dtype, hint in paths:
        model = ZincNet(
            aggregators=("min", "max"),
            scalers=("identity", "amplification", "linear"),
            avg_deg=tuple(avg.items()),
            towers=5,
            max_degree_hint=hint,
            compute_dtype=dtype,
            edge_format=fmt,
        )
        params = model.init(jax.random.PRNGKey(0))
        state = model.init_state()
        n_edges = int(np.asarray(batch.graph.num_edges)) * model.num_layers

        def fwd(p, s, b, model=model):
            pred, _ = model.apply(p, s, b, training=False, use_pallas=True)
            return pred

        opt_state = opt.init(params)

        @jax.jit
        def step(p, o, s, b, model=model):
            def loss(pp):
                pred, s2 = model.apply(pp, s, b, training=True,
                                       use_pallas=True)
                err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
                return err.sum() / jnp.maximum(b.graph_mask.sum(), 1.0), s2

            (l, s2), g = jax.value_and_grad(loss, has_aux=True)(p)
            u, o2 = opt.update(g, o, p)
            return optax.apply_updates(p, u), o2, s2

        t0 = time.perf_counter()
        dt = time_fn(jax.jit(fwd), params, state, batch)
        dt_t = time_step(step, params, opt_state, state, batch)
        log(f"{name}: fwd {dt*1e3:.2f} ms ({n_edges/dt/1e6:.1f}M e/s)  "
            f"train {dt_t*1e3:.2f} ms ({n_edges/dt_t/1e6:.1f}M e/s)  "
            f"[compile+run {time.perf_counter()-t0:.0f}s]")
        results[name] = (n_edges / dt, n_edges / dt_t)

    for k, (f_, t_) in results.items():
        print(f"{k}: fwd {f_/1e6:.1f}M train {t_/1e6:.1f}M edges/s")


if __name__ == "__main__":
    main()
