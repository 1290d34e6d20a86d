"""Reproduce the bogus 69µs pallas train step on synthetic-large.

Checks: does the step actually change params? Are the Pallas kernels in
the compiled HLO? Per-step wall time with a hard block each step."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.nn.mma_layer import MMALayer

    print("device:", jax.devices()[0], flush=True)
    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(graph.n_node, 64).astype(np.float32))
    opt = optax.adam(1e-3)

    layer = MMALayer(
        in_features=64, out_features=64, aggregators=("mean", "mean2"),
        compute_dtype="float32",
    )
    params = layer.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, x):
        def loss(pp):
            out = layer.apply(pp, x, graph, use_pallas=True)
            return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) ** 2)

        g = jax.grad(loss)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2

    lowered = step.lower(params, opt_state, h)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print("custom-calls in HLO:", hlo.count("tpu_custom_call"), flush=True)
    print("HLO bytes:", len(hlo), flush=True)

    p1, o1 = step(params, opt_state, h)
    jax.block_until_ready(p1)
    d0 = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(params))
    )
    print("param delta after 1 step:", d0, flush=True)

    for it in range(5):
        t0 = time.perf_counter()
        out = step(params, opt_state, h)
        jax.block_until_ready(out)
        print(f"step {it}: {time.perf_counter() - t0:.6f}s", flush=True)

    # The exact bench timing pattern (async queue, block at end).
    for _ in range(2):
        out = step(params, opt_state, h)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(15):
        out = step(params, opt_state, h)
    jax.block_until_ready(out)
    print("bench-style avg:", (time.perf_counter() - t0) / 15, flush=True)


if __name__ == "__main__":
    main()
