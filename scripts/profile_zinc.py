"""ZINC flagship train-step attribution on the real TPU.

Times the full ZincNet train step (all three paths) and then one
MultiMaskConv layer's pieces in isolation on the same batch: message
build, fused min/max fwd, min/max fwd+bwd, conv fwd, conv fwd+bwd,
dropout pass. Attributes the step time before/after kernel work."""

import json
import sys
import time

import numpy as np


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
    from bench import bench_zinc_conv
    from mma_tpu.data import load_zinc
    from mma_tpu.nn.mma_conv import MultiMaskConv, compute_avg_deg
    from mma_tpu.ops.pallas.segment_minmax import fused_segment_minmax

    res = {"device": str(jax.devices()[0])}

    # Full bench entry (with the new fused min/max backward).
    res["bench_zinc"] = bench_zinc_conv(batch_size=1024)
    print("bench_zinc done", file=sys.stderr, flush=True)

    # One conv layer in isolation.
    ds = load_zinc("train", subset_size=1024)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    batch = next(ds.batches(1024, n_node=1024 * 40, n_edge=1024 * 104))
    g = batch.graph
    n, e = g.n_node, g.n_edge
    res["n_node_pad"], res["n_edge_pad"] = n, e
    res["n_edge_real"] = int(np.asarray(g.num_edges))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, 75).astype(np.float32))
    e_attr = jnp.asarray(rs.randn(e, 50).astype(np.float32))

    for dt_name in ("float32", "bfloat16"):
        conv = MultiMaskConv(
            in_channels=75, out_channels=75, aggregators=("min", "max"),
            scalers=("identity", "amplification", "linear"),
            avg_deg=tuple(avg.items()), edge_dim=50, towers=5,
            max_degree_hint=8, compute_dtype=dt_name,
        )
        params = conv.init(jax.random.PRNGKey(0))
        sfx = "bf16" if dt_name == "bfloat16" else "f32"

        # message build only
        def msgs_only(p, x_, e_):
            pre = p["pre_nns"][-1]
            from mma_tpu.nn.layers import Dense
            enc = Dense(50, 75).apply(p["edge_encoder"], e_)
            m = conv._messages_for_aggregator(pre, jnp.tile(x_, (1, 5)), enc, g)
            return m
        fm_ = jax.jit(msgs_only)
        res[f"conv_msgs_{sfx}_ms"] = t(fm_, params, x, e_attr) * 1e3

        msgs = fm_(params, x, e_attr)
        # fused minmax fwd only
        fmm = jax.jit(lambda m: fused_segment_minmax(m, g, ("min", "max"), max_run=8))
        res[f"minmax_fwd_{sfx}_ms"] = t(fmm, msgs) * 1e3

        # minmax fwd+bwd
        ct = jnp.asarray(rs.randn(n, 2 * msgs.shape[1]).astype(np.float32))
        gmm = jax.jit(jax.grad(lambda m: jnp.sum(
            jnp.where((g.deg > 0)[:, None],
                      fused_segment_minmax(m, g, ("min", "max"), max_run=8), 0.0) * ct)))
        res[f"minmax_grad_{sfx}_ms"] = t(gmm, msgs) * 1e3

        # conv fwd (eval) / fwd train-mode (dropout) / fwd+bwd
        fc = jax.jit(lambda p, x_, e_: conv.apply(p, x_, g, e_, use_pallas=True))
        res[f"conv_fwd_{sfx}_ms"] = t(fc, params, x, e_attr) * 1e3
        rng = jax.random.PRNGKey(1)
        fcd = jax.jit(lambda p, x_, e_: conv.apply(p, x_, g, e_, rng=rng, use_pallas=True))
        res[f"conv_fwd_dropout_{sfx}_ms"] = t(fcd, params, x, e_attr) * 1e3
        y = jnp.asarray(rs.randn(n, 75).astype(np.float32))
        gc = jax.jit(jax.grad(lambda p, x_, e_: jnp.sum(
            conv.apply(p, x_, g, e_, rng=rng, use_pallas=True) * y)))
        res[f"conv_grad_{sfx}_ms"] = t(gc, params, x, e_attr) * 1e3
        print("conv", sfx, "done", file=sys.stderr, flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
