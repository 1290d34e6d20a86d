"""Measure TPU HBM gather/permute bandwidth across dtypes/widths/patterns."""

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

    rs = np.random.RandomState(0)
    n, e = 131072, 2097152
    res = {"device": str(jax.devices()[0])}

    idx_rand = jnp.asarray(rs.randint(0, n, size=e).astype(np.int32))
    perm = jnp.asarray(rs.permutation(e).astype(np.int32))
    # "Runny" permutation: runs of 1024 consecutive indices, shuffled chunks.
    chunks = rs.permutation(e // 1024)
    perm_runs = jnp.asarray(
        (chunks[:, None] * 1024 + np.arange(1024)[None, :]).reshape(-1).astype(np.int32)
    )
    run64 = rs.permutation(e // 64)
    perm_runs64 = jnp.asarray(
        (run64[:, None] * 64 + np.arange(64)[None, :]).reshape(-1).astype(np.int32)
    )

    for width in (64, 128, 192):
        tbl32 = jnp.asarray(rs.randn(n, width).astype(np.float32))
        edge32 = jnp.asarray(rs.randn(e, width).astype(np.float32))
        g = jax.jit(lambda t_, i: t_[i])
        res[f"gather_node_f32_w{width}"] = t(g, tbl32, idx_rand)
        res[f"permute_edge_f32_w{width}"] = t(g, edge32, perm)
        tbl16 = tbl32.astype(jnp.bfloat16)
        edge16 = edge32.astype(jnp.bfloat16)
        res[f"gather_node_bf16_w{width}"] = t(g, tbl16, idx_rand)
        res[f"permute_edge_bf16_w{width}"] = t(g, edge16, perm)
        print(width, "done", file=sys.stderr, flush=True)

    edge32 = jnp.asarray(rs.randn(e, 192).astype(np.float32))
    g = jax.jit(lambda t_, i: t_[i])
    res["permute_runs1024_f32_w192"] = t(g, edge32, perm_runs)
    res["permute_runs64_f32_w192"] = t(g, edge32, perm_runs64)
    res["copy_f32_w192"] = t(jax.jit(lambda x: x + 1.0), edge32)

    # take vs [] indexing
    res["take_f32_w192"] = t(
        jax.jit(lambda t_, i: jnp.take(t_, i, axis=0, indices_are_sorted=False)),
        edge32, perm,
    )
    # int8 width192
    edge8 = jnp.asarray(rs.randint(-127, 127, size=(e, 192)).astype(np.int8))
    res["permute_edge_int8_w192"] = t(g, edge8, perm)

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
