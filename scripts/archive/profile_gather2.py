"""Gather bandwidth re-measurement with dependency chaining to defeat
any caching/pipelining artifact in the plain repeat-and-block idiom."""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    n, e = 131072, 2097152
    res = {"device": str(jax.devices()[0])}

    idx_rand = jnp.asarray(rs.randint(0, n, size=e).astype(np.int32))
    perm = jnp.asarray(rs.permutation(e).astype(np.int32))

    def t_chain(f, x0, iters=10):
        x = f(x0)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / iters

    # chained permute: out feeds next input (same shape)
    edge32 = jnp.asarray(rs.randn(e, 192).astype(np.float32))
    f_perm = jax.jit(lambda x: x[perm])
    res["permute_f32_w192_chained"] = t_chain(f_perm, edge32)
    print("permute chained", res["permute_f32_w192_chained"], file=sys.stderr, flush=True)

    edge16 = edge32.astype(jnp.bfloat16)
    f_perm16 = jax.jit(lambda x: x[perm])
    res["permute_bf16_w192_chained"] = t_chain(f_perm16, edge16)

    # chained copy
    f_copy = jax.jit(lambda x: x + 1.0)
    res["copy_f32_w192_chained"] = t_chain(f_copy, edge32)

    # chained node gather: gather (N,192)->(E,192), then reduce back to (N,192)
    tbl = jnp.asarray(rs.randn(n, 192).astype(np.float32))

    @jax.jit
    def gather_round(t_):
        g = t_[idx_rand]  # (E,192)
        return t_ + g[:n]  # cheap dependency, keeps shape

    res["gather_node_f32_w192_chained"] = t_chain(gather_round, tbl)

    @jax.jit
    def gather_round16(t_):
        g = t_[idx_rand]
        return t_ + g[:n]

    res["gather_node_bf16_w192_chained"] = t_chain(gather_round16, tbl.astype(jnp.bfloat16))

    # also: unchained same-jit repeat (reproduce the broken number)
    def t_plain(f, *args, iters=10):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    res["permute_f32_w192_plain"] = t_plain(f_perm, edge32)

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
