"""Gather-class experiment, DEPENDENCY-CHAINED: the axon runtime can
elide repeated identical dispatches (see bench._time_step_fn), so each
iteration must consume the previous result. Measures the ELL slot-gather
cost vs table row width/dtype, plus the fused minmax unit chained."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t_chain(f, *args, iters=20, warmup=3):
    """f(carry, *args) -> carry ; chained so no dispatch can be elided."""
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
    rs = np.random.RandomState(0)
    E, C, N, W = 47104, 375, 23552, 4
    ids = jnp.asarray(rs.randint(0, E, N * W).astype(np.int32))
    ids_half = ids[:E]
    hg = jnp.asarray(rs.randn(E, C).astype(np.float32))

    for lanes in (375, 512):
        for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            tab0 = hg.astype(dt)
            if lanes > C:
                tab0 = jnp.pad(tab0, ((0, 0), (0, lanes - C)))
            tab0 = jax.device_put(tab0)

            @jax.jit
            def g(carry, t_, i_):
                t_ = t_ + carry[0, 0].astype(t_.dtype) * 0
                got = t_[i_].astype(jnp.float32)
                return carry + jnp.sum(got) * jnp.ones((8, 128), jnp.float32) * 1e-30

            ms = t_chain(g, tab0, ids)
            ms2 = t_chain(g, tab0, ids_half)
            log(f"lanes={lanes:4d} {name}: 94k rows {ms:6.2f} ms | "
                f"47k rows {ms2:6.2f} ms")

    # chained minmax unit (fwd) and unit grad, as shipped 2-D
    from mma_tpu.data import load_zinc

    ds = load_zinc("train", subset_size=1024)
    n_need = int(ds.num_nodes.sum()) + 1
    e_need = int(sum(len(s_) for s_ in ds.edge_src))
    batch = next(ds.batches(1024, n_node=-(-n_need // 1024) * 1024,
                            n_edge=-(-e_need // 1024) * 1024))
    g_ = batch.graph
    from mma_tpu.ops.ell import (
        ell_valid, ell_expand, masked_minmax_firsthit, single_width_spec,
    )

    spec = single_width_spec(g_.n_node, 4)
    valid = ell_valid(g_, spec)[0]
    hgb = hg.astype(jnp.bfloat16)
    c = jnp.asarray(rs.randn(g_.n_node, C).astype(np.float32))
    ct = jnp.asarray(rs.randn(g_.n_node, C).astype(np.float32))

    def unit(hg_, c_):
        x2 = ell_expand(hg_, g_, spec)[0].astype(jnp.float32)
        x2 = x2 + jnp.tile(c_, (1, 4))
        mn, mx = masked_minmax_firsthit(x2, valid, ("min", "max"), 4)
        sel = g_.deg[:, None] > 0
        mn = jnp.where(sel, mn, 0.0)
        mx = jnp.where(sel, mx, 0.0)
        return jnp.sum((mn * ct) ** 2) + jnp.sum((mx * ct) ** 2)

    @jax.jit
    def fwd_c(carry, hg_, c_):
        hg_ = hg_ + carry[0, 0].astype(hg_.dtype) * 0
        return carry + unit(hg_, c_) * jnp.ones((8, 128), jnp.float32) * 1e-30

    @jax.jit
    def grad_c(carry, hg_, c_):
        hg_ = hg_ + carry[0, 0].astype(hg_.dtype) * 0
        d1, d2 = jax.grad(unit, argnums=(0, 1))(hg_, c_)
        return carry + (jnp.sum(d1.astype(jnp.float32)) + jnp.sum(d2)) \
            * jnp.ones((8, 128), jnp.float32) * 1e-30

    log(f"unit2d fwd  (chained): {t_chain(fwd_c, hgb, c):6.2f} ms")
    log(f"unit2d grad (chained): {t_chain(grad_c, hgb, c):6.2f} ms")

    # the Pallas kernel unit, chained, for reference
    from mma_tpu.ops.pallas.segment_minmax import fused_minmax_edge_program

    def kern(hg_, c_):
        out = fused_minmax_edge_program(c_, hg_, g_, ("min", "max"),
                                        max_run=4)
        sel = g_.deg[:, None] > 0
        mn = jnp.where(sel, out[:, :C], 0.0)
        mx = jnp.where(sel, out[:, C:], 0.0)
        return jnp.sum((mn * ct) ** 2) + jnp.sum((mx * ct) ** 2)

    @jax.jit
    def kfwd_c(carry, hg_, c_):
        hg_ = hg_ + carry[0, 0].astype(hg_.dtype) * 0
        return carry + kern(hg_, c_) * jnp.ones((8, 128), jnp.float32) * 1e-30

    @jax.jit
    def kgrad_c(carry, hg_, c_):
        hg_ = hg_ + carry[0, 0].astype(hg_.dtype) * 0
        d1, d2 = jax.grad(kern, argnums=(1, 0))(c_, hg_)
        return carry + (jnp.sum(d1) + jnp.sum(d2.astype(jnp.float32))) \
            * jnp.ones((8, 128), jnp.float32) * 1e-30

    log(f"kernel fwd  (chained): {t_chain(kfwd_c, hgb, c):6.2f} ms")
    log(f"kernel grad (chained): {t_chain(kgrad_c, hgb, c):6.2f} ms")


if __name__ == "__main__":
    main()
