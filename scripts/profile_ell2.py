"""Stage timing for the ELL path on the ZINC bench shapes (TPU).

Isolates: slot gather strategies (per-slot row gather vs per-node
contiguous W-row dynamic-slice gather), 3-D (N, W, C) vs 2-D (N, W*C)
reduce layouts, first-hit min/max fwd+bwd, and the collapse gather —
against the fused Pallas min/max edge program as reference."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t(f, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from mma_tpu.data import load_zinc

    batch_size = 1024
    ds = load_zinc("train", subset_size=batch_size)
    n_need = int(ds.num_nodes.sum()) + 1
    e_need = int(sum(len(s_) for s_ in ds.edge_src))
    batch = next(ds.batches(
        batch_size,
        n_node=-(-n_need // 1024) * 1024,
        n_edge=-(-e_need // 1024) * 1024,
    ))
    g = batch.graph
    N, E, C, W = g.n_node, g.n_edge, 375, 4
    log(f"N={N} E={E} C={C} W={W}")
    rs = np.random.RandomState(0)
    hg = jnp.asarray(rs.randn(E, C).astype(np.float32)).astype(jnp.bfloat16)
    c = jnp.asarray(rs.randn(N, C).astype(np.float32))
    ct = jnp.asarray(rs.randn(N, C).astype(np.float32))

    base = g.row_ptr[:-1]
    run = g.row_ptr[1:] - base
    d_iota = jnp.arange(W, dtype=jnp.int32)[None, :]
    ids = jnp.minimum(base[:, None] + d_iota, E - 1)  # (N, W)
    valid = (d_iota < run[:, None]) & g.node_mask[:, None]  # (N, W)

    # --- gather strategies (forward only) ----------------------------
    @jax.jit
    def gather_slot(hg_):
        return hg_[ids.reshape(-1)].reshape(N, W, C)

    @jax.jit
    def gather_dynslice(hg_):
        out = jax.vmap(
            lambda s: jax.lax.dynamic_slice(hg_, (s, 0), (W, C))
        )(base)
        return out  # (N, W, C)

    log(f"gather per-slot rows:  {t(gather_slot, hg):.2f} ms")
    log(f"gather dyn-slice W-blk: {t(gather_dynslice, hg):.2f} ms")

    # --- full unit: expand + add c + minmax firsthit, fwd + bwd ------
    def unit_3d(gather):
        def fwd(hg_, c_):
            x = gather(hg_).astype(jnp.float32) + c_[:, None, :]
            v3 = valid[:, :, None]
            mn = jnp.min(jnp.where(v3, x, jnp.inf), axis=1)
            mx = jnp.max(jnp.where(v3, x, -jnp.inf), axis=1)
            mn = jnp.where(g.deg[:, None] > 0, mn, 0.0)
            mx = jnp.where(g.deg[:, None] > 0, mx, 0.0)
            return jnp.sum((mn * ct) ** 2) + jnp.sum((mx * ct) ** 2)
        return fwd

    def unit_2d(hg_, c_):
        x2 = gather_dynslice(hg_).reshape(N, W * C).astype(jnp.float32)
        mn = jnp.full((N, C), jnp.inf)
        mx = jnp.full((N, C), -jnp.inf)
        for d in range(W):
            xd = x2[:, d * C : (d + 1) * C] + c_
            vd = valid[:, d : d + 1]
            mn = jnp.where(vd, jnp.minimum(mn, xd), mn)
            mx = jnp.where(vd, jnp.maximum(mx, xd), mx)
        mn = jnp.where(g.deg[:, None] > 0, mn, 0.0)
        mx = jnp.where(g.deg[:, None] > 0, mx, 0.0)
        return jnp.sum((mn * ct) ** 2) + jnp.sum((mx * ct) ** 2)

    f3s = jax.jit(unit_3d(gather_slot))
    f3d = jax.jit(unit_3d(gather_dynslice))
    f2d = jax.jit(unit_2d)
    log(f"unit fwd 3d slot:     {t(f3s, hg, c):.2f} ms")
    log(f"unit fwd 3d dynslice: {t(f3d, hg, c):.2f} ms")
    log(f"unit fwd 2d dynslice: {t(f2d, hg, c):.2f} ms")
    g3s = jax.jit(jax.grad(unit_3d(gather_slot), argnums=(0, 1)))
    g3d = jax.jit(jax.grad(unit_3d(gather_dynslice), argnums=(0, 1)))
    g2d = jax.jit(jax.grad(unit_2d, argnums=(0, 1)))
    log(f"unit grad 3d slot:     {t(g3s, hg, c):.2f} ms  (XLA scatter bwd)")
    log(f"unit grad 3d dynslice: {t(g3d, hg, c):.2f} ms  (XLA scatter bwd)")
    log(f"unit grad 2d dynslice: {t(g2d, hg, c):.2f} ms  (XLA scatter bwd)")

    # --- collapse gather (the custom-VJP backward's edge map) --------
    rank = jnp.arange(E, dtype=jnp.int32) - g.row_ptr[g.dst]
    slot = jnp.clip(g.dst * W + rank, 0, N * W - 1)
    ok = (rank < W) & g.edge_mask

    @jax.jit
    def collapse(flat):
        return jnp.where(ok[:, None], flat[slot], 0.0)

    flat = jnp.asarray(rs.randn(N * W, C).astype(np.float32))
    log(f"collapse gather (E rows): {t(collapse, flat):.2f} ms")

    # --- current ell custom-vjp path (as shipped) --------------------
    import dataclasses
    from mma_tpu.ops.ell import (
        ell_expand, ell_valid, masked_minmax_firsthit, single_width_spec,
    )

    spec = single_width_spec(N, W)

    def shipped(hg_, c_):
        parts = ell_expand(hg_, g, spec)
        x = parts[0].astype(jnp.float32) + c_[:, None, :]
        mn, mx = masked_minmax_firsthit(x, ell_valid(g, spec)[0], ("min", "max"))
        mn = jnp.where(g.deg[:, None] > 0, mn, 0.0)
        mx = jnp.where(g.deg[:, None] > 0, mx, 0.0)
        return jnp.sum((mn * ct) ** 2) + jnp.sum((mx * ct) ** 2)

    log(f"shipped fwd:  {t(jax.jit(shipped), hg, c):.2f} ms")
    log(f"shipped grad: {t(jax.jit(jax.grad(shipped, argnums=(0, 1))), hg, c):.2f} ms")

    # --- reference: fused Pallas min/max edge program ----------------
    from mma_tpu.ops.pallas.segment_minmax import fused_minmax_edge_program

    def kern(hg_, c_):
        out = fused_minmax_edge_program(c_, hg_, g, ("min", "max"),
                                        max_run=4)
        mn = jnp.where(g.deg[:, None] > 0, out[:, :C], 0.0)
        mx = jnp.where(g.deg[:, None] > 0, out[:, C:], 0.0)
        return jnp.sum((mn * ct) ** 2) + jnp.sum((mx * ct) ** 2)

    log(f"kernel fwd:  {t(jax.jit(kern), hg, c):.2f} ms")
    log(f"kernel grad: {t(jax.jit(jax.grad(kern, argnums=(0, 1))), hg, c):.2f} ms")

    # --- hg build (gather_by_src) for context ------------------------
    from mma_tpu.ops.gather import gather_by_src

    p_src = jnp.asarray(rs.randn(N, C).astype(np.float32)).astype(jnp.bfloat16)

    def hgb(p):
        return jnp.sum(gather_by_src(p, g).astype(jnp.float32) ** 2)

    log(f"hg-build fwd:  {t(jax.jit(hgb), p_src):.2f} ms")
    log(f"hg-build grad: {t(jax.jit(jax.grad(hgb)), p_src):.2f} ms")


if __name__ == "__main__":
    main()
