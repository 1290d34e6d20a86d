"""ELL backward dissection on ZINC bench shapes (TPU): where do the
10.9 ms go, and does a 2-D (N, W*C) layout + bf16 slot cotangents close
the gap to the fused kernel's 4.2 ms?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


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
    rs = np.random.RandomState(0)
    hg = jnp.asarray(rs.randn(E, C).astype(np.float32)).astype(jnp.bfloat16)
    c = jnp.asarray(rs.randn(N, C).astype(np.float32))
    ct = jnp.asarray(rs.randn(N, C).astype(np.float32))
    x3 = jnp.asarray(rs.randn(N, W, C).astype(np.float32))
    x2 = x3.reshape(N, W * C)

    base = g.row_ptr[:-1]
    run = g.row_ptr[1:] - base
    d_iota = jnp.arange(W, dtype=jnp.int32)[None, :]
    ids = jnp.minimum(base[:, None] + d_iota, E - 1)
    valid = (d_iota < run[:, None]) & g.node_mask[:, None]
    degsel = g.deg[:, None] > 0

    # --- A: firsthit 3D, x direct (no gathers anywhere) --------------
    def fh3(x_):
        v3 = valid[:, :, None]
        mn = jnp.min(jnp.where(v3, x_, jnp.inf), axis=1)
        mx = jnp.max(jnp.where(v3, x_, -jnp.inf), axis=1)
        out = 0.0
        for o in (mn, mx):
            hit = (x_ == o[:, None, :]) & v3
            first = hit & (jnp.cumsum(hit.astype(jnp.int32), axis=1) == 1)
            dx = jnp.where(first, ct[:, None, :], 0.0)
            out = out + jnp.sum(dx * x_)  # force dx
        return out + jnp.sum(jnp.where(degsel, mn + mx, 0.0) * ct)

    log(f"A fh3d fwd+route (x direct): {t(jax.jit(fh3), x3):.2f} ms")

    # --- B: firsthit 2D (W-loop over lane slices), x direct ----------
    def fh2(x_):
        mn = jnp.full((N, C), jnp.inf)
        mx = jnp.full((N, C), -jnp.inf)
        for d in range(W):
            xd = x_[:, d * C : (d + 1) * C]
            vd = valid[:, d : d + 1]
            mn = jnp.where(vd, jnp.minimum(mn, xd), mn)
            mx = jnp.where(vd, jnp.maximum(mx, xd), mx)
        out = 0.0
        for o in (mn, mx):
            taken = jnp.zeros((N, C), bool)
            acc = 0.0
            for d in range(W):
                xd = x_[:, d * C : (d + 1) * C]
                vd = valid[:, d : d + 1]
                hit = (xd == o) & vd & ~taken
                acc = acc + jnp.sum(jnp.where(hit, ct, 0.0) * xd)
                taken = taken | ((xd == o) & vd)
            out = out + acc
        return out + jnp.sum(jnp.where(degsel, mn + mx, 0.0) * ct)

    log(f"B fh2d fwd+route (x direct): {t(jax.jit(fh2), x2):.2f} ms")

    # --- C: collapse gather widths -----------------------------------
    rank = jnp.arange(E, dtype=jnp.int32) - g.row_ptr[g.dst]
    slot = jnp.clip(g.dst * W + rank, 0, N * W - 1)
    ok = (rank < W) & g.edge_mask
    flat32 = jnp.asarray(rs.randn(N * W, C).astype(np.float32))
    flat16 = flat32.astype(jnp.bfloat16)

    log(f"C collapse f32: {t(jax.jit(lambda f: jnp.where(ok[:, None], f[slot], 0)), flat32):.2f} ms")
    log(f"C collapse bf16: {t(jax.jit(lambda f: jnp.where(ok[:, None], f[slot], 0)), flat16):.2f} ms")

    # --- D: full restructured 2D unit with manual bwd ----------------
    @jax.custom_vjp
    def unit2d(hg_, c_):
        x = hg_[ids.reshape(-1)].reshape(N, W * C).astype(jnp.float32)
        mn = jnp.full((N, C), jnp.inf)
        mx = jnp.full((N, C), -jnp.inf)
        for d in range(W):
            xd = x[:, d * C : (d + 1) * C] + c_
            vd = valid[:, d : d + 1]
            mn = jnp.where(vd, jnp.minimum(mn, xd), mn)
            mx = jnp.where(vd, jnp.maximum(mx, xd), mx)
        return (jnp.where(degsel, mn, 0.0), jnp.where(degsel, mx, 0.0))

    def unit2d_fwd(hg_, c_):
        outs = unit2d(hg_, c_)
        return outs, (hg_, c_, outs)

    def unit2d_bwd(res, cts):
        hg_, c_, (mn, mx) = res
        ctn, ctx = cts
        x = hg_[ids.reshape(-1)].reshape(N, W * C).astype(jnp.float32)
        taken_n = jnp.zeros((N, C), bool)
        taken_x = jnp.zeros((N, C), bool)
        dx_parts = []
        dc = jnp.zeros((N, C), jnp.float32)
        for d in range(W):
            xd = x[:, d * C : (d + 1) * C] + c_
            vd = valid[:, d : d + 1]
            hn = (xd == mn) & vd & ~taken_n
            hx = (xd == mx) & vd & ~taken_x
            dxd = jnp.where(hn, ctn, 0.0) + jnp.where(hx, ctx, 0.0)
            dx_parts.append(dxd.astype(jnp.bfloat16))
            dc = dc + dxd
            taken_n = taken_n | ((xd == mn) & vd)
            taken_x = taken_x | ((xd == mx) & vd)
        flat = jnp.concatenate(dx_parts, axis=1).reshape(N * W, C)
        dhg = jnp.where(ok[:, None], flat[slot], 0)
        return dhg, dc

    unit2d.defvjp(unit2d_fwd, unit2d_bwd)

    def loss2d(hg_, c_):
        mn, mx = unit2d(hg_, c_)
        return jnp.sum((mn * ct) ** 2) + jnp.sum((mx * ct) ** 2)

    log(f"D unit2d fwd:  {t(jax.jit(loss2d), hg, c):.2f} ms")
    log(f"D unit2d grad: {t(jax.jit(jax.grad(loss2d, argnums=(0, 1))), hg, c):.2f} ms")

    # --- D flat: concat slices interleave cost check -----------------
    # (N, W*C) -> (N*W, C) reshape is NOT free (row-major strides), so
    # also try writing dx directly slot-major via stack+transpose.
    # reference numbers from profile_ell2: shipped grad 10.94, kernel 4.21.


if __name__ == "__main__":
    main()
