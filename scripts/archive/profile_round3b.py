"""Round-3 follow-up: gather width/padding cliffs + block_b sweeps."""

import functools
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

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.constants import BLOCK_R
    from mma_tpu.ops.pallas import fused_mma as fm

    res = {"device": str(jax.devices()[0])}
    rs = np.random.RandomState(0)
    n_feat, k = 64, 2
    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    n, e = graph.n_node, graph.n_edge
    n_real = int(np.asarray(graph.num_edges))
    ckf = k * n_feat
    src = graph.src

    # --- gather width sweep (padded widths) ------------------------------
    for width, dt_name, cast in (
        (128, "f32", np.float32), (256, "f32", np.float32),
        (256, "bf16", np.float32), (384, "bf16", np.float32),
        (512, "f32", np.float32),
    ):
        tbl = jnp.asarray(rs.randn(n, width).astype(cast))
        if dt_name == "bf16":
            tbl = tbl.astype(jnp.bfloat16)
        g = jax.jit(lambda t_, i: t_[i])
        dt_s = t(g, tbl, src)
        res[f"gather_{dt_name}_w{width}_ms"] = dt_s * 1e3
        print("gather", dt_name, width, dt_s, file=sys.stderr, flush=True)

    # gather of h (N, 64) zero-padded to 128 lanes, in-jit (pad fused)
    h64 = jnp.asarray(rs.randn(n, 64).astype(np.float32))
    for dt_name, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        hh = h64.astype(cast)
        g = jax.jit(lambda t_, i: jnp.pad(t_, ((0, 0), (0, 64)))[i])
        dt_s = t(g, hh, src)
        res[f"gather_pad64to128_{dt_name}_ms"] = dt_s * 1e3
    print("padded gathers done", file=sys.stderr, flush=True)

    # --- program-fwd kernel block_b sweep ---------------------------------
    c = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    d = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    pat = jnp.ones((1, ckf), jnp.float32)
    for dt_name, cast in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        dh_src_all = jnp.concatenate([d, h64], axis=1).astype(cast)[src]
        for block_b in (1024, 2048, 4096):
            (dh_p,), dst = fm._pad_edges([dh_src_all], graph.dst, e, n, block_b)
            for block_sub in (128, 512):
                fjit = jax.jit(
                    functools.partial(
                        fm._fused_program_fwd,
                        block_r=BLOCK_R, block_b=block_b, block_sub=block_sub,
                        interpret=False, passes=1, n_agg=k,
                    )
                )
                key = f"kernel_{dt_name}_b{block_b}_sub{block_sub}"
                try:
                    dt_s = t(fjit, c, dh_p, pat, dst, graph.row_ptr)
                    res[key + "_ms"] = dt_s * 1e3
                    res[key + "_Medges_s"] = n_real / dt_s / 1e6
                except Exception as ex:
                    res[key + "_err"] = f"{type(ex).__name__}: {str(ex)[:150]}"
                print(key, res.get(key + "_ms"), file=sys.stderr, flush=True)

    # --- plain sum kernel (pass 2 / spmm) ---------------------------------
    for width in (64, 128):
        data = jnp.asarray(rs.randn(e, width).astype(np.float32))
        for block_b in (1024, 2048, 4096):
            (data_p,), dst = fm._pad_edges([data], graph.dst, e, n, block_b)
            fjit = jax.jit(
                functools.partial(
                    fm._fused_segment_sum,
                    block_r=BLOCK_R, block_b=block_b, block_sub=128,
                    interpret=False, passes=2,
                )
            )
            key = f"sumkernel_w{width}_b{block_b}"
            dt_s = t(fjit, data_p, dst, graph.row_ptr)
            res[key + "_ms"] = dt_s * 1e3
            print(key, dt_s, file=sys.stderr, flush=True)

    # --- full binary_spmm today (gather + kernel) --------------------------
    from mma_tpu.ops.spmm import binary_spmm

    x = jnp.asarray(rs.randn(n, 64).astype(np.float32))
    fjit = jax.jit(lambda x_: binary_spmm(graph, x_, use_pallas=True))
    dt_s = t(fjit, x)
    res["binary_spmm_w64_f32_ms"] = dt_s * 1e3

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
