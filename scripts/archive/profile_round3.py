"""Round-3 forward-kernel roofline profile (run on the real TPU).

Times, on the synthetic-large workload (131k nodes / 2.1M edges, F=64,
K=2 → ckf=128):

1. raw random node-table gathers at widths 64 / 128 / 192 (f32 + bf16)
   — the HBM floor of the edge program's only random access;
2. the fused forward kernel ALONE (pre-gathered edge rows) across
   passes ∈ {1, 2} and block_sub ∈ {128, 256, 512};
3. the full current `fused_mma_edge_program` forward for reference.

Prints one JSON dict to stdout.
"""

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
    from mma_tpu.constants import BLOCK_B, BLOCK_R
    from mma_tpu.ops.pallas import fused_mma as fm

    res = {"device": str(jax.devices()[0])}
    rs = np.random.RandomState(0)
    n_feat, k = 64, 2
    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    n, e = graph.n_node, graph.n_edge
    n_edges_real = int(np.asarray(graph.num_edges))
    res["n_node"], res["n_edge_padded"], res["n_edge_real"] = n, e, n_edges_real
    ckf = k * n_feat

    # --- 1. raw gathers -------------------------------------------------
    src = graph.src
    for width in (64, 128, 192):
        tbl = jnp.asarray(rs.randn(n, width).astype(np.float32))
        g = jax.jit(lambda t_, i: t_[i])
        dt = t(g, tbl, src)
        res[f"gather_f32_w{width}_ms"] = dt * 1e3
        res[f"gather_f32_w{width}_gbps"] = e * width * 4 / dt / 1e9
        tbl16 = tbl.astype(jnp.bfloat16)
        dt = t(g, tbl16, src)
        res[f"gather_bf16_w{width}_ms"] = dt * 1e3
        res[f"gather_bf16_w{width}_gbps"] = e * width * 2 / dt / 1e9
    print("gathers done", file=sys.stderr, flush=True)

    # --- 2. kernel-only sweep -------------------------------------------
    h = jnp.asarray(rs.randn(n, n_feat).astype(np.float32))
    c = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    d = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    pat = jnp.ones((1, ckf), jnp.float32)

    for dt_name, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        dh_src = jnp.concatenate([d, h], axis=1).astype(cast)[graph.src]
        (dh_p,), dst = fm._pad_edges([dh_src], graph.dst, e, n, BLOCK_B)
        c_c = c.astype(jnp.float32)
        for passes in (1, 2):
            for block_sub in (128, 256, 512):
                f = jax.jit(
                    functools.partial(
                        fm._fused_program_fwd,
                        block_r=BLOCK_R, block_b=BLOCK_B, block_sub=block_sub,
                        interpret=False, passes=passes, n_agg=k,
                    )
                )
                key = f"kernel_{dt_name}_p{passes}_sub{block_sub}"
                try:
                    dt_s = t(f, c_c, dh_p, pat, dst, graph.row_ptr)
                    res[key + "_ms"] = dt_s * 1e3
                    res[key + "_Medges_s"] = n_edges_real / dt_s / 1e6
                except Exception as ex:
                    res[key + "_err"] = f"{type(ex).__name__}: {str(ex)[:120]}"
                print(key, res.get(key + "_ms"), file=sys.stderr, flush=True)

    # --- 3. full current forward (gather + kernel) ----------------------
    pat1 = jnp.ones((ckf,), bool)
    for dt_name, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        cc, dd, hh = c.astype(cast), d.astype(cast), h.astype(cast)
        f = jax.jit(
            lambda c_, d_, h_: fm.fused_mma_edge_program(
                c_, d_, h_, pat1, graph, k
            )
        )
        dt_s = t(f, cc, dd, hh)
        res[f"full_fwd_{dt_name}_ms"] = dt_s * 1e3
        res[f"full_fwd_{dt_name}_Medges_s"] = n_edges_real / dt_s / 1e6
        print("full", dt_name, dt_s, file=sys.stderr, flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
