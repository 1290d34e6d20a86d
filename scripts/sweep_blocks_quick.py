"""Trimmed (block_r, block_b) sweep of the lean fused edge program — the
evidence base for ``mma_tpu.autotune.choose_blocks``.

bf16 edge pipeline only (the winning dtype on every measured TPU
workload), two workload scales:

- synthetic-large (131k nodes / 2.1M edges, the headline): grid at the
  default 128/1024 tiling is 2048 edge chunks + 1024 row blocks = 3072
  sequential steps; if per-step overhead bounds the 16.5 ms forward,
  bigger blocks should show it.
- pubmed-scale (19.7k nodes / 88.6k edges): small-graph regime where
  oversized blocks waste occupancy.

Values are checked against the default-config output per workload.
"""

import itertools
import json
import sys
import time

import numpy as np

CONFIGS = [(128, 1024), (256, 1024), (256, 2048), (512, 2048),
           (256, 4096), (512, 4096)]


def timeit(f, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def sweep_workload(graph, f, k, seed=0):
    import jax
    import jax.numpy as jnp

    from mma_tpu.ops.pallas.fused_mma import fused_mma_edge_program_lean

    rs = np.random.RandomState(seed)
    n = graph.n_node
    n_real = int(np.asarray(graph.num_edges))
    ckf = k * f
    h = jnp.asarray(rs.randn(n, f).astype(np.float32)).astype(jnp.bfloat16)
    c = jnp.asarray(rs.randn(n, ckf).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rs.randn(f, ckf) * 0.2).astype(np.float32)).astype(jnp.bfloat16)
    pat = jnp.asarray(np.tile(np.array([True, False]), (f, 1)).T.reshape(-1))
    ct = jnp.asarray(rs.randn(n, ckf).astype(np.float32))

    def run(br, bb):
        @jax.jit
        def fwd(c, w, h):
            return fused_mma_edge_program_lean(
                c, w, h, pat, graph, k, block_r=br, block_b=bb
            )

        @jax.jit
        def train(c, w, h):
            def loss(args):
                out = fused_mma_edge_program_lean(
                    *args, pat, graph, k, block_r=br, block_b=bb
                )
                return jnp.sum(out.astype(jnp.float32) * ct)

            return jax.grad(loss)((c, w, h))

        t_f = timeit(fwd, c, w, h)
        t_t = timeit(train, c, w, h, iters=10)
        return t_f, t_t, np.asarray(fwd(c, w, h).astype(jnp.float32))

    out = {}
    ref = None
    for br, bb in CONFIGS:
        try:
            t_f, t_t, val = run(br, bb)
        except Exception as ex:
            out[f"{br}x{bb}"] = {"error": f"{type(ex).__name__}: {str(ex)[:120]}"}
            print(f"  {br}x{bb}: FAIL {type(ex).__name__}: {str(ex)[:120]}",
                  file=sys.stderr, flush=True)
            continue
        if ref is None:
            ref = val
        err = float(np.max(np.abs(val - ref)))
        out[f"{br}x{bb}"] = {
            "fwd_ms": t_f * 1e3, "train_ms": t_t * 1e3,
            "fwd_edges_per_s": n_real / t_f,
            "train_edges_per_s": n_real / t_t,
            "max_abs_vs_default": err,
        }
        print(f"  {br}x{bb}: fwd {t_f*1e3:.2f} ms ({n_real/t_f/1e6:.1f}M e/s) "
              f"train {t_t*1e3:.2f} ms ({n_real/t_t/1e6:.1f}M e/s) err {err:.2e}",
              file=sys.stderr, flush=True)
    return out


def main():
    import jax

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph

    res = {"device": str(jax.devices()[0])}
    print("workload: synthetic-large (131k/2.1M)", file=sys.stderr, flush=True)
    res["synthetic-large"] = sweep_workload(
        powerlaw_graph(131072, avg_deg=16, seed=1), f=64, k=2
    )
    print("workload: pubmed-scale (19.7k/88.6k)", file=sys.stderr, flush=True)
    res["pubmed-scale"] = sweep_workload(
        powerlaw_graph(19717, avg_deg=4, seed=2), f=64, k=2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
