"""Sweep (block_r, block_b) of the lean fused edge program on TPU.

Hypothesis: at the default 128/1024 tiling the synthetic-large grid is
3072 sequential steps (2048 edge chunks + 1024 row blocks); per-step
overhead, not bandwidth, bounds the 17 ms forward. Bigger blocks cut
steps ~4×. Times fwd and a full train step (fwd+bwd+CSC) per config in
both edge dtypes; checks values against the default config first.
"""

import itertools
import json
import sys
import time

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.ops.pallas.fused_mma import fused_mma_edge_program_lean

    res = {"device": str(jax.devices()[0])}
    rs = np.random.RandomState(0)
    f, k = 64, 2
    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    n, e = graph.n_node, graph.n_edge
    n_real = int(np.asarray(graph.num_edges))
    ckf = k * f
    h32 = jnp.asarray(rs.randn(n, f).astype(np.float32))
    c32 = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    w32 = jnp.asarray((rs.randn(f, ckf) * 0.2).astype(np.float32))
    pat = jnp.asarray(
        np.tile(np.array([True, False]), (f, 1)).T.reshape(-1)
    )
    ct = jnp.asarray(rs.randn(n, ckf).astype(np.float32))

    def run(dt, br, bb):
        cast = (lambda x: x.astype(jnp.bfloat16)) if dt == "bf16" else (lambda x: x)
        c_, w_, h_ = cast(c32), cast(w32), cast(h32)

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

        t_f = timeit(fwd, c_, w_, h_)
        t_t = timeit(train, c_, w_, h_, iters=10)
        out = np.asarray(fwd(c_, w_, h_))
        return t_f, t_t, out

    ref = {}
    for dt in ("f32", "bf16"):
        sweep = {}
        for br, bb in itertools.product((128, 256, 512), (1024, 2048, 4096, 8192)):
            try:
                t_f, t_t, out = run(dt, br, bb)
            except Exception as ex:
                sweep[f"{br}x{bb}"] = {"error": f"{type(ex).__name__}: {str(ex)[:120]}"}
                print(f"{dt} {br}x{bb}: FAIL {type(ex).__name__}",
                      file=sys.stderr, flush=True)
                continue
            if (dt, "out") not in ref:
                ref[(dt, "out")] = out
            err = float(np.max(np.abs(out - ref[(dt, "out")])))
            sweep[f"{br}x{bb}"] = {
                "fwd_ms": t_f * 1e3,
                "train_ms": t_t * 1e3,
                "fwd_edges_per_s": n_real / t_f,
                "max_abs_vs_default": err,
            }
            print(f"{dt} {br}x{bb}: fwd {t_f*1e3:.2f} ms "
                  f"({n_real/t_f/1e6:.1f}M e/s) train {t_t*1e3:.2f} ms err {err:.2e}",
                  file=sys.stderr, flush=True)
        res[dt] = sweep

    print(json.dumps(res))


if __name__ == "__main__":
    main()
