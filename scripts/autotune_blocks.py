"""Autotune the fused MMA edge-program block sizes on TPU.

Sweeps (block_r, block_b, block_sub) over the forward and train-style
fwd+bwd of ``fused_mma_edge_program`` at two workload scales (the bench's
synthetic-large and a Pubmed-shaped graph) in both edge dtypes, checking
each config's output against the default config before timing. Writes
``artifacts/autotune_blocks.json``.

Usage: PYTHONPATH=. python scripts/autotune_blocks.py [--quick]
"""

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(f, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def build_case(n, avg_deg, f, k, dtype, seed=0):
    from bench import powerlaw_graph
    from mma_tpu.ops.masked_aggregate import mma_mask_projections

    graph = powerlaw_graph(n, avg_deg=avg_deg, seed=seed)
    rs = np.random.RandomState(seed)
    h = jnp.asarray(rs.randn(graph.n_node, f).astype(np.float32)).astype(dtype)
    w = jnp.asarray((rs.randn(k, 2 * f, f) * 0.2).astype(np.float32)).astype(dtype)
    c, d = mma_mask_projections(h, w)
    pat = jnp.asarray(np.tile(np.array([True, False] * ((k + 1) // 2))[:k], (f, 1)).T.reshape(-1))
    return graph, c, d, h, pat, k


def main():
    from mma_tpu.ops.pallas.fused_mma import fused_mma_edge_program

    quick = "--quick" in sys.argv
    cases = [
        ("synthetic-large", 131072, 16, 64, 2),
        ("pubmed-shape", 19718, 5, 16, 4),
    ]
    grid_r = (128, 256)
    grid_b = (1024, 2048, 4096)
    grid_s = (128, 256, 512)
    configs = [c for c in itertools.product(grid_r, grid_b, grid_s)
               if c[2] <= c[1]]
    dtypes = (jnp.bfloat16, jnp.float32)
    if quick:
        # Remote compiles cost ~30-60s per config: shortlist the
        # promising corners (base, wider MXU sub-blocks, bigger chunks)
        # on the headline workload only.
        cases = cases[:1]
        configs = [
            (128, 1024, 128), (128, 1024, 256), (128, 2048, 256),
            (256, 2048, 256), (128, 4096, 512),
        ]

    results = {}
    for name, n, deg, f, k in cases:
        for dtype in dtypes:
            dname = jnp.dtype(dtype).name
            graph, c, d, h, pat, k_ = build_case(n, deg, f, k, dtype)
            e = int(np.asarray(graph.num_edges))
            key = f"{name}/{dname}"
            results[key] = {"edges": e, "configs": {}}

            def fwd(c, d, h, br, bb, bs):
                return fused_mma_edge_program(
                    c, d, h, pat, graph, k_,
                    block_r=br, block_b=bb, block_sub=bs,
                )

            def train(c, d, h, br, bb, bs):
                def loss(args):
                    return jnp.sum(fwd(*args, br, bb, bs) ** 2)
                return jax.grad(loss)((c, d, h))

            ref = None
            for br, bb, bs in configs:
                cfg = f"r{br}_b{bb}_s{bs}"
                try:
                    jf = jax.jit(lambda c, d, h, br=br, bb=bb, bs=bs: fwd(c, d, h, br, bb, bs))
                    out = jf(c, d, h)
                    jax.block_until_ready(out)
                    if ref is None:
                        ref = out
                    else:
                        err = float(jnp.max(jnp.abs(out - ref)))
                        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
                        assert err < 1e-2 * scale, (cfg, err, scale)
                    t_f = timeit(jf, c, d, h)
                    jt = jax.jit(lambda c, d, h, br=br, bb=bb, bs=bs: train(c, d, h, br, bb, bs))
                    t_t = timeit(jt, c, d, h, iters=5)
                    results[key]["configs"][cfg] = {
                        "fwd_s": t_f, "fwd_edges_per_s": e / t_f,
                        "train_s": t_t, "train_edges_per_s": e / t_t,
                    }
                    print(f"{key} {cfg}: fwd {e/t_f/1e6:.1f}M e/s, "
                          f"fwd+bwd {e/t_t/1e6:.1f}M e/s", flush=True)
                except Exception as ex:
                    print(f"{key} {cfg}: FAILED {type(ex).__name__}: {str(ex)[:150]}",
                          flush=True)
            best = max(
                results[key]["configs"].items(),
                key=lambda kv: kv[1]["fwd_edges_per_s"],
                default=(None, None),
            )
            results[key]["best_fwd"] = best[0]
            bestt = max(
                results[key]["configs"].items(),
                key=lambda kv: kv[1]["train_edges_per_s"],
                default=(None, None),
            )
            results[key]["best_train"] = bestt[0]

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/autotune_blocks.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: {"best_fwd": v["best_fwd"], "best_train": v["best_train"]}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
