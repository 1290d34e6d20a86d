"""Benchmark harness: edges/s/chip on MMA aggregation layers.

Measures the BASELINE.json north-star metric — edges/s through the
multi-mask aggregation layer — on three workloads:

- ``pubmed``: the real Pubmed graph structure (19.7k nodes / 88.6k edges;
  synthetic features — ``ind.pubmed.allx`` is absent upstream), MMA layer
  with the README.md:58 config (hidden 16, min/min2/min3/min4).
- ``zinc``: a 64-molecule batched graph through MultiMaskConv
  (README.md:79 config: towers 5, min/max, identity/amplification/linear).
- ``synthetic-large``: 131k-node power-law graph, 2.1M edges, hidden 64,
  two aggregators — the throughput-at-scale configuration.

Each workload runs both the XLA segment-sum path and the fused Pallas
path; the faster wins. Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}`` where value is the
edges/s/chip of the headline (synthetic-large) workload and vs_baseline
is the speedup of the chosen path over the XLA reference path (the
reference itself publishes no numbers — BASELINE.md).
Details go to stderr and BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_fn(f, *args, iters=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def powerlaw_graph(n, avg_deg, seed=0):
    """Symmetric power-law-ish graph via preferential random targets."""
    rs = np.random.RandomState(seed)
    m = n * avg_deg // 2
    # Zipf-weighted endpoint sampling → heavy-tailed degree distribution.
    w = 1.0 / np.arange(1, n + 1) ** 0.5
    w /= w.sum()
    a = rs.choice(n, size=m, p=w).astype(np.int32)
    b = rs.randint(0, n, size=m).astype(np.int32)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    from mma_tpu.graph.build import graph_from_edges

    return graph_from_edges(src, dst, n)


def bench_node_mma(graph, n_feat, aggregators, seed=0):
    """Edges/s of one MMA layer forward (XLA vs Pallas paths)."""
    import jax
    import jax.numpy as jnp

    from mma_tpu.nn.mma_layer import MMALayer

    rs = np.random.RandomState(seed)
    h = jnp.asarray(rs.randn(graph.n_node, n_feat).astype(np.float32))
    params = MMALayer(
        in_features=n_feat, out_features=n_feat, aggregators=aggregators
    ).init(jax.random.PRNGKey(0))
    n_edges = int(np.asarray(graph.num_edges))

    res = {}
    paths = (
        ("xla", False, "float32"),
        ("pallas", True, "float32"),
        ("pallas-bf16", True, "bfloat16"),
    )
    for name, use_pallas, dtype in paths:
        layer = MMALayer(
            in_features=n_feat, out_features=n_feat, aggregators=aggregators,
            compute_dtype=dtype,
        )
        f = jax.jit(lambda p, x: layer.apply(p, x, graph, use_pallas=use_pallas))
        try:
            dt = _time_fn(f, params, h)
            res[name] = {"time_s": dt, "edges_per_s": n_edges / dt}
        except Exception as e:  # pallas path may be unavailable off-TPU
            log(f"  path {name} failed: {type(e).__name__}: {str(e)[:200]}")
    return res


def bench_node_mma_train(graph, n_feat, aggregators, seed=0):
    """Edges/s of one MMA-layer training step (fwd+bwd+update)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mma_tpu.nn.mma_layer import MMALayer

    rs = np.random.RandomState(seed)
    h = jnp.asarray(rs.randn(graph.n_node, n_feat).astype(np.float32))
    opt = optax.adam(1e-3)
    n_edges = int(np.asarray(graph.num_edges))

    res = {}
    paths = (
        ("xla", False, "float32"),
        ("pallas", True, "float32"),
        ("pallas-bf16", True, "bfloat16"),
    )
    for name, use_pallas, dtype in paths:
        layer = MMALayer(
            in_features=n_feat, out_features=n_feat, aggregators=aggregators,
            compute_dtype=dtype,
        )
        params = layer.init(jax.random.PRNGKey(0))
        opt_state = opt.init(params)

        @jax.jit
        def step(p, o, x, up=use_pallas, layer=layer):
            def loss(pp):
                out = layer.apply(pp, x, graph, use_pallas=up)
                return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) ** 2)

            g = jax.grad(loss)(p)
            u, o2 = opt.update(g, o, p)
            return optax.apply_updates(p, u), o2

        try:
            dt = _time_fn(step, params, opt_state, h, iters=15)
            res[name] = {"time_s": dt, "edges_per_s": n_edges / dt}
        except Exception as e:
            log(f"  train path {name} failed: {type(e).__name__}: {str(e)[:200]}")
    return res


def bench_zinc_conv(batch_size=64, seed=0):
    import jax
    import jax.numpy as jnp

    from mma_tpu.data import load_zinc
    from mma_tpu.models import ZincNet
    from mma_tpu.nn.mma_conv import compute_avg_deg

    ds = load_zinc("val", subset_size=batch_size)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()),
        towers=5,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    batch = next(ds.batches(batch_size, n_node=batch_size * 40, n_edge=batch_size * 100))
    n_edges = int(np.asarray(batch.graph.num_edges)) * model.num_layers

    def fwd(p, s, b):
        pred, _ = model.apply(p, s, b, training=False)
        return pred

    f = jax.jit(fwd)
    dt = _time_fn(f, params, state, batch)
    return {"time_s": dt, "edges_per_s": n_edges / dt}


def main():
    import jax

    platform = jax.devices()[0].platform
    log(f"bench on {jax.devices()[0]} ({platform})")

    details = {"platform": platform}

    # Pubmed structure (synthetic features OK: structure drives the cost).
    from mma_tpu.data import load_planetoid

    pubmed = load_planetoid("pubmed", synthetic_features=True)
    details["pubmed"] = bench_node_mma(
        pubmed.graph, 16, ("min", "min2", "min3", "min4")
    )
    log("pubmed:", json.dumps(details["pubmed"]))

    details["zinc"] = bench_zinc_conv()
    log("zinc:", json.dumps(details["zinc"]))

    big = powerlaw_graph(131072, avg_deg=16, seed=1)
    details["synthetic-large"] = bench_node_mma(big, 64, ("mean", "mean2"))
    log("synthetic-large:", json.dumps(details["synthetic-large"]))
    details["synthetic-large-train"] = bench_node_mma_train(big, 64, ("mean", "mean2"))
    log("synthetic-large-train:", json.dumps(details["synthetic-large-train"]))

    head = details["synthetic-large"]
    best_name = max(head, key=lambda k: head[k]["edges_per_s"])
    value = head[best_name]["edges_per_s"]
    vs_baseline = value / head["xla"]["edges_per_s"]
    details["headline"] = {"workload": "synthetic-large", "path": best_name}

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "mma_layer_edges_per_s_per_chip",
                "value": round(value, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
