"""Part 2 of the sampled-ELL bisection: binary_spmm units (CSR vs ELL)
at ogbn-like shapes + the layer grad after the composed collapse→CSC
backward."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t_chain(f, *args, iters=10, warmup=2):
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
    from mma_tpu.data.sampling import NeighborSampler

    rs = np.random.RandomState(3)
    n = 400_000
    m = n * 40
    a = (rs.rand(m) ** 2 * n).astype(np.int64)
    b = rs.randint(0, n, size=m)
    keep = a != b
    src = np.concatenate([a[keep], b[keep]]).astype(np.int32)
    dst = np.concatenate([b[keep], a[keep]]).astype(np.int32)
    sampler = NeighborSampler.from_host_arrays(src, dst, n, (10, 10, 5), seed=4)
    seeds = rs.randint(0, n, 1024)
    hop_max = np.zeros(4, np.int64)
    max_edges = 0
    for _ in range(2):
        hc, _, s_c, _ = sampler._structure(
            rs.randint(0, n, 1024),
            sampler._structural_node_bound(1024),
            sampler._structural_edge_bound(1024),
        )
        hop_max = np.maximum(hop_max, hc)
        max_edges = max(max_edges, len(s_c))
    hop_pads = tuple(int(-(-int(c * 1.5) // 256) * 256) if i else 1024
                     for i, c in enumerate(hop_max))
    n_node_pad = -(-(sum(hop_pads) + 1) // 8192) * 8192
    n_edge_pad = -(-int(max_edges * 1.5) // 8192) * 8192
    b_ell = sampler.sample(seeds, n_node_pad=n_node_pad,
                           n_edge_pad=n_edge_pad, hop_node_pads=hop_pads)
    b_csr = sampler.sample(seeds, n_node_pad=n_node_pad,
                           n_edge_pad=n_edge_pad)
    g_ell, g_csr = b_ell.graph, b_csr.graph
    log(f"subgraph: nodes {b_ell.num_nodes} edges "
        f"{int(np.asarray(g_ell.num_edges))}")

    from mma_tpu.ops.spmm import binary_spmm

    x = jnp.asarray(
        rs.randn(n_node_pad, 64).astype(np.float32)
    ).astype(jnp.bfloat16)
    ones = jnp.ones((8, 128), jnp.float32) * 1e-30

    for name, g in (("csr", g_csr), ("ell", g_ell)):
        def loss(x_, g=g):
            return jnp.sum(binary_spmm(g, x_, use_pallas=True) ** 2)

        @jax.jit
        def fwd_c(carry, x_, loss=loss):
            x_ = x_ + carry[0, 0].astype(x_.dtype) * 0
            return carry + loss(x_) * ones

        @jax.jit
        def grad_c(carry, x_, loss=loss):
            x_ = x_ + carry[0, 0].astype(x_.dtype) * 0
            return carry + jnp.sum(
                jax.grad(loss)(x_).astype(jnp.float32)) * ones

        log(f"spmm {name} fwd:  {t_chain(fwd_c, x):7.2f} ms")
        log(f"spmm {name} grad: {t_chain(grad_c, x):7.2f} ms")

    # layer grad after the composed collapse->CSC backward
    from mma_tpu.nn.mma_layer import MMALayer

    layer = MMALayer(64, 47, ("mean", "mean2"), compute_dtype="bfloat16")
    params = layer.init(jax.random.PRNGKey(0))
    h = jnp.asarray(rs.randn(n_node_pad, 64).astype(np.float32))

    for name, g in (("csr", g_csr), ("ell", g_ell)):
        def loss(h_, g=g):
            out = layer.apply(params, h_, g, rng=jax.random.PRNGKey(1),
                              use_pallas=True)
            return jnp.sum(jnp.where(g.node_mask[:, None], out, 0.0) ** 2)

        @jax.jit
        def grad_c(carry, h_, loss=loss):
            h_ = h_ + carry[0, 0] * 0
            return carry + jnp.sum(jax.grad(loss)(h_)) * ones

        log(f"layer {name} grad (csc-direct): {t_chain(grad_c, h):7.2f} ms")


if __name__ == "__main__":
    main()
