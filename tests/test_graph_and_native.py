"""Graph container/build invariants, native-vs-NumPy parity, and the
fused Pallas kernel (interpret mode) across precisions."""

import numpy as np
import jax.numpy as jnp
import pytest

from mma_tpu.graph import graph_from_dense, graph_from_edges, graph_from_neighbor_lists
from mma_tpu.graph import native
from mma_tpu.graph.build import chunk_hint_from_row_ptr
from mma_tpu.ops.pallas.fused_mma import fused_segment_sum
from mma_tpu.ops.segment import segment_sum

from helpers import random_symmetric_graph


def test_graph_from_dense_roundtrip():
    a, add_all, g = random_symmetric_graph(17, p=0.3, seed=0)
    e_mask = np.asarray(g.edge_mask)
    src, dst = np.asarray(g.src)[e_mask], np.asarray(g.dst)[e_mask]
    # dst sorted, src ascending within dst (reference CSR neighbor order)
    assert np.all(np.diff(dst) >= 0)
    for i in range(17):
        nbrs = src[dst == i]
        np.testing.assert_array_equal(nbrs, np.sort(np.asarray(add_all[i])))
    np.testing.assert_array_equal(
        np.asarray(g.deg)[:17], a.sum(axis=1)
    )
    # row_ptr consistent
    rp = np.asarray(g.row_ptr)
    for i in range(17):
        assert rp[i + 1] - rp[i] == len(add_all[i])


def test_neighbor_list_equals_dense():
    a, add_all, g1 = random_symmetric_graph(23, p=0.2, seed=1)
    g2 = graph_from_neighbor_lists(add_all)
    np.testing.assert_array_equal(np.asarray(g1.src), np.asarray(g2.src))
    np.testing.assert_array_equal(np.asarray(g1.dst), np.asarray(g2.dst))


def test_native_matches_numpy():
    rs = np.random.RandomState(0)
    e, n = 5000, 300
    src = rs.randint(0, n, e).astype(np.int32)
    dst = rs.randint(0, n, e).astype(np.int32)
    s, d, perm = native.sort_edges(src, dst, n)
    order = np.lexsort((src, dst))
    np.testing.assert_array_equal(s, src[order])
    np.testing.assert_array_equal(d, dst[order])
    np.testing.assert_array_equal(src[perm], s)

    rp = native.build_row_ptr(d, n)
    counts = np.bincount(dst, minlength=n)
    np.testing.assert_array_equal(np.diff(rp), counts)

    deg = native.degrees(dst, n)
    np.testing.assert_array_equal(deg, counts.astype(np.float32))

    ss, dd = native.symmetrize(src, dst, n)
    keep = src != dst
    pairs = np.unique(
        np.concatenate(
            [np.stack([dst[keep], src[keep]], 1), np.stack([src[keep], dst[keep]], 1)]
        ),
        axis=0,
    )
    np.testing.assert_array_equal(dd, pairs[:, 0])
    np.testing.assert_array_equal(ss, pairs[:, 1])

    cuts = native.balanced_row_cuts(rp, 4)
    per_part = np.diff(rp[cuts]).astype(float)
    assert cuts[0] == 0 and cuts[-1] == n
    assert per_part.max() - per_part.min() <= counts.max() + e / 4 * 0.1


def test_chunk_hint_bounds_actual_chunks():
    _, _, g = random_symmetric_graph(300, p=0.1, seed=2)
    rp = np.asarray(g.row_ptr)
    max_chunks, total_steps = chunk_hint_from_row_ptr(rp, g.n_node)
    assert (max_chunks, total_steps) == g.chunk_hint
    from mma_tpu.constants import BLOCK_B, BLOCK_R

    counts = []
    for r0 in range(0, g.n_node, BLOCK_R):
        r1 = min(r0 + BLOCK_R, g.n_node)
        s, e = rp[r0], rp[r1]
        counts.append(max(-(-e // BLOCK_B) - s // BLOCK_B, 1))
    assert max(counts) == max_chunks
    assert sum(counts) == total_steps
    # the kernel's universal step bound covers the exact total
    n_blocks = -(-g.n_node // BLOCK_R)
    assert total_steps <= g.n_edge // BLOCK_B + n_blocks


@pytest.mark.parametrize(
    "precision,tol",
    [("fastest", 2e-1), ("high", 5e-4), ("highest", 1e-5)],
)
def test_fused_segment_sum_precisions(precision, tol):
    """The kernel's bf16-split error model holds on every backend (the
    splits are explicit casts, so interpret mode reproduces TPU error)."""
    _, _, g = random_symmetric_graph(400, p=0.05, seed=3)
    rs = np.random.RandomState(0)
    data = rs.randn(g.n_edge, 32).astype(np.float32)
    data[~np.asarray(g.edge_mask)] = 0.0
    want = segment_sum(jnp.asarray(data), g.dst, g.n_node)
    got = fused_segment_sum(jnp.asarray(data), g, precision=precision)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=tol, atol=tol)


def test_fused_segment_sum_custom_blocks_fallback():
    _, _, g = random_symmetric_graph(100, p=0.1, seed=4)
    rs = np.random.RandomState(1)
    data = rs.randn(g.n_edge, 16).astype(np.float32)
    data[~np.asarray(g.edge_mask)] = 0.0
    want = segment_sum(jnp.asarray(data), g.dst, g.n_node)
    got = fused_segment_sum(
        jnp.asarray(data), g, block_r=128, block_b=1024, precision="highest"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_segment_sum_grad_matches_xla():
    """Custom VJP (gather-by-dst) matches the XLA segment-sum gradient."""
    import jax

    _, _, g = random_symmetric_graph(100, p=0.1, seed=5)
    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.randn(g.n_edge, 16).astype(np.float32))

    def mask(d):
        return jnp.where(g.edge_mask[:, None], d, 0.0)

    g1 = jax.grad(lambda d: jnp.sum(
        fused_segment_sum(mask(d), g, precision="highest") ** 2))(data)
    g2 = jax.grad(lambda d: jnp.sum(
        segment_sum(mask(d), g.dst, g.n_node) ** 2))(data)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_mma_layer_pallas_path_matches_xla():
    """MMALayer with use_pallas (fully fused kernel) ≈ XLA path, fwd+grad."""
    import jax
    from mma_tpu.nn.mma_layer import MMALayer

    _, _, g = random_symmetric_graph(200, p=0.08, seed=6)
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(g.n_node, 64).astype(np.float32))
    layer = MMALayer(in_features=64, out_features=8,
                     aggregators=("mean", "max"))
    params = layer.init(jax.random.PRNGKey(0))
    out_x = layer.apply(params, h, g, use_pallas=False)
    out_p = layer.apply(params, h, g, use_pallas=True)
    n = int(np.asarray(g.node_mask).sum())
    np.testing.assert_allclose(
        np.asarray(out_p)[:n], np.asarray(out_x)[:n], rtol=2e-3, atol=2e-3
    )

    def loss(p, use_pallas):
        o = layer.apply(p, h, g, use_pallas=use_pallas)
        return jnp.sum(jnp.where(g.node_mask[:, None], o, 0.0) ** 2)

    g_x = jax.grad(lambda p: loss(p, False))(params)
    g_p = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        # Scale-aware atol: these grads accumulate thousands of terms to
        # magnitudes ~1e6 with heavy cancellation — element-wise error is
        # bounded by the f32 accumulation noise of the ACCUMULATED scale
        # (both paths are valid f32 summation orders), not by a flat tol.
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-5 * scale)


def test_segment_sum_by_src_matches_xla():
    import jax
    from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_by_src

    _, _, g = random_symmetric_graph(150, p=0.1, seed=7)
    rs = np.random.RandomState(0)
    data = rs.randn(g.n_edge, 32).astype(np.float32)
    data[~np.asarray(g.edge_mask)] = 0.0
    want = jax.ops.segment_sum(jnp.asarray(data), g.src, num_segments=g.n_node)
    got = fused_segment_sum_by_src(jnp.asarray(data), g, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bwd_mode", ["csc_gather", "payload_permute"])
@pytest.mark.parametrize("n_agg,n,p", [(1, 100, 0.1), (2, 150, 0.08), (3, 257, 0.05)])
def test_fused_edge_program_fwd_bwd_matches_xla(n_agg, n, p, bwd_mode):
    """fused_mma_edge_program (fully in-kernel fwd + fused bwd kernel)
    matches a pure-XLA restatement for value and all three gradients,
    including padding edges and a sigmoid/identity mixed lane pattern."""
    import jax
    from mma_tpu.ops.pallas.fused_mma import fused_mma_edge_program
    _, _, g = random_symmetric_graph(n, p=p, seed=11 + n_agg)
    rs = np.random.RandomState(n_agg)
    f = 32
    c = jnp.asarray(rs.randn(g.n_node, n_agg * f).astype(np.float32))
    d = jnp.asarray(rs.randn(g.n_node, n_agg * f).astype(np.float32))
    h = jnp.asarray(rs.randn(g.n_node, f).astype(np.float32))
    # Mixed lanes: aggregator 0 identity, others sigmoid (N1-style table).
    pat = jnp.asarray(
        np.repeat(np.array([k > 0 for k in range(n_agg)], bool), f)
    )
    ct = jnp.asarray(rs.randn(g.n_node, n_agg * f).astype(np.float32))

    def xla_ref(c, d, h):
        logits = c[g.dst] + d[g.src]
        mask = jnp.where(pat[None, :], jax.nn.sigmoid(logits), logits)
        msg = mask * jnp.tile(h[g.src], (1, n_agg))
        msg = jnp.where(g.edge_mask[:, None], msg, 0.0)
        return jax.ops.segment_sum(
            msg, g.dst, num_segments=g.n_node, indices_are_sorted=True
        )

    def fused(c, d, h):
        return fused_mma_edge_program(
            c, d, h, pat, g, n_agg, precision="highest", bwd_mode=bwd_mode
        )

    want = xla_ref(c, d, h)
    got = fused(c, d, h)
    # Padding-node output rows may differ (uncovered by edge_mask zeroing
    # in the kernel they accumulate padding-edge messages) — compare real.
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        np.asarray(got)[nm], np.asarray(want)[nm], rtol=1e-5, atol=1e-5
    )

    def loss(fn, c, d, h):
        out = fn(c, d, h)
        return jnp.sum(jnp.where(g.node_mask[:, None], out, 0.0) * ct)

    gw = jax.grad(lambda *a: loss(xla_ref, *a), argnums=(0, 1, 2))(c, d, h)
    gg = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2))(c, d, h)
    for name, a, b in zip(("dc", "dd", "dh"), gw, gg):
        np.testing.assert_allclose(
            np.asarray(b)[nm], np.asarray(a)[nm], rtol=2e-5, atol=2e-5,
            err_msg=name,
        )
