"""Fused Pallas segmented min/max vs the XLA segment ops.

min/max reductions never re-associate, so the parity gate here is tight
(≤1e-6 — SURVEY §7 calls this out; the only error source is the 3-term
bf16 split in the selection contraction, ~1e-7 relative). Gradients are
checked against XLA's segment_min/max VJP on continuous data (ties are
measure-zero) and against an explicit equal-split oracle on tied data.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.ops.pallas.segment_minmax import fused_segment_minmax

from helpers import random_symmetric_graph


def _xla_minmax(data, g, ops):
    cols = []
    for op in ops:
        neutral = jnp.inf if op == "min" else -jnp.inf
        fn = jax.ops.segment_min if op == "min" else jax.ops.segment_max
        cols.append(
            fn(
                jnp.where(g.edge_mask[:, None], data, neutral),
                g.dst, num_segments=g.n_node, indices_are_sorted=True,
            )
        )
    return jnp.concatenate(cols, axis=1)


@pytest.mark.parametrize(
    "n,p,seed,ops",
    [
        (50, 0.10, 0, ("min", "max")),
        (300, 0.03, 1, ("min", "max")),
        (7, 0.50, 2, ("max",)),
        (1000, 0.004, 3, ("min",)),
    ],
)
def test_minmax_matches_xla(n, p, seed, ops):
    _, _, g = random_symmetric_graph(n, p=p, seed=seed)
    rs = np.random.RandomState(seed)
    c = 128
    data = jnp.asarray(rs.randn(g.n_edge, c).astype(np.float32))
    out = np.asarray(fused_segment_minmax(data, g, ops))
    want = np.asarray(_xla_minmax(data, g, ops))
    sel = np.asarray(g.node_mask) & (np.asarray(g.deg) > 0)
    np.testing.assert_allclose(out[sel], want[sel], rtol=1e-6, atol=1e-6)
    # Empty real rows hold the op's neutral element.
    empty = np.asarray(g.node_mask) & ~(np.asarray(g.deg) > 0)
    for pi, op in enumerate(ops):
        neutral = np.inf if op == "min" else -np.inf
        assert np.all(out[empty, pi * c : (pi + 1) * c] == neutral)


def test_minmax_grad_matches_xla():
    _, _, g = random_symmetric_graph(120, p=0.06, seed=5)
    rs = np.random.RandomState(5)
    c = 128
    data = jnp.asarray(rs.randn(g.n_edge, c).astype(np.float32))
    ct = jnp.asarray(rs.randn(g.n_node, 2 * c).astype(np.float32))
    sel = (g.node_mask & (g.deg > 0))[:, None]

    def loss(fn, d):
        return jnp.sum(jnp.where(sel, fn(d), 0.0) * ct)

    gf = jax.grad(lambda d: loss(lambda x: fused_segment_minmax(x, g, ("min", "max")), d))(data)
    gx = jax.grad(lambda d: loss(lambda x: _xla_minmax(x, g, ("min", "max")), d))(data)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-5, atol=1e-5)


def test_minmax_grad_routes_ties_to_first_hit():
    """On tied data the VJP routes each segment's cotangent ENTIRELY to
    the first tied edge (torch_scatter's argmin/argmax routing — the
    reference backward sends the gradient to a single index,
    ``graph_regression/mma_conv.py:166-172``). Components still sum to
    the cotangent per segment."""
    _, _, g = random_symmetric_graph(40, p=0.15, seed=7)
    data = jnp.ones((g.n_edge, 8))  # every edge ties
    ct = jnp.ones((g.n_node, 8))
    sel = (g.node_mask & (g.deg > 0))[:, None]

    grad = np.asarray(jax.grad(
        lambda d: jnp.sum(
            jnp.where(sel, fused_segment_minmax(d, g, ("max",)), 0.0) * ct
        )
    )(data))
    # Expected: 1.0 exactly at each real nonempty row's FIRST edge.
    rp = np.asarray(g.row_ptr)
    nm = np.asarray(g.node_mask)
    deg = np.asarray(g.deg)
    want = np.zeros_like(grad)
    for i in range(g.n_node):
        if nm[i] and deg[i] > 0:
            want[rp[i]] = 1.0
    np.testing.assert_allclose(grad, want, rtol=1e-6, atol=1e-6)


def test_minmax_wide_channel_grad():
    """ZINC-width channels (towers: 5·75 = 375 lanes) force the adaptive
    backward block_b (the full 1024-edge block would blow the 16 MB
    scoped-VMEM limit at this width); values AND grads must still match
    XLA, including runs spanning the smaller chunks."""
    _, _, g = random_symmetric_graph(60, p=0.3, seed=11)
    rs = np.random.RandomState(11)
    data = jnp.asarray(rs.randn(g.n_edge, 375).astype(np.float32))
    ct = jnp.asarray(rs.randn(g.n_node, 750).astype(np.float32))
    sel = (g.node_mask & (g.deg > 0))[:, None]

    def loss(fn):
        return lambda d: jnp.sum(jnp.where(sel, fn(d), 0.0) * ct)

    out = loss(lambda d: fused_segment_minmax(d, g, ("min", "max")))
    ref = loss(lambda d: _xla_minmax(d, g, ("min", "max")))
    np.testing.assert_allclose(out(data), ref(data), rtol=1e-5)
    gf = np.asarray(jax.grad(out)(data))
    gx = np.asarray(jax.grad(ref)(data))
    np.testing.assert_allclose(gf, gx, rtol=1e-5, atol=1e-5)


def test_minmax_max_run_cap():
    """Capping the scan at the true max degree changes nothing on real
    rows (the padding node's run may exceed the cap; its row is masked)."""
    _, _, g = random_symmetric_graph(200, p=0.02, seed=9)
    maxdeg = int(np.asarray(g.deg).max())
    rs = np.random.RandomState(9)
    data = jnp.asarray(rs.randn(g.n_edge, 128).astype(np.float32))
    a = np.asarray(fused_segment_minmax(data, g, ("min", "max")))
    b = np.asarray(fused_segment_minmax(data, g, ("min", "max"), max_run=maxdeg))
    nm = np.asarray(g.node_mask)
    np.testing.assert_array_equal(a[nm], b[nm])


# ---- fused min/max EDGE PROGRAM (message build + dropout + reduce) ----

from mma_tpu.ops.pallas.segment_minmax import (  # noqa: E402
    _dropout_keep,
    fused_minmax_edge_program,
)


def _ref_prog(c, hg, g, ops, mask=None):
    """Reference: materialize x = m ⊙ (hg + c[dst]) then XLA min/max."""
    x = hg + c[np.asarray(g.dst)]
    if mask is not None:
        x = x * mask
    return _xla_minmax(jnp.asarray(x), g, ops)


def test_minmax_edge_program_matches_xla():
    """Dropout off: the fused edge program (in-kernel c[dst] select) ==
    materialized message + XLA segment min/max — values and BOTH input
    grads (dc via the in-kernel block reduce, dhg via first-hit routing;
    continuous data so ties are measure-zero)."""
    _, _, g = random_symmetric_graph(80, p=0.1, seed=13)
    rs = np.random.RandomState(13)
    c = jnp.asarray(rs.randn(g.n_node, 24).astype(np.float32))
    hg = jnp.asarray(rs.randn(g.n_edge, 24).astype(np.float32))
    ct = jnp.asarray(rs.randn(g.n_node, 48).astype(np.float32))
    sel = (g.node_mask & (g.deg > 0))[:, None]

    def loss(fn):
        return lambda args: jnp.sum(jnp.where(sel, fn(*args), 0.0) * ct)

    fused = loss(lambda c_, h_: fused_minmax_edge_program(c_, h_, g, ("min", "max")))
    ref = loss(lambda c_, h_: _ref_prog(c_, h_, g, ("min", "max")))
    np.testing.assert_allclose(fused((c, hg)), ref((c, hg)), rtol=1e-6)
    gf = jax.grad(fused)((c, hg))
    gx = jax.grad(ref)((c, hg))
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_minmax_edge_program_dropout():
    """Dropout on: matches a reference that applies the SAME position-
    keyed mask (the hash is pure and importable), forward and grads;
    deterministic across calls; keep-rate ≈ 1-rate."""
    _, _, g = random_symmetric_graph(60, p=0.12, seed=17)
    rs = np.random.RandomState(17)
    ch = 16
    c = jnp.asarray(rs.randn(g.n_node, ch).astype(np.float32))
    hg = jnp.asarray(rs.randn(g.n_edge, ch).astype(np.float32))
    ct = jnp.asarray(rs.randn(g.n_node, 2 * ch).astype(np.float32))
    seed = jnp.asarray([1234], jnp.int32)
    sel = (g.node_mask & (g.deg > 0))[:, None]

    pos = jnp.arange(g.n_edge, dtype=jnp.int32)[:, None]
    lane = jnp.arange(ch, dtype=jnp.int32)[None, :]
    mask = _dropout_keep(seed[0], pos, lane, 0.5)
    assert 0.35 < float((mask > 0).mean()) < 0.65

    def loss(fn):
        return lambda args: jnp.sum(jnp.where(sel, fn(*args), 0.0) * ct)

    fused = loss(lambda c_, h_: fused_minmax_edge_program(
        c_, h_, g, ("min", "max"), seed=seed, rate=0.5))
    ref = loss(lambda c_, h_: _ref_prog(c_, h_, g, ("min", "max"),
                                        mask=np.asarray(mask)))
    v1, v2 = fused((c, hg)), fused((c, hg))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(v1, ref((c, hg)), rtol=1e-6)
    gf = jax.grad(fused)((c, hg))
    gx = jax.grad(ref)((c, hg))
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_minmax_edge_program_wide_channels():
    """ZINC width (375 lanes) exercises the adaptive fwd/bwd block_b."""
    _, _, g = random_symmetric_graph(50, p=0.25, seed=19)
    rs = np.random.RandomState(19)
    c = jnp.asarray(rs.randn(g.n_node, 375).astype(np.float32))
    hg = jnp.asarray(rs.randn(g.n_edge, 375).astype(np.float32))
    ct = jnp.asarray(rs.randn(g.n_node, 750).astype(np.float32))
    sel = (g.node_mask & (g.deg > 0))[:, None]

    def loss(fn):
        return lambda args: jnp.sum(jnp.where(sel, fn(*args), 0.0) * ct)

    fused = loss(lambda c_, h_: fused_minmax_edge_program(c_, h_, g, ("min", "max")))
    ref = loss(lambda c_, h_: _ref_prog(c_, h_, g, ("min", "max")))
    np.testing.assert_allclose(fused((c, hg)), ref((c, hg)), rtol=1e-5)
    gf = jax.grad(fused)((c, hg))
    gx = jax.grad(ref)((c, hg))
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
