"""Parity of MultiMaskConv vs the reference-semantics oracle, plus ZincNet
end-to-end shape/finiteness and batching invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.data import load_zinc
from mma_tpu.models import ZincNet
from mma_tpu.nn.mma_conv import MultiMaskConv, compute_avg_deg

from helpers import random_symmetric_graph, unpad
from oracle import oracle_zinc_conv

N, F, EDGE_DIM, TOWERS = 18, 8, 6, 2


def _conv_and_params(aggregators, scalers, parity, towers=TOWERS):
    avg_deg = (("lin", 2.1), ("log", 1.05), ("exp", 9.3))
    conv = MultiMaskConv(
        in_channels=F,
        out_channels=F,
        aggregators=aggregators,
        scalers=scalers,
        avg_deg=avg_deg,
        edge_dim=EDGE_DIM,
        towers=towers,
        parity=parity,
    )
    params = conv.init(jax.random.PRNGKey(0))
    return conv, params, dict(avg_deg)


def _oracle_params(params, towers):
    return {
        "pre": [
            [(np.asarray(t[0]["w"]), np.asarray(t[0]["b"])) for t in agg]
            for agg in params["pre_nns"]
        ],
        "post": [
            (np.asarray(t[0]["w"]), np.asarray(t[0]["b"])) for t in params["post_nns"]
        ],
        "lin": (np.asarray(params["lin"]["w"]), np.asarray(params["lin"]["b"])),
    }


@pytest.mark.parametrize("parity", [True, False])
@pytest.mark.parametrize(
    "aggregators,scalers",
    [
        (("min", "max"), ("identity", "amplification", "linear")),  # README.md:79 config
        (("sum", "mean"), ("identity",)),
        (("mean", "var", "std"), ("attenuation", "inverse_linear")),
    ],
)
def test_conv_matches_oracle(aggregators, scalers, parity):
    a, _, graph = random_symmetric_graph(N, p=0.2, seed=11)
    rs = np.random.RandomState(5)
    x = np.zeros((graph.n_node, F), np.float32)
    x[:N] = rs.randn(N, F).astype(np.float32)
    edge_attr = rs.randn(graph.n_edge, EDGE_DIM).astype(np.float32)

    conv, params, avg_deg = _conv_and_params(aggregators, scalers, parity)
    got = conv.apply(params, jnp.asarray(x), graph, edge_attr=jnp.asarray(edge_attr))

    # Oracle works on the unpadded graph in the same dst-sorted edge order.
    e_mask = np.asarray(graph.edge_mask)
    src = np.asarray(graph.src)[e_mask]
    dst = np.asarray(graph.dst)[e_mask]
    enc_w = np.asarray(params["edge_encoder"]["w"])
    enc_b = np.asarray(params["edge_encoder"]["b"])
    e_enc = edge_attr[e_mask] @ enc_w + enc_b
    want = oracle_zinc_conv(
        x[:N], src, dst, e_enc, _oracle_params(params, TOWERS),
        list(aggregators), list(scalers), avg_deg, TOWERS, parity=parity,
    )
    np.testing.assert_allclose(unpad(got, N), want, rtol=3e-4, atol=3e-4)


def test_avg_deg_parity_vs_fixed():
    hist = jnp.asarray([3.0, 10.0, 25.0, 8.0, 1.0])
    p = compute_avg_deg(hist, parity=True)
    f = compute_avg_deg(hist, parity=False)
    # parity: statistics over histogram *counts* (mma_conv.py:73-78)
    np.testing.assert_allclose(p["lin"], np.mean([3, 10, 25, 8, 1]), rtol=1e-6)
    # fixed: true mean degree
    np.testing.assert_allclose(
        f["lin"], (0 * 3 + 1 * 10 + 2 * 25 + 3 * 8 + 4 * 1) / 47.0, rtol=1e-6
    )


def test_n6_last_aggregator_messages():
    """Parity mode must be invariant to the *first* aggregator's pre-NN."""
    a, _, graph = random_symmetric_graph(N, p=0.2, seed=2)
    rs = np.random.RandomState(8)
    x = rs.randn(graph.n_node, F).astype(np.float32)
    edge_attr = rs.randn(graph.n_edge, EDGE_DIM).astype(np.float32)
    conv, params, _ = _conv_and_params(("min", "max"), ("identity",), parity=True)
    out1 = conv.apply(params, jnp.asarray(x), graph, edge_attr=jnp.asarray(edge_attr))
    # Perturb aggregator 0 ("min") pre-NN — in parity mode this is dead.
    params2 = jax.tree.map(lambda v: v, params)
    params2["pre_nns"][0][0][0]["w"] = params["pre_nns"][0][0][0]["w"] + 1.0
    out2 = conv.apply(params2, jnp.asarray(x), graph, edge_attr=jnp.asarray(edge_attr))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    # ... but live in fixed mode.
    convf, paramsf, _ = _conv_and_params(("min", "max"), ("identity",), parity=False)
    o1 = convf.apply(paramsf, jnp.asarray(x), graph, edge_attr=jnp.asarray(edge_attr))
    paramsf["pre_nns"][0][0][0]["w"] = paramsf["pre_nns"][0][0][0]["w"] + 1.0
    o2 = convf.apply(paramsf, jnp.asarray(x), graph, edge_attr=jnp.asarray(edge_attr))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_n7_pre_nns_get_no_gradient_in_parity():
    a, _, graph = random_symmetric_graph(N, p=0.2, seed=4)
    rs = np.random.RandomState(9)
    x = rs.randn(graph.n_node, F).astype(np.float32)
    edge_attr = rs.randn(graph.n_edge, EDGE_DIM).astype(np.float32)

    for parity, expect_zero in [(True, True), (False, False)]:
        conv, params, _ = _conv_and_params(("min", "max"), ("identity",), parity)

        def loss(p):
            out = conv.apply(p, jnp.asarray(x), graph, edge_attr=jnp.asarray(edge_attr))
            return jnp.sum(out**2)

        g = jax.grad(loss)(params)
        gnorm = float(
            sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g["pre_nns"]))
        )
        if expect_zero:
            assert gnorm == 0.0, gnorm
        else:
            assert gnorm > 0.0
        # post-NNs always train
        assert float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g["post_nns"]))) > 0


def test_zinc_net_end_to_end():
    ds = load_zinc("val", subset_size=64)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()),
        towers=5,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    batch = next(ds.batches(16, n_node=16 * 40, n_edge=16 * 100))
    pred, new_state = model.apply(params, state, batch, training=True, rng=jax.random.PRNGKey(1))
    assert pred.shape == (16,)
    assert np.all(np.isfinite(np.asarray(pred)))
    # BatchNorm state updated
    assert not np.allclose(
        np.asarray(new_state["bn0"]["mean"]), np.asarray(state["bn0"]["mean"])
    )


def test_batching_padding_invariance():
    """Same graphs, different padding ⇒ same predictions (static-shape safety)."""
    ds = load_zinc("val", subset_size=8)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()),
        towers=3,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    b1 = next(ds.batches(8, n_node=8 * 40, n_edge=8 * 100))
    b2 = next(ds.batches(8, n_node=8 * 60 + 3, n_edge=8 * 150 + 17))
    p1, _ = model.apply(params, state, b1, training=False)
    p2, _ = model.apply(params, state, b2, training=False)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-5)


def test_divide_input_towers():
    """divide_input=True splits features between towers (per-tower einsum
    path of the flat layout)."""
    a, _, graph = random_symmetric_graph(N, p=0.2, seed=13)
    rs = np.random.RandomState(6)
    x = rs.randn(graph.n_node, F).astype(np.float32)
    edge_attr = rs.randn(graph.n_edge, EDGE_DIM).astype(np.float32)
    conv = MultiMaskConv(
        in_channels=F, out_channels=F, aggregators=("sum", "max"),
        scalers=("identity",), avg_deg=(("lin", 2.0), ("log", 1.0)),
        edge_dim=EDGE_DIM, towers=2, divide_input=True, parity=False,
    )
    params = conv.init(jax.random.PRNGKey(3))
    out = conv.apply(params, jnp.asarray(x), graph, edge_attr=jnp.asarray(edge_attr))
    assert out.shape == (graph.n_node, F)
    assert np.all(np.isfinite(np.asarray(out)))
    # towers see different feature halves: permuting the second half of
    # features must change the output
    x2 = x.copy()
    x2[:, F // 2:] = x2[::-1, F // 2:]
    out2 = conv.apply(params, jnp.asarray(x2), graph, edge_attr=jnp.asarray(edge_attr))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_remat_matches_non_remat():
    """jax.checkpoint'ed conv layers give identical outputs and gradients."""
    ds = load_zinc("val", subset_size=8)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    kw = dict(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()),
        towers=3, num_layers=2,
    )
    m1 = ZincNet(**kw)
    m2 = ZincNet(**kw, remat=True)
    params = m1.init(jax.random.PRNGKey(0))
    state = m1.init_state()
    batch = next(ds.batches(8, n_node=8 * 40, n_edge=8 * 100))

    def loss(model, p):
        pred, _ = model.apply(p, state, batch, training=False)
        return jnp.sum((pred * batch.graph_mask) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(m2, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("parity", [True, False])
def test_conv_pallas_matches_xla_minmax(parity):
    """The fused Pallas min/max path (README.md:79 flagship aggregators)
    matches the XLA path — value and parameter/input gradients. min/max
    never re-associate, so the gate is tight (the only kernel error
    source is the 3-term bf16 selection split, ~1e-7 relative)."""
    _, _, graph = random_symmetric_graph(60, p=0.08, seed=3)
    conv, params, _ = _conv_and_params(
        ("min", "max"), ("identity", "amplification", "linear"), parity
    )
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(graph.n_node, F).astype(np.float32))
    e = jnp.asarray(rs.randn(graph.n_edge, EDGE_DIM).astype(np.float32))
    ct = jnp.asarray(rs.randn(graph.n_node, F).astype(np.float32))

    def loss(p, x_, up):
        out = conv.apply(p, x_, graph, edge_attr=e, use_pallas=up)
        return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) * ct)

    vx, gx = jax.value_and_grad(loss, argnums=(0, 1))(params, x, False)
    vp, gp = jax.value_and_grad(loss, argnums=(0, 1))(params, x, True)
    # 1e-5: the fused edge program adds the dst projection LAST
    # (hg + c[dst] vs the XLA path's (p_dst + p_src) + b0 + e·W) — a
    # valid f32 reassociation whose ~1e-7/element drift the min/max
    # selection can amplify at near-ties.
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    flat_x, _ = jax.tree_util.tree_flatten(gx)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    for a_, b_ in zip(flat_p, flat_x):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("parity", [True, False])
def test_conv_pallas_matches_xla_var_std(parity):
    """var/std through the fused sum+sum-of-squares kernel (one edge
    pass) matches the two-XLA-segment-sum formulation — value and
    gradients (reference scatter reduce surface:
    graph_regression/mma_conv.py:167-172)."""
    _, _, graph = random_symmetric_graph(60, p=0.08, seed=5)
    conv, params, _ = _conv_and_params(
        ("var", "std"), ("identity", "linear"), parity
    )
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(graph.n_node, F).astype(np.float32))
    e = jnp.asarray(rs.randn(graph.n_edge, EDGE_DIM).astype(np.float32))
    ct = jnp.asarray(rs.randn(graph.n_node, F).astype(np.float32))

    def loss(p, x_, up):
        out = conv.apply(p, x_, graph, edge_attr=e, use_pallas=up)
        return jnp.sum(jnp.where(graph.node_mask[:, None], out, 0.0) * ct)

    vx, gx = jax.value_and_grad(loss, argnums=(0, 1))(params, x, False)
    vp, gp = jax.value_and_grad(loss, argnums=(0, 1))(params, x, True)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a_, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("use_pallas", [False, True])
def test_conv_bf16_pipeline_close_to_f32(use_pallas):
    """compute_dtype='bfloat16' runs the message build + reduces in bf16
    (half the edge HBM traffic); outputs track the f32 pipeline within
    bf16 rounding (~1e-2 relative at 4 conv-equivalent depth)."""
    _, _, graph = random_symmetric_graph(50, p=0.1, seed=7)
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(graph.n_node, F).astype(np.float32))
    e = jnp.asarray(rs.randn(graph.n_edge, EDGE_DIM).astype(np.float32))
    avg_deg = (("lin", 2.1), ("log", 1.05), ("exp", 9.3))
    outs = {}
    for dtype in ("float32", "bfloat16"):
        conv = MultiMaskConv(
            in_channels=F, out_channels=F,
            aggregators=("min", "max"),
            scalers=("identity", "amplification", "linear"),
            avg_deg=avg_deg, edge_dim=EDGE_DIM, towers=TOWERS,
            parity=True, compute_dtype=dtype, max_degree_hint=16,
        )
        params = conv.init(jax.random.PRNGKey(5))
        outs[dtype] = np.asarray(
            conv.apply(params, x, graph, edge_attr=e, use_pallas=use_pallas)
        )
    scale = np.abs(outs["float32"]).max()
    assert np.max(np.abs(outs["bfloat16"] - outs["float32"])) < 3e-2 * scale
