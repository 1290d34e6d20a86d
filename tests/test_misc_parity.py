"""Remaining parity-surface tests: N2 (always-on eval dropout), N5
(broken aggregators gated by parity), N8 (suffixed scatter names raise in
graph regression), fixed-mode extended aggregators, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.models import NodeClassifier
from mma_tpu.nn.mma_conv import MultiMaskConv
from mma_tpu.nn.mma_layer import MMALayer
from mma_tpu.ops import masked_multi_aggregate, get_agg_spec

from helpers import random_symmetric_graph

N, F = 30, 8


@pytest.fixture(scope="module")
def setup():
    a, add_all, graph = random_symmetric_graph(N, p=0.2, seed=9)
    rs = np.random.RandomState(1)
    x = np.zeros((graph.n_node, 6), np.float32)
    x[:N] = rs.randn(N, 6)
    return graph, jnp.asarray(x)


def test_n2_eval_dropout_parity(setup):
    """Reference eval keeps mask dropout active (N2). With
    parity_eval_dropout the eval forward is stochastic across rngs;
    without it, eval is deterministic."""
    graph, x = setup
    model = NodeClassifier(
        n_feat=6, n_hidden=F, n_class=3, aggregators=("mean",), dropout_rate=0.5
    )
    params = model.init(jax.random.PRNGKey(0))
    o1 = model.apply(params, x, graph, training=False,
                     rng=jax.random.PRNGKey(1), parity_eval_dropout=True)
    o2 = model.apply(params, x, graph, training=False,
                     rng=jax.random.PRNGKey(2), parity_eval_dropout=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    d1 = model.apply(params, x, graph, training=False)
    d2 = model.apply(params, x, graph, training=False)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_n5_broken_aggregators_gated_by_parity(setup):
    for name in ("std", "normalized_mean", "moment_3"):
        with pytest.raises(ValueError, match="unusable in the reference"):
            MMALayer(in_features=F, out_features=3, aggregators=(name,),
                     parity=True).specs
        # fixed mode provides the intended semantics, finite outputs
        graph, x = setup
        layer = MMALayer(in_features=6, out_features=3, aggregators=(name,),
                         parity=False)
        params = layer.init(jax.random.PRNGKey(0))
        out = layer.apply(params, x, graph)
        assert np.all(np.isfinite(np.asarray(out))), name


def test_n8_suffixed_aggregators_raise_in_graph_regression():
    with pytest.raises(ValueError, match="Unknown aggregator"):
        MultiMaskConv(
            in_channels=8, out_channels=8, aggregators=("min2",),
            scalers=("identity",), avg_deg=(("lin", 1.0), ("log", 1.0)),
        )


def test_unknown_aggregator_raises():
    with pytest.raises(ValueError, match="Unknown aggregator"):
        get_agg_spec("median")


def test_aggregation_deterministic(setup):
    """Same inputs ⇒ bitwise-identical outputs (no atomics / nondeterministic
    scatter — SURVEY §5.2 determinism requirement)."""
    graph, x = setup
    rs = np.random.RandomState(3)
    h = jnp.asarray(rs.randn(graph.n_node, F).astype(np.float32))
    w = jnp.asarray(rs.randn(1, 2 * F, F).astype(np.float32))
    spec = (get_agg_spec("sum"),)
    o1 = masked_multi_aggregate(h, graph, w, spec)
    o2 = masked_multi_aggregate(h, graph, w, spec)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_batchnorm_matches_torch():
    """BatchNorm (train + eval + running stats) matches torch.nn.BatchNorm1d."""
    torch = pytest.importorskip("torch")
    from mma_tpu.nn.layers import BatchNorm

    rs = np.random.RandomState(0)
    bn = BatchNorm(5)
    params = bn.init(None)
    state = bn.init_state()
    tbn = torch.nn.BatchNorm1d(5)

    for step in range(3):
        x = rs.randn(16, 5).astype(np.float32)
        tbn.train()
        want = tbn(torch.tensor(x)).detach().numpy()
        got, state = bn.apply(params, state, jnp.asarray(x), training=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(state["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-5
    )

    x = rs.randn(16, 5).astype(np.float32)
    tbn.eval()
    want = tbn(torch.tensor(x)).detach().numpy()
    got, _ = bn.apply(params, state, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
