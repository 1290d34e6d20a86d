"""Parity of the node-classification stack vs the reference-semantics oracle.

The oracle (tests/oracle.py) restates the reference's per-node-loop math;
the framework computes the same values vectorized. Gate: allclose with
float32 segment-reorder tolerance (SURVEY §7 "hard parts").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.models import NodeClassifier
from mma_tpu.nn.mma_layer import MMALayer
from mma_tpu.ops import masked_multi_aggregate, get_agg_spec

from helpers import random_symmetric_graph, unpad
from oracle import (
    oracle_mma_aggregator,
    oracle_mma_forward,
    oracle_node_classifier,
)

N, F = 24, 16


@pytest.fixture(scope="module")
def setup():
    a, add_all, graph = random_symmetric_graph(N, p=0.25, seed=3)
    rs = np.random.RandomState(0)
    h = rs.randn(graph.n_node, F).astype(np.float32)
    h[N:] = 0.0
    return a, add_all, graph, h


ALL_USABLE = [
    "sum", "sum2", "sum3", "sum4",
    "mean", "mean2", "mean3", "mean4",
    "max", "max2", "max3", "max4",
    "min", "min2", "min3", "min4",
    "softmax", "softmin",
]


@pytest.mark.parametrize("name", ALL_USABLE)
@pytest.mark.parametrize("activation", ["new_sigmoid", "sigmoid"])
def test_single_aggregator_matches_oracle(setup, name, activation):
    a, add_all, graph, h = setup
    rs = np.random.RandomState(42)
    mask_w = (rs.randn(1, 2 * F, F) * 0.2).astype(np.float32)

    got = masked_multi_aggregate(
        jnp.asarray(h), graph, jnp.asarray(mask_w), (get_agg_spec(name),),
        activation=activation, parity=True,
    )
    want = oracle_mma_aggregator(name, h[:N], add_all, mask_w[0], activation)
    # Split tolerances (SURVEY §7): min/max center-combines don't
    # reassociate — only the neighbor masked-sum does — so they gate at
    # 1e-6; the sum/mean family keeps 2e-5 for the re-associated sums.
    spec = get_agg_spec(name)
    tol = 1e-6 if spec.combine in ("min", "max") else 2e-5
    np.testing.assert_allclose(unpad(got[:, 0, :], N), want, rtol=tol, atol=tol)


def test_n1_activation_table(setup):
    """N1: under new_sigmoid, 'max' uses raw logits but 'max2' sigmoids."""
    a, add_all, graph, h = setup
    rs = np.random.RandomState(1)
    mask_w = (rs.randn(1, 2 * F, F) * 0.5).astype(np.float32)
    kw = dict(parity=True)
    raw = masked_multi_aggregate(
        jnp.asarray(h), graph, jnp.asarray(mask_w), (get_agg_spec("max"),),
        activation="new_sigmoid", **kw)
    sig = masked_multi_aggregate(
        jnp.asarray(h), graph, jnp.asarray(mask_w), (get_agg_spec("max2"),),
        activation="new_sigmoid", **kw)
    assert not np.allclose(np.asarray(raw), np.asarray(sig))
    # and max ≡ max2 when activation is plain sigmoid
    raw2 = masked_multi_aggregate(
        jnp.asarray(h), graph, jnp.asarray(mask_w), (get_agg_spec("max"),),
        activation="sigmoid", **kw)
    np.testing.assert_allclose(np.asarray(raw2), np.asarray(sig), rtol=1e-6)


@pytest.mark.parametrize(
    "aggregators",
    [("mean", "mean2"), ("min", "min2", "min3"), ("min", "min2", "min3", "min4"),
     ("sum", "max2", "softmax")],
)
def test_mma_layer_matches_reference_forward(setup, aggregators):
    a, add_all, graph, h = setup
    layer = MMALayer(in_features=F, out_features=7, aggregators=aggregators)
    params = layer.init(jax.random.PRNGKey(0))
    got = layer.apply(params, jnp.asarray(h), graph)

    want = oracle_mma_forward(
        h[:N], a, add_all,
        np.asarray(params["masks"]), np.asarray(params["w"]), np.asarray(params["b"]),
        list(aggregators),
    )
    np.testing.assert_allclose(unpad(got, N), want, rtol=2e-4, atol=2e-4)


def test_full_model_matches_reference_forward(setup):
    a, add_all, graph, h = setup
    rs = np.random.RandomState(7)
    x = rs.randn(graph.n_node, 11).astype(np.float32)
    x[N:] = 0.0
    model = NodeClassifier(
        n_feat=11, n_hidden=F, n_class=5, aggregators=("mean", "mean2"),
    )
    params = model.init(jax.random.PRNGKey(1))
    got = model.apply(params, jnp.asarray(x), graph, training=False)

    oracle_params = {
        "gc1_w": np.asarray(params["gc1"]["w"]),
        "gc1_b": np.asarray(params["gc1"]["b"]),
        "masks": np.asarray(params["mma"]["masks"]),
        "mma_w": np.asarray(params["mma"]["w"]),
        "mma_b": np.asarray(params["mma"]["b"]),
    }
    want = oracle_node_classifier(x[:N], a, add_all, oracle_params, ["mean", "mean2"])
    np.testing.assert_allclose(unpad(got, N), want, rtol=2e-4, atol=2e-4)


def test_fixed_mode_scalers_differ_and_are_finite(setup):
    a, add_all, graph, h = setup
    layer_p = MMALayer(in_features=F, out_features=7, aggregators=("mean",), parity=True)
    layer_f = MMALayer(in_features=F, out_features=7, aggregators=("mean",), parity=False)
    params = layer_p.init(jax.random.PRNGKey(0))
    got_p = layer_p.apply(params, jnp.asarray(h), graph)
    got_f = layer_f.apply(params, jnp.asarray(h), graph)
    assert np.all(np.isfinite(np.asarray(got_f)))
    assert not np.allclose(np.asarray(got_p), np.asarray(got_f))
