"""Property-based tests (hypothesis) over random graphs and configs.

Three invariants that must hold for *any* graph, not just the seeded
fixtures used elsewhere:

1. The vectorized XLA path matches the per-node-loop oracle
   (reference semantics, ``node_classification/layers.py:201-851``) for
   a randomly drawn aggregator/activation on a randomly drawn graph.
2. The fused Pallas edge program (interpret mode on CPU) matches the
   XLA path — value and gradients — for random graphs and K.
3. Edge-sharded execution over the virtual device mesh is
   partition-invariant: N-shard forward == single-device forward.

Graphs are derived from drawn seeds via numpy (cheap generation, good
shrinking on the drawn integers); example counts are kept small because
every distinct shape recompiles under jit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# hypothesis is a test-only dependency; skip this module cleanly where
# it isn't installed instead of failing the whole collection.
hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from mma_tpu.ops import masked_multi_aggregate, get_agg_spec

from helpers import random_symmetric_graph, unpad
from oracle import oracle_mma_aggregator

USABLE = [
    "sum", "sum2", "sum3", "sum4",
    "mean", "mean2", "mean3", "mean4",
    "max", "max2", "max3", "max4",
    "min", "min2", "min3", "min4",
    "softmax", "softmin",
]

F = 16

# Shared settings: no deadline (jit compiles dominate and vary), no
# example database (CI hygiene — runs are self-contained).
PROP = dict(deadline=None, database=None, print_blob=True)


def _graph_and_features(n, p, seed, f=F):
    a, add_all, graph = random_symmetric_graph(n, p=p, seed=seed)
    rs = np.random.RandomState(seed + 1000)
    h = np.zeros((graph.n_node, f), np.float32)
    h[:n] = rs.randn(n, f)
    return a, add_all, graph, jnp.asarray(h)


@settings(max_examples=12, **PROP)
@given(
    n=st.integers(6, 40),
    pct=st.integers(5, 40),
    seed=st.integers(0, 2**31 - 1),
    agg=st.sampled_from(USABLE),
    activation=st.sampled_from(["new_sigmoid", "sigmoid"]),
)
def test_xla_path_matches_oracle(n, pct, seed, agg, activation):
    _, add_all, graph, h = _graph_and_features(n, pct / 100.0, seed)
    rs = np.random.RandomState(seed % 1000)
    mask_w = (rs.randn(1, 2 * F, F) * 0.3).astype(np.float32)

    got = masked_multi_aggregate(
        h, graph, jnp.asarray(mask_w), (get_agg_spec(agg),),
        activation=activation, parity=True,
    )
    want = oracle_mma_aggregator(
        agg, np.asarray(h)[:n], add_all, mask_w[0], activation
    )
    np.testing.assert_allclose(
        unpad(got[:, 0, :], n), want, rtol=3e-5, atol=3e-5
    )


@settings(max_examples=6, **PROP)
@given(
    n=st.integers(6, 48),
    pct=st.integers(5, 30),
    seed=st.integers(0, 2**31 - 1),
    aggs=st.lists(st.sampled_from(USABLE), min_size=1, max_size=3, unique=True),
    # None = the default lean edge program (in-kernel d = h @ W_bot);
    # the named modes select the wide [d ‖ h] program's two backward
    # strategies.
    bwd_mode=st.sampled_from([None, "csc_gather", "payload_permute"]),
)
def test_pallas_matches_xla_fwd_and_grads(n, pct, seed, aggs, bwd_mode):

    _, _, graph, h = _graph_and_features(n, pct / 100.0, seed)
    k = len(aggs)
    rs = np.random.RandomState(seed % 1000)
    mask_w = jnp.asarray((rs.randn(k, 2 * F, F) * 0.3).astype(np.float32))
    ct = jnp.asarray(rs.randn(graph.n_node, k, F).astype(np.float32))
    specs = tuple(get_agg_spec(a) for a in aggs)

    def loss(h_, w_, up):
        out = masked_multi_aggregate(
            h_, graph, w_, specs, parity=True, use_pallas=up,
            pallas_bwd_mode=bwd_mode if up else None,
        )
        out = jnp.where(graph.node_mask[:, None, None], out, 0.0)
        return jnp.sum(out * ct), out

    (_, out_x), grads_x = jax.value_and_grad(
        lambda h_, w_: loss(h_, w_, False), argnums=(0, 1), has_aux=True
    )(h, mask_w)
    (_, out_p), grads_p = jax.value_and_grad(
        lambda h_, w_: loss(h_, w_, True), argnums=(0, 1), has_aux=True
    )(h, mask_w)

    # The kernel's default "high" precision runs the MXU contraction as
    # explicit bf16-split passes (~1e-5 relative to the accumulated
    # magnitude), so tolerances scale with the result's magnitude —
    # raw-logit masks (N1, e.g. 'max' under new_sigmoid) make values O(10+).
    def _close(got, want, name):
        want = np.asarray(want)
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4, atol=5e-5 * scale,
            err_msg=name,
        )

    _close(out_p, out_x, "out")
    for gp, gx, name in zip(grads_p, grads_x, ("dh", "dW")):
        _close(gp, gx, name)


@pytest.mark.multichip
@settings(max_examples=4, **PROP)
@given(
    n=st.integers(12, 48),
    pct=st.integers(8, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_edge_shard_partition_invariance(n, pct, seed):
    from mma_tpu.models import NodeClassifier
    from mma_tpu.parallel import (
        make_edge_sharded_forward, make_mesh, shard_graph,
    )

    assert len(jax.devices()) == 8, jax.devices()
    _, _, graph, x = _graph_and_features(n, pct / 100.0, seed, f=12)
    model = NodeClassifier(
        n_feat=12, n_hidden=16, n_class=4,
        aggregators=("mean", "max2", "min"), dropout_rate=0.0,
    )
    params = model.init(jax.random.PRNGKey(seed % 7))
    want = model.apply(params, x, graph, training=False)

    mesh = make_mesh(("edge",))
    fwd = make_edge_sharded_forward(model, mesh, "edge")
    got = fwd(params, x, shard_graph(graph, mesh, "edge"))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
