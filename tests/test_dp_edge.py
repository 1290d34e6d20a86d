"""2-D (data × edge) mesh tests on the virtual 8-device CPU mesh:
partition invariance of the forward, and a train step whose loss,
updated params, and BN state match the logically-unsharded computation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.data import load_zinc
from mma_tpu.models import ZincNet
from mma_tpu.nn.mma_conv import compute_avg_deg
from mma_tpu.parallel import (
    make_dp_edge_forward,
    make_dp_edge_train_step,
    make_mesh,
    shard_batches_dp_edge,
)
from mma_tpu.train import make_optimizer

pytestmark = pytest.mark.multichip

D, E_SHARDS = 2, 4  # 2 data groups × 4 edge shards = 8 devices


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, jax.devices()
    ds = load_zinc("val", subset_size=16)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("min", "max", "mean", "sum"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()), towers=3, num_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    it = ds.batches(4, n_node=120, n_edge=260)
    batches = [next(it) for _ in range(D)]
    mesh = make_mesh(("data", "edge"), shape=(D, E_SHARDS))
    stacked = shard_batches_dp_edge(batches, mesh)
    return model, params, state, batches, mesh, stacked


def test_dp_edge_forward_matches_single_device(setup):
    model, params, state, batches, mesh, stacked = setup
    fwd = make_dp_edge_forward(model, mesh)
    got = np.asarray(fwd(params, state, stacked))  # (D, G)
    for d, b in enumerate(batches):
        want, _ = model.apply(params, state, b, training=False)
        gm = np.asarray(b.graph_mask)
        np.testing.assert_allclose(
            got[d][gm], np.asarray(want)[gm], rtol=1e-5, atol=1e-5
        )


def test_dp_edge_train_step_matches_unsharded(setup):
    """Smooth aggregators only (mean/sum): min/max gradient routing is
    tie-sensitive (ZINC's discrete atom/edge types produce exactly
    equal messages, and a tie may resolve to a different — equally
    valid — subgradient across shards), and std's relu gate sits at
    exactly 0 for degree-1 nodes (zero variance), so summation order
    flips their subgradients. The min/max cross-shard VJP is
    exactness-checked on continuous data below instead."""
    _, _, state0, batches, mesh, _ = setup
    ds = load_zinc("val", subset_size=16)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("mean", "sum"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()), towers=3, num_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    stacked = shard_batches_dp_edge(batches, mesh)
    opt = make_optimizer(learning_rate=1e-3, weight_decay=3e-4)
    opt_state = opt.init(params)

    step = make_dp_edge_train_step(model, opt, mesh)
    p2, s2, o2, loss = step(params, state, opt_state, stacked, None)

    # Unsharded restatement: same global graph-count-weighted L1 loss
    # over both micro-batches, BN state averaged across groups.
    import optax

    def ref_loss(p):
        errs, cnts, states = [], [], []
        for b in batches:
            pred, ns = model.apply(p, state, b, training=True)
            gm = b.graph_mask.astype(jnp.float32)
            errs.append(jnp.sum(jnp.abs(pred - b.target) * gm))
            cnts.append(jnp.sum(gm))
            states.append(ns)
        loss = sum(errs) / jnp.maximum(sum(cnts), 1.0)
        mean_state = jax.tree.map(lambda *xs: sum(xs) / len(xs), *states)
        return loss, mean_state

    (want_loss, want_state), grads = jax.value_and_grad(
        ref_loss, has_aux=True
    )(params)
    updates, want_opt = opt.update(grads, opt_state, params)
    want_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    # Post-Adam params: atol is 10% of one lr=1e-3 update — the sharded
    # psum reorders f32 sums, and Adam's g/√v amplifies reorder noise on
    # near-zero gradient elements; collective bugs would shift O(lr).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4
        ),
        p2, want_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s2, want_state,
    )


def test_dp_edge_step_with_dropout_runs_and_learns(setup):
    model, params, state, batches, mesh, stacked = setup
    opt = make_optimizer(learning_rate=5e-3, weight_decay=0.0)
    opt_state = opt.init(params)
    step = make_dp_edge_train_step(model, opt, mesh)

    rngs = jax.random.split(jax.random.PRNGKey(1), D)
    losses = []
    p, s, o = params, state, opt_state
    for i in range(6):
        rngs = jax.vmap(jax.random.fold_in)(rngs, jnp.full((D,), i))
        p, s, o, loss = step(p, s, o, stacked, rngs)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("name", ["min", "max"])
def test_cross_shard_minmax_vjp_exact_on_continuous_data(name):
    """The all_gather-based cross-shard min/max reduce has an exact VJP
    when messages are continuous (no ties): value and input cotangent
    match the unsharded segment reduce."""
    import functools

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from mma_tpu.nn.mma_conv import MultiMaskConv
    from helpers import random_symmetric_graph

    conv = MultiMaskConv(
        in_channels=6, out_channels=6, aggregators=(name,),
        scalers=("identity",), avg_deg=(("lin", 2.0), ("log", 1.0)),
        towers=1,
    )
    from mma_tpu.parallel import pad_edges_for_sharding

    _, _, graph = random_symmetric_graph(24, p=0.2, seed=3)
    graph = pad_edges_for_sharding(graph, 8)
    rs = np.random.RandomState(0)
    msgs = jnp.asarray(rs.randn(graph.n_edge, 6).astype(np.float32))
    ct = jnp.asarray(rs.randn(graph.n_node, 6).astype(np.float32))
    deg = jnp.maximum(graph.deg, 1.0)[:, None]

    def loss_unsharded(m):
        return jnp.sum(conv._reduce(name, m, graph, deg) * ct)

    mesh = make_mesh(("edge",), shape=(8,))
    import dataclasses

    espec = dataclasses.replace(
        # Graph spec: edge arrays sharded, node arrays replicated.
        jax.tree.map(lambda _: P(), graph),
        src=P("edge"), dst=P("edge"), edge_mask=P("edge"),
    )
    # Structure views don't shard; drop them from data and spec alike.
    graph_s = dataclasses.replace(
        graph, src_perm=None, col_ptr=None, src_csc=None, dst_csc=None,
        chunk_hint=None,
    )
    espec = dataclasses.replace(
        espec, src_perm=None, col_ptr=None, src_csc=None, dst_csc=None,
        chunk_hint=None,
    )

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("edge"), espec),
        out_specs=P(), check_rep=False,
    )
    def reduce_sharded(m, g):
        return conv._reduce(name, m, g, deg, axis_name="edge")

    def loss_sharded(m):
        return jnp.sum(reduce_sharded(m, graph_s) * ct)

    v1, g1 = jax.value_and_grad(loss_unsharded)(msgs)
    v2, g2 = jax.value_and_grad(loss_sharded)(msgs)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-6, atol=1e-7)
