"""Multi-device tests on the virtual 8-device CPU mesh: edge-partition
invariance (1-shard vs N-shard allclose), exact sharded gradients, and the
data-parallel ZINC step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.data import load_zinc
from mma_tpu.models import NodeClassifier, ZincNet
from mma_tpu.nn.mma_conv import compute_avg_deg
from mma_tpu.parallel import (
    make_dp_train_step,
    make_edge_sharded_forward,
    make_edge_sharded_train_step,
    make_mesh,
    shard_graph,
    stack_batches,
)
from mma_tpu.train import make_optimizer

from helpers import random_symmetric_graph

pytestmark = pytest.mark.multichip

N, F_IN, HID = 60, 12, 16


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, jax.devices()
    a, add_all, graph = random_symmetric_graph(N, p=0.15, seed=5)
    rs = np.random.RandomState(2)
    x = np.zeros((graph.n_node, F_IN), np.float32)
    x[:N] = rs.randn(N, F_IN)
    model = NodeClassifier(
        n_feat=F_IN, n_hidden=HID, n_class=4,
        aggregators=("mean", "max2", "min"), dropout_rate=0.0,
    )
    params = model.init(jax.random.PRNGKey(0))
    return graph, jnp.asarray(x), model, params


def test_edge_sharded_forward_matches_single_device(setup):
    graph, x, model, params = setup
    want = model.apply(params, x, graph, training=False)

    mesh = make_mesh(("edge",))
    g_sharded = shard_graph(graph, mesh, "edge")
    fwd = make_edge_sharded_forward(model, mesh, "edge")
    got = fwd(params, x, g_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_edge_sharded_gradients_exact(setup):
    graph, x, model, params = setup
    labels = jnp.asarray(np.random.RandomState(3).randint(0, 4, graph.n_node))
    idx_train = jnp.arange(40)

    def ref_loss(p):
        logp = model.apply(p, x, graph, training=True, rng=None)
        return -jnp.mean(logp[idx_train, labels[idx_train]])

    ref_grads = jax.grad(ref_loss)(params)

    mesh = make_mesh(("edge",))
    g_sharded = shard_graph(graph, mesh, "edge")
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from mma_tpu.parallel.edge_parallel import graph_shard_spec

    fwd = shard_map(
        lambda p, xx, gg: model.apply(p, xx, gg, training=True, rng=None, axis_name="edge"),
        mesh=mesh,
        in_specs=(P(), P(), graph_shard_spec("edge")),
        out_specs=P(),
        check_rep=False,
    )

    def sharded_loss(p):
        logp = fwd(p, x, g_sharded)
        return -jnp.mean(logp[idx_train, labels[idx_train]])

    got_grads = jax.grad(sharded_loss)(params)
    for path, a, b in zip(
        jax.tree_util.tree_leaves_with_path(ref_grads),
        jax.tree.leaves(ref_grads),
        jax.tree.leaves(got_grads),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=str(path[0]),
        )


def test_edge_sharded_train_step_runs_and_learns(setup):
    graph, x, model, params = setup
    labels = jnp.asarray(np.random.RandomState(3).randint(0, 4, graph.n_node))
    idx_train = jnp.arange(40)
    mesh = make_mesh(("edge",))
    g_sharded = shard_graph(graph, mesh, "edge")
    opt = make_optimizer(0.01, weight_decay=1e-4)
    opt_state = opt.init(params)
    step = make_edge_sharded_train_step(model, opt, mesh, labels, idx_train, "edge")
    losses = []
    p = params
    rng = jax.random.PRNGKey(0)
    for i in range(10):
        rng, k = jax.random.split(rng)
        p, opt_state, loss = step(p, opt_state, x, g_sharded, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_dp_zinc_step(setup):
    del setup
    mesh = make_mesh(("data",))
    n_dev = 8
    ds = load_zinc("val", subset_size=n_dev * 4)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()),
        towers=1, num_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    opt = make_optimizer(1e-3, weight_decay=3e-4)
    opt_state = opt.init(params)

    micro = list(ds.batches(4, n_node=4 * 40, n_edge=4 * 100))[:n_dev]
    stacked = stack_batches(micro)
    rngs = jax.random.split(jax.random.PRNGKey(1), n_dev)
    step = make_dp_train_step(model, opt, mesh, "data")
    losses = []
    for i in range(5):
        params, state, opt_state, loss = step(params, state, opt_state, stacked, rngs)
        rngs = jax.vmap(lambda k: jax.random.fold_in(k, i))(rngs)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("use_pallas", [False, True])
def test_node_sharded_forward_matches_single_device(setup, use_pallas):
    """Halo-exchange node-sharded forward ≡ unsharded forward (the
    large-graph memory-scaling regime, SURVEY §5.7). ``use_pallas=True``
    routes every shard-local reduce through the fused Pallas row-block
    kernel on the per-shard CSR (VERDICT r2 #4)."""
    from mma_tpu.parallel.node_sharded import (
        build_node_sharded,
        make_node_sharded_forward,
        place_on_mesh,
        shard_node_values,
    )

    graph, x, model, params = setup
    want = model.apply(params, x, graph, training=False)

    n_dev = 8
    mesh = make_mesh(("node",))
    sg, cuts = build_node_sharded(graph, n_dev)
    n_m = sg.node_mask.shape[1]
    x_shards = shard_node_values(np.asarray(x)[:N], cuts, n_m)
    sg = place_on_mesh(sg, mesh, "node")

    fwd = make_node_sharded_forward(model, mesh, "node",
                                    use_pallas=use_pallas)
    got = fwd(params, x_shards, sg)  # (S, N_m, C)

    got_np = np.asarray(got)
    ids = np.asarray(sg.global_ids)
    mask = np.asarray(sg.node_mask)
    want_np = np.asarray(want)
    for p in range(n_dev):
        rows = ids[p][mask[p]]
        np.testing.assert_allclose(
            got_np[p][mask[p]], want_np[rows], rtol=2e-4, atol=2e-4,
            err_msg=f"shard {p}",
        )


def test_node_sharded_gradients_match(setup):
    from mma_tpu.parallel.node_sharded import (
        build_node_sharded,
        make_node_sharded_forward,
        place_on_mesh,
        shard_node_values,
    )

    graph, x, model, params = setup
    labels_np = np.random.RandomState(3).randint(0, 4, N)
    n_dev = 8
    mesh = make_mesh(("node",))
    sg, cuts = build_node_sharded(graph, n_dev)
    n_m = sg.node_mask.shape[1]
    x_shards = shard_node_values(np.asarray(x)[:N], cuts, n_m)
    labels_sh = shard_node_values(labels_np.reshape(-1, 1), cuts, n_m)[..., 0]
    sg_m = place_on_mesh(sg, mesh, "node")
    fwd = make_node_sharded_forward(model, mesh, "node")

    nmask = jnp.asarray(np.asarray(sg.node_mask))

    def sharded_loss(p):
        logp = fwd(p, x_shards, sg_m)  # (S, N_m, C)
        pick = jnp.take_along_axis(
            logp, labels_sh.astype(jnp.int32)[..., None], axis=-1
        )[..., 0]
        return -jnp.sum(jnp.where(nmask, pick, 0.0)) / N

    labels_full = jnp.asarray(labels_np)

    def ref_loss(p):
        logp = model.apply(p, x, graph, training=False)
        return -jnp.mean(logp[jnp.arange(N), labels_full])

    g1 = jax.grad(ref_loss)(params)
    g2 = jax.grad(sharded_loss)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4, atol=1e-5)


def test_edge_sharded_pallas_kernel_structure(setup):
    """Edge-sharded execution with per-shard CSR/CSC structure runs the
    fused Pallas kernels locally and still matches single-device, fwd +
    grad."""
    graph, x, model, params = setup
    want = model.apply(params, x, graph, training=False)

    mesh = make_mesh(("edge",))
    g_sharded = shard_graph(graph, mesh, "edge", kernel_structure=True)
    fwd = make_edge_sharded_forward(model, mesh, "edge", use_pallas=True)
    got = fwd(params, x, g_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)

    def sharded_loss(p):
        return jnp.sum(fwd(p, x, g_sharded) ** 2)

    def ref_loss(p):
        return jnp.sum(model.apply(p, x, graph, training=False) ** 2)

    g1 = jax.grad(ref_loss)(params)
    g2 = jax.grad(sharded_loss)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-2, atol=5e-2)


def test_node_sharded_train_step_matches_unsharded(setup):
    """make_node_sharded_train_step (dropout off) ≡ the unsharded full-batch
    step: identical loss and post-step parameters (VERDICT #3 gate)."""
    import optax
    from mma_tpu.parallel.node_sharded import (
        build_node_sharded,
        make_node_sharded_train_step,
        place_on_mesh,
        shard_node_values,
    )

    graph, x, model, params = setup
    rs = np.random.RandomState(7)
    labels_np = rs.randint(0, 4, N)
    tmask_np = np.zeros(N, bool)
    tmask_np[rs.choice(N, 30, replace=False)] = True
    opt = make_optimizer(learning_rate=0.01, weight_decay=5e-4)

    # --- unsharded reference step ---
    labels_full = jnp.asarray(labels_np)
    tmask_full = jnp.asarray(tmask_np)

    def loss_fn(p):
        logp = model.apply(p, x, graph, training=True)
        pick = jnp.take_along_axis(logp[:N], labels_full[:, None], axis=-1)[:, 0]
        return -jnp.sum(jnp.where(tmask_full, pick, 0.0)) / tmask_np.sum()

    l_ref, g_ref = jax.value_and_grad(loss_fn)(params)
    opt_state = opt.init(params)
    up, _ = opt.update(g_ref, opt_state, params)
    p_ref = optax.apply_updates(params, up)

    # --- node-sharded step ---
    n_dev = 8
    mesh = make_mesh(("node",))
    sg, cuts = build_node_sharded(graph, n_dev)
    n_m = sg.node_mask.shape[1]
    x_shards = shard_node_values(np.asarray(x)[:N], cuts, n_m)
    labels_sh = shard_node_values(labels_np.reshape(-1, 1), cuts, n_m)[..., 0]
    tmask_sh = shard_node_values(tmask_np.reshape(-1, 1), cuts, n_m)[..., 0]
    sg_m = place_on_mesh(sg, mesh, "node")
    step = make_node_sharded_train_step(model, opt, mesh, "node", dropout=False)
    p_new, _, l_sh = step(
        params, opt.init(params), x_shards, sg_m, labels_sh, tmask_sh
    )

    # Pallas-kernel variant (fused per-shard CSR reduces): identical
    # step semantics, same gate.
    step_pl = make_node_sharded_train_step(
        model, opt, mesh, "node", dropout=False, use_pallas=True
    )
    p_pl, _, l_pl = step_pl(
        params, opt.init(params), x_shards, sg_m, labels_sh, tmask_sh
    )
    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_pl), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_node_sharded_training_with_dropout_learns(setup):
    """The full regime: per-shard dropout rngs (feature + N2 mask dropout),
    optimizer updates; loss decreases over steps."""
    from mma_tpu.parallel.node_sharded import (
        build_node_sharded,
        make_node_sharded_train_step,
        place_on_mesh,
        shard_node_values,
    )

    graph, x, _, _ = setup
    model = NodeClassifier(
        n_feat=F_IN, n_hidden=HID, n_class=4,
        aggregators=("mean", "max2", "min"), dropout_rate=0.3,
    )
    params = model.init(jax.random.PRNGKey(1))
    rs = np.random.RandomState(9)
    labels_np = rs.randint(0, 4, N)
    tmask_np = np.ones(N, bool)
    opt = make_optimizer(learning_rate=0.02, weight_decay=0.0)

    mesh = make_mesh(("node",))
    sg, cuts = build_node_sharded(graph, 8)
    n_m = sg.node_mask.shape[1]
    x_shards = shard_node_values(np.asarray(x)[:N], cuts, n_m)
    labels_sh = shard_node_values(labels_np.reshape(-1, 1), cuts, n_m)[..., 0]
    tmask_sh = shard_node_values(tmask_np.reshape(-1, 1), cuts, n_m)[..., 0]
    sg_m = place_on_mesh(sg, mesh, "node")
    step = make_node_sharded_train_step(model, opt, mesh, "node", dropout=True)

    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(5)
    losses = []
    for i in range(30):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step(
            params, opt_state, x_shards, sg_m, labels_sh, tmask_sh, k
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


def test_node_sharded_all_combines(setup):
    """Every fixed-mode combine (std / normalized_mean / moment_3 included)
    runs node-sharded and matches the unsharded forward — the
    NotImplementedError of round 1 is gone."""
    from mma_tpu.parallel.node_sharded import (
        build_node_sharded,
        make_node_sharded_forward,
        place_on_mesh,
        shard_node_values,
    )

    graph, x, _, _ = setup
    model = NodeClassifier(
        n_feat=F_IN, n_hidden=HID, n_class=4,
        aggregators=("mean", "max", "std", "normalized_mean", "moment_3"),
        dropout_rate=0.0, parity=False,
    )
    params = model.init(jax.random.PRNGKey(2))
    want = np.asarray(model.apply(params, x, graph, training=False))

    mesh = make_mesh(("node",))
    sg, cuts = build_node_sharded(graph, 8)
    n_m = sg.node_mask.shape[1]
    x_shards = shard_node_values(np.asarray(x)[:N], cuts, n_m)
    sg_m = place_on_mesh(sg, mesh, "node")
    fwd = make_node_sharded_forward(model, mesh, "node")
    got = np.asarray(fwd(params, x_shards, sg_m))
    ids, mask = np.asarray(sg.global_ids), np.asarray(sg.node_mask)
    for p in range(8):
        np.testing.assert_allclose(
            got[p][mask[p]], want[ids[p][mask[p]]], rtol=2e-4, atol=2e-4,
            err_msg=f"shard {p}",
        )


@pytest.mark.parametrize("e_pad", [640, 768, 896])
def test_fused_raw_non_pow2_pads(e_pad):
    """Regression (ADVICE r4): node-sharded shard-local edge pads round to
    128-multiples below BLOCK_B (640/768/896 are legal), and
    fused_segment_sum_raw clamps block_b to them. BLOCK_SUB=512 does not
    divide those, so the contraction width must shrink to a divisor
    instead of min-clamping (which broke dst.reshape at trace time)."""
    from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_raw

    rng = np.random.default_rng(e_pad)
    n, e = 50, e_pad - 37  # real edges below the pad
    dst = np.sort(rng.integers(0, n, size=e))
    dst_pad = np.concatenate([dst, np.full(e_pad - e, n - 1)]).astype(np.int32)
    data = np.zeros((e_pad, 128), np.float32)
    data[:e] = rng.standard_normal((e, 128))
    row_ptr = np.searchsorted(dst_pad, np.arange(n + 1)).astype(np.int32)
    row_ptr[-1] = e_pad
    got = np.asarray(
        fused_segment_sum_raw(jnp.asarray(data), jnp.asarray(dst_pad),
                              jnp.asarray(row_ptr))
    )
    want = np.zeros((n, 128), np.float32)
    np.add.at(want, dst, data[:e])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
