"""Neighbor-sampler tests: structural validity and full-fanout exactness
(seed outputs of the 2-layer model on the sampled subgraph must equal the
full-graph outputs when fanout ≥ max degree)."""

import numpy as np
import jax
import jax.numpy as jnp

from mma_tpu.data.sampling import NeighborSampler
from mma_tpu.models import NodeClassifier

from helpers import random_symmetric_graph


def test_sampled_batch_structure():
    _, _, g = random_symmetric_graph(200, p=0.05, seed=0)
    sampler = NeighborSampler(g, fanouts=(5, 5), seed=1)
    seeds = np.arange(10)
    batch = sampler.sample(seeds, n_node_pad=512, n_edge_pad=2048)
    assert batch.num_seeds == 10
    # Seeds occupy the first rows and map to themselves.
    np.testing.assert_array_equal(batch.node_ids[:10], seeds)
    # Every edge endpoint is a valid subgraph node.
    e_mask = np.asarray(batch.graph.edge_mask)
    assert np.asarray(batch.graph.src)[e_mask].max() < batch.num_nodes
    # In-degree per seed ≤ fanout, and true_deg carried for all real nodes.
    dst = np.asarray(batch.graph.dst)[e_mask]
    for s in range(10):
        assert (dst == s).sum() <= 5


def test_full_fanout_exact_on_seeds():
    a, add_all, g = random_symmetric_graph(80, p=0.1, seed=2)
    rs = np.random.RandomState(0)
    x_full = np.zeros((g.n_node, 12), np.float32)
    x_full[:80] = rs.randn(80, 12)
    model = NodeClassifier(
        n_feat=12, n_hidden=16, n_class=5, aggregators=("mean", "sum2", "min"),
        dropout_rate=0.0,
    )
    params = model.init(jax.random.PRNGKey(0))
    full_out = model.apply(params, jnp.asarray(x_full), g, training=False)

    # Receptive field: gc1 is one hop and the MMA layer is TWO hops
    # (masked aggregation + the final SpMM, layers.py:861-862) ⇒ 3 levels.
    max_deg = int(np.asarray(g.deg).max())
    sampler = NeighborSampler(g, fanouts=(max_deg,) * 3, seed=3)
    seeds = np.asarray([3, 17, 42, 79])
    batch = sampler.sample(seeds, n_node_pad=128, n_edge_pad=4096)
    x_sub = np.zeros((batch.graph.n_node, 12), np.float32)
    valid = batch.node_ids >= 0
    x_sub[valid] = x_full[batch.node_ids[valid]]
    sub_out = model.apply(params, jnp.asarray(x_sub), batch.graph, training=False)

    np.testing.assert_allclose(
        np.asarray(sub_out)[: len(seeds)],
        np.asarray(full_out)[seeds],
        rtol=2e-4, atol=2e-4,
    )


def test_sampler_batches_cover_seed_set():
    _, _, g = random_symmetric_graph(100, p=0.05, seed=4)
    sampler = NeighborSampler(g, fanouts=(3,), seed=5)
    seen = []
    for b in sampler.batches(np.arange(50), 16, n_node_pad=256, n_edge_pad=1024):
        seen.extend(b.node_ids[: b.num_seeds].tolist())
    assert sorted(seen) == list(range(50))


def test_sampled_training_learns():
    """Mini-batch sampled training improves loss on a synthetic graph
    (the config[4] large-graph regime, scaled down)."""
    from mma_tpu.train.sampled import SampledTrainConfig, train_sampled

    rs = np.random.RandomState(0)
    n = 400
    a, add_all, g = random_symmetric_graph(n, p=0.03, seed=7)
    # Features correlated with labels so learning is possible.
    labels = rs.randint(0, 4, n)
    feats = (np.eye(4)[labels] + 0.5 * rs.randn(n, 4)).astype(np.float32)
    cfg = SampledTrainConfig(
        aggregators=("mean", "max"), hidden=16, batch_size=64,
        fanouts=(5, 5, 5), n_node_pad=512, n_edge_pad=4096, lr=0.01,
        dropout=0.0, epochs=10,
    )
    res = train_sampled(cfg, g, feats, labels, np.arange(300))
    losses = [h["loss"] for h in res["history"]]
    assert losses[-1] < losses[0], losses
    # above chance (4 classes) on a deliberately noisy synthetic task
    assert res["history"][-1]["acc_train"] > 0.3
