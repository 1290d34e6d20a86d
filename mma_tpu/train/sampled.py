"""Mini-batch node-classification training via neighbor sampling.

The large-graph regime (BASELINE.json config[4]: "ogbn-products-scale …
MMA with neighbor sampling"): full-batch full-graph training stops
fitting at ~10⁸ edges, so seeds are mini-batched, layered neighborhoods
sampled host-side (``mma_tpu.data.sampling``), and each step trains on a
statically-shaped subgraph. Data parallelism assigns one sampled
subgraph per device and psums gradients (``make_sampled_dp_step``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from mma_tpu.data.sampling import NeighborSampler
from mma_tpu.models import NodeClassifier  # noqa: F401 (public API)
from mma_tpu.train.logger import JsonlLogger
from mma_tpu.train.metrics import accuracy
from mma_tpu.train.optim import make_optimizer


@dataclasses.dataclass(frozen=True)
class SampledTrainConfig:
    aggregators: tuple = ("mean", "mean2")
    hidden: int = 64
    lr: float = 0.003
    weight_decay: float = 0.0
    dropout: float = 0.5
    epochs: int = 3
    batch_size: int = 512
    fanouts: tuple = (10, 10, 5)  # 3 hops: gc1 + MMA's two (agg + spmm)
    n_node_pad: int = 32768
    n_edge_pad: int = 131072
    seed: int = 0
    parity: bool = True
    log_path: Optional[str] = None


def train_sampled(
    cfg: SampledTrainConfig,
    graph,
    features: np.ndarray,
    labels: np.ndarray,
    train_nodes: np.ndarray,
):
    """Single-device sampled training; returns params + history."""
    log = JsonlLogger(cfg.log_path)
    num_classes = int(labels.max()) + 1
    model = NodeClassifier(
        n_feat=features.shape[1],
        n_hidden=cfg.hidden,
        n_class=num_classes,
        aggregators=cfg.aggregators,
        dropout_rate=cfg.dropout,
        parity=cfg.parity,
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, ik = jax.random.split(key)
    params = model.init(ik)
    opt = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    sampler = NeighborSampler(graph, cfg.fanouts, seed=cfg.seed)

    @jax.jit
    def step(params, opt_state, x, g, y, seed_mask, rng):
        def loss_fn(p):
            logp = model.apply(p, x, g, training=True, rng=rng)
            nll = -logp[jnp.arange(y.shape[0]), y]
            return jnp.sum(nll * seed_mask) / jnp.maximum(jnp.sum(seed_mask), 1.0), logp

        (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss, logp

    history = []
    for epoch in range(cfg.epochs):
        t0 = time.time()
        tot_loss, tot_acc, nb = 0.0, 0.0, 0
        for batch in sampler.batches(
            train_nodes, cfg.batch_size,
            n_node_pad=cfg.n_node_pad, n_edge_pad=cfg.n_edge_pad,
        ):
            x = np.zeros((batch.graph.n_node, features.shape[1]), np.float32)
            valid = batch.node_ids >= 0
            x[valid] = features[batch.node_ids[valid]]
            y = np.zeros(batch.graph.n_node, np.int32)
            y[valid] = labels[batch.node_ids[valid]]
            seed_mask = np.zeros(batch.graph.n_node, np.float32)
            seed_mask[: batch.num_seeds] = 1.0
            key, sk = jax.random.split(key)
            params, opt_state, loss, logp = step(
                params, opt_state, jnp.asarray(x), batch.graph,
                jnp.asarray(y), jnp.asarray(seed_mask), sk,
            )
            tot_loss += float(loss)
            tot_acc += float(
                accuracy(logp[: batch.num_seeds], jnp.asarray(y)[: batch.num_seeds])
            )
            nb += 1
        rec = dict(
            epoch=epoch,
            loss=tot_loss / max(nb, 1),
            acc_train=tot_acc / max(nb, 1),
            batches=nb,
            time=time.time() - t0,
        )
        history.append(rec)
        log.log(**rec)
    log.close()
    return {"params": params, "history": history, "model": model}
