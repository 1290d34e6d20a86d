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


def prepare_sampled_arrays(batch, features: np.ndarray, labels: np.ndarray):
    """Host-side (x, y, seed_mask) arrays for one :class:`SampledBatch`."""
    x = np.zeros((batch.graph.n_node, features.shape[1]), np.float32)
    valid = batch.node_ids >= 0
    x[valid] = features[batch.node_ids[valid]]
    y = np.zeros(batch.graph.n_node, np.int32)
    y[valid] = labels[batch.node_ids[valid]]
    seed_mask = np.zeros(batch.graph.n_node, np.float32)
    seed_mask[: batch.num_seeds] = 1.0
    return x, y, seed_mask


def stack_graphs(graphs, keep_structure: bool = True):
    """Stack same-padding :class:`Graph`s along a leading device axis.

    ``chunk_hint`` is static pytree aux and data-dependent (it bounds the
    kernel grid from the row-pointer contents), so same-shape subgraphs
    can carry different hints — canonicalize to the elementwise max (a
    valid bound for every member; the kernels only gate on its presence
    and derive the actual grid from shapes) so the treedefs match.
    """
    if keep_structure:
        # Canonical hint from the PAD SHAPES, not the contents: the hint
        # is static jit-cache key material, so a content-derived value
        # would recompile on every batch. The shape bound is valid for
        # every member (a row block spans at most all chunks + 1 partial;
        # total steps ≤ chunks + blocks — the kernels' universal bound).
        from mma_tpu.constants import BLOCK_B, BLOCK_R

        g0 = graphs[0]
        n_chunks = -(-g0.n_edge // BLOCK_B)
        n_blocks = -(-g0.n_node // BLOCK_R)
        common = (
            None if g0.chunk_hint is None
            else (n_chunks + 1, n_chunks + n_blocks)
        )
        graphs = [dataclasses.replace(g, chunk_hint=common) for g in graphs]
    else:
        graphs = [
            dataclasses.replace(
                g, chunk_hint=None, ell_hint=None, src_perm=None, col_ptr=None,
                src_csc=None, dst_csc=None,
            )
            for g in graphs
        ]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *graphs)


def stack_sampled_batches(batches, features: np.ndarray, labels: np.ndarray,
                          keep_structure: bool = True):
    """Stack per-device sampled batches along a leading device axis.

    Returns ``(x, graph, y, seed_mask)`` stacks ready for
    :func:`make_sampled_dp_step`. Graphs must share padding budgets
    (``n_node_pad``/``n_edge_pad``).

    ``keep_structure=True`` (default) keeps each subgraph's kernel
    structure (``chunk_hint`` + CSC fields): every sampled subgraph is a
    COMPLETE dst-sorted graph, so inside the per-device ``shard_map``
    body the fused Pallas kernels apply exactly as unsharded — unlike
    *edge-sharded* slices of one big graph, where the invariant
    (CLAUDE.md) nulls the structure. ``False`` reproduces the stripped
    XLA-path stacking (A/B + older callers).
    """
    graph = stack_graphs([b.graph for b in batches], keep_structure)
    xs, ys, sms = zip(*(prepare_sampled_arrays(b, features, labels) for b in batches))
    return (
        jnp.asarray(np.stack(xs)),
        graph,
        jnp.asarray(np.stack(ys)),
        jnp.asarray(np.stack(sms)),
    )


class DeviceTableAssembler:
    """Device-resident feature/label tables gathered by node ids.

    Per batch only the (n_dev, N_pad) int32 id map crosses the
    host↔device link (~2.6 MB at ogbn scale vs ~262 MB for f32 features
    assembled host-side — measured ~5 s/batch of pure transfer on the
    tunneled link). Real serving hosts feed features the same way: a
    device-resident embedding/feature cache gathered by ids. Rows whose
    id is ``-1`` (padding/holes) get zeros.
    """

    def __init__(self, features: np.ndarray, labels: np.ndarray):
        self.feat_tab = jnp.asarray(features)
        self.lab_tab = jnp.asarray(np.asarray(labels).astype(np.int32))

        @jax.jit
        def _assemble(ids, num_seeds):
            valid = ids >= 0
            safe = jnp.maximum(ids, 0) % self.feat_tab.shape[0]
            x = jnp.where(valid[..., None], self.feat_tab[safe], 0.0)
            y = jnp.where(valid, self.lab_tab[safe], 0)
            sm = (
                jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
                < num_seeds[:, None]
            ).astype(jnp.float32)
            return x, y, sm

        self._assemble = _assemble

    def __call__(self, batches):
        """Stack per-device :class:`SampledBatch`es → (x, y, seed_mask)."""
        ids = jnp.asarray(np.stack([b.node_ids for b in batches]))
        nseed = jnp.asarray(
            np.array([b.num_seeds for b in batches], np.int32)
        )
        return self._assemble(ids, nseed)


def sampled_batch_producer(sampler, seed_batches, assembler,
                           *, n_node_pad, n_edge_pad, hop_node_pads=None,
                           use_pallas=True, queue_depth=2,
                           device_finish=False, deg_table=None):
    """Generator of ``(x, graph, y, seed_mask)`` DP inputs with host
    sampling + assembly running in a producer thread, double-buffered so
    it overlaps the device step.

    ``seed_batches``: iterable of (n_dev, batch) seed-id arrays.

    ``device_finish=True`` is the MINIMAL-TRANSFER pipeline (the ogbn
    bench default): the host ships only (src, dst, ids) plus the
    counting-sort CSC permutation (~13 MB/batch at ogbn pads vs ~27 MB
    for the host-built Graph) and the CSR/CSC views, masks and true
    degrees are derived on device (``finish_graph_on_device`` — no
    device sort). Requires ``deg_table``: the (N_global,) f32
    device-resident true in-degree table (``jnp.asarray(
    sampler.true_deg)``).
    """
    import queue as _queue
    import threading

    import jax.numpy as jnp

    if device_finish:
        assert deg_table is not None, "device_finish needs deg_table"
        from mma_tpu.graph.device_build import (
            finish_graph_on_device,
            shape_canonical_chunk_hint,
        )

        canon_hint = (shape_canonical_chunk_hint(n_edge_pad, n_node_pad)
                      if use_pallas else None)

    q = _queue.Queue(maxsize=queue_depth)
    err = []

    def make_inputs(seeds_nd):
        if device_finish:
            arrs = [
                sampler.sample_arrays(
                    s, n_node_pad=n_node_pad, n_edge_pad=n_edge_pad,
                    hop_node_pads=hop_node_pads,
                )
                for s in seeds_nd
            ]
            members = [
                finish_graph_on_device(
                    jnp.asarray(ar.src), jnp.asarray(ar.dst),
                    jnp.asarray(ar.node_ids), jnp.int32(ar.num_edges),
                    deg_table, jnp.asarray(ar.src_perm),
                    chunk_hint=canon_hint, ell_hint=ar.ell_hint,
                )
                for ar in arrs
            ]
            import jax

            graph = jax.tree.map(
                lambda *xs: jnp.stack(xs, axis=0), *members
            )
            x, y, sm = assembler(arrs)
            return x, graph, y, sm
        batches = [
            sampler.sample(
                s, n_node_pad=n_node_pad, n_edge_pad=n_edge_pad,
                hop_node_pads=hop_node_pads,
            )
            for s in seeds_nd
        ]
        graph = stack_graphs(
            [b.graph for b in batches], keep_structure=use_pallas
        )
        x, y, sm = assembler(batches)
        return x, graph, y, sm

    def producer():
        try:
            for seeds_nd in seed_batches:
                q.put(make_inputs(seeds_nd))
        except Exception as e:  # surfaced by the consumer loop
            err.append(e)
        finally:
            q.put(None)

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
    th.join()
    if err:
        raise err[0]


def make_sampled_dp_step(model, opt, mesh, axis: str = "data",
                         use_pallas: bool = False,
                         donate_data: bool = False):
    """Data-parallel sampled-minibatch step: one sampled subgraph per
    device, global seed-weighted NLL via psum, exact pooled gradients.

    Returns ``step(params, opt_state, x, graph, y, seed_mask, rngs) ->
    (params, opt_state, loss)`` with the leading axis of every data arg
    sharded along ``axis`` and params replicated.

    ``use_pallas=True`` runs each device's subgraph through the fused
    kernels — pass a structure-keeping stack
    (:func:`stack_sampled_batches` with ``keep_structure=True``); the
    shard_map spec tree is derived from the actual graph pytree, so the
    static ``chunk_hint`` aux matches.

    ``donate_data=True`` donates the per-batch data args (x, graph, y,
    seed_mask) — each sampled batch is consumed exactly once, and
    donation lets the runtime reuse their buffers instead of
    allocate/free churn (~60 MB/batch of fresh arrays at ogbn pads;
    deferred deallocation showed up as multi-second stall batches).
    Do NOT reuse a batch after stepping with it under donation.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    def _mk(graph):
        # Spec tree via tree.map over the input graph: leaves → P(axis),
        # static aux (chunk_hint) preserved so treedefs match.
        g_spec = jax.tree.map(lambda _: P(axis), graph)

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(axis), g_spec, P(axis), P(axis), P(axis)),
            out_specs=P(),
            check_rep=False,
        )
        def mean_nll(params, x, g, y, seed_mask, rng):
            x_l, g_l, y_l, sm_l = jax.tree.map(lambda v: v[0], (x, g, y, seed_mask))
            logp = model.apply(params, x_l, g_l, training=True, rng=rng[0],
                               use_pallas=use_pallas)
            nll = -logp[jnp.arange(y_l.shape[0]), y_l]
            lsum = jax.lax.psum(jnp.sum(nll * sm_l), axis)
            lcnt = jax.lax.psum(jnp.sum(sm_l), axis)
            return lsum / jnp.maximum(lcnt, 1.0)

        return mean_nll

    from functools import partial

    @partial(jax.jit,
             donate_argnums=(2, 3, 4, 5) if donate_data else ())
    def step(params, opt_state, x, graph, y, seed_mask, rngs):
        mean_nll = _mk(graph)
        loss, grads = jax.value_and_grad(
            lambda p: mean_nll(p, x, graph, y, seed_mask, rngs)
        )(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return step
