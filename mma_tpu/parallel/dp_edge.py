"""2-D (data × edge) parallel training for batched graph regression.

Composes the two 1-D regimes: each *data*-axis group owns one
:class:`BatchedGraphs` micro-batch (as in ``data_parallel``); within the
group, the micro-batch's disjoint-union edge list is split into
contiguous shards across the *edge* axis (as in ``edge_parallel``), with
node-level arrays replicated inside the group. The convs' partial
segment reductions combine across the edge axis with each reduction's
own monoid (``psum``/``pmax``/``pmin`` — ``MultiMaskConv._reduce``);
everything node-level (BatchNorm, pooling, MLP head) computes
replicated within the group. The loss is the global graph-count-weighted
mean across data groups, and gradients follow from AD through the
``shard_map`` — exact, no hand-written gradient collectives.

This is the regime for molecule batches whose edge count outgrows one
chip while the batch dimension scales across groups (the reference has
no parallelism at all — SURVEY §2.4).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mma_tpu.graph.container import BatchedGraphs, Graph


def _pad_batch_edges(batch: BatchedGraphs, multiple: int) -> BatchedGraphs:
    """Host-side: re-pad the batch's edge arrays to a multiple of
    ``multiple`` (padding edges point at the padding node and are masked
    by ``edge_mask``; padded edge features are zeros)."""
    from mma_tpu.graph.build import pad_graph

    e = batch.graph.n_edge
    e_pad = ((e + multiple - 1) // multiple) * multiple
    if e_pad == e:
        return batch
    graph = pad_graph(batch.graph, batch.graph.n_node, e_pad)
    edge_feat = batch.edge_feat
    if edge_feat is not None:
        pad = [(0, e_pad - e)] + [(0, 0)] * (edge_feat.ndim - 1)
        edge_feat = jnp.asarray(np.pad(np.asarray(edge_feat), pad))
    return dataclasses.replace(batch, graph=graph, edge_feat=edge_feat)


def batch_shard_spec(
    data_axis: str, edge_axis: str, batch: BatchedGraphs
) -> BatchedGraphs:
    """A ``BatchedGraphs``-shaped pytree of ``PartitionSpec``s for a
    *stacked* batch (leading device axis): edge-dimension arrays sharded
    over (data, edge); node/graph-level arrays sharded over data only."""
    return BatchedGraphs(
        graph=Graph(
            src=P(data_axis, edge_axis),
            dst=P(data_axis, edge_axis),
            edge_mask=P(data_axis, edge_axis),
            node_mask=P(data_axis),
            deg=P(data_axis),
            row_ptr=P(data_axis),
            src_perm=None,  # per-shard kernel structure unsupported here
            col_ptr=None,
            src_csc=None,
            dst_csc=None,
            chunk_hint=None,
        ),
        node_to_graph=P(data_axis),
        graph_mask=P(data_axis),
        node_feat=None if batch.node_feat is None else P(data_axis),
        edge_feat=None if batch.edge_feat is None else P(data_axis, edge_axis),
        target=None if batch.target is None else P(data_axis),
    )


def shard_batches_dp_edge(
    batches: List[BatchedGraphs],
    mesh: Mesh,
    data_axis: str = "data",
    edge_axis: str = "edge",
) -> BatchedGraphs:
    """Stack one micro-batch per data group and place it on the 2-D mesh.

    ``len(batches)`` must equal ``mesh.shape[data_axis]``; all batches
    must share static shapes (use fixed ``n_node``/``n_edge`` budgets in
    ``ZincDataset.batches``). Edge arrays are padded to divide evenly
    into ``mesh.shape[edge_axis]`` contiguous shards (contiguity keeps
    each shard dst-sorted for ``indices_are_sorted`` segment ops).
    """
    assert len(batches) == mesh.shape[data_axis], (
        len(batches), dict(mesh.shape))
    n_edge_shards = mesh.shape[edge_axis]
    prepared = []
    for b in batches:
        b = _pad_batch_edges(b, n_edge_shards)
        # The transpose/kernel views don't survive edge sharding.
        b = dataclasses.replace(
            b,
            graph=dataclasses.replace(
                b.graph, src_perm=None, col_ptr=None, src_csc=None,
                dst_csc=None, chunk_hint=None, ell_hint=None,
            ),
        )
        prepared.append(b)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *prepared)
    spec = batch_shard_spec(data_axis, edge_axis, stacked)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), stacked, spec
    )


def _localize(stacked: BatchedGraphs) -> BatchedGraphs:
    """Inside ``shard_map``: strip the leading device axis off every
    leaf — node arrays become the group-replicated batch, edge arrays
    become this device's contiguous edge shard."""
    return jax.tree.map(lambda x: x[0], stacked)


def make_dp_edge_forward(
    model, mesh: Mesh, data_axis: str = "data", edge_axis: str = "edge"
):
    """``forward(params, state, stacked_batch) -> (D, G) predictions``
    (eval mode, deterministic)."""

    def forward(params, state, stacked_batch):
        spec = batch_shard_spec(data_axis, edge_axis, stacked_batch)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), spec),
            out_specs=P(data_axis),
            check_rep=False,
        )
        def fwd(p, s, sb):
            pred, _ = model.apply(
                p, s, _localize(sb), training=False, axis_name=edge_axis
            )
            return pred[None]

        return fwd(params, state, stacked_batch)

    return jax.jit(forward)


def make_dp_edge_train_step(
    model, opt, mesh: Mesh, data_axis: str = "data", edge_axis: str = "edge"
):
    """Returns ``step(params, state, opt_state, stacked_batch, rngs) ->
    (params, state, opt_state, loss)`` on the 2-D mesh.

    ``rngs``: ``(D, 2)`` uint32 keys, one per data group (pass ``None``
    for deterministic steps); each edge shard folds in its axis index so
    message-dropout bits differ across shards.
    """

    def step_fn(params, state, opt_state, stacked_batch, rngs):
        spec = batch_shard_spec(data_axis, edge_axis, stacked_batch)
        with_rng = rngs is not None  # static at trace time
        rng_in = rngs if with_rng else jnp.zeros((), jnp.uint32)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), spec, P(data_axis) if with_rng else P()),
            out_specs=(P(data_axis), P()),
            check_rep=False,
        )
        def fwd(p, s, sb, r):
            local = _localize(sb)
            rng = None
            if with_rng:
                rng = jax.random.fold_in(
                    r[0], jax.lax.axis_index(edge_axis)
                )
            pred, new_s = model.apply(
                p, s, local, training=True, rng=rng, axis_name=edge_axis
            )
            # BN stats: average across data groups (identical within an
            # edge group, so the pmean over data alone replicates them).
            new_s = jax.lax.pmean(new_s, data_axis)
            return pred[None], new_s

        targets = stacked_batch.target  # (D, G)
        gmask = stacked_batch.graph_mask.astype(jnp.float32)  # (D, G)

        def loss_fn(p):
            pred, new_s = fwd(p, state, stacked_batch, rng_in)
            err = jnp.sum(jnp.abs(pred - targets) * gmask)
            cnt = jnp.maximum(jnp.sum(gmask), 1.0)
            return err / cnt, new_s

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, new_opt_state, loss

    return jax.jit(step_fn)
