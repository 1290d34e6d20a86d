"""Edge-partitioned execution of the node-classification stack.

The scaling axis of a full-graph GNN is the *edge* dimension (SURVEY §5.7
— the reference's analog of sequence parallelism). Strategy:

- the dst-sorted edge list is split into contiguous, equal-size shards —
  contiguity preserves per-shard sortedness and (because consecutive
  edges share destinations) keeps each shard's partial output rows
  mostly disjoint;
- node-level arrays (features, degrees, CSR offsets) are replicated;
- inside ``shard_map``, every edge-driven reduction produces a full-size
  partial that is ``psum``-combined (``axis_name`` plumbed through
  ``masked_multi_aggregate`` / ``binary_spmm``). All usable aggregators
  reduce neighbors by sum, so partials are exact.

This is the dense/replicated-activation regime: node compute is
duplicated per device and edge compute is partitioned. Node sharding with
halo gathers is the next regime (larger-than-chip graphs) and lands on
top of the same axis plumbing.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mma_tpu.graph.container import Graph


def pad_edges_for_sharding(graph: Graph, num_shards: int) -> Graph:
    """Host-side: re-pad the edge list so it divides evenly into shards."""
    from mma_tpu.graph.build import pad_graph

    e = graph.n_edge
    e_pad = ((e + num_shards - 1) // num_shards) * num_shards
    if e_pad == e:
        return graph
    return pad_graph(graph, graph.n_node, e_pad)


def graph_shard_spec(axis: str, chunk_hint=None) -> Graph:
    """A ``Graph``-shaped pytree of ``PartitionSpec``s: edges sharded,
    node arrays replicated. ``chunk_hint`` must match the target graph's
    static metadata for pytree-structure equality."""
    return Graph(
        src=P(axis),
        dst=P(axis),
        edge_mask=P(axis),
        node_mask=P(),
        deg=P(),
        row_ptr=P(),
        src_perm=None,  # transpose view invalid across shards — dropped
        col_ptr=None,
        chunk_hint=chunk_hint,
    )


def shard_graph(graph: Graph, mesh: Mesh, axis: str = "edge") -> Graph:
    """Place a graph on the mesh with edges sharded along ``axis``.

    The returned graph's ``chunk_hint`` is cleared: the hint describes the
    unsharded edge layout and the fused Pallas path is not used under edge
    sharding (keeps its pytree structure equal to ``graph_shard_spec``'s).
    """
    import dataclasses

    graph = pad_edges_for_sharding(graph, int(np.prod([mesh.shape[axis]])))
    graph = dataclasses.replace(
        graph, chunk_hint=None, src_perm=None, col_ptr=None
    )
    spec = graph_shard_spec(axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        graph,
        spec,
    )


def make_edge_sharded_forward(model, mesh: Mesh, axis: str = "edge"):
    """``forward(params, x, graph) -> logp`` running edge-sharded.

    ``model`` is a :class:`~mma_tpu.models.node_classifier.NodeClassifier`;
    params/x replicated, graph edges sharded, output replicated.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), graph_shard_spec(axis)),
        out_specs=P(),
        check_rep=False,
    )
    def fwd(params, x, graph):
        return model.apply(params, x, graph, training=False, axis_name=axis)

    return fwd


def make_edge_sharded_train_step(
    model, opt, mesh: Mesh, labels, idx_train, axis: str = "edge"
):
    """Full-batch training step with edges sharded and grads exact.

    The sharded forward (a differentiable ``shard_map``) is placed *inside*
    the loss; ``jax.grad`` of the global loss through the shard_map gives
    the exact gradient of the logically-unsharded computation — no manual
    gradient collectives to get wrong.
    """
    import optax

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), graph_shard_spec(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    def fwd(params, x, graph, rng):
        return model.apply(params, x, graph, training=True, rng=rng, axis_name=axis)

    @jax.jit
    def step(params, opt_state, x, graph, rng):
        def loss_fn(p):
            logp = fwd(p, x, graph, rng)
            return -jnp.mean(logp[idx_train, labels[idx_train]])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step
