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


def graph_shard_spec(axis: str, kernel_structure: bool = False) -> Graph:
    """A ``Graph``-shaped pytree of ``PartitionSpec``s: edges sharded,
    node arrays replicated.

    ``kernel_structure=True`` matches graphs produced by
    ``shard_graph(..., kernel_structure=True)``: per-shard CSR/CSC arrays
    are stacked with a leading shard dim and sharded along it (each
    device sees a ``(1, ·)`` block — ``localize_graph`` squeezes it)."""
    if kernel_structure:
        return Graph(
            src=P(axis),
            dst=P(axis),
            edge_mask=P(axis),
            node_mask=P(),
            deg=P(),
            row_ptr=P(axis),  # stacked (S, N+1)
            src_perm=P(axis),  # stacked (S, E/S)
            col_ptr=P(axis),  # stacked (S, N+1)
            src_csc=P(axis),  # stacked (S, E/S)
            dst_csc=P(axis),  # stacked (S, E/S)
            chunk_hint=None,
        )
    return Graph(
        src=P(axis),
        dst=P(axis),
        edge_mask=P(axis),
        node_mask=P(),
        deg=P(),
        row_ptr=P(),
        src_perm=None,  # transpose view invalid across shards — dropped
        col_ptr=None,
        src_csc=None,
        dst_csc=None,
        chunk_hint=None,
    )


def localize_graph(graph: Graph) -> Graph:
    """Inside ``shard_map``: squeeze the leading shard dim off the
    stacked per-shard structure arrays (no-op for plain sharded graphs)."""
    import dataclasses

    if graph.row_ptr.ndim == 1:
        return graph
    return dataclasses.replace(
        graph,
        row_ptr=graph.row_ptr[0],
        src_perm=graph.src_perm[0] if graph.src_perm is not None else None,
        col_ptr=graph.col_ptr[0] if graph.col_ptr is not None else None,
        src_csc=graph.src_csc[0] if graph.src_csc is not None else None,
        dst_csc=graph.dst_csc[0] if graph.dst_csc is not None else None,
    )


def shard_graph(
    graph: Graph, mesh: Mesh, axis: str = "edge", kernel_structure: bool = False
) -> Graph:
    """Place a graph on the mesh with edges sharded along ``axis``.

    ``kernel_structure=True`` additionally builds *per-shard* CSR row
    offsets and CSC (src-sorted) orderings host-side so each device runs
    the fused Pallas kernels on its local edge slice (partial outputs
    psum-combined). Without it the sharded paths use XLA segment ops.
    """
    import dataclasses

    num_shards = int(np.prod([mesh.shape[axis]]))
    graph = pad_edges_for_sharding(graph, num_shards)

    if kernel_structure:
        from mma_tpu.graph import native

        n = graph.n_node
        e_loc = graph.n_edge // num_shards
        dst = np.asarray(graph.dst)
        src = np.asarray(graph.src)
        row_ptrs = np.zeros((num_shards, n + 1), np.int32)
        src_perms = np.zeros((num_shards, e_loc), np.int32)
        col_ptrs = np.zeros((num_shards, n + 1), np.int32)
        src_cscs = np.zeros((num_shards, e_loc), np.int32)
        dst_cscs = np.zeros((num_shards, e_loc), np.int32)
        for p in range(num_shards):
            lo = p * e_loc
            d_loc = dst[lo : lo + e_loc]
            s_loc = src[lo : lo + e_loc]
            row_ptrs[p] = native.build_row_ptr(d_loc, n)
            _, s_sorted, perm = native.sort_edges(d_loc, s_loc, n)
            src_perms[p] = perm
            col_ptrs[p] = native.build_row_ptr(s_sorted, n)
            src_cscs[p] = s_sorted
            dst_cscs[p] = d_loc[perm]
        graph = dataclasses.replace(
            graph,
            row_ptr=jnp.asarray(row_ptrs),
            src_perm=jnp.asarray(src_perms),
            col_ptr=jnp.asarray(col_ptrs),
            src_csc=jnp.asarray(src_cscs),
            dst_csc=jnp.asarray(dst_cscs),
            chunk_hint=None,
        )
    else:
        graph = dataclasses.replace(
            graph, chunk_hint=None, ell_hint=None, src_perm=None,
            col_ptr=None,
            src_csc=None, dst_csc=None,
        )
    spec = graph_shard_spec(axis, kernel_structure)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        graph,
        spec,
    )


def make_edge_sharded_forward(
    model, mesh: Mesh, axis: str = "edge", use_pallas: bool = False
):
    """``forward(params, x, graph) -> logp`` running edge-sharded.

    ``model`` is a :class:`~mma_tpu.models.node_classifier.NodeClassifier`;
    params/x replicated, graph edges sharded, output replicated.
    ``use_pallas`` requires a graph from
    ``shard_graph(..., kernel_structure=True)``.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), graph_shard_spec(axis, use_pallas)),
        out_specs=P(),
        check_rep=False,
    )
    def fwd(params, x, graph):
        return model.apply(
            params, x, localize_graph(graph), training=False,
            axis_name=axis, use_pallas=use_pallas,
        )

    return fwd


def make_edge_sharded_train_step(
    model, opt, mesh: Mesh, labels, idx_train, axis: str = "edge",
    use_pallas: bool = False,
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
        in_specs=(P(), P(), graph_shard_spec(axis, use_pallas), P()),
        out_specs=P(),
        check_rep=False,
    )
    def fwd(params, x, graph, rng):
        return model.apply(
            params, x, localize_graph(graph), training=True, rng=rng,
            axis_name=axis, use_pallas=use_pallas,
        )

    @jax.jit
    def step(params, opt_state, x, graph, rng):
        def loss_fn(p):
            logp = fwd(p, x, graph, rng)
            return -jnp.mean(logp[idx_train, labels[idx_train]])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step
