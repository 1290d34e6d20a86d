"""Data-parallel training for batched graph regression (ZINC).

Each device owns a full :class:`BatchedGraphs` micro-batch (built host-
side and stacked along a leading device axis). Inside ``shard_map`` each
device runs the model on its micro-batch; the loss is a global
graph-count-weighted mean (``psum`` of error sums and counts) so padding
and ragged final batches stay exact, and gradients follow from AD of that
global loss. BatchNorm batch statistics are computed per device and the
running-stat updates averaged (synchronous-BN approximation; noted in
tests)."""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mma_tpu.graph.container import BatchedGraphs


def stack_batches(batches: List[BatchedGraphs]) -> BatchedGraphs:
    """Stack per-device batches along a new leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def shard_stacked_batch(stacked: BatchedGraphs, mesh: Mesh, axis: str = "data"):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), stacked
    )


def make_dp_train_step(model, opt, mesh: Mesh, axis: str = "data"):
    """Returns ``step(params, state, opt_state, stacked_batch, rng) ->
    (params, state, opt_state, loss)``; params/state replicated, batch
    sharded along the leading device axis."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def loss_and_state(params, state, batch, rng):
        local = jax.tree.map(lambda x: x[0], batch)  # strip device axis
        pred, new_state = model.apply(
            params, state, local, training=True, rng=rng[0]
        )
        gm = local.graph_mask.astype(pred.dtype)
        err = jnp.sum(jnp.abs(pred - local.target) * gm)
        cnt = jnp.sum(gm)
        loss = jax.lax.psum(err, axis) / jnp.maximum(jax.lax.psum(cnt, axis), 1.0)
        new_state = jax.lax.pmean(new_state, axis)
        return loss, new_state

    @jax.jit
    def step(params, state, opt_state, stacked_batch, rngs):
        def loss_fn(p):
            return loss_and_state(p, state, stacked_batch, rngs)

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, new_opt_state, loss

    return step
