"""Node-sharded execution with halo exchange — the large-graph regime.

``edge_parallel`` replicates node features and shards edges; that caps
out when ``(N, F)`` no longer fits a chip. Here the *nodes* are sharded:

- nodes are partitioned into contiguous, edge-balanced row ranges
  (``native.balanced_row_cuts``), one per device; each device owns its
  rows' features and all in-edges of those rows (CSR rows partition the
  dst-sorted edge list — SURVEY §5.7 "1-D edge partition ... with halo
  exchange");
- messages need source-node values owned by other devices — the *halo*.
  Host-side preprocessing computes, per device pair (q → p), the exact
  rows q must send p; at run time one ``all_to_all`` inside ``shard_map``
  moves only those boundary rows (not an all-gather), and local edges
  index an extended table ``[local rows ‖ halo rows]`` via precomputed
  indices;
- every propagation step reuses the same halo structure with different
  payload widths: the GCN layer exchanges ``x@W0`` (hidden-wide, not the
  raw features), the MMA layer exchanges ``[d-projection ‖ h]`` once for
  the masked aggregation and the final projection once for its SpMM.

Gradients flow through ``all_to_all`` automatically (its transpose is the
reverse exchange), so training is exact — verified against the
unsharded model in tests.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mma_tpu.graph import native
from mma_tpu.graph.container import Graph


def _dataclass_pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, leaves):
        return cls(*leaves)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass
class NodeShardedGraph:
    """Per-shard graph structure, stacked along a leading shard axis S.

    Shapes: ``S`` shards, ``N_m`` max local rows, ``E_m`` max local
    edges, ``H_m`` max halo rows per (sender, receiver) pair. Edge
    sources index the extended value table ``[N_m local ‖ S·H_m halo]``
    (halo slot of sender q, position j ↦ ``N_m + q·H_m + j``).
    """

    ext_src: jnp.ndarray  # (S, E_m) int32 — src as extended-table index
    dst_local: jnp.ndarray  # (S, E_m) int32 — dst as local row, sorted
    edge_mask: jnp.ndarray  # (S, E_m) bool
    deg: jnp.ndarray  # (S, N_m) f32 — true in-degree of local rows
    node_mask: jnp.ndarray  # (S, N_m) bool
    global_ids: jnp.ndarray  # (S, N_m) int32 — local row → global id (pad -1)
    send_idx: jnp.ndarray  # (S, S, H_m) int32 — local rows shard p sends to q
    send_mask: jnp.ndarray  # (S, S, H_m) bool


_dataclass_pytree(NodeShardedGraph)


def build_node_sharded(graph: Graph, num_shards: int) -> Tuple[NodeShardedGraph, np.ndarray]:
    """Host-side partition + halo plan. Returns the stacked structure and
    the row cut points (``(num_shards+1,)`` global node ids)."""
    e_mask = np.asarray(graph.edge_mask)
    src = np.asarray(graph.src)[e_mask]
    dst = np.asarray(graph.dst)[e_mask]
    num_nodes = int(np.asarray(graph.node_mask).sum())
    deg_global = np.asarray(graph.deg)

    counts = np.bincount(dst, minlength=num_nodes)
    row_ptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    cuts = native.balanced_row_cuts(row_ptr.astype(np.int32), num_shards)

    owner = np.zeros(num_nodes, np.int32)
    for p in range(num_shards):
        owner[cuts[p] : cuts[p + 1]] = p

    # Per-pair halo rows: q → p needs sources owned by q of p's edges.
    halo = [[None] * num_shards for _ in range(num_shards)]
    per_shard = []
    for p in range(num_shards):
        lo, hi = int(cuts[p]), int(cuts[p + 1])
        e_sel = (dst >= lo) & (dst < hi)
        s_p, d_p = src[e_sel], dst[e_sel]
        for q in range(num_shards):
            if q == p:
                continue
            qs = np.unique(s_p[owner[s_p] == q])
            halo[q][p] = qs  # rows (global ids) q sends to p
        per_shard.append((lo, hi, s_p, d_p))

    n_m = max(int(cuts[p + 1] - cuts[p]) for p in range(num_shards)) + 1
    e_m = max(len(ps[2]) for ps in per_shard)
    e_m = max(((e_m + 127) // 128) * 128, 128)
    h_m = max(
        (len(halo[q][p]) if halo[q][p] is not None else 0)
        for q in range(num_shards)
        for p in range(num_shards)
    )
    h_m = max(((h_m + 7) // 8) * 8, 8)

    ext_src = np.zeros((num_shards, e_m), np.int32)
    dst_local = np.full((num_shards, e_m), n_m - 1, np.int32)
    edge_mask = np.zeros((num_shards, e_m), bool)
    deg = np.zeros((num_shards, n_m), np.float32)
    node_mask = np.zeros((num_shards, n_m), bool)
    global_ids = np.full((num_shards, n_m), -1, np.int32)
    send_idx = np.zeros((num_shards, num_shards, h_m), np.int32)
    send_mask = np.zeros((num_shards, num_shards, h_m), bool)

    # halo slot lookup: for receiver p, sender q, global id s → slot pos.
    slot_of = [dict() for _ in range(num_shards)]
    for p in range(num_shards):
        for q in range(num_shards):
            if q == p or halo[q][p] is None:
                continue
            for j, s in enumerate(halo[q][p]):
                slot_of[p][(q, int(s))] = j
            lo_q = int(cuts[q])
            k = len(halo[q][p])
            send_idx[q, p, :k] = halo[q][p] - lo_q  # q-local rows
            send_mask[q, p, :k] = True

    for p in range(num_shards):
        lo, hi, s_p, d_p = per_shard[p]
        n_loc = hi - lo
        node_mask[p, :n_loc] = True
        global_ids[p, :n_loc] = np.arange(lo, hi)
        deg[p, :n_loc] = deg_global[lo:hi]
        # dst-sorted already (contiguous slice of the sorted list)
        k = len(s_p)
        dst_local[p, :k] = d_p - lo
        edge_mask[p, :k] = True
        ext = np.empty(k, np.int32)
        for i, s in enumerate(s_p):
            q = owner[s]
            if q == p:
                ext[i] = s - lo
            else:
                ext[i] = n_m + q * h_m + slot_of[p][(int(q), int(s))]
        ext_src[p, :k] = ext

    return (
        NodeShardedGraph(
            ext_src=jnp.asarray(ext_src),
            dst_local=jnp.asarray(dst_local),
            edge_mask=jnp.asarray(edge_mask),
            deg=jnp.asarray(deg),
            node_mask=jnp.asarray(node_mask),
            global_ids=jnp.asarray(global_ids),
            send_idx=jnp.asarray(send_idx),
            send_mask=jnp.asarray(send_mask),
        ),
        np.asarray(cuts),
    )


def shard_spec(axis: str) -> NodeShardedGraph:
    return NodeShardedGraph(*([P(axis)] * 8))


def place_on_mesh(sharded: NodeShardedGraph, mesh: Mesh, axis: str = "node"):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), sharded
    )


def shard_node_values(values: np.ndarray, cuts: np.ndarray, n_m: int):
    """Stack per-shard local value blocks (S, N_m, F) from global (N, F)."""
    s = len(cuts) - 1
    out = np.zeros((s, n_m) + values.shape[1:], values.dtype)
    for p in range(s):
        lo, hi = int(cuts[p]), int(cuts[p + 1])
        out[p, : hi - lo] = values[lo:hi]
    return jnp.asarray(out)


def halo_exchange(values_local: jnp.ndarray, sg: NodeShardedGraph, axis: str):
    """Extended value table for this shard: ``[local ‖ halo]``.

    ``values_local``: (N_m, F) this shard's rows (inside shard_map).
    One ``all_to_all`` moves exactly the precomputed boundary rows.
    """
    send_idx = sg.send_idx  # (S, H_m) — this shard's row lists per receiver
    send_mask = sg.send_mask
    buf = values_local[send_idx]  # (S, H_m, F)
    buf = jnp.where(send_mask[..., None], buf, 0.0)
    recv = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=False)
    halo_flat = recv.reshape(-1, values_local.shape[-1])  # (S·H_m, F)
    return jnp.concatenate([values_local, halo_flat], axis=0)


def _local_segment_sum(data, dst_local, n_m):
    return jax.ops.segment_sum(data, dst_local, num_segments=n_m,
                               indices_are_sorted=True)


def make_node_sharded_forward(model, mesh: Mesh, axis: str = "node"):
    """Edge-balanced node-sharded forward of a NodeClassifier.

    Returns ``fwd(params, x_shards, sg) -> logp_shards`` with params
    replicated, ``x_shards`` (S, N_m, F_in) and outputs (S, N_m, C)
    sharded along ``axis``. Deterministic (dropout off) — the training
    wrapper adds rngs.
    """
    from mma_tpu.ops.masked_aggregate import (
        _sigmoid_lane_pattern,
        mma_mask_projections,
    )
    from mma_tpu.ops.scalers import apply_scalers

    mma = model.mma
    specs = mma.specs
    k = len(specs)

    def forward_local(params, x_local, sg):
        n_m = x_local.shape[0]
        f_hid = model.n_hidden
        valid_e = sg.edge_mask[:, None]

        # --- gc1: support halo + SpMM + bias + relu -------------------
        support = x_local @ params["gc1"]["w"]  # (N_m, H)
        ext = halo_exchange(support, sg, axis)
        h = _local_segment_sum(
            jnp.where(valid_e, ext[sg.ext_src], 0.0), sg.dst_local, n_m
        ) + params["gc1"]["b"]
        h = jax.nn.relu(h)

        # --- MMA masked aggregation ----------------------------------
        c, d = mma_mask_projections(h, params["mma"]["masks"])  # (N_m, K·F)
        ext_dh = halo_exchange(jnp.concatenate([d, h], axis=1), sg, axis)
        d_src = ext_dh[sg.ext_src, : k * f_hid]
        h_src = ext_dh[sg.ext_src, k * f_hid :]
        logits = c[sg.dst_local] + d_src
        pat = _sigmoid_lane_pattern(specs, mma.activation, mma.parity, f_hid)
        mask = jnp.where(pat[None, :], jax.nn.sigmoid(logits), logits)
        msgs = mask * jnp.tile(h_src, (1, k))
        msgs = jnp.where(valid_e, msgs, 0.0)
        s = _local_segment_sum(msgs, sg.dst_local, n_m).reshape(n_m, k, f_hid)

        deg = jnp.maximum(sg.deg, 1.0)[:, None]
        outs = []
        for idx, sp in enumerate(specs):
            sk = s[:, idx, :]
            if sp.combine == "sum":
                outs.append(h + sk)
            elif sp.combine == "mean":
                outs.append((h + sk) / deg)
            elif sp.combine == "max":
                outs.append(jnp.maximum(h, sk))
            elif sp.combine == "min":
                outs.append(jnp.minimum(h, sk))
            elif sp.combine == "passthrough":
                outs.append(sk)
            else:
                raise NotImplementedError(sp.combine)
        msum = sum(outs)
        scaled = apply_scalers(
            msum, sg.deg, sg.node_mask, mma.scalers, parity=mma.parity
        )

        # --- MMA final SpMM ------------------------------------------
        support2 = scaled @ params["mma"]["w"]  # (N_m, C)
        ext2 = halo_exchange(support2, sg, axis)
        out = _local_segment_sum(
            jnp.where(valid_e, ext2[sg.ext_src], 0.0), sg.dst_local, n_m
        ) + params["mma"]["b"]
        return jax.nn.log_softmax(out, axis=-1)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), shard_spec(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    def fwd(params, x_shards, sg):
        local = jax.tree.map(lambda v: v[0], (x_shards, sg))
        x_local, sg_local = local
        return forward_local(params, x_local, sg_local)[None]

    return fwd
