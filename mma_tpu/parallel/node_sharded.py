"""Node-sharded execution with overlapped halo exchange — the large-graph regime.

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
  moves only those boundary rows (not an all-gather);
- **exchange/compute overlap** (SURVEY §5.7 "overlapped", the GNN analog
  of ring attention): local edges are split host-side into *interior*
  edges (source owned locally) and *boundary* edges (source in the halo).
  The interior segment-reduce depends only on local values, so XLA's
  latency-hiding scheduler runs the ``all_to_all`` concurrently with it
  (collective-start before the interior reduce, collective-done just
  before the boundary reduce). Boundary edges are a compact side list
  (``bnd_*``), so the split costs no extra passes over interior data;
- every propagation step reuses the same halo structure with different
  payload widths: the GCN layer exchanges ``x@W0`` (hidden-wide, not the
  raw features), the MMA layer exchanges ``[d-projection ‖ h]`` once for
  the masked aggregation and the final projection once for its SpMM.

Gradients flow through ``all_to_all`` automatically (its transpose is the
reverse exchange), so training is exact — ``make_node_sharded_train_step``
is the full training regime (per-shard dropout rngs, optimizer update),
verified against the unsharded model in tests.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mma_tpu.graph import native
from mma_tpu.graph.container import Graph

_EPS = 1e-5  # matches ops.masked_aggregate._EPS


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
    edges, ``H_m`` max halo rows per (sender, receiver) pair, ``B_m``
    max boundary edges. Edge sources index the extended value table
    ``[N_m local ‖ S·H_m halo]`` (halo slot of sender q, position j ↦
    ``N_m + q·H_m + j``). Boundary edges (source remote) additionally
    appear in the compact ``bnd_*`` side list — ``bnd_halo`` indexes the
    flat halo buffer directly (``q·H_m + j``) — so the interior reduce
    (which never reads the halo) and the exchange can overlap.
    """

    ext_src: jnp.ndarray  # (S, E_m) int32 — src as extended-table index
    dst_local: jnp.ndarray  # (S, E_m) int32 — dst as local row, sorted
    edge_mask: jnp.ndarray  # (S, E_m) bool
    deg: jnp.ndarray  # (S, N_m) f32 — true in-degree of local rows
    node_mask: jnp.ndarray  # (S, N_m) bool
    global_ids: jnp.ndarray  # (S, N_m) int32 — local row → global id (pad -1)
    send_idx: jnp.ndarray  # (S, S, H_m) int32 — local rows shard p sends to q
    send_mask: jnp.ndarray  # (S, S, H_m) bool
    bnd_halo: jnp.ndarray  # (S, B_m) int32 — boundary edge → halo-flat row
    bnd_dst: jnp.ndarray  # (S, B_m) int32 — boundary edge dst (local, sorted)
    bnd_mask: jnp.ndarray  # (S, B_m) bool
    # Local CSR row pointers over dst_local / bnd_dst (padding edges
    # counted in the last row) — the structure the fused Pallas
    # segment-sum kernel needs to run per shard (use_pallas paths).
    row_ptr: jnp.ndarray  # (S, N_m+1) int32
    bnd_row_ptr: jnp.ndarray  # (S, N_m+1) int32


_dataclass_pytree(NodeShardedGraph)


def partition_order(graph: Graph, num_shards: int, method: str = "ldg"):
    """Locality-aware node ordering for the node-sharded regime.

    Returns ``order`` — the original node ids arranged so each shard's
    nodes are one contiguous block — computed by the native LDG streaming
    partitioner (``native/graphops.cpp::mma_partition_ldg``): nodes go to
    the part holding most of their already-placed neighbors, edge-load
    balanced. On graphs with community structure this cuts the boundary
    fraction several-fold vs contiguous cuts on a scrambled node order;
    on locality-free random graphs it matches them (no partitioner can
    beat random conductance). ``method="contiguous"`` (or a missing
    native lib) returns the identity order.
    """
    num_nodes = int(np.asarray(graph.node_mask).sum())
    if method == "ldg":
        e_mask = np.asarray(graph.edge_mask)
        src = np.asarray(graph.src)[e_mask]
        dst = np.asarray(graph.dst)[e_mask]
        counts = np.bincount(dst, minlength=num_nodes)
        row_ptr = np.zeros(num_nodes + 1, np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        part = native.partition_ldg(row_ptr, src, num_shards)
        if part is not None:
            return np.argsort(part, kind="stable").astype(np.int64)
    return np.arange(num_nodes, dtype=np.int64)


def build_node_sharded_ordered(
    graph: Graph, num_shards: int, method: str = "ldg"
) -> Tuple[NodeShardedGraph, np.ndarray, np.ndarray]:
    """Partition + halo plan under a locality-aware node order.

    Returns ``(sg, cuts, order)``: the stacked per-shard structure, cut
    points in the REORDERED node sequence, and ``order`` itself (original
    node ids; shard ``p`` owns ``order[cuts[p]:cuts[p+1]]``). Pass
    ``order`` to :func:`shard_node_values` so features/labels follow the
    same layout; ``sg.global_ids`` maps local rows back to original ids.
    """
    order = partition_order(graph, num_shards, method)
    num_nodes = int(np.asarray(graph.node_mask).sum())
    if np.array_equal(order, np.arange(num_nodes)):
        sg, cuts = build_node_sharded(graph, num_shards)
        return sg, cuts, order
    inv = np.empty(num_nodes, np.int64)
    inv[order] = np.arange(num_nodes)
    e_mask = np.asarray(graph.edge_mask)
    src = inv[np.asarray(graph.src)[e_mask]].astype(np.int32)
    dst = inv[np.asarray(graph.dst)[e_mask]].astype(np.int32)
    from mma_tpu.graph.build import graph_from_edges

    g2 = graph_from_edges(src, dst, num_nodes,
                          n_node_pad=graph.n_node, n_edge_pad=graph.n_edge)
    sg, cuts = build_node_sharded(g2, num_shards)
    # Map local rows back to ORIGINAL node ids for callers.
    gids = np.asarray(sg.global_ids)
    valid = gids >= 0
    gids = gids.copy()
    gids[valid] = order[gids[valid]]
    sg = dataclasses.replace(sg, global_ids=jnp.asarray(gids))
    return sg, cuts, order


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

    def _round_edges(m):
        # 128-lane multiple; above one kernel block, a BLOCK_B multiple
        # (fused_segment_sum_raw needs block_b | E_m).
        m = max(((m + 127) // 128) * 128, 128)
        if m > 1024:
            m = ((m + 1023) // 1024) * 1024
        return m

    n_m = max(int(cuts[p + 1] - cuts[p]) for p in range(num_shards)) + 1
    e_m = _round_edges(max(len(ps[2]) for ps in per_shard))
    h_m = max(
        (len(halo[q][p]) if halo[q][p] is not None else 0)
        for q in range(num_shards)
        for p in range(num_shards)
    )
    h_m = max(((h_m + 7) // 8) * 8, 8)
    b_m = _round_edges(max(
        int((owner[ps[2]] != p).sum()) for p, ps in enumerate(per_shard)
    ))

    ext_src = np.zeros((num_shards, e_m), np.int32)
    dst_local = np.full((num_shards, e_m), n_m - 1, np.int32)
    edge_mask = np.zeros((num_shards, e_m), bool)
    deg = np.zeros((num_shards, n_m), np.float32)
    node_mask = np.zeros((num_shards, n_m), bool)
    global_ids = np.full((num_shards, n_m), -1, np.int32)
    send_idx = np.zeros((num_shards, num_shards, h_m), np.int32)
    send_mask = np.zeros((num_shards, num_shards, h_m), bool)
    bnd_halo = np.zeros((num_shards, b_m), np.int32)
    bnd_dst = np.full((num_shards, b_m), n_m - 1, np.int32)
    bnd_mask = np.zeros((num_shards, b_m), bool)
    row_ptr_l = np.zeros((num_shards, n_m + 1), np.int32)
    bnd_row_ptr = np.zeros((num_shards, n_m + 1), np.int32)

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
        remote = owner[s_p] != p
        for i, s in enumerate(s_p):
            q = owner[s]
            if q == p:
                ext[i] = s - lo
            else:
                ext[i] = n_m + q * h_m + slot_of[p][(int(q), int(s))]
        ext_src[p, :k] = ext
        # Boundary side list (dst-sorted: extracted in edge order).
        nb = int(remote.sum())
        bnd_halo[p, :nb] = ext[remote] - n_m
        bnd_dst[p, :nb] = d_p[remote] - lo
        bnd_mask[p, :nb] = True
        # Local CSR over ALL E_m/B_m slots (padding edges land in the
        # last row) — feeds the fused Pallas kernel's block grid.
        np.cumsum(np.bincount(dst_local[p], minlength=n_m),
                  out=row_ptr_l[p, 1:])
        np.cumsum(np.bincount(bnd_dst[p], minlength=n_m),
                  out=bnd_row_ptr[p, 1:])

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
            bnd_halo=jnp.asarray(bnd_halo),
            bnd_dst=jnp.asarray(bnd_dst),
            bnd_mask=jnp.asarray(bnd_mask),
            row_ptr=jnp.asarray(row_ptr_l),
            bnd_row_ptr=jnp.asarray(bnd_row_ptr),
        ),
        np.asarray(cuts),
    )


def shard_spec(axis: str) -> NodeShardedGraph:
    n_fields = len(dataclasses.fields(NodeShardedGraph))
    return NodeShardedGraph(*([P(axis)] * n_fields))


def place_on_mesh(sharded: NodeShardedGraph, mesh: Mesh, axis: str = "node"):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), sharded
    )


def shard_node_values(values: np.ndarray, cuts: np.ndarray, n_m: int,
                      order: "np.ndarray | None" = None):
    """Stack per-shard local value blocks (S, N_m, F) from global (N, F).

    ``order``: the node ordering from :func:`build_node_sharded_ordered`
    (None = identity — plain :func:`build_node_sharded` layout)."""
    values = np.asarray(values)
    if order is not None:
        values = values[order]
    s = len(cuts) - 1
    out = np.zeros((s, n_m) + values.shape[1:], values.dtype)
    for p in range(s):
        lo, hi = int(cuts[p]), int(cuts[p + 1])
        out[p, : hi - lo] = values[lo:hi]
    return jnp.asarray(out)


def halo_exchange(values_local: jnp.ndarray, sg: NodeShardedGraph, axis: str):
    """Flat halo buffer ``(S·H_m, F)`` received by this shard.

    ``values_local``: (N_m, F) this shard's rows (inside shard_map).
    One ``all_to_all`` moves exactly the precomputed boundary rows. Only
    the boundary reduce consumes the result, so XLA schedules the
    collective concurrently with the interior reduce (async
    collective-start/done on TPU).
    """
    send_idx = sg.send_idx  # (S, H_m) — this shard's row lists per receiver
    send_mask = sg.send_mask
    buf = values_local[send_idx]  # (S, H_m, F)
    buf = jnp.where(send_mask[..., None], buf, 0.0)
    recv = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=False)
    return recv.reshape(-1, values_local.shape[-1])  # (S·H_m, F)


def _local_segment_sum(data, dst_local, n_m):
    return jax.ops.segment_sum(data, dst_local, num_segments=n_m,
                               indices_are_sorted=True)


def _seg_sum(data, dst_local, row_ptr, n_m, use_pallas):
    """Shard-local dst-keyed segment sum: XLA scatter or the fused
    Pallas row-block kernel (``fused_segment_sum_raw`` — the per-shard
    CSR built by :func:`build_node_sharded` provides the block grid).
    Callers zero padded data rows; padding edges point at the last row,
    so containment matches the XLA formulation exactly."""
    if use_pallas:
        from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_raw

        return fused_segment_sum_raw(data, dst_local, row_ptr)
    return _local_segment_sum(data, dst_local, n_m)


def _interior_gather(values_local: jnp.ndarray, sg: NodeShardedGraph):
    """Per-edge source values for interior edges; boundary/padding → 0.

    Appends one zero row to the local table and routes every edge whose
    source is remote (or padding) to it — no halo dependence."""
    n_m = values_local.shape[0]
    vz = jnp.concatenate(
        [values_local, jnp.zeros((1, values_local.shape[1]), values_local.dtype)]
    )
    is_int = (sg.ext_src < n_m) & sg.edge_mask
    idx = jnp.where(is_int, sg.ext_src, n_m)
    return vz[idx], is_int


def halo_spmm(values_local: jnp.ndarray, sg: NodeShardedGraph, axis: str,
              use_pallas: bool = False):
    """``(A @ values)`` restricted to this shard's rows, halo-overlapped.

    Interior edges reduce local values (no halo dependence); boundary
    edges reduce the exchanged halo rows via the compact side list."""
    n_m = values_local.shape[0]
    halo = halo_exchange(values_local, sg, axis)
    vals_int, _ = _interior_gather(values_local, sg)
    out = _seg_sum(vals_int, sg.dst_local, sg.row_ptr, n_m, use_pallas)
    bvals = jnp.where(sg.bnd_mask[:, None], halo[sg.bnd_halo], 0.0)
    return out + _seg_sum(bvals, sg.bnd_dst, sg.bnd_row_ptr, n_m, use_pallas)


def _mma_local_forward(model, params, x_local, sg: NodeShardedGraph, axis: str,
                       rng: Optional[jax.Array] = None,
                       training: bool = False, use_pallas: bool = False):
    """One shard's NodeClassifier forward (inside shard_map).

    ``rng``: per-shard key (already fold_in'ed with the shard index by the
    caller); enables the between-layer feature dropout (training only)
    and the always-on mask dropout (N2) like the unsharded model.
    """
    from mma_tpu.nn.layers import dropout
    from mma_tpu.ops.masked_aggregate import (
        _sigmoid_lane_pattern,
        mma_mask_projections,
    )
    from mma_tpu.ops.scalers import apply_scalers

    mma = model.mma
    specs = mma.specs
    k = len(specs)
    n_m = x_local.shape[0]
    f_hid = model.n_hidden

    feat_rng = mask_rng = None
    if rng is not None:
        feat_rng, mask_rng = jax.random.split(rng)

    # --- gc1: support halo + SpMM + bias + relu (+ dropout) -----------
    support = x_local @ params["gc1"]["w"]  # (N_m, H)
    h = jax.nn.relu(
        halo_spmm(support, sg, axis, use_pallas) + params["gc1"]["b"]
    )
    h = dropout(feat_rng if training else None, h, model.dropout_rate)

    # --- MMA masked aggregation (interior ‖ boundary, overlapped) -----
    c, d = mma_mask_projections(h, params["mma"]["masks"])  # (N_m, K·F)
    dh = jnp.concatenate([d, h], axis=1)
    halo_dh = halo_exchange(dh, sg, axis)
    pat = _sigmoid_lane_pattern(specs, mma.activation, mma.parity, f_hid)
    need_m2 = any(sp.combine == "std" for sp in specs)
    need_m3 = any(sp.combine == "moment_3" for sp in specs)

    def edge_msgs(dh_rows, dst_idx, valid, drop_key):
        logits = c[dst_idx] + dh_rows[:, : k * f_hid]
        mask = jnp.where(pat[None, :], jax.nn.sigmoid(logits), logits)
        if drop_key is not None and mma.mask_dropout > 0.0:
            keep = jax.random.bernoulli(
                drop_key, 1.0 - mma.mask_dropout, mask.shape
            )
            mask = jnp.where(keep, mask / (1.0 - mma.mask_dropout), 0.0)
        msgs = mask * jnp.tile(dh_rows[:, k * f_hid :], (1, k))
        return jnp.where(valid[:, None], msgs, 0.0)

    int_key = bnd_key = None
    if mask_rng is not None:
        int_key, bnd_key = jax.random.split(mask_rng)
    dh_int, is_int = _interior_gather(dh, sg)
    m_int = edge_msgs(dh_int, sg.dst_local, is_int, int_key)
    dh_bnd = halo_dh[sg.bnd_halo]
    m_bnd = edge_msgs(dh_bnd, sg.bnd_dst, sg.bnd_mask, bnd_key)

    def both_sums(fi, fb):
        return (
            _seg_sum(fi, sg.dst_local, sg.row_ptr, n_m, use_pallas)
            + _seg_sum(fb, sg.bnd_dst, sg.bnd_row_ptr, n_m, use_pallas)
        ).reshape(n_m, k, f_hid)

    s = both_sums(m_int, m_bnd)
    s2 = both_sums(m_int * m_int, m_bnd * m_bnd) if need_m2 else None
    s3 = None
    if need_m3:
        # Two-pass central moment (matches masked_multi_aggregate): cube
        # the *centered* messages — the raw-moment form cancels
        # catastrophically for low-degree nodes.
        mean_flat = (s / jnp.maximum(sg.deg, 1.0)[:, None, None]).reshape(
            n_m, k * f_hid
        )
        c_int = jnp.where(
            is_int[:, None], (m_int - mean_flat[sg.dst_local]) ** 3, 0.0
        )
        c_bnd = jnp.where(
            sg.bnd_mask[:, None], (m_bnd - mean_flat[sg.bnd_dst]) ** 3, 0.0
        )
        s3 = both_sums(c_int, c_bnd)

    deg = jnp.maximum(sg.deg, 1.0)[:, None]
    outs = []
    for idx, sp in enumerate(specs):
        sk = s[:, idx, :]
        if sp.combine == "sum":
            out = h + sk
        elif sp.combine == "mean":
            out = (h + sk) / deg
        elif sp.combine == "max":
            out = jnp.maximum(h, sk)
        elif sp.combine == "min":
            out = jnp.minimum(h, sk)
        elif sp.combine == "passthrough":
            out = sk
        elif sp.combine == "std":
            mean, mean_sq = sk / deg, s2[:, idx, :] / deg
            out = jnp.sqrt(jax.nn.relu(mean_sq - mean * mean) + _EPS)
        elif sp.combine == "normalized_mean":
            out = sk * jax.lax.rsqrt(deg)
        elif sp.combine == "moment_3":
            m3 = s3[:, idx, :] / deg
            # continuous signed cube root — see masked_multi_aggregate
            out = m3 * (m3 * m3 + _EPS) ** (-1.0 / 3.0)
        else:
            raise ValueError(f"unknown combine {sp.combine!r}")
        outs.append(out)
    msum = sum(outs)
    # Fixed-mode scalers normalize by the GLOBAL mean log-degree — psum
    # the local sums (parity mode never reads it).
    avg_log_deg = None
    if not mma.parity:
        log_deg = jnp.log(sg.deg + 1.0)
        lsum = jax.lax.psum(
            jnp.sum(jnp.where(sg.node_mask, log_deg, 0.0)), axis
        )
        lcnt = jax.lax.psum(
            jnp.sum(sg.node_mask.astype(jnp.float32)), axis
        )
        avg_log_deg = lsum / jnp.maximum(lcnt, 1.0)
    scaled = apply_scalers(
        msum, sg.deg, sg.node_mask, mma.scalers, parity=mma.parity,
        avg_log_deg=avg_log_deg,
    )

    # --- MMA final SpMM ------------------------------------------------
    support2 = scaled @ params["mma"]["w"]  # (N_m, C)
    out = halo_spmm(support2, sg, axis, use_pallas) + params["mma"]["b"]
    return jax.nn.log_softmax(out, axis=-1)


def make_node_sharded_forward(model, mesh: Mesh, axis: str = "node",
                              use_pallas: bool = False):
    """Edge-balanced node-sharded forward of a NodeClassifier.

    Returns ``fwd(params, x_shards, sg) -> logp_shards`` with params
    replicated, ``x_shards`` (S, N_m, F_in) and outputs (S, N_m, C)
    sharded along ``axis``. Deterministic (dropout off) — use
    :func:`make_node_sharded_train_step` for training.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), shard_spec(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    def fwd(params, x_shards, sg):
        x_local, sg_local = jax.tree.map(lambda v: v[0], (x_shards, sg))
        return _mma_local_forward(
            model, params, x_local, sg_local, axis, use_pallas=use_pallas
        )[None]

    return fwd


def make_node_sharded_train_step(
    model, opt, mesh: Mesh, axis: str = "node", dropout: bool = True,
    use_pallas: bool = False,
):
    """Full training step in the node-sharded regime.

    Returns ``step(params, opt_state, x_shards, sg, labels_shards,
    train_mask_shards, rng) -> (params, opt_state, loss)``. Semantics
    match the unsharded loop (``train/loops.py``): NLL over the training
    nodes, between-layer feature dropout and N2 mask dropout driven by
    per-shard rngs (``fold_in`` of the shard index — dropout *patterns*
    differ from the unsharded run, as any two rng partitions do; with
    ``dropout=False`` gradients match the unsharded step exactly, which
    is the tested gate). Params are replicated; ``shard_map``'s transpose
    psums their cotangents, so gradients are the exact global gradients.
    """
    import optax

    rng_spec = (P(),) if dropout else ()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), shard_spec(axis), P(axis), P(axis)) + rng_spec,
        out_specs=P(),
        check_rep=False,
    )
    def mean_nll(params, x_shards, sg, labels_shards, tmask_shards, *rng):
        x_local, sg_local, labels, tmask = jax.tree.map(
            lambda v: v[0], (x_shards, sg, labels_shards, tmask_shards)
        )
        local_rng = (
            jax.random.fold_in(rng[0], jax.lax.axis_index(axis))
            if dropout
            else None
        )
        logp = _mma_local_forward(
            model, params, x_local, sg_local, axis,
            rng=local_rng, training=True, use_pallas=use_pallas,
        )
        pick = jnp.take_along_axis(
            logp, labels.astype(jnp.int32)[:, None], axis=-1
        )[:, 0]
        lsum = jax.lax.psum(jnp.sum(jnp.where(tmask, pick, 0.0)), axis)
        lcnt = jax.lax.psum(jnp.sum(tmask.astype(jnp.float32)), axis)
        return -lsum / jnp.maximum(lcnt, 1.0)

    @jax.jit
    def step(params, opt_state, x_shards, sg, labels_shards, tmask_shards,
             rng=None):
        rng_args = (rng,) if dropout else ()
        loss, grads = jax.value_and_grad(
            lambda p: mean_nll(
                p, x_shards, sg, labels_shards, tmask_shards, *rng_args
            )
        )(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step
