"""Disjoint-union batching of small graphs with static padding.

The TPU-native replacement for PyG's ``DataLoader`` collate
(``graph_regression/mma.py:52-54``): node arrays are concatenated with
per-graph index offsets, edge lists stay dst-sorted (each graph is sorted
and node offsets are increasing), and everything is padded to fixed
``(n_graph, n_node, n_edge)`` so every batch compiles to the same program.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from mma_tpu.graph.build import chunk_hint_from_row_ptr
from mma_tpu.graph.container import BatchedGraphs, Graph


def batch_graphs(
    num_nodes: Sequence[int],
    srcs: Sequence[np.ndarray],
    dsts: Sequence[np.ndarray],
    *,
    n_graph: int,
    n_node: int,
    n_edge: int,
    node_feats: Optional[Sequence[np.ndarray]] = None,
    edge_feats: Optional[Sequence[np.ndarray]] = None,
    targets: Optional[Sequence[np.ndarray]] = None,
    ell_degree_budgets: Optional[Sequence[int]] = None,
) -> BatchedGraphs:
    """Collate ``len(num_nodes)`` graphs into one padded disjoint union.

    ``ell_degree_budgets``: opt into the degree-EXACT ELL layout —
    ``budgets[d-1]`` is the static row budget for nodes of in-degree
    ``d`` (d = 1..W). Nodes are grouped by exact in-degree, each bucket
    is padded to its budget with synthetic rows carrying exactly ``d``
    self-loop padding edges, so the flat ELL slot index EQUALS the
    dst-sorted edge index (expand/collapse become reshapes —
    ``Graph.ell_exact``). The budgets must be static across batches of a
    stream (one compiled program); size them with
    :func:`degree_budgets`.
    """
    if ell_degree_budgets is not None:
        return _batch_graphs_degree_exact(
            num_nodes, srcs, dsts, n_graph=n_graph, n_node=n_node,
            n_edge=n_edge, budgets=tuple(int(b) for b in ell_degree_budgets),
            node_feats=node_feats, edge_feats=edge_feats, targets=targets,
        )
    g = len(num_nodes)
    if g > n_graph - 0:
        raise ValueError(f"{g} graphs > n_graph={n_graph}")
    tot_nodes = int(sum(num_nodes))
    tot_edges = int(sum(len(s) for s in srcs))
    if tot_nodes >= n_node:
        raise ValueError(f"{tot_nodes} nodes ≥ n_node={n_node} (need ≥1 padding node)")
    if tot_edges > n_edge:
        raise ValueError(f"{tot_edges} edges > n_edge={n_edge}")

    src = np.full(n_edge, n_node - 1, np.int32)
    dst = np.full(n_edge, n_node - 1, np.int32)
    node_to_graph = np.full(n_node, n_graph - 1, np.int32)
    offs_n = 0
    offs_e = 0
    for gi, nn in enumerate(num_nodes):
        s, d = np.asarray(srcs[gi], np.int32), np.asarray(dsts[gi], np.int32)
        order = np.lexsort((s, d))
        src[offs_e : offs_e + len(s)] = s[order] + offs_n
        dst[offs_e : offs_e + len(s)] = d[order] + offs_n
        node_to_graph[offs_n : offs_n + nn] = gi
        offs_n += nn
        offs_e += len(s)

    edge_mask = np.zeros(n_edge, bool)
    edge_mask[:tot_edges] = True
    node_mask = np.zeros(n_node, bool)
    node_mask[:tot_nodes] = True
    graph_mask = np.zeros(n_graph, bool)
    graph_mask[:g] = True

    from mma_tpu.graph import native

    deg = np.bincount(dst[:tot_edges], minlength=n_node).astype(np.float32)
    row_ptr = native.build_row_ptr(dst, n_node)
    _, src_sorted, src_perm = native.sort_edges(dst, src, n_node)
    col_ptr = native.build_row_ptr(src_sorted, n_node)

    graph = Graph(
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(edge_mask),
        node_mask=jnp.asarray(node_mask),
        deg=jnp.asarray(deg),
        row_ptr=jnp.asarray(row_ptr),
        src_perm=jnp.asarray(src_perm),
        col_ptr=jnp.asarray(col_ptr),
        src_csc=jnp.asarray(src_sorted),
        dst_csc=jnp.asarray(dst[src_perm]),
        chunk_hint=chunk_hint_from_row_ptr(row_ptr, n_node),
    )

    def pack(parts: Sequence[np.ndarray], total: int, pad_to: int):
        cat = np.concatenate([np.asarray(p) for p in parts], axis=0)
        out = np.zeros((pad_to,) + cat.shape[1:], cat.dtype)
        out[:total] = cat
        return jnp.asarray(out)

    node_feat = pack(node_feats, tot_nodes, n_node) if node_feats is not None else None
    # Edge features must be packed in the same dst-sorted order as src/dst.
    edge_feat = None
    if edge_feats is not None:
        sorted_feats: List[np.ndarray] = []
        for gi in range(g):
            s, d = np.asarray(srcs[gi], np.int32), np.asarray(dsts[gi], np.int32)
            order = np.lexsort((s, d))
            sorted_feats.append(np.asarray(edge_feats[gi])[order])
        edge_feat = pack(sorted_feats, tot_edges, n_edge)
    target = pack(targets, g, n_graph) if targets is not None else None

    return BatchedGraphs(
        graph=graph,
        node_to_graph=jnp.asarray(node_to_graph),
        graph_mask=jnp.asarray(graph_mask),
        node_feat=node_feat,
        edge_feat=edge_feat,
        target=target,
    )


def degree_budgets(
    num_nodes: Sequence[int],
    srcs: Sequence[np.ndarray],
    dsts: Sequence[np.ndarray],
    batch_size: int,
    *,
    margin: float = 0.08,
    round_to: int = 8,
    worst_case: bool = False,
    include_zero: bool = False,
):
    """Static per-degree row budgets for :func:`batch_graphs`'s
    degree-exact layout (index ``d-1`` holds degree ``d``).

    Default ("observed") mode: the worst per-batch count of degree-``d``
    nodes over a sequential pass, bumped by ``margin`` (shuffled epochs
    redraw batch compositions) and rounded up to ``round_to`` rows.

    ``worst_case=True``: a GUARANTEED bound — the sum of the
    ``batch_size`` largest per-graph degree-``d`` counts (any batch of ≤
    batch_size graphs fits, under any shuffle; no margin needed). Use
    for training streams where a budget overflow would abort an epoch.

    ``include_zero=True``: returns ``(budgets, zero_degree_worst)`` —
    the matching bound on degree-0 node rows, for sizing ``n_node``
    (``sum(budgets) + zero_worst + 1`` rows are needed).
    """
    per_graph = []
    w = 1
    for nn, d in zip(num_nodes, dsts):
        deg = np.bincount(np.asarray(d, np.int64), minlength=int(nn))
        w = max(w, int(deg.max(initial=0)))
        per_graph.append(np.bincount(deg.astype(np.int64)))
    counts = np.zeros((len(per_graph), w + 1), np.int64)
    for i, c in enumerate(per_graph):
        counts[i, : len(c)] = c
    if worst_case:
        top = -np.sort(-counts, axis=0)[:batch_size]
        worst_all = top.sum(axis=0)
        worst, zero_worst = worst_all[1:], int(worst_all[0])
        margin = 0.0
    else:
        worst = np.zeros(w, np.int64)
        zero_worst = 0
        for lo in range(0, len(per_graph), batch_size):
            tot = counts[lo : lo + batch_size].sum(axis=0)
            worst = np.maximum(worst, tot[1:])
            zero_worst = max(zero_worst, int(tot[0]))
    pad = np.ceil(worst * (1.0 + margin) / round_to).astype(np.int64) * round_to
    budgets = tuple(int(max(b, round_to)) for b in pad)
    if include_zero:
        return budgets, zero_worst
    return budgets


def _batch_graphs_degree_exact(
    num_nodes, srcs, dsts, *, n_graph, n_node, n_edge, budgets,
    node_feats, edge_feats, targets,
) -> BatchedGraphs:
    """Degree-exact ELL collate (see :func:`batch_graphs`).

    Layout: bucket ``d`` (d = 1..W) owns rows
    ``[off_d, off_d + budgets[d-1])`` — real degree-``d`` nodes first,
    then synthetic bucket-padding rows each carrying exactly ``d``
    masked self-loop edges; after the buckets come the real degree-0
    nodes, then global padding rows. Every bucket row has exactly ``d``
    edges, so edge ``k`` IS flat slot ``k`` (``Graph.ell_exact``).
    ``chunk_hint`` stays ``None``: the layout breaks the
    padding-edges-point-at-the-last-node invariant the fused CSR
    kernels' routing assumes, and the exact ELL path replaces them.
    """
    g = len(num_nodes)
    if g > n_graph:
        raise ValueError(f"{g} graphs > n_graph={n_graph}")
    tot_nodes = int(sum(num_nodes))
    tot_edges = int(sum(len(s) for s in srcs))
    w_max = len(budgets)

    # Concatenate real edges / features with per-graph node offsets.
    offs = np.concatenate([[0], np.cumsum(num_nodes)]).astype(np.int64)
    src_r = np.concatenate(
        [np.asarray(s, np.int64) + offs[i] for i, s in enumerate(srcs)]
    ) if tot_edges else np.zeros(0, np.int64)
    dst_r = np.concatenate(
        [np.asarray(d, np.int64) + offs[i] for i, d in enumerate(dsts)]
    ) if tot_edges else np.zeros(0, np.int64)
    graph_of_node = np.repeat(np.arange(g, dtype=np.int32), num_nodes)

    deg = np.bincount(dst_r, minlength=tot_nodes)
    counts = np.bincount(deg, minlength=w_max + 1)
    if deg.max(initial=0) > w_max:
        raise ValueError(
            f"in-degree {int(deg.max())} > len(ell_degree_budgets)={w_max}"
        )
    for d in range(1, w_max + 1):
        if counts[d] > budgets[d - 1]:
            raise ValueError(
                f"{int(counts[d])} degree-{d} nodes > budget {budgets[d - 1]}"
            )
    slot_total = sum(budgets[d - 1] * d for d in range(1, w_max + 1))
    n_zero = int(counts[0])
    rows_used = sum(budgets) + n_zero
    if rows_used >= n_node:
        raise ValueError(
            f"degree buckets + zero-degree rows = {rows_used} ≥ "
            f"n_node={n_node} (need ≥1 global padding row)"
        )
    if slot_total > n_edge:
        raise ValueError(f"slot total {slot_total} > n_edge={n_edge}")

    # New node index per old node: bucket rows, then degree-0 rows.
    bucket_off = np.concatenate([[0], np.cumsum(budgets)]).astype(np.int64)
    new_of_old = np.empty(tot_nodes, np.int64)
    for d in range(1, w_max + 1):
        nodes_d = np.flatnonzero(deg == d)
        new_of_old[nodes_d] = bucket_off[d - 1] + np.arange(len(nodes_d))
    zeros_ = np.flatnonzero(deg == 0)
    new_of_old[zeros_] = bucket_off[w_max] + np.arange(n_zero)

    node_mask = np.zeros(n_node, bool)
    node_mask[new_of_old] = True
    node_to_graph = np.full(n_node, n_graph - 1, np.int32)
    node_to_graph[new_of_old] = graph_of_node
    deg_new = np.zeros(n_node, np.float32)
    deg_new[new_of_old] = deg

    # Synthetic self-loop edges: d per bucket-padding row, then the
    # global tail pointing at the last padding row.
    syn = []
    for d in range(1, w_max + 1):
        pad_rows = np.arange(
            bucket_off[d - 1] + counts[d], bucket_off[d], dtype=np.int64
        )
        syn.append(np.repeat(pad_rows, d))
    tail = np.full(n_edge - slot_total, n_node - 1, np.int64)
    all_src = np.concatenate([new_of_old[src_r]] + syn + [tail])
    all_dst = np.concatenate([new_of_old[dst_r]] + syn + [tail])
    emask = np.zeros(n_edge, bool)
    emask[:tot_edges] = True

    order = np.lexsort((all_src, all_dst))
    src = all_src[order].astype(np.int32)
    dst = all_dst[order].astype(np.int32)
    edge_mask = emask[order]

    from mma_tpu.graph import native

    row_ptr = native.build_row_ptr(dst, n_node)
    _, src_sorted, src_perm = native.sort_edges(dst, src, n_node)
    col_ptr = native.build_row_ptr(src_sorted, n_node)
    ell_hint = tuple(
        (int(bucket_off[d]), d)
        for d in range(1, w_max + 1) if budgets[d - 1] > 0
    )
    # Symmetric input (in-degree == out-degree per real node): the CSC
    # view is degree-exact under the same buckets (self-loop padding
    # edges keep pad rows symmetric too) — src-keyed segment sums can
    # skip the kernel (Graph.csc_ell_exact).
    out_deg = np.bincount(src_r, minlength=tot_nodes)
    csc_exact = bool(np.array_equal(out_deg, deg))

    graph = Graph(
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(edge_mask),
        node_mask=jnp.asarray(node_mask),
        deg=jnp.asarray(deg_new),
        row_ptr=jnp.asarray(row_ptr),
        src_perm=jnp.asarray(src_perm),
        col_ptr=jnp.asarray(col_ptr),
        src_csc=jnp.asarray(src_sorted),
        dst_csc=jnp.asarray(dst[src_perm]),
        chunk_hint=None,
        ell_hint=ell_hint,
        ell_exact=True,
        csc_ell_exact=csc_exact,
    )

    node_feat = None
    if node_feats is not None:
        cat = np.concatenate([np.asarray(p) for p in node_feats], axis=0)
        out = np.zeros((n_node,) + cat.shape[1:], cat.dtype)
        out[new_of_old] = cat
        node_feat = jnp.asarray(out)
    edge_feat = None
    if edge_feats is not None:
        cat = np.concatenate([np.asarray(p) for p in edge_feats], axis=0)
        out = np.zeros((n_edge,) + cat.shape[1:], cat.dtype)
        out[:tot_edges] = cat
        edge_feat = jnp.asarray(out[order])
    target = None
    if targets is not None:
        cat = np.concatenate([np.asarray(t) for t in targets], axis=0)
        out = np.zeros((n_graph,) + cat.shape[1:], cat.dtype)
        out[:g] = cat
        target = jnp.asarray(out)

    graph_mask = np.zeros(n_graph, bool)
    graph_mask[:g] = True
    return BatchedGraphs(
        graph=graph,
        node_to_graph=jnp.asarray(node_to_graph),
        graph_mask=jnp.asarray(graph_mask),
        node_feat=node_feat,
        edge_feat=edge_feat,
        target=target,
        nodes_grouped=False,
    )
