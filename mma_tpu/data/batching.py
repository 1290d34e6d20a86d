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
) -> BatchedGraphs:
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
