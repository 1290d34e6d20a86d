"""Neighbor sampling for graphs that exceed a chip/host (SURVEY §5.7,
BASELINE.json config[4] "ogbn-products-scale … with neighbor sampling").

GraphSAGE-style layered sampling, host-side (NumPy over the CSR arrays),
producing statically-shaped :class:`Graph` mini-batches:

- seeds are the loss nodes (always the first ``len(seeds)`` rows of the
  subgraph, so callers index outputs/labels with ``[:num_seeds]``);
- hop ``k`` samples up to ``fanouts[k]`` in-neighbors (uniform, without
  replacement) for every node reached so far, adding the sampled
  ``neighbor → node`` edges;
- the union subgraph is padded to fixed ``(n_node, n_edge)`` budgets so
  every batch compiles once.

Degree semantics: the subgraph carries each node's **true** in-degree
(not the sampled count), so mean-family combines divide by the full-graph
degree — with full fanout the seeds' L-layer outputs are exactly the
full-graph outputs (verified in tests); with partial fanout this is the
standard unbiased-mean estimator.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from mma_tpu.graph.build import graph_from_edges
from mma_tpu.graph.container import Graph


@dataclasses.dataclass
class SampledBatch:
    graph: Graph
    node_ids: np.ndarray  # (n_node,) original ids (pad → -1)
    num_seeds: int
    num_nodes: int


class NeighborSampler:
    """Samples layered neighborhoods from a host-resident graph."""

    def __init__(self, graph: Graph, fanouts: Sequence[int], seed: int = 0):
        self.fanouts = tuple(fanouts)
        self.rs = np.random.RandomState(seed)
        # Host copies of the CSR structure (real edges only).
        e_mask = np.asarray(graph.edge_mask)
        self.src = np.asarray(graph.src)[e_mask]
        self.dst = np.asarray(graph.dst)[e_mask]
        self.num_nodes = int(np.asarray(graph.node_mask).sum())
        counts = np.bincount(self.dst, minlength=self.num_nodes)
        self.row_ptr = np.zeros(self.num_nodes + 1, np.int64)
        np.cumsum(counts, out=self.row_ptr[1:])
        order = np.argsort(self.dst, kind="stable")
        self.src_sorted = self.src[order]
        self.true_deg = counts.astype(np.float32)

    @classmethod
    def from_host_arrays(cls, src: np.ndarray, dst: np.ndarray,
                         num_nodes: int, fanouts: Sequence[int],
                         seed: int = 0) -> "NeighborSampler":
        """Build directly from host edge arrays (unsorted OK) — skips the
        device :class:`Graph` round-trip; the native counting sort keeps
        construction O(E+N) at ogbn scale (120M+ edges)."""
        from mma_tpu.graph import native

        self = cls.__new__(cls)
        self.fanouts = tuple(fanouts)
        self.rs = np.random.RandomState(seed)
        src_s, dst_s, _ = native.sort_edges(src, dst, num_nodes)
        self.src = src_s
        self.dst = dst_s
        self.num_nodes = int(num_nodes)
        self.row_ptr = native.build_row_ptr(dst_s, num_nodes).astype(np.int64)
        self.src_sorted = src_s
        counts = np.diff(self.row_ptr)
        self.true_deg = counts.astype(np.float32)
        return self

    @staticmethod
    def _concat_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Vectorized ``concat([arange(s, s+l) for s, l in zip(...)])``."""
        total = int(lengths.sum())
        if total == 0:
            return np.zeros(0, np.int64)
        step = np.ones(total, np.int64)
        step[0] = starts[0]
        offs = np.cumsum(lengths)[:-1]
        step[offs] = starts[1:] - (starts[:-1] + lengths[:-1]) + 1
        return np.cumsum(step)

    def _sample_neighbors(self, nodes: np.ndarray, fanout: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Up to ``fanout`` uniform in-neighbors per node, no replacement.

        Fully vectorized (no per-node Python — this must keep up with
        ogbn-scale frontiers): nodes with deg ≤ fanout take every edge
        (a concat of CSR ranges); larger nodes draw a random key per edge
        and keep each node's ``fanout`` smallest keys (a per-segment
        random top-k via one argsort)."""
        nodes = np.asarray(nodes, np.int64)
        lo = self.row_ptr[nodes]
        deg = self.row_ptr[nodes + 1] - lo
        small = deg <= fanout

        idx_parts, dst_parts = [], []
        ns, ds_, ls = nodes[small], lo[small], deg[small]
        nz = ls > 0
        if nz.any():
            idx_parts.append(self._concat_ranges(ds_[nz], ls[nz]))
            dst_parts.append(np.repeat(ns[nz], ls[nz]))

        nb, lb, db = nodes[~small], lo[~small], deg[~small]
        if len(nb):
            edge_pos = self._concat_ranges(lb, db)  # all edges of big nodes
            owner = np.repeat(np.arange(len(nb)), db)
            # random order within each owner's contiguous block
            key = owner.astype(np.float64) + self.rs.rand(len(edge_pos)) * 0.5
            order = np.argsort(key, kind="stable")
            starts = np.concatenate([[0], np.cumsum(db)[:-1]])
            sel = np.repeat(starts, fanout) + np.tile(
                np.arange(fanout, dtype=np.int64), len(nb)
            )
            idx_parts.append(edge_pos[order][sel])
            dst_parts.append(np.repeat(nb, fanout))

        if not idx_parts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        idx = np.concatenate(idx_parts)
        return self.src_sorted[idx].astype(np.int64), np.concatenate(dst_parts)

    def sample(
        self,
        seeds: np.ndarray,
        *,
        n_node_pad: Optional[int] = None,
        n_edge_pad: Optional[int] = None,
    ) -> SampledBatch:
        seeds = np.asarray(seeds, np.int64)
        node_ids = seeds
        frontier = seeds
        all_src, all_dst = [], []
        for fanout in self.fanouts:
            s, d = self._sample_neighbors(frontier, fanout)
            all_src.append(s)
            all_dst.append(d)
            cand = np.unique(s)
            new = cand[~np.isin(cand, node_ids, assume_unique=False)]
            node_ids = np.concatenate([node_ids, new])
            frontier = new
            if len(frontier) == 0:
                break

        src = np.concatenate(all_src) if all_src else np.zeros(0, np.int64)
        dst = np.concatenate(all_dst) if all_dst else np.zeros(0, np.int64)
        # Deduplicate edges sampled at multiple hops.
        if len(src):
            key = dst * (self.num_nodes + 1) + src
            _, uniq = np.unique(key, return_index=True)
            src, dst = src[uniq], dst[uniq]
        # global id → subgraph row (vectorized: node_ids is unique).
        order = np.argsort(node_ids, kind="stable")
        src_l = order[np.searchsorted(node_ids[order], src)].astype(np.int32)
        dst_l = order[np.searchsorted(node_ids[order], dst)].astype(np.int32)

        g = graph_from_edges(
            src_l, dst_l, len(node_ids),
            n_node_pad=n_node_pad, n_edge_pad=n_edge_pad,
        )
        # Overwrite sampled in-degrees with full-graph degrees (see
        # module docstring).
        deg = np.zeros(g.n_node, np.float32)
        deg[: len(node_ids)] = self.true_deg[node_ids]
        g = dataclasses.replace(g, deg=jnp.asarray(deg))

        ids_pad = np.full(g.n_node, -1, np.int64)
        ids_pad[: len(node_ids)] = node_ids
        return SampledBatch(
            graph=g,
            node_ids=ids_pad,
            num_seeds=len(seeds),
            num_nodes=len(node_ids),
        )

    def batches(
        self,
        seed_nodes: np.ndarray,
        batch_size: int,
        *,
        n_node_pad: int,
        n_edge_pad: int,
        shuffle: bool = True,
    ) -> Iterator[SampledBatch]:
        order = np.asarray(seed_nodes).copy()
        if shuffle:
            self.rs.shuffle(order)
        for lo in range(0, len(order), batch_size):
            yield self.sample(
                order[lo : lo + batch_size],
                n_node_pad=n_node_pad,
                n_edge_pad=n_edge_pad,
            )
