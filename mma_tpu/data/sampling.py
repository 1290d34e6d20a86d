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

    def _sample_neighbors(self, nodes: np.ndarray, fanout: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
        srcs, dsts = [], []
        for v in nodes:
            lo, hi = self.row_ptr[v], self.row_ptr[v + 1]
            deg = hi - lo
            if deg == 0:
                continue
            if deg <= fanout:
                nbrs = self.src_sorted[lo:hi]
            else:
                sel = self.rs.choice(deg, size=fanout, replace=False)
                nbrs = self.src_sorted[lo + sel]
            srcs.append(nbrs)
            dsts.append(np.full(len(nbrs), v, np.int64))
        if not srcs:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return np.concatenate(srcs), np.concatenate(dsts)

    def sample(
        self,
        seeds: np.ndarray,
        *,
        n_node_pad: Optional[int] = None,
        n_edge_pad: Optional[int] = None,
    ) -> SampledBatch:
        seeds = np.asarray(seeds, np.int64)
        visited = list(seeds)
        seen = set(seeds.tolist())
        frontier = seeds
        all_src, all_dst = [], []
        for fanout in self.fanouts:
            s, d = self._sample_neighbors(frontier, fanout)
            all_src.append(s)
            all_dst.append(d)
            new = [v for v in np.unique(s) if v not in seen]
            seen.update(new)
            visited.extend(new)
            frontier = np.asarray(new, np.int64)
            if len(frontier) == 0:
                break

        node_ids = np.asarray(visited, np.int64)
        remap = {int(v): i for i, v in enumerate(node_ids)}
        src = np.concatenate(all_src) if all_src else np.zeros(0, np.int64)
        dst = np.concatenate(all_dst) if all_dst else np.zeros(0, np.int64)
        # Deduplicate edges sampled at multiple hops.
        if len(src):
            key = dst * (self.num_nodes + 1) + src
            _, uniq = np.unique(key, return_index=True)
            src, dst = src[uniq], dst[uniq]
        src_l = np.asarray([remap[int(v)] for v in src], np.int32)
        dst_l = np.asarray([remap[int(v)] for v in dst], np.int32)

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
