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
import os
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


@dataclasses.dataclass
class SampledArrays:
    """Minimal host output of one sample (``sample_arrays``): just the
    dst-sorted padded endpoints + the id map — everything else (masks,
    degrees, CSR/CSC views) is derived on device by
    ``graph.device_build.finish_graph_on_device``, cutting the per-batch
    host→device traffic ~3×."""

    src: np.ndarray  # (E_pad,) int32, dst-sorted, padding at tail
    dst: np.ndarray  # (E_pad,) int32
    node_ids: np.ndarray  # (N_pad,) int32 global ids (pad/hole → -1)
    num_edges: int
    num_seeds: int
    num_nodes: int
    ell_hint: "tuple | None" = None
    # CSC permutation over the padded edge list (stable src-major,
    # dst-minor — the native counting sort), so the device never sorts
    # (VERDICT r4 #4: the device lexsort cost more than the transfer it
    # saved). +4 bytes/edge of link traffic; None when emit_csc=False.
    src_perm: "np.ndarray | None" = None


class NeighborSampler:
    """Samples layered neighborhoods from a host-resident graph."""

    def __init__(self, graph: Graph, fanouts: Sequence[int], seed: int = 0,
                 use_native: bool = True, n_threads: Optional[int] = None):
        self.fanouts = tuple(fanouts)
        self.rs = np.random.RandomState(seed)
        self.use_native = use_native
        self.n_threads = n_threads or (os.cpu_count() or 1)
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
                         seed: int = 0, use_native: bool = True,
                         n_threads: Optional[int] = None) -> "NeighborSampler":
        """Build directly from host edge arrays (unsorted OK) — skips the
        device :class:`Graph` round-trip; the native counting sort keeps
        construction O(E+N) at ogbn scale (120M+ edges)."""
        from mma_tpu.graph import native

        self = cls.__new__(cls)
        self.fanouts = tuple(fanouts)
        self.rs = np.random.RandomState(seed)
        self.use_native = use_native
        self.n_threads = n_threads or (os.cpu_count() or 1)
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

    def _structure_numpy(self, seeds):
        """(hop node-count list, global node ids in discovery order,
        local src/dst) — NumPy backend."""
        node_ids = seeds
        frontier = seeds
        hop_counts = [len(seeds)]
        all_src, all_dst = [], []
        for fanout in self.fanouts:
            if len(frontier) == 0:
                hop_counts.append(0)
                continue
            s, d = self._sample_neighbors(frontier, fanout)
            all_src.append(s)
            all_dst.append(d)
            cand = np.unique(s)
            new = cand[~np.isin(cand, node_ids, assume_unique=False)]
            node_ids = np.concatenate([node_ids, new])
            hop_counts.append(len(new))
            frontier = new

        src = np.concatenate(all_src) if all_src else np.zeros(0, np.int64)
        dst = np.concatenate(all_dst) if all_dst else np.zeros(0, np.int64)
        # Deduplicate edges sampled at multiple hops.
        if len(src):
            key = dst * (self.num_nodes + 1) + src
            _, uniq = np.unique(key, return_index=True)
            src, dst = src[uniq], dst[uniq]
        order = np.argsort(node_ids, kind="stable")
        src_l = order[np.searchsorted(node_ids[order], src)].astype(np.int32)
        dst_l = order[np.searchsorted(node_ids[order], dst)].astype(np.int32)
        return hop_counts, node_ids, src_l, dst_l

    def _structure(self, seeds, node_cap, edge_cap):
        """Dispatch to the C++ multithreaded sampler when available
        (``native/graphops.cpp::mma_sample_layered`` — deterministic per
        seed regardless of thread count), else the NumPy backend. Both
        return the same representation; only the RNG stream differs."""
        if self.use_native:
            from mma_tpu.graph import native

            res = native.sample_layered(
                self.row_ptr, self.src_sorted, seeds, self.fanouts,
                rng_seed=int(self.rs.randint(0, 2**62)),
                n_threads=self.n_threads,
                node_cap=node_cap, edge_cap=edge_cap,
            )
            if res is not None:
                nodes, hop_counts, src_l, dst_l = res
                return (
                    [int(c) for c in hop_counts],
                    nodes.astype(np.int64),
                    src_l, dst_l,
                )
        return self._structure_numpy(seeds)

    def sample(
        self,
        seeds: np.ndarray,
        *,
        n_node_pad: Optional[int] = None,
        n_edge_pad: Optional[int] = None,
        hop_node_pads: Optional[Sequence[int]] = None,
    ) -> SampledBatch:
        """Sample one layered subgraph.

        ``hop_node_pads``: optional per-hop node budgets
        ``(seeds, new₁, …, new_L)`` (length ``len(fanouts)+1``). When
        given, each hop's nodes occupy a FIXED row range padded to its
        budget, and the graph carries the static ELL degree-bucket layout
        ``ell_hint = ((range_end_h, fanouts[h]), …)`` — hop ``h``'s nodes
        have at most ``fanouts[h]`` sampled in-edges (each node joins
        exactly one frontier), so the scatter-free dense-neighbor paths
        (``mma_tpu.ops.ell``) apply with ~no slot inflation. Rows between
        a hop's actual node count and its budget are masked holes.
        """
        seeds = np.asarray(seeds, np.int64)
        node_cap = (sum(hop_node_pads) if hop_node_pads is not None
                    else (n_node_pad or self._structural_node_bound(len(seeds))))
        edge_cap = n_edge_pad or self._structural_edge_bound(len(seeds))
        hop_counts, node_ids, src_l, dst_l = self._structure(
            seeds, node_cap, edge_cap
        )

        if hop_node_pads is not None:
            return self._layout_hopped(
                seeds, hop_counts, node_ids, src_l, dst_l,
                tuple(hop_node_pads), n_node_pad, n_edge_pad,
            )

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

    def sample_arrays(
        self,
        seeds: np.ndarray,
        *,
        n_node_pad: int,
        n_edge_pad: int,
        hop_node_pads: Optional[Sequence[int]] = None,
        emit_csc: bool = True,
    ) -> SampledArrays:
        """Sample one subgraph, returning only the minimal host arrays
        (see :class:`SampledArrays`); pair with
        ``graph.device_build.finish_graph_on_device`` + a device-resident
        ``true_deg`` table. Layout semantics match :meth:`sample`.
        ``emit_csc``: also emit the CSC permutation (one more host
        counting sort, O(E+N)) so the device derives the CSC view with
        two gathers instead of a sort."""
        from mma_tpu.graph import native as gnative

        seeds = np.asarray(seeds, np.int64)
        hop_counts, node_ids, src_l, dst_l = self._structure(
            seeds,
            (sum(hop_node_pads) if hop_node_pads is not None else n_node_pad),
            n_edge_pad,
        )
        ell_hint = None
        if hop_node_pads is not None:
            pads = tuple(hop_node_pads)
            if len(pads) != len(self.fanouts) + 1:
                raise ValueError(
                    f"hop_node_pads needs {len(self.fanouts) + 1} entries"
                )
            for h, c in enumerate(hop_counts):
                if c > pads[h]:
                    raise ValueError(
                        f"hop {h}: {c} nodes > budget {pads[h]}"
                    )
            offs = np.concatenate([[0], np.cumsum(pads)]).astype(np.int64)
            loc = np.concatenate(
                [offs[h] + np.arange(c, dtype=np.int64)
                 for h, c in enumerate(hop_counts)]
            )
            src_l = loc[src_l].astype(np.int32)
            dst_l = loc[dst_l].astype(np.int32)
            total = int(offs[-1])
            ell_hint = tuple(
                (int(offs[h + 1]), int(self.fanouts[h]))
                for h in range(len(self.fanouts))
            )
            if n_node_pad <= total:
                raise ValueError(f"n_node_pad={n_node_pad} <= {total}")
            ids_pad = np.full(n_node_pad, -1, np.int32)
            ids_pad[loc] = node_ids
        else:
            if n_node_pad <= len(node_ids):
                raise ValueError(
                    f"n_node_pad={n_node_pad} <= {len(node_ids)} nodes"
                )
            ids_pad = np.full(n_node_pad, -1, np.int32)
            ids_pad[: len(node_ids)] = node_ids
        if n_edge_pad < len(src_l):
            raise ValueError(f"n_edge_pad={n_edge_pad} < {len(src_l)} edges")

        src_s, dst_s, _ = gnative.sort_edges(
            src_l.astype(np.int32), dst_l.astype(np.int32), n_node_pad
        )
        pad_e = n_edge_pad - len(src_s)
        pad_node = n_node_pad - 1
        src_p = np.concatenate(
            [src_s, np.full(pad_e, pad_node, np.int32)]
        )
        dst_p = np.concatenate(
            [dst_s, np.full(pad_e, pad_node, np.int32)]
        )
        src_perm = None
        if emit_csc:
            # Stable counting sort by src over the PADDED list (padding
            # edges point at the last node and sort to the tail).
            _, _, src_perm = gnative.sort_edges(dst_p, src_p, n_node_pad)
        return SampledArrays(
            src=src_p,
            dst=dst_p,
            node_ids=ids_pad,
            num_edges=len(src_s),
            num_seeds=len(seeds),
            num_nodes=len(node_ids),
            ell_hint=ell_hint,
            src_perm=src_perm,
        )

    def _structural_node_bound(self, n_seeds: int) -> int:
        b, f = n_seeds, n_seeds
        for fo in self.fanouts:
            f *= fo
            b += f
        return b + 1

    def _structural_edge_bound(self, n_seeds: int) -> int:
        b, f = 0, n_seeds
        for fo in self.fanouts:
            f *= fo
            b += f
        return max(b, 1)

    def _layout_hopped(self, seeds, hop_counts, node_ids, src_l, dst_l,
                       pads, n_node_pad, n_edge_pad) -> SampledBatch:
        """Per-hop padded row layout + ELL bucket hint (see ``sample``)."""
        if len(pads) != len(self.fanouts) + 1:
            raise ValueError(
                f"hop_node_pads needs {len(self.fanouts) + 1} entries "
                f"(seeds + one per fanout), got {len(pads)}"
            )
        for h, c in enumerate(hop_counts):
            if c > pads[h]:
                raise ValueError(
                    f"hop {h}: {c} nodes > budget {pads[h]} — "
                    "recalibrate hop_node_pads"
                )
        offs = np.concatenate([[0], np.cumsum(pads)]).astype(np.int64)
        total = int(offs[-1])
        # Compact discovery row → padded row.
        loc_of_compact = np.concatenate(
            [offs[h] + np.arange(c, dtype=np.int64)
             for h, c in enumerate(hop_counts)]
        )
        src_p = loc_of_compact[src_l].astype(np.int32)
        dst_p = loc_of_compact[dst_l].astype(np.int32)

        g = graph_from_edges(
            src_p, dst_p, total,
            n_node_pad=n_node_pad, n_edge_pad=n_edge_pad,
        )
        node_mask = np.zeros(g.n_node, bool)
        node_mask[loc_of_compact] = True
        deg = np.zeros(g.n_node, np.float32)
        deg[loc_of_compact] = self.true_deg[node_ids]
        # Expanded hops 0..L-1 are ELL buckets (width = their fanout);
        # the last hop's nodes are leaves with no in-edges — no bucket.
        ell_hint = tuple(
            (int(offs[h + 1]), int(self.fanouts[h]))
            for h in range(len(self.fanouts))
        )
        g = dataclasses.replace(
            g,
            node_mask=jnp.asarray(node_mask),
            deg=jnp.asarray(deg),
            ell_hint=ell_hint,
        )
        ids_pad = np.full(g.n_node, -1, np.int64)
        ids_pad[loc_of_compact] = node_ids
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
