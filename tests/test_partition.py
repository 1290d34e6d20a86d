"""Round-4 host-side machinery: the native multithreaded sampler
(``native/graphops.cpp::mma_sample_layered``) and the locality-aware LDG
partition (``mma_partition_ldg``) + ordered node-sharded build."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.data.sampling import NeighborSampler
from mma_tpu.graph import native
from mma_tpu.graph.build import graph_from_edges


def _random_graph(n=8000, m=30000, seed=0):
    rs = np.random.RandomState(seed)
    a = rs.randint(0, n, m).astype(np.int32)
    b = rs.randint(0, n, m).astype(np.int32)
    keep = a != b
    src = np.concatenate([a[keep], b[keep]])
    dst = np.concatenate([b[keep], a[keep]])
    return src, dst, rs


needs_native = pytest.mark.skipif(
    not native.available(), reason="native graphops library unavailable"
)


class TestNativeSampler:
    @needs_native
    def test_deterministic_and_counts(self):
        src, dst, rs = _random_graph()
        seeds = rs.choice(8000, 128, replace=False)
        mk = lambda: NeighborSampler.from_host_arrays(
            src, dst, 8000, (5, 5), seed=3, use_native=True
        )
        b1 = mk().sample(seeds, n_node_pad=16384, n_edge_pad=16384)
        b2 = mk().sample(seeds, n_node_pad=16384, n_edge_pad=16384)
        assert b1.num_nodes == b2.num_nodes
        np.testing.assert_array_equal(
            np.asarray(b1.graph.src), np.asarray(b2.graph.src)
        )
        # every node's sampled in-degree respects the fanouts
        rp = np.asarray(b1.graph.row_ptr)
        run = np.diff(rp)[: b1.num_nodes]
        assert run.max(initial=0) <= 5

    @needs_native
    def test_full_fanout_matches_numpy_edge_set(self):
        # fanout ≥ max degree ⇒ both backends take every edge: identical
        # edge sets regardless of RNG.
        src, dst, rs = _random_graph(n=3000, m=6000, seed=1)
        deg = np.bincount(dst, minlength=3000)
        assert deg.max() <= 64
        seeds = rs.choice(3000, 48, replace=False)

        def canon(bt):
            ids = bt.node_ids
            s_ = np.asarray(bt.graph.src)
            d_ = np.asarray(bt.graph.dst)
            m_ = np.asarray(bt.graph.edge_mask)
            return set(zip(ids[s_[m_]], ids[d_[m_]]))

        kw = dict(n_node_pad=8192, n_edge_pad=16384)
        bN = NeighborSampler.from_host_arrays(
            src, dst, 3000, (64, 64), seed=1, use_native=True
        ).sample(seeds, **kw)
        bP = NeighborSampler.from_host_arrays(
            src, dst, 3000, (64, 64), seed=1, use_native=False
        ).sample(seeds, **kw)
        assert canon(bN) == canon(bP)
        assert (set(bN.node_ids[bN.node_ids >= 0])
                == set(bP.node_ids[bP.node_ids >= 0]))

    @needs_native
    def test_hopped_layout_from_native(self):
        src, dst, rs = _random_graph(n=3000, m=9000, seed=2)
        seeds = rs.choice(3000, 32, replace=False)
        bt = NeighborSampler.from_host_arrays(
            src, dst, 3000, (4, 3), seed=2, use_native=True
        ).sample(seeds, hop_node_pads=(32, 160, 512))
        assert bt.graph.ell_hint == ((32, 4), (192, 3))
        rp = np.asarray(bt.graph.row_ptr)
        run = np.diff(rp)
        bounds = [0] + [b for b, _ in bt.graph.ell_hint]
        for (s, e), (_, w) in zip(
            zip(bounds[:-1], bounds[1:]), bt.graph.ell_hint
        ):
            assert run[s:e].max(initial=0) <= w
        assert run[bounds[-1]:-1].max(initial=0) == 0


def _locality_graph(n=4096, avg_deg=12, seed=0):
    """Ring-local edges with scrambled labels: contiguous cuts on the
    label order see ~random boundary; LDG should recover the ring."""
    rs = np.random.RandomState(seed)
    m = n * avg_deg // 2
    a = rs.randint(0, n, m)
    off = np.maximum(1, (rs.pareto(1.5, m) * 3).astype(np.int64))
    b = (a + np.where(rs.rand(m) < 0.5, off, -off)) % n
    keep = a != b
    a, b = a[keep], b[keep]
    perm = rs.permutation(n)
    a, b = perm[a], perm[b]
    src = np.concatenate([a, b]).astype(np.int32)
    dst = np.concatenate([b, a]).astype(np.int32)
    return graph_from_edges(src, dst, n)


class TestLdgPartition:
    @needs_native
    def test_boundary_reduction_and_balance(self):
        from mma_tpu.parallel.node_sharded import build_node_sharded_ordered

        g = _locality_graph()
        for s in (4, 8):
            sg_c, _, _ = build_node_sharded_ordered(g, s, "contiguous")
            sg_l, _, order = build_node_sharded_ordered(g, s, "ldg")
            bf = lambda sg: (np.asarray(sg.bnd_mask).sum()
                             / np.asarray(sg.edge_mask).sum())
            assert bf(sg_l) < bf(sg_c) / 2, (s, bf(sg_l), bf(sg_c))
            e_tot = np.asarray(sg_l.edge_mask).sum(1)
            assert e_tot.max() <= 1.15 * e_tot.mean()
            # order is a permutation of the real nodes
            n_real = int(np.asarray(g.node_mask).sum())
            assert np.array_equal(np.sort(order), np.arange(n_real))

    @needs_native
    def test_ordered_forward_matches_unsharded(self):
        from mma_tpu.models import NodeClassifier
        from mma_tpu.parallel import make_mesh
        from mma_tpu.parallel.node_sharded import (
            build_node_sharded_ordered,
            make_node_sharded_forward,
            place_on_mesh,
            shard_node_values,
        )

        rs = np.random.RandomState(0)
        n = 96
        a = (rs.rand(n, n) < 0.12).astype(np.float32)
        a = np.triu(a, 1)
        a = a + a.T
        dst, src = np.nonzero(a)
        g = graph_from_edges(src.astype(np.int32), dst.astype(np.int32), n)
        x = rs.randn(n, 10).astype(np.float32)
        model = NodeClassifier(
            n_feat=10, n_hidden=16, n_class=3,
            aggregators=("mean", "min2", "max"),
        )
        params = model.init(jax.random.PRNGKey(2))
        x_full = np.vstack([x, np.zeros((g.n_node - n, 10), np.float32)])
        full = np.asarray(model.apply(params, jnp.asarray(x_full), g))[:n]

        s = 4
        mesh = make_mesh(("node",), devices=jax.devices("cpu")[:s])
        sg, cuts, order = build_node_sharded_ordered(g, s, "ldg")
        assert not np.array_equal(order, np.arange(n))
        n_m = sg.node_mask.shape[1]
        x_sh = shard_node_values(x, cuts, n_m, order=order)
        sg = place_on_mesh(sg, mesh, "node")
        out = np.asarray(
            make_node_sharded_forward(model, mesh, "node")(params, x_sh, sg)
        )
        gids = np.asarray(sg.global_ids)
        res = np.zeros((n, 3), np.float32)
        for p in range(s):
            v = gids[p] >= 0
            res[gids[p][v]] = out[p][v]
        np.testing.assert_allclose(res, full, atol=2e-4)


class TestSamplerEdgeCases:
    @needs_native
    def test_duplicate_seeds_get_edgeless_rows(self):
        """Duplicate seed ids: both backends keep one row per seed slot
        (loss rows stay aligned with the seed array) and route sampled
        edges to the first occurrence."""
        src, dst, rs = _random_graph(n=2000, m=8000, seed=5)
        seeds = np.array([7, 7, 12, 7, 99], np.int64)
        for use_native in (True, False):
            bt = NeighborSampler.from_host_arrays(
                src, dst, 2000, (3, 2), seed=1, use_native=use_native
            ).sample(seeds, n_node_pad=4096, n_edge_pad=4096)
            assert bt.num_seeds == 5
            np.testing.assert_array_equal(bt.node_ids[:5], seeds)
            rp = np.asarray(bt.graph.row_ptr)
            run = np.diff(rp)
            # duplicate rows (1 and 3) have no in-edges
            assert run[1] == 0 and run[3] == 0

    @needs_native
    def test_empty_frontier_hops(self):
        """Seeds with no in-neighbors: later hops are empty, sampling
        still produces a valid (edgeless) batch in both backends."""
        # a star graph where only node 0 has in-edges
        src = np.arange(1, 50, dtype=np.int32)
        dst = np.zeros(49, np.int32)
        for use_native in (True, False):
            bt = NeighborSampler.from_host_arrays(
                src, dst, 50, (4, 4), seed=0, use_native=use_native
            ).sample(np.array([5, 9]), n_node_pad=64, n_edge_pad=128)
            assert int(np.asarray(bt.graph.num_edges)) == 0
            assert bt.num_nodes == 2
