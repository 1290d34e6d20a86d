"""ELL dense-neighbor format: primitives, conv/layer paths, sampler
bucket layout (``mma_tpu.ops.ell`` — round-4 degree-bucketed edge
format; replaces the one-hot scatter contraction on bounded-degree
graphs, reference workload ``graph_regression/mma.py:57-60`` max
in-degree ≤ 4)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.graph.build import graph_from_edges
from mma_tpu.ops.ell import (
    EllSpec,
    ell_collapse,
    ell_expand,
    ell_gather_nodes_by_src,
    ell_valid,
    masked_minmax_firsthit,
    masked_slot_sum,
    max_indegree,
    single_width_spec,
    validate_spec,
)


def _bounded_graph(n=64, max_deg=5, seed=0, n_feat=None):
    rs = np.random.RandomState(seed)
    srcs, dsts = [], []
    for i in range(n):
        k = rs.randint(0, max_deg + 1)
        nb = rs.choice(n, size=k, replace=False)
        srcs += list(nb)
        dsts += [i] * k
    return graph_from_edges(
        np.array(srcs, np.int32), np.array(dsts, np.int32), n
    ), rs


def _with_hint(g, width=None):
    w = width if width is not None else max_indegree(g)
    return dataclasses.replace(g, ell_hint=((g.n_node, w),))


class TestPrimitives:
    def test_expand_collapse_roundtrip(self):
        g, rs = _bounded_graph()
        spec = single_width_spec(g.n_node, max_indegree(g))
        validate_spec(g, spec)
        data = jnp.asarray(rs.randn(g.n_edge, 8).astype(np.float32))
        parts = ell_expand(data, g, spec)
        back = ell_collapse([p for p in parts], g, spec, channels=8)
        mask = np.asarray(g.edge_mask)
        np.testing.assert_array_equal(
            np.asarray(back)[mask], np.asarray(data)[mask]
        )
        # Valid-slot values equal the CSR run contents.
        ids_ok = np.asarray(back)[~mask]
        assert (ids_ok == 0).all()  # padding edges collapse to 0

    def test_expand_vjp_is_exact_adjoint(self):
        g, rs = _bounded_graph(n=40, max_deg=4, seed=1)
        spec = single_width_spec(g.n_node, 4)
        data = jnp.asarray(rs.randn(g.n_edge, 4).astype(np.float32))
        valids = ell_valid(g, spec)

        def f(d):
            parts = ell_expand(d, g, spec)
            return sum(
                jnp.sum(masked_slot_sum(p * p, v, w))
                for p, v, w in zip(parts, valids, spec.widths)
            )

        grad = jax.grad(f)(data)
        # d/d(data_e) Σ x² = 2·data_e for real edges, 0 for padding.
        expect = np.where(
            np.asarray(g.edge_mask)[:, None], 2 * np.asarray(data), 0.0
        )
        np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-6)

    def test_gather_nodes_by_src_matches_and_grads(self):
        g, rs = _bounded_graph(n=48, max_deg=6, seed=2)
        spec = single_width_spec(g.n_node, max_indegree(g))
        x = jnp.asarray(rs.randn(g.n_node, 8).astype(np.float32))
        valids = ell_valid(g, spec)

        def agg_ell(x_):
            parts = ell_gather_nodes_by_src(x_, g, spec)
            return jnp.concatenate(
                [masked_slot_sum(p, v, w)
                 for p, v, w in zip(parts, valids, spec.widths)]
            )

        def agg_ref(x_):
            gathered = jnp.where(
                g.edge_mask[:, None], x_[g.src], 0.0
            )
            return jax.ops.segment_sum(gathered, g.dst, g.n_node)

        np.testing.assert_allclose(
            np.asarray(agg_ell(x)), np.asarray(agg_ref(x)), atol=1e-5
        )
        g1 = jax.grad(lambda x_: jnp.sum(agg_ell(x_) ** 2))(x)
        g2 = jax.grad(lambda x_: jnp.sum(agg_ref(x_) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_minmax_firsthit_routing(self):
        # Duplicated optima: cotangent must go to the FIRST valid slot
        # (torch_scatter argmin/argmax semantics). 2-D slot layout:
        # (rows, W·C) with C=1, W=4.
        x = jnp.asarray(
            [[3.0, 1.0, 1.0, 9.0],
             [2.0, 5.0, 5.0, 0.0]]
        )  # (2, 4·1)
        valid = jnp.asarray([[True, True, True, False],
                             [False, True, True, True]])
        (mn, mx), vjp = jax.vjp(
            lambda x_: masked_minmax_firsthit(x_, valid, ("min", "max"), 4),
            x,
        )
        np.testing.assert_allclose(np.asarray(mn)[:, 0], [1.0, 0.0])
        np.testing.assert_allclose(np.asarray(mx)[:, 0], [3.0, 5.0])
        (dx,) = vjp((jnp.ones_like(mn), jnp.ones_like(mx)))
        # row 0: min routes to slot 1 (first of the 1.0 tie; slot 3's 9.0
        # is masked), max to slot 0. row 1: min → slot 3, max → slot 1.
        np.testing.assert_allclose(
            np.asarray(dx),
            [[1.0, 1.0, 0.0, 0.0], [0.0, 1.0, 0.0, 1.0]],
        )

    def test_validate_spec_rejects_narrow(self):
        g, _ = _bounded_graph(n=32, max_deg=5, seed=3)
        w = max_indegree(g)
        with pytest.raises(ValueError):
            validate_spec(g, single_width_spec(g.n_node, w - 1))
        validate_spec(g, single_width_spec(g.n_node, w))


class TestConvEllPath:
    @pytest.mark.parametrize("parity", [True, False])
    @pytest.mark.parametrize(
        "aggs", [("min", "max"), ("sum", "mean", "var", "std")]
    )
    def test_matches_xla_path(self, parity, aggs):
        from mma_tpu.nn.mma_conv import MultiMaskConv

        g, rs = _bounded_graph(n=60, max_deg=4, seed=4)
        kw = dict(
            in_channels=12, out_channels=12, aggregators=aggs,
            scalers=("identity", "amplification"),
            avg_deg=(("lin", 2.0), ("log", 1.0), ("exp", 5.0)),
            edge_dim=6, towers=2, parity=parity, max_degree_hint=4,
        )
        conv_csr = MultiMaskConv(edge_format="csr", **kw)
        conv_ell = MultiMaskConv(edge_format="ell", **kw)
        params = conv_csr.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rs.randn(g.n_node, 12).astype(np.float32))
        e = jnp.asarray(rs.randn(g.n_edge, 6).astype(np.float32))

        def loss(conv):
            def f(p, xx):
                out = conv.apply(p, xx, g, edge_attr=e, use_pallas=False)
                return jnp.sum(
                    jnp.where(g.node_mask[:, None], out, 0.0) ** 2
                )
            return f

        l1, g1 = jax.value_and_grad(loss(conv_csr), argnums=(0, 1))(params, x)
        l2, g2 = jax.value_and_grad(loss(conv_ell), argnums=(0, 1))(params, x)
        assert abs(float(l1 - l2)) <= 1e-4 * max(abs(float(l1)), 1.0)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4,
                rtol=1e-3,
            )

    def test_dropout_runs_and_is_deterministic_per_key(self):
        from mma_tpu.nn.mma_conv import MultiMaskConv

        g, rs = _bounded_graph(n=40, max_deg=4, seed=5)
        conv = MultiMaskConv(
            in_channels=8, out_channels=8, aggregators=("min", "max"),
            scalers=("identity",),
            avg_deg=(("lin", 2.0), ("log", 1.0), ("exp", 5.0)),
            edge_dim=4, towers=1, parity=True, max_degree_hint=4,
            edge_format="ell",
        )
        params = conv.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rs.randn(g.n_node, 8).astype(np.float32))
        e = jnp.asarray(rs.randn(g.n_edge, 4).astype(np.float32))
        o1 = conv.apply(params, x, g, edge_attr=e,
                        rng=jax.random.PRNGKey(7))
        o2 = conv.apply(params, x, g, edge_attr=e,
                        rng=jax.random.PRNGKey(7))
        o3 = conv.apply(params, x, g, edge_attr=e,
                        rng=jax.random.PRNGKey(8))
        assert jnp.isfinite(o1).all()
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0


class TestLayerEllPath:
    @pytest.mark.parametrize(
        "aggs,parity",
        [(("mean", "mean2"), True),
         (("min", "min2", "min3", "min4"), True),
         (("std", "normalized_mean", "moment_3"), False)],
    )
    def test_mma_layer_matches(self, aggs, parity):
        from mma_tpu.nn.mma_layer import MMALayer

        g, rs = _bounded_graph(n=80, max_deg=6, seed=6)
        g_ell = _with_hint(g)
        layer = MMALayer(10, 10, aggs, parity=parity)
        params = layer.init(jax.random.PRNGKey(1))
        x = jnp.asarray(rs.randn(g.n_node, 10).astype(np.float32))

        def loss(gg, up):
            def f(p, xx):
                out = layer.apply(p, xx, gg, use_pallas=up)
                return jnp.sum(
                    jnp.where(gg.node_mask[:, None], out, 0.0) ** 2
                )
            return f

        l1, g1 = jax.value_and_grad(loss(g, False), argnums=(0, 1))(params, x)
        l2, g2 = jax.value_and_grad(loss(g_ell, True), argnums=(0, 1))(params, x)
        assert abs(float(l1 - l2)) <= 1e-4 * max(abs(float(l1)), 1.0)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            scale = float(jnp.abs(a).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / scale < 2e-4

    def test_binary_spmm_matches(self):
        # Target the ELL *fallback* branch: strip the CSR/CSC kernel
        # structure (with it present, binary_spmm prefers the CSR path —
        # measured faster for a plain SpMM).
        from mma_tpu.ops.spmm import binary_spmm

        g, rs = _bounded_graph(n=70, max_deg=5, seed=7)
        g_ell = dataclasses.replace(
            _with_hint(g), src_perm=None, col_ptr=None, src_csc=None,
            dst_csc=None,
        )
        x = jnp.asarray(rs.randn(g.n_node, 12).astype(np.float32))
        a = binary_spmm(g, x, use_pallas=False)
        b = binary_spmm(g_ell, x, use_pallas=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        ga = jax.grad(lambda xx: jnp.sum(binary_spmm(g, xx) ** 2))(x)
        gb = jax.grad(
            lambda xx: jnp.sum(binary_spmm(g_ell, xx, use_pallas=True) ** 2)
        )(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-3)


class TestSamplerHoppedLayout:
    def _make(self, seed=1):
        rs = np.random.RandomState(0)
        n, m = 3000, 24000
        a = rs.randint(0, n, m).astype(np.int32)
        b = rs.randint(0, n, m).astype(np.int32)
        keep = a != b
        src = np.concatenate([a[keep], b[keep]])
        dst = np.concatenate([b[keep], a[keep]])
        from mma_tpu.data.sampling import NeighborSampler

        mk = lambda: NeighborSampler.from_host_arrays(
            src, dst, n, (4, 4, 3), seed=seed
        )
        seeds = rs.choice(n, 32, replace=False)
        return mk, seeds

    def test_layout_invariance_and_hint(self):
        mk, seeds = self._make()
        b_old = mk().sample(seeds, n_node_pad=4096, n_edge_pad=4096)
        pads = (32, 160, 768, 2048)
        b_new = mk().sample(
            seeds, n_node_pad=4096, n_edge_pad=4096, hop_node_pads=pads
        )
        assert b_new.num_nodes == b_old.num_nodes
        assert b_new.graph.ell_hint == ((32, 4), (192, 4), (960, 3))
        # Per-bucket run lengths respect the widths; leaves have no edges.
        rp = np.asarray(b_new.graph.row_ptr)
        run = np.diff(rp)
        bounds = [0] + [b for b, _ in b_new.graph.ell_hint]
        for (s, e), (_, w) in zip(
            zip(bounds[:-1], bounds[1:]), b_new.graph.ell_hint
        ):
            assert run[s:e].max(initial=0) <= w
        assert run[bounds[-1]:-1].max(initial=0) == 0
        # Model outputs on seed rows are layout-invariant, and the ELL
        # path equals the XLA path on the hopped layout.
        from mma_tpu.models import NodeClassifier

        feats = np.random.RandomState(2).randn(3000, 16).astype(np.float32)
        model = NodeClassifier(
            n_feat=16, n_hidden=8, n_class=3, aggregators=("mean", "mean2")
        )
        params = model.init(jax.random.PRNGKey(0))

        def run_model(batch, up):
            x = np.zeros((batch.graph.n_node, 16), np.float32)
            valid = batch.node_ids >= 0
            x[valid] = feats[batch.node_ids[valid]]
            out = model.apply(
                params, jnp.asarray(x), batch.graph, use_pallas=up
            )
            return np.asarray(out)[: batch.num_seeds]

        o_old = run_model(b_old, False)
        o_xla = run_model(b_new, False)
        o_ell = run_model(b_new, True)
        np.testing.assert_allclose(o_old, o_xla, atol=1e-5)
        # use_pallas=True now runs the HYBRID fast path (ELL aggregate +
        # CSR-kernel SpMM): the kernel's 2-term bf16 operand split is
        # ~1e-6 relative, so the tolerance is the kernel suite's, not
        # exact-gather tight.
        np.testing.assert_allclose(o_xla, o_ell, atol=1e-4)

    def test_overflow_raises(self):
        mk, seeds = self._make()
        with pytest.raises(ValueError):
            mk().sample(
                seeds, n_node_pad=4096, n_edge_pad=4096,
                hop_node_pads=(32, 4, 768, 2048),
            )


class TestDegreeExact:
    """Degree-exact ELL layout (round 5): ``batch_graphs(
    ell_degree_budgets=...)`` groups nodes by exact in-degree so the flat
    slot index equals the dst-sorted edge index — expand/collapse are
    reshapes (``ell_expand_exact``), no gathers, no masks."""

    def _mols(self, n_graphs=7, seed=0):
        rs = np.random.RandomState(seed)
        num_nodes, srcs, dsts, nfeats, efeats, ys = [], [], [], [], [], []
        for _ in range(n_graphs):
            n = int(rs.randint(5, 14))
            s_, d_ = [], []
            deg = np.zeros(n, np.int64)
            for i in range(1, n):
                j = int(rs.randint(i))
                if deg[i] < 4 and deg[j] < 4:
                    s_ += [i, j]; d_ += [j, i]
                    deg[i] += 1; deg[j] += 1
            num_nodes.append(n)
            srcs.append(np.array(s_, np.int32))
            dsts.append(np.array(d_, np.int32))
            nfeats.append(rs.randint(0, 5, size=n).astype(np.int32))
            efeats.append(rs.randint(0, 3, size=len(s_)).astype(np.int32))
            ys.append(np.array([rs.randn()], np.float32))
        return num_nodes, srcs, dsts, nfeats, efeats, ys

    def _batch_pair(self, seed=0):
        from mma_tpu.data.batching import batch_graphs, degree_budgets

        nn, ss, dd, nf, ef, ys = self._mols(seed=seed)
        budgets = degree_budgets(nn, ss, dd, batch_size=len(nn))
        kw = dict(n_graph=len(nn) + 1, n_node=128, n_edge=256,
                  node_feats=nf, edge_feats=ef, targets=ys)
        plain = batch_graphs(nn, ss, dd, **kw)
        exact = batch_graphs(nn, ss, dd, ell_degree_budgets=budgets, **kw)
        return plain, exact

    def test_exact_layout_structure(self):
        from mma_tpu.ops.ell import EllSpec, validate_spec

        plain, exact = self._batch_pair()
        g = exact.graph
        assert g.ell_exact and g.chunk_hint is None
        assert not exact.nodes_grouped
        spec = EllSpec.from_hint(g.ell_hint)
        validate_spec(g, spec)
        # Slot index == edge index: every bucket row (real or padding)
        # has exactly its width's run length, so row_ptr at each bucket
        # start equals the cumulative slot offset.
        rp = np.asarray(g.row_ptr)
        off = 0
        for s, b, w in zip(spec.starts, spec.bounds, spec.widths):
            runs = rp[s + 1 : b + 1] - rp[s:b]
            assert (runs == w).all(), (s, b, w)
            assert rp[s] == off
            off += (b - s) * w
        # Degree multiset preserved; real counts match.
        assert int(np.asarray(g.num_edges)) == int(
            np.asarray(plain.graph.num_edges))
        deg_p = np.sort(np.asarray(plain.graph.deg)[
            np.asarray(plain.graph.node_mask)])
        deg_e = np.sort(np.asarray(g.deg)[np.asarray(g.node_mask)])
        np.testing.assert_array_equal(deg_p, deg_e)

    @pytest.mark.parametrize("parity", [True, False])
    @pytest.mark.parametrize(
        "aggs", [("min", "max"), ("sum", "mean", "var", "std")]
    )
    def test_conv_exact_matches_xla(self, parity, aggs):
        """Exact-ELL conv vs the plain-XLA path on the SAME exact graph:
        values and grads allclose (no dropout)."""
        from mma_tpu.nn.mma_conv import MultiMaskConv

        _, exact = self._batch_pair(seed=3)
        g = exact.graph
        rs = np.random.RandomState(1)
        kw = dict(
            in_channels=12, out_channels=12, aggregators=aggs,
            scalers=("identity", "amplification"),
            avg_deg=(("lin", 2.0), ("log", 1.0), ("exp", 5.0)),
            edge_dim=6, towers=2, parity=parity, max_degree_hint=4,
        )
        conv_xla = MultiMaskConv(edge_format="csr", **kw)
        conv_ell = MultiMaskConv(edge_format="auto", **kw)
        params = conv_xla.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rs.randn(g.n_node, 12).astype(np.float32))
        e = jnp.asarray(rs.randn(g.n_edge, 6).astype(np.float32))

        def loss(conv, up):
            def f(p, xx):
                out = conv.apply(p, xx, g, edge_attr=e, use_pallas=up)
                return jnp.sum(
                    jnp.where(g.node_mask[:, None], out, 0.0) ** 2
                )
            return f

        l1, g1 = jax.value_and_grad(loss(conv_xla, False),
                                    argnums=(0, 1))(params, x)
        l2, g2 = jax.value_and_grad(loss(conv_ell, True),
                                    argnums=(0, 1))(params, x)
        assert abs(float(l1 - l2)) <= 1e-4 * max(abs(float(l1)), 1.0)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            )

    def test_zincnet_batch_layout_invariance(self):
        """Same molecules through the plain and the degree-exact batch:
        per-graph predictions and parameter grads match (node order is a
        pure relabeling; every readout is permutation-invariant)."""
        from mma_tpu.models import ZincNet

        plain, exact = self._batch_pair(seed=5)
        model = ZincNet(
            aggregators=("min", "max"),
            scalers=("identity", "amplification", "linear"),
            avg_deg=(("lin", 2.0), ("log", 1.0), ("exp", 5.0)),
            num_layers=2, towers=5, max_degree_hint=4,
        )
        params = model.init(jax.random.PRNGKey(0))
        state = model.init_state()

        def run(b, up):
            def loss(p):
                pred, _ = model.apply(p, state, b, training=False,
                                      use_pallas=up)
                err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
                return err.sum(), pred
            (l, pred), gr = jax.value_and_grad(
                loss, has_aux=True)(params)
            return l, pred, gr

        l1, pred1, gr1 = run(plain, True)
        l2, pred2, gr2 = run(exact, True)
        gm = np.asarray(plain.graph_mask)
        np.testing.assert_allclose(
            np.asarray(pred1)[gm], np.asarray(pred2)[gm],
            atol=5e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(gr1), jax.tree.leaves(gr2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3,
            )

    def test_exact_dropout_paths_run(self):
        """N2 dropout on the exact path: finite, deterministic per key."""
        from mma_tpu.nn.mma_conv import MultiMaskConv

        _, exact = self._batch_pair(seed=7)
        g = exact.graph
        rs = np.random.RandomState(2)
        conv = MultiMaskConv(
            in_channels=8, out_channels=8, aggregators=("min", "max"),
            scalers=("identity",),
            avg_deg=(("lin", 2.0), ("log", 1.0), ("exp", 5.0)),
            edge_dim=4, towers=1, parity=True, max_degree_hint=4,
        )
        params = conv.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rs.randn(g.n_node, 8).astype(np.float32))
        e = jnp.asarray(rs.randn(g.n_edge, 4).astype(np.float32))
        o1 = conv.apply(params, x, g, edge_attr=e, use_pallas=True,
                        rng=jax.random.PRNGKey(3))
        o2 = conv.apply(params, x, g, edge_attr=e, use_pallas=True,
                        rng=jax.random.PRNGKey(3))
        assert jnp.isfinite(o1).all()
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
