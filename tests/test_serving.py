"""Serving export roundtrips: serialize → fresh deserialize → same
outputs as the live model, and shape-generalization across graphs with
identical padded shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from mma_tpu.models import NodeClassifier
from mma_tpu.serve import (
    export_forward,
    export_node_classifier,
    export_zinc_predictor,
    load_forward,
)

from helpers import random_symmetric_graph


def _node_setup(seed=0):
    _, _, graph = random_symmetric_graph(30, p=0.2, seed=seed)
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(graph.n_node, 12).astype(np.float32))
    model = NodeClassifier(
        n_feat=12, n_hidden=16, n_class=5,
        aggregators=("mean", "mean2"), dropout_rate=0.5,
    )
    params = model.init(jax.random.PRNGKey(0))
    return model, params, x, graph


def test_node_classifier_export_roundtrip():
    model, params, x, graph = _node_setup()
    blob = export_node_classifier(model, params, x, graph)
    assert isinstance(blob, bytes) and len(blob) > 0

    served = load_forward(blob)
    got = served(params, x, graph)
    want = model.apply(params, x, graph, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_export_generalizes_over_same_shape_graphs():
    """One artifact serves any graph with the same padded shapes."""
    model, params, x, graph = _node_setup(seed=0)
    served = load_forward(export_node_classifier(model, params, x, graph))

    _, _, graph2 = random_symmetric_graph(30, p=0.2, seed=7)
    assert graph2.n_node == graph.n_node and graph2.n_edge == graph.n_edge
    rs = np.random.RandomState(9)
    x2 = jnp.asarray(rs.randn(graph2.n_node, 12).astype(np.float32))

    got = served(params, x2, graph2)
    want = model.apply(params, x2, graph2, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_zinc_export_roundtrip():
    from mma_tpu.data import load_zinc
    from mma_tpu.models import ZincNet
    from mma_tpu.nn.mma_conv import compute_avg_deg

    ds = load_zinc("val", subset_size=8)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()), towers=5, num_layers=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    batch = next(ds.batches(4, n_node=160, n_edge=400))

    served = load_forward(export_zinc_predictor(model, params, state, batch))
    got = served(params, state, batch)
    want, _ = model.apply(params, state, batch, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_export_restored_checkpoint_params(tmp_path):
    """Orbax-restored params feed the served artifact unchanged."""
    from mma_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    model, params, x, graph = _node_setup()
    save_checkpoint(str(tmp_path), 3, {"params": params})
    step, payload = restore_checkpoint(str(tmp_path), target={"params": params})
    assert step == 3

    served = load_forward(export_node_classifier(model, params, x, graph))
    got = served(payload["params"], x, graph)
    want = model.apply(params, x, graph, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pallas_path_export_roundtrip_same_platform():
    """use_pallas=True exports for the CURRENT platform (the Mosaic
    custom calls serialize; on CPU the kernels run interpret-mode, on
    TPU the real kernels — verified on v5e by
    scripts/export_pallas_probe.py, bit-exact vs the direct forward)."""
    model, params, x, graph = _node_setup(seed=3)
    blob = export_node_classifier(model, params, x, graph, use_pallas=True)
    served = load_forward(blob)
    got = served(params, x, graph)
    want = model.apply(params, x, graph, training=False, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_ell_hint_graph_export_roundtrip():
    """Graph aux (chunk_hint AND ell_hint) serializes through the JSON
    auxdata codec; the ELL forward path round-trips."""
    import dataclasses

    from mma_tpu.ops.ell import max_indegree

    model, params, x, graph = _node_setup(seed=4)
    g_ell = dataclasses.replace(
        graph, ell_hint=((graph.n_node, max_indegree(graph)),)
    )
    blob = export_node_classifier(model, params, x, g_ell, use_pallas=True)
    served = load_forward(blob)
    got = served(params, x, g_ell)
    want = model.apply(params, x, g_ell, training=False, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_degree_exact_batch_export_roundtrip():
    """The degree-exact collate's static aux (4-tuple Graph aux incl.
    ell_exact/csc_ell_exact, BatchedGraphs.nodes_grouped) serializes
    through the JSON auxdata codec; the exact-ELL ZincNet forward
    round-trips (allclose; separate jit contexts differ in fusion)."""
    import numpy as np
    from mma_tpu.data import load_zinc
    from mma_tpu.data.batching import degree_budgets
    from mma_tpu.models import ZincNet
    from mma_tpu.nn.mma_conv import compute_avg_deg
    from mma_tpu.serve import export_forward

    ds = load_zinc("val", subset_size=8)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    model = ZincNet(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()), towers=5, num_layers=2,
        max_degree_hint=4,
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    idx = list(range(4))
    budgets = degree_budgets(
        [int(ds.num_nodes[i]) for i in idx],
        [ds.edge_dst[i] for i in idx], [ds.edge_dst[i] for i in idx], 4,
    )
    batch = next(ds.batches(4, n_node=256, n_edge=512,
                            ell_degree_budgets=budgets))
    assert batch.graph.ell_exact and not batch.nodes_grouped

    def fwd(p, b):
        pred, _ = model.apply(p, state, b, training=False, use_pallas=True)
        return pred

    blob = export_forward(fwd, (params, batch))
    from mma_tpu.serve import load_forward as _lf

    served = _lf(blob)
    got = served(params, batch)
    want = fwd(params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
