"""Readiness proofs for the two data-gated quality configs.

Real ZINC and ``ind.pubmed.allx`` are absent from this environment
(zero egress), so these tests pin the *code paths* that real data will
take the day it lands:

- the ``scripts/convert_zinc.py`` conversion logic (run here on fake
  PyG-style Data objects backed by torch tensors, exactly the attribute
  surface PyG's ZINC-subset exposes) round-trips through
  ``load_zinc``'s real-npz branch with zero code changes;
- ``load_planetoid`` with a complete miniature Planetoid file set
  (including a real ``allx``) exercises the non-synthetic feature path:
  vstack + test-row reordering (``node_classification/utils.py:66-75``).
"""

import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp


# ---- ZINC conversion round-trip -------------------------------------


class _FakeData:
    """The attribute surface convert_zinc reads off a PyG Data object."""

    def __init__(self, n, edge_index, x, edge_attr, y):
        import torch

        self.num_nodes = n
        self.edge_index = torch.tensor(edge_index, dtype=torch.long)
        self.x = torch.tensor(x, dtype=torch.long).reshape(-1, 1)
        self.edge_attr = torch.tensor(edge_attr, dtype=torch.long)
        self.y = torch.tensor([y], dtype=torch.float32)


def _fake_molecules(seed=0, count=5):
    rs = np.random.RandomState(seed)
    mols = []
    for _ in range(count):
        n = int(rs.randint(9, 20))
        # chain + one ring closure, both directions (PyG ZINC is directed
        # with both directions present).
        und = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
        src = np.array([a for a, b in und] + [b for a, b in und], np.int64)
        dst = np.array([b for a, b in und] + [a for a, b in und], np.int64)
        x = rs.randint(0, 21, size=n)
        et = rs.randint(1, 4, size=len(src))
        mols.append(_FakeData(n, np.stack([src, dst]), x, et, float(rs.randn())))
    return mols


def test_convert_zinc_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from convert_zinc import records_from_dataset, write_split

    from mma_tpu.data import load_zinc

    mols = _fake_molecules()
    records = records_from_dataset(mols)

    # Schema pin: exactly the keys/dtypes load_zinc's npz branch reads.
    assert set(records) == {
        "num_nodes", "num_edges", "node_types", "edge_src", "edge_dst",
        "edge_types", "y",
    }
    assert records["num_nodes"].dtype == np.int64
    assert records["node_types"].dtype == np.int32
    assert records["edge_src"].dtype == np.int32
    assert records["y"].dtype == np.float32

    path = write_split(str(tmp_path), "train", records)
    assert os.path.basename(path) == "zinc_train.npz"
    ds = load_zinc("train", root=str(tmp_path))

    assert not ds.synthetic
    assert len(ds) == len(mols)
    for i, m in enumerate(mols):
        assert int(ds.num_nodes[i]) == m.num_nodes
        np.testing.assert_array_equal(ds.node_types[i], np.asarray(m.x).reshape(-1))
        np.testing.assert_array_equal(ds.edge_src[i], np.asarray(m.edge_index[0]))
        np.testing.assert_array_equal(ds.edge_dst[i], np.asarray(m.edge_index[1]))
        np.testing.assert_array_equal(ds.edge_types[i], np.asarray(m.edge_attr))
        np.testing.assert_allclose(ds.y[i], float(m.y), rtol=1e-6)

    # The downstream consumers real data feeds: degree histogram (scaler
    # statistics) and padded batching.
    hist = ds.degree_histogram()
    assert hist.sum() == ds.num_nodes.sum()
    batch = next(ds.batches(4, n_node=128, n_edge=256))
    assert batch.graph.n_node == 128 and batch.graph.n_edge == 256


# ---- Pubmed real-allx path ------------------------------------------


def _write_mini_planetoid(root, name="pubmed", seed=3):
    """A complete miniature Planetoid file set: 12 nodes, 8 in allx,
    4 test nodes with a shuffled test.index — small but structurally
    faithful (x ⊂ allx, tx rows in test.index order)."""
    rs = np.random.RandomState(seed)
    n, n_test, f, c = 12, 4, 5, 3
    n_all = n - n_test
    allx_d = (rs.rand(n_all, f) < 0.5).astype(np.float32)
    tx_d = (rs.rand(n_test, f) < 0.5).astype(np.float32)
    ally = np.eye(c)[rs.randint(c, size=n_all)]
    ty = np.eye(c)[rs.randint(c, size=n_test)]
    n_y = 3
    test_reorder = np.array([10, 8, 11, 9])

    graph_dict = {i: [] for i in range(n)}
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
                 (7, 8), (8, 9), (9, 10), (10, 11), (11, 0), (2, 9)]:
        graph_dict[a].append(b)

    objs = {
        "x": sp.csr_matrix(allx_d[:n_y]),
        "y": ally[:n_y],
        "tx": sp.csr_matrix(tx_d),
        "ty": ty,
        "allx": sp.csr_matrix(allx_d),
        "ally": ally,
        "graph": graph_dict,
    }
    for part, obj in objs.items():
        with open(os.path.join(root, f"ind.{name}.{part}"), "wb") as fh:
            pickle.dump(obj, fh)
    with open(os.path.join(root, f"ind.{name}.test.index"), "w") as fh:
        fh.write("\n".join(str(i) for i in test_reorder) + "\n")
    return allx_d, tx_d, ally, ty, test_reorder


def test_planetoid_real_allx_path(tmp_path):
    from mma_tpu.data import load_planetoid

    allx_d, tx_d, ally, ty, test_reorder = _write_mini_planetoid(str(tmp_path))
    data = load_planetoid("pubmed", root=str(tmp_path))  # no synthetic flag

    assert data.num_nodes == 12
    # allx rows land verbatim on nodes 0..7.
    np.testing.assert_array_equal(data.features[:8], allx_d)
    # tx[k] belongs to node test.index[k] (the reorder step).
    for k, node in enumerate(test_reorder):
        np.testing.assert_array_equal(data.features[node], tx_d[k])
        assert data.labels[node] == ty[k].argmax()
    # Labels of allx nodes come from ally.
    np.testing.assert_array_equal(data.labels[:8], ally.argmax(1))
    # Test split is the sorted test ids.
    np.testing.assert_array_equal(data.idx_test, np.sort(test_reorder))
    # Graph is symmetric and unnormalized: every edge has its reverse.
    g = data.graph
    e = int(np.asarray(g.num_edges))
    pairs = {(int(s), int(d)) for s, d in
             zip(np.asarray(g.src)[:e], np.asarray(g.dst)[:e])}
    assert all((d, s) in pairs for s, d in pairs)
    assert (13 * 2) == len(pairs)


def test_planetoid_missing_allx_requires_flag(tmp_path):
    """Without allx the loader refuses unless synthetic_features=True —
    quality runs can never silently use fake features."""
    from mma_tpu.data import load_planetoid

    _write_mini_planetoid(str(tmp_path))
    os.remove(os.path.join(str(tmp_path), "ind.pubmed.allx"))
    with pytest.raises(FileNotFoundError, match="synthetic_features"):
        load_planetoid("pubmed", root=str(tmp_path))
    data = load_planetoid("pubmed", root=str(tmp_path), synthetic_features=True)
    assert data.num_nodes == 12
