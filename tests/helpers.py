"""Shared test utilities."""

from __future__ import annotations

import numpy as np

from mma_tpu.graph.build import graph_from_dense


def random_symmetric_graph(n, p=0.2, seed=0, ensure_degree=True):
    """Random symmetric 0/1 adjacency with no self-loops + its Graph."""
    rs = np.random.RandomState(seed)
    a = (rs.rand(n, n) < p).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    if ensure_degree:
        for i in range(n):
            if a[i].sum() == 0:
                j = (i + 1) % n
                a[i, j] = a[j, i] = 1.0
    add_all = [np.nonzero(a[i])[0] for i in range(n)]
    return a, add_all, graph_from_dense(a)


def unpad(x, n):
    return np.asarray(x)[:n]
