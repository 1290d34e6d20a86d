"""pygcn-style graph convolution: ``A @ (X W) + b``.

Reference: ``node_classification/layers.py:12-51``. Note the adjacency is
the raw binary matrix — the reference never normalizes or adds self-loops
(``utils.py:71,114``; its ``normalize`` helper is dead code), and this
layer reproduces that exactly.
"""

from __future__ import annotations

import dataclasses

import jax

from mma_tpu.graph.container import Graph
from mma_tpu.nn import init as inits
from mma_tpu.ops.spmm import binary_spmm


@dataclasses.dataclass(frozen=True)
class GraphConvolution:
    in_features: int
    out_features: int
    bias: bool = True
    # Edge-pipeline dtype for the SpMM operand ("float32"|"bfloat16"|
    # "auto"): the propagation is HBM-bound on the per-edge row stream;
    # bf16 halves it. Accumulation stays f32 (see binary_spmm).
    compute_dtype: str = "float32"

    def init(self, key):
        wk, bk = jax.random.split(key)
        # pygcn init: stdv = 1/√weight.size(1) (layers.py:32-36).
        params = {"w": inits.uniform_fan_out(wk, (self.in_features, self.out_features))}
        if self.bias:
            params["b"] = inits.uniform(bk, (self.out_features,), self.out_features**-0.5)
        return params

    def apply(self, params, x, graph: Graph, *, use_pallas: bool = False,
              axis_name=None):
        from mma_tpu.autotune import resolve_compute_dtype

        support = x @ params["w"]
        support = support.astype(resolve_compute_dtype(self.compute_dtype))
        out = binary_spmm(graph, support, use_pallas=use_pallas, axis_name=axis_name)
        if self.bias:
            out = out + params["b"]
        return out
