"""The node-classification MMA layer, vectorized.

Re-designs ``node_classification/layers.py:54-872`` (21 per-node-loop
aggregator methods + ``forward``) as: one K-way masked aggregation
(``mma_tpu.ops.masked_aggregate``), a scaler stage, one dense projection
and one SpMM. The reference's concat-then-tile algebra

    m       = cat_k  aggregate_k(H)              # (K·N, F)     layers.py:855
    m       = cat_s  scale_s(m)                  # (K·N, S·F)   layers.py:856
    support = m @ tile_S(W)                      # (K·N, C)     layers.py:858-860
    out     = tile_K(A) @ support + b            # (N, C)       layers.py:861-865

collapses exactly (linearity of the scalers and the shared W) to

    out = A @ ( (Σ_s scale_s)(Σ_k aggregate_k(H)) @ W ) + b

which is what this layer computes — two MXU matmuls, one edge pass, one
segment-sum, instead of K·N Python iterations.

Parameter-surface note: the reference allocates all 21 mask matrices
regardless of the selected aggregators (``models.py:23-43``, SURVEY §5
N10); unused ones never influence outputs (they only feel weight decay),
so this layer allocates only the selected aggregators' masks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mma_tpu.graph.container import Graph
from mma_tpu.nn import init as inits
from mma_tpu.ops.aggregators import get_agg_spec
from mma_tpu.ops.masked_aggregate import masked_multi_aggregate
from mma_tpu.ops.scalers import SCALER_NAMES, apply_scalers
from mma_tpu.ops.spmm import binary_spmm


@dataclasses.dataclass(frozen=True)
class MMALayer:
    in_features: int
    out_features: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...] = SCALER_NAMES
    activation: str = "new_sigmoid"  # reference train.py:34 default
    sigmoid_k: float = 2.0  # reference --k; inert (its branch is dead, N1)
    mask_dropout: float = 0.5
    parity: bool = True
    bias: bool = True
    # Edge-pipeline compute dtype ("float32" | "bfloat16" | "auto");
    # bf16 halves gather/stream HBM traffic. "auto" resolves per
    # platform at trace time (mma_tpu.autotune): bf16 on TPU — even
    # with parity=True (parity covers the reference's N1-N11 semantics,
    # not bit-level f32 arithmetic; pass "float32" explicitly for the
    # tightest numeric parity).
    compute_dtype: str = "float32"

    @property
    def specs(self):
        specs = tuple(get_agg_spec(a) for a in self.aggregators)
        if self.parity:
            for s in specs:
                if not s.reference_usable:
                    raise ValueError(
                        f"aggregator {s.name!r} is unusable in the reference "
                        "(crashes — SURVEY §5 N5); it exists only with "
                        "parity=False (fixed semantics)"
                    )
        return specs

    def init(self, key):
        wk, bk, mk = jax.random.split(key, 3)
        f_in, f_out, k = self.in_features, self.out_features, len(self.aggregators)
        # MMA output weight: stdv = 1/√weight.size(0) = 1/√in (layers.py:145).
        params = {
            "w": inits.uniform(wk, (f_in, f_out), f_in**-0.5),
            # Mask matrices: stdv = 1/√size(1) = 1/√in (layers.py:148-168),
            # shape (2·nhid, nhid) each (models.py:23-43).
            "masks": jax.vmap(
                lambda kk: inits.uniform(kk, (2 * f_in, f_in), f_in**-0.5)
            )(jax.random.split(mk, k)),
        }
        if self.bias:
            params["b"] = inits.uniform(bk, (f_out,), f_in**-0.5)
        return params

    def apply(
        self,
        params,
        h: jnp.ndarray,
        graph: Graph,
        *,
        rng: Optional[jax.Array] = None,
        use_pallas: bool = False,
        axis_name: Optional[str] = None,
    ) -> jnp.ndarray:
        """``rng`` enables mask dropout (the parity-mode reference applies it
        in eval too — N2; pass ``rng=None`` for deterministic output).
        ``axis_name`` runs the edge-driven reductions edge-sharded (see
        ``mma_tpu.parallel.edge_parallel``)."""
        from mma_tpu.autotune import resolve_compute_dtype

        compute_dtype = resolve_compute_dtype(self.compute_dtype)
        m = masked_multi_aggregate(
            h,
            graph,
            params["masks"],
            self.specs,
            activation=self.activation,
            parity=self.parity,
            mask_dropout_rate=self.mask_dropout,
            rng=rng,
            use_pallas=use_pallas,
            axis_name=axis_name,
            compute_dtype=jnp.dtype(compute_dtype),
        )  # (N, K, F)
        msum = jnp.sum(m, axis=1)  # Σ_k aggregate_k — see module docstring
        scaled = apply_scalers(
            msum, graph.deg, graph.node_mask, self.scalers, parity=self.parity
        )
        # The final propagation is the layer's second full edge pass; in
        # the bf16 pipeline its operand rides bf16 too (halves the
        # src-gather + segment-sum HBM traffic; the f32/parity pipeline
        # is untouched).
        support = (scaled @ params["w"]).astype(jnp.dtype(compute_dtype))
        out = binary_spmm(
            graph, support, use_pallas=use_pallas, axis_name=axis_name
        )
        if self.bias:
            out = out + params["b"]
        return out
