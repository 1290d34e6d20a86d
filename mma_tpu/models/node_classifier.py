"""2-layer node-classification model: GCN → ReLU → dropout → MMA → log-softmax.

Reference: ``node_classification/models.py:12-68`` (the model there is
confusingly also named ``MMAConv``; renamed here to avoid the collision
with the graph-regression conv noted in SURVEY §1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mma_tpu.graph.container import Graph
from mma_tpu.nn.gcn import GraphConvolution
from mma_tpu.nn.layers import dropout
from mma_tpu.nn.mma_layer import MMALayer
from mma_tpu.ops.scalers import SCALER_NAMES


@dataclasses.dataclass(frozen=True)
class NodeClassifier:
    n_feat: int
    n_hidden: int
    n_class: int
    aggregators: Tuple[str, ...]
    scalers: Tuple[str, ...] = SCALER_NAMES
    dropout_rate: float = 0.5
    activation: str = "new_sigmoid"
    sigmoid_k: float = 2.0
    parity: bool = True
    # Edge-pipeline compute dtype for both layers (see MMALayer).
    compute_dtype: str = "float32"

    @property
    def gc1(self) -> GraphConvolution:
        return GraphConvolution(
            self.n_feat, self.n_hidden, compute_dtype=self.compute_dtype
        )

    @property
    def mma(self) -> MMALayer:
        return MMALayer(
            in_features=self.n_hidden,
            out_features=self.n_class,
            aggregators=self.aggregators,
            scalers=self.scalers,
            activation=self.activation,
            sigmoid_k=self.sigmoid_k,
            mask_dropout=self.dropout_rate,
            parity=self.parity,
            compute_dtype=self.compute_dtype,
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"gc1": self.gc1.init(k1), "mma": self.mma.init(k2)}

    def apply(
        self,
        params,
        x: jnp.ndarray,
        graph: Graph,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        parity_eval_dropout: bool = False,
        use_pallas: bool = False,
        axis_name: Optional[str] = None,
    ) -> jnp.ndarray:
        """Log-probabilities ``(N, n_class)``.

        Dropout sites (reference semantics):
        - between the layers: honors ``training`` (``models.py:65-66``);
        - on the aggregation masks: the reference applies it even in eval
          (N2) — reproduced only when ``parity_eval_dropout=True`` and an
          ``rng`` is given; otherwise active in training only.
        """
        feat_rng = mask_rng = None
        if rng is not None:
            feat_rng, mask_rng = jax.random.split(rng)
        h = jax.nn.relu(
            self.gc1.apply(
                params["gc1"], x, graph, use_pallas=use_pallas, axis_name=axis_name
            )
        )
        h = dropout(feat_rng if training else None, h, self.dropout_rate)
        mask_dropout_on = training or parity_eval_dropout
        out = self.mma.apply(
            params["mma"],
            h,
            graph,
            rng=mask_rng if mask_dropout_on else None,
            use_pallas=use_pallas,
            axis_name=axis_name,
        )
        return jax.nn.log_softmax(out, axis=-1)
