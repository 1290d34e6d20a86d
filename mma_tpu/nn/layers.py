"""Basic dense building blocks (functional: params are nested dicts).

Modules hold only static hyperparameters; ``init(key)`` returns a params
pytree and ``apply(params, ...)`` is pure. Stateful modules (BatchNorm)
thread their running statistics explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mma_tpu.nn import init as inits


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout; identity when ``rng is None`` or ``rate == 0``.

    The always-on dropout quirk of the reference (SURVEY §5 N2 —
    ``F.dropout`` without ``training=`` in every aggregator and in
    ``message``) is reproduced by callers passing an rng even in eval.
    """
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


@dataclasses.dataclass(frozen=True)
class Dense:
    """torch/PyG-Linear-equivalent affine layer (kaiming-uniform init)."""

    in_features: int
    out_features: int
    bias: bool = True

    def init(self, key):
        wk, bk = jax.random.split(key)
        params = {"w": inits.uniform_fan_in(wk, (self.in_features, self.out_features))}
        if self.bias:
            params["b"] = inits.uniform(bk, (self.out_features,), (self.in_features) ** -0.5)
        return params

    def apply(self, params, x):
        y = x @ params["w"]
        if self.bias:
            y = y + params["b"]
        return y


@dataclasses.dataclass(frozen=True)
class Embedding:
    """Lookup table, ``N(0,1)`` init (torch.nn.Embedding default)."""

    num_embeddings: int
    features: int

    def init(self, key):
        return {"table": inits.normal(key, (self.num_embeddings, self.features))}

    def apply(self, params, idx):
        return params["table"][idx]


@dataclasses.dataclass(frozen=True)
class BatchNorm:
    """BatchNorm1d over masked node sets (torch defaults: eps 1e-5, momentum 0.1).

    ``apply`` takes and returns running-stat state; padding rows are
    excluded from batch statistics via ``mask``.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    def init(self, key):
        del key
        return {
            "scale": jnp.ones((self.features,)),
            "bias": jnp.zeros((self.features,)),
        }

    def init_state(self):
        return {
            "mean": jnp.zeros((self.features,)),
            "var": jnp.ones((self.features,)),
        }

    def apply(self, params, state, x, *, mask=None, training: bool):
        if training:
            if mask is None:
                count = float(x.shape[0])
                mean = jnp.mean(x, axis=0)
                var = jnp.mean((x - mean) ** 2, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / count
                var = jnp.sum(((x - mean) ** 2) * m, axis=0) / count
            # torch tracks *unbiased* variance in running stats.
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * params["scale"] + params["bias"], new_state


@dataclasses.dataclass(frozen=True)
class MLP:
    """ReLU MLP: Dense(relu)... Dense — the reference's ``Sequential`` heads."""

    sizes: Sequence[int]  # e.g. (75, 50, 25, 1)

    def __post_init__(self):
        assert len(self.sizes) >= 2

    @property
    def _layers(self):
        return [
            Dense(self.sizes[i], self.sizes[i + 1]) for i in range(len(self.sizes) - 1)
        ]

    def init(self, key):
        keys = jax.random.split(key, len(self.sizes) - 1)
        return {f"layer{i}": l.init(k) for i, (l, k) in enumerate(zip(self._layers, keys))}

    def apply(self, params, x):
        layers = self._layers
        for i, l in enumerate(layers):
            x = l.apply(params[f"layer{i}"], x)
            if i + 1 < len(layers):
                x = jax.nn.relu(x)
        return x
