"""Parameter initializers matching the reference's conventions.

The reference mixes three uniform-fan conventions (SURVEY §7 step 3):

- pygcn ``GraphConvolution``: ``stdv = 1/√fan_out`` — ``weight.size(1)``
  (``node_classification/layers.py:32-36``).
- MMA output weight: ``stdv = 1/√fan_in`` — ``weight.size(0)``
  (``layers.py:145``).
- Mask matrices: ``stdv = 1/√fan_out`` — ``size(1)``
  (``layers.py:148-168``).
- torch/PyG Linear: kaiming-uniform with ``a=√5`` ⇒ ``U(±1/√fan_in)`` for
  weight and bias.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def uniform_fan_in(key, shape, dtype=jnp.float32):
    """torch.nn.Linear-style: ``U(±1/√fan_in)`` (fan_in = shape[0] for (in, out))."""
    return uniform(key, shape, 1.0 / math.sqrt(shape[0]), dtype)


def uniform_fan_out(key, shape, dtype=jnp.float32):
    """pygcn-style: ``U(±1/√fan_out)`` (fan_out = shape[-1])."""
    return uniform(key, shape, 1.0 / math.sqrt(shape[-1]), dtype)


def normal(key, shape, dtype=jnp.float32):
    """torch.nn.Embedding default: ``N(0, 1)``."""
    return jax.random.normal(key, shape, dtype)
