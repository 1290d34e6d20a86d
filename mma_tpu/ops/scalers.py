"""PNA-style degree scalers.

Node-classification stack: the reference's three scalers
(``node_classification/scalers.py:22-64``) are *degenerate* at the call
site — ``MMA.forward`` passes the sparse adjacency where a neighbor-list
is expected, every "degree" becomes N, and amplification/attenuation
collapse to exact identity (SURVEY §5 N3). Because the scaler outputs are
concatenated along features and multiplied by a 3×-tiled weight
(``layers.py:856-860``), the whole scaler stage reduces to a scalar factor
``len(scalers)`` in parity mode. In fixed mode the scalers use the true
in-degrees.

Graph-regression scalers (``graph_regression/mma_conv.py:178-196``) use a
training-set degree histogram and concatenate (with the reference's
compounding bug N9); they live in ``mma_tpu.nn.mma_conv`` because their
composition differs.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

SCALER_NAMES = ("identity", "amplification", "attenuation")


def scaler_factors(
    name: str,
    deg: jnp.ndarray,
    node_mask: jnp.ndarray,
    avg_log_deg: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-node scale factor ``(N,)`` for one scaler over true degrees."""
    if name == "identity":
        return jnp.ones_like(deg)
    log_deg = jnp.log(deg + 1.0)
    if avg_log_deg is None:
        denom = jnp.maximum(jnp.sum(node_mask.astype(deg.dtype)), 1.0)
        avg_log_deg = jnp.sum(jnp.where(node_mask, log_deg, 0.0)) / denom
    if name == "amplification":
        return log_deg / avg_log_deg
    if name == "attenuation":
        return avg_log_deg / jnp.maximum(log_deg, 1e-12)
    raise ValueError(f"unknown scaler {name!r}; valid: {SCALER_NAMES}")


def apply_scalers(
    m: jnp.ndarray,
    deg: jnp.ndarray,
    node_mask: jnp.ndarray,
    scalers: Sequence[str] = SCALER_NAMES,
    *,
    parity: bool = True,
    avg_log_deg: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sum of scaled copies of ``m`` (shape ``(N, ...)``).

    The reference concatenates scaler outputs along features and multiplies
    by a weight tiled ``len(scalers)``× along rows (``layers.py:856-860``),
    which is algebraically the *sum* of the scaled copies through the
    un-tiled weight — so this op returns ``Σ_s scale_s ⊙ m`` directly.

    ``parity=True`` replicates N3: every scale ≡ 1 ⇒ ``len(scalers) · m``.

    ``avg_log_deg``: the *global* mean of ``log(deg+1)`` over real nodes.
    Defaults to computing it from ``deg``/``node_mask`` — callers whose
    node arrays are sharded (node-sharded regime) must pass the
    psum-combined global value instead.
    """
    if parity:
        return float(len(scalers)) * m
    total = jnp.zeros_like(m)
    for name in scalers:
        fac = scaler_factors(name, deg, node_mask, avg_log_deg)
        total = total + fac.reshape((-1,) + (1,) * (m.ndim - 1)) * m
    return total
