"""Device-mesh helpers.

The reference has no distributed backend at all (SURVEY §2.4); scaling in
this framework is expressed over a named ``jax.sharding.Mesh`` with XLA
collectives riding ICI within a slice / DCN across slices. For multi-host
runs call :func:`initialize_distributed` first (``jax.distributed``), then
build the mesh over the global device set.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """A mesh over all (or the given) devices.

    ``shape`` defaults to all devices along the first axis. For 2-D
    layouts pass e.g. ``axis_names=("data", "edge"), shape=(2, 4)``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def initialize_distributed(**kwargs) -> None:
    """Multi-host process-group init (``jax.distributed.initialize``)."""
    jax.distributed.initialize(**kwargs)
