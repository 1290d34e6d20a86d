"""Sorted segment reductions — the TPU replacement for ``torch_scatter``.

The reference reaches segment reduction through the ``torch_scatter`` CUDA
extension (``graph_regression/mma_conv.py:166``) and through per-node
Python loops (``node_classification/layers.py:205-222``). Here every
reduction is an XLA ``segment_*`` over an edge list sorted by destination
(``indices_are_sorted=True`` lets XLA lower to a scan-style reduce instead
of generic scatter). The fused Pallas path in ``mma_tpu.ops.pallas``
replaces :func:`segment_sum` on the hot paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, *, sorted: bool = True):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted
    )


def segment_max(data, segment_ids, num_segments: int, *, sorted: bool = True):
    """Segment max; empty segments yield the dtype's minimum."""
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted
    )


def segment_min(data, segment_ids, num_segments: int, *, sorted: bool = True):
    return jax.ops.segment_min(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted
    )


def segment_mean(data, segment_ids, num_segments: int, *, sorted: bool = True):
    """Segment mean with empty segments yielding 0 (degree clamped to 1)."""
    total = segment_sum(data, segment_ids, num_segments, sorted=sorted)
    count = segment_sum(
        jnp.ones(data.shape[:1], data.dtype), segment_ids, num_segments, sorted=sorted
    )
    count = jnp.maximum(count, 1.0)
    return total / count.reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_softmax_denom(scores, segment_ids, num_segments: int, *, sorted: bool = True):
    """Per-segment softmax normalizer: returns (max, sum-exp) per segment."""
    seg_max = segment_max(scores, segment_ids, num_segments, sorted=sorted)
    shifted = scores - seg_max[segment_ids]
    seg_sum = segment_sum(jnp.exp(shifted), segment_ids, num_segments, sorted=sorted)
    return seg_max, seg_sum
