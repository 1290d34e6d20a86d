"""Aggregator semantics table for the node-classification MMA layer.

The reference implements 21 ``learnable_*`` aggregator methods as separate
per-node Python loops (``node_classification/layers.py:80-100`` registry,
bodies at ``:201-851``). Inspecting them shows every usable aggregator is
the same computation — a masked segment-**sum** over neighbors — differing
only in three knobs, so here the aggregators are *data* (one spec each),
not code forks:

1. ``combine`` — how the masked neighbor sum ``S_i`` meets the center
   feature ``h_i``:

   - ``sum``:  ``h_i + S_i``                    (``layers.py:221``)
   - ``mean``: ``(h_i + S_i) / deg_i``          (``layers.py:326-329``)
   - ``max``:  ``max(h_i, S_i)`` elementwise    (``layers.py:452``)
   - ``min``:  ``min(h_i, S_i)`` elementwise    (``layers.py:562``)
   - ``passthrough``: ``S_i`` — the reference's softmax/softmin collapse
     to the bare masked sum because their softmax runs over a singleton
     dimension (``layers.py:676-685, 716-720``; SURVEY §7).

   Note the reference's "max"/"min" never reduce over neighbors with
   max/min — the neighbor reduction is *always* a sum; max/min only enter
   via the center combine.

2. ``sigmoid_under_new_sigmoid`` — the reference's default activation flag
   is ``new_sigmoid`` (``train.py:34``), whose branch *discards its
   result* in seven aggregators, leaving the raw linear logits as the mask
   (``layers.py:381-383, 445-447, 555-557, 668-670, 708-710, 748-750,
   790-792``; SURVEY §5 N1). All other aggregators apply a plain sigmoid
   unconditionally. With ``parity=False`` sigmoid is always applied.

3. ``reference_usable`` — ``std`` / ``normalized_mean`` / ``moment_3``
   crash in the reference (undefined names, shape mismatches —
   ``layers.py:762-770, 805-811, 842-847``; SURVEY §5 N5). They exist
   here only in fixed (non-parity) form.

Fixed-mode semantics for the broken three: ``std`` = masked standard
deviation of neighbor messages, ``normalized_mean`` = masked sum scaled by
``deg^-1/2`` (symmetric-normalization analog), ``moment_3`` = signed cube
root of the masked third central moment — the PNA-style intent.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Aggregators whose `new_sigmoid` branch discards the activation (mask =
# raw logits) in the reference — SURVEY §5 N1, verified per-line.
_RAW_LOGITS_UNDER_NEW_SIGMOID = frozenset(
    {"mean3", "max", "min", "softmax", "softmin", "std", "normalized_mean"}
)

_BROKEN_IN_REFERENCE = frozenset({"std", "normalized_mean", "moment_3"})


@dataclasses.dataclass(frozen=True)
class AggSpec:
    name: str
    combine: str  # sum | mean | max | min | passthrough | std | normalized_mean | moment_3
    sigmoid_under_new_sigmoid: bool
    reference_usable: bool

    def applies_sigmoid(self, activation: str, parity: bool) -> bool:
        """Whether σ is applied to the mask logits for this aggregator."""
        if not parity:
            return True
        if activation == "new_sigmoid":
            return self.sigmoid_under_new_sigmoid
        return True


def _combine_of(name: str) -> str:
    for family in ("sum", "mean", "max", "min"):
        if name in (family, family + "2", family + "3", family + "4"):
            return family
    if name in ("softmax", "softmin"):
        return "passthrough"
    return name  # std, normalized_mean, moment_3


NODE_CLS_AGGREGATOR_NAMES: Tuple[str, ...] = (
    "moment_3",
    "sum", "sum2", "sum3", "sum4",
    "mean", "mean2", "mean3", "mean4",
    "max", "max2", "max3", "max4",
    "min", "min2", "min3", "min4",
    "softmax", "softmin",
    "std", "normalized_mean",
)

NODE_CLS_AGGREGATORS = {
    name: AggSpec(
        name=name,
        combine=_combine_of(name),
        sigmoid_under_new_sigmoid=name not in _RAW_LOGITS_UNDER_NEW_SIGMOID,
        reference_usable=name not in _BROKEN_IN_REFERENCE,
    )
    for name in NODE_CLS_AGGREGATOR_NAMES
}


def get_agg_spec(name: str) -> AggSpec:
    try:
        return NODE_CLS_AGGREGATORS[name]
    except KeyError:
        raise ValueError(
            f"Unknown aggregator {name!r}; valid: {sorted(NODE_CLS_AGGREGATORS)}"
        ) from None
