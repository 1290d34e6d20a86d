"""Serving/inference export: portable, ahead-of-time-compiled forwards.

The reference has no serving story (training scripts print metrics and
exit — ``node_classification/train.py:104-116``). For deployment we
export a jitted eval-mode forward to the stable serialized form
(`jax.export` / StableHLO): the artifact is loadable in a fresh process
with no model code or Python class definitions, and runs under the
compilation cache of whatever host loads it.

Conventions:

- Exports are **eval-mode and deterministic** (no dropout; the
  reference's always-on eval dropout, SURVEY §5 N2, is a training-parity
  concern and is excluded from serving).
- The graph/batch is an *argument* of the exported function, so one
  artifact serves any same-shape (padded) graph — pair with the static
  padding policy of ``mma_tpu.graph.build`` / ``mma_tpu.data.batching``.
- ``platforms`` defaults to the current backend; pass
  ``("tpu", "cpu")`` to cross-lower (requires the XLA-only op paths:
  ``use_pallas=False``; Pallas kernels embed TPU custom calls that do
  not cross-lower).
- **Same-platform Pallas export works**: ``use_pallas=True`` with
  ``platforms=("tpu",)`` serializes the fused-kernel forward (the
  Mosaic custom calls ride along) — verified on TPU v5e: a 46 kB Cora
  NodeClassifier artifact round-trips and matches the direct forward
  bit-exactly (``scripts/export_pallas_probe.py``). Served TPU
  artifacts therefore run the fast kernel path, not the ~2-4× slower
  XLA fallback.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional, Sequence

import jax

_REGISTERED = False


def _register_container_serialization():
    """Register the framework's pytree containers with jax.export.

    The exported calling convention embeds the argument treedefs;
    custom nodes (Graph, BatchedGraphs) need a registered auxdata codec.
    Auxdata is JSON (Graph's aux is ``(chunk_hint,)`` — a small tuple of
    ints or None; BatchedGraphs has none) so artifacts stay inspectable
    and deserialization never executes pickled code.
    """
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from mma_tpu.graph.container import BatchedGraphs, Graph

    def _ser(aux) -> bytes:
        return json.dumps(aux).encode()

    def _de(data: bytes):
        def tup(x):
            return tuple(tup(v) for v in x) if isinstance(x, list) else x

        return tup(json.loads(bytes(data).decode()))

    for cls, name in ((Graph, "mma_tpu.Graph"),
                      (BatchedGraphs, "mma_tpu.BatchedGraphs")):
        jexport.register_pytree_node_serialization(
            cls, serialized_name=name,
            serialize_auxdata=_ser, deserialize_auxdata=_de,
        )
    _REGISTERED = True


def export_forward(
    fn: Callable,
    example_args: Sequence[Any],
    *,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``jit(fn)`` specialized to ``example_args``' shapes.

    ``example_args`` may be concrete arrays or ``jax.ShapeDtypeStruct``
    pytrees; only shapes/dtypes (and static pytree structure) are baked
    into the artifact.
    """
    from jax import export as jexport

    _register_container_serialization()
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(*example_args)
    return bytes(exported.serialize())


def load_forward(blob: bytes) -> Callable:
    """Deserialize an ``export_forward`` artifact into a callable.

    The callable takes the same argument pytrees the export was built
    with and runs jitted on the local backend.
    """
    from jax import export as jexport

    _register_container_serialization()
    exported = jexport.deserialize(blob)
    return jax.jit(exported.call)


def export_node_classifier(
    model,
    params,
    x,
    graph,
    *,
    use_pallas: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Export the node-classification eval forward → per-node log-probs.

    The exported signature is ``(params, x, graph) -> (N_pad, n_class)``;
    any graph padded to the same (n_node, n_edge) static shape works.
    """

    def forward(p, x_, g):
        return model.apply(p, x_, g, training=False, use_pallas=use_pallas)

    return export_forward(forward, (params, x, graph), platforms=platforms)


def export_zinc_predictor(
    model,
    params,
    state,
    batch,
    *,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Export the ZINC regression eval forward → per-graph predictions.

    Signature: ``(params, state, batch) -> (n_graphs,)``; any batch
    padded to the same static (n_node, n_edge, n_graphs) works.
    """

    def forward(p, s, b):
        pred, _ = model.apply(p, s, b, training=False)
        return pred

    return export_forward(forward, (params, state, batch), platforms=platforms)
