"""VERDICT r3 #8 probe: can the Pallas (use_pallas=True) eval forward be
jax.export-serialized for SAME-platform TPU serving (custom calls and
all), round-tripped, and executed?  Run on the TPU host."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from mma_tpu.data import load_planetoid
    from mma_tpu.models import NodeClassifier
    from mma_tpu.serve import export_node_classifier, load_forward

    data = load_planetoid("cora")
    model = NodeClassifier(
        n_feat=data.features.shape[1], n_hidden=64,
        n_class=int(np.asarray(data.labels).max()) + 1,
        aggregators=("mean", "mean2"),
    )
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(data.features)

    ref = model.apply(params, x, data.graph, training=False, use_pallas=True)
    print("direct pallas forward ok", flush=True)

    blob = export_node_classifier(
        model, params, x, data.graph, use_pallas=True, platforms=("tpu",)
    )
    print(f"export ok: {len(blob)} bytes", flush=True)

    fn = load_forward(blob)
    out = fn(params, x, data.graph)
    diff = float(jnp.abs(out - ref).max())
    print(f"round-trip ok, max diff vs direct: {diff:.3e}", flush=True)
    assert diff < 1e-5


if __name__ == "__main__":
    main()
