"""compute_dtype="auto" resolution (mma_tpu.autotune).

The auto mode must be a pure compile-time relabeling: on CPU it resolves
to float32 and produces bit-identical outputs to an explicit float32
config, for both the node-classification layer and the graph-regression
conv. Platform-keyed resolution is tested directly (no TPU needed).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mma_tpu.autotune import choose_blocks, resolve_compute_dtype
from tests.helpers import random_symmetric_graph


def test_resolve_platform_rules():
    assert resolve_compute_dtype("auto", "tpu") == "bfloat16"
    assert resolve_compute_dtype("auto", "cpu") == "float32"
    # Explicit configs pass through untouched, any platform.
    assert resolve_compute_dtype("float32", "tpu") == "float32"
    assert resolve_compute_dtype("bfloat16", "cpu") == "bfloat16"


def test_resolve_defaults_to_live_platform():
    # Tests run on CPU (conftest) — "auto" without an explicit platform
    # must consult the live backend.
    assert resolve_compute_dtype("auto") == "float32"


def test_choose_blocks_valid():
    br, bb = choose_blocks(n_edge=2_097_152, n_node=131_072, lanes=128)
    # block_b must stay a multiple of the MXU sub-chunk width; block_r a
    # multiple of the f32 sublane tile.
    assert bb % 128 == 0 and br % 8 == 0 and br >= 8


def test_mma_layer_auto_matches_f32_on_cpu():
    _, _, g = random_symmetric_graph(48, p=0.15, seed=0)
    h = jnp.asarray(np.random.RandomState(1).randn(g.n_node, 16).astype(np.float32))
    from mma_tpu.nn.mma_layer import MMALayer

    base = dict(in_features=16, out_features=16, aggregators=("mean", "mean2"))
    la = MMALayer(compute_dtype="auto", **base)
    lf = MMALayer(compute_dtype="float32", **base)
    p = la.init(jax.random.PRNGKey(0))
    assert jnp.array_equal(la.apply(p, h, g), lf.apply(p, h, g))


def test_mma_conv_auto_matches_f32_on_cpu():
    _, _, g = random_symmetric_graph(40, p=0.15, seed=2)
    from mma_tpu.nn.mma_conv import MultiMaskConv, compute_avg_deg

    deg_hist = np.bincount(np.asarray(g.deg).astype(int), minlength=4)
    avg = tuple(sorted(compute_avg_deg(jnp.asarray(deg_hist)).items()))
    base = dict(
        in_channels=16, out_channels=16, aggregators=("min", "max"),
        scalers=("identity",), avg_deg=avg,
    )
    ca = MultiMaskConv(compute_dtype="auto", **base)
    cf = MultiMaskConv(compute_dtype="float32", **base)
    p = ca.init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(4).randn(g.n_node, 16).astype(np.float32))
    oa = ca.apply(p, x, g)
    of = cf.apply(p, x, g)
    assert jnp.array_equal(oa, of)
