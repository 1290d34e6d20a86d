"""ZINC exact-path iteration g: donation + flat adam + post-knockout.

Standalone unit timings carry a ~2-3 ms chained-dispatch latency floor
on the tunneled runtime, so attribution here uses whole-step variants:

  step_exact       full train step on the degree-exact batch (baseline)
  step_nodrop      same, rng=None (N2 dropout knocked out fwd+bwd)
  grad_head        grads wrt MLP head params only (backward stops at
                   pooling — measures fwd + head backward)
  grad_conv3       grads wrt the LAST conv's params only (one conv
                   backward in context, no chain through earlier convs)
  grad_conv03      grads wrt conv0's params (chains through all convs)
  step_nosrcbwd    full step with gather_by_src's backward knocked out
                   (stop_gradient on the src projection — removes the
                   permute + slot-sum src reduce and dW_src chain)
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _time_step_fn
    from mma_tpu.data import load_zinc
    from mma_tpu.data.batching import batch_graphs, degree_budgets
    from mma_tpu.models import ZincNet
    from mma_tpu.nn.mma_conv import compute_avg_deg

    res = {"device": str(jax.devices()[0])}

    ds = load_zinc("train", subset_size=1024)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    n_need = int(ds.num_nodes.sum()) + 1
    e_need = int(sum(len(s_) for s_ in ds.edge_src))
    n_node = -(-n_need // 1024) * 1024
    n_edge = -(-e_need // 1024) * 1024
    budgets = degree_budgets(
        [int(n) for n in ds.num_nodes], ds.edge_src, ds.edge_dst, 1024,
        margin=0.0,
    )
    exact = batch_graphs(
        [int(n) for n in ds.num_nodes],
        list(ds.edge_src), list(ds.edge_dst),
        n_graph=1024, n_node=n_node, n_edge=n_edge,
        node_feats=list(ds.node_types), edge_feats=list(ds.edge_types),
        targets=[np.array([y], np.float32).reshape(1) for y in ds.y],
        ell_degree_budgets=budgets,
    )
    res["csc_ell_exact"] = exact.graph.csc_ell_exact

    model = ZincNet(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        avg_deg=tuple(avg.items()),
        towers=5,
        max_degree_hint=4,
        compute_dtype="auto",
    )
    params = model.init(jax.random.PRNGKey(0))
    state = model.init_state()
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(7)

    def put(name, dt):
        res[name] = dt
        print(f"{name}: {dt * 1e3:.3f} ms", file=sys.stderr, flush=True)

    def make_step(use_rng=True):
        @jax.jit
        def step(p, o, s, b):
            def loss(pp):
                pred, s2 = model.apply(
                    pp, s, b, training=True,
                    rng=rng if use_rng else None, use_pallas=True,
                )
                err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
                return err.sum() / jnp.maximum(b.graph_mask.sum(), 1.0), s2

            (l, s2), gr = jax.value_and_grad(loss, has_aux=True)(p)
            u, o2 = opt.update(gr, o, p)
            return optax.apply_updates(p, u), o2, s2

        return step

    import functools

    fopt = optax.flatten(optax.adam(1e-3))
    fopt_state = fopt.init(params)

    @jax.jit
    def step_don(p, o, s, b):
        def loss(pp):
            pred, s2 = model.apply(pp, s, b, training=True, rng=rng,
                                   use_pallas=True)
            err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
            return err.sum() / jnp.maximum(b.graph_mask.sum(), 1.0), s2

        (l, s2), gr = jax.value_and_grad(loss, has_aux=True)(p)
        u, o2 = fopt.update(gr, o, p)
        return optax.apply_updates(p, u), o2, s2

    pass  # donation incompatible with the warmup re-feed; skipped

    # Post-NN knockout: collapse _post to a cheap mean over reds so the
    # scaled-concat + tower matmuls drop out of fwd AND bwd — bounds the
    # post stage's in-context share.
    import mma_tpu.nn.mma_conv as conv_mod
    orig_post = conv_mod.MultiMaskConv._post

    def cheap_post(self, params, x_flat, reds, deg):
        acc = x_flat.astype(jnp.float32)
        for r_ in reds:
            acc = acc + r_.astype(jnp.float32)
        lin_w = params["lin"]["w"]
        f_out = lin_w.shape[1]
        return acc[:, :f_out] * 1.0

    conv_mod.MultiMaskConv._post = cheap_post
    try:
        @jax.jit
        def step_nopost(p, o, s, b):
            def loss(pp):
                pred, s2 = model.apply(pp, s, b, training=True, rng=rng,
                                       use_pallas=True)
                err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
                return err.sum() / jnp.maximum(b.graph_mask.sum(), 1.0), s2

            (l, s2), gr = jax.value_and_grad(loss, has_aux=True)(p)
            u, o2 = fopt.update(gr, o, p)
            return optax.apply_updates(p, u), o2, s2

        put("step_nopost", _time_step_fn(step_nopost, params, fopt_state,
                                         state, exact, iters=12))
    finally:
        conv_mod.MultiMaskConv._post = orig_post

    print(json.dumps(res))


if __name__ == "__main__":
    main()
