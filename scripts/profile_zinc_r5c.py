"""ZINC unit-level attribution, part 2 (see profile_zinc_r5.py).

Times the conv's inner pieces at flagship shapes: message build, fused
min/max edge program, CSC src reduce, BN+ReLU, head. Also times the
degree-EXACT ELL path (round-5 candidate) end to end for comparison:
exact-batch conv fwd / fwd+bwd and full model step on the exact batch.
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
    from mma_tpu.nn.layers import Dense

    res = {"device": str(jax.devices()[0])}

    ds = load_zinc("train", subset_size=1024)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    n_need = int(ds.num_nodes.sum()) + 1
    e_need = int(sum(len(s_) for s_ in ds.edge_src))
    n_node = -(-n_need // 1024) * 1024
    n_edge = -(-e_need // 1024) * 1024
    batch = next(ds.batches(1024, n_node=n_node, n_edge=n_edge))
    g = batch.graph

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
    rng = jax.random.PRNGKey(7)
    conv = model.conv
    cparams = params["conv0"]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(g.n_node, 75).astype(np.float32))
    e_attr = jnp.asarray(rs.randn(g.n_edge, 50).astype(np.float32))

    from mma_tpu.autotune import resolve_compute_dtype
    cdt = jnp.dtype(resolve_compute_dtype("auto"))
    enc = Dense(50, 75)
    e75 = jax.jit(
        lambda: enc.apply(cparams["edge_encoder"], e_attr).astype(cdt)
    )()
    x_flat = jnp.tile(x, (1, 5))
    pre_last = cparams["pre_nns"][-1]

    def put(name, dt):
        res[name] = dt
        print(f"{name}: {dt * 1e3:.3f} ms", file=sys.stderr, flush=True)

    # ---- degree-exact ELL path ---------------------------------------
    budgets = degree_budgets(
        [int(n) for n in ds.num_nodes], ds.edge_src, ds.edge_dst, 1024,
        margin=0.0,
    )
    res["budgets"] = list(budgets)
    exact = batch_graphs(
        [int(n) for n in ds.num_nodes],
        list(ds.edge_src), list(ds.edge_dst),
        n_graph=1024, n_node=n_node, n_edge=n_edge,
        node_feats=list(ds.node_types), edge_feats=list(ds.edge_types),
        targets=[np.array([y], np.float32).reshape(1) for y in ds.y],
        ell_degree_budgets=budgets,
    )
    ge = exact.graph
    res["exact_slot_total"] = sum(
        (b - s) * w for (s, b, w) in zip(
            (0,) + tuple(b for b, _ in ge.ell_hint)[:-1],
            (b for b, _ in ge.ell_hint),
            (w for _, w in ge.ell_hint),
        )
    )

    @jax.jit
    def conv_fwd_exact(carry, cp):
        cp = jax.tree.map(
            lambda t: t + carry * 0
            if jnp.issubdtype(t.dtype, jnp.floating) else t, cp
        )
        out = conv.apply(cp, x, ge, edge_attr=e_attr, rng=rng,
                         use_pallas=True)
        return (carry + jnp.sum(out) * 1e-30,)

    put("conv_fwd_exact", _time_step_fn(conv_fwd_exact, jnp.zeros(()),
                                        cparams, iters=15, n_state=1))

    @jax.jit
    def conv_grad_exact(cp):
        def loss(cp_, x_, e_):
            return jnp.sum(
                conv.apply(cp_, x_, ge, edge_attr=e_, rng=rng,
                           use_pallas=True)
            )

        gr = jax.grad(loss, argnums=(0, 1, 2))(cp, x, e_attr)
        return (jax.tree.map(lambda t, d: t + d.astype(t.dtype) * 0,
                             cp, gr[0]),)

    put("conv_grad_exact", _time_step_fn(conv_grad_exact, cparams,
                                         iters=12, n_state=1))

    # ---- full model on the exact batch -------------------------------
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step_exact(p, o, s, b):
        def loss(pp):
            pred, s2 = model.apply(
                pp, s, b, training=True, rng=rng, use_pallas=True
            )
            err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
            return err.sum() / jnp.maximum(b.graph_mask.sum(), 1.0), s2

        (l, s2), gr = jax.value_and_grad(loss, has_aux=True)(p)
        u, o2 = opt.update(gr, o, p)
        return optax.apply_updates(p, u), o2, s2

    put("step_exact", _time_step_fn(step_exact, params, opt_state, state,
                                    exact, iters=12))

    @jax.jit
    def fwd_exact(carry, p):
        p = jax.tree.map(
            lambda t: t + carry * 0
            if jnp.issubdtype(t.dtype, jnp.floating) else t, p
        )
        pred, _ = model.apply(p, state, exact, training=False,
                              use_pallas=True)
        return (carry + jnp.sum(pred) * 1e-30,)

    put("fwd_exact", _time_step_fn(fwd_exact, jnp.zeros(()), params,
                                   iters=15, n_state=1))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
