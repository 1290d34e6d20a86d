"""ZINC flagship train-step attribution (round 5, VERDICT r4 #1).

Decomposes the ~33.5 ms auto-path train step (bench.bench_zinc_conv
shapes: 1024-molecule batch, min/max, towers=5) into its passes, each
timed with dependency-chained dispatches (the only pattern the async
axon runtime honors — CLAUDE.md). Emits one JSON blob on stdout.

Components:
  step_full        full train step (fwd+bwd+adam)       [bench baseline]
  fwd_eval         model fwd, training=False            [bench fwd]
  fwd_train        model fwd, training=True (dropout+BN batch stats)
  grad_full        value_and_grad only (no optimizer)
  opt_only         adam update + apply_updates on real-shaped grads
  conv_fwd         one MultiMaskConv.apply fwd (training rng on)
  conv_grad        one conv fwd+bwd (sum-loss vjp to x, e, params)
  msg_fwd          _message_parts (p_dst, hg) build fwd
  msg_grad         _message_parts fwd+bwd
  fused_fwd        fused_minmax_edge_program fwd (p_dst, hg inputs)
  fused_grad       fused_minmax_edge_program fwd+bwd
  csc_reduce       fused_segment_sum_csc of an (E, 384) payload
  bn_relu_grad     BatchNorm+ReLU fwd+bwd at (N, 75)
  head_grad        embeddings+pool+MLP fwd+bwd (model minus convs+BN)
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _time_fwd_chained, _time_step_fn
    from mma_tpu.data import load_zinc
    from mma_tpu.models import ZincNet
    from mma_tpu.nn.mma_conv import compute_avg_deg

    res = {"device": str(jax.devices()[0])}

    ds = load_zinc("train", subset_size=1024)
    avg = compute_avg_deg(jnp.asarray(ds.degree_histogram()), parity=True)
    n_need = int(ds.num_nodes.sum()) + 1
    e_need = int(sum(len(s_) for s_ in ds.edge_src))
    batch = next(
        ds.batches(
            1024,
            n_node=-(-n_need // 1024) * 1024,
            n_edge=-(-e_need // 1024) * 1024,
        )
    )
    g = batch.graph
    res["n_node_pad"], res["n_edge_pad"] = g.n_node, g.n_edge
    res["n_edge_real"] = int(np.asarray(g.num_edges))

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

    # ---- full step / fwd / grad / opt ---------------------------------
    @jax.jit
    def step(p, o, s, b):
        def loss(pp):
            pred, s2 = model.apply(
                pp, s, b, training=True, rng=rng, use_pallas=True
            )
            err = jnp.abs(pred - b.target.reshape(-1)) * b.graph_mask
            return err.sum() / jnp.maximum(b.graph_mask.sum(), 1.0), s2

        (l, s2), gr = jax.value_and_grad(loss, has_aux=True)(p)
        u, o2 = opt.update(gr, o, p)
        return optax.apply_updates(p, u), o2, s2

    put("step_full", _time_step_fn(step, params, opt_state, state, batch,
                                   iters=12))

    def chain_params(p, carry):
        return jax.tree.map(
            lambda t: t + carry * 0
            if jnp.issubdtype(t.dtype, jnp.floating) else t, p
        )

    @jax.jit
    def fwd_eval(carry, p):
        pred, _ = model.apply(chain_params(p, carry), state, batch,
                              training=False, use_pallas=True)
        return (carry + jnp.sum(pred) * 1e-30,)

    put("fwd_eval", _time_step_fn(fwd_eval, jnp.zeros(()), params,
                                  iters=15, n_state=1))

    @jax.jit
    def fwd_train(carry, p):
        pred, _ = model.apply(chain_params(p, carry), state, batch,
                              training=True, rng=rng, use_pallas=True)
        return (carry + jnp.sum(pred) * 1e-30,)

    put("fwd_train", _time_step_fn(fwd_train, jnp.zeros(()), params,
                                   iters=15, n_state=1))

    @jax.jit
    def grad_only(p):
        def loss(pp):
            pred, s2 = model.apply(pp, state, batch, training=True,
                                   rng=rng, use_pallas=True)
            err = jnp.abs(pred - batch.target.reshape(-1)) * batch.graph_mask
            return err.sum() / jnp.maximum(batch.graph_mask.sum(), 1.0), s2

        (_, _), gr = jax.value_and_grad(loss, has_aux=True)(p)
        # chain: params perturbed by their own grads (×0) each iteration
        return (jax.tree.map(lambda t, d: t + d.astype(t.dtype) * 0, p, gr),)

    put("grad_full", _time_step_fn(grad_only, params, iters=12, n_state=1))

    @jax.jit
    def opt_only(p, o):
        gr = jax.tree.map(lambda t: t * 1e-6, p)
        u, o2 = opt.update(gr, o, p)
        return optax.apply_updates(p, u), o2

    put("opt_only", _time_step_fn(opt_only, params, opt_state, iters=15))

    # ---- one conv layer ----------------------------------------------
    conv = model.conv
    cparams = params["conv0"]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(g.n_node, 75).astype(np.float32))
    e_attr = jnp.asarray(rs.randn(g.n_edge, 50).astype(np.float32))

    @jax.jit
    def conv_fwd(carry, cp):
        out = conv.apply(chain_params(cp, carry), x, g, edge_attr=e_attr,
                         rng=rng, use_pallas=True)
        return (carry + jnp.sum(out) * 1e-30,)

    put("conv_fwd", _time_step_fn(conv_fwd, jnp.zeros(()), cparams,
                                  iters=15, n_state=1))

    @jax.jit
    def conv_grad(cp):
        def loss(cp_, x_, e_):
            return jnp.sum(
                conv.apply(cp_, x_, g, edge_attr=e_, rng=rng,
                           use_pallas=True)
            )

        gr = jax.grad(loss, argnums=(0, 1, 2))(cp, x, e_attr)
        return (jax.tree.map(lambda t, d: t + d.astype(t.dtype) * 0, cp, gr[0]),)

    put("conv_grad", _time_step_fn(conv_grad, cparams, iters=12, n_state=1))

    # ---- message build ------------------------------------------------
    from mma_tpu.autotune import resolve_compute_dtype
    cdt = jnp.dtype(resolve_compute_dtype("auto"))
    x_flat = jnp.tile(x, (1, 5))
    pre_last = cparams["pre_nns"][-1]

    @jax.jit
    def msg_fwd(carry, x_):
        p_dst, hg = conv._message_parts(
            pre_last, x_ + carry * 0, e_attr.astype(cdt), g
        )
        return (carry + (jnp.sum(p_dst) + jnp.sum(hg)).astype(jnp.float32)
                * 1e-30,)

    put("msg_fwd", _time_step_fn(msg_fwd, jnp.zeros(()), x_flat,
                                 iters=15, n_state=1))

    @jax.jit
    def msg_grad(x_):
        def loss(x__, e__):
            p_dst, hg = conv._message_parts(pre_last, x__, e__, g)
            return (jnp.sum(p_dst) + jnp.sum(hg)).astype(jnp.float32)

        dx, de = jax.grad(loss, argnums=(0, 1))(x_, e_attr)
        return (x_ + dx * 0,)

    put("msg_grad", _time_step_fn(msg_grad, x_flat, iters=15, n_state=1))

    # ---- fused kernel unit -------------------------------------------
    from mma_tpu.ops.pallas.segment_minmax import fused_minmax_edge_program

    p_dst0, hg0 = jax.jit(
        lambda: conv._message_parts(pre_last, x_flat, e_attr.astype(cdt), g)
    )()
    seed = jnp.zeros(1, jnp.int32) + 3

    @jax.jit
    def fused_fwd(carry, c_, hg_):
        out = fused_minmax_edge_program(
            c_ + carry.astype(c_.dtype) * 0, hg_, g, ("min", "max"),
            seed=seed, rate=0.5, max_run=4,
        )
        return (carry + jnp.sum(out).astype(jnp.float32) * 1e-30,)

    put("fused_fwd", _time_step_fn(fused_fwd, jnp.zeros(()), p_dst0, hg0,
                                   iters=15, n_state=1))

    @jax.jit
    def fused_grad(c_, hg_):
        def loss(c__, hg__):
            return jnp.sum(
                fused_minmax_edge_program(
                    c__, hg__, g, ("min", "max"), seed=seed, rate=0.5,
                    max_run=4,
                )
            ).astype(jnp.float32)

        dc, dhg = jax.grad(loss, argnums=(0, 1))(c_, hg_)
        return c_ + dc * 0, hg_ + dhg * 0

    put("fused_grad", _time_step_fn(fused_grad, p_dst0, hg0, iters=12))

    # ---- CSC src reduce (the backward's src-keyed half) ---------------
    from mma_tpu.ops.pallas.fused_mma import fused_segment_sum_csc

    payload = jnp.asarray(
        rs.randn(g.n_edge, 384).astype(np.float32)
    ).astype(cdt)

    @jax.jit
    def csc_reduce(carry, pl):
        out = fused_segment_sum_csc(pl + carry.astype(pl.dtype) * 0, g)
        return (carry + jnp.sum(out).astype(jnp.float32) * 1e-30,)

    put("csc_reduce", _time_step_fn(csc_reduce, jnp.zeros(()), payload,
                                    iters=15, n_state=1))

    # ---- BN + ReLU ----------------------------------------------------
    bn = model.bn
    bnp, bns = params["bn0"], state["bn0"]

    @jax.jit
    def bn_relu_grad(x_):
        def loss(x__):
            h, _ = bn.apply(bnp, bns, x__, mask=g.node_mask, training=True)
            return jnp.sum(jax.nn.relu(h))

        dx = jax.grad(loss)(x_)
        return (x_ + dx * 0,)

    put("bn_relu_grad", _time_step_fn(bn_relu_grad, x, iters=15, n_state=1))

    # ---- head (emb + pool + MLP) --------------------------------------
    from mma_tpu.ops.segment import segment_sum

    @jax.jit
    def head_grad(p):
        def loss(pp):
            xh = model.node_emb.apply(pp["node_emb"],
                                      batch.node_feat.reshape(-1))
            eh = model.edge_emb.apply(pp["edge_emb"],
                                      batch.edge_feat.reshape(-1))
            xh = xh + jnp.sum(eh) * 0  # keep both in the graph
            xh = jnp.where(g.node_mask[:, None], xh, 0.0)
            pooled = segment_sum(xh, batch.node_to_graph, batch.n_graph,
                                 sorted=True)
            return jnp.sum(model.mlp.apply(pp["mlp"], pooled))

        gr = jax.grad(loss)(p)
        return (jax.tree.map(lambda t, d: t + d.astype(t.dtype) * 0, p, gr),)

    put("head_grad", _time_step_fn(head_grad, params, iters=15, n_state=1))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
