"""Training loops for both stacks.

Reproduces the reference's training semantics (full-batch transductive
loop ``node_classification/train.py:72-116``; batched L1 regression loop
``graph_regression/mma.py:139-200``) with jit-compiled steps, JSONL
logging, optional orbax checkpointing and deterministic seeding.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mma_tpu.data import load_planetoid, load_zinc
from mma_tpu.models import NodeClassifier, ZincNet
from mma_tpu.nn.mma_conv import compute_avg_deg
from mma_tpu.train import checkpoint as ckpt
from mma_tpu.train.config import NodeClassificationConfig, ZincConfig
from mma_tpu.train.logger import JsonlLogger
from mma_tpu.train.metrics import accuracy
from mma_tpu.train.optim import ReduceLROnPlateau, make_optimizer, set_learning_rate
from mma_tpu.utils.profiling import trace


def _set_matmul_precision(precision):
    if precision:
        jax.config.update("jax_default_matmul_precision", precision)


def train_node_classification(cfg: NodeClassificationConfig, data=None):
    """Full-batch transductive training (train.py:72-116)."""
    _set_matmul_precision(cfg.matmul_precision)
    log = JsonlLogger(cfg.log_path)
    synthetic_features = False
    if data is None:
        synthetic_features = cfg.dataset == "pubmed"
        if synthetic_features:
            # ind.pubmed.allx is absent upstream (SURVEY §6); refuse to let
            # a synthetic-feature accuracy pass silently as a quality number.
            import warnings

            warnings.warn(
                "pubmed features are SYNTHETIC (ind.pubmed.allx missing): "
                "accuracies are structural-benchmarks only, NOT quality "
                "numbers. Results are tagged synthetic_features=True.",
                stacklevel=2,
            )
            log.log(synthetic_features=True)
        data = load_planetoid(cfg.dataset, synthetic_features=synthetic_features)
    graph = data.graph
    x = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    idx_train = jnp.asarray(data.idx_train)
    idx_val = jnp.asarray(data.idx_val)
    idx_test = jnp.asarray(data.idx_test)

    model = NodeClassifier(
        n_feat=data.num_features,
        n_hidden=cfg.hidden,
        n_class=data.num_classes,
        aggregators=cfg.aggregators,
        scalers=cfg.scalers,
        dropout_rate=cfg.dropout,
        activation=cfg.activation,
        sigmoid_k=cfg.sigmoid_k,
        parity=cfg.parity,
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key)
    opt = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)

    start_epoch = 0
    if cfg.resume and cfg.checkpoint_dir:
        step, payload = ckpt.restore_checkpoint(
            cfg.checkpoint_dir,
            target={"params": params, "opt_state": opt_state, "key": key},
        )
        if step is not None:
            params, opt_state, key = (
                payload["params"], payload["opt_state"], payload["key"]
            )
            start_epoch = step
            log.log(resumed_from_epoch=step)

    def nll(logp, idx):
        return -jnp.mean(logp[idx, labels[idx]])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, rng):
        def loss_fn(p):
            logp = model.apply(
                p, x, graph, training=True, rng=rng, use_pallas=cfg.use_pallas
            )
            return nll(logp, idx_train), logp

        (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss, logp

    @jax.jit
    def eval_forward(params, rng):
        return model.apply(
            params,
            x,
            graph,
            training=False,
            rng=rng if cfg.parity_eval_dropout else None,
            parity_eval_dropout=cfg.parity_eval_dropout,
            use_pallas=cfg.use_pallas,
        )

    history = []
    for epoch in range(start_epoch, cfg.epochs):
        t = time.time()
        key, step_key, eval_key = jax.random.split(key, 3)
        with trace("train_step"):
            params, opt_state, loss_train, logp_train = train_step(
                params, opt_state, step_key
            )
        acc_train = accuracy(logp_train[idx_train], labels[idx_train])
        if cfg.fastmode:
            logp = logp_train  # train.py:82-86: reuse the train-mode forward
        else:
            logp = eval_forward(params, eval_key)
        loss_val = nll(logp, idx_val)
        acc_val = accuracy(logp[idx_val], labels[idx_val])
        rec = dict(
            epoch=epoch + 1,
            loss_train=float(loss_train),
            acc_train=float(acc_train),
            loss_val=float(loss_val),
            acc_val=float(acc_val),
            time=time.time() - t,
        )
        history.append(rec)
        log.log(**rec)
        if cfg.checkpoint_dir and cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            ckpt.save_checkpoint(
                cfg.checkpoint_dir,
                epoch + 1,
                {"params": params, "opt_state": opt_state, "key": key},
            )

    key, eval_key = jax.random.split(key)
    logp = eval_forward(params, eval_key)
    results = {
        "loss_test": float(nll(logp, idx_test)),
        "acc_test": float(accuracy(logp[idx_test], labels[idx_test])),
        "history": history,
        "params": params,
        "synthetic_features": synthetic_features,
    }
    log.log(loss_test=results["loss_test"], acc_test=results["acc_test"])
    log.close()
    return results


def train_zinc(cfg: ZincConfig, datasets=None):
    """Batched L1-regression training (mma.py:139-200)."""
    _set_matmul_precision(cfg.matmul_precision)
    log = JsonlLogger(cfg.log_path)
    if datasets is None:
        datasets = {
            split: load_zinc(split, subset_size=cfg.subset_size)
            for split in ("train", "val", "test")
        }
    train_ds, val_ds, test_ds = datasets["train"], datasets["val"], datasets["test"]

    avg_deg = compute_avg_deg(
        jnp.asarray(train_ds.degree_histogram()), parity=cfg.parity
    )
    model = ZincNet(
        aggregators=cfg.aggregators,
        scalers=cfg.scalers,
        avg_deg=tuple(avg_deg.items()),
        num_layers=cfg.num_layers,
        hidden=cfg.hidden,
        edge_hidden=cfg.edge_hidden,
        towers=cfg.towers,
        pre_layers=cfg.pre_layers,
        post_layers=cfg.post_layers,
        mlp_sizes=cfg.mlp_sizes,
        parity=cfg.parity,
        remat=cfg.remat,
        compute_dtype=cfg.compute_dtype,
        edge_format=cfg.edge_format,
        max_degree_hint=cfg.max_degree_hint,
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key)
    state = model.init_state()
    opt = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    sched = ReduceLROnPlateau(
        lr=cfg.lr, factor=cfg.lr_factor, patience=cfg.lr_patience, min_lr=cfg.min_lr
    )

    start_epoch = 0
    if cfg.resume and cfg.checkpoint_dir:
        sched_arr = jnp.asarray([sched.lr, sched.best, float(sched.num_bad)])
        target = {
            "params": params, "state": state, "opt_state": opt_state,
            "key": key, "sched": sched_arr,
        }
        step, payload = ckpt.restore_checkpoint(cfg.checkpoint_dir, target=target)
        if step is not None:
            params, state, opt_state, key = (
                payload["params"], payload["state"], payload["opt_state"], payload["key"]
            )
            s = np.asarray(payload["sched"])
            sched.lr, sched.best, sched.num_bad = float(s[0]), float(s[1]), int(s[2])
            opt_state = set_learning_rate(opt_state, sched.lr)
            start_epoch = step
            log.log(resumed_from_epoch=step)

    # Padding budgets: the tight worst case over any shuffled batch is
    # the sum of the batch_size LARGEST molecules (nodes/edges bounded
    # independently), across all three splits — typically 25-40% below
    # the static per-graph-slot budgets, and kernel grid cost scales
    # with the pad sizes (every row block is a grid step). The config
    # values cap from above (explicit user budgets still honored).
    def _budget(values):
        top = np.sort(np.asarray(values))[::-1][: cfg.batch_size]
        return int(top.sum())

    n_node = 1 + max(
        _budget(d.num_nodes) for d in (train_ds, val_ds, test_ds)
    )
    n_edge = max(
        _budget([len(s) for s in d.edge_src])
        for d in (train_ds, val_ds, test_ds)
    )
    n_node = min(-(-n_node // 256) * 256, cfg.batch_size * cfg.n_node_per_graph)
    n_edge = min(-(-n_edge // 256) * 256, cfg.batch_size * cfg.n_edge_per_graph)

    # Degree-exact ELL collate (round 5): nodes grouped by exact
    # in-degree so slot index == edge index and aggregation is reshapes
    # + lane reduces (``mma_tpu.ops.ell`` exact paths). Budgets use the
    # GUARANTEED worst-case bound (top-batch_size per-graph counts) so
    # no shuffled epoch can overflow them; the pads grow to fit.
    ell_budgets = None
    if cfg.batch_layout == "degree_exact" or (
        cfg.batch_layout == "auto" and cfg.edge_format != "csr"
    ):
        from mma_tpu.data.batching import degree_budgets

        budgets_z = [
            degree_budgets(
                [int(n) for n in d.num_nodes], d.edge_src, d.edge_dst,
                cfg.batch_size, worst_case=True, include_zero=True,
            )
            for d in (train_ds, val_ds, test_ds)
        ]
        w = max(len(b) for b, _ in budgets_z)
        ell_budgets = tuple(
            max(b[i] if i < len(b) else 0 for b, _ in budgets_z)
            for i in range(w)
        )
        zero_worst = max(z for _, z in budgets_z)
        rows = sum(ell_budgets) + zero_worst + 1
        slots = sum(b * (i + 1) for i, b in enumerate(ell_budgets))
        n_node = max(n_node, -(-rows // 256) * 256)
        n_edge = max(n_edge, -(-slots // 256) * 256)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, batch, rng):
        def loss_fn(p):
            pred, new_state = model.apply(
                p, state, batch, training=True, rng=rng, use_pallas=cfg.use_pallas
            )
            gm = batch.graph_mask.astype(pred.dtype)
            err = jnp.abs(pred - batch.target) * gm
            # reference: per-batch mean over the batch's graphs (mma.py:156)
            loss = jnp.sum(err) / jnp.maximum(jnp.sum(gm), 1.0)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, new_opt_state, loss

    @jax.jit
    def eval_step(params, state, batch):
        pred, _ = model.apply(
            params, state, batch, training=False, use_pallas=cfg.use_pallas
        )
        gm = batch.graph_mask.astype(pred.dtype)
        return jnp.sum(jnp.abs(pred - batch.target) * gm), jnp.sum(gm)

    def evaluate(ds):
        tot, cnt = 0.0, 0.0
        for batch in ds.batches(cfg.batch_size, n_node=n_node, n_edge=n_edge,
                                ell_degree_budgets=ell_budgets):
            e, c = eval_step(params, state, batch)
            tot += float(e)
            cnt += float(c)
        return tot / max(cnt, 1.0)

    history = []
    for epoch in range(start_epoch, cfg.epochs):
        t = time.time()
        total_loss, total_graphs = 0.0, 0.0
        for batch in train_ds.batches(
            cfg.batch_size, n_node=n_node, n_edge=n_edge, shuffle=True,
            seed=cfg.seed + epoch, ell_degree_budgets=ell_budgets,
        ):
            key, step_key = jax.random.split(key)
            with trace("train_step"):
                params, state, opt_state, loss = train_step(
                    params, state, opt_state, batch, step_key
                )
            ng = float(np.asarray(batch.num_graphs))
            total_loss += float(loss) * ng
            total_graphs += ng
        val_mae = evaluate(val_ds)
        test_mae = evaluate(test_ds)
        new_lr = sched.step(val_mae)
        opt_state = set_learning_rate(opt_state, new_lr)
        rec = dict(
            epoch=epoch,
            loss=total_loss / max(total_graphs, 1.0),
            val_mae=val_mae,
            test_mae=test_mae,
            lr=new_lr,
            time=time.time() - t,
        )
        history.append(rec)
        log.log(**rec)
        if cfg.checkpoint_dir and cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            ckpt.save_checkpoint(
                cfg.checkpoint_dir,
                epoch + 1,
                {
                    "params": params, "state": state, "opt_state": opt_state,
                    "key": key,
                    "sched": jnp.asarray([sched.lr, sched.best, float(sched.num_bad)]),
                },
            )

    log.close()
    return {
        "history": history,
        "params": params,
        "state": state,
        "val_mae": history[-1]["val_mae"] if history else None,
        "test_mae": history[-1]["test_mae"] if history else None,
    }
