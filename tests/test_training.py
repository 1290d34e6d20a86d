"""Training-harness tests: optimizer parity vs torch Adam, scheduler
semantics, quick end-to-end quality on Cora, ZINC loss descent,
checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mma_tpu.train import (
    NodeClassificationConfig,
    ZincConfig,
    make_optimizer,
    ReduceLROnPlateau,
    train_node_classification,
    train_zinc,
)
from mma_tpu.train.optim import set_learning_rate


def test_adam_l2_matches_torch():
    """N11: torch.optim.Adam(weight_decay) = L2-in-grad, not AdamW."""
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    w0 = rs.randn(5, 3).astype(np.float32)
    grads = [rs.randn(5, 3).astype(np.float32) for _ in range(4)]

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.Adam([tw], lr=0.01, weight_decay=0.1)
    for g in grads:
        tw.grad = torch.tensor(g.copy())
        topt.step()

    opt = make_optimizer(0.01, weight_decay=0.1)
    params = {"w": jnp.asarray(w0)}
    st = opt.init(params)
    for g in grads:
        upd, st = opt.update({"w": jnp.asarray(g)}, st, params)
        params = optax.apply_updates(params, upd)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, min_lr=0.1)
    assert s.step(1.0) == 1.0  # improvement (vs inf)
    assert s.step(1.0) == 1.0  # bad 1
    assert s.step(1.0) == 1.0  # bad 2 (= patience)
    assert s.step(1.0) == 0.5  # bad 3 > patience → reduce
    assert s.step(0.5) == 0.5  # improvement resets
    for _ in range(3):
        s.step(0.5)
    for _ in range(8):
        s.step(0.5)
    assert s.lr >= 0.1  # min_lr floor


def test_set_learning_rate_changes_updates():
    opt = make_optimizer(0.1)
    p = {"w": jnp.ones(3)}
    st = opt.init(p)
    g = {"w": jnp.ones(3)}
    u1, st1 = opt.update(g, st, p)
    st = set_learning_rate(st, 0.0)
    u2, _ = opt.update(g, st, p)
    assert float(jnp.abs(u1["w"]).sum()) > 0
    np.testing.assert_allclose(np.asarray(u2["w"]), 0.0, atol=1e-12)


@pytest.mark.slow
def test_cora_quick_accuracy():
    cfg = NodeClassificationConfig(
        dataset="cora", aggregators=("mean", "mean2"), hidden=64,
        lr=0.01, weight_decay=3e-4, dropout=0.5, epochs=40,
    )
    res = train_node_classification(cfg)
    assert res["acc_test"] > 0.78, res["acc_test"]


@pytest.mark.slow
def test_zinc_quick_loss_decrease():
    cfg = ZincConfig(
        aggregators=("min", "max"),
        scalers=("identity", "amplification", "linear"),
        towers=5, epochs=3, batch_size=32, subset_size=160, lr=1e-3,
    )
    res = train_zinc(cfg)
    losses = [h["loss"] for h in res["history"]]
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tmp_path):
    from mma_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    payload = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "epoch": jnp.asarray(7),
    }
    save_checkpoint(str(tmp_path), 7, payload)
    step, restored = restore_checkpoint(str(tmp_path))
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(payload["params"]["w"])
    )


def test_node_cls_resume_from_checkpoint(tmp_path):
    """Crash/restart: resumed training continues from the saved epoch and
    finishes with finite metrics (SURVEY §5.3/5.4 failure recovery)."""
    base = dict(
        dataset="cora", aggregators=("mean",), hidden=8, lr=0.01,
        weight_decay=0.0, dropout=0.0, epochs=4,
        checkpoint_dir=str(tmp_path), checkpoint_every=2,
    )
    r1 = train_node_classification(NodeClassificationConfig(**base))
    # simulate restart: same config with resume → starts at epoch 4 (done)
    r2 = train_node_classification(NodeClassificationConfig(**base, resume=True))
    assert len(r2["history"]) == 0  # nothing left to train
    # extend epochs: resumes from 4 and trains 2 more
    r3 = train_node_classification(
        NodeClassificationConfig(**{**base, "epochs": 6}, resume=True)
    )
    assert [h["epoch"] for h in r3["history"]] == [5, 6]
    assert np.isfinite(r3["acc_test"])


class TestResilience:
    """SURVEY §5.3: failure detection + checkpoint-restart with fault
    injection (the reference loses the run on any crash)."""

    def _setup(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        import optax

        rs = np.random.RandomState(0)
        w0 = jnp.asarray(rs.randn(8, 4).astype(np.float32))
        opt = optax.adam(1e-2)
        batches = [jnp.asarray(rs.randn(16, 8).astype(np.float32))
                   for _ in range(8)]

        @jax.jit
        def step(state, batch):
            params, opt_state = state
            def loss(p):
                return jnp.mean((batch @ p) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), l

        return step, (w0, opt.init(w0)), batches

    def test_recovers_from_injected_faults(self, tmp_path):
        import numpy as np
        from mma_tpu.train.resilience import ResilientRunner

        step, state0, batches = self._setup()

        visits = {}
        def inject(i):
            visits[i] = visits.get(i, 0) + 1
            if i == 3 and visits[i] <= 2:
                return "injected"  # deterministic bad batch: skipped
            if i == 5 and visits[i] == 1:
                return "injected"  # transient: retried once, succeeds
            return None

        runner = ResilientRunner(
            str(tmp_path / "ckpt"), checkpoint_every=2, max_restarts=5,
            inject_fault=inject,
        )
        final = runner.run(step, state0, batches)
        kinds = [f.kind for f in runner.failures]
        assert len(kinds) == 3  # 2× batch 3, 1× batch 5

        # Equivalence: the recovered run == a clean run over the same
        # batches with the deterministically-bad batch removed.
        clean = ResilientRunner(
            str(tmp_path / "ckpt_clean"), checkpoint_every=0,
        )
        expect = clean.run(
            step, state0, [b for i, b in enumerate(batches) if i != 3]
        )
        np.testing.assert_allclose(
            np.asarray(final[0]), np.asarray(expect[0]), atol=1e-6
        )

    def test_crash_loop_raises(self, tmp_path):
        import pytest
        from mma_tpu.train.resilience import ResilientRunner

        step, state0, batches = self._setup()

        def always_fail(i):
            return "injected" if i >= 1 else None

        runner = ResilientRunner(
            str(tmp_path / "ckpt"), checkpoint_every=1, max_restarts=2,
            inject_fault=always_fail,
        )
        with pytest.raises(RuntimeError, match="max_restarts"):
            runner.run(step, state0, batches)

    def test_resume_from_disk(self, tmp_path):
        import numpy as np
        from mma_tpu.train.resilience import ResilientRunner

        step, state0, batches = self._setup()
        d = str(tmp_path / "ckpt")
        r1 = ResilientRunner(d, checkpoint_every=2)
        r1.run(step, state0, batches[:4])
        # a "new process" resumes from the on-disk checkpoint and
        # finishes the remaining batches
        r2 = ResilientRunner(d, checkpoint_every=2)
        final = r2.run(step, state0, batches)
        clean = ResilientRunner(str(tmp_path / "c2"), checkpoint_every=0)
        expect = clean.run(step, state0, batches)
        np.testing.assert_allclose(
            np.asarray(final[0]), np.asarray(expect[0]), atol=1e-6
        )
