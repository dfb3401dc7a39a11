"""Training-loop + checkpoint/resume tests (tiny model, CPU)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu import variant_config
from x3d_tpu.models import create_model
from x3d_tpu.train import (
    CheckpointManager,
    create_train_state,
    evaluate,
    fit,
    make_eval_step,
    make_train_step,
)
from x3d_tpu.train.hooks import Hook, LoggingHook


def tiny_cfg():
    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 8
    cfg.NETWORK.DROPOUT_RATE = 0.0
    cfg.TEST.NUM_TEMPORAL_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.TRAIN.EPOCHS = 4
    cfg.TRAIN.WARMUP_EPOCHS = 1
    return cfg


def _batches(n_classes=8):
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (4, 4, 16, 16, 3))
    label = jnp.arange(4) % n_classes
    while True:
        yield {"video": video, "label": label}


class RecorderHook(Hook):
    def __init__(self):
        self.epoch_starts = []
        self.steps = []
        self.epoch_ends = []
        self.ended = False

    def on_epoch_start(self, epoch, lr):
        self.epoch_starts.append((epoch, lr))

    def on_step(self, step, metrics):
        self.steps.append(step)

    def on_epoch_end(self, epoch, state, train_metrics, val_metrics):
        self.epoch_ends.append((epoch, val_metrics))

    def on_train_end(self):
        self.ended = True


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    sample = next(_batches())["video"]
    state = create_train_state(cfg, model, rng, sample, steps_per_epoch=2)
    train_step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    eval_step = jax.jit(make_eval_step(model))
    return dict(cfg=cfg, model=model, state=state, train_step=train_step,
                eval_step=eval_step, rng=rng)


def test_fit_runs_epochs_and_hooks(setup):
    rec = RecorderHook()
    final = fit(
        setup["cfg"], setup["state"], setup["train_step"], _batches(),
        steps_per_epoch=2, epochs=2, rng=setup["rng"],
        eval_step=setup["eval_step"],
        val_batches_fn=lambda: [next(_batches())],
        hooks=[rec, LoggingHook(log_every=1)],
    )
    assert [e for e, _ in rec.epoch_starts] == [0, 1]
    assert rec.steps == [1, 2, 3, 4]
    assert [e for e, _ in rec.epoch_ends] == [1, 2]   # 1-based like ckpt-N
    assert rec.epoch_ends[0][1] is not None           # val ran
    assert rec.ended
    assert int(final.step) == 4


def test_fit_lr_follows_schedule(setup):
    rec = RecorderHook()
    fit(setup["cfg"], setup["state"], setup["train_step"], _batches(),
        steps_per_epoch=1, epochs=3, rng=setup["rng"], hooks=[rec])
    from x3d_tpu.train import lr_for_epoch
    for epoch, lr in rec.epoch_starts:
        np.testing.assert_allclose(lr, float(lr_for_epoch(setup["cfg"], epoch)),
                                   rtol=1e-6)


def test_evaluate_aggregates_exactly(setup):
    batches = [next(_batches()) for _ in range(3)]
    out = evaluate(setup["eval_step"], setup["state"], batches)
    assert out["count"] == 12.0
    assert 0.0 <= out["acc"] <= 1.0
    assert out["top_5_acc"] >= out["acc"]


def test_checkpoint_save_restore_roundtrip(setup, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state, metrics = setup["train_step"](setup["state"], next(_batches()),
                                         setup["rng"])
    mgr.save(1, state)
    assert mgr.latest_epoch() == 1

    fresh = setup["state"]
    restored, epoch = mgr.restore(fresh)
    assert epoch == 1
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(restored.params["fc_2"]["bias"]),
        np.asarray(state.params["fc_2"]["bias"]))
    # optimizer momentum restored too
    leaves_a = jax.tree_util.tree_leaves(restored.opt_state)
    leaves_b = jax.tree_util.tree_leaves(state.opt_state)
    assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))
    mgr.close()


def test_checkpoint_weights_only_keeps_fresh_optimizer(setup, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt2"))
    state, _ = setup["train_step"](setup["state"], next(_batches()),
                                   setup["rng"])
    mgr.save(3, state)

    fresh = setup["state"]
    warm = mgr.restore_weights_only(fresh)
    np.testing.assert_allclose(
        np.asarray(warm.params["fc_2"]["bias"]),
        np.asarray(state.params["fc_2"]["bias"]))
    assert int(warm.step) == int(fresh.step)  # optimizer/step untouched
    mgr.close()


def test_checkpoint_weights_only_optimizer_mismatch_fallback(
        setup, tmp_path, caplog):
    """Warm start into a state built with a DIFFERENT optimizer.

    The templated restore fails on the opt_state tree mismatch; the
    template-free fallback must still recover params/batch_stats — and
    must log the original failure (VERDICT r3: a corrupt checkpoint and a
    slot mismatch were indistinguishable under the old bare except).
    """
    mgr = CheckpointManager(str(tmp_path / "ckpt_mismatch"))
    state, _ = setup["train_step"](setup["state"], next(_batches()),
                                   setup["rng"])
    mgr.save(1, state)

    cfg = tiny_cfg()
    cfg.TRAIN.OPTIMIZER = "adam"          # sgd-nesterov in the checkpoint
    from x3d_tpu.train import create_train_state as _cts
    adam_state = _cts(cfg, setup["model"], setup["rng"],
                      next(_batches())["video"], steps_per_epoch=2)
    with caplog.at_level(logging.WARNING, "x3d_tpu.train.checkpoint"):
        warm = mgr.restore_weights_only(adam_state)
    np.testing.assert_allclose(
        np.asarray(warm.params["fc_2"]["bias"]),
        np.asarray(state.params["fc_2"]["bias"]))
    assert int(warm.step) == 0            # fresh optimizer/step kept
    assert any("Templated checkpoint restore failed" in r.message
               for r in caplog.records)
    mgr.close()


def test_restore_none_when_empty(setup, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    restored, epoch = mgr.restore(setup["state"])
    assert epoch == 0
    assert restored is setup["state"]
    mgr.close()


def test_sharded_checkpoint_roundtrip(setup, tmp_path, eight_devices):
    """Save a mesh-sharded state; restore into a sharded template with
    layouts preserved (sharding-aware Orbax restore)."""
    from x3d_tpu.parallel import create_mesh, shard_state

    mesh = create_mesh(data=4, model=2, devices=eight_devices)
    state = shard_state(setup["state"], mesh)
    mgr = CheckpointManager(str(tmp_path / "sharded"))
    mgr.save(1, state)

    template = shard_state(setup["state"], mesh)
    restored, epoch = mgr.restore(template)
    assert epoch == 1
    fc1 = restored.params["fc_1"]["kernel"]
    assert fc1.sharding.shard_shape(fc1.shape)[1] == 2048 // 2  # TP kept
    np.testing.assert_allclose(
        np.asarray(restored.params["fc_2"]["bias"]),
        np.asarray(state.params["fc_2"]["bias"]))
    mgr.close()


def test_step_cadence_checkpoint_midepoch_crash_resume(setup, tmp_path):
    """--save_checkpoints_step parity (reference utils.py:128-132): a run
    killed mid-epoch loses < N steps; resume recovers the exact
    (epoch, step-in-epoch) point from the restored global step."""
    from x3d_tpu.train.hooks import CheckpointHook

    mgr = CheckpointManager(str(tmp_path / "stepckpt"))
    hook = CheckpointHook(mgr, every_n_steps=2)

    class Crash(Exception):
        pass

    def crashing_batches(n):
        src = _batches()
        for _ in range(n):
            yield next(src)
        raise Crash

    # 4-step epochs, checkpoint every 2 steps, crash during step 4
    with pytest.raises(Crash):
        fit(setup["cfg"], setup["state"], setup["train_step"],
            crashing_batches(3), steps_per_epoch=4, epochs=2,
            rng=setup["rng"], hooks=[hook])
    assert mgr.latest() == 2  # step-keyed save; lost 1 step < N=2

    restored, key = mgr.restore(setup["state"])
    assert key == 2
    resume_step = int(restored.step)
    assert resume_step == 2
    # the train CLI derives the resume point exactly this way
    initial_epoch, initial_step = resume_step // 4, resume_step % 4

    rec = RecorderHook()
    final = fit(setup["cfg"], restored, setup["train_step"], _batches(),
                steps_per_epoch=4, epochs=1, rng=setup["rng"],
                initial_epoch=initial_epoch,
                initial_step_in_epoch=initial_step,
                hooks=[rec, CheckpointHook(mgr, every_n_steps=2)])
    assert rec.steps == [3, 4]          # only the lost tail replayed
    assert int(final.step) == 4
    assert mgr.latest() == 4            # epoch-end save, step-keyed, no dup
    mgr.close()


def test_profile_hook_capture(setup, tmp_path):
    """ProfileHook wraps one logging window in a jax.profiler trace."""
    import glob

    from x3d_tpu.train.hooks import ProfileHook

    hook = ProfileHook(str(tmp_path / "prof"), profile_step=2)
    fit(setup["cfg"], setup["state"], setup["train_step"], _batches(),
        steps_per_epoch=4, epochs=1, rng=setup["rng"], hooks=[hook])
    traces = glob.glob(str(tmp_path / "prof" / "plugins" / "profile" / "*" / "*"))
    assert traces, "no trace files written"


def test_logging_hook_rate_window_resets_across_epochs(monkeypatch, caplog):
    """The steps/s window must restart (time AND step origin) at each epoch
    boundary: epoch-end work (validation, checkpoints) is not step time, and
    a window whose step origin lags the epoch restart divides a full-epoch
    step delta by post-boundary time only (observed: 49.6 "steps/s" printed
    on a ~10 steps/s run in the round-4 rehearsal, docs/RUNBOOK.md)."""
    from x3d_tpu.train import hooks as hooks_mod

    clock = {"t": 100.0}
    monkeypatch.setattr(hooks_mod.time, "time", lambda: clock["t"])
    hook = LoggingHook(log_every=10)

    def run_epoch(epoch, first_step, rate, n=10):
        hook.on_epoch_start(epoch, 0.1)
        for s in range(first_step, first_step + n):
            clock["t"] += 1.0 / rate
            hook.on_step(s + 1, {"loss": 1.0})
            hook.on_step_end(s + 1, None)

    with caplog.at_level(logging.INFO, logger="x3d_tpu.train"):
        run_epoch(1, 0, rate=10.0)
        clock["t"] += 30.0          # epoch-end validation + checkpoint
        run_epoch(2, 10, rate=10.0)
    rates = [float(r.getMessage().rsplit("(", 1)[1].split()[0])
             for r in caplog.records if "steps/s" in r.getMessage()]
    assert len(rates) == 2
    for sps in rates:
        assert sps == pytest.approx(10.0, rel=0.05), rates
