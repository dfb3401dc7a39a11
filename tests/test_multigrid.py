"""Multigrid (long-cycle) training tests: schedule math, LR scaling,
loop equivalence with the plain trainer, BN recalibration, and the CLI.

The reference never built multigrid (roadmap item,
``/root/reference/README.md:125``); the oracle here is the method's own
invariants (Wu et al., CVPR 2020): constant per-epoch clip cost, the
linear LR-scaling rule, power-of-two batch multipliers, and a base-shape
fine-tuning tail — plus exact equivalence with ``loop.fit`` when the
schedule collapses to the single base phase.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu import variant_config
from x3d_tpu.models import create_model
from x3d_tpu.train import (
    MultigridSchedule,
    create_train_state,
    fit_multigrid,
    lr_for_epoch,
    make_bn_recalibrator,
    make_train_step,
)
from x3d_tpu.train.loop import fit
from x3d_tpu.train.state import make_optimizer


def tiny_cfg():
    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 10
    cfg.NETWORK.DROPOUT_RATE = 0.0
    cfg.TEST.NUM_TEMPORAL_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.DATA.TEMP_DURATION = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.EPOCHS = 4
    cfg.MULTIGRID.SPATIAL_DIVISOR = 4
    return cfg


def synthetic_phase_batches(phase, num_classes=10, seed=0):
    key = jax.random.PRNGKey(seed + phase.index)
    kv, kl = jax.random.split(key)
    video = jax.random.normal(
        kv, (phase.batch_size, phase.temp_duration, phase.crop_size,
             phase.crop_size, 3), jnp.float32)
    label = jax.random.randint(kl, (phase.batch_size,), 0, num_classes)
    while True:
        yield {"video": video, "label": label}


# ----------------------------------------------------------------- schedule

def test_schedule_phase_geometry():
    """Default factors: 8/4/2/1 batch multipliers, T/S scaled, cost const."""
    cfg = variant_config("M")
    cfg.DATA.TEMP_DURATION = 16
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.DATA.TRAIN_JITTER_SCALES = [256, 320]
    cfg.TRAIN.BATCH_SIZE = 128
    sched = MultigridSchedule(cfg, base_steps_per_epoch=100, epochs=20)

    mults = [p.batch_size // 128 for p in sched.phases]
    assert mults == [8, 4, 2, 1]
    assert [p.temp_duration for p in sched.phases] == [4, 8, 8, 16]
    assert sched.phases[0].crop_size == 160       # 224/sqrt(2) -> mult of 8
    assert sched.phases[3].crop_size == 224
    assert sched.phases[3].jitter_scales == (256, 320)
    assert all(j >= p.crop_size for p in sched.phases
               for j in p.jitter_scales)

    # one data pass per epoch regardless of phase (within rounding)
    base_clips = 128 * 100
    for p in sched.phases:
        clips = p.batch_size * p.steps_per_epoch
        assert abs(clips - base_clips) / base_clips < 0.05

    # trailing 10% of epochs pinned to the base shape; the cycled segment
    # is aligned backwards so its LAST epoch is the base phase (progressive
    # annealing into fine-tuning), with the leading remainder extending the
    # coarsest phase: 18 cycled epochs = 2 remainder + 4 full cycles.
    assert sched.epoch_phase[-1] == 3 and sched.epoch_phase[-2] == 3
    assert sched.epoch_phase[:2] == [0, 0]
    assert sched.epoch_phase[2:18] == [0, 1, 2, 3] * 4
    assert sched.epoch_phase[17] == 3        # last cycled epoch == base

    # default YAML jitter ranges stay non-degenerate in every phase
    # (the max(S, .) floor must not collapse the scale-augmentation range)
    for p in sched.phases:
        assert p.jitter_scales[0] < p.jitter_scales[1], p


def test_cycle_always_ends_on_base_phase():
    """Alignment invariant: for any (epochs, block, n_fine) combination the
    epoch before the fine-tune tail is the base phase — the run never jumps
    from a coarse phase straight into base-shape fine-tuning."""
    cfg = tiny_cfg()
    for epochs in range(2, 30):
        for block in (1, 2, 3):
            cfg.MULTIGRID.EPOCH_BLOCK = block
            sched = MultigridSchedule(cfg, base_steps_per_epoch=8,
                                      epochs=epochs)
            n_base = len(sched.phases) - 1
            n_fine = sum(1 for _ in sched.epoch_phase
                         if _ == n_base)  # >= the tail
            boundary = epochs - max(
                1, int(round(epochs * cfg.MULTIGRID.FINETUNE_FRACTION)))
            if boundary > 0:
                assert sched.epoch_phase[boundary - 1] == n_base, (
                    epochs, block, sched.epoch_phase)
            # monotone within the cycled segment: phases never step
            # backwards except at a cycle restart (coarsest)
            prev = None
            for e in range(boundary):
                p = sched.epoch_phase[e]
                if prev is not None:
                    assert p >= prev or p == 0, sched.epoch_phase
                prev = p


def test_schedule_requires_base_shape_last():
    cfg = tiny_cfg()
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[0.5, 1.0], [0.25, 0.7071]]
    with pytest.raises(ValueError):
        MultigridSchedule(cfg, base_steps_per_epoch=4, epochs=2)


def test_lr_schedule_linear_scaling_and_boundaries():
    """step->lr = per-epoch cosine x the phase's batch multiplier."""
    cfg = variant_config("M")
    cfg.TRAIN.BATCH_SIZE = 128
    sched = MultigridSchedule(cfg, base_steps_per_epoch=80, epochs=12)
    lr_fn = sched.make_lr_schedule()

    for epoch in range(12):
        mult = sched.phase_for_epoch(epoch).lr_scale
        expect = float(lr_for_epoch(cfg, epoch)) * mult
        first = int(sched.first_step[epoch])
        last = int(sched.first_step[epoch + 1]) - 1
        np.testing.assert_allclose(float(lr_fn(first)), expect, rtol=1e-6)
        np.testing.assert_allclose(float(lr_fn(last)), expect, rtol=1e-6)

    # steps past the end hold the final epoch's LR (no out-of-range index)
    total = sched.total_steps()
    np.testing.assert_allclose(float(lr_fn(total + 10)),
                               float(lr_fn(total - 1)), rtol=1e-6)


def test_position_for_step_roundtrips():
    cfg = tiny_cfg()
    sched = MultigridSchedule(cfg, base_steps_per_epoch=8, epochs=6)
    for epoch in range(6):
        n = sched.phase_for_epoch(epoch).steps_per_epoch
        for i in sorted({0, n // 2, n - 1}):
            step = int(sched.first_step[epoch]) + i
            assert sched.position_for_step(step) == (epoch, i)
    # resume exactly at (or past) the end is a finished run: (epochs, 0),
    # so fit_multigrid no-ops instead of replaying the final epoch's hooks,
    # validation, and BN recalibration (ADVICE r4)
    assert sched.position_for_step(sched.total_steps()) == (6, 0)
    assert sched.position_for_step(sched.total_steps() + 7) == (6, 0)


def test_finished_run_resumes_as_noop():
    """fit_multigrid at initial_epoch == epochs runs no epoch hooks and
    returns the state unchanged (mirrors loop.fit's initial_epoch=epochs)."""
    cfg = tiny_cfg()
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[1.0, 1.0]]
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    sched = MultigridSchedule(cfg, base_steps_per_epoch=2, epochs=2)
    state = create_train_state(
        cfg, model, rng, jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        steps_per_epoch=2)

    fired = []

    class Record:
        def on_epoch_start(self, *a): fired.append("epoch_start")
        def on_step(self, *a): fired.append("step")
        def on_step_end(self, *a): fired.append("step_end")
        def on_epoch_end(self, *a): fired.append("epoch_end")
        def on_train_end(self): fired.append("train_end")

    def fail_batches(phase):
        raise AssertionError("a finished run must not build iterators")

    out = fit_multigrid(cfg, state, None, sched, fail_batches, rng=rng,
                        initial_epoch=sched.epochs, hooks=[Record()])
    assert fired == ["train_end"]
    assert out is state


# ------------------------------------------------------------------- loops

def test_single_phase_multigrid_matches_fit():
    """With factors [[1,1]] the multigrid loop is the plain trainer."""
    cfg = tiny_cfg()
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[1.0, 1.0]]
    epochs, steps = 2, 3
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    train_step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    sched = MultigridSchedule(cfg, base_steps_per_epoch=steps, epochs=epochs)

    state_a = create_train_state(cfg, model, rng, sample,
                                 steps_per_epoch=steps)
    state_b = create_train_state(
        cfg, model, rng, sample, steps_per_epoch=steps,
        tx=make_optimizer(cfg, steps, schedule=sched.make_lr_schedule()))

    batches = synthetic_phase_batches(sched.phases[0])
    fixed = next(batches)
    state_a = fit(cfg, state_a, train_step, iter(lambda: fixed, None),
                  steps_per_epoch=steps, epochs=epochs, rng=rng)
    state_b = fit_multigrid(cfg, state_b, train_step, sched,
                            lambda phase: iter(lambda: fixed, None), rng=rng)

    assert int(state_a.step) == int(state_b.step) == epochs * steps
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state_a.params, state_b.params)


def test_fit_multigrid_walks_phases_and_counts_steps():
    cfg = tiny_cfg()
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[0.5, 1.0], [1.0, 1.0]]
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    train_step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    sched = MultigridSchedule(cfg, base_steps_per_epoch=4, epochs=3)
    # epochs: [phase0, phase1] cycle then the fine-tune tail at base
    assert sched.epoch_phase == [0, 1, 1]
    assert sched.phases[0].batch_size == 4           # 2 x multiplier 2
    assert sched.phases[0].temp_duration == 2

    state = create_train_state(
        cfg, model, rng, jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        tx=make_optimizer(cfg, 4, schedule=sched.make_lr_schedule()))

    seen_shapes = []

    def batches_for_phase(phase):
        seen_shapes.append((phase.batch_size, phase.temp_duration,
                            phase.crop_size))
        return synthetic_phase_batches(phase)

    class Record:
        def __init__(self):
            self.epoch_lrs = []
        def on_epoch_start(self, epoch, lr):
            self.epoch_lrs.append(lr)
        def on_step(self, step, metrics): ...
        def on_step_end(self, step, state): ...
        def on_epoch_end(self, *a): ...
        def on_train_end(self): ...

    rec = Record()
    state = fit_multigrid(cfg, state, train_step, sched, batches_for_phase,
                          rng=rng, hooks=[rec])

    assert seen_shapes == [(4, 2, 32), (2, 4, 32)]   # one iterator per phase
    assert int(state.step) == sched.total_steps() == 2 + 4 + 4
    np.testing.assert_allclose(
        rec.epoch_lrs[0], float(lr_for_epoch(cfg, 0)) * 2, rtol=1e-6)
    np.testing.assert_allclose(
        rec.epoch_lrs[1], float(lr_for_epoch(cfg, 1)), rtol=1e-6)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(state.params))


def test_bn_recalibrator_reestimates_stats():
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(2)
    state = create_train_state(cfg, model, rng,
                               jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
                               steps_per_epoch=2)

    m = cfg.NETWORK.BN.MOMENTUM
    shifted = jnp.full((2, 4, 32, 32, 3), 3.0, jnp.float32)
    recal = make_bn_recalibrator(
        model, lambda: iter([{"video": shifted}] * 4), 4, rng, momentum=m)
    new_state = recal(state)

    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))
    # parameters untouched
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, new_state.params)


def test_bn_recalibration_is_exact_average_not_ema():
    """Precise-BN replaces the running statistics with the true per-batch
    average: with identical batches the result is independent of N (under
    the old EMA chaining, momentum^N of the stale statistics survived, so
    N=1 and N=8 disagreed by ~(0.9 - 0.9^8) of the stale value)."""
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(4)
    m = cfg.NETWORK.BN.MOMENTUM
    state = create_train_state(cfg, model, rng,
                               jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
                               steps_per_epoch=2)
    batch = {"video": jax.random.normal(jax.random.PRNGKey(5),
                                        (2, 4, 32, 32, 3), jnp.float32) + 2.0}

    recal1 = make_bn_recalibrator(model, lambda: iter([batch] * 1), 1, rng,
                                  momentum=m)
    recal8 = make_bn_recalibrator(model, lambda: iter([batch] * 8), 8, rng,
                                  momentum=m)
    s1, s8 = recal1(state), recal8(state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        s1.batch_stats, s8.batch_stats)

    # and no trace of the initialization statistics survives: a second
    # recalibration from the already-recalibrated state is a fixed point
    s_again = make_bn_recalibrator(model, lambda: iter([batch] * 2), 2, rng,
                                   momentum=m)(s1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        s1.batch_stats, s_again.batch_stats)


# --------------------------------------------------------------------- CLI

def test_train_cli_multigrid_synthetic(tmp_path):
    import os
    import subprocess
    import sys

    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        "NETWORK:\n  C1_CHANNELS: 4\n  DEPTH_FACTOR: 0.34\n"
        "  NUM_CLASSES: 5\n  DROPOUT_RATE: 0.0\n"
        "DATA:\n  TEMP_DURATION: 4\n  TRAIN_CROP_SIZE: 32\n"
        "  TRAIN_JITTER_SCALES: [36, 44]\n  TEST_CROP_SIZE: 32\n"
        "TRAIN:\n  BATCH_SIZE: 2\n  DATASET_SIZE: 8\n  EPOCHS: 3\n"
        "TEST:\n  NUM_TEMPORAL_VIEWS: 1\n  NUM_SPATIAL_CROPS: 1\n"
        "  BATCH_SIZE: 2\n"
        "MULTIGRID:\n  SPATIAL_DIVISOR: 4\n"
        "  LONG_CYCLE_FACTORS: [[0.5, 1.0], [1.0, 1.0]]\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "x3d_tpu.tools.train",
         f"--config={cfg_yaml}", f"--model_dir={tmp_path / 'out'}",
         "--synthetic", "--multigrid", "--nomixed_precision"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "multigrid long-cycle schedule" in (r.stderr + r.stdout)
    # a checkpoint landed (epoch-end CheckpointHook)
    ckpts = os.listdir(tmp_path / "out" / "checkpoints")
    assert ckpts, "no checkpoint written by the multigrid CLI run"


def test_train_cli_multigrid_crash_resume(tmp_path):
    """kill -9 mid-phase, then resume: position_for_step must map the
    restored optimizer step back to the right (epoch, step-in-epoch) —
    the CPU-scale copy of the rehearsal's 10c/10d stages."""
    import os
    import subprocess
    import sys
    import time

    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        "NETWORK:\n  C1_CHANNELS: 4\n  DEPTH_FACTOR: 0.34\n"
        "  NUM_CLASSES: 5\n  DROPOUT_RATE: 0.0\n"
        "DATA:\n  TEMP_DURATION: 4\n  TRAIN_CROP_SIZE: 32\n"
        "  TRAIN_JITTER_SCALES: [36, 44]\n  TEST_CROP_SIZE: 32\n"
        "TRAIN:\n  BATCH_SIZE: 2\n  DATASET_SIZE: 8\n  EPOCHS: 3\n"
        "TEST:\n  NUM_TEMPORAL_VIEWS: 1\n  NUM_SPATIAL_CROPS: 1\n"
        "  BATCH_SIZE: 2\n"
        "MULTIGRID:\n  SPATIAL_DIVISOR: 4\n"
        "  LONG_CYCLE_FACTORS: [[0.5, 1.0], [1.0, 1.0]]\n")
    # schedule: epochs [phase0 x2-steps, phase1 x4-steps, phase1 x4-steps]
    # (first_step [0, 2, 6, 10]); the step-4 checkpoint is mid-epoch-1.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    cmd = [sys.executable, "-m", "x3d_tpu.tools.train",
           f"--config={cfg_yaml}", f"--model_dir={tmp_path / 'out'}",
           "--synthetic", "--multigrid", "--nomixed_precision",
           "--save_checkpoints_step=2"]

    log_a = tmp_path / "train_a.log"
    with open(log_a, "w") as fh:
        proc = subprocess.Popen(cmd, stdout=fh, stderr=subprocess.STDOUT,
                                env=env)
        try:
            deadline = time.time() + 540
            killed = False
            while time.time() < deadline:
                if "checkpoint saved at step 4" in log_a.read_text(
                        errors="replace"):
                    time.sleep(0.5)
                    proc.kill()   # SIGKILL: an unclean crash
                    killed = True
                    break
                if proc.poll() is not None:
                    break
                time.sleep(1)
            proc.wait(timeout=60)
        finally:
            if proc.poll() is None:
                proc.kill()
    assert killed, (
        "never saw the step-4 checkpoint; exited rc=%s\n%s"
        % (proc.returncode, log_a.read_text(errors="replace")[-4000:]))

    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    out = r.stderr + r.stdout
    assert "resumed at global step 4 (epoch 1, step-in-epoch 2)" in out, out[-4000:]
    # the resumed run completes the schedule (10 total steps -> final save)
    assert "checkpoint saved at step 10" in out, out[-4000:]


def test_multigrid_rejects_native_loader(tmp_path):
    import os
    import subprocess
    import sys

    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text("TRAIN:\n  BATCH_SIZE: 2\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "x3d_tpu.tools.train",
         f"--config={cfg_yaml}", f"--model_dir={tmp_path / 'out'}",
         "--synthetic", "--multigrid", "--native_loader", "--use_tfrecord",
         "--train_file_pattern=/nonexistent-*"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode != 0
    assert "multigrid" in (r.stderr + r.stdout)
