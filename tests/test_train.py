"""Training-step tests: schedule parity, L2 semantics, learning dynamics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu import variant_config
from x3d_tpu.models import create_model
from x3d_tpu.train import (
    TrainState,
    create_train_state,
    l2_penalty,
    lr_for_epoch,
    make_eval_step,
    make_lr_schedule,
    make_train_step,
)


def tiny_cfg():
    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 10
    cfg.NETWORK.DROPOUT_RATE = 0.0
    cfg.TEST.NUM_TEMPORAL_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.TRAIN.DATASET_SIZE = 8
    cfg.TRAIN.BATCH_SIZE = 4
    return cfg


# ---------------------------------------------------------------- schedule

def test_lr_schedule_reference_values():
    """Reproduce the reference lr_schedule (train.py:113-125) numerically."""
    import math

    cfg = variant_config("M")  # BASE_LR 0.05, WARMUP_LR 0.01, WARMUP 35, 256
    t = cfg.TRAIN

    def ref(epoch):
        if epoch > t.WARMUP_EPOCHS:
            return t.BASE_LR * 0.5 * (math.cos(math.pi * epoch / t.EPOCHS) + 1)
        return t.WARMUP_LR + epoch * (t.BASE_LR - t.WARMUP_LR) / t.WARMUP_EPOCHS

    for epoch in [0, 1, 17, 34, 35, 36, 100, 200, 255]:
        np.testing.assert_allclose(
            float(lr_for_epoch(cfg, epoch)), ref(epoch), rtol=1e-5, atol=1e-8,
            err_msg=f"epoch {epoch}")


def test_lr_stepped_per_epoch():
    """Q5: LR must be constant within an epoch (staircase, not smooth)."""
    cfg = variant_config("M")
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    vals = [float(sched(s)) for s in [0, 5, 9, 10, 19, 350, 359, 360]]
    assert vals[0] == vals[1] == vals[2]          # epoch 0
    assert vals[3] == vals[4]                     # epoch 1
    assert vals[0] != vals[3]
    assert vals[5] == vals[6] and vals[6] != vals[7]  # epoch 35 -> 36 boundary


def test_lr_warmup_boundary():
    """Reference quirk: epoch == WARMUP_EPOCHS uses the warmup line (== BASE_LR)."""
    cfg = variant_config("M")
    np.testing.assert_allclose(float(lr_for_epoch(cfg, 35)), cfg.TRAIN.BASE_LR,
                               rtol=1e-6)


# ---------------------------------------------------------------- L2 filter

def test_l2_excludes_se_fc1_bias_and_bn():
    params = {
        "conv_1": {"conv_s": {"kernel": jnp.ones((2, 2))}},
        "block": {
            "bottleneck": {
                "se": {
                    "se_fc1": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)},
                    "se_fc2": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)},
                },
                "bn_a": {"norm": {"scale": jnp.ones(5), "bias": jnp.ones(5)}},
            }
        },
        "fc_2": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
    }
    # regularized: conv_s 4 + se_fc2 9 + fc_2 4 = 17; se_fc1, biases, BN excluded
    assert float(l2_penalty(params)) == 17.0


# ---------------------------------------------------------------- dynamics

@pytest.fixture(scope="module")
def trained():
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (4, 4, 32, 32, 3))
    label = jnp.array([0, 1, 2, 3])
    state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    batch = {"video": video, "label": label}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    return dict(cfg=cfg, model=model, state=state, batch=batch, losses=losses)


def test_loss_decreases_when_overfitting(trained):
    losses = trained["losses"]
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_step_counter_advances(trained):
    assert int(trained["state"].step) == 8


def test_metrics_shapes_and_ranges(trained):
    cfg, model = trained["cfg"], trained["model"]
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    _, metrics = step(trained["state"], trained["batch"], jax.random.PRNGKey(1))
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    assert 0.0 <= float(metrics["top_5_acc"]) <= 1.0
    assert float(metrics["top_5_acc"]) >= float(metrics["acc"])


def test_eval_step_sums(trained):
    cfg, model = trained["cfg"], trained["model"]
    eval_step = jax.jit(make_eval_step(model))
    out = eval_step(trained["state"], trained["batch"])
    assert float(out["count"]) == 4.0
    assert 0 <= float(out["acc_sum"]) <= 4
    assert float(out["top_5_sum"]) >= float(out["acc_sum"])


def test_weight_decay_shrinks_unused_weights():
    """With zero gradient signal, L2 should pull regularized weights down."""
    cfg = tiny_cfg()
    cfg.NETWORK.WEIGHT_DECAY = 0.1
    model = create_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 4, 32, 32, 3))
    label = jnp.array([0, 0])
    state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
    before = float(jnp.sum(jnp.abs(state.params["conv_1"]["conv_s"]["kernel"])))
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    for _ in range(3):
        state, _ = step(state, {"video": video, "label": label}, key)
    after = float(jnp.sum(jnp.abs(state.params["conv_1"]["conv_s"]["kernel"])))
    assert after < before


# ------------------------------------------------------------ debug health

def test_tensor_health_dump(tmp_path):
    """FULL_HEALTH analog: per-module output health, finite by default,
    non-finite params flagged (reference train.py:62-67)."""
    import json

    from x3d_tpu.train.debug import dump_tensor_health

    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (2, 4, 16, 16, 3))
    state = create_train_state(cfg, model, rng, video, steps_per_epoch=2)

    out = tmp_path / "health.json"
    report = dump_tensor_health(model, state, video, str(out))
    assert report, "no intermediates captured"
    assert all(v["finite_frac"] == 1.0 for v in report.values())
    assert any("conv_1" in k for k in report)
    on_disk = json.loads(out.read_text())
    assert set(on_disk) == set(report)

    # poison one kernel -> the report must flag non-finite outputs
    bad_params = jax.tree_util.tree_map(lambda x: x, state.params)
    bad_params["conv_1"]["conv_s"]["kernel"] = (
        state.params["conv_1"]["conv_s"]["kernel"] * jnp.nan)
    bad_state = state.replace(params=bad_params)
    bad_report = dump_tensor_health(model, bad_state, video)
    assert any(v["finite_frac"] < 1.0 for v in bad_report.values())
