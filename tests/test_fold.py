"""Time-folded layout (models/x3d.py ``X3D.time_fold``) equivalence.

The folded model carries activations as (B·T, 1, H, W, C) — full lane
occupancy at sub-128 batches (the L/XL regime) — and must be numerically
identical to the unfolded model: same variable tree, same outputs, same
batch statistics, same gradients.  Matches the reference semantics by
construction (the unfolded model is the tested parity anchor).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.models import create_model, init_variables
from x3d_tpu.models.x3d import X3D, build_arch

from test_model import CLIP, tiny_cfg


def _models(cfg, bn_groups=1):
    base = create_model(cfg, dtype=jnp.float32, remat=False,
                        bn_groups=bn_groups, time_fold=False)
    folded = create_model(cfg, dtype=jnp.float32, remat=False,
                          bn_groups=bn_groups, time_fold=True)
    return base, folded


def test_folded_variable_tree_identical():
    cfg = tiny_cfg()
    base, folded = _models(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2,) + CLIP)
    vb = init_variables(base, jax.random.PRNGKey(1), x)
    vf = init_variables(folded, jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(vb)
            == jax.tree_util.tree_structure(vf))
    for a, b in zip(jax.tree_util.tree_leaves(vb),
                    jax.tree_util.tree_leaves(vf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("bn_groups", [1, 2])
def test_folded_matches_unfolded_train_step(bn_groups):
    """Loss, gradients, and updated batch statistics must be identical
    (folding is a layout change, not a model change)."""
    from x3d_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (4,) + CLIP)
    label = jnp.arange(4) % cfg.NETWORK.NUM_CLASSES
    batch = {"video": video, "label": label}

    def run(model):
        state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
        step = make_train_step(model, cfg.NETWORK.WEIGHT_DECAY)
        return jax.jit(step)(state, batch, key)

    base, folded = _models(cfg, bn_groups)
    s_ref, m_ref = run(base)
    s_got, m_got = run(folded)
    np.testing.assert_allclose(float(m_got["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_got.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_got.batch_stats),
                    jax.tree_util.tree_leaves(s_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_folded_matches_unfolded_eval():
    """Eval probabilities (running-stat BN + view averaging) identical."""
    cfg = tiny_cfg()
    base, folded = _models(cfg)
    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * views,) + CLIP)
    v = init_variables(base, jax.random.PRNGKey(1), x)
    pb = jax.jit(lambda v, x: base.apply(v, x, train=False))(v, x)
    pf = jax.jit(lambda v, x: folded.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pb),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("fold_stages", [0, 2, 3])
def test_mixed_fold_boundary_matches_unfolded(fold_stages):
    """A mid-network fold boundary (fold the lane-starved early stages,
    unfold the tail — the serving "mixed" layout) is still exact: train
    step loss/params/batch-stats and eval probs match the unfolded model
    across the boundary reshape."""
    from x3d_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg()
    key = jax.random.PRNGKey(3)
    video = jax.random.normal(key, (4,) + CLIP)
    label = jnp.arange(4) % cfg.NETWORK.NUM_CLASSES
    batch = {"video": video, "label": label}
    base = create_model(cfg, dtype=jnp.float32, remat=False,
                        time_fold=False)
    mixed = create_model(cfg, dtype=jnp.float32, remat=False,
                         time_fold=True, fold_stages=fold_stages)

    def run(model):
        state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
        step = make_train_step(model, cfg.NETWORK.WEIGHT_DECAY)
        return jax.jit(step)(state, batch, key)

    s_ref, m_ref = run(base)
    s_got, m_got = run(mixed)
    np.testing.assert_allclose(float(m_got["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_got.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_got.batch_stats),
                    jax.tree_util.tree_leaves(s_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    views = cfg.TEST.NUM_TEMPORAL_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    xe = jax.random.normal(jax.random.PRNGKey(4), (2 * views,) + CLIP)
    v = init_variables(base, jax.random.PRNGKey(5), xe)
    pb = jax.jit(lambda v, x: base.apply(v, x, train=False))(v, xe)
    pm = jax.jit(lambda v, x: mixed.apply(v, x, train=False))(v, xe)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pb),
                               rtol=1e-5, atol=1e-6)


def test_folded_aligned_segment_matches_plain():
    """time_fold composed with the aligned bottleneck segment (the TPU
    default at full-lane folded batches) stays exact: force the aligned
    mode on and compare against the unfolded plain path."""
    from x3d_tpu.ops import dw_fused
    from x3d_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg()
    key = jax.random.PRNGKey(2)
    video = jax.random.normal(key, (4,) + CLIP)
    label = jnp.arange(4) % cfg.NETWORK.NUM_CLASSES
    batch = {"video": video, "label": label}

    def run(model):
        state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
        step = make_train_step(model, cfg.NETWORK.WEIGHT_DECAY)
        return jax.jit(step)(state, batch, key)

    base, folded = _models(cfg)
    s_ref, m_ref = run(base)
    dw_fused.set_enabled("aligned")
    try:
        s_got, m_got = run(folded)
    finally:
        dw_fused.set_enabled("auto")
    np.testing.assert_allclose(float(m_got["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_got.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_got.batch_stats),
                    jax.tree_util.tree_leaves(s_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fold_rejects_group_splitting_batches():
    cfg = tiny_cfg()
    model = create_model(cfg, dtype=jnp.float32, remat=False,
                         bn_groups=3, time_fold=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4,) + CLIP)
    with pytest.raises(ValueError, match="divisible by bn_groups"):
        init_variables(model, jax.random.PRNGKey(1), x, train=True)


def test_resolve_time_fold_gate():
    """Gate semantics: bools pass through; "auto" needs train-mode + TPU +
    B<128 + (B*T)%128==0 (so it is off in this CPU suite, off for
    >=128-clip eval batches everywhere, and NEVER folds eval calls — a
    48-clip X3D-L view ensemble folded measured 178 vs 246 unfolded
    clips/s, docs/PERF.md round 3); an int N folds only TRAINING-mode
    batches with B <= N (small eval ensembles must not sneak under a
    train-batch threshold); True is the only eval opt-in."""
    from x3d_tpu.models.x3d import resolve_time_fold

    assert resolve_time_fold(True, 480, 16) is True
    assert resolve_time_fold(False, 16, 16, train=True) is False
    # "auto" is False on CPU regardless of shape
    assert resolve_time_fold("auto", 16, 16, train=True) is False
    # "auto" never folds eval-mode calls, even in the folding window
    assert resolve_time_fold("auto", 16, 16, train=False) is False
    # threshold form: train-shaped TRAIN batches fold, eval never does
    assert resolve_time_fold(16, 16, 16, train=True) is True
    assert resolve_time_fold(16, 8, 16, train=True) is True
    assert resolve_time_fold(16, 480, 16, train=True) is False
    # a 48-clip L/XL eval ensemble under a 128 train threshold stays
    # unfolded (the ADVICE round-3 regression case)
    assert resolve_time_fold(128, 48, 16, train=False) is False
    assert resolve_time_fold(16, 16, 16, train=False) is False
    # bool is not treated as a threshold (True must fold batch 2 > 1,
    # in eval too — explicit opt-in)
    assert resolve_time_fold(True, 2, 16) is True
