"""Fused bottleneck path == unfused path on the full model (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu import get_default_config
from x3d_tpu.models import create_model, init_variables
from x3d_tpu.ops import dw_fused


@pytest.fixture()
def tiny_cfg():
    cfg = get_default_config()
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 11
    cfg.DATA.TEMP_DURATION = 3
    cfg.DATA.TRAIN_CROP_SIZE = 32
    return cfg


@pytest.fixture()
def fused_interpret():
    old_i, old_e = dw_fused.INTERPRET, dw_fused._ENABLED
    dw_fused.INTERPRET = True
    yield
    dw_fused.INTERPRET = old_i
    dw_fused.set_enabled(old_e)


def _apply(model, variables, x, train, key=None):
    kwargs = {"rngs": {"dropout": key}} if train else {}
    return jax.jit(
        lambda v, x_: model.apply(
            v, x_, train=train, return_logits=True,
            mutable=["batch_stats"] if train else False, **kwargs),
        static_argnames=(),
    )(variables, x)


@pytest.mark.parametrize("mode", ["pallas", "aligned"])
def test_fused_matches_unfused(tiny_cfg, fused_interpret, mode):
    model = create_model(tiny_cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 3, 32, 32, 3), jnp.float32)

    dw_fused.set_enabled(False)
    variables = init_variables(model, key, x)

    # forward (eval): running stats, SE pooled path
    dw_fused.set_enabled(False)
    ref = jax.jit(lambda v, x_: model.apply(v, x_, train=False,
                                            return_logits=True))(variables, x)
    dw_fused.set_enabled(mode)
    got = jax.jit(lambda v, x_: model.apply(v, x_, train=False,
                                            return_logits=True))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # train step: batch stats + grads
    def loss_and_stats(v, x_):
        logits, upd = model.apply(
            v, x_, train=True, return_logits=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(logits ** 2) * 1e-3, upd

    dw_fused.set_enabled(False)
    (l_ref, upd_ref), g_ref = jax.jit(
        jax.value_and_grad(loss_and_stats, has_aux=True))(variables, x)
    dw_fused.set_enabled(mode)
    (l_got, upd_got), g_got = jax.jit(
        jax.value_and_grad(loss_and_stats, has_aux=True))(variables, x)

    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(upd_ref)
    flat_g = jax.tree_util.tree_leaves_with_path(upd_got)
    for (pr, vr), (pg, vg) in zip(flat_r, flat_g):
        assert pr == pg
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(vr), rtol=1e-4, atol=1e-5,
            err_msg=f"batch_stats {jax.tree_util.keystr(pr)}")
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_g = jax.tree_util.tree_leaves_with_path(g_got)
    for (pr, vr), (pg, vg) in zip(flat_r, flat_g):
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(vr), rtol=5e-3, atol=1e-4,
            err_msg=f"grad {jax.tree_util.keystr(pr)}")


def test_variable_trees_identical(tiny_cfg, fused_interpret):
    model = create_model(tiny_cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 3, 32, 32, 3), jnp.float32)
    dw_fused.set_enabled(False)
    v_off = init_variables(model, key, x)
    dw_fused.set_enabled("pallas")
    v_on = init_variables(model, key, x)
    dw_fused.set_enabled("aligned")
    v_al = init_variables(model, key, x)
    paths_off = [jax.tree_util.keystr(p) + str(v.shape) for p, v in
                 jax.tree_util.tree_leaves_with_path(v_off)]
    paths_on = [jax.tree_util.keystr(p) + str(v.shape) for p, v in
                jax.tree_util.tree_leaves_with_path(v_on)]
    paths_al = [jax.tree_util.keystr(p) + str(v.shape) for p, v in
                jax.tree_util.tree_leaves_with_path(v_al)]
    assert paths_off == paths_on == paths_al


def test_auto_gate_off_on_cpu(tiny_cfg):
    assert dw_fused._ENABLED == "auto" or dw_fused._ENABLED in (True, False)
    dw_fused.set_enabled("auto")
    # CPU backend: auto gate must decline
    assert not dw_fused.applicable(128, 1, 1)
    assert not dw_fused.applicable(128, 2, 1)
    assert not dw_fused.applicable(128, 1, 8)


@pytest.mark.parametrize("mode", ["pallas", "aligned"])
def test_grouped_bn_fused_matches_grouped_unfused(tiny_cfg, fused_interpret,
                                                  mode):
    """Per-replica BN (bn_groups>1): the fused segment's per-sample
    coefficient columns must reproduce GroupedBatchNorm semantics."""
    model = create_model(tiny_cfg, dtype=jnp.float32, bn_groups=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 3, 32, 32, 3), jnp.float32)

    dw_fused.set_enabled(False)
    variables = init_variables(model, key, x)

    def loss_and_stats(v, x_):
        logits, upd = model.apply(
            v, x_, train=True, return_logits=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(logits ** 2) * 1e-3, upd

    dw_fused.set_enabled(False)
    (l_ref, upd_ref), g_ref = jax.jit(
        jax.value_and_grad(loss_and_stats, has_aux=True))(variables, x)
    dw_fused.set_enabled(mode)
    (l_got, upd_got), g_got = jax.jit(
        jax.value_and_grad(loss_and_stats, has_aux=True))(variables, x)

    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-4)
    for (pr, vr), (pg, vg) in zip(
            jax.tree_util.tree_leaves_with_path(upd_ref),
            jax.tree_util.tree_leaves_with_path(upd_got)):
        assert pr == pg
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(vr), rtol=1e-4, atol=1e-5,
            err_msg=f"batch_stats {jax.tree_util.keystr(pr)}")
    for (pr, vr), (pg, vg) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_got)):
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(vr), rtol=5e-3, atol=1e-4,
            err_msg=f"grad {jax.tree_util.keystr(pr)}")
