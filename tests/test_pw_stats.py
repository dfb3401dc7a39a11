"""MXU pointwise-with-stat-sums kernel vs the plain composition (interpret).

Covers ``ops/pw_batchminor.pw_conv_bm_stats`` (forward values, the p/s^2
sums, and the custom-VJP against autodiff of the reference composition)
and its integration into the aligned bottleneck path (full tiny-model
train-step equivalence with the stats emitted by the kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.ops import pw_batchminor


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pw_batchminor.INTERPRET
    pw_batchminor.INTERPRET = True
    yield
    pw_batchminor.INTERPRET = old


def _ref(x, k2):
    y = jnp.einsum("bthwc,cd->bthwd", x.astype(jnp.float32),
                   k2.astype(jnp.float32)).astype(x.dtype)
    y32 = y.astype(jnp.float32)
    p = jnp.transpose(jnp.sum(y32, axis=(1, 2, 3)))       # (D, B)
    s2 = jnp.transpose(jnp.sum(y32 * y32, axis=(1, 2, 3)))
    return y, p, s2


def test_forward_and_sums_match():
    key = jax.random.PRNGKey(0)
    B, T, H, W, C, D = 2, 3, 4, 6, 8, 16
    x = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    k2 = jax.random.normal(jax.random.PRNGKey(1), (C, D)) * 0.3
    y, p, s2 = pw_batchminor.pw_conv_bm_stats(x, k2)
    yr, pr, s2r = _ref(x, k2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p), np.asarray(pr), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r), rtol=1e-4,
                               atol=1e-4)


def test_custom_vjp_matches_autodiff():
    key = jax.random.PRNGKey(2)
    B, T, H, W, C, D = 2, 2, 4, 4, 8, 8
    x = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    k2 = jax.random.normal(jax.random.PRNGKey(3), (C, D)) * 0.3

    def loss(op):
        def f(x, k2):
            y, p, s2 = op(x, k2)
            # touch all three outputs with different weights so every
            # cotangent path (gy, gp, gs2) is exercised
            return (jnp.sum(y ** 2) + 0.3 * jnp.sum(p * p)
                    + 0.1 * jnp.sum(s2))
        return f

    gx_p, gk_p = jax.grad(loss(pw_batchminor.pw_conv_bm_stats),
                          argnums=(0, 1))(x, k2)
    gx_r, gk_r = jax.grad(loss(_ref), argnums=(0, 1))(x, k2)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-3, atol=1e-3)


def test_act_conv_vjp_matches_autodiff():
    """pw_act_conv_bm_stats (bn_b affine + swish + conv + sums) custom VJP
    vs autodiff of the plain composition, incl. coefficient gradients."""
    key = jax.random.PRNGKey(4)
    B, T, H, W, C, D = 2, 2, 4, 4, 8, 8
    x = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    k2 = jax.random.normal(jax.random.PRNGKey(5), (C, D)) * 0.3
    a = jax.random.normal(jax.random.PRNGKey(6), (C, B)) * 0.5 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(7), (C, B)) * 0.2

    def ref_op(x, a, b, k2):
        ae = jnp.transpose(a).reshape(B, 1, 1, 1, C)
        be = jnp.transpose(b).reshape(B, 1, 1, 1, C)
        v = x * ae + be
        u = v * jax.nn.sigmoid(v)
        z = jnp.einsum("bthwc,cd->bthwd", u, k2)
        p = jnp.transpose(jnp.sum(z, axis=(1, 2, 3)))
        s2 = jnp.transpose(jnp.sum(z * z, axis=(1, 2, 3)))
        return z, p, s2

    def loss(op):
        def f(x, a, b, k2):
            z, p, s2 = op(x, a, b, k2)
            return (jnp.sum(z ** 2) + 0.3 * jnp.sum(p * p)
                    + 0.1 * jnp.sum(s2))
        return f

    got = jax.grad(loss(pw_batchminor.pw_act_conv_bm_stats),
                   argnums=(0, 1, 2, 3))(x, a, b, k2)
    want = jax.grad(loss(ref_op), argnums=(0, 1, 2, 3))(x, a, b, k2)
    for gp, gr in zip(got, want):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("impl", ["mxu_exp", "mxu_seg"])
@pytest.mark.parametrize("bn_groups", [1, 2])
def test_aligned_model_with_mxu_stats_matches_reference(impl, bn_groups):
    """Full tiny-model train step: aligned mode + MXU pw stats == the
    unfused composition (loss, grads, batch stats) — including the grouped
    (per-replica BN) stat reductions from the kernels' per-sample sums."""
    from x3d_tpu import variant_config
    from x3d_tpu.models import create_model
    from x3d_tpu.ops import dw_fused, pointwise
    from x3d_tpu.train import create_train_state, make_train_step

    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 8
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 8
    cfg.NETWORK.DROPOUT_RATE = 0.0
    model = create_model(cfg, dtype=jnp.float32, bn_groups=bn_groups)
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (4, 4, 16, 16, 3))
    label = jnp.arange(4) % 8
    batch = {"video": video, "label": label}
    state = create_train_state(cfg, model, key, video, steps_per_epoch=2)
    step = make_train_step(model, cfg.NETWORK.WEIGHT_DECAY)

    old_seg, old_pw = dw_fused._ENABLED, pointwise._DEFAULT_IMPL
    try:
        dw_fused.set_enabled(False)
        pointwise.set_default_impl("conv")
        s_ref, m_ref = jax.jit(step)(state, batch, key)
        dw_fused.set_enabled("aligned")
        pointwise.set_default_impl(impl)
        s_mxu, m_mxu = jax.jit(step)(state, batch, key)
    finally:
        dw_fused.set_enabled(old_seg)
        pointwise.set_default_impl(old_pw)

    np.testing.assert_allclose(float(m_mxu["loss"]), float(m_ref["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m_mxu["acc"]), float(m_ref["acc"]))
    ref_bn = jax.tree_util.tree_leaves(s_ref.batch_stats)
    mxu_bn = jax.tree_util.tree_leaves(s_mxu.batch_stats)
    for a, b in zip(mxu_bn, ref_bn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
    ref_p = jax.tree_util.tree_leaves(s_ref.params)
    mxu_p = jax.tree_util.tree_leaves(s_mxu.params)
    for a, b in zip(mxu_p, ref_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
