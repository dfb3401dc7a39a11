"""Fused BN-affine+ReLU -> depthwise conv -> stats kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.ops import dw_fused


@pytest.fixture(autouse=True)
def interpret_mode():
    old = dw_fused.INTERPRET
    dw_fused.INTERPRET = True
    yield
    dw_fused.INTERPRET = old


def _inputs(key, B, T, H, W, C, kdims):
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (B, T, H, W, C), jnp.float32)
    a = 0.5 + jax.random.uniform(ks[1], (C, B), jnp.float32)
    b = 0.3 * jax.random.normal(ks[2], (C, B), jnp.float32)
    k = jax.random.normal(ks[3], kdims + (1, C), jnp.float32) * 0.3
    return x, a, b, k


@pytest.mark.parametrize("kdims", [(3, 3, 3), (3, 1, 1), (5, 3, 3)])
@pytest.mark.parametrize("shape", [(4, 5, 6, 5, 7), (2, 5, 4, 9, 3)])
def test_forward_matches_reference(kdims, shape):
    x, a, b, k = _inputs(jax.random.PRNGKey(0), *shape, kdims)
    y, p, s2 = dw_fused.dw_bn_act_conv(x, a, b, k)
    yr, pr, s2r = dw_fused.reference(x, a, b, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p), np.asarray(pr), rtol=1e-5,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r), rtol=1e-5,
                               atol=1e-3)


def test_rejects_temporal_extent_below_kernel():
    """T < kt would make the static t==0 plane DMAs read out of bounds —
    dw_bn_act_conv must refuse (ADVICE r2: guard, not UB)."""
    x, a, b, k = _inputs(jax.random.PRNGKey(0), 2, 3, 6, 5, 4, (5, 3, 3))
    with pytest.raises(ValueError, match="T >= kt"):
        dw_fused.dw_bn_act_conv(x, a, b, k)


@pytest.mark.parametrize("kdims", [(3, 3, 3), (3, 1, 1)])
def test_grads_match_reference(kdims):
    B, T, H, W, C = 3, 4, 6, 5, 6
    x, a, b, k = _inputs(jax.random.PRNGKey(1), B, T, H, W, C, kdims)
    key = jax.random.PRNGKey(7)
    wy = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    wp = jax.random.normal(key, (C, B), jnp.float32)
    ws = jax.random.normal(key, (C, B), jnp.float32) * 0.1

    def loss(fn):
        def f(x_, a_, b_, k_):
            y, p, s2 = fn(x_, a_, b_, k_)
            return (jnp.sum(y * wy) + jnp.sum(p * wp) + jnp.sum(s2 * ws))
        return f

    g_new = jax.grad(loss(dw_fused.dw_bn_act_conv), argnums=(0, 1, 2, 3))(
        x, a, b, k)
    g_ref = jax.grad(loss(dw_fused.reference), argnums=(0, 1, 2, 3))(
        x, a, b, k)
    for gn, gr, name in zip(g_new, g_ref, "x a b k".split()):
        np.testing.assert_allclose(
            np.asarray(gn), np.asarray(gr), rtol=1e-4, atol=1e-3,
            err_msg=f"grad wrt {name}")


def test_zero_scale_grad_is_finite():
    B, T, H, W, C = 2, 3, 4, 4, 5
    x, a, b, k = _inputs(jax.random.PRNGKey(2), B, T, H, W, C, (3, 3, 3))
    a = a.at[1, :].set(0.0)

    def f(x_, a_, b_, k_):
        y, p, s2 = dw_fused.dw_bn_act_conv(x_, a_, b_, k_)
        return jnp.sum(y) + jnp.sum(p)

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, a, b, k)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_even_kernel_rejected():
    x, a, b, k = _inputs(jax.random.PRNGKey(3), 2, 3, 4, 4, 4, (3, 3, 3))
    k2 = jnp.zeros((2, 3, 3, 1, 4), jnp.float32)
    with pytest.raises(ValueError):
        dw_fused.dw_bn_act_conv(x, a, b, k2)


@pytest.mark.parametrize("kdims", [(3, 3, 3), (5, 3, 3)])
def test_pbwd_grads_match_xla(kdims):
    """dw_conv_pbwd: XLA forward + one-pass Pallas backward must reproduce
    the XLA conv's value and gradients exactly (plain conv, no BN terms)."""
    from x3d_tpu.ops.depthwise import depthwise_conv3d

    B, T, H, W, C = 3, 5, 6, 5, 4
    key = jax.random.PRNGKey(7)
    u = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1),
                          kdims + (1, C), jnp.float32) * 0.3
    g = jax.random.normal(jax.random.fold_in(key, 2), u.shape, jnp.float32)

    def loss_ref(u, k):
        return jnp.sum(depthwise_conv3d(u, k, impl="xla") * g)

    def loss_got(u, k):
        return jnp.sum(dw_fused.dw_conv_pbwd(u, k) * g)

    y_ref = depthwise_conv3d(u, k, impl="xla")
    y_got = dw_fused.dw_conv_pbwd(u, k)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    gr = jax.grad(loss_ref, argnums=(0, 1))(u, k)
    gg = jax.grad(loss_got, argnums=(0, 1))(u, k)
    np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)


def test_pbwd_dispatch_falls_back():
    """impl="pbwd" must route stride-2 / non-SAME cases to the XLA conv."""
    from x3d_tpu.ops.depthwise import depthwise_conv3d

    B, T, H, W, C = 2, 5, 8, 8, 3
    key = jax.random.PRNGKey(8)
    u = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 1, C),
                          jnp.float32)
    a = depthwise_conv3d(u, k, strides=(1, 2, 2), impl="pbwd")
    b = depthwise_conv3d(u, k, strides=(1, 2, 2), impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
