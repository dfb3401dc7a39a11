"""Pallas dense depthwise kernel vs the XLA grouped conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.ops import pallas_dw
from x3d_tpu.ops.depthwise import depthwise_conv3d


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pallas_dw.INTERPRET
    pallas_dw.INTERPRET = True
    yield
    pallas_dw.INTERPRET = old


@pytest.mark.parametrize("kdims", [(3, 3, 3), (5, 1, 1)])
def test_forward_matches_xla(kdims):
    key = jax.random.PRNGKey(0)
    B, T, H, W, C = 2, 4, 6, 8, 6
    x = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kdims + (1, C)) * 0.3
    ref = jax.jit(lambda x, w: depthwise_conv3d(x, w, (1, 1, 1), "SAME",
                                                impl="xla"))(x, w)
    rows = x.reshape(B, T, H, W * C)
    out = pallas_dw.dw_conv_rows(rows, w, C, kdims)
    got = out.reshape(B, T, H, W, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_grad_matches_xla():
    key = jax.random.PRNGKey(0)
    B, T, H, W, C = 1, 3, 4, 4, 6
    kdims = (3, 3, 3)
    x = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kdims + (1, C)) * 0.3

    def loss_pallas(x, w):
        rows = x.reshape(B, T, H, W * C)
        out = pallas_dw.dw_conv_rows(rows, w, C, kdims)
        return jnp.sum(out ** 2)

    def loss_xla(x, w):
        out = depthwise_conv3d(x, w, (1, 1, 1), "SAME", impl="xla")
        return jnp.sum(out ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3)


@pytest.mark.parametrize("kdims,strides", [
    ((3, 3, 3), (1, 1, 1)),    # bottleneck dw, stride 1 -> Pallas kernel
    ((5, 1, 1), (1, 1, 1)),    # stem temporal dw -> Pallas kernel
    ((3, 3, 3), (1, 2, 2)),    # stage-entry downsampling -> XLA fallback
])
def test_impl_pallas_dispatch_matches_xla(kdims, strides):
    """impl="pallas" through the public depthwise_conv3d entry point."""
    key = jax.random.PRNGKey(0)
    B, T, H, W, C = 2, 4, 6, 8, 6
    x = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kdims + (1, C)) * 0.3
    ref = depthwise_conv3d(x, w, strides, "SAME", impl="xla")
    got = depthwise_conv3d(x, w, strides, "SAME", impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_impl_pallas_explicit_same_pads():
    """The stem's explicit ((k//2,k//2),(0,0),(0,0)) pads equal SAME for a
    kx1x1 kernel and must route to the Pallas kernel path."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 4, 5, 6, 6), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 1, 1, 1, 6)) * 0.3
    pads = ((2, 2), (0, 0), (0, 0))
    ref = depthwise_conv3d(x, w, (1, 1, 1), pads, impl="xla")
    got = depthwise_conv3d(x, w, (1, 1, 1), pads, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_dense_wrapper_shapes():
    key = jax.random.PRNGKey(0)
    B, T, H, W, C, g = 1, 3, 4, 8, 6, 2
    x = jax.random.normal(key, (B, T, H, W // g, g * C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 1, C)) * 0.3
    out = pallas_dw.dw_conv_dense_pallas(x, w, g, C)
    assert out.shape == x.shape
