"""Batch-minor Pallas depthwise kernel vs the XLA grouped conv (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.ops import dw_batchminor
from x3d_tpu.ops.depthwise import depthwise_conv3d


@pytest.fixture(autouse=True)
def interpret_mode():
    old = dw_batchminor.INTERPRET
    dw_batchminor.INTERPRET = True
    yield
    dw_batchminor.INTERPRET = old


@pytest.mark.parametrize("kdims", [(3, 3, 3), (5, 1, 1)])
@pytest.mark.parametrize("shape", [(2, 4, 6, 8, 6), (1, 3, 7, 5, 11)])
def test_forward_matches_xla(kdims, shape):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    C = shape[-1]
    w = jax.random.normal(jax.random.PRNGKey(1), kdims + (1, C)) * 0.3
    ref = depthwise_conv3d(x, w, (1, 1, 1), "SAME", impl="xla")
    got = dw_batchminor.dw_conv_bm(x, w, kdims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_grad_matches_xla():
    key = jax.random.PRNGKey(0)
    B, T, H, W, C = 2, 3, 4, 4, 6
    kdims = (3, 3, 3)
    x = jax.random.normal(key, (B, T, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kdims + (1, C)) * 0.3

    def loss_bm(x, w):
        return jnp.sum(dw_batchminor.dw_conv_bm(x, w, kdims) ** 2)

    def loss_xla(x, w):
        return jnp.sum(
            depthwise_conv3d(x, w, (1, 1, 1), "SAME", impl="xla") ** 2)

    gx_p, gw_p = jax.grad(loss_bm, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3)


@pytest.mark.parametrize("strides", [(1, 1, 1), (1, 2, 2)])
def test_impl_bm_dispatch(strides):
    """impl="bm" through the public entry; stride-2 falls back to XLA."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 6, 8, 6), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 1, 6)) * 0.3
    ref = depthwise_conv3d(x, w, strides, "SAME", impl="xla")
    got = depthwise_conv3d(x, w, strides, "SAME", impl="bm")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_impl_bm_stem_pads():
    """Stem-style explicit (k//2,k//2),(0,0),(0,0) pads route to the
    kernel (they equal SAME for a kx1x1 kernel)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 4, 5, 6, 6), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 1, 1, 1, 6)) * 0.3
    pads = ((2, 2), (0, 0), (0, 0))
    ref = depthwise_conv3d(x, w, (1, 1, 1), pads, impl="xla")
    got = depthwise_conv3d(x, w, (1, 1, 1), pads, impl="bm")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
