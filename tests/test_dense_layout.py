"""Dense fused-lane layout ops must match the standard-layout ops exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.ops import dense_layout as dl
from x3d_tpu.ops.depthwise import depthwise_conv3d


def test_choose_group_density():
    assert dl.choose_group(112, 24) in (16, 112)   # 16*24=384 = 3*128
    g = dl.choose_group(112, 54)
    assert 112 % g == 0
    fused = g * 54
    assert fused / (-(-fused // 128) * 128) > 0.9


def test_roundtrip_views():
    x = jnp.arange(2 * 3 * 4 * 8 * 6, dtype=jnp.float32).reshape(2, 3, 4, 8, 6)
    d = dl.to_dense(x, 4)
    assert d.shape == (2, 3, 4, 2, 24)
    np.testing.assert_array_equal(np.asarray(dl.from_dense(d, 4, 6)),
                                  np.asarray(x))


def test_pw_conv_dense_matches_dot():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 4, 8, 6))
    k = jax.random.normal(jax.random.PRNGKey(1), (6, 10)) * 0.3
    ref = jnp.einsum("bthwc,cd->bthwd", x, k)
    d = dl.to_dense(x, 4)
    out = dl.pw_conv_dense(d, k, 4)
    np.testing.assert_allclose(np.asarray(dl.from_dense(out, 4, 10)),
                               np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("kernel", [(3, 3, 3), (5, 1, 1)])
def test_dw_conv_dense_matches_xla(stride, kernel):
    if stride == 2 and kernel == (5, 1, 1):
        pytest.skip("stem temporal conv is always stride 1")
    key = jax.random.PRNGKey(0)
    B, T, H, W, C = 2, 4, 8, 8, 6
    x = jax.random.normal(key, (B, T, H, W, C))
    w = jax.random.normal(jax.random.PRNGKey(1), kernel + (1, C)) * 0.3
    ref = jax.jit(lambda x, w: depthwise_conv3d(
        x, w, (1, stride, stride), "SAME", impl="xla"))(x, w)
    g = 4
    out, g2 = jax.jit(
        lambda x, w: dl.dw_conv_dense(dl.to_dense(x, g), w, g, C, stride)
    )(x, w)
    got = dl.from_dense(out, g2, C)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_channel_reductions():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 4, 8, 6))
    d = dl.to_dense(x, 4)
    s = dl.channel_sum_dense(d, 4, 6)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(jnp.sum(x, axis=(0, 1, 2, 3))),
                               rtol=1e-5)
    s2, sq = dl.channel_sum_dense(d, 4, 6, also_sq=True)
    np.testing.assert_allclose(np.asarray(sq),
                               np.asarray(jnp.sum(x * x, axis=(0, 1, 2, 3))),
                               rtol=1e-5)
    m = dl.channel_mean_dense(d, 4, 6)
    np.testing.assert_allclose(np.asarray(m),
                               np.asarray(jnp.mean(x, axis=(1, 2, 3))),
                               rtol=1e-5)


def test_scale_bias_and_gate():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 4, 8, 6))
    scale = jnp.arange(1.0, 7.0)
    bias = jnp.arange(0.0, 0.6, 0.1)
    d = dl.to_dense(x, 4)
    out = dl.from_dense(dl.scale_bias_dense(d, scale, bias, 4), 4, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x * scale + bias),
                               atol=1e-5)
    gate = jax.random.uniform(key, (2, 6))
    out = dl.from_dense(dl.mul_channels_dense(d, gate, 4, 6), 4, 6)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x * gate[:, None, None, None, :]),
                               atol=1e-5)


def test_dw_conv_dense_gradients_flow():
    """Autodiff through the roll/mask formulation must work and be finite."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 3, 4, 4, 6))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 1, 6)) * 0.3

    def loss(x, w):
        d = dl.to_dense(x, 2)
        out, _ = dl.dw_conv_dense(d, w, 2, 6, 1)
        return jnp.sum(out ** 2)

    gx, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gw)).all()
    # numeric check on one weight element
    eps = 1e-3
    w2 = w.at[1, 1, 1, 0, 0].add(eps)
    num = (loss(x, w2) - loss(x, w)) / eps
    np.testing.assert_allclose(float(num), float(gw[1, 1, 1, 0, 0]), rtol=2e-2)
