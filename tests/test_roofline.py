"""Roofline-analysis tool: aggregation + report math, and the xbwd VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x3d_tpu.ops.depthwise import depthwise_conv3d
from x3d_tpu.tools import roofline


def _event(name, dur_us, bytes_, flops, cat="convolution fusion"):
    return {"ph": "X", "name": name, "dur": dur_us,
            "args": {"hlo_category": cat, "bytes_accessed": str(bytes_),
                     "model_flops": str(flops), "source": "", "tf_op": ""}}


def test_aggregate_sums_calls():
    events = [_event("f.1", 1000, 10**9, 10**9),
              _event("f.1", 1000, 10**9, 10**9),
              _event("f.2", 500, 2 * 10**9, 0, cat="loop fusion")]
    agg = roofline.aggregate(events)
    assert agg["f.1"]["calls"] == 2
    assert agg["f.1"]["dur_us"] == 2000
    assert agg["f.1"]["bytes"] == 2 * 10**9
    assert agg["f.2"]["category"] == "loop fusion"


def test_report_bandwidth_math():
    # 1 GB in 2 ms => 500 GB/s => 50% of a 1000 GB/s peak
    agg = roofline.aggregate([_event("op", 2000, 10**9, 0)])
    out = roofline.report(agg, top=5, hbm_gbps=1000.0, peak_tflops=100.0)
    line = next(ln for ln in out.splitlines() if "op" in ln and "[" in ln)
    assert "   50" in line
    assert "total device time 2.0 ms" in out


def test_report_handles_zero_bytes():
    agg = roofline.aggregate([_event("cc", 100, 0, 0, cat="custom-call")])
    out = roofline.report(agg)
    assert "custom-call" in out


@pytest.mark.parametrize("kdims", [(3, 3, 3), (5, 1, 1)])
def test_xbwd_vjp_matches_autodiff(kdims):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 5, 6, 7, 10), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), kdims + (1, 10)) * 0.3

    def loss(impl):
        return lambda x_, w_: jnp.sum(
            depthwise_conv3d(x_, w_, (1, 1, 1), "SAME", impl=impl) ** 2)

    gx_n, gw_n = jax.grad(loss("xbwd"), argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss("xla"), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_n), np.asarray(gw_r), atol=1e-3)


def test_xbwd_stride2_falls_back():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 6, 8, 6), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 1, 6)) * 0.3
    ref = depthwise_conv3d(x, w, (1, 2, 2), "SAME", impl="xla")
    got = depthwise_conv3d(x, w, (1, 2, 2), "SAME", impl="xbwd")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
